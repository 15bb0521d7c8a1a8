"""Pallas TPU kernels for tile compositing (forward + custom-vjp backward).

The XLA prefix-op compositor (render/composite.py) materializes many
(PIX, L) intermediates in HBM; these kernels keep the whole per-tile
front-to-back blend in VMEM: one HBM read of the (L, 24) packed feature
block, one write of the (PIX, 24) output block, with the depth axis
processed in CL-sized chunks under a while_loop that exits as soon as
every pixel has saturated (the T < 1e-4 early-termination of
forward.cu:539-543).

Feature blocks arrive in gather order (T, L, 24) — one instance gather
from a packed per-Gaussian matrix, no XLA transposes — and each chunk
does a single in-VMEM (CL, 24) -> (24, CL) transpose to put the depth
axis on the 128-wide lanes. Weighted feature sums are MXU matmuls.
Padding needs no masking data: the dense layout is front-packed, so
lanes >= count are dead.

Packed column layout (pack_gaussian_features):
  0:2 mean2d | 2:5 conic | 5 opacity | 6 dist_ndc
  7:10 rgb | 10 dist | 11:18 phasor | 18:24 flow

The flow columns fuse the reference's separate `render_flow` passes
(gaussian_renderer/__init__.py:141-204: 3D scene-flow splatted as
colors with geometry DETACHED) into the same tile scan: they are
composited with the alpha*T weights like color, but the backward omits
their d_alpha contribution entirely — exactly the detached-geometry
semantics, without re-running preprocess/binning/compositing twice more
per training step.

Output block (T, PIX, 32):
  0:3 color(+bg), 3 depth, 4:11 phasor(+bg), 11 acc, 12 dd,
  13 final_T, 14:17 first-sample (alpha, dist, amp),
  17 A_tot, 18 WZ_tot, 19 WZ2_tot (residuals for backward),
  20:26 flow (fwd 3 + bwd 3, no bg), 26:32 pad
(cols 12/18/19 are zeros when config.need_dd is off, 14:17 when
config.need_distribution is off — static channel gates set by the
training step for channels its loss never reads.)

Scan budget: prefix ops are the kernels' dominant VPU cost (a
Hillis-Steele network is ~9 doubling steps at CL=512, each a full
(PIX, CL) shift+op). The chunk recompute needs exactly ONE scan — the
exclusive transmittance cumprod; the early-exit latch, the frozen
final-T, and the first-contributing-sample selector are all derived
from its monotonicity (see _chunk_common/_forward_kernel notes) instead
of the three extra scans a naive port carries. The dd moments add three
more cumsums but exist only under need_dd.

Mosaic notes (this jax version): no cumsum/cumprod/reduce_prod lowering
— prefix ops use the Hillis-Steele `_scan_lanes` network.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gftorf_tpu.render.composite import ALPHA_EPS, ALPHA_MAX, T_STOP
from gftorf_tpu.render.settings import RasterConfig

import os as _os

# Depth-axis chunk sizes (multiples of 128). Smaller chunks track
# shallow tiles at finer granularity (the while_loop bounds work by
# ceil(count/CL) chunks) at the cost of more loop iterations on deep
# ones; env overrides exist for on-hardware sweeps (bench_train.py).
def _chunk_env(name: str, default: int) -> int:
    v = int(_os.environ.get(name, default))
    if v < 128 or v % 128 != 0:
        raise ValueError(
            f"{name}={v}: kernel chunk sizes must be positive multiples "
            "of 128 (the TPU lane width)"
        )
    return v


FWD_CHUNK = _chunk_env("GFTORF_FWD_CHUNK", 512)
# Backward keeps ~2x the live (PIX, CL) temporaries; 512 overflows the
# 16MB scoped-VMEM stack limit on v5e.
BWD_CHUNK = _chunk_env("GFTORF_BWD_CHUNK", 256)


def _fwd_pref(L: int, pix: int = 256) -> int:
    """Forward chunk preference, shrunk for deep tiles and large tiles
    so the kernel's scoped-VMEM stays under the 16MB v5e stack limit:
    the (PIX, CL) chunk temporaries dominate (budget calibrated at
    PIX=256), and the double-buffered (L, 24) feature block grows with
    the tile cap (train/loop.py grow-and-replay sizes max_per_tile to
    measured need on overflow)."""
    pref = FWD_CHUNK if L < 4096 else 256
    return max(128, pref * 256 // max(pix, 256))


def _bwd_pref(L: int, pix: int = 256, need_dd: bool = True,
              need_distribution: bool = True) -> int:
    """Backward chunk preference. Budget model (measured on v5e): the
    per-chunk temporaries are ~14.5MB at (PIX=256, CL=256) and the four
    buffered copies of the (L, 24) feature/grad blocks add 4*L*24*4
    bytes, so CL=256 just overflows the 16MB scoped stack at L=4096;
    VMEM scales with PIX x CL, so larger tiles shrink CL in kind.
    Since CL cannot go below the 128-lane alignment, tiles above 512
    pixels cannot fit the backward at all (measured: PIX=1024/CL=128
    needs 19.5MB) — raise a configuration error instead of a Mosaic
    compile crash."""
    if pix > 512:
        raise ValueError(
            f"tile_pixels={pix} exceeds the Pallas backward kernel's "
            "scoped-VMEM budget (max 512 pixels/tile, e.g. 16x32); use "
            "smaller tiles or the XLA compositor (use_pallas=False)"
        )
    pref = BWD_CHUNK if L < 4096 else 128
    cl = max(128, pref * 256 // max(pix, 256))
    # Full budget check including the L-dependent feature/grad blocks.
    # Measured on v5e (2026-08-19): pix=512/CL=128/L=4096 allocates
    # 20.28MB against the 16MB scoped-VMEM stack — the (PIX, CL)
    # temporaries alone leave < 4*4096*24*4 bytes of headroom at 512px.
    # max_per_tile can reach this via grow-and-replay on crowded scenes.
    # The (PIX, CL) term shrinks with CL, so first walk the chunk down
    # (fewer lanes per scan iteration — slightly slower, still correct)
    # for deep tiles instead of crashing on a deep-tile escalation. The
    # analytic model here is only a chunk-selection heuristic; the
    # authoritative feasibility bound is the compiler-calibrated
    # max_feasible_tile_cap table below.
    lterm_mb = 4 * L * 24 * 4 / 2**20
    while cl > 128 and 14.5 * (pix * cl) / (256 * 256) + lterm_mb > 15.5:
        cl -= 128
    cap = max_feasible_tile_cap(pix, need_dd, need_distribution)
    if L > cap:
        raise ValueError(
            f"max_per_tile={L} exceeds the calibrated backward "
            f"scoped-VMEM bound for tile_pixels={pix} "
            f"(max_feasible_tile_cap={cap} at need_dd={need_dd}, "
            f"need_distribution={need_distribution}; tools/vmem_probe.py);"
            f" the Trainer clamps growth to this bound — lower "
            f"max_per_tile or use smaller tiles."
        )
    return cl


# Calibrated against the real v5e compiler (tools/vmem_probe.py): the
# largest max_per_tile whose backward kernel compiles at CL=128 for a
# given (tile_pixels, need_dd, need_distribution) channel-gate combo,
# minus one 128 step of margin. The dd moments and first-sample stats
# each add per-chunk temporaries and prefix scans, so gates-off kernels
# fit deeper tiles — and the training step (the only program that ever
# runs the BACKWARD kernel) has distribution off always and dd off
# unless a dd-loss window is configured, so keying the bound by gates
# buys real headroom at the shipped defaults. Boundaries measured at
# realistic grids (T=300 / T=150; scoped VMEM grows with Mosaic's grid
# multi-buffering, so tiny-grid probes under-measure). Every
# 128-multiple below each cap was sweep-verified to compile —
# allocation is NON-monotonic in L (e.g. 16x32 gates-off: L=4224
# allocates 17.7MB but L=8320 only 16.75MB), so the exhaustive sweep,
# not the boundary alone, is the guarantee.
# Gates-on rows: round-4 calibration (2026-08-20). Gates-off/dd rows:
# round-5 exhaustive sweeps, same toolchain + protocol
# (tools/vmem_probe.py --sweep; chunk=128, grids 300/150):
#   16x16 none: OK through 5760, overflow at 5888   -> ship 5632
#   16x32 none: OK through 3328, overflow at 3456   -> ship 3200
#   16x32 dd:   OK through 1408, overflow at 1536   -> ship 1280
# The gates-off 16x32 cap (3200) is 2.5x the gates-on bound — at the
# shipped defaults (no dd window) the trainer's ceiling more than
# covers the bench workload's measured need of 1920, so the dense
# kernels stay exact where round 4 truncated.
_BWD_CAP_CALIBRATED = {
    (256, True, True): 4736,
    (256, False, False): 5632,
    (512, True, True): 1280,
    (512, True, False): 1280,
    (512, False, False): 3200,
}


def _gate_fallbacks(need_dd: bool, need_distribution: bool):
    """Calibration-key fallback order: the exact gate combo first, then
    combos with MORE gates on (more scratch -> smaller, always-safe
    caps), fewest extra gates first, ending at all-on."""
    combos = [
        (dd, dist)
        for dd in ((True,) if need_dd else (False, True))
        for dist in ((True,) if need_distribution else (False, True))
    ]
    exact = (need_dd, need_distribution)
    rest = [c for c in combos if c != exact]
    rest.sort(key=lambda c: (c[0] + c[1], c))
    return [exact] + rest


def max_feasible_tile_cap(pix: int, need_dd: bool = True,
                          need_distribution: bool = True) -> int:
    """Largest max_per_tile (128-multiple) whose backward kernel fits
    the scoped-VMEM stack at the minimum CL=128 chunk, for the given
    channel gates. The Trainer clamps its grow-and-replay ceiling to
    this (at its own step's gates) and falls back to the exact
    flat-stream compositor when a scene outgrows it (train/loop.py)."""
    if pix > 512:
        return 0  # _bwd_pref rejects these outright
    for dd, dist in _gate_fallbacks(need_dd, need_distribution):
        cap = _BWD_CAP_CALIBRATED.get((pix, dd, dist))
        if cap is not None:
            return cap
    # Uncalibrated tile shapes: take the nearest calibrated bound, never
    # scaled up (smaller tiles only gain headroom; larger lose it).
    base = 256 if pix <= 256 else 512
    cap = max_feasible_tile_cap(base, need_dd, need_distribution)
    cap *= min(1.0, base / pix)
    return max(128, int(cap) // 128 * 128)


def _pick_chunk(L: int, pref: int) -> int:
    """Largest 128-multiple chunk <= pref that divides L (the in-kernel
    dynamic slice must stay in bounds: a chunk that doesn't divide L
    reads past the block on the last iteration)."""
    c = min(pref, L)
    while c > 128 and L % c != 0:
        c -= 128
    if L % c != 0:
        raise ValueError(f"max_per_tile={L} must be a multiple of 128")
    return c


def _scan_lanes(x, op, fill):
    """Inclusive prefix scan along the last (lane) axis via the
    Hillis-Steele doubling network."""
    n = x.shape[-1]
    s = 1
    while s < n:
        shifted = jnp.concatenate(
            [jnp.full_like(x[..., :s], fill), x[..., :-s]], axis=-1
        )
        x = op(x, shifted)
        s *= 2
    return x


def _cumsum_lanes(x):
    return _scan_lanes(x, jnp.add, 0)


def _excl_cumprod(x):
    inc = _scan_lanes(x, jnp.multiply, 1.0)
    return jnp.concatenate([jnp.ones_like(inc[..., :1]), inc[..., :-1]],
                           axis=-1)


def _pixel_coords(origins_ref, t, config):
    th, tw = config.tile_h, config.tile_w
    pix = th * tw
    ox = origins_ref[t, 0].astype(jnp.float32)
    oy = origins_ref[t, 1].astype(jnp.float32)
    pid = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    px = ox + (pid % tw).astype(jnp.float32)
    py = oy + (pid // tw).astype(jnp.float32)
    inside = (px < config.width) & (py < config.height)
    return px, py, inside


def _chunk_common(feat_ref, off, chunk, count, px, py, inside, t_dec):
    """Shared per-chunk recompute: alpha, masks, transmittance, weights.

    One scan per chunk. The decaying transmittance chain
    ``t_incl = t_dec * cumprod(q)`` (q = 1 for invalid lanes) is monotone
    non-increasing along the depth axis, so the early-termination
    predicate ``t_incl < T_STOP`` latches by itself — the first failing
    instance and everything after it satisfy it. That is the same test
    the sequential reference applies (forward.cu:539-543:
    ``T*(1-alpha) < 1e-4 -> done``) expressed on the prefix product, and
    it replaces the carried done flag + its cumsum latch + the separate
    frozen-T product scan of the previous design (3 of the 4 per-chunk
    Hillis-Steele networks). Monotonicity holds up to scan-tree rounding
    (ulps); a flip needs t_incl within ulps of T_STOP and would admit one
    instance of weight ~1e-4 — far below the kernel's tolerance budget.
    """
    blk = jnp.transpose(feat_ref[0, pl.ds(off, chunk), :], (1, 0))  # (24, CL)
    mean_x, mean_y = blk[0], blk[1]
    con_a, con_b, con_c = blk[2], blk[3], blk[4]
    opac, z = blk[5], blk[6]
    f = blk[7:24]  # (17, CL): rgb(0:3), dist(3), phasor(4:11), flow(11:17)
    lane = off + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    present = lane < count

    ddx = mean_x[None, :] - px  # (PIX, CL)
    ddy = mean_y[None, :] - py
    power = (
        -0.5 * (con_a[None, :] * ddx * ddx + con_c[None, :] * ddy * ddy)
        - con_b[None, :] * ddx * ddy
    )
    exp_p = jnp.exp(jnp.minimum(power, 0.0))
    raw = opac[None, :] * exp_p
    alpha = jnp.minimum(ALPHA_MAX, raw)
    valid = (power <= 0.0) & (alpha >= ALPHA_EPS) & inside & present
    a_eff = jnp.where(valid, alpha, 0.0)
    q = 1.0 - a_eff
    t_excl = t_dec * _excl_cumprod(q)
    t_incl = t_excl * q
    contribute = valid & (t_incl >= T_STOP)
    w = jnp.where(contribute, alpha * t_excl, 0.0)
    w_p = w * t_excl
    t_dec_next = t_incl[..., -1:]
    return (blk, f, z, ddx, ddy, con_a, con_b, con_c, exp_p, raw, alpha, q,
            t_excl, t_incl, contribute, w, w_p, t_dec_next)


def _forward_kernel(counts_ref, origins_ref, feat_ref, bg_ref,
                    out_ref, contrib_ref, *, config: RasterConfig,
                    chunk: int):
    t = pl.program_id(0)
    pix = config.tile_pixels
    L = feat_ref.shape[1]
    n_chunks = pl.cdiv(L, chunk)
    count = counts_ref[t]
    px, py, inside = _pixel_coords(origins_ref, t, config)
    need_dd = config.need_dd
    need_dist = config.need_distribution

    contrib_ref[0, 0, :] = jnp.zeros((L,), jnp.float32)

    def body(carry):
        off = carry["c"] * chunk
        (blk, f, z, ddx, ddy, _, _, _, _, _, alpha, q, t_excl, t_incl,
         contribute, w, w_p, t_dec_next) = _chunk_common(
            feat_ref, off, chunk, count, px, py, inside, carry["t_dec"]
        )

        sums_w = jax.lax.dot_general(
            w, f, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (PIX, 17): cols 0:4 (rgb,dist) and 11:17 (flow) valid
        sums_wp = jax.lax.dot_general(
            w_p, f, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # cols 4:11 (phasor) valid
        c_f32 = contribute.astype(jnp.float32)
        contrib_ref[0, 0, pl.ds(off, chunk)] = jnp.sum(c_f32, axis=0)

        col = jax.lax.broadcasted_iota(jnp.int32, (1, 17), 1)
        new = dict(carry)
        new["c"] = carry["c"] + 1
        new["t_dec"] = t_dec_next
        # Frozen final T (the reference's T sticks at the last assigned
        # test_T, forward.cu:539-546): the min over contributing lanes of
        # t_incl — no product scan needed (t_incl is monotone and every
        # contributing value <= the carried frozen value).
        new["t_frozen"] = jnp.min(
            jnp.where(contribute, t_incl, carry["t_frozen"]),
            axis=-1, keepdims=True,
        )
        new["accum"] = carry["accum"] + jnp.where(
            (col >= 4) & (col < 11), sums_wp, sums_w
        )
        new["a_run"] = carry["a_run"] + jnp.sum(w, axis=-1, keepdims=True)

        if need_dd:
            # depth distortion with running exclusive moments
            wz = w * z[None, :]
            wz2 = wz * z[None, :]
            a_ex = carry["a_run"] + _cumsum_lanes(w) - w
            wz_ex = carry["wz_run"] + _cumsum_lanes(wz) - wz
            wz2_ex = carry["wz2_run"] + _cumsum_lanes(wz2) - wz2
            zz = z[None, :] * z[None, :]
            dd_c = jnp.sum(w * zz * a_ex - 2.0 * wz * wz_ex + w * wz2_ex,
                           axis=-1, keepdims=True)
            new["dd"] = carry["dd"] + dd_c
            new["wz_run"] = carry["wz_run"] + jnp.sum(wz, -1, keepdims=True)
            new["wz2_run"] = carry["wz2_run"] + jnp.sum(wz2, -1, keepdims=True)

        if need_dist:
            # first contributing sample per pixel (alpha, dist, amp).
            # Within a chunk the first contributing lane is the first
            # valid lane (a valid non-contributing lane implies
            # saturation, after which nothing contributes), so its
            # exclusive product is exactly 1.0 and t_excl == t_dec holds
            # bit-exactly — and strictly fails for every later
            # contributing lane (q <= 1 - ALPHA_EPS there).
            onehot = contribute & (t_excl == carry["t_dec"])
            oh = onehot.astype(jnp.float32)
            cand = jnp.concatenate(
                [
                    jnp.sum(oh * alpha, axis=-1, keepdims=True),
                    jnp.sum(oh * f[3][None, :], axis=-1, keepdims=True),
                    jnp.sum(oh * f[6][None, :], axis=-1, keepdims=True),
                ],
                axis=-1,
            )
            any_c = jnp.max(c_f32, axis=-1, keepdims=True)
            new["first"] = jnp.where(
                carry["has_first"] > 0.5, carry["first"],
                jnp.where(any_c > 0.5, cand, carry["first"]),
            )
            new["has_first"] = jnp.maximum(carry["has_first"], any_c)
        return new

    def cond(carry):
        c, t_dec = carry["c"], carry["t_dec"]
        return ((c * chunk < count) & (c < n_chunks)
                & (jnp.max(t_dec) >= T_STOP))

    zeros1 = jnp.zeros((pix, 1), jnp.float32)
    init = {
        "c": jnp.int32(0),
        "t_dec": jnp.ones((pix, 1), jnp.float32),
        "t_frozen": jnp.ones((pix, 1), jnp.float32),
        "accum": jnp.zeros((pix, 17), jnp.float32),
        "a_run": zeros1,
    }
    if need_dd:
        init.update(dd=zeros1, wz_run=zeros1, wz2_run=zeros1)
    if need_dist:
        init.update(first=jnp.zeros((pix, 3), jnp.float32), has_first=zeros1)
    fin = jax.lax.while_loop(cond, body, init)

    accum, a_run, t_frozen = fin["accum"], fin["a_run"], fin["t_frozen"]
    bg = bg_ref[0]  # (PIX, 12)
    color = accum[:, 0:3] + t_frozen * bg[:, 0:3]
    phasor = accum[:, 4:11] + t_frozen * bg[:, 4:11]
    out_ref[0] = jnp.concatenate(
        [
            color,  # 0:3
            accum[:, 3:4],  # 3 depth
            phasor,  # 4:11
            a_run,  # 11 acc
            fin["dd"] if need_dd else zeros1,  # 12
            t_frozen,  # 13 final_T
            fin["first"] if need_dist else jnp.zeros((pix, 3)),  # 14:17
            a_run,  # 17 A_tot
            fin["wz_run"] if need_dd else zeros1,  # 18
            fin["wz2_run"] if need_dd else zeros1,  # 19
            accum[:, 11:17],  # 20:26 flow (reference render_flow bg = 0)
            jnp.zeros((pix, 6), jnp.float32),  # 26:32
        ],
        axis=-1,
    )


def _backward_kernel(counts_ref, origins_ref, feat_ref, bg_ref,
                     out_res_ref, g_ref, dfeat_ref, *,
                     config: RasterConfig, chunk: int, has_flow: bool):
    """Gradient w.r.t. the packed feature block.

    Single front-to-back pass: suffix sums needed by the alpha chain are
    totals-minus-inclusive-prefix, with totals from the forward residual
    block. Mirrors the math of backward.cu:609-889 in prefix form;
    atomicAdd scatter becomes per-instance row writes (deterministic).
    """
    t = pl.program_id(0)
    pix = config.tile_pixels
    L = feat_ref.shape[1]
    n_chunks = pl.cdiv(L, chunk)
    count = counts_ref[t]
    px, py, inside = _pixel_coords(origins_ref, t, config)
    # When the forward never produced a dd channel its cotangent is
    # exactly zero: drop the whole distortion chain (one scan + the sym
    # recurrence per chunk).
    need_dd = config.need_dd

    out = out_res_ref[0]  # (PIX, 32) forward outputs/residuals
    g = g_ref[0]  # (PIX, 32) cotangents
    bg = bg_ref[0]  # (PIX, 12)

    t_final = out[:, 13:14]
    a_tot = out[:, 17:18]
    g_acc = g[:, 11:12]

    accum_f = jnp.concatenate(
        [out[:, 0:3] - t_final * bg[:, 0:3], out[:, 3:4]], axis=-1
    )  # (PIX, 4) pre-bg rgb + depth sums
    accum_p = out[:, 4:11] - t_final * bg[:, 4:11]  # (PIX, 7)
    e_tot = (
        jnp.sum(g[:, 0:4] * accum_f, axis=-1, keepdims=True) + g_acc * a_tot
    )
    ep_tot = jnp.sum(g[:, 4:11] * accum_p, axis=-1, keepdims=True)
    if need_dd:
        wz_tot = out[:, 18:19]
        wz2_tot = out[:, 19:20]
        g_dd = g[:, 12:13]
        u_dd_tot = g_dd * 2.0 * (a_tot * wz2_tot - wz_tot * wz_tot)
    bg_dot = (
        jnp.sum(bg[:, 0:3] * g[:, 0:3], axis=-1, keepdims=True)
        + jnp.sum(bg[:, 4:11] * g[:, 4:11], axis=-1, keepdims=True)
    )

    dfeat_ref[0] = jnp.zeros_like(dfeat_ref[0])

    def body(carry):
        off = carry["c"] * chunk
        (blk, f, z, ddx, ddy, con_a, con_b, con_c, exp_p, raw, alpha, q,
         t_excl, t_incl, contribute, w, w_p, t_dec_next) = _chunk_common(
            feat_ref, off, chunk, count, px, py, inside, carry["t_dec"]
        )
        not_clamped = raw < ALPHA_MAX

        e = jax.lax.dot_general(
            g[:, 0:4], f[0:4, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) + g_acc  # (PIX, CL)
        e_p = jax.lax.dot_general(
            g[:, 4:11], f[4:11, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        u_f_incl = carry["u_f"] + _cumsum_lanes(w * e)
        u_p_incl = carry["u_p"] + _cumsum_lanes(w_p * e_p)

        d_alpha = (
            t_excl * e - (e_tot - u_f_incl) / q
            + t_excl * t_excl * e_p - 2.0 * (ep_tot - u_p_incl) / q
            - t_final / q * bg_dot
        )
        if need_dd:
            sym = (z[None, :] * z[None, :] * a_tot
                   - 2.0 * z[None, :] * wz_tot + wz2_tot)
            u_dd_incl = carry["u_dd"] + _cumsum_lanes(g_dd * w * sym)
            d_alpha += g_dd * t_excl * sym - (u_dd_tot - u_dd_incl) / q
            d_z = jnp.sum(
                g_dd * 2.0 * w * (z[None, :] * a_tot - wz_tot), axis=0
            )
        else:
            d_z = jnp.zeros((chunk,), jnp.float32)
        d_alpha = jnp.where(contribute, d_alpha, 0.0)

        d_power = jnp.where(not_clamped, d_alpha * alpha, 0.0)
        d_opac = jnp.sum(jnp.where(not_clamped, d_alpha * exp_p, 0.0), axis=0)
        d_mean_x = jnp.sum(
            d_power * -(con_a[None, :] * ddx + con_b[None, :] * ddy), axis=0
        )
        d_mean_y = jnp.sum(
            d_power * -(con_c[None, :] * ddy + con_b[None, :] * ddx), axis=0
        )
        d_con_a = jnp.sum(-0.5 * ddx * ddx * d_power, axis=0)
        d_con_b = jnp.sum(-ddx * ddy * d_power, axis=0)
        d_con_c = jnp.sum(-0.5 * ddy * ddy * d_power, axis=0)

        d_f = jax.lax.dot_general(
            g[:, 0:4], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (4, CL): rgb + dist grads
        d_p = jax.lax.dot_general(
            g[:, 4:11], w_p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (7, CL)
        # Flow channels: grads reach the flow features only (weights are
        # detached — no d_alpha term — matching the reference's detached
        # render_flow geometry, gaussian_renderer/__init__.py:160-171).
        if has_flow:
            d_flow = jax.lax.dot_general(
                g[:, 20:26], w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (6, CL)
        else:
            d_flow = jnp.zeros((6, chunk), jnp.float32)

        d_blk = jnp.concatenate(
            [
                d_mean_x[None], d_mean_y[None],
                d_con_a[None], d_con_b[None], d_con_c[None],
                d_opac[None], d_z[None],
                d_f,  # 7:11 (rgb, dist)
                d_p,  # 11:18 (phasor)
                d_flow,  # 18:24
            ],
            axis=0,
        )  # (24, CL)
        dfeat_ref[0, pl.ds(off, chunk), :] = jnp.transpose(d_blk, (1, 0))

        new = dict(carry)
        new["c"] = carry["c"] + 1
        new["t_dec"] = t_dec_next
        new["u_f"] = u_f_incl[:, -1:]
        new["u_p"] = u_p_incl[:, -1:]
        if need_dd:
            new["u_dd"] = u_dd_incl[:, -1:]
        return new

    def cond(carry):
        c, t_dec = carry["c"], carry["t_dec"]
        return ((c * chunk < count) & (c < n_chunks)
                & (jnp.max(t_dec) >= T_STOP))

    zeros1 = jnp.zeros((pix, 1), jnp.float32)
    init = {
        "c": jnp.int32(0),
        "t_dec": jnp.ones((pix, 1), jnp.float32),
        "u_f": zeros1,
        "u_p": zeros1,
    }
    if need_dd:
        init["u_dd"] = zeros1
    jax.lax.while_loop(cond, body, init)


class PallasForward(NamedTuple):
    out: jnp.ndarray  # (T, PIX, 24)
    contrib: jnp.ndarray  # (T, L)


def composite_forward_pallas(feat_tl, bg_tiles, counts, origins,
                             config: RasterConfig, interpret: bool = False):
    T, L, _ = feat_tl.shape
    pix = config.tile_pixels
    chunk = _pick_chunk(L, _fwd_pref(L, pix))
    kernel = functools.partial(_forward_kernel, config=config, chunk=chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, L, 24), lambda t, c_ref, o_ref: (t, 0, 0)),
            pl.BlockSpec((1, pix, 12), lambda t, c_ref, o_ref: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, pix, 32), lambda t, c_ref, o_ref: (t, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda t, c_ref, o_ref: (t, 0, 0)),
        ],
    )
    out, contrib = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, pix, 32), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, L), jnp.float32),
        ],
        interpret=interpret,
    )(counts, origins, feat_tl, bg_tiles)
    return PallasForward(out=out, contrib=contrib[:, 0, :])


def composite_backward_pallas(feat_tl, bg_tiles, out_res, g, counts,
                              origins, config: RasterConfig,
                              interpret: bool = False,
                              has_flow: bool = True):
    T, L, _ = feat_tl.shape
    pix = config.tile_pixels
    chunk = _pick_chunk(
        L, _bwd_pref(L, pix, config.need_dd, config.need_distribution))
    kernel = functools.partial(_backward_kernel, config=config, chunk=chunk,
                               has_flow=has_flow)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, L, 24), lambda t, c_ref, o_ref: (t, 0, 0)),
            pl.BlockSpec((1, pix, 12), lambda t, c_ref, o_ref: (t, 0, 0)),
            pl.BlockSpec((1, pix, 32), lambda t, c_ref, o_ref: (t, 0, 0)),
            pl.BlockSpec((1, pix, 32), lambda t, c_ref, o_ref: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, L, 24), lambda t, c_ref, o_ref: (t, 0, 0)),
        ],
    )
    (dfeat,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T, L, 24), jnp.float32)],
        interpret=interpret,
    )(counts, origins, feat_tl, bg_tiles, out_res, g)
    return dfeat


# ---------------------------------------------------------------------------
# Packing & the custom-vjp wrapper


def pack_gaussian_features(pre, flow=None) -> jnp.ndarray:
    """PreprocessOutputs -> one (P, 24) feature matrix so the tile layout
    needs a single instance gather (random gathers cost ~5 ms per million
    rows on v5e; eight separate ones dominate the frame otherwise).

    `flow` is an optional (P, 6) block of fused scene-flow channels
    (forward 3 + backward 3), composited with detached alpha*T weights.
    """
    P = pre.mean2d.shape[0]
    return jnp.concatenate(
        [
            pre.mean2d,  # 0:2
            pre.conic,  # 2:5
            pre.opacity[:, None],  # 5
            pre.dist_ndc[:, None],  # 6
            pre.rgb,  # 7:10
            pre.dist[:, None],  # 10
            pre.phasor,  # 11:18
            jnp.zeros((P, 6), jnp.float32) if flow is None else flow,  # 18:24
        ],
        axis=-1,
    )


def _bg_to_tiles(bg_map, T, config: RasterConfig):
    th, tw = config.tile_h, config.tile_w
    pix = th * tw
    bg_h, bg_w = bg_map.shape[1], bg_map.shape[2]
    gw_l = -(-bg_w // tw)
    gh_l = T // gw_l
    bg_p = jnp.pad(
        bg_map, ((0, 0), (0, gh_l * th - bg_h), (0, gw_l * tw - bg_w))
    )
    bgt = (
        bg_p.reshape(7, gh_l, th, gw_l, tw)
        .transpose(1, 3, 2, 4, 0)
        .reshape(T, pix, 7)
    )
    return jnp.concatenate(
        [bgt[..., :3], jnp.zeros((T, pix, 1)), bgt, jnp.zeros((T, pix, 1))],
        axis=-1,
    )  # (T, PIX, 12)


def _default_origins(T, config: RasterConfig):
    gw = config.grid_w
    tid = jnp.arange(T, dtype=jnp.int32)
    return jnp.stack(
        [(tid % gw) * config.tile_w, (tid // gw) * config.tile_h], -1
    ).astype(jnp.int32)


def _make_pallas_vjp(config: RasterConfig, interpret: bool, has_flow: bool):
    """custom_vjp over (feat, bg, counts, origins): no closed-over tracers
    (closures over traced values break under lax.cond + grad); the int
    inputs get float0 cotangents."""
    import numpy as np

    @jax.custom_vjp
    def run(feat_tl, bg_tiles, counts, origins):
        return composite_forward_pallas(
            feat_tl, bg_tiles, counts, origins, config, interpret
        )

    def run_fwd(feat_tl, bg_tiles, counts, origins):
        fwd = composite_forward_pallas(
            feat_tl, bg_tiles, counts, origins, config, interpret
        )
        return fwd, (feat_tl, bg_tiles, counts, origins, fwd.out)

    def run_bwd(res, ct):
        feat_tl, bg_tiles, counts, origins, out = res
        g = ct.out
        dfeat = composite_backward_pallas(
            feat_tl, bg_tiles, out, g, counts, origins, config, interpret,
            has_flow,
        )
        t_final = out[..., 13:14]
        dbg = jnp.zeros_like(bg_tiles)
        dbg = dbg.at[..., 0:3].set(t_final * g[..., 0:3])
        dbg = dbg.at[..., 4:11].set(t_final * g[..., 4:11])
        return (
            dfeat, dbg,
            np.zeros(counts.shape, jax.dtypes.float0),
            np.zeros(origins.shape, jax.dtypes.float0),
        )

    run.defvjp(run_fwd, run_bwd)
    return run


def _run_pallas_vjp(feat_tl, bg_tiles, counts, origins,
                    config: RasterConfig, interpret: bool,
                    has_flow: bool = True):
    run = _make_pallas_vjp(config, interpret, has_flow)
    fwd = run(feat_tl, bg_tiles, counts, origins)
    # Stop gradients through the non-differentiable output columns
    # (final_T/first/residuals at 13:20 and the pad at 26:; the flow
    # columns 20:26 ARE differentiable — w.r.t. the flow features only).
    o = fwd.out
    o = o.at[..., 13:20].set(jax.lax.stop_gradient(o[..., 13:20]))
    o = o.at[..., 26:].set(jax.lax.stop_gradient(o[..., 26:]))
    fwd = PallasForward(
        out=o,
        contrib=jax.lax.stop_gradient(fwd.contrib),
    )
    return unpack_outputs(fwd, config)


def composite_packed_pallas(packed_tl, gauss_id, bg_map,
                            config: RasterConfig, tile_origins=None,
                            interpret: bool = False, has_flow: bool = True):
    """Composite from a gathered (T, L, 24) packed feature block.

    The layout is front-packed per tile, so padding is handled purely by
    the per-tile count — no masking of the gathered garbage rows needed.
    ``has_flow=False`` (static) drops the flow-gradient matmul from the
    backward kernel (the fwd flow columns ride the main feature matmul
    either way and cost nothing extra).
    """
    T, L, _ = packed_tl.shape
    counts = jnp.sum(gauss_id >= 0, axis=-1).astype(jnp.int32)
    origins = (
        tile_origins.astype(jnp.int32)
        if tile_origins is not None
        else _default_origins(T, config)
    )
    bg_tiles = _bg_to_tiles(bg_map, T, config)
    return _run_pallas_vjp(packed_tl, bg_tiles, counts, origins, config,
                           interpret, has_flow)


def composite_tiles_pallas(feats, bg_map, config: RasterConfig,
                           tile_origins=None, interpret: bool = False):
    """Drop-in replacement for composite_tiles from TileFeatures.

    Builds the packed (T, L, 24) block from the separate feature arrays
    (tests and the sharded path use this); the packing concatenation is
    XLA, so cotangents map back onto the TileFeatures leaves.
    """
    T, L = feats.gauss_id.shape
    packed_tl = jnp.concatenate(
        [
            feats.mean2d,
            feats.conic,
            feats.opacity[..., None],
            feats.dist_ndc[..., None],
            feats.rgb,
            feats.dist[..., None],
            feats.phasor,
            (jnp.zeros((T, L, 6), jnp.float32)
             if feats.flow is None else feats.flow),
        ],
        axis=-1,
    )
    return composite_packed_pallas(packed_tl, feats.gauss_id, bg_map, config,
                                   tile_origins, interpret,
                                   has_flow=feats.flow is not None)


def unpack_outputs(fwd: PallasForward, config: RasterConfig):
    """Kernel output block -> TileOutputs."""
    from gftorf_tpu.render.composite import TileOutputs

    o = fwd.out
    return TileOutputs(
        color=o[..., 0:3],
        phasor=o[..., 4:11],
        depth=o[..., 3],
        acc=o[..., 11],
        dd=o[..., 12],
        distribution=o[..., 14:17],
        contrib_pixels=fwd.contrib,
        flow=o[..., 20:26],
    )

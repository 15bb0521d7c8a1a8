"""Pallas TPU kernel for tile compositing (forward).

The XLA prefix-op compositor (render/composite.py) materializes many
(PIX, L) intermediates in HBM; this kernel keeps the whole per-tile
front-to-back blend in VMEM: one HBM read of the (C, L) feature block,
one write of the (PIX, 24) output block, with the depth axis processed
in CL-sized chunks under a while_loop that exits as soon as every pixel
has saturated (the T < 1e-4 early-termination of forward.cu:539-543).

Layouts are lane-aligned: feature blocks are (T, C, L) so the depth
axis L rides the 128-wide lanes; per-chunk intermediates are (PIX, CL);
weighted feature sums are MXU matmuls contracting CL.

Channel packing
  geo   (T, 8, L):  mean_x, mean_y, conic_a, conic_b, conic_c,
                    opacity, dist_ndc, (pad)
  wfeat (T, 12, L): rgb0..2, dist, phasor0..6, (pad)
  bg    (T, PIX, 12): cols 0:3 color bg, 4:11 phasor bg
  out   (T, PIX, 24):
        0:3 color(+bg), 3 depth, 4:11 phasor(+bg), 11 acc, 12 dd,
        13 final_T, 14:17 first-sample (alpha, dist, amp),
        17 A_tot, 18 WZ_tot, 19 WZ2_tot (residuals for backward),
        20:24 pad
  contrib (T, L): per-instance contributing-pixel counts
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

CHUNK = 256  # depth-axis chunk size (multiple of 128)


def _scan_lanes(x, op, fill):
    """Inclusive prefix scan along the last (lane) axis via the
    Hillis-Steele doubling network (Mosaic lowers neither cumsum nor
    cumprod inside kernels)."""
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



def _forward_kernel(counts_ref, origins_ref, geo_ref, wfeat_ref, bg_ref,
                    out_ref, contrib_ref, *, config: RasterConfig, chunk: int):
    t = pl.program_id(0)
    th, tw = config.tile_h, config.tile_w
    pix = th * tw
    L = geo_ref.shape[-1]
    n_chunks = pl.cdiv(L, chunk)

    count = counts_ref[t]
    ox = origins_ref[t, 0].astype(jnp.float32)
    oy = origins_ref[t, 1].astype(jnp.float32)

    # Pixel coordinates, (PIX, 1) column layout.
    pid = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    px = ox + (pid % tw).astype(jnp.float32)
    py = oy + (pid // tw).astype(jnp.float32)
    inside = (px < config.width) & (py < config.height)

    contrib_ref[0, 0, :] = jnp.zeros((L,), jnp.float32)

    def body(carry):
        (c, t_run, done, accum, dd, a_run, wz_run, wz2_run,
         first, has_first) = carry
        off = c * chunk
        geo = geo_ref[0, :, pl.ds(off, chunk)]  # (8, CL)
        mean_x, mean_y = geo[0], geo[1]
        con_a, con_b, con_c = geo[2], geo[3], geo[4]
        opac, z = geo[5], geo[6]

        ddx = mean_x[None, :] - px  # (PIX, CL)
        ddy = mean_y[None, :] - py
        power = (
            -0.5 * (con_a[None, :] * ddx * ddx + con_c[None, :] * ddy * ddy)
            - con_b[None, :] * ddx * ddy
        )
        alpha = jnp.minimum(
            ALPHA_MAX, opac[None, :] * jnp.exp(jnp.minimum(power, 0.0))
        )
        valid = (power <= 0.0) & (alpha >= ALPHA_EPS) & inside
        a_eff = jnp.where(valid, alpha, 0.0)
        q = 1.0 - a_eff
        t_excl = t_run * _excl_cumprod(q)
        fail = valid & (t_excl * q < T_STOP)
        # boolean carries don't legalize in Mosaic loops -> carry f32 flags
        done_c = jnp.maximum(
            done, (_cumsum_lanes(fail.astype(jnp.float32)) > 0.0).astype(
                jnp.float32
            ),
        )
        contribute = valid & (done_c < 0.5)

        w = jnp.where(contribute, alpha * t_excl, 0.0)
        w_p = w * t_excl

        f = wfeat_ref[0, :, pl.ds(off, chunk)]  # (12, CL)
        sums_w = jax.lax.dot_general(
            w, f, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (PIX, 12): cols 0:4 (rgb,dist) valid
        sums_wp = jax.lax.dot_general(
            w_p, f, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # cols 4:11 (phasor) valid
        acc_c = jnp.sum(w, axis=-1, keepdims=True)

        # depth distortion with running exclusive moments
        wz = w * z[None, :]
        wz2 = wz * z[None, :]
        a_ex = a_run + _cumsum_lanes(w) - w
        wz_ex = wz_run + _cumsum_lanes(wz) - wz
        wz2_ex = wz2_run + _cumsum_lanes(wz2) - wz2
        zz = z[None, :] * z[None, :]
        dd_c = jnp.sum(w * zz * a_ex - 2.0 * wz * wz_ex + w * wz2_ex,
                       axis=-1, keepdims=True)

        # first contributing sample (alpha, dist, phasor amp = f[9]? amp
        # channel of phasor = wfeat row 4+2=6) per pixel
        c_i32 = contribute.astype(jnp.int32)
        onehot = (_cumsum_lanes(c_i32) == 1) & contribute
        oh = onehot.astype(jnp.float32)
        cand = jnp.concatenate(
            [
                jnp.sum(oh * alpha, axis=-1, keepdims=True),
                jnp.sum(oh * f[3][None, :], axis=-1, keepdims=True),
                jnp.sum(oh * f[6][None, :], axis=-1, keepdims=True),
            ],
            axis=-1,
        )  # (PIX, 3)
        any_c = jnp.max(contribute.astype(jnp.float32), axis=-1,
                        keepdims=True)
        first = jnp.where(has_first > 0.5, first,
                          jnp.where(any_c > 0.5, cand, first))
        has_first = jnp.maximum(has_first, any_c)

        contrib_ref[0, 0, pl.ds(off, chunk)] = jnp.sum(
            contribute.astype(jnp.float32), axis=0
        )

        # sums_w is valid in cols 0:4 (rgb, dist) and sums_wp in 4:11
        # (phasor); merge by column range.
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 12), 1)
        new_accum = (
            accum
            + jnp.where(col < 4, sums_w, 0.0)
            + jnp.where((col >= 4) & (col < 11), sums_wp, 0.0)
        )

        qm = jnp.where(contribute, q, 1.0)
        t_run = t_run * _scan_lanes(qm, jnp.multiply, 1.0)[..., -1:]
        a_run = a_run + acc_c
        wz_run = wz_run + jnp.sum(wz, axis=-1, keepdims=True)
        wz2_run = wz2_run + jnp.sum(wz2, axis=-1, keepdims=True)
        return (c + 1, t_run, done_c[:, -1:], new_accum, dd + dd_c,
                a_run, wz_run, wz2_run, first, has_first)

    def cond(carry):
        c, t_run, done = carry[0], carry[1], carry[2]
        return (c * chunk < count) & (c < n_chunks) & (jnp.min(done) < 0.5)

    init = (
        jnp.int32(0),
        jnp.ones((pix, 1), jnp.float32),  # t_run
        jnp.zeros((pix, 1), jnp.float32),  # done flag (f32: Mosaic carry)
        jnp.zeros((pix, 12), jnp.float32),  # accum
        jnp.zeros((pix, 1), jnp.float32),  # dd
        jnp.zeros((pix, 1), jnp.float32),  # a_run
        jnp.zeros((pix, 1), jnp.float32),  # wz_run
        jnp.zeros((pix, 1), jnp.float32),  # wz2_run
        jnp.zeros((pix, 3), jnp.float32),  # first
        jnp.zeros((pix, 1), jnp.float32),  # has_first (f32)
    )
    (_, t_run, _, accum, dd, a_run, wz_run, wz2_run, first, _) = (
        jax.lax.while_loop(cond, body, init)
    )

    bg = bg_ref[0]  # (PIX, 12)
    color = accum[:, 0:3] + t_run * bg[:, 0:3]
    phasor = accum[:, 4:11] + t_run * bg[:, 4:11]
    out = jnp.concatenate(
        [
            color,  # 0:3
            accum[:, 3:4],  # 3 depth
            phasor,  # 4:11
            a_run,  # 11 acc
            dd,  # 12
            t_run,  # 13 final_T
            first,  # 14:17
            a_run,  # 17 A_tot (= acc)
            wz_run,  # 18
            wz2_run,  # 19
            jnp.zeros((pix, 4), jnp.float32),  # 20:24 pad
        ],
        axis=-1,
    )
    out_ref[0] = out


def _backward_kernel(counts_ref, origins_ref, geo_ref, wfeat_ref, bg_ref,
                     out_res_ref, g_ref, dgeo_ref, dwfeat_ref, *,
                     config: RasterConfig, chunk: int):
    """Gradient of the compositing w.r.t. geo and wfeat blocks.

    Single front-to-back pass: suffix sums needed by the alpha chain are
    total - inclusive prefix, with totals taken from the forward residual
    block. Mirrors the math of backward.cu:609-889 expressed in prefix
    form; scatter-adds become per-instance row writes (deterministic).
    """
    t = pl.program_id(0)
    th, tw = config.tile_h, config.tile_w
    pix = th * tw
    L = geo_ref.shape[-1]
    n_chunks = pl.cdiv(L, chunk)

    count = counts_ref[t]
    ox = origins_ref[t, 0].astype(jnp.float32)
    oy = origins_ref[t, 1].astype(jnp.float32)
    pid = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    px = ox + (pid % tw).astype(jnp.float32)
    py = oy + (pid // tw).astype(jnp.float32)
    inside = (px < config.width) & (py < config.height)

    out = out_res_ref[0]  # (PIX, 24) forward outputs/residuals
    g = g_ref[0]  # (PIX, 24) cotangents
    bg = bg_ref[0]  # (PIX, 12)

    t_final = out[:, 13:14]
    a_tot = out[:, 17:18]
    wz_tot = out[:, 18:19]
    wz2_tot = out[:, 19:20]
    g_acc = g[:, 11:12]
    g_dd = g[:, 12:13]

    # Totals of the w/w_p-weighted dot sums (pre-background):
    accum_f = jnp.concatenate(
        [out[:, 0:3] - t_final * bg[:, 0:3], out[:, 3:4]], axis=-1
    )  # (PIX, 4) rgb+depth
    accum_p = out[:, 4:11] - t_final * bg[:, 4:11]  # (PIX, 7)
    e_tot = (
        jnp.sum(g[:, 0:4] * accum_f, axis=-1, keepdims=True)
        + g_acc * a_tot
    )
    ep_tot = jnp.sum(g[:, 4:11] * accum_p, axis=-1, keepdims=True)
    u_dd_tot = g_dd * 2.0 * (a_tot * wz2_tot - wz_tot * wz_tot)
    bg_dot = (
        jnp.sum(bg[:, 0:3] * g[:, 0:3], axis=-1, keepdims=True)
        + jnp.sum(bg[:, 4:11] * g[:, 4:11], axis=-1, keepdims=True)
    )

    dgeo_ref[0] = jnp.zeros_like(dgeo_ref[0])
    dwfeat_ref[0] = jnp.zeros_like(dwfeat_ref[0])

    def body(carry):
        c, t_run, done, u_f, u_p, u_dd = carry
        off = c * chunk
        geo = geo_ref[0, :, pl.ds(off, chunk)]
        mean_x, mean_y = geo[0], geo[1]
        con_a, con_b, con_c = geo[2], geo[3], geo[4]
        opac, z = geo[5], geo[6]

        ddx = mean_x[None, :] - px
        ddy = mean_y[None, :] - py
        power = (
            -0.5 * (con_a[None, :] * ddx * ddx + con_c[None, :] * ddy * ddy)
            - con_b[None, :] * ddx * ddy
        )
        exp_p = jnp.exp(jnp.minimum(power, 0.0))
        raw = opac[None, :] * exp_p
        alpha = jnp.minimum(ALPHA_MAX, raw)
        not_clamped = raw < ALPHA_MAX
        valid = (power <= 0.0) & (alpha >= ALPHA_EPS) & inside
        a_eff = jnp.where(valid, alpha, 0.0)
        q = 1.0 - a_eff
        t_excl = t_run * _excl_cumprod(q)
        fail = valid & (t_excl * q < T_STOP)
        done_c = jnp.maximum(
            done, (_cumsum_lanes(fail.astype(jnp.float32)) > 0.0).astype(
                jnp.float32
            ),
        )
        contribute = valid & (done_c < 0.5)
        w = jnp.where(contribute, alpha * t_excl, 0.0)
        w_p = w * t_excl

        f = wfeat_ref[0, :, pl.ds(off, chunk)]  # (12, CL)

        # per-(pixel, instance) cotangent dot products
        e = jax.lax.dot_general(
            g[:, 0:4], f[0:4, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + g_acc  # (PIX, CL)
        e_p = jax.lax.dot_general(
            g[:, 4:11], f[4:11, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sym = z[None, :] * z[None, :] * a_tot - 2.0 * z[None, :] * wz_tot + wz2_tot

        u_f_incl = u_f + _cumsum_lanes(w * e)
        u_p_incl = u_p + _cumsum_lanes(w_p * e_p)
        u_dd_incl = u_dd + _cumsum_lanes(g_dd * w * sym)

        d_alpha = (
            t_excl * e - (e_tot - u_f_incl) / q
            + t_excl * t_excl * e_p - 2.0 * (ep_tot - u_p_incl) / q
            + g_dd * t_excl * sym - (u_dd_tot - u_dd_incl) / q
            - t_final / q * bg_dot
        )
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
        d_z = jnp.sum(
            g_dd * 2.0 * w * (z[None, :] * a_tot - wz_tot), axis=0
        )

        # per-instance feature grads: contract over pixels
        d_f = jax.lax.dot_general(
            g[:, 0:4], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (4, CL)
        d_p = jax.lax.dot_general(
            g[:, 4:11], w_p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (7, CL)

        dgeo_ref[0, 0, pl.ds(off, chunk)] = d_mean_x
        dgeo_ref[0, 1, pl.ds(off, chunk)] = d_mean_y
        dgeo_ref[0, 2, pl.ds(off, chunk)] = d_con_a
        dgeo_ref[0, 3, pl.ds(off, chunk)] = d_con_b
        dgeo_ref[0, 4, pl.ds(off, chunk)] = d_con_c
        dgeo_ref[0, 5, pl.ds(off, chunk)] = d_opac
        dgeo_ref[0, 6, pl.ds(off, chunk)] = d_z
        dwfeat_ref[0, 0:4, pl.ds(off, chunk)] = d_f
        dwfeat_ref[0, 4:11, pl.ds(off, chunk)] = d_p

        qm = jnp.where(contribute, q, 1.0)
        t_run = t_run * _scan_lanes(qm, jnp.multiply, 1.0)[..., -1:]
        return (
            c + 1, t_run, done_c[:, -1:],
            u_f_incl[:, -1:], u_p_incl[:, -1:], u_dd_incl[:, -1:],
        )

    def cond(carry):
        c, _, done = carry[0], carry[1], carry[2]
        return (c * chunk < count) & (c < n_chunks) & (jnp.min(done) < 0.5)

    init = (
        jnp.int32(0),
        jnp.ones((pix, 1), jnp.float32),
        jnp.zeros((pix, 1), jnp.float32),  # done flag (f32: Mosaic carry)
        jnp.zeros((pix, 1), jnp.float32),
        jnp.zeros((pix, 1), jnp.float32),
        jnp.zeros((pix, 1), jnp.float32),
    )
    jax.lax.while_loop(cond, body, init)


def composite_backward_pallas(geo, wfeat, bg_tiles, out_res, g, counts,
                              origins, config: RasterConfig,
                              interpret: bool = False):
    T, _, L = geo.shape
    pix = config.tile_pixels
    chunk = min(CHUNK, L)
    kernel = functools.partial(_backward_kernel, config=config, chunk=chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 8, L), lambda t, c_ref, o_ref: (t, 0, 0)),
            pl.BlockSpec((1, 12, L), lambda t, c_ref, o_ref: (t, 0, 0)),
            pl.BlockSpec((1, pix, 12), lambda t, c_ref, o_ref: (t, 0, 0)),
            pl.BlockSpec((1, pix, 24), lambda t, c_ref, o_ref: (t, 0, 0)),
            pl.BlockSpec((1, pix, 24), lambda t, c_ref, o_ref: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, L), lambda t, c_ref, o_ref: (t, 0, 0)),
            pl.BlockSpec((1, 12, L), lambda t, c_ref, o_ref: (t, 0, 0)),
        ],
    )
    dgeo, dwfeat = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, 8, L), jnp.float32),
            jax.ShapeDtypeStruct((T, 12, L), jnp.float32),
        ],
        interpret=interpret,
    )(counts, origins, geo, wfeat, bg_tiles, out_res, g)
    return dgeo, dwfeat


class PallasForward(NamedTuple):
    out: jnp.ndarray  # (T, PIX, 24)
    contrib: jnp.ndarray  # (T, L)


def pack_inputs(feats, bg_map, config: RasterConfig, tile_origins=None):
    """TileFeatures + bg -> lane-aligned kernel inputs.

    Returns (geo, wfeat, bg_tiles, counts, origins).
    """
    T, L = feats.gauss_id.shape
    th, tw = config.tile_h, config.tile_w
    pix = th * tw
    present = feats.gauss_id >= 0
    opac = jnp.where(present, feats.opacity, 0.0)
    geo = jnp.stack(
        [
            feats.mean2d[..., 0], feats.mean2d[..., 1],
            feats.conic[..., 0], feats.conic[..., 1], feats.conic[..., 2],
            opac, feats.dist_ndc, jnp.zeros_like(opac),
        ],
        axis=1,
    )  # (T, 8, L)
    wfeat = jnp.concatenate(
        [
            jnp.moveaxis(feats.rgb, -1, 1),  # (T, 3, L)
            feats.dist[:, None, :],
            jnp.moveaxis(feats.phasor, -1, 1),  # (T, 7, L)
            jnp.zeros((T, 1, L), jnp.float32),
        ],
        axis=1,
    )  # (T, 12, L)

    if tile_origins is None:
        gw = config.grid_w
        tid = jnp.arange(T, dtype=jnp.int32)
        tile_origins = jnp.stack([(tid % gw) * tw, (tid // gw) * th], -1)
    origins = tile_origins.astype(jnp.int32)

    # bg tiles (T, PIX, 12): cols 0:3 color bg, 4:11 phasor bg
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
    bg_tiles = jnp.concatenate(
        [bgt[..., :3], jnp.zeros((T, pix, 1)), bgt, jnp.zeros((T, pix, 1))],
        axis=-1,
    )  # (T, PIX, 12)

    # count = last present index + 1 (instances are front-packed)
    counts = jnp.sum(present, axis=-1).astype(jnp.int32)
    return geo, wfeat, bg_tiles, counts, origins


def pack_gaussian_features(pre) -> jnp.ndarray:
    """PreprocessOutputs -> one (P, 24) feature matrix so the tile layout
    needs a single instance gather (random gathers cost ~5 ms per million
    rows on v5e; eight separate ones dominate the frame otherwise).

    Columns 0:8 = geo rows, 8:20 = wfeat rows (see module docstring).
    """
    P = pre.mean2d.shape[0]
    pad1 = jnp.zeros((P, 1), jnp.float32)
    return jnp.concatenate(
        [
            pre.mean2d,  # 0:2
            pre.conic,  # 2:5
            pre.opacity[:, None],  # 5
            pre.dist_ndc[:, None],  # 6
            pad1,  # 7
            pre.rgb,  # 8:11
            pre.dist[:, None],  # 11
            pre.phasor,  # 12:19
            pad1,  # 19
            jnp.zeros((P, 4), jnp.float32),  # 20:24
        ],
        axis=-1,
    )


def composite_packed_pallas(packed_tl, gauss_id, bg_map,
                            config: RasterConfig, tile_origins=None,
                            interpret: bool = False):
    """Composite from a gathered (T, 24, L) packed feature block."""
    T, _, L = packed_tl.shape
    th, tw = config.tile_h, config.tile_w
    pix = th * tw
    present = gauss_id >= 0
    geo = packed_tl[:, 0:8]
    geo = geo.at[:, 5].set(jnp.where(present, geo[:, 5], 0.0))
    wfeat = packed_tl[:, 8:20]

    if tile_origins is None:
        gw = config.grid_w
        tid = jnp.arange(T, dtype=jnp.int32)
        tile_origins = jnp.stack([(tid % gw) * tw, (tid // gw) * th], -1)
    origins = tile_origins.astype(jnp.int32)

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
    bg_tiles = jnp.concatenate(
        [bgt[..., :3], jnp.zeros((T, pix, 1)), bgt, jnp.zeros((T, pix, 1))],
        axis=-1,
    )
    counts = jnp.sum(present, axis=-1).astype(jnp.int32)
    return _run_pallas_vjp(geo, wfeat, bg_tiles, counts, origins, config,
                           interpret)


def _run_pallas_vjp(geo, wfeat, bg_tiles, counts, origins,
                    config: RasterConfig, interpret: bool):

    @jax.custom_vjp
    def run(geo, wfeat, bg_tiles):
        return composite_forward_pallas(
            geo, wfeat, bg_tiles, counts, origins, config, interpret
        )

    def run_fwd(geo, wfeat, bg_tiles):
        fwd = composite_forward_pallas(
            geo, wfeat, bg_tiles, counts, origins, config, interpret
        )
        return fwd, (geo, wfeat, bg_tiles, fwd.out)

    def run_bwd(res, ct):
        geo, wfeat, bg_tiles, out = res
        g = ct.out  # cotangent of the packed output block
        dgeo, dwfeat = composite_backward_pallas(
            geo, wfeat, bg_tiles, out, g, counts, origins, config, interpret
        )
        # Background receives final_T * g on its color/phasor columns.
        t_final = out[..., 13:14]
        dbg = jnp.zeros_like(bg_tiles)
        dbg = dbg.at[..., 0:3].set(t_final * g[..., 0:3])
        dbg = dbg.at[..., 4:11].set(t_final * g[..., 4:11])
        return dgeo, dwfeat, dbg

    run.defvjp(run_fwd, run_bwd)
    fwd = run(geo, wfeat, bg_tiles)
    # Stop gradients through the non-differentiable outputs so stray
    # cotangents don't reach the kernel (it ignores those columns anyway).
    fwd = PallasForward(
        out=fwd.out.at[..., 13:].set(
            jax.lax.stop_gradient(fwd.out[..., 13:])
        ),
        contrib=jax.lax.stop_gradient(fwd.contrib),
    )
    return unpack_outputs(fwd, config)


def composite_tiles_pallas(feats, bg_map, config: RasterConfig,
                           tile_origins=None, interpret: bool = False):
    """Drop-in replacement for composite_tiles using the Pallas kernels.

    Differentiable via custom_vjp: the kernel pair is the fwd/bwd; the
    pack/unpack reshapes stay in XLA so cotangents map back onto the
    TileFeatures leaves (and through the instance gather to per-Gaussian
    arrays) automatically.
    """
    geo, wfeat, bg_tiles, counts, origins = pack_inputs(
        feats, bg_map, config, tile_origins
    )
    return _run_pallas_vjp(geo, wfeat, bg_tiles, counts, origins, config,
                           interpret)


def unpack_outputs(fwd: PallasForward, config: RasterConfig):
    """Kernel output block -> TileOutputs(-compatible) tuple."""
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
    )


def composite_forward_pallas(
    geo: jnp.ndarray,  # (T, 8, L)
    wfeat: jnp.ndarray,  # (T, 12, L)
    bg_tiles: jnp.ndarray,  # (T, PIX, 12)
    counts: jnp.ndarray,  # (T,) int32
    origins: jnp.ndarray,  # (T, 2) int32
    config: RasterConfig,
    interpret: bool = False,
) -> PallasForward:
    T, _, L = geo.shape
    pix = config.tile_pixels
    chunk = min(CHUNK, L)
    kernel = functools.partial(_forward_kernel, config=config, chunk=chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 8, L), lambda t, c_ref, o_ref: (t, 0, 0)),
            pl.BlockSpec((1, 12, L), lambda t, c_ref, o_ref: (t, 0, 0)),
            pl.BlockSpec((1, pix, 12), lambda t, c_ref, o_ref: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, pix, 24), lambda t, c_ref, o_ref: (t, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda t, c_ref, o_ref: (t, 0, 0)),
        ],
    )
    out, contrib = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, pix, 24), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, L), jnp.float32),
        ],
        interpret=interpret,
    )(counts, origins, geo, wfeat, bg_tiles)
    return PallasForward(out=out, contrib=contrib[:, 0, :])

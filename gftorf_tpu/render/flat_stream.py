"""Flat sorted-stream compositing kernels (forward + custom-vjp backward).

The dense-layout kernels (pallas_composite.py) consume a (T, L, 24)
feature block — T tiles x L = max_per_tile — whose gather from the
packed (P, 24) matrix, and the matching backward scatter-add, dominate
the training step once the kernels themselves are fast (round-3 profile:
~25 ms of an 84.7 ms step in the gather/scatter family at
T*L ~ 690k rows vs num_rendered ~ 150k).

These kernels instead consume the depth-sorted duplicate stream
directly, the same per-tile contiguous-range layout the reference's
rasterizer composites from (rasterizer_impl.cu:319-349 identifyTileRanges
+ per-tile [start,end) ranges):

  - binning writes the sorted stream into a (K_pad,) layout where every
    tile's segment starts at a FLAT_ALIGN-multiple (bin_gaussians_flat),
  - the kernel grid walks the stream in CL-sized chunks; a scalar-
    prefetched chunk->tile map drives the bg/output BlockSpec index_maps,
    so consecutive chunks of one tile revisit the same resident output
    block (Mosaic only writes it back when the tile changes),
  - per-tile carried state (transmittance, accumulators, dd moments,
    first-sample stats) lives in VMEM scratch, initialized on each
    tile's first chunk and flushed to the output block on its last.

Consequences vs the dense kernels:
  - gather/scatter volume is sized to the duplicate capacity
    (~num_rendered), not T*max_per_tile;
  - max_per_tile is GONE as a kernel dimension: tile depth is unbounded
    (any count just takes more chunks), so tile truncation, tile-depth
    grow-and-replay, and the backward's scoped-VMEM tile-cap ceiling
    (pallas_composite.max_feasible_tile_cap) do not exist on this path;
  - VMEM per grid step is (PIX, CL) temporaries + a (CL, 24) feature
    block — independent of scene crowding.

Padding (slots with no instance: segment alignment, empty tiles, the
tail beyond num_rendered) carries all-zero feature rows, whose opacity
of 0 makes alpha 0 — dead lanes without any count bookkeeping.

The per-chunk math (alpha/transmittance chain, MXU weighted sums,
depth-distortion moments, first-sample selection, totals-minus-prefix
backward) is shared with the dense kernels via pallas_composite's
helpers; semantics match renderCUDA forward.cu:424-676 /
backward.cu:609-889 exactly as documented there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gftorf_tpu.render.composite import ALPHA_MAX, T_STOP, TileOutputs
from gftorf_tpu.render.pallas_composite import (
    _bg_to_tiles,
    _chunk_common,
    _chunk_env,
    _cumsum_lanes,
    _default_origins,
    _pixel_coords,
)
from gftorf_tpu.render.settings import RasterConfig

# Stream chunk sizes (lane multiples). The backward keeps ~2x the live
# (PIX, CL) temporaries of the forward; both shrink at wide tiles to
# hold the PIX*CL product.
FLAT_FWD_CHUNK = _chunk_env("GFTORF_FLAT_FWD_CHUNK", 256)
FLAT_BWD_CHUNK = _chunk_env("GFTORF_FLAT_BWD_CHUNK", 128)

# Tile segments in the stream start at FLAT_ALIGN-multiples so that no
# kernel chunk (any divisor of FLAT_ALIGN) spans two tiles.
FLAT_ALIGN = max(FLAT_FWD_CHUNK, FLAT_BWD_CHUNK, 256)


def _flat_chunk(pref: int, pix: int) -> int:
    """Chunk for a tile-pixel count: hold PIX*CL roughly constant
    (VMEM), floor at the 128 lane width. The starting value must be a
    lane multiple or the divisibility walk below never terminates
    (e.g. pix=384 gives 170; 170-128k never divides FLAT_ALIGN)."""
    c = max(128, (pref * 256 // max(pix, 256)) // 128 * 128)
    while FLAT_ALIGN % c != 0:  # keep alignment divisibility
        c -= 128
    assert c >= 128 and FLAT_ALIGN % c == 0
    return c


def flat_stream_capacity(capacity: int, num_tiles: int) -> int:
    """Static padded-stream length: the aligned duplicate capacity plus
    one alignment block per tile (sum over tiles of the per-tile
    round-up, plus one block for each empty tile, is bounded by this)."""
    k_aligned = -(-capacity // FLAT_ALIGN) * FLAT_ALIGN
    return k_aligned + num_tiles * FLAT_ALIGN


# ---------------------------------------------------------------------------
# Kernels


def _forward_kernel_flat(chunk_tile_ref, origins_ref, feat_ref, bg_ref,
                         out_ref, contrib_ref, *scratch,
                         config: RasterConfig, chunk: int):
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    pix = config.tile_pixels
    need_dd = config.need_dd
    need_dist = config.need_distribution

    names = ["t_dec", "t_frozen", "accum", "a_run"]
    if need_dd:
        names += ["dd", "wz_run", "wz2_run"]
    if need_dist:
        names += ["first", "has_first"]
    s = dict(zip(names, scratch))

    tile = chunk_tile_ref[c]
    is_first = jnp.logical_or(
        c == 0, tile != chunk_tile_ref[jnp.maximum(c - 1, 0)]
    )
    is_last = jnp.logical_or(
        c == nc - 1, tile != chunk_tile_ref[jnp.minimum(c + 1, nc - 1)]
    )
    px, py, inside = _pixel_coords(origins_ref, tile, config)

    @pl.when(is_first)
    def _init():
        s["t_dec"][...] = jnp.ones((pix, 1), jnp.float32)
        s["t_frozen"][...] = jnp.ones((pix, 1), jnp.float32)
        s["accum"][...] = jnp.zeros((pix, 17), jnp.float32)
        s["a_run"][...] = jnp.zeros((pix, 1), jnp.float32)
        if need_dd:
            for k in ("dd", "wz_run", "wz2_run"):
                s[k][...] = jnp.zeros((pix, 1), jnp.float32)
        if need_dist:
            s["first"][...] = jnp.zeros((pix, 3), jnp.float32)
            s["has_first"][...] = jnp.zeros((pix, 1), jnp.float32)

    contrib_ref[0, 0, :] = jnp.zeros((chunk,), jnp.float32)

    @pl.when(jnp.max(s["t_dec"][...]) >= T_STOP)
    def _step():
        t_dec0 = s["t_dec"][...]
        (blk, f, z, ddx, ddy, _, _, _, _, _, alpha, q, t_excl, t_incl,
         contribute, w, w_p, t_dec_next) = _chunk_common(
            feat_ref, 0, chunk, jnp.int32(chunk), px, py, inside, t_dec0
        )
        sums_w = jax.lax.dot_general(
            w, f, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        sums_wp = jax.lax.dot_general(
            w_p, f, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        c_f32 = contribute.astype(jnp.float32)
        contrib_ref[0, 0, :] = jnp.sum(c_f32, axis=0)

        col = jax.lax.broadcasted_iota(jnp.int32, (1, 17), 1)
        s["t_frozen"][...] = jnp.min(
            jnp.where(contribute, t_incl, s["t_frozen"][...]),
            axis=-1, keepdims=True,
        )
        s["accum"][...] = s["accum"][...] + jnp.where(
            (col >= 4) & (col < 11), sums_wp, sums_w
        )
        a_run0 = s["a_run"][...]
        s["a_run"][...] = a_run0 + jnp.sum(w, axis=-1, keepdims=True)

        if need_dd:
            wz = w * z[None, :]
            wz2 = wz * z[None, :]
            a_ex = a_run0 + _cumsum_lanes(w) - w
            wz_ex = s["wz_run"][...] + _cumsum_lanes(wz) - wz
            wz2_ex = s["wz2_run"][...] + _cumsum_lanes(wz2) - wz2
            zz = z[None, :] * z[None, :]
            dd_c = jnp.sum(w * zz * a_ex - 2.0 * wz * wz_ex + w * wz2_ex,
                           axis=-1, keepdims=True)
            s["dd"][...] = s["dd"][...] + dd_c
            s["wz_run"][...] = s["wz_run"][...] + jnp.sum(
                wz, -1, keepdims=True)
            s["wz2_run"][...] = s["wz2_run"][...] + jnp.sum(
                wz2, -1, keepdims=True)

        if need_dist:
            onehot = contribute & (t_excl == t_dec0)
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
            s["first"][...] = jnp.where(
                s["has_first"][...] > 0.5, s["first"][...],
                jnp.where(any_c > 0.5, cand, s["first"][...]),
            )
            s["has_first"][...] = jnp.maximum(s["has_first"][...], any_c)

        s["t_dec"][...] = t_dec_next

    @pl.when(is_last)
    def _finalize():
        zeros1 = jnp.zeros((pix, 1), jnp.float32)
        accum = s["accum"][...]
        a_run = s["a_run"][...]
        t_frozen = s["t_frozen"][...]
        bg = bg_ref[0]
        out_ref[0] = jnp.concatenate(
            [
                accum[:, 0:3] + t_frozen * bg[:, 0:3],
                accum[:, 3:4],
                accum[:, 4:11] + t_frozen * bg[:, 4:11],
                a_run,
                s["dd"][...] if need_dd else zeros1,
                t_frozen,
                s["first"][...] if need_dist
                else jnp.zeros((pix, 3), jnp.float32),
                a_run,
                s["wz_run"][...] if need_dd else zeros1,
                s["wz2_run"][...] if need_dd else zeros1,
                accum[:, 11:17],
                jnp.zeros((pix, 6), jnp.float32),
            ],
            axis=-1,
        )


def _backward_kernel_flat(chunk_tile_ref, origins_ref, feat_ref, bg_ref,
                          out_res_ref, g_ref, dfeat_ref, *scratch,
                          config: RasterConfig, chunk: int, has_flow: bool):
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    pix = config.tile_pixels
    need_dd = config.need_dd

    names = ["t_dec", "u_f", "u_p"]
    if need_dd:
        names += ["u_dd"]
    s = dict(zip(names, scratch))

    tile = chunk_tile_ref[c]
    is_first = jnp.logical_or(
        c == 0, tile != chunk_tile_ref[jnp.maximum(c - 1, 0)]
    )
    px, py, inside = _pixel_coords(origins_ref, tile, config)

    out = out_res_ref[0]
    g = g_ref[0]
    bg = bg_ref[0]

    t_final = out[:, 13:14]
    a_tot = out[:, 17:18]
    g_acc = g[:, 11:12]
    accum_f = jnp.concatenate(
        [out[:, 0:3] - t_final * bg[:, 0:3], out[:, 3:4]], axis=-1
    )
    accum_p = out[:, 4:11] - t_final * bg[:, 4:11]
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

    @pl.when(is_first)
    def _init():
        s["t_dec"][...] = jnp.ones((pix, 1), jnp.float32)
        s["u_f"][...] = jnp.zeros((pix, 1), jnp.float32)
        s["u_p"][...] = jnp.zeros((pix, 1), jnp.float32)
        if need_dd:
            s["u_dd"][...] = jnp.zeros((pix, 1), jnp.float32)

    dfeat_ref[0] = jnp.zeros((chunk, 24), jnp.float32)

    @pl.when(jnp.max(s["t_dec"][...]) >= T_STOP)
    def _step():
        (blk, f, z, ddx, ddy, con_a, con_b, con_c, exp_p, raw, alpha, q,
         t_excl, t_incl, contribute, w, w_p, t_dec_next) = _chunk_common(
            feat_ref, 0, chunk, jnp.int32(chunk), px, py, inside,
            s["t_dec"][...]
        )
        not_clamped = raw < ALPHA_MAX

        e = jax.lax.dot_general(
            g[:, 0:4], f[0:4, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) + g_acc
        e_p = jax.lax.dot_general(
            g[:, 4:11], f[4:11, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        u_f_incl = s["u_f"][...] + _cumsum_lanes(w * e)
        u_p_incl = s["u_p"][...] + _cumsum_lanes(w_p * e_p)

        d_alpha = (
            t_excl * e - (e_tot - u_f_incl) / q
            + t_excl * t_excl * e_p - 2.0 * (ep_tot - u_p_incl) / q
            - t_final / q * bg_dot
        )
        if need_dd:
            sym = (z[None, :] * z[None, :] * a_tot
                   - 2.0 * z[None, :] * wz_tot + wz2_tot)
            u_dd_incl = s["u_dd"][...] + _cumsum_lanes(g_dd * w * sym)
            d_alpha += g_dd * t_excl * sym - (u_dd_tot - u_dd_incl) / q
            d_z = jnp.sum(
                g_dd * 2.0 * w * (z[None, :] * a_tot - wz_tot), axis=0
            )
            s["u_dd"][...] = u_dd_incl[:, -1:]
        else:
            d_z = jnp.zeros((chunk,), jnp.float32)
        d_alpha = jnp.where(contribute, d_alpha, 0.0)

        d_power = jnp.where(not_clamped, d_alpha * alpha, 0.0)
        d_opac = jnp.sum(jnp.where(not_clamped, d_alpha * exp_p, 0.0),
                         axis=0)
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
        )
        d_p = jax.lax.dot_general(
            g[:, 4:11], w_p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if has_flow:
            d_flow = jax.lax.dot_general(
                g[:, 20:26], w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            d_flow = jnp.zeros((6, chunk), jnp.float32)

        d_blk = jnp.concatenate(
            [
                d_mean_x[None], d_mean_y[None],
                d_con_a[None], d_con_b[None], d_con_c[None],
                d_opac[None], d_z[None],
                d_f, d_p, d_flow,
            ],
            axis=0,
        )
        dfeat_ref[0] = jnp.transpose(d_blk, (1, 0))

        s["t_dec"][...] = t_dec_next
        s["u_f"][...] = u_f_incl[:, -1:]
        s["u_p"][...] = u_p_incl[:, -1:]


# ---------------------------------------------------------------------------
# Host-side wrappers


def _scratch(pix, config, backward):
    shapes = [
        pltpu.VMEM((pix, 1), jnp.float32),  # t_dec
    ]
    if backward:
        shapes += [pltpu.VMEM((pix, 1), jnp.float32)] * 2  # u_f, u_p
        if config.need_dd:
            shapes += [pltpu.VMEM((pix, 1), jnp.float32)]  # u_dd
    else:
        shapes += [
            pltpu.VMEM((pix, 1), jnp.float32),  # t_frozen
            pltpu.VMEM((pix, 17), jnp.float32),  # accum
            pltpu.VMEM((pix, 1), jnp.float32),  # a_run
        ]
        if config.need_dd:
            shapes += [pltpu.VMEM((pix, 1), jnp.float32)] * 3
        if config.need_distribution:
            shapes += [
                pltpu.VMEM((pix, 3), jnp.float32),
                pltpu.VMEM((pix, 1), jnp.float32),
            ]
    return shapes


def _chunk_tiles_for(chunk_tile_aligned, chunk, K_pad=None):
    """chunk->tile map at kernel-chunk granularity from the FLAT_ALIGN-
    granularity map (every kernel chunk lies inside one aligned block).

    The K_pad consistency assert catches a stream binned under a
    different FLAT_ALIGN (e.g. GFTORF_FLAT_*_CHUNK env differing between
    the binning and compositing process): a mismatch would silently let
    kernel chunks straddle tile boundaries and corrupt carried state."""
    assert FLAT_ALIGN % chunk == 0, (chunk, FLAT_ALIGN)
    if K_pad is not None:
        assert chunk_tile_aligned.shape[0] * FLAT_ALIGN == K_pad, (
            f"flat stream layout/kernel alignment mismatch: "
            f"{chunk_tile_aligned.shape[0]} aligned blocks x FLAT_ALIGN="
            f"{FLAT_ALIGN} != K_pad={K_pad}"
        )
    rep = FLAT_ALIGN // chunk
    if rep == 1:
        return chunk_tile_aligned
    return jnp.repeat(chunk_tile_aligned, rep)


def composite_forward_flat(feat_fl, bg_tiles, chunk_tile, origins,
                           config: RasterConfig, interpret: bool = False):
    """feat_fl: (K_pad, 24) aligned stream; bg_tiles: (T, PIX, 12);
    chunk_tile: (K_pad/FLAT_ALIGN,) tile per aligned block."""
    K_pad = feat_fl.shape[0]
    T = bg_tiles.shape[0]
    pix = config.tile_pixels
    chunk = _flat_chunk(FLAT_FWD_CHUNK, pix)
    nc = K_pad // chunk
    ct = _chunk_tiles_for(chunk_tile, chunk, K_pad)
    kernel = functools.partial(_forward_kernel_flat, config=config,
                               chunk=chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((1, chunk, 24), lambda c, ct_ref, o_ref: (c, 0, 0)),
            pl.BlockSpec((1, pix, 12),
                         lambda c, ct_ref, o_ref: (ct_ref[c], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, pix, 32),
                         lambda c, ct_ref, o_ref: (ct_ref[c], 0, 0)),
            pl.BlockSpec((1, 1, chunk), lambda c, ct_ref, o_ref: (c, 0, 0)),
        ],
        scratch_shapes=_scratch(pix, config, backward=False),
    )
    out, contrib = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, pix, 32), jnp.float32),
            jax.ShapeDtypeStruct((nc, 1, chunk), jnp.float32),
        ],
        interpret=interpret,
    )(ct, origins, feat_fl.reshape(nc, chunk, 24), bg_tiles)
    return out, contrib.reshape(K_pad)


def composite_backward_flat(feat_fl, bg_tiles, out_res, g, chunk_tile,
                            origins, config: RasterConfig,
                            interpret: bool = False, has_flow: bool = True):
    K_pad = feat_fl.shape[0]
    pix = config.tile_pixels
    if pix > 512:
        # Measured against the real v5e compiler (2026-08-20): the
        # backward's (PIX, CL) temporaries need 17.52MB scoped VMEM at
        # pix=1024 even at the minimum CL=128 (lane width), 1.52MB over
        # the 16MB stack — infeasible without splitting a tile's pixel
        # block across grid steps. Same structural bound as the dense
        # backward (_bwd_pref); scope note: flat-stream differentiated
        # renders support tiles of <= 512 pixels.
        raise ValueError(
            f"tile_pixels={pix} exceeds the flat-stream backward "
            "kernel's scoped-VMEM budget (max 512 pixels/tile, e.g. "
            "16x32); forward-only flat renders are unaffected"
        )
    chunk = _flat_chunk(FLAT_BWD_CHUNK, pix)
    nc = K_pad // chunk
    ct = _chunk_tiles_for(chunk_tile, chunk, K_pad)
    kernel = functools.partial(_backward_kernel_flat, config=config,
                               chunk=chunk, has_flow=has_flow)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((1, chunk, 24), lambda c, ct_ref, o_ref: (c, 0, 0)),
            pl.BlockSpec((1, pix, 12),
                         lambda c, ct_ref, o_ref: (ct_ref[c], 0, 0)),
            pl.BlockSpec((1, pix, 32),
                         lambda c, ct_ref, o_ref: (ct_ref[c], 0, 0)),
            pl.BlockSpec((1, pix, 32),
                         lambda c, ct_ref, o_ref: (ct_ref[c], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, 24), lambda c, ct_ref, o_ref: (c, 0, 0)),
        ],
        scratch_shapes=_scratch(pix, config, backward=True),
    )
    (dfeat,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nc, chunk, 24), jnp.float32)],
        interpret=interpret,
    )(ct, origins, feat_fl.reshape(nc, chunk, 24), bg_tiles, out_res, g)
    return dfeat.reshape(K_pad, 24)


def _make_flat_vjp(config: RasterConfig, interpret: bool, has_flow: bool):
    @jax.custom_vjp
    def run(feat_fl, bg_tiles, chunk_tile, origins):
        return composite_forward_flat(
            feat_fl, bg_tiles, chunk_tile, origins, config, interpret
        )

    def run_fwd(feat_fl, bg_tiles, chunk_tile, origins):
        out, contrib = composite_forward_flat(
            feat_fl, bg_tiles, chunk_tile, origins, config, interpret
        )
        return (out, contrib), (feat_fl, bg_tiles, chunk_tile, origins, out)

    def run_bwd(res, ct):
        feat_fl, bg_tiles, chunk_tile, origins, out = res
        g = ct[0]
        dfeat = composite_backward_flat(
            feat_fl, bg_tiles, out, g, chunk_tile, origins, config,
            interpret, has_flow,
        )
        t_final = out[..., 13:14]
        dbg = jnp.zeros_like(bg_tiles)
        dbg = dbg.at[..., 0:3].set(t_final * g[..., 0:3])
        dbg = dbg.at[..., 4:11].set(t_final * g[..., 4:11])
        return (
            dfeat, dbg,
            np.zeros(chunk_tile.shape, jax.dtypes.float0),
            np.zeros(origins.shape, jax.dtypes.float0),
        )

    run.defvjp(run_fwd, run_bwd)
    return run


def composite_packed_flat(feat_fl, chunk_tile, bg_map, config: RasterConfig,
                          tile_origins=None, num_tiles=None,
                          interpret: bool = False, has_flow: bool = True):
    """Composite from the aligned packed stream. Returns TileOutputs
    with contrib_pixels in stream layout (K_pad,)."""
    T = num_tiles if num_tiles is not None else config.num_tiles
    origins = (
        tile_origins.astype(jnp.int32)
        if tile_origins is not None
        else _default_origins(T, config)
    )
    bg_tiles = _bg_to_tiles(bg_map, T, config)
    run = _make_flat_vjp(config, interpret, has_flow)
    out, contrib = run(feat_fl, bg_tiles, chunk_tile, origins)
    out = out.at[..., 13:20].set(jax.lax.stop_gradient(out[..., 13:20]))
    out = out.at[..., 26:].set(jax.lax.stop_gradient(out[..., 26:]))
    return TileOutputs(
        color=out[..., 0:3],
        phasor=out[..., 4:11],
        depth=out[..., 3],
        acc=out[..., 11],
        dd=out[..., 12],
        distribution=out[..., 14:17],
        contrib_pixels=jax.lax.stop_gradient(contrib),
        flow=out[..., 20:26],
    )

"""Gaussian scene state: fixed-capacity pytrees with masked updates.

TPU-native redesign of the reference's GaussianModel
(scene/gaussian_model.py:26-674). The reference reallocates parameter
tensors and rewrites Adam state on every densify/prune ("optimizer
surgery", :456-536). Under XLA we instead keep every array at a static
capacity C with an ``alive`` mask:

 - prune      -> clear alive bits (moments stay but are dead weight);
 - clone/split-> write new rows into free slots and zero their Adam
                 moments — identical semantics to the reference's
                 cat-with-zeroed-state (:524-525);
 - capacity exhaustion is reported; the host grows arrays (pad + re-jit)
   and replays the step.

SH layout: color coefficients are (C, M, 3); phase/amp are (C, M) each.
Per-coefficient learning rates (DC vs rest/20, gaussian_model.py:247-274)
are expressed as lr *arrays* broadcast against the parameter, so one
Adam handles every group.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gftorf_tpu.ops.covariance import quat_to_rotmat


class GaussianParams(NamedTuple):
    """Optimizable parameters, all capacity-C leading dim except offsets."""

    xyz: jnp.ndarray  # (C, 3)
    sh_color: jnp.ndarray  # (C, M, 3) DC at index 0
    sh_phase: jnp.ndarray  # (C, M)
    sh_amp: jnp.ndarray  # (C, M)
    scaling: jnp.ndarray  # (C, S) log-scale; S=1 isotropic else 3
    rotation: jnp.ndarray  # (C, 4) unnormalized quats
    opacity: jnp.ndarray  # (C, 1) logit
    seg_color: jnp.ndarray  # (C, 3) frozen motion-segmentation color
    phase_offset: jnp.ndarray  # (1,)
    dc_offset: jnp.ndarray  # (1,)


class GaussianAux(NamedTuple):
    """Non-optimized per-point state."""

    alive: jnp.ndarray  # (C,) bool
    max_radii2d: jnp.ndarray  # (C,) float
    xyz_grad_accum: jnp.ndarray  # (C,) float
    denom: jnp.ndarray  # (C,) float


class AdamState(NamedTuple):
    mu: GaussianParams
    nu: GaussianParams
    step: jnp.ndarray  # () int32


class GaussianModelState(NamedTuple):
    params: GaussianParams
    aux: GaussianAux
    adam: AdamState


# ---------------------------------------------------------------------------
# Activations (gaussian_model.py:28-43)


def get_scaling(params: GaussianParams) -> jnp.ndarray:
    s = jnp.exp(params.scaling)
    if s.shape[-1] == 1:
        s = jnp.repeat(s, 3, axis=-1)
    return s


def get_rotation(params: GaussianParams) -> jnp.ndarray:
    # rsqrt(sum+eps): zero-quaternion rows (dead capacity slots) must have
    # a zero — not NaN — gradient through the normalization.
    q = params.rotation
    return q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-20)


def get_opacity(params: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(params.opacity)


def get_motion_mask(params: GaussianParams) -> jnp.ndarray:
    """Red-channel threshold on frozen seg colors (gaussian_model.py:159-161)."""
    return params.seg_color[:, 0] > 0.5


def get_features_phasor(params: GaussianParams) -> jnp.ndarray:
    """(C, M, 2) packed (phase, amp) like get_features_phasor (:147-153)."""
    return jnp.stack([params.sh_phase, params.sh_amp], axis=-1)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


# ---------------------------------------------------------------------------
# Construction


def init_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    phases: Optional[np.ndarray],
    amplitudes: Optional[np.ndarray],
    seg_colors: Optional[np.ndarray],
    capacity: int,
    sh_degree: int = 3,
    initial_opacity: float = 0.1,
    isotropic: bool = False,
    init_static_first: bool = False,
) -> GaussianModelState:
    """Initialize from a point cloud (create_from_pcd, gaussian_model.py:180-236).

    Scales come from the mean 3-NN distance; when ``init_static_first``
    the static/dynamic halves get independent KNN (:193-196).
    """
    from gftorf_tpu.ops.knn import mean_knn_sq_dist
    from gftorf_tpu.ops.sh import rgb2sh, pa2sh

    n = points.shape[0]
    if capacity < n:
        raise ValueError(f"capacity {capacity} < initial points {n}")
    m = (sh_degree + 1) ** 2
    pts = jnp.asarray(points, jnp.float32)

    def knn(p):
        # Native Morton-ordered KNN on host when available (the
        # simple-knn equivalent); exact on-device fallback otherwise.
        from gftorf_tpu.native import mean_knn_sq_dist_native

        host = mean_knn_sq_dist_native(np.asarray(p))
        if host is not None:
            return jnp.asarray(host)
        return mean_knn_sq_dist(p)

    if init_static_first:
        dist2 = jnp.concatenate([knn(pts[: n // 2]), knn(pts[n // 2 :])])
    else:
        dist2 = knn(pts)
    dist2 = jnp.maximum(dist2, 1e-7)
    log_scale = jnp.log(jnp.sqrt(dist2))[:, None]
    scaling = log_scale if isotropic else jnp.repeat(log_scale, 3, axis=1)

    sh_color = jnp.zeros((n, m, 3), jnp.float32)
    sh_color = sh_color.at[:, 0, :].set(rgb2sh(jnp.asarray(colors, jnp.float32)))

    sh_phase = jnp.zeros((n, m), jnp.float32)
    if phases is not None:
        sh_phase = sh_phase.at[:, 0].set(pa2sh(jnp.asarray(phases, jnp.float32)))
    sh_amp = jnp.zeros((n, m), jnp.float32)
    if amplitudes is not None:
        sh_amp = sh_amp.at[:, 0].set(pa2sh(jnp.asarray(amplitudes, jnp.float32)))

    rot = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    opac = inverse_sigmoid(initial_opacity * jnp.ones((n, 1), jnp.float32))
    seg = (
        jnp.asarray(seg_colors, jnp.float32)
        if seg_colors is not None
        else jnp.zeros((n, 3), jnp.float32)
    )

    def pad(x):
        return jnp.concatenate(
            [x, jnp.zeros((capacity - n,) + x.shape[1:], x.dtype)], axis=0
        )

    params = GaussianParams(
        xyz=pad(pts),
        sh_color=pad(sh_color),
        sh_phase=pad(sh_phase),
        sh_amp=pad(sh_amp),
        scaling=pad(scaling),
        rotation=pad(rot),
        opacity=pad(opac),
        seg_color=pad(seg),
        phase_offset=jnp.zeros((1,), jnp.float32),
        dc_offset=jnp.zeros((1,), jnp.float32),
    )
    aux = GaussianAux(
        alive=jnp.arange(capacity) < n,
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_grad_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
    )
    zeros = jax.tree.map(jnp.zeros_like, params)
    adam = AdamState(mu=zeros, nu=zeros, step=jnp.int32(0))
    return GaussianModelState(params=params, aux=aux, adam=adam)


def grow_capacity(state: GaussianModelState, new_capacity: int) -> GaussianModelState:
    """Host-side capacity growth: pad every per-point array with dead slots."""
    old = state.aux.alive.shape[0]
    extra = new_capacity - old
    if extra <= 0:
        return state

    def pad(x):
        if x.ndim >= 1 and x.shape[0] == old:
            return jnp.concatenate(
                [x, jnp.zeros((extra,) + x.shape[1:], x.dtype)], axis=0
            )
        return x

    return jax.tree.map(pad, state)


def sort_layout(state: GaussianModelState) -> GaussianModelState:
    """Permute per-point rows into [dynamic+alive | static+alive | dead].

    Densify/prune write new points into arbitrary free slots, scattering
    the alive set across capacity; the training step's compaction then
    needs per-step gathers (and scatter-add transposes in backward) that
    scale with capacity — the dominant capacity-linear cost at 100k+
    points (round-5 profile: gather 32 ms + scatter-add 46 ms/step).
    Re-sorting ONCE per densify/prune event (the only places the alive
    or motion partition changes) lets the step compact with static
    slices instead (StepStatic.compact_layout): alive rows are exactly
    [0, n_alive) with the dynamic ones first, so `x[:bucket]` replaces
    the gather and zero-padding replaces the backward scatter.

    Stable sort: relative order within each class is preserved, so two
    sorts compose to identity and checkpoints stay deterministic. The
    permutation moves params, aux accumulators and Adam moments
    together — semantics are identical to the unsorted state (the model
    is a set of points; only densify's per-row split RNG assignment
    differs across layouts, same distribution).
    """
    params, aux, adam = state
    C = aux.alive.shape[0]
    motion = get_motion_mask(params)
    cls = jnp.where(aux.alive, jnp.where(motion, 0, 1), 2)
    perm = jnp.argsort(cls, stable=True)

    def take(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == C:
            return jnp.take(x, perm, axis=0)
        return x

    return jax.tree.map(take, state)


# ---------------------------------------------------------------------------
# Adam (torch.optim.Adam semantics, eps=1e-15, gaussian_model.py:274)


def adam_update(
    params: GaussianParams,
    grads: GaussianParams,
    adam: AdamState,
    lrs: GaussianParams,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
    on=None,
):
    """One Adam step with per-leaf (possibly array) learning rates.

    ``on`` (optional traced scalar): when 0 the step is *skipped* entirely
    — params, moments and the step counter all pass through unchanged,
    matching the reference's conditional ``optimizer.step()``
    (train.py:469-472). An lr of 0 would NOT be equivalent: it still
    decays that iteration's gradients into mu/nu and advances the shared
    bias-correction counter.
    """
    step = adam.step + (1 if on is None else (on > 0).astype(jnp.int32))
    bc1 = 1.0 - b1 ** step.astype(jnp.float32)
    bc2 = 1.0 - b2 ** step.astype(jnp.float32)

    new_m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, adam.mu, grads)
    new_v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, adam.nu, grads)
    new_p = jax.tree.map(
        lambda p, m, v, lr: p - lr / bc1 * m / (jnp.sqrt(v) / jnp.sqrt(bc2) + eps),
        params, new_m, new_v, lrs,
    )
    if on is not None:
        live = on > 0
        pick = lambda new, old: jnp.where(live, new, old)
        new_p = jax.tree.map(pick, new_p, params)
        new_m = jax.tree.map(pick, new_m, adam.mu)
        new_v = jax.tree.map(pick, new_v, adam.nu)
    return new_p, AdamState(mu=new_m, nu=new_v, step=step)


# ---------------------------------------------------------------------------
# Densification (gaussian_model.py:568-654)


@dataclasses.dataclass(frozen=True)
class DensifyHyper:
    grad_threshold: float = 0.0002
    min_opacity: float = 0.01
    percent_dense: float = 0.01
    split_n: int = 2
    split_scale_shrink: float = 0.8  # new scale = old / (shrink * N)


def densify_and_prune(
    state: GaussianModelState,
    key: jnp.ndarray,
    hyper: DensifyHyper,
    scene_extent,
    max_screen_size,  # 0.0 disables the screen/world-size prune terms
):
    """Clone small/high-grad, split large/high-grad, prune low-opacity/huge.

    Returns (new_state, dropped) where dropped > 0 means capacity was
    insufficient; the host should grow_capacity and re-run with the same
    key (deterministic).
    """
    params, aux, adam = state
    C = aux.alive.shape[0]
    alive = aux.alive
    scal = get_scaling(params)
    max_scale = jnp.max(scal, axis=-1)

    grads = aux.xyz_grad_accum / jnp.maximum(aux.denom, 1e-30)
    grads = jnp.where(aux.denom > 0, grads, 0.0)
    high = alive & (grads >= hyper.grad_threshold)
    clone_m = high & (max_scale <= hyper.percent_dense * scene_extent)
    split_m = high & (max_scale > hyper.percent_dense * scene_extent)

    # --- prune mask (densify_and_prune, :624-638) applied to originals;
    # split originals are also pruned (:600-601).
    opac = get_opacity(params)[:, 0]
    prune = alive & (opac < hyper.min_opacity)
    use_size = max_screen_size > 0
    # NOTE the reference's screen-size prune (big_points_vs,
    # gaussian_model.py:634) is dead code by order of operations:
    # densify_and_clone/split run densification_postfix FIRST, which
    # zeroes max_radii2D for every point (:566), so the prune always
    # reads zeros and `max_radii2D > max_screen_size` never fires. Only
    # the world-size rules (live scaling) actually prune. Matching the
    # written-but-inert check instead of the effective behavior is
    # catastrophic: accumulated radii from the large random-init blobs
    # exceed 10 px for nearly every point, and the first size-enabled
    # prune (one densify after the first opacity reset) wiped 96k of a
    # 97k-point converged scene in the 20k parity run.
    prune = prune | (
        use_size
        & alive
        & (
            (max_scale > 0.05 * scene_extent)
            | (max_scale < 0.001 * scene_extent)
        )
    )
    prune = prune | split_m  # split replaces the original

    # --- new points: clones keep params; splits sample N from the Gaussian.
    n = hyper.split_n
    samples = jax.random.normal(key, (n, C, 3)) * scal[None]
    rotm = quat_to_rotmat(get_rotation(params))  # (C, 3, 3)
    offsets = jnp.einsum("cij,ncj->nci", rotm, samples, precision="highest")
    split_xyz = params.xyz[None] + offsets  # (n, C, 3)
    if params.scaling.shape[-1] == 1:
        # isotropic: shrink the activated 1-channel scale (:582-583)
        split_scaling = jnp.log(jnp.exp(params.scaling) / (hyper.split_scale_shrink * n))
    else:
        split_scaling = jnp.log(scal / (hyper.split_scale_shrink * n))

    survivors = alive & ~prune

    # Destination slots: free slots after pruning, ranked.
    free = ~survivors
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank among free slots
    free_slots_count = jnp.sum(free)

    # Source list: clone rows (1 copy) then split rows (n copies).
    # Build an ordered list of (source_idx, kind) pairs via cumsum ranking.
    clone_rank = jnp.cumsum(clone_m.astype(jnp.int32)) - 1
    n_clone = jnp.sum(clone_m)
    split_rank = jnp.cumsum(split_m.astype(jnp.int32)) - 1
    n_split = jnp.sum(split_m)
    total_new = n_clone + n * n_split
    dropped = jnp.maximum(total_new - free_slots_count, 0)

    # For each free slot r (0-based rank), which new point goes there?
    # order: clones [0, n_clone), then split copy k of point j at
    # n_clone + k*n_split + rank_j.
    slot_ids = jnp.arange(C)
    r = free_rank  # (C,) rank of each slot if free

    # Inverse maps: for rank q, the source index.
    clone_src = jnp.full((C,), -1, jnp.int32)
    clone_src = clone_src.at[jnp.where(clone_m, clone_rank, C)].set(
        slot_ids.astype(jnp.int32), mode="drop"
    )
    split_src = jnp.full((C,), -1, jnp.int32)
    split_src = split_src.at[jnp.where(split_m, split_rank, C)].set(
        slot_ids.astype(jnp.int32), mode="drop"
    )

    is_new = free & (r < total_new)
    q = jnp.where(is_new, r, 0)
    is_clone_slot = q < n_clone
    src_clone = clone_src[jnp.clip(q, 0, C - 1)]
    q_split = q - n_clone
    copy_k = jnp.where(is_clone_slot, 0, q_split // jnp.maximum(n_split, 1))
    src_split = split_src[jnp.clip(q_split % jnp.maximum(n_split, 1), 0, C - 1)]
    src = jnp.where(is_clone_slot, src_clone, src_split)
    src = jnp.clip(src, 0, C - 1)

    def _bc(mask, like):
        return mask.reshape(mask.shape + (1,) * (like.ndim - 1))

    def fill(dst, split_vals=None):
        """Per-slot: survivors keep dst; new slots copy from their source.

        split_vals: (n, C, ...) values for split copies; None means split
        copies equal the source row (true for everything but xyz/scaling).
        """
        copied = dst[src]
        if split_vals is None:
            newv = copied
        else:
            splitted = split_vals[jnp.clip(copy_k, 0, n - 1), src]
            newv = jnp.where(_bc(is_clone_slot, copied), copied, splitted)
        return jnp.where(_bc(is_new, newv), newv, dst)

    new_params = GaussianParams(
        xyz=fill(params.xyz, split_xyz),
        sh_color=fill(params.sh_color),
        sh_phase=fill(params.sh_phase),
        sh_amp=fill(params.sh_amp),
        scaling=fill(params.scaling, jnp.broadcast_to(
            split_scaling[None], (n,) + params.scaling.shape)),
        rotation=fill(params.rotation),
        opacity=fill(params.opacity),
        seg_color=fill(params.seg_color),
        phase_offset=params.phase_offset,
        dc_offset=params.dc_offset,
    )

    new_alive = survivors | is_new

    # Adam moments: zero for new slots (reference zeroes moments for both
    # replaced and appended tensors, gaussian_model.py:463-464, 524-525).
    def zero_new(x):
        if x.ndim >= 1 and x.shape[0] == C:
            return jnp.where(_bc(is_new, x), jnp.zeros_like(x), x)
        return x

    new_adam = AdamState(
        mu=jax.tree.map(zero_new, adam.mu),
        nu=jax.tree.map(zero_new, adam.nu),
        step=adam.step,
    )

    new_aux = GaussianAux(
        alive=new_alive,
        max_radii2d=jnp.zeros_like(aux.max_radii2d),
        xyz_grad_accum=jnp.zeros_like(aux.xyz_grad_accum),
        denom=jnp.zeros_like(aux.denom),
    )
    return GaussianModelState(new_params, new_aux, new_adam), dropped


def prune_only(state: GaussianModelState, min_opacity: float) -> GaussianModelState:
    """Opacity-only pruning (gaussian_model.py:642-646)."""
    params, aux, adam = state
    opac = get_opacity(params)[:, 0]
    new_alive = aux.alive & (opac >= min_opacity)
    return GaussianModelState(params, aux._replace(alive=new_alive), adam)


def reset_opacity(
    params: GaussianParams, apply_mask: Optional[jnp.ndarray] = None
) -> GaussianParams:
    """Clamp opacity to <= 0.01 (gaussian_model.py:369-376)."""
    new = inverse_sigmoid(jnp.minimum(get_opacity(params), 0.01))
    if apply_mask is not None:
        new = jnp.where(apply_mask[:, None], new, params.opacity)
    return params._replace(opacity=new)


def reset_opacity_state(
    state: GaussianModelState, apply_mask: Optional[jnp.ndarray] = None
) -> GaussianModelState:
    """Opacity reset INCLUDING the Adam-state zeroing of the reference's
    replace_tensor_to_optimizer (gaussian_model.py:369-376, 456-471:
    exp_avg/exp_avg_sq of the whole opacity group become zeros).

    Keeping stale moments is catastrophic, not cosmetic: a converged
    scene has tiny mu AND tiny nu, so after the reset every point that
    receives no gradient (not visible this frame) keeps drifting by
    mu/sqrt(nu) ~ O(1) * lr per iteration in an arbitrary direction —
    half of them fall below min_opacity before the next prune and the
    scene collapses (observed: 96k -> 371 points at the first reset of
    the 20k parity run). With zeroed moments a zero-grad point stays at
    exactly 0.01 and survives."""
    params = reset_opacity(state.params, apply_mask)

    def zero_op(tree: GaussianParams) -> GaussianParams:
        return tree._replace(opacity=jnp.zeros_like(tree.opacity))

    adam = state.adam._replace(
        mu=zero_op(state.adam.mu), nu=zero_op(state.adam.nu)
    )
    return state._replace(params=params, adam=adam)


def add_densification_stats(
    aux: GaussianAux,
    mean2d_grad: jnp.ndarray,  # (C, 2) grad w.r.t. NDC means
    radii: jnp.ndarray,  # (C,) int32
    pixels: jnp.ndarray,  # (C,) touched-pixel counts
    apply_mask: Optional[jnp.ndarray] = None,
) -> GaussianAux:
    """Update max radii and pixel-weighted screen-gradient stats
    (train.py:443-449, gaussian_model.py:648-654)."""
    update = radii > 0
    sel = update if apply_mask is None else (update & apply_mask)
    gnorm = jnp.linalg.norm(mean2d_grad, axis=-1)
    return aux._replace(
        max_radii2d=jnp.where(
            update, jnp.maximum(aux.max_radii2d, radii.astype(jnp.float32)),
            aux.max_radii2d,
        ),
        xyz_grad_accum=jnp.where(
            sel, aux.xyz_grad_accum + gnorm * pixels, aux.xyz_grad_accum
        ),
        denom=jnp.where(sel, aux.denom + pixels, aux.denom),
    )

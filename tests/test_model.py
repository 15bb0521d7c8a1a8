"""Tests for GaussianModel state: Adam semantics, densify/prune."""

import jax
import jax.numpy as jnp
import numpy as np

from gftorf_tpu.models.gaussians import (
    AdamState,
    DensifyHyper,
    GaussianAux,
    GaussianModelState,
    GaussianParams,
    adam_update,
    densify_and_prune,
    get_opacity,
    get_scaling,
    init_from_pcd,
    inverse_sigmoid,
    prune_only,
    reset_opacity,
)


def make_state(n=16, capacity=64, seed=0, sh_degree=1):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    return init_from_pcd(
        pts, cols, rng.rand(n).astype(np.float32),
        rng.rand(n).astype(np.float32), None, capacity, sh_degree=sh_degree,
    )


class TestInit:
    def test_shapes_and_alive(self):
        st = make_state()
        assert st.params.xyz.shape == (64, 3)
        assert int(st.aux.alive.sum()) == 16
        assert st.params.sh_color.shape == (64, 4, 3)

    def test_scales_from_knn(self):
        # Regular grid: knn dist = 1 -> log(sqrt(1)) = 0
        xs = np.arange(4, dtype=np.float32)
        pts = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
        st = init_from_pcd(pts, np.ones((64, 3)) * 0.5, None, None, None, 128)
        np.testing.assert_allclose(
            st.params.scaling[:64], 0.0, atol=1e-5
        )


class TestAdam:
    def test_matches_torch_formula(self):
        import torch

        st = make_state(n=4, capacity=4)
        p0 = np.array(st.params.xyz)
        g = np.ones_like(p0) * 0.3

        tp = torch.nn.Parameter(torch.tensor(p0))
        topt = torch.optim.Adam([tp], lr=0.01, eps=1e-15)
        lrs = jax.tree.map(lambda _: 0.0, st.params)._replace(xyz=0.01)
        params, adam = st.params, st.adam
        for i in range(5):
            grads = jax.tree.map(jnp.zeros_like, params)._replace(
                xyz=jnp.asarray(g * (i + 1))
            )
            params, adam = adam_update(params, grads, adam, lrs)
            tp.grad = torch.tensor(g * (i + 1))
            topt.step()
        np.testing.assert_allclose(params.xyz, tp.detach().numpy(), rtol=1e-5)

    def test_skip_semantics(self):
        """on=0 must be a true skip (reference conditional optimizer.step(),
        train.py:469-472): params, moments AND step counter unchanged —
        unlike an lr of 0, which decays grads into the moments."""
        st = make_state(n=4, capacity=4)
        lrs = jax.tree.map(lambda _: 0.01, st.params)
        grads = jax.tree.map(jnp.ones_like, st.params)

        p_off, a_off = adam_update(
            st.params, grads, st.adam, lrs, on=jnp.float32(0.0)
        )
        assert int(a_off.step) == 0
        for new, old in zip(jax.tree.leaves(p_off), jax.tree.leaves(st.params)):
            np.testing.assert_array_equal(new, old)
        for new, old in zip(jax.tree.leaves(a_off.mu), jax.tree.leaves(st.adam.mu)):
            np.testing.assert_array_equal(new, old)

        p_on, a_on = adam_update(
            st.params, grads, st.adam, lrs, on=jnp.float32(1.0)
        )
        p_ref, a_ref = adam_update(st.params, grads, st.adam, lrs)
        assert int(a_on.step) == int(a_ref.step) == 1
        np.testing.assert_allclose(p_on.xyz, p_ref.xyz)


class TestDensify:
    def test_clone_small_high_grad(self):
        st = make_state(n=8, capacity=32)
        # small scales, high grad on points 0..3
        st = st._replace(
            params=st.params._replace(scaling=jnp.full_like(st.params.scaling, -5.0)),
            aux=st.aux._replace(
                xyz_grad_accum=st.aux.xyz_grad_accum.at[:4].set(10.0),
                denom=st.aux.denom.at[:8].set(1.0),
            ),
        )
        new, dropped = densify_and_prune(
            st, jax.random.PRNGKey(0), DensifyHyper(), scene_extent=10.0,
            max_screen_size=0.0,
        )
        assert int(dropped) == 0
        assert int(new.aux.alive.sum()) == 12  # 8 + 4 clones

    def test_screen_size_prune_is_inert_like_reference(self):
        """The reference's big_points_vs prune (gaussian_model.py:634)
        never fires: densification_postfix zeroes max_radii2D (:566)
        before the prune reads it. A point with a huge ACCUMULATED
        screen radius but healthy opacity/scale must survive a
        size-enabled densify; the live world-size rules (0.05/0.001 x
        extent) must still prune."""
        st = make_state(n=8, capacity=32)
        st = st._replace(
            aux=st.aux._replace(
                max_radii2d=jnp.full_like(st.aux.max_radii2d, 500.0),
                denom=st.aux.denom.at[:8].set(1.0),
            ),
            # healthy scales everywhere except one oversized
            # (big_points_ws) and one degenerate point
            params=st.params._replace(
                scaling=jnp.full_like(st.params.scaling, jnp.log(0.1))
                .at[0].set(jnp.log(1.0))   # > 0.05 * 10
                .at[1].set(jnp.log(1e-4))  # < 0.001 * 10
            ),
        )
        new, dropped = densify_and_prune(
            st, jax.random.PRNGKey(0), DensifyHyper(), scene_extent=10.0,
            max_screen_size=10.0,
        )
        assert int(dropped) == 0
        alive = np.array(new.aux.alive)
        assert not alive[0] and not alive[1]  # world-size rules fire
        assert alive[2:8].all()  # accumulated radii alone never prune
        # and max_radii2d is zeroed for the next interval (postfix :566)
        assert np.all(np.array(new.aux.max_radii2d) == 0.0)

    def test_split_large_high_grad(self):
        st = make_state(n=8, capacity=64)
        st = st._replace(
            params=st.params._replace(scaling=jnp.full_like(st.params.scaling, 1.0)),
            aux=st.aux._replace(
                xyz_grad_accum=st.aux.xyz_grad_accum.at[:2].set(10.0),
                denom=st.aux.denom.at[:8].set(1.0),
            ),
        )
        new, dropped = densify_and_prune(
            st, jax.random.PRNGKey(0), DensifyHyper(), scene_extent=10.0,
            max_screen_size=0.0,
        )
        assert int(dropped) == 0
        # 8 alive - 2 split originals + 2*2 new = 10
        assert int(new.aux.alive.sum()) == 10
        # new split scales shrunk by 1/(0.8*2)
        alive_scales = np.array(get_scaling(new.params))[np.array(new.aux.alive)]
        assert np.min(alive_scales) < np.exp(1.0)

    def test_prune_low_opacity(self):
        st = make_state(n=8, capacity=16)
        op = st.params.opacity.at[:3].set(inverse_sigmoid(jnp.float32(0.001)))
        st = st._replace(params=st.params._replace(opacity=op))
        new, dropped = densify_and_prune(
            st, jax.random.PRNGKey(0), DensifyHyper(), scene_extent=10.0,
            max_screen_size=0.0,
        )
        assert int(new.aux.alive.sum()) == 5

    def test_capacity_overflow_reported(self):
        st = make_state(n=8, capacity=9)
        st = st._replace(
            params=st.params._replace(scaling=jnp.full_like(st.params.scaling, -5.0)),
            aux=st.aux._replace(
                xyz_grad_accum=st.aux.xyz_grad_accum.at[:8].set(10.0),
                denom=st.aux.denom.at[:8].set(1.0),
            ),
        )
        new, dropped = densify_and_prune(
            st, jax.random.PRNGKey(0), DensifyHyper(), scene_extent=10.0,
            max_screen_size=0.0,
        )
        assert int(dropped) == 7  # 8 clones wanted, 1 free slot

    def test_moments_zeroed_for_new(self):
        st = make_state(n=8, capacity=32)
        mu = jax.tree.map(lambda x: jnp.ones_like(x), st.params)
        st = st._replace(
            adam=AdamState(mu=mu, nu=mu, step=jnp.int32(5)),
            params=st.params._replace(scaling=jnp.full_like(st.params.scaling, -5.0)),
            aux=st.aux._replace(
                xyz_grad_accum=st.aux.xyz_grad_accum.at[:4].set(10.0),
                denom=st.aux.denom.at[:8].set(1.0),
            ),
        )
        new, _ = densify_and_prune(
            st, jax.random.PRNGKey(0), DensifyHyper(), 10.0, 0.0
        )
        new_slots = np.array(new.aux.alive) & ~np.array(st.aux.alive)
        assert new_slots.sum() == 4
        assert np.all(np.array(new.adam.mu.xyz)[new_slots] == 0.0)
        assert int(new.adam.step) == 5


class TestOpacityOps:
    def test_reset_opacity(self):
        st = make_state()
        p = reset_opacity(st.params)
        assert float(get_opacity(p).max()) <= 0.011

    def test_reset_opacity_masked(self):
        st = make_state(n=8, capacity=8)
        mask = jnp.arange(8) < 4
        p = reset_opacity(st.params, apply_mask=mask)
        op = np.array(get_opacity(p))[:, 0]
        assert np.all(op[:4] <= 0.011)
        np.testing.assert_allclose(op[4:], 0.1, rtol=1e-5)

    def test_reset_opacity_state_zeroes_adam(self):
        """The reset must zero the opacity Adam moments like the
        reference's replace_tensor_to_optimizer (gaussian_model.py:
        369-376,456-471). Stale moments make zero-grad (invisible)
        points drift off the 0.01 clamp and get mass-pruned at the next
        densify (observed 96k -> 371 points in a 20k run)."""
        from gftorf_tpu.models.gaussians import reset_opacity_state

        st = make_state()
        ones = jax.tree.map(jnp.ones_like, st.params)
        st = st._replace(adam=st.adam._replace(mu=ones, nu=ones))
        new = reset_opacity_state(st)
        assert float(get_opacity(new.params).max()) <= 0.011
        assert np.all(np.array(new.adam.mu.opacity) == 0.0)
        assert np.all(np.array(new.adam.nu.opacity) == 0.0)
        # other groups keep their moments (only opacity is replaced)
        assert np.all(np.array(new.adam.mu.xyz) == 1.0)
        # a zero-gradient point must now stay exactly at the clamp
        from gftorf_tpu.models.gaussians import adam_update

        zero_g = jax.tree.map(jnp.zeros_like, new.params)
        lrs = jax.tree.map(lambda _: 0.05, new.params)
        stepped, _ = adam_update(new.params, zero_g, new.adam, lrs)
        np.testing.assert_array_equal(
            np.asarray(stepped.opacity), np.asarray(new.params.opacity)
        )

    def test_prune_only(self):
        st = make_state(n=8, capacity=8)
        op = st.params.opacity.at[:2].set(inverse_sigmoid(jnp.float32(0.001)))
        st = st._replace(params=st.params._replace(opacity=op))
        new = prune_only(st, 0.01)
        assert int(new.aux.alive.sum()) == 6


def test_sort_layout_partitions_and_preserves():
    """sort_layout: rows become [dynamic+alive | static+alive | dead],
    the multiset of live points is unchanged (params+aux+adam move
    together), and sorting a sorted state is the identity."""
    import jax

    from gftorf_tpu.models.gaussians import (
        get_motion_mask,
        sort_layout,
    )

    state = make_state(n=64, capacity=64)
    # scatter alive + motion arbitrarily
    alive = jnp.zeros((64,), bool).at[jnp.arange(3, 60, 4)].set(True)
    seg = state.params.seg_color.at[::3, 0].set(1.0)
    state = state._replace(
        params=state.params._replace(seg_color=seg),
        aux=state.aux._replace(alive=alive),
    )
    # tag Adam moments so row movement is observable
    mu = state.adam.mu._replace(
        xyz=jnp.arange(64, dtype=jnp.float32)[:, None].repeat(3, 1))
    state = state._replace(adam=state.adam._replace(mu=mu))

    s = sort_layout(state)
    motion = np.asarray(get_motion_mask(s.params))
    al = np.asarray(s.aux.alive)
    n_dyn = int((al & motion).sum())
    n_alive = int(al.sum())
    assert al[:n_alive].all() and not al[n_alive:].any()
    assert motion[:n_dyn].all() or n_dyn == 0
    assert not (al[n_dyn:n_alive] & motion[n_dyn:n_alive]).any()

    # multiset preservation: (xyz, mu.xyz) pairs identical up to order
    def rows(st):
        return sorted(map(tuple, np.c_[np.asarray(st.params.xyz),
                                       np.asarray(st.adam.mu.xyz),
                                       np.asarray(st.aux.alive)].tolist()))

    assert rows(s) == rows(state)

    s2 = sort_layout(s)
    for a, b in zip(jax.tree.leaves(s), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

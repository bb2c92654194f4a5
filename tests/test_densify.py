"""Functional densification vs the reference semantics
(`scene/gaussian_model.py:486-589`)."""

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.models import densify as dz
from fourdgs_tpu.models.gaussians import (GaussianState, init_from_pcd)

CFG = dz.DensifyConfig(grad_threshold=0.1, min_opacity=0.005,
                       percent_dense=0.01)


def _make_state(n=8, capacity=32, rng=None) -> GaussianState:
    rng = rng or np.random.default_rng(0)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.random((n, 3)).astype(np.float32)
    return init_from_pcd(pts, cols, sh_channels=16, capacity=capacity)


def test_clone_small_high_grad():
    st = _make_state()
    n0 = int(st.n_active)
    # Give point 2 a high accumulated grad and keep its scale tiny.
    st = st._replace(
        params=st.params._replace(
            scaling=st.params.scaling.at[2].set(-8.0)),
        xyz_grad_accum=st.xyz_grad_accum.at[2].set(10.0),
        denom=st.denom.at[2].set(1.0))
    new, info = dz.densify_and_prune(
        st, jax.random.PRNGKey(0), jnp.float32(100.0), cfg=CFG)
    assert int(info.n_cloned) == 1
    assert int(info.n_split) == 0
    assert int(new.n_active) == n0 + 1
    # The clone is appended after the survivors and copies the parent.
    np.testing.assert_allclose(np.asarray(new.params.xyz[n0]),
                               np.asarray(st.params.xyz[2]))
    # Parent survives in place (order preserved).
    np.testing.assert_allclose(np.asarray(new.params.xyz[:n0]),
                               np.asarray(st.params.xyz[:n0]))
    # Clone's Adam moments are zero; stats all reset.
    assert float(jnp.abs(new.adam.mu.xyz[n0]).max()) == 0.0
    assert float(new.denom.max()) == 0.0


def test_split_large_high_grad():
    st = _make_state()
    n0 = int(st.n_active)
    extent = 1.0
    # Point 3: big world scale (> percent_dense * extent) + high grad.
    st = st._replace(
        params=st.params._replace(
            scaling=st.params.scaling.at[3].set(np.log(0.5))),
        xyz_grad_accum=st.xyz_grad_accum.at[3].set(10.0),
        denom=st.denom.at[3].set(1.0))
    new, info = dz.densify_and_prune(
        st, jax.random.PRNGKey(1), jnp.float32(extent), cfg=CFG)
    assert int(info.n_split) == 1
    # Parent removed, two children appended.
    assert int(new.n_active) == n0 - 1 + 2
    child = np.asarray(new.params.scaling[n0 - 1: n0 + 1])
    np.testing.assert_allclose(child, np.log(0.5 / 1.6), rtol=1e-5)
    # Children scatter around the parent (4D sampling): t also perturbed.
    assert np.abs(np.asarray(new.params.xyz[n0 - 1]) -
                  np.asarray(st.params.xyz[3])).max() < 5.0


def test_prune_low_opacity():
    st = _make_state()
    n0 = int(st.n_active)
    st = st._replace(
        params=st.params._replace(
            opacity=st.params.opacity.at[1].set(-12.0)))  # sigmoid ~ 6e-6
    new, info = dz.densify_and_prune(
        st, jax.random.PRNGKey(2), jnp.float32(100.0), cfg=CFG)
    assert int(info.n_pruned) == 1
    assert int(new.n_active) == n0 - 1
    # Survivor order: 0, 2, 3, ... (row 1 removed).
    np.testing.assert_allclose(np.asarray(new.params.xyz[0]),
                               np.asarray(st.params.xyz[0]))
    np.testing.assert_allclose(np.asarray(new.params.xyz[1]),
                               np.asarray(st.params.xyz[2]))


def test_size_threshold_prunes_big_world_scale():
    st = _make_state()
    n0 = int(st.n_active)
    extent = 1.0
    st = st._replace(params=st.params._replace(
        scaling=jnp.full_like(st.params.scaling, -8.0).at[4].set(
            np.log(0.5))))  # only row 4 > 0.1 * extent
    # Without size threshold: survives. With: pruned.
    keep, _ = dz.densify_and_prune(st, jax.random.PRNGKey(3),
                                   jnp.float32(extent), cfg=CFG,
                                   use_size_threshold=False)
    # big-scale + low grad -> not split, stays
    assert int(keep.n_active) == n0
    newer, _ = dz.densify_and_prune(st, jax.random.PRNGKey(3),
                                    jnp.float32(extent), cfg=CFG,
                                    use_size_threshold=True)
    assert int(newer.n_active) == n0 - 1


def test_prune_only_uses_radii():
    st = _make_state()
    n0 = int(st.n_active)
    st = st._replace(max_radii2d=st.max_radii2d.at[5].set(50.0),
                     denom=st.denom.at[0].set(7.0))
    new, n_keep = dz.prune_only(st, jnp.float32(100.0), cfg=CFG)
    assert int(n_keep) == n0 - 1
    # prune_only keeps (gathers) stats — row 0's denom survives.
    assert float(new.denom[0]) == 7.0


def test_reset_opacity():
    st = _make_state()
    st2 = dz.reset_opacity(st)
    op = jax.nn.sigmoid(st2.params.opacity[: int(st.n_active)])
    assert float(op.max()) <= 0.01 + 1e-6
    assert float(jnp.abs(st2.adam.mu.opacity).max()) == 0.0


def test_add_stats_and_grow():
    st = _make_state(n=8, capacity=32)
    vis = jnp.zeros(32, bool).at[2].set(True)
    st = dz.add_densification_stats(
        st, jnp.full((32,), 0.5), jnp.full((32,), 0.1), vis,
        jnp.full((32,), 7, jnp.int32))
    assert float(st.xyz_grad_accum[2]) == 0.5
    assert float(st.xyz_grad_accum[3]) == 0.0
    assert float(st.denom[2]) == 1.0
    assert float(st.max_radii2d[2]) == 7.0

    grown = dz.grow_capacity(st, 64)
    assert grown.params.xyz.shape[0] == 64
    np.testing.assert_allclose(np.asarray(grown.params.xyz[:32]),
                               np.asarray(st.params.xyz))
    assert float(grown.params.rotation[40, 0]) == 1.0


def test_overflow_reports_needed():
    st = _make_state(n=8, capacity=9)
    # Every point hot + small scale -> 8 clones but capacity 9.
    st = st._replace(xyz_grad_accum=st.xyz_grad_accum.at[:8].set(10.0),
                     denom=st.denom.at[:8].set(1.0),
                     params=st.params._replace(
                         scaling=jnp.full_like(st.params.scaling, -8.0)))
    new, info = dz.densify_and_prune(
        st, jax.random.PRNGKey(0), jnp.float32(100.0), cfg=CFG)
    assert int(info.n_needed) == 16
    assert int(new.n_active) == 9  # clipped; host grows + retries


def test_shrink_capacity_preserves_prefix():
    state = _make_state(n=8, capacity=64)
    # Stamp recognizable Adam/stat values on the live prefix.
    state = state._replace(
        adam=state.adam._replace(
            mu=state.adam.mu._replace(
                xyz=state.adam.mu.xyz.at[:8].set(1.5))),
        denom=state.denom.at[:8].set(3.0))
    small = dz.shrink_capacity(state, 16)
    assert small.params.xyz.shape[0] == 16
    assert int(small.n_active) == 8
    for f in small.params._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(small.params, f))[:8],
            np.asarray(getattr(state.params, f))[:8], err_msg=f)
    np.testing.assert_array_equal(np.asarray(small.adam.mu.xyz)[:8], 1.5)
    np.testing.assert_array_equal(np.asarray(small.denom)[:8], 3.0)
    # Refuses to drop live rows or to "shrink" upward.
    assert dz.shrink_capacity(state, 4) is state
    assert dz.shrink_capacity(state, 128) is state

"""Direct property tests for the tile-binning layer (ops/binning.py):
the one-sort K-aligned layout must describe EXACTLY the same per-tile
depth-ordered instance lists as the plain sorted expansion, for random
rect/depth populations including empty tiles, duplicate depths, and
whole-gaussian capacity truncation."""

import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.ops import binning
from fourdgs_tpu.ops.preprocess import ProcessedGaussians, RenderOptions

OPTS = RenderOptions(height=48, width=64, gaussian_dim=4, rot_4d=True,
                     time_duration=1.0)  # 3x4 = 12 tiles


def _proc(rng, p, tiles_x=4, tiles_y=3, dup_depths=False):
    """Random rect/depth population; only fields binning reads matter."""
    x0 = rng.integers(0, tiles_x, p)
    y0 = rng.integers(0, tiles_y, p)
    x1 = np.minimum(x0 + rng.integers(1, 3, p), tiles_x)
    y1 = np.minimum(y0 + rng.integers(1, 3, p), tiles_y)
    rect = np.stack([x0, y0, x1, y1], axis=1).astype(np.int32)
    tiles = ((x1 - x0) * (y1 - y0)).astype(np.int32)
    # Random cull: some gaussians touch no tile at all.
    culled = rng.random(p) < 0.2
    tiles[culled] = 0
    rect[culled] = 0
    depth = (rng.integers(1, 4, p).astype(np.float32) if dup_depths
             else rng.uniform(0.5, 9.0, p).astype(np.float32))
    z = lambda *s: jnp.zeros(s, jnp.float32)  # noqa: E731
    return ProcessedGaussians(
        xy=z(p, 2), depth=jnp.asarray(depth), conic=z(p, 3), opacity=z(p),
        rgb=z(p, 3), flow=z(p, 2),
        radius=jnp.asarray((tiles > 0).astype(np.int32)),
        rect=jnp.asarray(rect), tiles_touched=jnp.asarray(tiles),
        visible=jnp.asarray(tiles > 0), means3d=z(p, 3), cov3d=z(p, 6))


def _naive_tile_lists(proc, num_tiles, tiles_x, limit):
    """Oracle: python expansion -> per-tile stable (depth, slot) order."""
    rect = np.asarray(proc.rect)
    depth = np.asarray(proc.depth)
    tiles = np.asarray(proc.tiles_touched)
    entries = []            # (tile, depth, slot, gid)
    slot = 0
    for g in range(rect.shape[0]):
        if tiles[g] == 0:
            continue
        x0, y0, x1, y1 = rect[g]
        for ty in range(y0, y1):
            for tx in range(x0, x1):
                entries.append(((ty * tiles_x + tx), depth[g], slot, g))
                slot += 1
    entries = [e for e in entries if e[2] < limit]
    out = {t: [] for t in range(num_tiles)}
    for t, d, s, g in sorted(entries, key=lambda e: (e[0], e[1], e[2])):
        out[t].append((g, s))
    return out


@pytest.mark.parametrize("grad", [True, False])
@pytest.mark.parametrize("force_lex", [False, True])
@pytest.mark.parametrize("dup_depths", [False, True])
@pytest.mark.parametrize("p", [1, 17, 120])
def test_aligned_matches_naive(rng, p, dup_depths, force_lex, grad):
    # force_lex exercises the lexicographic fallback path (chosen
    # automatically only when the packed rank key cannot fit u32);
    # grad=False the single-operand inference sort (rank-indexed
    # source table).
    k = 8
    capacity = 512
    proc = _proc(rng, p, dup_depths=dup_depths)
    ab = binning.bin_gaussians_aligned(proc, OPTS, capacity, k,
                                       force_lex=force_lex, grad=grad)
    want = _naive_tile_lists(proc, OPTS.num_tiles, OPTS.tiles_x, capacity)

    gid = np.asarray(binning.aligned_gauss_ids(ab))
    start = np.asarray(ab.tile_start)
    count = np.asarray(ab.tile_count)
    assert int(ab.num_rendered) == sum(len(v) for v in want.values())
    for t in range(OPTS.num_tiles):
        assert start[t] % k == 0, "tile range not K-aligned"
        got = [int(gid[i]) for i in range(start[t], start[t] + count[t])]
        assert got == [g for g, _ in want[t]], f"tile {t} mismatch"
    # seg_offsets = inclusive cumsum of per-gaussian instance counts
    # taken in source_perm (row_id) order; out_perm inverts source_perm.
    perm = np.asarray(ab.source_perm)
    assert np.array_equal(
        np.asarray(ab.seg_offsets),
        np.cumsum(np.asarray(proc.tiles_touched)[perm]))
    assert np.array_equal(np.asarray(ab.out_perm)[perm], np.arange(p))


@pytest.mark.parametrize("fast", [False, True])
@pytest.mark.parametrize("mode", ["gid", "lex", "rank"])
def test_aligned_grad_reduce_oracle(rng, mode, fast):
    """The row_id-keyed sort reduce must equal a per-gaussian numpy
    segment sum of the live aligned rows (dummy/garbage rows excluded)
    under every layout contract (gid payload / lex / rank-indexed)."""
    k = 8
    p = 60
    capacity = 512
    proc = _proc(rng, p)
    ab = binning.bin_gaussians_aligned(proc, OPTS, capacity, k,
                                       force_lex=(mode == "lex"),
                                       grad=(mode != "rank"))
    rp = ab.row_id.shape[0]
    c = 10
    grads = rng.normal(size=(c, rp)).astype(np.float32)
    if fast:
        # Match the fast path's bf16 payload rounding in the oracle.
        grads = np.asarray(
            jnp.asarray(grads).astype(jnp.bfloat16).astype(jnp.float32))
    out = np.asarray(binning.aligned_entry_grads_to_gaussian_grads(
        jnp.asarray(grads), ab, capacity=capacity, fast=fast))
    gid = np.asarray(binning.aligned_gauss_ids(ab))
    rp = ab.row_id.shape[0]
    live = np.arange(rp) < int(ab.total_len)
    want = np.zeros((p, c), np.float32)
    for i in range(rp):
        if live[i] and gid[i] < p:
            want[gid[i]] += grads[:, i]
    np.testing.assert_allclose(out, want, rtol=2e-2, atol=1e-4)


def test_aligned_whole_gaussian_truncation(rng):
    """Over capacity: later gaussians' instances drop as WHOLE gaussians
    and num_rendered still reports the true (pre-drop) count."""
    k = 8
    p = 120
    proc = _proc(rng, p)
    full = binning.bin_gaussians_aligned(proc, OPTS, 4096, k)
    true_n = int(full.num_rendered)
    capacity = max(8, true_n // 3)
    ab = binning.bin_gaussians_aligned(proc, OPTS, capacity, k)
    assert int(ab.num_rendered) == true_n          # overflow signal intact
    # Included instances = the longest whole-gaussian prefix <= capacity.
    offsets = np.cumsum(np.asarray(proc.tiles_touched))
    n_eff = 0
    for g in range(p):
        if offsets[g] <= capacity:
            n_eff = offsets[g]
    assert int(np.asarray(ab.tile_count).sum()) == n_eff
    want = _naive_tile_lists(proc, OPTS.num_tiles, OPTS.tiles_x, n_eff)
    gid = np.asarray(binning.aligned_gauss_ids(ab))
    start = np.asarray(ab.tile_start)
    count = np.asarray(ab.tile_count)
    for t in range(OPTS.num_tiles):
        got = [int(gid[i]) for i in range(start[t], start[t] + count[t])]
        assert got == [g for g, _ in want[t]], f"tile {t}"


def test_dummy_budget_overflow_sentinels(rng):
    """A deliberately tiny dummy budget must flag the step (dropped ==
    num_rendered, total_len == Rp + 1), keep tile ranges in-bounds, and
    zero the gradient reduce — never crash or mis-attribute."""
    k = 8
    p = 120
    capacity = 512
    proc = _proc(rng, p)
    ab = binning.bin_gaussians_aligned(proc, OPTS, capacity, k,
                                       dummy_cap=k)     # 8 << needed
    rp = ab.row_id.shape[0]
    assert rp == capacity + k
    assert int(ab.dropped) == int(ab.num_rendered)
    assert int(ab.total_len) == rp + 1
    start = np.asarray(ab.tile_start)
    count = np.asarray(ab.tile_count)
    assert np.all(start >= 0) and np.all(start <= rp)
    assert np.all(count >= 0) and np.all(start + count <= rp)
    grads = jnp.asarray(rng.normal(size=(10, rp)).astype(np.float32))
    out = binning.aligned_entry_grads_to_gaussian_grads(
        grads, ab, capacity=capacity)
    assert np.all(np.asarray(out) == 0.0)


def test_dummy_budget_exact_matches_full(rng):
    """With a budget >= the true pad total, the compact dummy block
    reproduces the worst-case layout's per-tile lists exactly."""
    k = 8
    p = 60
    capacity = 512
    proc = _proc(rng, p)
    full = binning.bin_gaussians_aligned(proc, OPTS, capacity, k,
                                         dummy_cap=OPTS.num_tiles * k)
    counts = np.asarray(full.tile_count)
    need = int(np.sum((-counts) % k))
    tight = binning.bin_gaussians_aligned(proc, OPTS, capacity, k,
                                          dummy_cap=max(k, need))
    assert int(tight.dropped) == 0
    gid_f = np.asarray(binning.aligned_gauss_ids(full))
    gid_t = np.asarray(binning.aligned_gauss_ids(tight))
    start, cnt = np.asarray(full.tile_start), counts
    for t in range(OPTS.num_tiles):
        np.testing.assert_array_equal(
            gid_f[start[t]:start[t] + cnt[t]],
            gid_t[np.asarray(tight.tile_start)[t]:
                  np.asarray(tight.tile_start)[t]
                  + np.asarray(tight.tile_count)[t]], f"tile {t}")

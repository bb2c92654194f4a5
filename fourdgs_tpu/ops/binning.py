"""Tile binning: expand gaussians into per-tile instances, sort by
(tile, depth), and compute per-tile ranges.

TPU-first redesign of the reference pipeline
(`rasterizer_impl.cu:199-364`: CUB InclusiveSum → duplicateWithKeys →
64-bit radix sort → identifyTileRanges):

  * The dynamic `num_rendered` becomes a static instance CAPACITY with an
    overflow flag — the host grows capacity (recompile) when exceeded,
    replacing the reference's resize-callback buffers
    (`rasterize_points.cu:28-34`).
  * duplicateWithKeys' data-dependent per-gaussian loop becomes a gather:
    for each instance slot r, the owning gaussian is
    searchsorted(cumsum(tiles_touched), r) — O(R log P), no scatter.
  * The 64-bit radix sort becomes a lexicographic `lax.sort` on
    (tile, depth) key pairs — XLA's native on-device sort.
  * identifyTileRanges becomes two searchsorteds over the sorted tile ids.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .preprocess import ProcessedGaussians, RenderOptions


class TileBins(NamedTuple):
    gauss_id: jax.Array        # (R,) int32, instance → gaussian, sorted by (tile, depth)
    expansion_slot: jax.Array  # (R,) int32, instance → pre-sort slot (for grad reduce)
    tile_sorted: jax.Array     # (R,) int32 sorted tile id (num_tiles = invalid)
    tile_start: jax.Array      # (num_tiles,) int32
    tile_stop: jax.Array       # (num_tiles,) int32
    offsets: jax.Array         # (P,) int32 inclusive cumsum of tiles_touched
    num_rendered: jax.Array    # () int32 — true instance count (may exceed capacity)
    max_per_tile: jax.Array    # () int32 — densest tile population (for host schedule)


class AlignedBins(NamedTuple):
    """Chunk-aligned instance layout for the Pallas tile kernels: every
    tile's instance range starts at a multiple of the chunk size K, so
    per-chunk DMA reads/writes never straddle a tile boundary. Padding
    slots point at gaussian `p` (invalid). Built WITHOUT large scatters
    (XLA scatter on TPU is ~20x slower than gather): tile membership of
    aligned positions comes from a boundary-mark cumsum; the gradient
    reduce un-sorts by SORTING the gradient columns on `slot` (sorts are
    the cheapest permutation primitive on TPU)."""
    gauss_id: jax.Array        # (Rp,) int32 (p = invalid padding)
    slot: jax.Array            # (Rp,) int32: aligned pos -> expansion slot
    #                            (a permutation of [0, rp); dummies own
    #                             slots >= capacity)
    tile_start: jax.Array      # (num_tiles,) int32 — K-aligned offsets
    tile_count: jax.Array      # (num_tiles,) int32 — true instance counts
    total_len: jax.Array       # () int32 — end of the live aligned region
    offsets: jax.Array         # (P,) int32 (from TileBins, for grad reduce)
    num_rendered: jax.Array    # () int32
    max_per_tile: jax.Array    # () int32


def bin_gaussians_aligned(proc: ProcessedGaussians, opts: RenderOptions,
                          capacity: int, k: int) -> AlignedBins:
    """One-sort construction of the K-aligned instance layout for the
    Pallas kernels.

    Instead of sorting the compact list and re-laying it out (two sorts +
    many passes), per-tile padding DUMMY instances (depth = +inf) are
    appended BEFORE the single (tile, depth) sort, sized from an instance
    histogram so each tile's sorted segment is already a multiple of K.
    Tile offsets come from the histogram, not a searchsorted.
    """
    p = proc.tiles_touched.shape[0]
    num_tiles = opts.num_tiles
    tiles_x = opts.tiles_x
    tiles_y = opts.tiles_y
    rp = aligned_capacity(capacity, num_tiles, k)

    offsets = jnp.cumsum(proc.tiles_touched, dtype=jnp.int32)
    num_rendered = offsets[-1]
    # Whole-gaussian truncation on overflow: drop the boundary gaussian's
    # partial instance run entirely so the rect-based histogram below
    # agrees EXACTLY with the expanded instance set.
    last_full = jnp.searchsorted(offsets, capacity, side="right") - 1
    num_eff = jnp.where(last_full >= 0,
                        offsets[jnp.maximum(last_full, 0)], 0)
    num_eff = jnp.minimum(num_eff, capacity)

    # Instance -> owning gaussian via begin-marks + cumsum (see
    # bin_gaussians below for the trick).
    slots = jnp.arange(capacity, dtype=jnp.int32)
    begin = offsets - proc.tiles_touched
    marks = jnp.zeros((capacity,), jnp.int32).at[begin].add(1, mode="drop")
    owner = jnp.cumsum(marks) - 1
    owner_c = jnp.clip(owner, 0, p - 1)

    # TPU gathers cost ~constant per ROW regardless of width — pack every
    # per-gaussian field needed downstream into one (P, 8) row and gather
    # ONCE instead of 5 columnar gathers.
    packed = jnp.stack([
        proc.rect[:, 0].astype(jnp.float32),            # x0
        proc.rect[:, 1].astype(jnp.float32),            # y0
        jnp.maximum(proc.rect[:, 2] - proc.rect[:, 0],  # width
                    1).astype(jnp.float32),
        begin.astype(jnp.float32),                      # first-slot index
        proc.depth.astype(jnp.float32),
        jnp.zeros((p,), jnp.float32),
        jnp.zeros((p,), jnp.float32),
        jnp.zeros((p,), jnp.float32),
    ], axis=1)
    g = packed[owner_c]                                 # (R, 8) one gather
    x0 = g[:, 0].astype(jnp.int32)
    y0 = g[:, 1].astype(jnp.int32)
    width = g[:, 2].astype(jnp.int32)
    local = slots - g[:, 3].astype(jnp.int32)
    row = (local.astype(jnp.float32) * (1.0 / g[:, 2])).astype(jnp.int32)
    row = jnp.where((row + 1) * width <= local, row + 1, row)
    row = jnp.where(row * width > local, row - 1, row)
    tile = (y0 + row) * tiles_x + x0 + (local - row * width)

    valid = slots < num_eff
    tile = jnp.where(valid, tile, num_tiles).astype(jnp.int32)
    depth = jnp.where(valid, g[:, 4], jnp.inf).astype(jnp.float32)
    gid = jnp.where(valid, owner_c, p).astype(jnp.int32)

    # Per-tile instance histogram WITHOUT a 1.5M-element collision scatter:
    # each included gaussian's rect adds a +1/-1 difference stencil to a
    # (tiles_y+1, tiles_x+1) grid (4P tiny scatter-adds), and a separable
    # 2D prefix sum recovers box counts.
    included = ((jnp.arange(p) <= last_full)
                & (proc.tiles_touched > 0)).astype(jnp.int32)
    gx0 = proc.rect[:, 0]
    gy0 = proc.rect[:, 1]
    gx1 = proc.rect[:, 2]
    gy1 = proc.rect[:, 3]
    gw = tiles_x + 1
    cells = jnp.concatenate([
        gy0 * gw + gx0, gy0 * gw + gx1, gy1 * gw + gx0, gy1 * gw + gx1])
    signs = jnp.concatenate([included, -included, -included, included])
    # Stencil accumulation by sort + prefix-sum differences at cell
    # boundaries instead of a 4P-element collision scatter-add (profiled
    # 2.7 ms at P=100k; the scatter-add path is pathological on TPU).
    ncells = (tiles_y + 1) * gw
    cells_s, signs_s = jax.lax.sort((cells, signs), num_keys=1)
    csum_s = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(signs_s)])
    bounds = jnp.searchsorted(
        cells_s, jnp.arange(ncells + 1, dtype=jnp.int32), side="left")
    diff = csum_s[bounds[1:]] - csum_s[bounds[:-1]]
    counts2d = jnp.cumsum(jnp.cumsum(
        diff.reshape(tiles_y + 1, gw), axis=0), axis=1)
    counts = counts2d[:tiles_y, :tiles_x].reshape(-1)
    pad = (-counts) % k                              # per-tile dummy count
    sums = jnp.cumsum(counts + pad, dtype=jnp.int32)
    aligned_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), sums[:-1]])
    total_len = sums[-1]        # live aligned region (tiles' ranges end)

    # Dummy block: K candidate dummies per tile, the first pad[t] live.
    dummy_t = jax.lax.broadcasted_iota(jnp.int32, (num_tiles, k), 0)
    dummy_i = jax.lax.broadcasted_iota(jnp.int32, (num_tiles, k), 1)
    dummy_tile = jnp.where(dummy_i < pad[:, None], dummy_t,
                           num_tiles).reshape(-1)
    n_dummy = num_tiles * k
    all_tile = jnp.concatenate([tile, dummy_tile])
    all_depth = jnp.concatenate(
        [depth, jnp.full((n_dummy,), jnp.inf, jnp.float32)])
    all_gid = jnp.concatenate([gid, jnp.full((n_dummy,), p, jnp.int32)])
    all_slot = jnp.concatenate(
        [slots, capacity + jnp.arange(n_dummy, dtype=jnp.int32)])

    # slot (the pre-sort expansion index, unique) as an explicit third
    # key reproduces the stable (tile, depth) order exactly — XLA's
    # stable sort would append a hidden iota operand for the same
    # tie-break; keying on slot drops that extra sorted column.
    _, _, slot_s, gid_s = jax.lax.sort(
        (all_tile, all_depth, all_slot, all_gid), num_keys=3,
        is_stable=False)

    return AlignedBins(
        gauss_id=gid_s,
        slot=slot_s,
        tile_start=aligned_off,
        tile_count=counts,
        total_len=total_len,
        offsets=offsets,
        num_rendered=num_rendered,
        max_per_tile=jnp.max(counts),
    )


def bin_gaussians(proc: ProcessedGaussians, opts: RenderOptions,
                  capacity: int) -> TileBins:
    """Build the sorted (tile, depth) instance list.

    `capacity` is the static instance budget R. If the true number of
    instances exceeds it, later gaussians' instances are dropped and
    `num_rendered > capacity` signals the host to grow the budget.
    """
    p = proc.tiles_touched.shape[0]
    num_tiles = opts.num_tiles
    tiles_x = opts.tiles_x

    offsets = jnp.cumsum(proc.tiles_touched, dtype=jnp.int32)  # inclusive
    num_rendered = offsets[-1]

    # Instance -> owning gaussian WITHOUT a binary search (a 2M-query
    # searchsorted costs ~17 gather rounds; this is one scatter-add of P
    # marks + one cumsum): mark every gaussian's first instance slot, then
    # owner(slot) = #begins <= slot - 1. Zero-count gaussians mark the
    # same slot as their successor, which the cumsum counts correctly.
    slots = jnp.arange(capacity, dtype=jnp.int32)
    begin = offsets - proc.tiles_touched           # (P,) exclusive starts
    marks = jnp.zeros((capacity,), jnp.int32).at[begin].add(1, mode="drop")
    owner = jnp.cumsum(marks) - 1
    owner_c = jnp.clip(owner, 0, p - 1)
    base = jnp.where(owner_c > 0, offsets[jnp.maximum(owner_c - 1, 0)], 0)
    local = slots - base

    # Columnar gathers (one (R,) gather per field beats an (R, 4) row
    # gather on TPU).
    x0 = proc.rect[:, 0][owner_c]
    y0 = proc.rect[:, 1][owner_c]
    width = jnp.maximum(proc.rect[:, 2] - proc.rect[:, 0], 1)[owner_c]
    # local // width via f32 reciprocal + exact correction (the VPU has no
    # native integer divide; values are < 2^23 so f32 math is near-exact
    # and one fix-up step makes it exact).
    row = (local.astype(jnp.float32)
           * (1.0 / width.astype(jnp.float32))).astype(jnp.int32)
    row = jnp.where((row + 1) * width <= local, row + 1, row)
    row = jnp.where(row * width > local, row - 1, row)
    col = local - row * width
    tile = (y0 + row) * tiles_x + x0 + col

    valid = slots < num_rendered
    tile = jnp.where(valid, tile, num_tiles).astype(jnp.int32)
    depth = jnp.where(valid, proc.depth[owner_c], jnp.inf).astype(jnp.float32)
    gid = jnp.where(valid, owner_c, 0).astype(jnp.int32)

    # slots is unique — keying on it reproduces the stable order without
    # XLA's hidden stability iota (see bin_gaussians_aligned).
    tile_s, _, slot_s, gid_s = jax.lax.sort(
        (tile, depth, slots, gid), num_keys=3, is_stable=False)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_s, tile_ids, side="left").astype(jnp.int32)
    tile_stop = jnp.searchsorted(tile_s, tile_ids, side="right").astype(jnp.int32)

    return TileBins(
        gauss_id=gid_s,
        expansion_slot=slot_s,
        tile_sorted=tile_s,
        tile_start=tile_start,
        tile_stop=tile_stop,
        offsets=offsets,
        num_rendered=num_rendered,
        max_per_tile=jnp.max(tile_stop - tile_start),
    )


def aligned_capacity(capacity: int, num_tiles: int, k: int) -> int:
    """Static padded-instance capacity for chunk-aligned layout."""
    return capacity + num_tiles * k


def _cumsum_lanes(x: jax.Array) -> jax.Array:
    """Inclusive cumsum of (C, R) f32 along axis 1 via 128-lane MXU
    blocks + a short inter-block carry chain.

    XLA lowers a plain jnp.cumsum to ~log2(R) full passes over the array
    (profiled 3.4 ms at (10, 786k)); one triangular-matmul pass + a
    4096x-smaller block-total cumsum reads the data twice (1.8 ms).
    HIGHEST precision keeps the 0/1-RHS products exact; accumulation
    order differs from the sequential scan by f32 rounding only."""
    c, r = x.shape
    rpad = (-r) % 128
    if rpad:
        x = jnp.pad(x, ((0, 0), (0, rpad)))
    blocks = x.shape[1] // 128
    xb = x.reshape(c, blocks, 128)
    row = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    tri = (row <= col).astype(jnp.float32)
    intra = jax.lax.dot_general(
        xb, tri, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # (C, B, 128)
    tot = intra[:, :, -1]                             # (C, B)
    carry = jnp.cumsum(tot, axis=1) - tot
    out = intra + carry[:, :, None]
    return out.reshape(c, -1)[:, :r]


def aligned_entry_grads_to_gaussian_grads(
    entry_grads_fm: jax.Array,   # (C, Rp) FIELD-MAJOR per-instance grads
    abins: AlignedBins,
    capacity: int,               # R of the pre-alignment instance list
    fast: bool = False,          # bf16 sort payloads (see fast_grad_reduce)
) -> jax.Array:
    """Aligned-layout gradient reduce: un-sort to expansion order by
    SORTING the gradient columns on the expansion slot (one multi-payload
    `lax.sort` — profiled cheaper than the row gather through an inverse
    permutation, and it removes the second sort that built that inverse),
    then cumsum segment sums per gaussian.

    `slot` is a permutation of [0, rp), so the sorted prefix [:capacity]
    IS expansion order. Rows past `total_len` are never written by the
    backward kernel (garbage memory) — their payload is zeroed before the
    sort; dummy/padding rows carry slots >= capacity and sort past the
    prefix. The cumsum runs in the (C, R) field-major layout along the
    lane axis — an (R, C) layout pads C -> 128 lanes on TPU and costs
    ~10x the HBM traffic. Returns (P, C) f32."""
    c, rp = entry_grads_fm.shape
    live = jnp.arange(rp, dtype=jnp.int32) < abins.total_len
    cols = [jnp.where(live, entry_grads_fm[i], 0.0) for i in range(c)]
    if fast:
        # Sort cost scales with operand count: pack bf16 PAIRS into u32
        # payload columns (5 payloads instead of 10 for the blend grads).
        packed = []
        for i in range(0, c, 2):
            hi = jax.lax.bitcast_convert_type(
                cols[i].astype(jnp.bfloat16),
                jnp.uint16).astype(jnp.uint32) << 16
            lo = (jax.lax.bitcast_convert_type(
                cols[i + 1].astype(jnp.bfloat16), jnp.uint16
            ).astype(jnp.uint32) if i + 1 < c else jnp.uint32(0))
            packed.append(hi | lo)
        sorted_ = jax.lax.sort((abins.slot,) + tuple(packed), num_keys=1)
        rows = []
        for i, s in enumerate(sorted_[1:]):
            s = s[:capacity]
            rows.append(jax.lax.bitcast_convert_type(
                (s >> 16).astype(jnp.uint16), jnp.bfloat16))
            if 2 * i + 1 < c:
                rows.append(jax.lax.bitcast_convert_type(
                    s.astype(jnp.uint16), jnp.bfloat16))
        stacked = jnp.stack([r.astype(jnp.float32) for r in rows], axis=0)
    else:
        sorted_ = jax.lax.sort((abins.slot,) + tuple(cols), num_keys=1)
        stacked = jnp.stack(
            [s[:capacity] for s in sorted_[1:]], axis=0)
    csum = _cumsum_lanes(stacked)                 # (C, R) f32
    hi = jnp.minimum(abins.offsets, capacity) - 1
    lo = jnp.minimum(jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                      abins.offsets[:-1]]), capacity) - 1
    csum_z = jnp.concatenate(
        [jnp.zeros((c, 1), jnp.float32), csum], axis=1)
    return (csum_z[:, hi + 1] - csum_z[:, lo + 1]).T


def entry_grads_to_gaussian_grads(
    entry_grads: jax.Array,     # (R, C) per sorted-instance gradients
    bins: TileBins,
    num_gaussians: int,
) -> jax.Array:
    """Reduce per-instance gradients to per-gaussian gradients WITHOUT
    collision scatter-adds (TPU has no atomics; this is the redesign of the
    reference's atomicAdd scatter, `backward.cu:1076-1134`):

      1. un-sort instances back to expansion order (a permutation — a
         unique-index scatter, which XLA lowers efficiently);
      2. in expansion order every gaussian's instances are contiguous
         [offsets[g-1], offsets[g]) — a cumsum + two gathers does the
         segment sum.
    """
    r, c = entry_grads.shape
    unsorted = jnp.zeros((r, c), entry_grads.dtype)
    unsorted = unsorted.at[bins.expansion_slot].set(
        entry_grads, unique_indices=True, mode="drop")
    csum = jnp.cumsum(unsorted, axis=0)
    # Segment sums via inclusive-cumsum differences; clamp for capacity.
    hi = jnp.minimum(bins.offsets, r) - 1           # (P,) last slot of g
    lo = jnp.minimum(jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                      bins.offsets[:-1]]), r) - 1
    zero_row = jnp.zeros((1, c), entry_grads.dtype)
    csum_z = jnp.concatenate([zero_row, csum], axis=0)  # csum_z[i+1] = csum[i]
    return csum_z[hi + 1] - csum_z[lo + 1]

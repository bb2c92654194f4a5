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
    dropped: jax.Array         # () int32 — instances NOT rendered this step
    #                            (capacity overflow + per-tile walk-bound
    #                             overflow); 0 in steady state


class AlignedBins(NamedTuple):
    """Chunk-aligned instance layout for the Pallas tile kernels: every
    tile's instance range starts at a multiple of the chunk size K, so
    per-chunk DMA reads/writes never straddle a tile boundary. Padding
    slots point at gaussian `p` (invalid). Built WITHOUT large scatters
    (XLA scatter on TPU is ~20x slower than gather): tile membership of
    aligned positions comes from a boundary-mark cumsum; the gradient
    reduce groups each gaussian's rows by SORTING the gradient columns
    on `row_id` (sorts are the cheapest permutation primitive on TPU,
    and row_id decodes for free from the sorted key — NO payload column
    rides the big sort at all)."""
    row_id: jax.Array          # (Rp,) int32 — index into the
    #                            source_perm-ORDERED per-gaussian row
    #                            table (>= P = invalid/dummy padding).
    #                            Rank path: the owning gaussian's depth
    #                            rank, decoded for free from the sorted
    #                            key; lex path: the gaussian id. Also
    #                            the grad-reduce sort key: equal ids
    #                            group a gaussian's rows, dummy/garbage
    #                            rows carry ids >= P and sort last
    source_perm: jax.Array     # (P,) int32 — row_id -> gaussian index
    #                            (gauss_of_rank / identity): the
    #                            instance build pre-permutes its source
    #                            table by this so gathering by row_id
    #                            lands on the right gaussian without a
    #                            per-instance decode gather
    out_perm: jax.Array        # (P,) int32 — gaussian index -> its
    #                            grad-reduce segment (rank / identity)
    tile_start: jax.Array      # (num_tiles,) int32 — K-aligned offsets
    tile_count: jax.Array      # (num_tiles,) int32 — true instance counts
    total_len: jax.Array       # () int32 — end of the live aligned region
    seg_offsets: jax.Array     # (P,) int32 inclusive segment-end offsets
    #                            in row_id order (cumsum of the
    #                            truncation-aware tiles_touched taken in
    #                            source_perm order) for the grad reduce
    num_rendered: jax.Array    # () int32
    max_per_tile: jax.Array    # () int32
    dropped: jax.Array         # () int32 — instances dropped by the
    #                            capacity truncation (0 in steady state)


def bin_gaussians_aligned(proc: ProcessedGaussians, opts: RenderOptions,
                          capacity: int, k: int,
                          force_lex: bool = False,
                          dummy_cap: int | None = None,
                          grad: bool = True) -> AlignedBins:
    """One-sort construction of the K-aligned instance layout for the
    Pallas kernels.

    Instead of sorting the compact list and re-laying it out (two sorts +
    many passes), per-tile padding DUMMY instances (sorting after every
    live instance of their tile) are appended BEFORE the single sort,
    sized from an instance histogram so each tile's sorted segment is
    already a multiple of K. Tile offsets come from the histogram, not a
    searchsorted.

    `dummy_cap` bounds the dummy block: the worst case is K-1 pads per
    tile, but the expected need is well below that, so a sub-worst-case
    static budget cuts every capacity-scaled stage (main sort, instance
    gather, gradient buffer, reduce sort) by the difference. None = auto
    (min(num_tiles*k, 0.75k per tile + 2.5*k*sqrt(num_tiles)) — see
    `_dummy_budget`); pass num_tiles*k for the exact worst case. If the budget ever overflows, the layout of that
    step is unusable: the result carries `dropped = num_rendered` and
    `total_len = rp + 1` as sentinels — the gradient reduce zeroes its
    output (see aligned_entry_grads_to_gaussian_grads) and the trainer
    grows the budget; tile ranges stay clamped in-bounds so the kernels
    are memory-safe either way.

    Two equivalent sort strategies (measured at 800x800 / 786k capacity):

      * packed rank key: relabel gaussians by view depth (one cheap P-row
        sort), then sort ONE u32 key `tile * span + rank` — exactly the
        (tile, depth, expansion-slot) order, because rank is unique per
        gaussian and a gaussian appears at most once per tile. The
        single-key compare drops the main sort from 3.8 to 2.9 ms, and
        the all-integer per-instance fields let a delta-scatter + batched
        lane-cumsum fill (2.5 ms) replace the owner map + packed row
        gather (4.6 ms).
      * lexicographic (tile, depth, slot) 3-key sort — the fallback when
        the packed key cannot fit u32 (huge P x many tiles) or capacity
        exceeds f32's exact-integer range.
    """
    p = proc.tiles_touched.shape[0]
    span = 1 << max(1, int(p + 1).bit_length())
    packed_fits = ((opts.num_tiles + 1) * span < 2 ** 32
                   and capacity < 2 ** 24)
    ndum = _dummy_budget(opts.num_tiles, k, dummy_cap)
    if packed_fits and not force_lex:
        return _bin_aligned_rank(proc, opts, capacity, k, span, ndum,
                                 grad)
    return _bin_aligned_lex(proc, opts, capacity, k, ndum)


def _dummy_budget(num_tiles: int, k: int, dummy_cap: int | None) -> int:
    """Static dummy-block length. The worst case is k-1 pads per tile.
    Per-tile pads are NOT uniform on [0, k): tile counts correlate
    (smooth screen density), so the per-scene mean pad can sit well
    above k/2 — measured ~0.58k on the synthetic training scene at
    50k points (uniform would predict 0.5k). auto = 0.75k per tile +
    2.5*k*sqrt(T) slack: conservative enough that the overflow sentinel
    stays a cold path (the trainer grows to the worst case on the first
    hit), while still cutting ~20% of the worst-case block at 2500
    tiles. Rounded up to a multiple of k so the aligned buffer length
    stays K-aligned."""
    if dummy_cap is None:
        dummy_cap = int(num_tiles * k * 3 / 4 + 2.5 * k * num_tiles ** 0.5)
    return min(num_tiles * k, max(k, (dummy_cap + k - 1) // k * k))


def _dummy_owner(pad: jax.Array, ndum: int, num_tiles: int):
    """Tile ownership of the compact dummy block: slot j belongs to the
    tile whose pad run covers j (marks at each tile's exclusive start +
    cumsum — zero-pad tiles mark the same slot as their successor, which
    the cumsum counts through, same trick as the instance owner map).
    Returns (owner (ndum,), live (ndum,), total_pad ())."""
    pad_off = jnp.cumsum(pad, dtype=jnp.int32) - pad
    total_pad = pad_off[-1] + pad[-1]
    marks = jnp.zeros((ndum,), jnp.int32).at[pad_off].add(
        1, mode="drop")
    owner = jnp.clip(jnp.cumsum(marks) - 1, 0, num_tiles - 1)
    live = jnp.arange(ndum, dtype=jnp.int32) < total_pad
    return owner, live, total_pad


def _aligned_epilogue(row_id, source_perm, out_perm, aligned_off, counts,
                      total_len, total_pad, seg_offsets, num_rendered,
                      num_eff, ndum: int) -> AlignedBins:
    """Shared tail of both aligned binners: clamp tile ranges into the
    static buffer [0, rp) (memory safety whatever the data does) and set
    the dummy-budget overflow sentinels. In steady state (total_pad
    within budget) every clamp is a no-op: total_len = num_eff +
    total_pad <= capacity + ndum = rp."""
    rp = row_id.shape[0]
    ok = total_pad <= ndum
    start_c = jnp.minimum(aligned_off, rp)
    count_c = jnp.clip(counts, 0, rp - start_c)
    return AlignedBins(
        row_id=row_id,
        source_perm=source_perm,
        out_perm=out_perm,
        tile_start=start_c,
        tile_count=count_c,
        total_len=jnp.where(ok, jnp.minimum(total_len, rp), rp + 1),
        seg_offsets=seg_offsets,
        num_rendered=num_rendered,
        max_per_tile=jnp.max(counts),
        dropped=jnp.where(ok, num_rendered - num_eff, num_rendered),
    )


def _instance_prologue(proc, capacity):
    """Shared head: inclusive instance offsets + whole-gaussian
    truncation on overflow (drop the boundary gaussian's partial
    instance run entirely so the rect-based histogram agrees EXACTLY
    with the expanded instance set)."""
    offsets = jnp.cumsum(proc.tiles_touched, dtype=jnp.int32)
    num_rendered = offsets[-1]
    last_full = jnp.searchsorted(offsets, capacity, side="right") - 1
    num_eff = jnp.where(last_full >= 0,
                        offsets[jnp.maximum(last_full, 0)], 0)
    num_eff = jnp.minimum(num_eff, capacity)
    return offsets, num_rendered, last_full, num_eff


def _rect_histogram(proc, opts, last_full):
    """Per-tile instance histogram WITHOUT a capacity-sized collision
    scatter: each included gaussian's rect adds a +1/-1 difference
    stencil to a (tiles_y+1, tiles_x+1) grid, accumulated by ONE
    single-column sort (sign packed into the cell key's low bit) +
    prefix-sum differences at cell boundaries; a separable 2D prefix sum
    recovers box counts."""
    p = proc.tiles_touched.shape[0]
    tiles_x, tiles_y = opts.tiles_x, opts.tiles_y
    included = (jnp.arange(p) <= last_full) & (proc.tiles_touched > 0)
    gx0, gy0 = proc.rect[:, 0], proc.rect[:, 1]
    gx1, gy1 = proc.rect[:, 2], proc.rect[:, 3]
    gw = tiles_x + 1
    ncells = (tiles_y + 1) * gw
    cells = jnp.concatenate([
        gy0 * gw + gx0, gy0 * gw + gx1, gy1 * gw + gx0, gy1 * gw + gx1])
    pos = jnp.concatenate([included, ~included, ~included, included])
    live = jnp.concatenate([included] * 4)
    key = jnp.where(live, cells * 2 + pos.astype(jnp.int32), 2 * ncells)
    key_s = jax.lax.sort(key)
    sgn_s = jnp.where(key_s >= 2 * ncells, 0,
                      jnp.where(key_s % 2 == 1, 1, -1))
    csum_s = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(sgn_s)])
    bounds = jnp.searchsorted(
        key_s, jnp.arange(ncells + 1, dtype=jnp.int32) * 2, side="left")
    diff = csum_s[bounds[1:]] - csum_s[bounds[:-1]]
    counts2d = jnp.cumsum(jnp.cumsum(
        diff.reshape(tiles_y + 1, gw), axis=0), axis=1)
    return counts2d[:tiles_y, :tiles_x].reshape(-1)


def _bin_aligned_rank(proc: ProcessedGaussians, opts: RenderOptions,
                      capacity: int, k: int, span: int, ndum: int,
                      grad: bool) -> AlignedBins:
    """Packed-rank-key aligned binning (see bin_gaussians_aligned)."""
    p = proc.tiles_touched.shape[0]
    num_tiles = opts.num_tiles
    tiles_x = opts.tiles_x
    offsets, num_rendered, last_full, num_eff = _instance_prologue(
        proc, capacity)

    # Depth-rank relabeling: rank(g) = position of g in the stable
    # (depth, index) order. Within a tile every gaussian appears at most
    # once, and slot order for equal depths IS gaussian-index order, so
    # sorting by (tile, rank) reproduces the (tile, depth, slot) order
    # exactly — as one unique u32 key with no tie columns.
    iota_p = jnp.arange(p, dtype=jnp.int32)
    _, gauss_of_rank = jax.lax.sort((proc.depth, iota_p), num_keys=2)
    rank = jnp.zeros((p,), jnp.int32).at[gauss_of_rank].set(
        iota_p, unique_indices=True)

    # Per-instance fields are now ALL integers -> piecewise-constant
    # fills over each gaussian's instance run are exact as delta
    # scatters + ONE batched lane-axis cumsum (f32 is exact below 2^24;
    # partial sums telescope to real field values, so they stay in
    # range). Replaces the owner-map cumsum + (R, 8) row gather.
    begin = offsets - proc.tiles_touched
    # (x0, y0, width) pack into one field at power-of-2 scales (each
    # < 2^8 for images up to 4096 px; the packed value stays < 2^24, so
    # the f32 fill and the scale-by-2^-k floor decodes are exact).
    xyw = (proc.rect[:, 0] + proc.rect[:, 1] * 256
           + jnp.maximum(proc.rect[:, 2] - proc.rect[:, 0], 1) * 65536)
    fields = [
        xyw,
        begin,                                              # first slot
        rank,
    ]
    if grad:
        fields.append(iota_p)                               # gid
    rows = []
    for f in fields:
        d = jnp.concatenate([f[:1], f[1:] - f[:-1]])
        rows.append(jnp.zeros((capacity,), jnp.int32).at[begin].add(
            d, mode="drop"))
    filled = _cumsum_lanes(jnp.stack(rows).astype(jnp.float32))

    slots = jnp.arange(capacity, dtype=jnp.int32)
    w_f = jnp.floor(filled[0] * (1.0 / 65536.0))
    rem = filled[0] - w_f * 65536.0
    y0f = jnp.floor(rem * (1.0 / 256.0))
    x0 = (rem - y0f * 256.0).astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    width = w_f.astype(jnp.int32)
    begin_f = filled[1].astype(jnp.int32)
    local = slots - begin_f
    # local // width via f32 reciprocal + exact correction (no native
    # integer divide on the VPU; values < 2^23 keep f32 near-exact).
    row = (local.astype(jnp.float32) * (1.0 / w_f)).astype(jnp.int32)
    row = jnp.where((row + 1) * width <= local, row + 1, row)
    row = jnp.where(row * width > local, row - 1, row)
    tile = (y0 + row) * tiles_x + x0 + (local - row * width)

    valid = slots < num_eff
    invalid_key = jnp.uint32(0xFFFFFFFF)
    key = jnp.where(
        valid,
        tile.astype(jnp.uint32) * jnp.uint32(span)
        + filled[2].astype(jnp.uint32),
        invalid_key)

    counts = _rect_histogram(proc, opts, last_full)
    pad = (-counts) % k
    sums = jnp.cumsum(counts + pad, dtype=jnp.int32)
    aligned_off = jnp.concatenate([jnp.zeros((1,), jnp.int32), sums[:-1]])
    total_len = sums[-1]

    # Compact dummy block (see _dummy_owner): the first pad[t] slots of
    # tile t's run carry key rank span-1 (> every live rank, span >=
    # p+2), so dummies sort to the end of their tile's segment.
    owner, live_d, total_pad = _dummy_owner(pad, ndum, num_tiles)
    dummy_key = jnp.where(
        live_d,
        owner.astype(jnp.uint32) * jnp.uint32(span)
        + jnp.uint32(span - 1),
        invalid_key)
    all_key = jnp.concatenate([key, dummy_key])
    tt_eff = jnp.where(iota_p <= last_full, proc.tiles_touched, 0)

    if not grad:
        # Gradient-free (inference) path: SINGLE-OPERAND sort — the
        # rank decodes from the sorted key itself (key mod span) and
        # the instance build gathers from a rank-ORDERED source table
        # (one cheap P-row pre-gather by gauss_of_rank), so no payload
        # column rides the 1M-row sort and, unlike the reverted v2
        # design, there is no per-instance decode gather either.
        # Measured +6% render fps; the TRAINING path keeps the gid
        # payload below because the rank-indirect grad reduce measured
        # ~1.6 ms/iter SLOWER composed (the same indirect-decode
        # pathology that sank v2, commit 106de35).
        key_s = jax.lax.sort(all_key, is_stable=False)
        row_id = (key_s & jnp.uint32(span - 1)).astype(jnp.int32)
        return _aligned_epilogue(
            row_id, gauss_of_rank, rank, aligned_off, counts, total_len,
            total_pad, jnp.cumsum(tt_eff[gauss_of_rank], dtype=jnp.int32),
            num_rendered, num_eff, ndum)

    # TWO-operand main sort for training: the only payload is the
    # gaussian id — the gradient reduce keys on it directly with
    # identity source/output perms (no expansion-slot column, no
    # rank indirection).
    gid = jnp.where(valid, filled[3].astype(jnp.int32), p)
    all_gid = jnp.concatenate([gid, jnp.full((ndum,), p, jnp.int32)])
    _, gid_s = jax.lax.sort(
        (all_key, all_gid), num_keys=1, is_stable=False)
    return _aligned_epilogue(
        gid_s, iota_p, iota_p, aligned_off, counts, total_len,
        total_pad, jnp.cumsum(tt_eff, dtype=jnp.int32),
        num_rendered, num_eff, ndum)


def _bin_aligned_lex(proc: ProcessedGaussians, opts: RenderOptions,
                     capacity: int, k: int, ndum: int) -> AlignedBins:
    """Lexicographic-key aligned binning (see bin_gaussians_aligned)."""
    p = proc.tiles_touched.shape[0]
    num_tiles = opts.num_tiles
    tiles_x = opts.tiles_x
    tiles_y = opts.tiles_y

    offsets, num_rendered, last_full, num_eff = _instance_prologue(
        proc, capacity)

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

    counts = _rect_histogram(proc, opts, last_full)
    pad = (-counts) % k                              # per-tile dummy count
    sums = jnp.cumsum(counts + pad, dtype=jnp.int32)
    aligned_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), sums[:-1]])
    total_len = sums[-1]        # live aligned region (tiles' ranges end)

    # Compact dummy block (see _dummy_owner).
    owner, live_d, total_pad = _dummy_owner(pad, ndum, num_tiles)
    dummy_tile = jnp.where(live_d, owner, num_tiles)
    all_tile = jnp.concatenate([tile, dummy_tile])
    all_depth = jnp.concatenate(
        [depth, jnp.full((ndum,), jnp.inf, jnp.float32)])
    all_gid = jnp.concatenate([gid, jnp.full((ndum,), p, jnp.int32)])
    all_slot = jnp.concatenate(
        [slots, capacity + jnp.arange(ndum, dtype=jnp.int32)])

    # slot (the pre-sort expansion index, unique) as an explicit third
    # key reproduces the stable (tile, depth) order exactly — XLA's
    # stable sort would append a hidden iota operand for the same
    # tie-break; keying on slot drops that extra sorted column.
    _, _, _, gid_s = jax.lax.sort(
        (all_tile, all_depth, all_slot, all_gid), num_keys=3,
        is_stable=False)

    tt_eff = jnp.where(jnp.arange(p) <= last_full, proc.tiles_touched, 0)

    iota = jnp.arange(p, dtype=jnp.int32)
    return _aligned_epilogue(
        gid_s, iota, iota, aligned_off, counts, total_len, total_pad,
        jnp.cumsum(tt_eff, dtype=jnp.int32), num_rendered, num_eff,
        ndum)


def bin_gaussians(proc: ProcessedGaussians, opts: RenderOptions,
                  capacity: int,
                  max_per_tile: int | None = None) -> TileBins:
    """Build the sorted (tile, depth) instance list.

    `capacity` is the static instance budget R. If the true number of
    instances exceeds it, later gaussians' instances are dropped and
    `num_rendered > capacity` signals the host to grow the budget.
    `max_per_tile` (the blend's static per-tile walk bound, when given)
    only feeds the `dropped` observability counter — instances past the
    bound in an over-dense tile are never walked by the blend.
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

    counts = tile_stop - tile_start
    dropped = jnp.maximum(num_rendered - capacity, 0)
    if max_per_tile is not None:
        dropped = dropped + jnp.sum(jnp.maximum(counts - max_per_tile, 0))

    return TileBins(
        gauss_id=gid_s,
        expansion_slot=slot_s,
        tile_sorted=tile_s,
        tile_start=tile_start,
        tile_stop=tile_stop,
        offsets=offsets,
        num_rendered=num_rendered,
        max_per_tile=jnp.max(counts),
        dropped=dropped,
    )


def aligned_gauss_ids(abins: AlignedBins) -> jax.Array:
    """Decode true gaussian ids (P = invalid) from the aligned layout:
    source_perm[row_id] with out-of-range rows mapped to the sentinel P.
    A per-instance gather — use only in tests/tools, never on the hot
    path (the production consumers pre-permute their source tables by
    source_perm instead)."""
    p = abins.source_perm.shape[0]
    perm_ext = jnp.concatenate(
        [abins.source_perm, jnp.full((1,), p, jnp.int32)])
    return perm_ext[jnp.minimum(abins.row_id, p)]


def aligned_capacity(capacity: int, num_tiles: int, k: int) -> int:
    """WORST-CASE padded-instance capacity for the chunk-aligned layout
    (dummy_cap = num_tiles * k); the default compact budget is smaller —
    see _dummy_budget."""
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
    identity_out_perm: bool = False,  # skip the out_perm gather (both
    #                                   grad-path binners emit iota)
) -> jax.Array:
    """Aligned-layout gradient reduce: group each gaussian's rows by
    SORTING the gradient columns on `row_id` (one multi-payload
    `lax.sort` — profiled cheaper than the row gather through an inverse
    permutation), then cumsum segment sums per segment and permute to
    gaussian order with `out_perm` (a cheap (P, C) row gather).

    row_id decodes for free from the main sort's key (the depth rank on
    the packed-key path), so NO payload column rides the main sort for
    the reduce's sake. Equal keys group a gaussian's rows; the unstable
    sort may order them arbitrarily WITHIN the segment, which only
    permutes the f32 summation order (the same reordering class as
    permuting the gaussians themselves — see scripts/tpu_verify.py's
    calibrated bound). Dummy/garbage rows carry ids >= P and sort past
    the live prefix; rows past `total_len` are never written by the
    backward kernel (garbage memory) — their payload is zeroed before
    the sort. The cumsum runs in the (C, R) field-major layout along the
    lane axis — an (R, C) layout pads C -> 128 lanes on TPU and costs
    ~10x the HBM traffic. Returns (P, C) f32 in gaussian order.

    A uint32 input means the backward kernel ALREADY packed bf16
    channel pairs into u32 rows (PallasBlendConfig.packed_grads):
    each input row carries channels (2i, 2i+1) with 2i in the high
    half, and the XLA-side pack pass is skipped."""
    c, rp = entry_grads_fm.shape
    pre_packed = entry_grads_fm.dtype == jnp.uint32
    if pre_packed:
        if not fast:
            raise ValueError("packed u32 gradient rows require fast=True")
        c = 2 * c
    live = jnp.arange(rp, dtype=jnp.int32) < abins.total_len
    key = abins.row_id.astype(jnp.uint32)
    if fast:
        if pre_packed:
            packed = [jnp.where(live, entry_grads_fm[i], jnp.uint32(0))
                      for i in range(entry_grads_fm.shape[0])]
        else:
            # Sort cost scales with operand count: pack bf16 PAIRS into
            # u32 payload columns (5 payloads instead of 10 for the
            # blend grads).
            cols = [jnp.where(live, entry_grads_fm[i], 0.0)
                    for i in range(c)]
            packed = []
            for i in range(0, c, 2):
                hi = jax.lax.bitcast_convert_type(
                    cols[i].astype(jnp.bfloat16),
                    jnp.uint16).astype(jnp.uint32) << 16
                lo = (jax.lax.bitcast_convert_type(
                    cols[i + 1].astype(jnp.bfloat16), jnp.uint16
                ).astype(jnp.uint32) if i + 1 < c else jnp.uint32(0))
                packed.append(hi | lo)
        sorted_ = jax.lax.sort((key,) + tuple(packed), num_keys=1,
                               is_stable=False)
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
        cols = [jnp.where(live, entry_grads_fm[i], 0.0) for i in range(c)]
        sorted_ = jax.lax.sort((key,) + tuple(cols), num_keys=1,
                               is_stable=False)
        stacked = jnp.stack(
            [s[:capacity] for s in sorted_[1:]], axis=0)
    csum = _cumsum_lanes(stacked)                 # (C, R) f32
    # Segment boundaries are CONSECUTIVE positions of one monotone
    # array (seg_offsets is an inclusive cumsum): gather the boundary
    # cumsums ONCE at (P+1,) positions and diff adjacent columns —
    # half the lane-gather volume of separate hi/lo gathers (the lane
    # gather dominates this tail at DyNeRF scale: 18.5 -> ~9 ms).
    pos = jnp.minimum(jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), abins.seg_offsets]), capacity)
    csum_z = jnp.concatenate(
        [jnp.zeros((c, 1), jnp.float32), csum], axis=1)
    bound = csum_z[:, pos]                        # (C, P+1)
    per_seg = (bound[:, 1:] - bound[:, :-1]).T    # (P, C)
    # Both grad-path binners emit identity out_perm (iota) — only the
    # no-grad rank path reorders, and it never reduces gradients. The
    # caller asserts that knowledge via identity_out_perm to skip a
    # (P, C) row gather XLA cannot DCE on traced values.
    per_gauss = per_seg if identity_out_perm else per_seg[abins.out_perm]
    # Dummy-budget overflow sentinel (total_len > Rp): the aligned
    # layout of this step is unusable and the segment boundaries no
    # longer describe the sorted rows — zero the whole gradient (the
    # trainer sees dropped == num_rendered and grows the budget; one
    # no-op update beats one scrambled update).
    return jnp.where(abins.total_len > rp, 0.0, per_gauss)


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

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
    tile_start: jax.Array      # (num_tiles,) int32
    tile_stop: jax.Array       # (num_tiles,) int32
    offsets: jax.Array         # (P,) int32 inclusive cumsum of tiles_touched
    num_rendered: jax.Array    # () int32 — true instance count (may exceed capacity)
    max_per_tile: jax.Array    # () int32 — densest tile population (for host schedule)


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

    slots = jnp.arange(capacity, dtype=jnp.int32)
    owner = jnp.searchsorted(offsets, slots, side="right").astype(jnp.int32)
    owner_c = jnp.minimum(owner, p - 1)
    base = jnp.where(owner_c > 0, offsets[jnp.maximum(owner_c - 1, 0)], 0)
    local = slots - base

    rect = proc.rect[owner_c]                      # (R, 4)
    width = jnp.maximum(rect[:, 2] - rect[:, 0], 1)
    tile = ((rect[:, 1] + local // width) * tiles_x
            + rect[:, 0] + local % width)

    valid = slots < num_rendered
    tile = jnp.where(valid, tile, num_tiles).astype(jnp.int32)
    depth = jnp.where(valid, proc.depth[owner_c], jnp.inf).astype(jnp.float32)
    gid = jnp.where(valid, owner_c, 0).astype(jnp.int32)

    tile_s, _, gid_s, slot_s = jax.lax.sort(
        (tile, depth, gid, slots), num_keys=2, is_stable=True)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_s, tile_ids, side="left").astype(jnp.int32)
    tile_stop = jnp.searchsorted(tile_s, tile_ids, side="right").astype(jnp.int32)

    return TileBins(
        gauss_id=gid_s,
        expansion_slot=slot_s,
        tile_start=tile_start,
        tile_stop=tile_stop,
        offsets=offsets,
        num_rendered=num_rendered,
        max_per_tile=jnp.max(tile_stop - tile_start),
    )


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

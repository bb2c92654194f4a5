"""Point-cloud op library — TPU-native equivalents of the reference's
`pointops2` CUDA extension (`pointops2/functions/pointops.py`).

The trainer uses only `knn` (rigid loss, `train.py:138-140` via
`utils/general_utils.py:170-184`) and `fps` (a commented-out init path,
`dataset_readers.py:341`); the remaining op families the reference binds
(grouping, interpolation, subtraction, aggregation) are provided here as
small jnp functions for API parity. All ops are jittable with static
shapes; "offset"-batched inputs (the pointops2 convention) map to a
leading batch axis via vmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .knn import knn as _knn_flat


def knn(x: jax.Array, src: jax.Array, k: int):
    """k nearest neighbors of each query in `x` among `src`.

    x: (B, N, 3), src: (B, M, 3). Returns (idx (B, N, k) int32,
    dist (B, N, k) EUCLIDEAN distance — the reference wrapper returns
    sqrt'd dist2, `pointops.py:48`). Exact O(N·M) per batch.
    """
    def one(xb, sb):
        d2 = jnp.sum((xb[:, None, :] - sb[None, :, :]) ** 2, -1)
        neg, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), jnp.sqrt(jnp.maximum(-neg, 0.0))
    return jax.vmap(one)(x, src)


def knn_self(points: jax.Array, k: int, valid: jax.Array | None = None):
    """Self-kNN over one unbatched cloud (window-approximate for large N);
    see `ops.knn.knn`. Returns (idx, dist2)."""
    return _knn_flat(points, k=k, valid=valid)


@functools.partial(jax.jit, static_argnames=("k",))
def fps(points: jax.Array, k: int) -> jax.Array:
    """Furthest point sampling: (N, 3) -> (k,) int32 indices.

    Iterative farthest-first (reference `furthestsampling`,
    `pointops2/src/sampling/...`): start at index 0, repeatedly take the
    point maximizing distance-to-selected-set.
    """
    n = points.shape[0]

    def body(i, carry):
        mind2, idx = carry
        last = points[idx[i - 1]]
        d2 = jnp.sum((points - last) ** 2, axis=-1)
        mind2 = jnp.minimum(mind2, d2)
        idx = idx.at[i].set(jnp.argmax(mind2).astype(jnp.int32))
        return mind2, idx

    init = (jnp.full((n,), jnp.inf, points.dtype),
            jnp.zeros((k,), jnp.int32))
    _, idx = jax.lax.fori_loop(1, k, body, init)
    return idx


def grouping(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather neighbor features: feats (M, C), idx (N, k) -> (N, k, C)
    (reference `grouping`, `pointops.py:70-90`)."""
    return feats[idx]


def interpolation(src_xyz: jax.Array, dst_xyz: jax.Array,
                  feats: jax.Array, k: int = 3) -> jax.Array:
    """Inverse-distance-weighted k-NN feature interpolation
    (reference `interpolation`, `pointops.py:**`): src (M,3) with feats
    (M,C) -> features at dst (N,3)."""
    d2 = jnp.sum((dst_xyz[:, None, :] - src_xyz[None, :, :]) ** 2, -1)
    neg, idx = jax.lax.top_k(-d2, k)
    dist = jnp.sqrt(jnp.maximum(-neg, 1e-12))
    w = 1.0 / (dist + 1e-8)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return jnp.einsum("nk,nkc->nc", w, feats[idx])


def subtraction(a: jax.Array, b: jax.Array, idx: jax.Array) -> jax.Array:
    """Per-neighbor feature difference: a (N, C), b (M, C), idx (N, k) ->
    (N, k, C) with out[n, j] = a[n] - b[idx[n, j]]."""
    return a[:, None, :] - b[idx]


def aggregation(feats: jax.Array, weights: jax.Array,
                idx: jax.Array) -> jax.Array:
    """Weighted neighbor aggregation: feats (M, C), weights (N, k),
    idx (N, k) -> (N, C)."""
    return jnp.einsum("nk,nkc->nc", weights, feats[idx])


# ---------------------------------------------------------------------------
# Sparse point-attention ops (Point Transformer V2 family). The reference
# binds these from pointops2 but the 4DGS trainer never calls them
# (`pointops_api.cpp:16-45`, SURVEY §2.2); provided for API completeness.
# Edge pairs are COO-style: edge m relates query index0[m] to key/value
# index1[m]. All differentiable through jax AD (no custom kernels needed —
# the gather/segment-sum forms autodiff to the reference's scatter
# backward).
# ---------------------------------------------------------------------------

def attention_step1(q: jax.Array, k: jax.Array, index0: jax.Array,
                    index1: jax.Array) -> jax.Array:
    """Per-edge attention logits: q (N, h, d), k (N, h, d),
    index0/index1 (M,) -> (M, h) with out[m, h] = q[index0[m], h] . k[index1[m], h]."""
    return jnp.einsum("mhd,mhd->mh", q[index0], k[index1])


def attention_step2(attn: jax.Array, v: jax.Array, index0: jax.Array,
                    index1: jax.Array, n: int | None = None) -> jax.Array:
    """Weighted value aggregation: attn (M, h), v (N, h, d) ->
    out (N, h, d) with out[n] = sum_{m: index0[m]=n} attn[m] * v[index1[m]]."""
    n = n or v.shape[0]
    contrib = attn[:, :, None] * v[index1]
    return jax.ops.segment_sum(contrib, index0, num_segments=n)


def dot_prod_with_idx(q: jax.Array, index: jax.Array, table: jax.Array,
                      rel_idx: jax.Array) -> jax.Array:
    """Relative-position logits: q (N, h, d), index (M,),
    table (L, h, d, 3), rel_idx (M, 3) -> (M, h) with
    out[m, h] = sum_d sum_a q[index[m], h, d] * table[rel_idx[m, a], h, d, a]."""
    pos = jnp.stack([table[rel_idx[:, a], :, :, a] for a in range(3)], -1)
    return jnp.einsum("mhd,mhda->mh", q[index], pos)


def attention_step2_with_rel_pos_value(
        attn: jax.Array, v: jax.Array, index0: jax.Array,
        index1: jax.Array, table: jax.Array, rel_idx: jax.Array,
        n: int | None = None) -> jax.Array:
    """attention_step2 with per-edge relative positional values added to v:
    table (L, h, d, 3), rel_idx (M, 3)."""
    n = n or v.shape[0]
    pos = sum(table[rel_idx[:, a], :, :, a] for a in range(3))
    contrib = attn[:, :, None] * (v[index1] + pos)
    return jax.ops.segment_sum(contrib, index0, num_segments=n)


# ---- v2/v3 variants --------------------------------------------------------
# The reference binds CSR-layout performance variants of the ops above
# (`pointops_api.cpp:16-45`): edges are grouped per query and addressed by
# `index0_offsets` (length N_q+1 exclusive starts; query i owns edges
# [offsets[i], offsets[i+1])) instead of a COO index0 column, and the
# rel-pos dot product splits the table into a query and a key side. On
# TPU the CSR layout buys nothing — gathers/segment-sums are the same —
# so these decode CSR -> COO and share the math; `n_max` (the reference's
# CUDA block-size bound, <= 1024) is accepted and ignored.


def _csr_to_coo(offsets: jax.Array, m: int) -> jax.Array:
    """index0_offsets (N+1,) -> per-edge query index (m,)."""
    return (jnp.searchsorted(offsets, jnp.arange(m, dtype=offsets.dtype),
                             side="right") - 1).astype(jnp.int32)


def attention_step1_v2(q: jax.Array, k: jax.Array, index1: jax.Array,
                       index0_offsets: jax.Array,
                       n_max: int | None = None) -> jax.Array:
    """CSR attention_step1 (reference `pointops.py:142-203`)."""
    del n_max
    index0 = _csr_to_coo(index0_offsets, index1.shape[0])
    return attention_step1(q, k, index0, index1)


def attention_step2_v2(attn: jax.Array, v: jax.Array, index0: jax.Array,
                       index1: jax.Array,
                       n: int | None = None) -> jax.Array:
    """attention_step2 with output length L = max(index0)+1 — unlike the
    rest of the v2 family this one is COO in the reference too (per-edge
    `index0`, `pointops.py:268-318` / `attention_cuda_v2.cpp:31-40`);
    only the CUDA launcher changed. Pass `n` (static L) under jit; with
    concrete inputs it defaults to the reference's max(index0)+1."""
    if n is None:
        n = int(index0.max()) + 1
    return attention_step2(attn, v, index0, index1, n)


def _rel_table_sum(table: jax.Array, rel_idx: jax.Array) -> jax.Array:
    """(L, h, d, 3), (M, 3) -> (M, h, d): per-axis table rows summed
    (`relative_pos_encoding_cuda_kernel_v2.cu:276-279`)."""
    return sum(table[rel_idx[:, a], :, :, a] for a in range(3))


def dot_prod_with_idx_v2(q: jax.Array, index_q: jax.Array, k: jax.Array,
                         index_k: jax.Array, table_q: jax.Array,
                         table_k: jax.Array,
                         rel_idx: jax.Array) -> jax.Array:
    """Two-sided relative-position logits (reference `pointops.py:372-443`):
    out[m, h] = q[index_q[m]] . table_q(rel_idx[m]) +
                k[index_k[m]] . table_k(rel_idx[m])."""
    return (jnp.einsum("mhd,mhd->mh", q[index_q],
                       _rel_table_sum(table_q, rel_idx))
            + jnp.einsum("mhd,mhd->mh", k[index_k],
                         _rel_table_sum(table_k, rel_idx)))


def dot_prod_with_idx_v3(q: jax.Array, index_q_offsets: jax.Array,
                         n_max: int | None, k: jax.Array,
                         index_k: jax.Array, table_q: jax.Array,
                         table_k: jax.Array,
                         rel_idx: jax.Array) -> jax.Array:
    """dot_prod_with_idx_v2 with a CSR query index
    (reference `pointops.py:446-519`)."""
    del n_max
    index_q = _csr_to_coo(index_q_offsets, index_k.shape[0])
    return dot_prod_with_idx_v2(q, index_q, k, index_k, table_q, table_k,
                                rel_idx)


def attention_step2_with_rel_pos_value_v2(
        attn: jax.Array, v: jax.Array, index0_offsets: jax.Array,
        n_max: int | None, index1: jax.Array, table: jax.Array,
        rel_idx: jax.Array, n: int | None = None) -> jax.Array:
    """CSR attention_step2_with_rel_pos_value
    (reference `pointops.py:584-646`)."""
    del n_max
    index0 = _csr_to_coo(index0_offsets, index1.shape[0])
    return attention_step2_with_rel_pos_value(attn, v, index0, index1,
                                              table, rel_idx, n)

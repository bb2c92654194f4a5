"""Pallas TPU tile-blend kernels (forward + backward).

The production replacement for the pure-XLA `blend.py` path. Redesign of
the reference hot kernels (`cuda_rasterizer/forward.cu:501-626` renderCUDA
and `backward.cu:926-1137`) around the TPU execution model:

  * grid = one program per 16x16 tile; the 256 pixels are the SUBLANE
    axis, the K=128 gaussians of a chunk are the LANE axis — every array
    in the kernel is a (256, 128) vector tile, the natural f32 shape.
  * each tile walks ONLY its own 128-aligned instance range (dynamic
    `while_loop` trip count + all-pixels-saturated early exit) — unlike
    the XLA path, no tile pays for the densest tile's population.
  * instance data lives FIELD-MAJOR in HBM, (16, Rp): per-chunk manual
    DMA of a (16, 128) block is lane-aligned; fields come out as (1, K)
    rows that broadcast directly against (256, 1) pixel columns.
  * the front-to-back transmittance recursion is computed in log space
    with triangular ones-matrix matmuls along the lane axis
    ((256,128) @ (128,128) MXU cumsums).
  * the backward pass writes per-instance gradient rows to its tile's own
    128-aligned slice of the (16, Rp) gradient buffer — disjoint across
    programs, so TPU needs no atomics (the CUDA kernel's atomicAdd
    scatter, `backward.cu:1076-1134`, becomes a later segment-sum).

Field-major row layout (16 rows, zero-padded):
  [0:2] xy, [2:5] conic (a, b, c), [5] opacity, [6:12] feat
  (rgb, depth, flow). Gradient rows mirror it:
  [0] dx, [1] dy, [2:5] dconic, [5] dopa, [6:12] dfeat.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import gaussmath as gm
from .preprocess import TILE

PIX = TILE * TILE      # 256
FEAT = 6               # rgb + depth + flow2
ROW = 16               # field rows (padded)
CHUNK = 128            # K — lane width; also the tile range alignment
OUT_COLS = 8           # accum(6) + T_final + n_contrib
# Kernel I/O blocks are CHANNEL-MAJOR (1, 8, 256): 8 sublanes x 256 lanes
# packs the physical (8, 128) tile exactly. The pixel-major (1, 256, 8)
# alternative pads 8 -> 128 lanes, inflating every kernel-output /
# cotangent tensor 16x in HBM (profiled: the dcot concatenate alone cost
# 2.8 ms/iter at 800x800 in that layout).


class PallasBlendConfig(NamedTuple):
    height: int
    width: int
    tiles_x: int
    tiles_y: int
    interpret: bool = False  # Pallas interpreter mode (CPU tests)
    # bf16 per-instance gradient rows in the un-sort gather (2.7x faster —
    # TPU gather cost scales with bytes). ~0.4% per-instance rounding that
    # averages out over a gaussian's instances; OFF for parity tests.
    fast_grad_reduce: bool = False
    # bf16-split term count for the in-kernel triangular log-cumsum
    # matmuls (see _mm_exact_rhs): 3 = full f32 mantissa, 2 = 16 bits
    # (~|log T|*2^-17 relative error in the transmittance chain;
    # measured at bench shape: max image diff 1.5e-5, max relative
    # grad diff 2.3e-5 vs terms=3 — scripts/probe_terms.py).
    fwd_terms: int = 2
    bwd_terms: int = 2
    # Tiles processed per Pallas program: the fixed per-grid-step cost is
    # ~1.05 us (measured, scripts/probe_kernel_overhead.py) while the
    # average tile has only ~2-3 chunks of work, so one-tile programs
    # spend >30% of kernel time on program overhead. Measured on the
    # composed bench: 4 -> 20.64, 8 -> 20.82, 16 -> 20.56 Mrays/s.
    tiles_per_program: int = 8
    # bf16-split term budget for the backward kernel's three DATA matmuls
    # (gdot, pixel-moment basis, d_feat): 0 = HIGHEST (6 passes, parity
    # mode). (a, b) = split the cotangent/d_power operand into `a` bf16
    # terms and the instance-data operand into `b` — see _mm_split.
    bwd_dot_terms: tuple = ()
    # Chunks processed per loop step (lane width = unroll * CHUNK).
    # Measured NEUTRAL-to-slightly-worse at bench shape (unroll=2 costs
    # ~+0.4 ms on both kernels: the walk is VPU-bound per lane, not
    # loop-overhead-bound, and 256-wide values pressure the register
    # allocator) — kept at 1; the blockwise cumsum machinery stays for
    # future shapes where tiles run deep.
    unroll: int = 1
    # Backward kernel writes bf16 PAIRS packed into (8, Rp) u32 gradient
    # rows instead of (16, Rp) f32: halves the gradient-write +
    # zero-tail DMA bytes and hands the sort-based reduce its packed
    # payloads directly (the XLA-side pack pass disappears). Only
    # meaningful with fast_grad_reduce (the exact path needs f32 rows).
    packed_grads: bool = False
    # Pre-alignment instance capacity R (the grad reduce's live-row
    # slice bound). None = derive as Rp - num_tiles*CHUNK, which is only
    # correct for the worst-case dummy budget; callers using the compact
    # budget (see binning._dummy_budget) must set it.
    inst_capacity: int | None = None
    # Inference-only fast path (forward kernel, no VJP): instance rows
    # come PACKED as (8, Rp) u32 — xy/conic stay exact f32 bits, while
    # opacity + rgb + depth ride as bf16 pairs (~0.4% rounding on
    # opacity/color, invisible in rendered output) and flow is dropped.
    # Halves the instance-gather and kernel instance-DMA bytes.
    infer: bool = False

    @property
    def inst_rows(self) -> int:
        return 8 if self.infer else ROW

    @property
    def inst_dtype(self):
        return jnp.uint32 if self.infer else jnp.float32

    @property
    def grad_rows(self) -> int:
        return 8 if self.packed_grads else ROW

    @property
    def grad_dtype(self):
        return jnp.uint32 if self.packed_grads else jnp.float32

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y


def _pixel_coords(cfg: PallasBlendConfig, t):
    """(256, 1) pixel-center x/y for tile index t (row-major in-tile)."""
    tx = (t % cfg.tiles_x).astype(jnp.float32)
    ty = (t // cfg.tiles_x).astype(jnp.float32)
    pp = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = tx * TILE + (pp % TILE).astype(jnp.float32)
    py = ty * TILE + (pp // TILE).astype(jnp.float32)
    return px, py


def _tri_cum_incl():
    """(K, K) with [i, j] = 1 iff i <= j: x @ T = inclusive prefix sum
    along the lane axis."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (r <= c).astype(jnp.float32)


def _tri_cum_excl():
    """(K, K) with [i, j] = 1 iff i < j: x @ T = exclusive prefix sum."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (r < c).astype(jnp.float32)


def _tri_suf_incl():
    """(K, K) with [i, j] = 1 iff i >= j: x @ T = inclusive suffix sum."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (r >= c).astype(jnp.float32)


def _tri_suf_excl():
    """(K, K) with [i, j] = 1 iff i > j: x @ T = exclusive suffix sum."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (r > c).astype(jnp.float32)


def _alpha_terms(inst, px, py):
    """Shared per-chunk alpha math. inst: (16, K) field-major block.

    Returns (power, g, alpha_raw, alpha, dx, dy, field rows)."""
    xy_x = inst[0:1, :]        # (1, K)
    xy_y = inst[1:2, :]
    ca = inst[2:3, :]
    cb = inst[3:4, :]
    cc = inst[4:5, :]
    opa = inst[5:6, :]
    dx = xy_x - px             # (256, K)
    dy = xy_y - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g = jnp.exp(power)
    alpha_raw = opa * g
    alpha = jnp.minimum(alpha_raw, gm.ALPHA_CLAMP)
    return power, g, alpha_raw, alpha, dx, dy, (ca, cb, cc, opa)


def _unpack_hi(row):
    """(N, K) u32 -> f32 decoded from the bf16 in the high half."""
    return jax.lax.bitcast_convert_type(
        (row >> 16).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)


def _unpack_lo(row):
    """(N, K) u32 -> f32 decoded from the bf16 in the low half."""
    return jax.lax.bitcast_convert_type(
        row.astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)


def _alpha_terms_infer(inst, px, py):
    """Per-chunk alpha math for the packed inference layout. inst:
    (8, K) u32 — rows [0:5] xy/conic as raw f32 bits, [5] opa|r,
    [6] g|b, [7] depth|0 as bf16 pairs. Returns (power, alpha,
    feat8) with feat8 the (8, K) f32 feature block (rgb, depth,
    zero-padded) for the accumulation contraction."""
    geom = jax.lax.bitcast_convert_type(inst[0:5, :], jnp.float32)
    xy_x = geom[0:1, :]
    xy_y = geom[1:2, :]
    ca = geom[2:3, :]
    cb = geom[3:4, :]
    cc = geom[4:5, :]
    opa = _unpack_hi(inst[5:6, :])
    dx = xy_x - px
    dy = xy_y - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(opa * jnp.exp(power), gm.ALPHA_CLAMP)
    feat8 = jnp.concatenate([
        _unpack_lo(inst[5:6, :]),          # r
        _unpack_hi(inst[6:7, :]),          # g
        _unpack_lo(inst[6:7, :]),          # b
        _unpack_hi(inst[7:8, :]),          # depth
        jnp.zeros((4, inst.shape[1]), jnp.float32),
    ], axis=0)
    return power, alpha, feat8


def _mm(a, b):
    """f32-exact matmul: the triangular cumsums run in log space where
    single-pass bf16 (the TPU default) would cost ~1e-3 relative error in
    the transmittance chain. (Mosaic rejects Precision.HIGH, so HIGHEST
    is the only f32-accurate option in-kernel.)"""
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _mm_exact_rhs(a, b, terms: int = 3):
    """f32-accurate matmul for a RHS that is EXACT in bf16 (the 0/1
    triangular masks): split only the LHS into its exact bf16-term
    decomposition (8 mantissa bits per term) -> `terms` MXU passes
    instead of HIGHEST's 6 (which splits BOTH operands). terms=3
    reconstructs the full f32 mantissa (accuracy equals HIGHEST up to
    f32 accumulation order); terms=2 keeps 16 mantissa bits (relative
    error ~2^-17 per element of the sum)."""
    a0 = a.astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    if terms == 1:
        # Single bf16 pass (~2^-9): inference-only precision.
        return dot(a0, bb)
    r1 = a - a0.astype(jnp.float32)
    a1 = r1.astype(jnp.bfloat16)
    if terms == 2:
        return dot(a0, bb) + dot(a1, bb)
    a2 = (r1 - a1.astype(jnp.float32)).astype(jnp.bfloat16)
    return dot(a0, bb) + (dot(a1, bb) + dot(a2, bb))


def _mm_fast(a, b):
    """Default-precision matmul for threshold-only chains (fail/dead)
    where bf16 error can only flip borderline 1e-4 comparisons."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _prefix_blocks(x, tri_cum, terms):
    """Inclusive prefix sum along the lane axis of (PIX, U*CHUNK) `x`,
    as U 128-wide triangular matmuls + a lane-column carry chain (the
    MAC cost of one (n, n) triangular matmul is quadratic in n; blockwise
    stays linear in the step width)."""
    kw = x.shape[1]
    if kw == CHUNK:
        return _mm_exact_rhs(x, tri_cum, terms)
    blocks = []
    carry = None
    for b in range(kw // CHUNK):
        cb = _mm_exact_rhs(x[:, b * CHUNK:(b + 1) * CHUNK], tri_cum, terms)
        if carry is not None:
            cb = cb + carry
        carry = cb[:, CHUNK - 1: CHUNK]
        blocks.append(cb)
    return jnp.concatenate(blocks, axis=1)


def _prefix_excl_blocks(x, tri_cum_x, terms):
    """EXCLUSIVE prefix sum along the lane axis, blockwise (see
    _prefix_blocks): out[j] = sum_{k < j} x[k]."""
    kw = x.shape[1]
    if kw == CHUNK:
        return _mm_exact_rhs(x, tri_cum_x, terms)
    blocks = []
    carry = None
    for b in range(kw // CHUNK):
        xb = x[:, b * CHUNK:(b + 1) * CHUNK]
        cb = _mm_exact_rhs(xb, tri_cum_x, terms)
        if carry is not None:
            cb = cb + carry
        # inclusive total of this block + earlier = exclusive-at-last
        # + the last lane itself.
        carry = cb[:, CHUNK - 1: CHUNK] + xb[:, CHUNK - 1: CHUNK]
        blocks.append(cb)
    return jnp.concatenate(blocks, axis=1)


def _suffix_blocks(x, tri_suf, terms):
    """Inclusive suffix sum along the lane axis, blockwise (see
    _prefix_blocks)."""
    kw = x.shape[1]
    if kw == CHUNK:
        return _mm_exact_rhs(x, tri_suf, terms)
    n = kw // CHUNK
    blocks = [None] * n
    carry = None
    for b in reversed(range(n)):
        sb = _mm_exact_rhs(x[:, b * CHUNK:(b + 1) * CHUNK], tri_suf, terms)
        if carry is not None:
            sb = sb + carry
        carry = sb[:, 0:1]
        blocks[b] = sb
    return jnp.concatenate(blocks, axis=1)


def _suffix_excl_blocks(x, tri_suf_x, terms):
    """EXCLUSIVE suffix sum along the lane axis, blockwise: lane j gets
    the in-block exclusive suffix plus the full totals of later blocks."""
    kw = x.shape[1]
    if kw == CHUNK:
        return _mm_exact_rhs(x, tri_suf_x, terms)
    n = kw // CHUNK
    blocks = [None] * n
    carry = None
    for b in reversed(range(n)):
        xb = x[:, b * CHUNK:(b + 1) * CHUNK]
        sb = _mm_exact_rhs(xb, tri_suf_x, terms)
        if carry is not None:
            sb = sb + carry
        # total of this block + later = exclusive-at-lane-0 + lane 0.
        carry = sb[:, 0:1] + xb[:, 0:1]
        blocks[b] = sb
    return jnp.concatenate(blocks, axis=1)


def _dgc(a, b, contract_a: int, contract_b: int):
    """dot_general with arbitrary contraction axes (lets the MXU fold the
    operand transpose instead of a VPU relayout)."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _bf16_terms(x, n: int):
    """Exact bf16-term decomposition of f32 `x` (8 mantissa bits/term)."""
    terms = []
    for _ in range(n - 1):
        t = x.astype(jnp.bfloat16)
        terms.append(t)
        x = x - t.astype(jnp.float32)
    terms.append(x.astype(jnp.bfloat16))
    return terms


def _mm_split(a, b, contract_a: int, contract_b: int,
              terms: tuple):
    """dot_general computed as (a_terms x b_terms) bf16 MXU passes.

    terms = (na, nb): split `a` into na bf16 terms and `b` into nb.
    (2, 1) keeps 16 mantissa bits of `a` against a rounded `b`
    (~2^-9 relative); (2, 2) is ~2^-16; HIGHEST is the 3x3->6-pass
    upper bound. Empty terms -> HIGHEST (parity mode)."""
    if not terms:
        return _dgc(a, b, contract_a, contract_b)
    na, nb = terms
    dims = (((contract_a,), (contract_b,)), ((), ()))
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                            preferred_element_type=jnp.float32)
    ta = _bf16_terms(a, na)
    tb = _bf16_terms(b, nb)
    out = None
    # Highest-order product first; accumulate smaller corrections after.
    for i, ai in enumerate(ta):
        for j, bj in enumerate(tb):
            if i + j >= max(na, nb):
                continue  # below the kept mantissa budget
            p = dot(ai, bj)
            out = p if out is None else out + p
    return out


def _eye(n: int):
    return (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            ).astype(jnp.float32)


def _transpose_mm(x, eye=None):
    """(N, C) -> (C, N) inside the kernel via an MXU identity contraction
    (Mosaic has no cheap small-minor-dim VPU transpose). HIGHEST keeps the
    3-term bf16 split, which reconstructs f32 values (and integer-valued
    ranks < 2^24) exactly. Pass a hoisted `eye` when calling from a
    per-tile loop body — constructing the (256, 256) identity costs real
    VPU time at one call per tile."""
    if eye is None:
        eye = _eye(x.shape[0])
    return _dgc(x, eye, 0, 0)


def _forward_kernel(cfg: PallasBlendConfig):
    def kernel(start_ref, count_ref, inst_hbm, out_ref, scratch, acc_ref,
               state_ref, sems):
        g = pl.program_id(0)
        tri_cum_x = _tri_cum_excl()
        eye_pix = _eye(PIX)

        def tile_body(tl, tile_carry):
            _forward_tile(cfg, g * cfg.tiles_per_program + tl, tl,
                          tri_cum_x, eye_pix, start_ref, count_ref,
                          inst_hbm, out_ref, scratch, acc_ref, state_ref,
                          sems)
            return tile_carry

        jax.lax.fori_loop(0, cfg.tiles_per_program, tile_body, 0)

    return kernel


def _forward_tile(cfg, t, tl, tri_cum_x, eye_pix, start_ref, count_ref,
                  inst_hbm, out_ref, scratch, acc_ref, state_ref, sems):
        kw = cfg.unroll * CHUNK                    # lanes per loop step
        start = start_ref[t]
        count = count_ref[t]
        nsteps = pl.cdiv(count, kw)
        px, py = _pixel_coords(cfg, t)

        # Per-pixel running state lives in VMEM scratch, not loop carries
        # (Mosaic's layout unifier rejects multi-vector while carries).
        # state cols: [0] = T, [1] = done flag, [2] = n_contrib.
        # acc is CHANNEL-MAJOR (8, PIX) so the per-chunk feature
        # contraction lands directly in the (8, 256) output layout.
        acc_ref[:] = jnp.zeros((8, PIX), jnp.float32)
        init = jnp.zeros((PIX, 8), jnp.float32)
        state_ref[:] = init + jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (PIX, 8), 1) == 0, 1.0, 0.0)

        # The final step's read may extend past this tile's segment into
        # the next tile's first chunks (masked out by `local < count`) —
        # and, on the last tile, into the one-chunk global pad that
        # _build_inst_data appends for exactly this purpose.
        def dma(slot, s):
            off = pl.multiple_of(start + s * kw, CHUNK)
            return pltpu.make_async_copy(
                inst_hbm.at[:, pl.ds(off, kw)],
                scratch.at[slot], sems.at[slot])

        @pl.when(nsteps > 0)
        def _():
            dma(0, 0).start()

        def body(s, carry):
            @pl.when(s + 1 < nsteps)
            def _():
                dma((s + 1) % 2, s + 1).start()

            dma(s % 2, s).wait()
            inst = scratch[s % 2]                      # (inst_rows, kw)
            t_tr = state_ref[:, 0:1]
            done = state_ref[:, 1:2] > 0.0
            ncon = state_ref[:, 2:3]

            if cfg.infer:
                power, alpha, feat8 = _alpha_terms_infer(inst, px, py)
            else:
                power, _, _, alpha, _, _, _ = _alpha_terms(inst, px, py)
                feat8 = inst[6:14, :]
            local = (s * kw
                     + jax.lax.broadcasted_iota(jnp.int32, (1, kw), 1))
            in_range = local < count                   # (1, kw)
            valid = (in_range & (power <= 0.0)
                     & (alpha >= gm.ALPHA_MIN) & ~done)

            # Log-space prefix matmuls (128-wide blocks + carry chain):
            # q[j] = T after lane j is non-increasing along the sorted
            # lane axis (every factor 1-a is in (0, 1]), so the first
            # sub-T_EPS lane kills all later lanes too — "dead after
            # first fail" IS the fail mask itself, and for surviving
            # lanes the used-only prefix sum equals the all-valid prefix
            # sum. The reference discovers the same boundary sequentially
            # (forward.cu:592-596).
            a_v = jnp.where(valid, alpha, 0.0)
            lcv = jnp.log1p(-a_v)
            # EXCLUSIVE prefix: q_x[j] = T BEFORE lane j, which is what
            # the weight needs directly — and the inclusive T (the
            # reference's test_T for the saturation exit) is one
            # multiply by (1 - a), killing the per-element divide the
            # inclusive formulation paid.
            q_x = t_tr * jnp.exp(
                _prefix_excl_blocks(lcv, tri_cum_x, cfg.fwd_terms))
            q = q_x * (1.0 - a_v)                      # (256, kw)
            fail = valid & (q < gm.T_EPS)
            used = valid & ~fail
            a_u = jnp.where(fail, 0.0, a_v)
            lcu = jnp.where(fail, 0.0, lcv)
            w = a_u * q_x                              # (256, kw)

            # contrib[f, p] = sum_k feat[f, k] * w[p, k]: one MXU
            # contraction over the lane axis (rows 6..13 incl. padding),
            # accumulated channel-major.
            acc_ref[:] = acc_ref[:] + _dgc(feat8, w, 1, 1)

            # Full-step log-product == inclusive product's last column.
            t_out = t_tr * jnp.exp(jnp.sum(lcu, axis=1, keepdims=True))
            done_out = (done | jnp.any(fail, axis=1, keepdims=True))
            rankf = (local + 1).astype(jnp.float32)
            ncon_out = jnp.maximum(
                ncon, jnp.max(jnp.where(used, rankf, 0.0), axis=1,
                              keepdims=True))
            state_ref[:] = jnp.concatenate(
                [t_out, done_out.astype(jnp.float32), ncon_out,
                 jnp.zeros((PIX, 5), jnp.float32)], axis=1)
            # Saturation early-exit: once every pixel is done, remaining
            # steps contribute nothing (forward.cu:592-596 semantics).
            return jnp.min(done_out.astype(jnp.float32)) > 0.0

        def loop_body(carry):
            s, _ = carry
            return s + 1, body(s, 0)

        def loop_cond(carry):
            s, all_done = carry
            return (s < nsteps) & ~all_done

        s_stop, _ = jax.lax.while_loop(loop_cond, loop_body,
                                       (jnp.int32(0), False))

        # Drain the in-flight prefetch when the saturation exit fired
        # (body(s) prefetches step s+1 before processing s).
        @pl.when(s_stop < nsteps)
        def _():
            dma(s_stop % 2, s_stop).wait()

        st2 = jnp.concatenate(
            [state_ref[:, 0:1], state_ref[:, 2:3]], axis=1)    # (256, 2)
        out_ref[tl] = jnp.concatenate(
            [acc_ref[0:FEAT], _transpose_mm(st2, eye_pix)], axis=0)


def _pad_tiles(cfg: PallasBlendConfig, tile_start, tile_count):
    """Pad the per-tile scalar arrays to a multiple of tiles_per_program.
    Padding tiles get count 0 (the tile body becomes a no-op)."""
    t_pad = (-cfg.num_tiles) % cfg.tiles_per_program
    if t_pad:
        tile_start = jnp.concatenate(
            [tile_start, jnp.zeros((t_pad,), tile_start.dtype)])
        tile_count = jnp.concatenate(
            [tile_count, jnp.zeros((t_pad,), tile_count.dtype)])
    return tile_start, tile_count, cfg.num_tiles + t_pad


@functools.partial(jax.jit, static_argnames=("cfg",))
def blend_forward_pallas(cfg: PallasBlendConfig, inst_data: jax.Array,
                         tile_start: jax.Array, tile_count: jax.Array):
    """inst_data: (16, Rp) field-major aligned layout. Returns
    (accum (T, 6, 256) channel-major, t_final (T, 256), ncontrib
    (T, 256) i32, and the raw (Tp, 8, 256) kernel output, Tp = T padded
    to the program tile block — the backward kernel consumes it
    directly, so saving it as a residual skips re-assembling T/ncon)."""
    tpb = cfg.tiles_per_program
    ts, tc, t_tot = _pad_tiles(cfg, tile_start, tile_count)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_tot // tpb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tpb, OUT_COLS, PIX), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, cfg.inst_rows, cfg.unroll * CHUNK),
                       cfg.inst_dtype),
            pltpu.VMEM((8, PIX), jnp.float32),
            pltpu.VMEM((PIX, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _forward_kernel(cfg),
        out_shape=jax.ShapeDtypeStruct((t_tot, OUT_COLS, PIX),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=cfg.interpret,
    )(ts, tc, inst_data)
    accum = out[: cfg.num_tiles, 0:FEAT, :]
    t_final = out[: cfg.num_tiles, FEAT, :]
    ncon = out[: cfg.num_tiles, FEAT + 1, :].astype(jnp.int32)
    return accum, t_final, ncon, out


ZBLK = 8  # chunks per tail-zeroing DMA


def _pack2(a, b):
    """Round two f32 rows to bf16 and pack them into one u32 row
    (a in the high half)."""
    hi = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32) << 16
    lo = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return hi | lo


def _backward_kernel(cfg: PallasBlendConfig):
    def kernel(start_ref, count_ref, inst_hbm, fwdout_ref, dcot_ref,
               grad_hbm, scratch, gscratch, zscratch, state_ref, sems,
               gsems):
        g = pl.program_id(0)
        tri_suf = _tri_suf_incl()
        tri_suf_x = _tri_suf_excl()

        # Tile-LOCAL pixel-moment basis (6, 256): rows {1, px, py, px^2,
        # px*py, py^2} with px, py in [0, 16) — the per-gaussian conic/
        # position gradient sums become ONE MXU contraction of this basis
        # against d_power (see body), and local coordinates keep the
        # binomial-expansion cancellation ratio O(1) (global pixel coords
        # up to ~800 would cost ~12 bits). Tile-independent, so hoisted
        # out of the per-tile loop.
        ppix = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
        plx = (ppix % TILE).astype(jnp.float32)            # (1, 256)
        ply = (ppix // TILE).astype(jnp.float32)
        basis = jnp.concatenate([
            jnp.ones((1, PIX), jnp.float32), plx, ply,
            plx * plx, plx * ply, ply * ply], axis=0)      # (6, 256)

        # The zero block for tail DMAs never changes — write it once per
        # program, not once per tile (it is a 128-vreg store).
        zscratch[:] = jnp.zeros(
            (cfg.grad_rows, ZBLK * CHUNK), cfg.grad_dtype)

        def tile_body(tl, tile_carry):
            _backward_tile(cfg, g * cfg.tiles_per_program + tl, tl,
                           tri_suf, tri_suf_x, basis, start_ref, count_ref,
                           inst_hbm, fwdout_ref, dcot_ref, grad_hbm,
                           scratch, gscratch, zscratch, state_ref, sems,
                           gsems)
            return tile_carry

        jax.lax.fori_loop(0, cfg.tiles_per_program, tile_body, 0)

    return kernel


def _backward_tile(cfg, t, tl, tri_suf, tri_suf_x, basis, start_ref,
                   count_ref, inst_hbm, fwdout_ref, dcot_ref, grad_hbm,
                   scratch, gscratch, zscratch, state_ref, sems, gsems):
        u = cfg.unroll
        kw = u * CHUNK
        start = start_ref[t]
        count = count_ref[t]
        nchunks = pl.cdiv(count, CHUNK)
        px, py = _pixel_coords(cfg, t)
        tx = (t % cfg.tiles_x).astype(jnp.float32) * TILE  # tile origin
        ty = (t // cfg.tiles_x).astype(jnp.float32) * TILE

        # dcot block (1, 8, 256) channel-major: rows = dc(6) + tf_term +
        # pad; T_final and ncon come straight from the forward kernel's
        # saved output block (no XLA-side reassembly). The three per-pixel
        # rows are transposed to (256, 1) broadcast columns with ONE MXU
        # identity contraction per program.
        dc6 = dcot_ref[tl, 0:FEAT, :]                         # (6, 256)
        rows3 = jnp.concatenate([
            dcot_ref[tl, FEAT: FEAT + 1, :],                  # tf_term
            fwdout_ref[tl, FEAT: FEAT + 1, :],                # T_final
            fwdout_ref[tl, FEAT + 1: FEAT + 2, :],            # ncon ranks
        ], axis=0)                                            # (3, 256)
        cols3 = _transpose_mm(rows3)                          # (256, 3)
        tf_term = cols3[:, 0:1]
        t_final = cols3[:, 1:2]
        ncon = cols3[:, 2:3]                                  # float ranks

        # Saturation-aware trip count: no pixel used an instance ranked
        # past max(ncon), so chunks beyond it carry exactly-zero gradients
        # — skip their math and DMA-zero their gradient slices instead
        # (the forward's early-exit bound, reused backwards). The walk is
        # split into `psteps` full kw-wide steps over the BOTTOM-aligned
        # chunks [0, psteps*u) plus a one-chunk-write PROLOGUE for the top
        # odd chunk when eff isn't a multiple of u (processed first —
        # back-to-front order).
        max_rank = jnp.max(ncon).astype(jnp.int32)
        eff = jnp.minimum(pl.cdiv(max_rank, CHUNK), nchunks)
        psteps = eff // u
        podd = eff - psteps * u                 # 0 or 1 (unroll <= 2)
        tail_n = nchunks - eff

        # Zero the tail slices [eff, nchunks) in ZBLK-chunk DMA blocks
        # (the old full walk wrote computed zeros there; the bounded walk
        # must write them explicitly — downstream grad-reduce reads every
        # aligned slice). Runs before the compute loop so gsems pair up.
        # zscratch is pre-zeroed once per program by the kernel preamble.

        def zout(slot, c, width):
            off = pl.multiple_of(start + c * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                zscratch.at[:, pl.ds(0, width * CHUNK)],
                grad_hbm.at[:, pl.ds(off, width * CHUNK)],
                gsems.at[slot])

        nblk = tail_n // ZBLK

        def zblk_body(b, carry):
            @pl.when(b >= 2)
            def _():
                zout(b % 2, 0, ZBLK).wait()
            zout(b % 2, eff + b * ZBLK, ZBLK).start()
            return carry

        jax.lax.fori_loop(0, nblk, zblk_body, 0)

        @pl.when(nblk >= 2)
        def _():
            zout(nblk % 2, 0, ZBLK).wait()

        @pl.when(nblk >= 1)
        def _():
            zout((nblk - 1) % 2, 0, ZBLK).wait()

        def zrem_body(j, carry):
            cpy = zout(0, eff + nblk * ZBLK + j, 1)
            cpy.start()
            cpy.wait()
            return carry

        jax.lax.fori_loop(0, tail_n - nblk * ZBLK, zrem_body, 0)

        def dma_in(slot, s):
            off = pl.multiple_of(start + s * kw, CHUNK)
            return pltpu.make_async_copy(
                inst_hbm.at[:, pl.ds(off, kw)],
                scratch.at[slot], sems.at[slot])

        def dma_out(slot, s):
            off = pl.multiple_of(start + s * kw, CHUNK)
            return pltpu.make_async_copy(
                gscratch.at[slot],
                grad_hbm.at[:, pl.ds(off, kw)],
                gsems.at[slot])

        # Prologue copies (slot 2, own semaphores): the top odd chunk.
        # Its READ is kw-wide (the extra chunks are rank-masked; may spill
        # into the next tile's data or the global end pad — reads only);
        # its WRITE is one-chunk so it never touches the zero-tail region
        # or a neighbouring tile's gradient slices.
        pro_c0 = psteps * u

        def dma_in_pro():
            off = pl.multiple_of(start + pro_c0 * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                inst_hbm.at[:, pl.ds(off, kw)],
                scratch.at[2], sems.at[2])

        def dma_out_pro():
            off = pl.multiple_of(start + pro_c0 * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                gscratch.at[2, :, pl.ds(0, CHUNK)],
                grad_hbm.at[:, pl.ds(off, CHUNK)],
                gsems.at[2])

        @pl.when(podd > 0)
        def _():
            dma_in_pro().start()

        @pl.when(psteps > 0)
        def _():
            dma_in(0, psteps - 1).start()

        # state cols: [0] = running T (from the back), [1] = sigma.
        state_ref[:] = jnp.concatenate(
            [t_final, jnp.zeros((PIX, 7), jnp.float32)], axis=1)

        def step_math(inst, lane0):
            """Gradient math for one kw-lane step starting at instance
            rank `lane0`; updates the running (T, sigma) state and
            returns the (ROW, kw) gradient block."""
            t_run = state_ref[:, 0:1]
            sigma = state_ref[:, 1:2]
            power, g, alpha_raw, alpha, dx, dy, (ca, cb, cc, opa) = \
                _alpha_terms(inst, px, py)
            local = (lane0
                     + jax.lax.broadcasted_iota(jnp.int32, (1, kw), 1))
            in_range = local < count
            valid = in_range & (power <= 0.0) & (alpha >= gm.ALPHA_MIN)
            rank = local.astype(jnp.float32)           # (1, kw)
            used = valid & (rank < ncon)               # (256, kw)

            a_u = jnp.where(used, alpha, 0.0)
            cu = 1.0 - a_u
            lcu = jnp.log1p(-a_u)
            # rp[j] = prod_{k >= j} cu[k] (inclusive suffix product).
            s_suf = _suffix_blocks(lcu, tri_suf, cfg.bwd_terms)
            t_before = t_run * jnp.exp(-s_suf)         # (256, kw)
            w = a_u * t_before

            # gdot[p, k] = sum_f dc_f[p] * feat[f, k]: one MXU matmul
            # contracting the channel axis of both channel-major operands.
            gdot = _mm_split(dc6, inst[6:12, :], 0, 0, cfg.bwd_dot_terms)
            phi = w * gdot
            suffix_excl = (_suffix_excl_blocks(phi, tri_suf_x,
                                               cfg.bwd_terms) + sigma)
            d_alpha = jnp.where(
                used, t_before * gdot - (suffix_excl + tf_term) / cu, 0.0)

            d_power = alpha_raw * d_alpha
            # d_feat[f, k] = sum_p dc_f[p] w[p, k]: MXU contraction over
            # the pixel (sublane) axis.
            d_feat6 = _mm_split(dc6, w, 1, 0, cfg.bwd_dot_terms)
            # All remaining per-gaussian sums are pixel moments of
            # d_power: with dx = xl - plx (xl = gaussian x in tile-local
            # coords), sum_p dx^2 d_power expands binomially into the
            # moments M = basis @ d_power — ONE (6,256)@(256,kw) MXU
            # contraction replaces five (256,kw) elementwise-product
            # chains + six sublane reduction trees; the recombination is
            # (1, kw) row math on the VPU.
            # basis is integer-valued <= 225, EXACT in bf16 -> 1 term.
            mom = _mm_split(
                basis, d_power, 1, 0,
                (1, cfg.bwd_dot_terms[0]) if cfg.bwd_dot_terms else ())
            m0 = mom[0:1, :]
            xl = inst[0:1, :] - tx                     # (1, kw) local
            yl = inst[1:2, :] - ty
            s_x = xl * m0 - mom[1:2, :]                # sum dx * d_power
            s_y = yl * m0 - mom[2:3, :]
            s_xx = xl * (xl * m0 - 2.0 * mom[1:2, :]) + mom[3:4, :]
            s_xy = xl * yl * m0 - xl * mom[2:3, :] - yl * mom[1:2, :] \
                + mom[4:5, :]
            s_yy = yl * (yl * m0 - 2.0 * mom[2:3, :]) + mom[5:6, :]
            # d_power = opa * (g * d_alpha), opa constant per lane, so
            # d_opa = sum(g * d_alpha) = M0 / opa (padding lanes have
            # opa = 0 AND m0 = 0 -> guard the divide).
            d_opa = m0 / jnp.maximum(opa, 1e-30)
            d_ca = -0.5 * s_xx
            d_cb = -s_xy
            d_cc = -0.5 * s_yy
            d_x = -(ca * s_x + cb * s_y)
            d_y = -(cb * s_x + cc * s_y)

            if cfg.packed_grads:
                # bf16-pair u32 rows, channel 2i in the high half — the
                # layout aligned_entry_grads_to_gaussian_grads' fast path
                # sorts directly (rows [0:5] = the 10 live channels).
                grad_block = jnp.concatenate([
                    _pack2(d_x, d_y),
                    _pack2(d_ca, d_cb),
                    _pack2(d_cc, d_opa),
                    _pack2(d_feat6[0:1], d_feat6[1:2]),
                    _pack2(d_feat6[2:3], d_feat6[3:4]),
                    _pack2(d_feat6[4:5], d_feat6[5:6]),
                    jnp.zeros((2, kw), jnp.uint32)], axis=0)
            else:
                zeros = jnp.zeros((ROW - 12, kw), jnp.float32)
                grad_block = jnp.concatenate(
                    [d_x, d_y, d_ca, d_cb, d_cc, d_opa, d_feat6, zeros],
                    axis=0)

            t_out = t_run * jnp.exp(-jnp.sum(lcu, axis=1, keepdims=True))
            sigma_out = sigma + jnp.sum(phi, axis=1, keepdims=True)
            state_ref[:] = jnp.concatenate(
                [t_out, sigma_out, jnp.zeros((PIX, 6), jnp.float32)],
                axis=1)
            return grad_block

        @pl.when(podd > 0)
        def _():
            dma_in_pro().wait()
            gscratch[2] = step_math(scratch[2], pro_c0 * CHUNK)
            dma_out_pro().start()

        def body(i, carry):
            s = psteps - 1 - i
            slot = i % 2

            @pl.when(i + 1 < psteps)
            def _():
                dma_in((i + 1) % 2, s - 1).start()

            dma_in(slot, s).wait()
            grad_block = step_math(scratch[slot], s * kw)

            @pl.when(i >= 2)
            def _():
                dma_out(slot, s + 2).wait()

            gscratch[slot] = grad_block
            dma_out(slot, s).start()
            return carry

        jax.lax.fori_loop(0, psteps, body, 0)

        @pl.when(psteps >= 2)
        def _():
            dma_out(psteps % 2, 1).wait()

        @pl.when(psteps >= 1)
        def _():
            dma_out((psteps - 1) % 2, 0).wait()

        @pl.when(podd > 0)
        def _():
            dma_out_pro().wait()


@functools.partial(jax.jit, static_argnames=("cfg",))
def blend_backward_pallas(cfg: PallasBlendConfig, inst_data: jax.Array,
                          tile_start: jax.Array, tile_count: jax.Array,
                          fwd_out: jax.Array, dcot: jax.Array):
    """fwd_out: the forward kernel's raw (Tp, 8, 256) output (carries
    T_final + ncon; Tp = num_tiles padded to the program tile block).
    dcot: (T, 8, 256) channel-major = [dc(6), tf_term, pad]. Returns
    per-instance gradient rows, field-major (16, Rp)."""
    # inst_data carries a one-chunk global end pad (_build_inst_data);
    # the gradient buffer is the UNPADDED aligned length.
    rp = inst_data.shape[1] - CHUNK
    tpb = cfg.tiles_per_program
    ts, tc, t_tot = _pad_tiles(cfg, tile_start, tile_count)
    if fwd_out.shape[0] != t_tot:
        fwd_out = jnp.pad(
            fwd_out, ((0, t_tot - fwd_out.shape[0]), (0, 0), (0, 0)))
    if dcot.shape[0] != t_tot:
        dcot = jnp.pad(dcot, ((0, t_tot - dcot.shape[0]), (0, 0), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_tot // tpb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tpb, OUT_COLS, PIX), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpb, OUT_COLS, PIX), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((3, ROW, cfg.unroll * CHUNK), jnp.float32),
            pltpu.VMEM((3, cfg.grad_rows, cfg.unroll * CHUNK),
                       cfg.grad_dtype),
            pltpu.VMEM((cfg.grad_rows, ZBLK * CHUNK), cfg.grad_dtype),
            pltpu.VMEM((PIX, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        _backward_kernel(cfg),
        out_shape=jax.ShapeDtypeStruct((cfg.grad_rows, rp),
                                       cfg.grad_dtype),
        grid_spec=grid_spec,
        interpret=cfg.interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ts, tc, inst_data, fwd_out, dcot)


# ---------------------------------------------------------------------------
# Differentiable wrapper (mirrors blend.blend's contract).
# ---------------------------------------------------------------------------

def _ctiles_to_image(x, bc):
    """Channel-major tiles (T, C, 256) -> (H, W, C)."""
    c = x.shape[1]
    img = x.reshape(bc.tiles_y, bc.tiles_x, c, TILE, TILE)
    img = jnp.transpose(img, (0, 3, 1, 4, 2))
    img = img.reshape(bc.tiles_y * TILE, bc.tiles_x * TILE, c)
    return img[: bc.height, : bc.width]


def _image_to_ctiles(img, bc):
    """(H, W, C) -> channel-major tiles (T, C, 256), zero-padding
    partial tiles."""
    c = img.shape[2]
    hp, wp = bc.tiles_y * TILE, bc.tiles_x * TILE
    img = jnp.pad(img, [(0, hp - img.shape[0]), (0, wp - img.shape[1]),
                        (0, 0)])
    img = img.reshape(bc.tiles_y, TILE, bc.tiles_x, TILE, c)
    img = jnp.transpose(img, (0, 2, 4, 1, 3))
    return img.reshape(bc.tiles_y * bc.tiles_x, c, PIX)


def _build_inst_data(xy, conic, opacity, feat, abins):
    """Gather per-gaussian data into the field-major aligned layout
    (16, Rp + CHUNK). One packed row gather (TPU gathers cost per ROW,
    not per element); the sentinel row P is all-zero, so padding
    instances (gauss_id == P) get opacity 0 and are neutral in both
    kernels. One extra zero CHUNK is appended at the global end so the
    kernels' kw-wide reads may overrun the last tile's segment."""
    p = xy.shape[0]
    src = jnp.concatenate([
        xy, conic, opacity[:, None], feat,
        jnp.zeros((p, ROW - 12), xy.dtype)], axis=1)     # (P, 16)
    # Pre-permute the source table into row_id order (one cheap P-row
    # gather) so the per-instance gather needs no gid decode; the
    # appended zero row is the sentinel every id >= P clamps to.
    src = jnp.concatenate([src[abins.source_perm],
                           jnp.zeros((1, ROW), xy.dtype)], axis=0)
    ids = jnp.concatenate([
        jnp.minimum(abins.row_id, p),
        jnp.full((CHUNK,), p, jnp.int32)])
    rows = src[ids]                                      # (Rp + K, 16)
    return rows.T                                        # (16, Rp + K)


def _build_inst_data_infer(xy, conic, opacity, feat_rgbd, abins):
    """Packed-row inference variant of `_build_inst_data`: (8, Rp + K)
    u32 — xy/conic bitcast to raw f32 bits (exact), opacity + rgb +
    depth rounded to bf16 pairs. Half the gather and kernel-DMA bytes
    of the f32 layout; the all-zero sentinel row decodes to opacity 0
    (neutral)."""
    p = xy.shape[0]
    bits = jax.lax.bitcast_convert_type(
        jnp.concatenate([xy, conic], axis=1), jnp.uint32)   # (P, 5)
    src = jnp.concatenate([
        bits,
        _pack2(opacity, feat_rgbd[:, 0])[:, None],
        _pack2(feat_rgbd[:, 1], feat_rgbd[:, 2])[:, None],
        _pack2(feat_rgbd[:, 3], jnp.zeros((p,), jnp.float32))[:, None],
    ], axis=1)                                              # (P, 8)
    src = jnp.concatenate([src[abins.source_perm],
                           jnp.zeros((1, 8), jnp.uint32)], axis=0)
    ids = jnp.concatenate([
        jnp.minimum(abins.row_id, p),
        jnp.full((CHUNK,), p, jnp.int32)])
    return src[ids].T                                       # (8, Rp + K)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def blend_pallas(cfg: PallasBlendConfig, xy, conic, opacity, feat, bg, abins):
    """Pallas-kernel blend with the same outputs as `blend.blend`:
    (color (H,W,3), depth (H,W), flow (H,W,2), alpha (H,W))."""
    out, _, _ = _blend_pallas_forward(cfg, xy, conic, opacity, feat, bg, abins)
    return out


def _blend_pallas_forward(cfg, xy, conic, opacity, feat, bg, abins):
    from .blend import BlendConfig, _tiles_to_image

    inst = _build_inst_data(xy, conic, opacity, feat, abins)
    accum, t_final, ncon, raw = blend_forward_pallas(
        cfg, inst, abins.tile_start, abins.tile_count)
    bc = BlendConfig(height=cfg.height, width=cfg.width,
                     tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y)
    color = _ctiles_to_image(
        accum[:, 0:3, :] + t_final[:, None, :] * bg[None, :, None], bc)
    depth = _tiles_to_image(accum[:, 3, :], bc)
    flow = _ctiles_to_image(accum[:, 4:6, :], bc)
    alpha = _tiles_to_image(1.0 - t_final, bc)
    return (color, depth, flow, alpha), t_final, ncon


def _blend_pallas_fwd(cfg, xy, conic, opacity, feat, bg, abins):
    from .blend import BlendConfig, _tiles_to_image

    # Mirrors _blend_pallas_forward but keeps the gathered instance data
    # and the raw kernel output as residuals (recomputing the (Rp, 16)
    # gather in the backward costs ~10 ms at 800x800; the raw output
    # carries T_final + ncon for the backward kernel as-is).
    inst = _build_inst_data(xy, conic, opacity, feat, abins)
    accum, t_final, ncon, raw = blend_forward_pallas(
        cfg, inst, abins.tile_start, abins.tile_count)
    bc = BlendConfig(height=cfg.height, width=cfg.width,
                     tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y)
    color = _ctiles_to_image(
        accum[:, 0:3, :] + t_final[:, None, :] * bg[None, :, None], bc)
    depth = _tiles_to_image(accum[:, 3, :], bc)
    flow = _ctiles_to_image(accum[:, 4:6, :], bc)
    alpha = _tiles_to_image(1.0 - t_final, bc)
    out = (color, depth, flow, alpha)
    return out, (inst, bg, abins, raw)


def _blend_pallas_bwd(cfg: PallasBlendConfig, res, cots):
    from .binning import aligned_entry_grads_to_gaussian_grads
    from .blend import BlendConfig, _image_to_tiles

    inst, bg, abins, raw = res
    t_final = raw[: cfg.num_tiles, FEAT, :]   # raw rows are tpb-padded
    d_color, d_depth, d_flow, d_alpha = cots
    bc = BlendConfig(height=cfg.height, width=cfg.width,
                     tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y)

    dc = jnp.concatenate([
        _image_to_ctiles(d_color, bc),
        _image_to_ctiles(d_depth[..., None], bc),
        _image_to_ctiles(d_flow, bc),
    ], axis=1)                                    # (T, 6, 256)
    dt_total = (jnp.einsum("tcp,c->tp", dc[:, 0:3, :], bg)
                - _image_to_tiles(d_alpha, bc))
    tf_term = dt_total * t_final
    d_bg = jnp.einsum("tp,tcp->c", t_final, dc[:, 0:3, :])

    dcot = jnp.concatenate([
        dc,
        tf_term[:, None, :],
        jnp.zeros((dc.shape[0], OUT_COLS - FEAT - 1, PIX), jnp.float32),
    ], axis=1)                                    # (T, 8, 256)

    entry_grads = blend_backward_pallas(
        cfg, inst, abins.tile_start, abins.tile_count, raw, dcot)
    # Only 10 of the 12 gradient rows matter downstream: the flow feature
    # is a zeros CONSTANT in training (`gaussian_renderer/__init__.py:119`
    # parity), so its cotangent is discarded by AD. Rows stay field-major
    # straight into the sort-based reduce — no transpose. Packed mode
    # hands over 5 u32 rows (= channels 0..9 as bf16 pairs).
    capacity = (cfg.inst_capacity if cfg.inst_capacity is not None
                else abins.row_id.shape[0] - cfg.num_tiles * CHUNK)
    n_rows = 5 if cfg.packed_grads else 10
    per_gauss = aligned_entry_grads_to_gaussian_grads(
        entry_grads[:n_rows], abins, capacity=capacity,
        fast=cfg.fast_grad_reduce, identity_out_perm=True)
    d_xy = per_gauss[:, 0:2]
    d_conic = per_gauss[:, 2:5]
    d_opa = per_gauss[:, 5]
    d_feat = jnp.concatenate(
        [per_gauss[:, 6:10], jnp.zeros((per_gauss.shape[0], 2),
                                       per_gauss.dtype)], axis=1)
    d_abins = jax.tree.map(
        lambda x: jnp.zeros(x.shape, dtype=jax.dtypes.float0), abins)
    return d_xy, d_conic, d_opa, d_feat, d_bg, d_abins


blend_pallas.defvjp(_blend_pallas_fwd, _blend_pallas_bwd)


def blend_pallas_infer(cfg: PallasBlendConfig, xy, conic, opacity,
                       feat_rgbd, bg, abins):
    """Forward-only inference blend on the packed (8, Rp) u32 instance
    layout (cfg.infer must be True): returns (color (H,W,3),
    depth (H,W), alpha (H,W)). Not differentiable — the training path
    is `blend_pallas`. feat_rgbd: (P, 4) rgb + depth."""
    from .blend import BlendConfig, _tiles_to_image

    inst = _build_inst_data_infer(xy, conic, opacity, feat_rgbd, abins)
    accum, t_final, _, _ = blend_forward_pallas(
        cfg, inst, abins.tile_start, abins.tile_count)
    bc = BlendConfig(height=cfg.height, width=cfg.width,
                     tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y)
    color = _ctiles_to_image(
        accum[:, 0:3, :] + t_final[:, None, :] * bg[None, :, None], bc)
    depth = _tiles_to_image(accum[:, 3, :], bc)
    alpha = _tiles_to_image(1.0 - t_final, bc)
    return color, depth, alpha

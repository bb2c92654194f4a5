"""Spherical-harmonic color: real 3D SH (deg ≤ 4) and the 4D
"spherindrical" basis (spatial SH deg ≤ 3 × temporal Fourier cosines).

TPU-first structure: we build an explicit basis matrix (P, M) and contract
with the coefficient tensor (P, M, 3) in one einsum — a clean MXU matmul —
instead of the reference's unrolled per-degree accumulation
(`utils/sh_utils.py:58-223`, `cuda_rasterizer/forward.cu:20-195`).
Degree annealing is a dynamic coefficient mask (no recompile per degree).

Channel layout parity with the reference:
  3D:  (deg+1)² real SH channels, deg ≤ 4.
  4D:  48 = 16 spatial × (1 + cos(2π dt/T) + cos(4π dt/T)); the deg_t = 0
       case uses the `sh_channels_4d = [1, 6, 16, 33]` truncation
       (`sh_utils.py:56`, used for channel counts only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)
C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
      -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
      0.47308734787878004, -1.7701307697799304, 0.6258357354491761)

# Channel counts for gaussian_dim == 4 as a function of spatial degree when
# deg_t == 0 (reference sh_channels_4d).
SH_CHANNELS_4D = (1, 6, 16, 33)

MAX_SH_3D = 25   # deg 4
MAX_SH_4D = 48   # deg 3 spatial x deg_t 2


def num_sh_channels(sh_degree: int, sh_degree_t: int, gaussian_dim: int,
                    force_sh_3d: bool) -> int:
    """Max coefficient count M (reference get_max_sh_channels,
    `gaussian_model.py:221-228`)."""
    if gaussian_dim == 3 or force_sh_3d:
        return (sh_degree + 1) ** 2
    if sh_degree_t == 0:
        return SH_CHANNELS_4D[sh_degree]
    return (sh_degree + 1) ** 2 * (sh_degree_t + 1)


def sh3d_basis(dirs: jax.Array, max_deg: int = 3) -> jax.Array:
    """Real SH basis values for unit directions (..., 3) → (..., (max_deg+1)²)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    out = [C0 * one]
    if max_deg >= 1:
        out += [-C1 * y, C1 * z, -C1 * x]
    if max_deg >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
                C2[3] * xz, C2[4] * (xx - yy)]
    if max_deg >= 3:
        out += [C3[0] * y * (3 * xx - yy), C3[1] * xy * z,
                C3[2] * y * (4 * zz - xx - yy),
                C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                C3[4] * x * (4 * zz - xx - yy), C3[5] * z * (xx - yy),
                C3[6] * x * (xx - 3 * yy)]
    if max_deg >= 4:
        out += [C4[0] * xy * (xx - yy), C4[1] * yz * (3 * xx - yy),
                C4[2] * xy * (7 * zz - 1), C4[3] * yz * (7 * zz - 3),
                C4[4] * (zz * (35 * zz - 30) + 3), C4[5] * xz * (7 * zz - 3),
                C4[6] * (xx - yy) * (7 * zz - 1), C4[7] * xz * (xx - 3 * yy),
                C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy))]
    return jnp.stack(out, axis=-1)


def sh4d_basis(dirs: jax.Array, dir_t: jax.Array, time_duration: float) -> jax.Array:
    """Spherindrical basis (..., 48): spatial deg-3 SH modulated by
    cos(2πk·dt/T), k = 0, 1, 2 (`sh_utils.py:115-223`)."""
    spatial = sh3d_basis(dirs, max_deg=3)  # (..., 16)
    t1 = jnp.cos(2.0 * jnp.pi * dir_t / time_duration)[..., None]
    t2 = jnp.cos(4.0 * jnp.pi * dir_t / time_duration)[..., None]
    return jnp.concatenate([spatial, t1 * spatial, t2 * spatial], axis=-1)


def sh_degree_mask_3d(active_deg: jax.Array, max_channels: int) -> jax.Array:
    """(max_channels,) 0/1 mask keeping channels with degree ≤ active_deg.

    `active_deg` may be a traced scalar — masking replaces the reference's
    per-degree code paths so SH annealing causes no recompiles."""
    chan = np.arange(max_channels)
    degs = jnp.asarray(np.floor(np.sqrt(chan)), dtype=jnp.int32)
    return (degs <= active_deg).astype(jnp.float32)


def sh_degree_mask_4d(active_deg: jax.Array, active_deg_t: jax.Array) -> jax.Array:
    """(48,) mask over the spherindrical layout from dynamic (deg, deg_t)."""
    chan = np.arange(MAX_SH_4D)
    spatial_deg = jnp.asarray(np.floor(np.sqrt(chan % 16)), dtype=jnp.int32)
    temporal_deg = jnp.asarray(chan // 16, dtype=jnp.int32)
    return ((spatial_deg <= active_deg) & (temporal_deg <= active_deg_t)).astype(jnp.float32)


def eval_sh3d(sh: jax.Array, dirs: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Contract SH coeffs (..., M, 3) with the basis at `dirs` (..., 3) → (..., 3).

    Output has NO +0.5 offset / clamp — see `sh_to_rgb`.
    """
    max_deg = {1: 0, 4: 1, 9: 2, 16: 3, 25: 4}[sh.shape[-2]]
    basis = sh3d_basis(dirs, max_deg=max_deg)
    if mask is not None:
        basis = basis * mask
    return jnp.einsum("...m,...mc->...c", basis, sh, precision="highest")


def eval_sh4d(sh: jax.Array, dirs: jax.Array, dir_t: jax.Array,
              time_duration: float, mask: jax.Array | None = None) -> jax.Array:
    """4D spherindrical color: coeffs (..., M≤48, 3), dirs (..., 3), dir_t (...,)."""
    basis = sh4d_basis(dirs, dir_t, time_duration)[..., : sh.shape[-2]]
    if mask is not None:
        basis = basis * mask[: sh.shape[-2]]
    return jnp.einsum("...m,...mc->...c", basis, sh, precision="highest")


def sh_to_rgb(raw: jax.Array) -> jax.Array:
    """+0.5 shift and clamp-at-zero; the clamp gates gradients exactly like
    the reference's `clamped` flags (`forward.cu:188-194`)."""
    return jnp.maximum(raw + 0.5, 0.0)


def rgb_to_sh_dc(rgb: jax.Array) -> jax.Array:
    """Inverse DC mapping for point-cloud color init (`sh_utils.py:225-226`)."""
    return (rgb - 0.5) / C0

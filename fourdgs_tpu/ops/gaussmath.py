"""Core 4D-gaussian math: quaternion rotors, covariance construction,
temporal conditioning, and EWA screen-space projection.

All functions are pure jnp over batched (P, ...) arrays — fully vmappable
and usable both as the production compute path (XLA fuses these into the
preprocess stage) and as the golden oracle for the Pallas kernels.

Behavioral parity notes (reference = fudan-zvg/4d-gaussian-splatting):
  * 4D rotation from an isoclinic left/right quaternion pair; convention
    matches `utils/general_utils.py:113-133` (build_rotation_4d: the
    left/right multiplication matrices composed then axis-flipped), which
    the reference CUDA kernel mirrors in column-major form
    (`cuda_rasterizer/forward.cu:279-352`). Both reference paths are used
    interchangeably there (compute_cov3D_python feeds the CUDA blend), so
    a single convention is sound.
  * Temporal conditioning: cov_t = Σ[3,3]; conditional 3D covariance
    Σ11 − Σ12 Σ12ᵀ/Σtt; mean shift Δμ = Σ12/Σtt · (timestamp − t);
    marginal opacity exp(−½dt²/(Σtt[+prefilter_var]))
    (`forward.cu:332-351`, `scene/gaussian_model.py:34-47,238-242`).
  * EWA projection with the +0.3px low-pass, 1.3·tanfov frustum clamp and
    3σ radius (`forward.cu:198-237,446-471`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Matches the reference blend/preprocess epsilons (forward.cu, auxiliary.h).
HOMOGENEOUS_EPS = 1e-7  # p_w = 1/(p_hom.w + 1e-7)            forward.cu:445
NEAR_PLANE = 0.2        # view-space z cull                    auxiliary.h:155
LOWPASS = 0.3           # screen-space covariance low-pass     forward.cu:234
FOV_CLAMP = 1.3         # EWA Jacobian frustum clamp           forward.cu:206
MARGINAL_CULL = 0.05    # temporal marginal hard cull          forward.cu:335
ALPHA_CLAMP = 0.99      # saturating alpha                     forward.cu:588
ALPHA_MIN = 1.0 / 255.0  # alpha floor                         forward.cu:589
T_EPS = 1e-4            # transmittance early-out              forward.cu:592


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize quaternions along the last axis (wxyz layout)."""
    n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    return q / jnp.maximum(n, eps)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) wxyz → rotation matrix (..., 3, 3).

    Same element layout as the reference (`general_utils.py:79-100`).
    Input is assumed normalized (callers normalize once).
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1)
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1)
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotor4d_to_rotmat(q_l: jax.Array, q_r: jax.Array) -> jax.Array:
    """Isoclinic quaternion pair (..., 4)+(...,4) → SO(4) matrix (..., 4, 4).

    R = flip(L(q_l) @ Rᵀ(q_r)) where L/R are the quaternion left/right
    multiplication matrices; the double axis flip re-labels the basis so the
    4th coordinate is the time axis. Parity with `general_utils.py:113-133`.
    Inputs assumed normalized.
    """
    a, b, c, d = q_l[..., 0], q_l[..., 1], q_l[..., 2], q_l[..., 3]
    p, q, r, s = q_r[..., 0], q_r[..., 1], q_r[..., 2], q_r[..., 3]

    m_l = jnp.stack([
        jnp.stack([a, -b, -c, -d], -1),
        jnp.stack([b, a, -d, c], -1),
        jnp.stack([c, d, a, -b], -1),
        jnp.stack([d, -c, b, a], -1),
    ], axis=-2)
    m_r = jnp.stack([
        jnp.stack([p, q, r, s], -1),
        jnp.stack([-q, p, -s, r], -1),
        jnp.stack([-r, s, p, -q], -1),
        jnp.stack([-s, -r, q, p], -1),
    ], axis=-2)
    rot = jnp.matmul(m_l, m_r, precision="highest")
    # Reverse both matrix axes (torch `.flip(1, 2)`).
    return rot[..., ::-1, ::-1]


def build_cov3d(scales: jax.Array, quats: jax.Array) -> jax.Array:
    """3D covariance Σ = R S² Rᵀ, packed upper triangle (..., 6).

    `scales` are post-activation (exp'd); `quats` normalized.
    Packing order [xx, xy, xz, yy, yz, zz] matches the reference cov3D
    buffer layout (`forward.cu:265-271`).
    """
    rot = quat_to_rotmat(quats)
    m = rot * scales[..., None, :]  # R @ diag(s)
    sigma = jnp.matmul(m, jnp.swapaxes(m, -1, -2), precision="highest")
    return pack_sym3(sigma)


def pack_sym3(sigma: jax.Array) -> jax.Array:
    """(..., 3, 3) symmetric → packed (..., 6) [xx, xy, xz, yy, yz, zz]."""
    return jnp.stack([
        sigma[..., 0, 0], sigma[..., 0, 1], sigma[..., 0, 2],
        sigma[..., 1, 1], sigma[..., 1, 2], sigma[..., 2, 2],
    ], axis=-1)


def unpack_sym3(c: jax.Array) -> jax.Array:
    """Packed (..., 6) → full symmetric (..., 3, 3)."""
    xx, xy, xz, yy, yz, zz = (c[..., i] for i in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], -1),
        jnp.stack([xy, yy, yz], -1),
        jnp.stack([xz, yz, zz], -1),
    ], axis=-2)


def build_cov4d(scales_xyzt: jax.Array, q_l: jax.Array, q_r: jax.Array) -> jax.Array:
    """Full 4D covariance Σ = R S² Rᵀ as (..., 4, 4).

    Equivalent to the reference L @ Lᵀ with L = R4 @ diag(s)
    (`gaussian_model.py:34-40`, `general_utils.py:135-145`).
    """
    rot = rotor4d_to_rotmat(q_l, q_r)
    m = rot * scales_xyzt[..., None, :]
    return jnp.matmul(m, jnp.swapaxes(m, -1, -2), precision="highest")


def condition_cov4d(
    cov4: jax.Array,
    t: jax.Array,
    timestamp: jax.Array,
    prefilter_var: float = -1.0,
):
    """Temporal slice of the 4D gaussian at `timestamp`.

    Args:
      cov4: (..., 4, 4) full covariance.
      t: (...,) temporal means.
      timestamp: scalar (or broadcastable) query time.
      prefilter_var: if > 0, widens the marginal's variance (reference
        `prefilter_var`, `forward.cu:333`).

    Returns:
      cov3: (..., 6) packed conditional 3D covariance.
      delta_mean: (..., 3) mean shift Δμ = Σ12/Σtt · dt with dt = timestamp−t.
      marginal: (...,) temporal marginal opacity multiplier.
      cov_t: (...,) temporal variance Σtt.
    """
    dt = timestamp - t
    cov_t = cov4[..., 3, 3]
    cov12 = cov4[..., :3, 3]
    # Σtt = Σ s_i² R²[3,i] > 0 always (R orthogonal, s > 0); guard anyway.
    safe_cov_t = jnp.maximum(cov_t, 1e-12)
    inv_cov_t = 1.0 / safe_cov_t
    cov11 = cov4[..., :3, :3]
    cond = cov11 - (cov12[..., :, None] * cov12[..., None, :]) * inv_cov_t[..., None, None]
    delta_mean = cov12 * (inv_cov_t * dt)[..., None]
    var = safe_cov_t + prefilter_var if prefilter_var > 0.0 else safe_cov_t
    marginal = jnp.exp(-0.5 * dt * dt / var)
    return pack_sym3(cond), delta_mean, marginal, cov_t


def marginal_t_separable(
    t: jax.Array, scales_t: jax.Array, timestamp: jax.Array,
    prefilter_var: float = -1.0,
) -> jax.Array:
    """Temporal marginal for the gaussian_dim=4, rot_4d=False mode: an
    independent 1D time gaussian with variance = activated scale_t
    (`forward.cu:431-437` — note the reference uses σ, not σ², there)."""
    dt = t - timestamp
    var = scales_t + prefilter_var if prefilter_var > 0.0 else scales_t
    return jnp.exp(-0.5 * dt * dt / jnp.maximum(var, 1e-12))


def ewa_project(
    mean3d: jax.Array,
    cov3: jax.Array,
    viewmatrix: jax.Array,
    focal: jax.Array,
    tan_fov: jax.Array,
) -> jax.Array:
    """EWA splat: world-space covariance → 2D screen covariance (..., 3).

    Args:
      mean3d: (..., 3) world means (already time-shifted).
      cov3: (..., 6) packed 3D covariance.
      viewmatrix: (4, 4) world→view, applied as V @ [x; 1].
      focal: (2,) [focal_x, focal_y] in pixels.
      tan_fov: (2,) [tan_fovx, tan_fovy].

    Returns packed 2D covariance [cxx, cxy, cyy] with the +0.3 low-pass
    added to the diagonal (`forward.cu:198-237`).
    """
    w = viewmatrix[:3, :3]
    tview = mean3d @ w.T + viewmatrix[:3, 3]
    tz = tview[..., 2]
    lim = FOV_CLAMP * tan_fov
    txz = jnp.clip(tview[..., 0] / tz, -lim[0], lim[0]) * tz
    tyz = jnp.clip(tview[..., 1] / tz, -lim[1], lim[1]) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J rows (2x3): [fx/z, 0, -fx·x/z²], [0, fy/z, -fy·y/z²]
    j00 = focal[0] * inv_z
    j02 = -(focal[0] * txz) * inv_z2
    j11 = focal[1] * inv_z
    j12 = -(focal[1] * tyz) * inv_z2

    # M = J @ W : (..., 2, 3)
    m0 = j00[..., None] * w[0] + j02[..., None] * w[2]
    m1 = j11[..., None] * w[1] + j12[..., None] * w[2]

    sigma = unpack_sym3(cov3)
    s_m0 = jnp.einsum("...ij,...j->...i", sigma, m0, precision="highest")
    s_m1 = jnp.einsum("...ij,...j->...i", sigma, m1, precision="highest")
    cxx = jnp.sum(m0 * s_m0, axis=-1) + LOWPASS
    cxy = jnp.sum(m0 * s_m1, axis=-1)
    cyy = jnp.sum(m1 * s_m1, axis=-1) + LOWPASS
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def cov2d_to_conic_radius(cov2d: jax.Array):
    """Invert the 2D covariance and bound the splat extent.

    Returns (conic (...,3) [a,b,c], radius (...,) float pixels, valid (...,)).
    Radius = ceil(3·√λmax) with the reference's max(0.1, ·) eigenvalue guard;
    valid requires det != 0 and int(radius) >= 1 (`forward.cu:446-471`).
    """
    cxx, cxy, cyy = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = cxx * cyy - cxy * cxy
    valid = det != 0.0
    det_inv = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
    conic = jnp.stack([cyy * det_inv, -cxy * det_inv, cxx * det_inv], axis=-1)
    mid = 0.5 * (cxx + cyy)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))
    valid = valid & (radius.astype(jnp.int32) >= 1)
    return conic, radius, valid


def project_points(mean3d: jax.Array, projmatrix: jax.Array, wh: jax.Array):
    """Full-projection to pixel coordinates.

    Args:
      mean3d: (..., 3); projmatrix: (4, 4) = P @ V applied as M @ [x; 1];
      wh: (2,) image [width, height].
    Returns (xy_pixel (..., 2), ndc (..., 3)).
    Pixel convention ndc2Pix(v, S) = ((v+1)·S − 1)/2 (`auxiliary.h:42-45`).
    """
    hom = mean3d @ projmatrix[:3, :3].T + projmatrix[:3, 3]
    w = mean3d @ projmatrix[3, :3] + projmatrix[3, 3]
    ndc = hom / (w[..., None] + HOMOGENEOUS_EPS)
    xy = ((ndc[..., :2] + 1.0) * wh - 1.0) * 0.5
    return xy, ndc


def view_z(mean3d: jax.Array, viewmatrix: jax.Array) -> jax.Array:
    """View-space depth (the reference's blend depth channel)."""
    return mean3d @ viewmatrix[2, :3] + viewmatrix[2, 3]


# ---------------------------------------------------------------------------
# Columnar (scalar-expanded) variants for the production preprocess path.
#
# The matrix forms above materialize (P, 3, 3)/(P, 4, 4) intermediates whose
# minor dims pad to 128 lanes on TPU (up to ~40x wasted traffic) and whose
# batched 3x3/4x4 dot_generals map poorly onto the MXU. These expansions
# keep every quantity a (P,) column so XLA emits pure lane-efficient
# elementwise code. Each is golden-tested against its matrix twin
# (tests/test_columnar.py).
# ---------------------------------------------------------------------------

def rotor4d_rows(q_l: jax.Array, q_r: jax.Array):
    """SO(4) matrix entries of `rotor4d_to_rotmat` as 16 (P,) columns.

    Returns r[i][j] == rotor4d_to_rotmat(q_l, q_r)[..., i, j].
    """
    a, b, c, d = q_l[..., 0], q_l[..., 1], q_l[..., 2], q_l[..., 3]
    p, q, r, s = q_r[..., 0], q_r[..., 1], q_r[..., 2], q_r[..., 3]
    # m = M_l @ M_r (see rotor4d_to_rotmat; machine-generated expansion),
    # then both axes reversed.
    m = [[a * p + b * q + c * r + d * s,
          a * q - b * p - c * s + d * r,
          a * r + b * s - c * p - d * q,
          a * s - b * r + c * q - d * p],
         [b * p - a * q + d * r - c * s,
          b * q + a * p - d * s - c * r,
          b * r - a * s - d * p + c * q,
          b * s + a * r + d * q + c * p],
         [c * p - d * q - a * r + b * s,
          c * q + d * p + a * s + b * r,
          c * r - d * s + a * p - b * q,
          c * s + d * r - a * q - b * p],
         [d * p + c * q - b * r - a * s,
          d * q - c * p + b * s - a * r,
          d * r + c * s + b * p + a * q,
          d * s - c * r - b * q + a * p]]
    return [[m[3 - i][3 - j] for j in range(4)] for i in range(4)]


def cov4d_blocks_columnar(scales_xyzt: jax.Array, q_l: jax.Array,
                          q_r: jax.Array):
    """Σ = R S² Rᵀ blocks as columns: (cov11 packed 6-list, cov12 3-list,
    cov_t) — equivalent to build_cov4d's [..., :3, :3]/[..., :3, 3]/[3, 3]."""
    rr = rotor4d_rows(q_l, q_r)
    s2 = [scales_xyzt[..., k] ** 2 for k in range(4)]

    def entry(i, j):
        return sum(rr[i][k] * s2[k] * rr[j][k] for k in range(4))

    cov11 = [entry(0, 0), entry(0, 1), entry(0, 2),
             entry(1, 1), entry(1, 2), entry(2, 2)]
    cov12 = [entry(0, 3), entry(1, 3), entry(2, 3)]
    return cov11, cov12, entry(3, 3)


def condition_cov4d_columnar(scales_xyzt, q_l, q_r, t, timestamp,
                             prefilter_var: float = -1.0):
    """Columnar twin of build_cov4d + condition_cov4d. Returns
    (cov3 packed (P, 6), delta_mean (P, 3), marginal (P,), cov_t (P,))."""
    cov11, cov12, cov_t = cov4d_blocks_columnar(scales_xyzt, q_l, q_r)
    dt = timestamp - t
    safe = jnp.maximum(cov_t, 1e-12)
    inv = 1.0 / safe
    c0, c1, c2 = cov12
    cond = jnp.stack([
        cov11[0] - c0 * c0 * inv, cov11[1] - c0 * c1 * inv,
        cov11[2] - c0 * c2 * inv, cov11[3] - c1 * c1 * inv,
        cov11[4] - c1 * c2 * inv, cov11[5] - c2 * c2 * inv], axis=-1)
    scale_dt = inv * dt
    delta = jnp.stack([c0 * scale_dt, c1 * scale_dt, c2 * scale_dt], -1)
    var = safe + prefilter_var if prefilter_var > 0.0 else safe
    marginal = jnp.exp(-0.5 * dt * dt / var)
    return cond, delta, marginal, cov_t


def cov3d_columnar(scales: jax.Array, quats: jax.Array) -> jax.Array:
    """Columnar twin of build_cov3d (3D mode): packed (P, 6)."""
    r_, x, y, z = quats[..., 0], quats[..., 1], quats[..., 2], quats[..., 3]
    rr = [[1 - 2 * (y * y + z * z), 2 * (x * y - r_ * z), 2 * (x * z + r_ * y)],
          [2 * (x * y + r_ * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r_ * x)],
          [2 * (x * z - r_ * y), 2 * (y * z + r_ * x), 1 - 2 * (x * x + y * y)]]
    s2 = [scales[..., k] ** 2 for k in range(3)]

    def entry(i, j):
        return sum(rr[i][k] * s2[k] * rr[j][k] for k in range(3))

    return jnp.stack([entry(0, 0), entry(0, 1), entry(0, 2),
                      entry(1, 1), entry(1, 2), entry(2, 2)], axis=-1)


def ewa_project_columnar(mean3d, cov3, viewmatrix, focal, tan_fov):
    """Columnar twin of ewa_project: packed 2D covariance (P, 3)."""
    w = viewmatrix[:3, :3]
    x, y, z = mean3d[..., 0], mean3d[..., 1], mean3d[..., 2]
    tview = [w[i, 0] * x + w[i, 1] * y + w[i, 2] * z + viewmatrix[i, 3]
             for i in range(3)]
    tz = tview[2]
    lim0 = FOV_CLAMP * tan_fov[0]
    lim1 = FOV_CLAMP * tan_fov[1]
    txz = jnp.clip(tview[0] / tz, -lim0, lim0) * tz
    tyz = jnp.clip(tview[1] / tz, -lim1, lim1) * tz
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    j00 = focal[0] * inv_z
    j02 = -(focal[0] * txz) * inv_z2
    j11 = focal[1] * inv_z
    j12 = -(focal[1] * tyz) * inv_z2
    m0 = [j00 * w[0, k] + j02 * w[2, k] for k in range(3)]
    m1 = [j11 * w[1, k] + j12 * w[2, k] for k in range(3)]
    xx, xy, xz = cov3[..., 0], cov3[..., 1], cov3[..., 2]
    yy, yz, zz = cov3[..., 3], cov3[..., 4], cov3[..., 5]
    sig = [[xx, xy, xz], [xy, yy, yz], [xz, yz, zz]]
    sm0 = [sum(sig[i][k] * m0[k] for k in range(3)) for i in range(3)]
    sm1 = [sum(sig[i][k] * m1[k] for k in range(3)) for i in range(3)]
    cxx = sum(m0[k] * sm0[k] for k in range(3)) + LOWPASS
    cxy = sum(m0[k] * sm1[k] for k in range(3))
    cyy = sum(m1[k] * sm1[k] for k in range(3)) + LOWPASS
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def project_points_columnar(mean3d, projmatrix, wh):
    """Columnar twin of project_points."""
    x, y, z = mean3d[..., 0], mean3d[..., 1], mean3d[..., 2]
    hom = [projmatrix[i, 0] * x + projmatrix[i, 1] * y
           + projmatrix[i, 2] * z + projmatrix[i, 3] for i in range(4)]
    inv_w = 1.0 / (hom[3] + HOMOGENEOUS_EPS)
    ndc = jnp.stack([hom[0] * inv_w, hom[1] * inv_w, hom[2] * inv_w], -1)
    xy = ((ndc[..., :2] + 1.0) * wh - 1.0) * 0.5
    return xy, ndc

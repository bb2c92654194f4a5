"""Golden tests for the core 4D gaussian math (oracles are independent
derivations — textbook quaternion algebra / dense numpy linear algebra —
not re-implementations of the production code)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fourdgs_tpu.ops import gaussmath as gm


def quat_mul(a, b):
    """Textbook Hamilton product, (w, x, y, z)."""
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def quat_conj(q):
    return np.array([q[0], -q[1], -q[2], -q[3]])


def random_unit_quat(rng, n=None):
    q = rng.normal(size=(4,) if n is None else (n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_rotmat_rotates_like_quaternion(rng):
    q = random_unit_quat(rng, 16)
    r = np.asarray(gm.quat_to_rotmat(jnp.asarray(q, jnp.float32)))
    for i in range(16):
        v = rng.normal(size=3)
        vq = np.concatenate([[0.0], v])
        expected = quat_mul(quat_mul(q[i], vq), quat_conj(q[i]))[1:]
        np.testing.assert_allclose(r[i] @ v, expected, atol=1e-5)


def test_rotor4d_is_so4_and_matches_quaternion_sandwich(rng):
    ql = random_unit_quat(rng, 8)
    qr = random_unit_quat(rng, 8)
    rot = np.asarray(gm.rotor4d_to_rotmat(
        jnp.asarray(ql, jnp.float32), jnp.asarray(qr, jnp.float32)))
    for i in range(8):
        a = rot[i]
        np.testing.assert_allclose(a @ a.T, np.eye(4), atol=1e-5)
        assert np.linalg.det(a) == pytest.approx(1.0, abs=1e-4)
        # The un-flipped matrix acts as u ↦ q_l ⊛ u ⊛ conj(q_r) on (w,x,y,z);
        # ours is basis-reversed on both sides (torch .flip(1,2) convention).
        u = rng.normal(size=4)
        expected = quat_mul(quat_mul(ql[i], u), quat_conj(qr[i]))
        np.testing.assert_allclose(a @ u[::-1], expected[::-1], atol=1e-5)


def test_build_cov3d_matches_dense(rng):
    q = random_unit_quat(rng, 8)
    s = np.exp(rng.normal(size=(8, 3)))
    packed = np.asarray(gm.build_cov3d(jnp.asarray(s, jnp.float32),
                                       jnp.asarray(q, jnp.float32)))
    rots = np.asarray(gm.quat_to_rotmat(jnp.asarray(q, jnp.float32)))
    for i in range(8):
        dense = rots[i] @ np.diag(s[i] ** 2) @ rots[i].T
        np.testing.assert_allclose(
            packed[i], dense[np.triu_indices(3)], rtol=1e-4, atol=1e-5)


def test_condition_cov4d_schur_and_marginal(rng):
    ql = random_unit_quat(rng, 8)
    qr = random_unit_quat(rng, 8)
    s = np.exp(rng.normal(size=(8, 4)) * 0.5)
    t = rng.normal(size=8).astype(np.float32)
    ts = np.float32(0.3)
    cov4 = gm.build_cov4d(jnp.asarray(s, jnp.float32),
                          jnp.asarray(ql, jnp.float32),
                          jnp.asarray(qr, jnp.float32))
    cond, dmu, marg, cov_t = gm.condition_cov4d(cov4, jnp.asarray(t), ts)
    cov4 = np.asarray(cov4, np.float64)
    for i in range(8):
        # Schur complement == inverse of the spatial block of the precision.
        lam = np.linalg.inv(cov4[i])
        expected = np.linalg.inv(lam[:3, :3])
        np.testing.assert_allclose(
            np.asarray(gm.unpack_sym3(cond))[i], expected, rtol=1e-3, atol=1e-4)
        dt = ts - t[i]
        np.testing.assert_allclose(
            np.asarray(dmu)[i], cov4[i][:3, 3] / cov4[i][3, 3] * dt,
            rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(marg)[i],
            np.exp(-0.5 * dt * dt / cov4[i][3, 3]), rtol=1e-4)


def test_ewa_project_matches_dense(rng):
    mean = np.array([[0.3, -0.2, 3.0]], np.float32)
    q = random_unit_quat(rng, 1)
    s = np.array([[0.2, 0.1, 0.3]], np.float32)
    cov3 = gm.build_cov3d(jnp.asarray(s), jnp.asarray(q, jnp.float32))
    # simple rotated view matrix
    angle = 0.3
    w = np.array([[np.cos(angle), 0, np.sin(angle)],
                  [0, 1, 0],
                  [-np.sin(angle), 0, np.cos(angle)]], np.float32)
    view = np.eye(4, dtype=np.float32)
    view[:3, :3] = w
    view[:3, 3] = [0.1, 0.0, 0.5]
    focal = np.array([300.0, 310.0], np.float32)
    tanfov = np.array([1.0, 1.0], np.float32)

    got = np.asarray(gm.ewa_project(jnp.asarray(mean), cov3,
                                    jnp.asarray(view), jnp.asarray(focal),
                                    jnp.asarray(tanfov)))[0]

    tview = w @ mean[0] + view[:3, 3]
    x, y, z = tview
    jac = np.array([[focal[0] / z, 0, -focal[0] * x / z ** 2],
                    [0, focal[1] / z, -focal[1] * y / z ** 2]])
    sigma = np.asarray(gm.unpack_sym3(cov3))[0]
    dense = jac @ w @ sigma @ w.T @ jac.T
    expected = np.array([dense[0, 0] + 0.3, dense[0, 1], dense[1, 1] + 0.3])
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_conic_radius_reference_rules():
    cov2d = jnp.asarray([[4.0, 0.0, 1.0],
                         [1e-8, 0.0, 1e-8],
                         [1.0, 1.0, 1.0]], jnp.float32)
    conic, radius, valid = gm.cov2d_to_conic_radius(cov2d)
    np.testing.assert_allclose(np.asarray(conic)[0], [0.25, 0.0, 1.0], atol=1e-6)
    # λmax = 4 → radius ceil(3·2) = 6
    assert int(radius[0]) == 6
    assert bool(valid[0])
    # Tiny covariance: the reference's max(0.1, ·) eigenvalue floor keeps
    # λ ≥ √0.1 → radius 2, still valid (forward.cu:461-471).
    assert int(radius[1]) == 2 and bool(valid[1])
    # Exactly singular → rejected (det == 0 check).
    assert not bool(valid[2])


def test_project_points_center():
    proj = np.eye(4, dtype=np.float32)
    mean = jnp.asarray([[0.0, 0.0, 0.5]], jnp.float32)
    xy, ndc = gm.project_points(mean, jnp.asarray(proj), jnp.asarray([64.0, 32.0]))
    # ndc (0,0) → pixel ((0+1)*S-1)/2 = (S-1)/2
    np.testing.assert_allclose(np.asarray(xy)[0], [31.5, 15.5], atol=1e-4)

"""Columnar (scalar-expanded) gaussmath vs the matrix forms — exact
numerical twins."""

import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.ops import gaussmath as gm

from utils import random_scene


def _q(rng, p):
    q = rng.normal(size=(p, 4))
    return jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True),
                       jnp.float32)


def test_rotor4d_rows(rng):
    p = 64
    ql, qr = _q(rng, p), _q(rng, p)
    ref = np.asarray(gm.rotor4d_to_rotmat(ql, qr))
    rows = gm.rotor4d_rows(ql, qr)
    for i in range(4):
        for j in range(4):
            np.testing.assert_allclose(np.asarray(rows[i][j]), ref[:, i, j],
                                       atol=1e-6, err_msg=f"[{i},{j}]")


def test_condition_cov4d_columnar(rng):
    p = 64
    ql, qr = _q(rng, p), _q(rng, p)
    sc = jnp.asarray(np.exp(rng.normal(0, 0.4, (p, 4))), jnp.float32)
    t = jnp.asarray(rng.random(p), jnp.float32)
    cov4 = gm.build_cov4d(sc, ql, qr)
    c_ref, d_ref, m_ref, ct_ref = gm.condition_cov4d(cov4, t, 0.37, 0.02)
    c, d, m, ct = gm.condition_cov4d_columnar(sc, ql, qr, t, 0.37, 0.02)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ct), np.asarray(ct_ref), atol=1e-6)


def test_cov3d_columnar(rng):
    p = 64
    q = _q(rng, p)
    sc = jnp.asarray(np.exp(rng.normal(0, 0.4, (p, 3))), jnp.float32)
    np.testing.assert_allclose(np.asarray(gm.cov3d_columnar(sc, q)),
                               np.asarray(gm.build_cov3d(sc, q)), atol=2e-6)


def test_ewa_and_project_columnar(rng):
    scene = random_scene(rng, p=64)
    from utils import look_at_camera
    cam = look_at_camera().arrays()
    m = jnp.asarray(scene["means3d"])
    cov3 = gm.build_cov3d(jnp.asarray(scene["scales"]),
                          jnp.asarray(scene["rotations"]))
    a = gm.ewa_project(m, cov3, cam.viewmatrix, cam.focal, cam.tanfov)
    b = gm.ewa_project_columnar(m, cov3, cam.viewmatrix, cam.focal,
                                cam.tanfov)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-5,
                               atol=1e-5)
    wh = jnp.asarray([64.0, 64.0])
    xy1, ndc1 = gm.project_points(m, cam.projmatrix, wh)
    xy2, ndc2 = gm.project_points_columnar(m, cam.projmatrix, wh)
    np.testing.assert_allclose(np.asarray(xy2), np.asarray(xy1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ndc2), np.asarray(ndc1), atol=1e-5)

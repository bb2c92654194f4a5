"""Environment-map module vs torch oracles: grid_sample parity for the
bilinear lookup, full reference-formula sky compositing, and env-Adam
gradient flow through the train step (reference
`gaussian_renderer/__init__.py:165-178`, `train.py:71-77,250-252`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from fourdgs_tpu.models import envmap as em  # noqa: E402


def test_bilinear_matches_grid_sample(rng):
    tex = rng.random((12, 12, 3)).astype(np.float32)
    uv = (rng.random((7, 9, 2)) * 2.2 - 1.1).astype(np.float32)  # incl. OOB
    ours = np.asarray(em._bilinear_sample(jnp.asarray(tex), jnp.asarray(uv)))
    want = F.grid_sample(
        torch.from_numpy(tex).permute(2, 0, 1)[None],   # (1, 3, H, W)
        torch.from_numpy(uv)[None],                     # (1, h, w, 2)
        mode="bilinear", padding_mode="zeros",
        align_corners=False)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-6)


def test_composite_sky_matches_reference_formula(rng):
    """Full path (rays -> sphere hit -> equirect -> grid_sample ->
    composite) against a torch re-derivation of the reference code."""
    h, w, res = 10, 14, 16
    tex = rng.random((res, res, 3)).astype(np.float32)
    color = rng.random((h, w, 3)).astype(np.float32)
    alpha = rng.random((h, w)).astype(np.float32)
    # A camera slightly off-origin with a rotation.
    theta = 0.4
    rot = np.array([[np.cos(theta), 0, np.sin(theta)],
                    [0, 1, 0],
                    [-np.sin(theta), 0, np.cos(theta)]], np.float32)
    trans = np.array([0.3, -0.2, 1.0], np.float32)
    view = np.eye(4, dtype=np.float32)
    view[:3, :3] = rot
    view[:3, 3] = trans
    intr = np.array([20.0, 22.0, w / 2, h / 2], np.float32)

    out = np.asarray(em.composite_sky(
        jnp.asarray(color), jnp.asarray(alpha), jnp.asarray(tex),
        jnp.asarray(view), jnp.asarray(intr)))

    # Torch oracle (reference formulas, unit ray dirs).
    i = np.arange(w, dtype=np.float32)[None, :] + 0.5
    j = np.arange(h, dtype=np.float32)[:, None] + 0.5
    pts_view = np.stack([np.broadcast_to((i - intr[2]) / intr[0], (h, w)),
                         np.broadcast_to((j - intr[3]) / intr[1], (h, w)),
                         np.ones((h, w), np.float32)], -1)
    c2w_r = rot.T
    campos = -c2w_r @ trans
    dirs = pts_view @ c2w_r.T
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    o, d = torch.from_numpy(campos), torch.from_numpy(dirs)
    R = 60.0
    od = (o * d).sum(-1)
    delta = od ** 2 - ((o * o).sum() - R * R)
    t_hit = -od + torch.sqrt(delta)
    hit = o + d * t_hit[..., None]
    tu = torch.atan2(hit[..., 1:2], hit[..., 0:1]) / (2 * torch.pi) + 0.5
    tv = torch.acos(hit[..., 2:3] / R) / torch.pi
    texcoord = (torch.cat([tu, tv], dim=-1) * 2 - 1).float()
    bg = F.grid_sample(torch.from_numpy(tex).permute(2, 0, 1)[None],
                       texcoord[None], align_corners=False)[0]
    want = (torch.from_numpy(color)
            + (1 - torch.from_numpy(alpha))[..., None]
            * bg.permute(1, 2, 0)).numpy()
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_env_adam_gradients_flow(rng):
    """sample_sky is differentiable and an Adam-style update on the
    texture reduces a sky-matching loss (the reference's separate env
    optimizer, train.py:71-77)."""
    res = 8
    tex = jnp.asarray(rng.random((res, res, 3)), jnp.float32)
    view = jnp.eye(4, dtype=jnp.float32)
    intr = jnp.asarray([12.0, 12.0, 8.0, 8.0], jnp.float32)
    target = jnp.asarray(rng.random((16, 16, 3)), jnp.float32)
    alpha = jnp.zeros((16, 16), jnp.float32)   # pure sky
    color = jnp.zeros((16, 16, 3), jnp.float32)

    def loss(t):
        out = em.composite_sky(color, alpha, t, view, intr)
        return jnp.mean((out - target) ** 2)

    l0 = float(loss(tex))
    g = jax.grad(loss)(tex)
    assert float(jnp.abs(g).max()) > 0
    l1 = float(loss(tex - 0.5 * g / (jnp.abs(g).max() + 1e-9)))
    assert l1 < l0

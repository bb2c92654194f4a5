"""Hand-rolled Adam vs torch.optim.Adam(eps=1e-15) over multiple steps
and per-group learning rates (the reference's per-group optimizer,
`gaussian_model.py:331-357`). Bitwise-level agreement here is what makes
checkpoint resume and densify Adam-surgery semantics meaningful."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fourdgs_tpu.models.gaussians import (AdamState, GaussianParams,  # noqa: E402
                                          adam_update)

SHAPES = {"xyz": (12, 3), "t": (12, 1), "scaling": (12, 3),
          "scaling_t": (12, 1), "rotation": (12, 4), "rotation_r": (12, 4),
          "f_dc": (12, 1, 3), "f_rest": (12, 15, 3), "opacity": (12, 1)}
LRS = {"xyz": 1.6e-4, "t": 1.6e-4, "scaling": 5e-3, "scaling_t": 5e-3,
       "rotation": 1e-3, "rotation_r": 1e-3, "f_dc": 2.5e-3,
       "f_rest": 2.5e-3 / 20, "opacity": 0.05}


def test_adam_matches_torch(rng):
    init = {k: rng.normal(0, 0.5, s).astype(np.float32)
            for k, s in SHAPES.items()}
    grads_seq = [{k: rng.normal(0, 0.1, s).astype(np.float32)
                  for k, s in SHAPES.items()} for _ in range(7)]

    # torch side: one param group per tensor, reference eps.
    tparams = {k: torch.nn.Parameter(torch.from_numpy(init[k].copy()))
               for k in SHAPES}
    opt = torch.optim.Adam(
        [{"params": [tparams[k]], "lr": LRS[k], "name": k}
         for k in SHAPES], lr=0.0, eps=1e-15)
    for g in grads_seq:
        opt.zero_grad()
        for k in SHAPES:
            tparams[k].grad = torch.from_numpy(g[k].copy())
        opt.step()

    # ours
    params = GaussianParams(**{k: jnp.asarray(init[k]) for k in SHAPES})
    zeros = GaussianParams(*[jnp.zeros_like(x) for x in params])
    state = AdamState(zeros, GaussianParams(
        *[jnp.zeros_like(x) for x in params]), jnp.zeros((), jnp.int32))
    lrs = GaussianParams(**{k: jnp.asarray(LRS[k], jnp.float32)
                            for k in SHAPES})
    for g in grads_seq:
        gp = GaussianParams(**{k: jnp.asarray(g[k]) for k in SHAPES})
        params, state = adam_update(params, gp, state, lrs)

    assert int(state.count) == len(grads_seq)
    for k in SHAPES:
        # f32 bias-correction pows under jit vs torch's python doubles
        # leave ~1e-7 relative drift per step (documented in adam_update);
        # everything else matches torch's op order exactly.
        np.testing.assert_allclose(
            np.asarray(getattr(params, k)),
            tparams[k].detach().numpy(), rtol=1e-4, atol=5e-6,
            err_msg=f"adam mismatch for group {k}")
        # Moments are bias-correction-free and must match tightly (this
        # is what densify surgery and .pth import transplant).
        st = opt.state[tparams[k]]
        np.testing.assert_allclose(
            np.asarray(getattr(state.mu, k)), st["exp_avg"].numpy(),
            rtol=2e-6, atol=1e-8, err_msg=f"mu {k}")
        np.testing.assert_allclose(
            np.asarray(getattr(state.nu, k)), st["exp_avg_sq"].numpy(),
            rtol=2e-6, atol=1e-9, err_msg=f"nu {k}")

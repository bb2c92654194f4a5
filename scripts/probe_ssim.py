#!/usr/bin/env python
"""SSIM loss fwd+bwd: HIGHEST-precision band matmuls vs a 3-pass
bf16-split (drops only the lo*lo term, ~2^-17 relative)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.utils import losses

ITERS = 32
REPS = 3
H = W = 800


SALT = (time.time_ns() % 997) * 1e-7  # the tunnel result-cache is
# persistent ACROSS PROCESSES, keyed on (program, inputs) — identical
# historical calls are replayed in ~0 ms; salt every timing input.


def timed(name, fn, *args):
    out = jax.block_until_ready(fn(jnp.float32(SALT), *args))
    best = float("inf")
    for r in range(REPS):
        eps = jnp.float32((r + 1) * 1e-3 + SALT)
        t0 = time.perf_counter()
        out = fn(eps, *args)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])  # fetch: block_until_ready
        # alone can return before device completion on this plugin
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    print(f"{name:36s} {best:8.2f} ms/iter")
    return out


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    tgt = jnp.asarray(rng.random((H, W, 3)), jnp.float32)

    def loss_hi(im, tg):
        l, _, _ = losses.photometric_loss(im, tg)
        return l

    def make_run(loss):
        # O(1) rep-distinct carry: the tunnel replays calls (0.00 ms)
        # when the consumed output is bit-identical across reps.
        @jax.jit
        def run(eps, im, tg):
            def body(c, i):
                l, g = jax.value_and_grad(loss)(
                    im + (i.astype(jnp.float32) * 1e-4 + eps), tg)
                return c + l + jnp.sum(g), 0
            return jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        return run

    timed("photometric HIGHEST (cur)", make_run(loss_hi), img, tgt)

    # 3-pass split variant
    def blur3(im, window_size=11, sigma=1.5):
        h, w = im.shape[1], im.shape[2]
        bh = jnp.asarray(losses._band_matrix(h, window_size, sigma))
        bw = jnp.asarray(losses._band_matrix(w, window_size, sigma))

        def mm(b, x, sub):  # contract b's 2nd axis with x's `sub` axis
            bh_ = b.astype(jnp.bfloat16)
            bl_ = (b - bh_.astype(jnp.float32)).astype(jnp.bfloat16)
            xh = x.astype(jnp.bfloat16)
            xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            dn = (((1,), (sub,)), ((), ()))
            kw = dict(preferred_element_type=jnp.float32)
            out = jax.lax.dot_general(bh_, xh, dn, **kw)
            out += jax.lax.dot_general(bh_, xl, dn, **kw)
            out += jax.lax.dot_general(bl_, xh, dn, **kw)
            return out

        # (H,H) x (B,H,W,C) over axis 1 -> (H,B,W,C) -> transpose back
        o = jnp.moveaxis(mm(bh, im, 1), 0, 1)
        o = jnp.moveaxis(mm(bw, o, 2), 0, 2)
        return o

    def ssim3(img1, img2, window_size=11, sigma=1.5):
        img1, img2 = img1[None], img2[None]
        mu1, mu2 = blur3(img1), blur3(img2)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = blur3(img1 * img1) - mu1_sq
        s2 = blur3(img2 * img2) - mu2_sq
        s12 = blur3(img1 * img2) - mu1_mu2
        cs = (2 * s12 + losses._C2) / (s1 + s2 + losses._C2)
        m = ((2 * mu1_mu2 + losses._C1) / (mu1_sq + mu2_sq + losses._C1)) * cs
        return jnp.mean(m)

    def loss3(im, tg):
        ll1 = losses.l1_loss(im, tg)
        return 0.8 * ll1 + 0.2 * (1.0 - ssim3(im, tg))

    timed("photometric 3-pass split", make_run(loss3), img, tgt)

    # accuracy
    l_hi, g_hi = jax.value_and_grad(loss_hi)(img, tgt)
    l_3, g_3 = jax.value_and_grad(loss3)(img, tgt)
    gs = float(jnp.max(jnp.abs(g_hi)))
    print(f"loss rel err {abs(float(l_hi)-float(l_3))/abs(float(l_hi)):.2e}"
          f"  grad max rel {float(jnp.max(jnp.abs(g_hi-g_3)))/gs:.2e}")


if __name__ == "__main__":
    main()

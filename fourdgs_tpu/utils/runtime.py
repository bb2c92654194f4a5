"""Runtime/backend helpers."""

import os


def respect_platform_env() -> None:
    """Make `JAX_PLATFORMS=cpu` actually stick under the axon TPU plugin.

    The plugin's backend-registration wrapper initializes every registered
    platform regardless of the JAX_PLATFORMS env var (standard JAX honors
    it), so a CPU-only run still probes the TPU tunnel — and hangs when
    the tunnel is down. Mirroring the env var into the `jax_platforms`
    config knob (which the wrapper does honor) restores the documented
    semantics. No-op when the var is unset."""
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        import jax

        jax.config.update("jax_platforms", plats)

"""Runtime helpers: backend fallback for CLI entry points."""


def ensure_jax_backend():
    """If the pinned JAX_PLATFORMS backend is unavailable (e.g. a TPU
    tunnel env var without the tunnel), fall back to auto-selection."""
    import jax
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")
        jax.devices()

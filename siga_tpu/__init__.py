"""siga-tpu: a TPU-native string-graph assembly framework."""
import os

# Persistent XLA compilation cache: fresh CLI processes would otherwise pay
# 20-40s per kernel recompile (remote compile over the accelerator tunnel).
try:  # pragma: no cover - depends on jax availability/version
    import jax

    # The container's sitecustomize registers the TPU backend before user
    # code runs, so the JAX_PLATFORMS env var is already baked; the live
    # config still works because the platform client is created lazily.
    if os.environ.get("SIGA_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SIGA_PLATFORM"])

    _cache_dir = os.environ.get(
        "SIGA_JAX_CACHE", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    )
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:  # noqa: BLE001
    pass

__version__ = "0.1.0"

"""Platform selection helper.

The axon TPU plugin registers itself at interpreter start and overrides
``jax_platforms`` — plain ``JAX_PLATFORMS=cpu`` in the environment is
ignored. Every CLI calls ``sync_platform_from_env()`` so the documented env
var works everywhere (tests, CPU smoke runs, CI).
"""
import os


def sync_platform_from_env():
    import jax
    want = os.environ.get("JAX_PLATFORMS")
    if want and jax.config.jax_platforms != want:
        jax.config.update("jax_platforms", want)
    # Persistent compilation cache: cold remote compiles of the render graph
    # can take ~10 min through the compile service; cache hits take seconds.
    if jax.config.jax_compilation_cache_dir is None:
        cache = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "enarf_jax_cache"))
        try:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        except Exception:
            pass  # caching is an optimization, never a requirement

"""Platform selection helper.

The axon TPU plugin registers itself at interpreter start and overrides
``jax_platforms`` — plain ``JAX_PLATFORMS=cpu`` in the environment is
ignored. Every CLI calls ``sync_platform_from_env()`` so the documented env
var works everywhere (tests, CPU smoke runs, CI).
"""
import os


def sync_platform_from_env():
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)

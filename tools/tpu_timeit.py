"""Timing harness that is safe on the remote-tunnel TPU runtime.

Three landmines this harness avoids (each burned a round of measurements):
  * ``block_until_ready`` does not reliably fence on the remote runtime, so
    timings must force a host fetch;
  * ``np.asarray(out)`` fetches the FULL array over the tunnel at ~10 MB/s —
    reduce every output to one scalar on device and fetch 4 bytes;
  * the runtime has a ~30 ms FIXED DISPATCH overhead per jitted call, so a
    single-call timing measures dispatch, not compute — amortize by running
    the op ``iters`` times inside one jit (chained through a checksum
    perturbation so XLA cannot CSE the iterations away).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def _checksum(out):
    leaves = jax.tree_util.tree_leaves(out)
    acc = jnp.float32(0)
    for leaf in leaves:
        acc = acc + jnp.sum(leaf.astype(jnp.float32))
    return acc


def scalarized(fn):
    """jit(fn) wrapped so it returns a single checksum scalar."""
    def wrapped(*args):
        return _checksum(fn(*args))
    return jax.jit(wrapped)


def timeit(fn, *args, reps=5, warmup=2, scalarize=True):
    """Mean seconds per call, hard-synced via scalar fetch.

    NOTE: includes the ~30 ms dispatch overhead — use ``timeit_amortized``
    for anything expected to be faster than ~100 ms.
    """
    from enarf_gan_tpu.utils.compile_retry import call_with_compile_retry
    f = scalarized(fn) if scalarize else jax.jit(fn)
    for _ in range(warmup):
        float(np.asarray(call_with_compile_retry(f, *args)))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(np.asarray(f(*args)))
    return (time.perf_counter() - t0) / reps


def timeit_amortized(fn, *args, iters=20, reps=3, warmup=1, perturb=None):
    """Mean seconds per op with dispatch overhead amortized over ``iters``.

    fn(*args) runs ``iters`` times inside one jit. To stop XLA from CSE-ing
    the loop body, each iteration perturbs the argument named by ``perturb``
    (index into args; default 0) by a checksum-dependent epsilon that is
    numerically negligible but data-dependent.

    Returns (seconds_per_op, dispatch_seconds) where dispatch is estimated
    from an iters=1 run of the same jit structure.
    """
    if perturb is None:
        perturb = 0

    def run(n, *a):
        def body(carry, _):
            acc = carry
            aa = list(a)
            x = aa[perturb]
            # data-dependent zero: for ints, `acc & 0` is PROVABLY zero and
            # XLA hoists the op out of the scan (measured a "gather" at an
            # impossible 8.4 TB/s, 2026-08-19) — isnan(acc) is value-zero
            # but not provably so, which defeats CSE for both dtypes
            eps = (acc * 1e-30).astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) \
                else jnp.isnan(acc).astype(x.dtype)
            aa[perturb] = x + eps
            out = fn(*aa)
            return acc + _checksum(out), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    f_full = jax.jit(lambda *a: run(iters, *a))
    f_one = jax.jit(lambda *a: run(1, *a))

    from enarf_gan_tpu.utils.compile_retry import call_with_compile_retry
    for _ in range(warmup):
        float(np.asarray(call_with_compile_retry(f_full, *args)))
        float(np.asarray(call_with_compile_retry(f_one, *args)))

    def measure(f):
        t0 = time.perf_counter()
        for _ in range(reps):
            float(np.asarray(f(*args)))
        return (time.perf_counter() - t0) / reps

    t_full = measure(f_full)
    t_one = measure(f_one)
    per_op = (t_full - t_one) / (iters - 1)
    return per_op, t_one

"""Take-rate vs row width/dtype sweep — picks the sampler's row formats.

Context (bench_unitable.py): bf16-128 rows gather at 382 M rows/s
(98 GB/s), bf16-4 at 226 M/s, f32-66 at 68 M/s (!), (1,8,128) tiles at
113 M tiles/s (232 GB/s). This sweep fills in the curve and answers:
  * widest row that still gathers at ~380 M rows/s (mask-row design),
  * whether f32 rows are categorically slower (f32-64/128),
  * whether two takes in one jit overlap or serialize.
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")
from tpu_timeit import timeit_amortized  # noqa: E402


def main():
    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    n_idx = 2 ** 21
    R = 200_000

    for lanes, dtype, dname in ((8, jnp.bfloat16, "bf16"),
                                (16, jnp.bfloat16, "bf16"),
                                (32, jnp.bfloat16, "bf16"),
                                (64, jnp.bfloat16, "bf16"),
                                (256, jnp.bfloat16, "bf16"),
                                (64, jnp.float32, "f32"),
                                (128, jnp.float32, "f32")):
        table = jax.random.normal(key, (R, lanes), dtype)
        idx = jax.random.randint(key, (n_idx,), 0, R, jnp.int32)

        def run(t, ix):
            return jnp.take(t, ix, axis=0).astype(jnp.float32).sum()

        s, _ = timeit_amortized(run, table, idx, iters=8)
        gbs = n_idx * lanes * table.dtype.itemsize / s / 1e9
        print(f"{dname}-{lanes:3d} lanes: {n_idx/s/1e6:7.1f} Mrows/s "
              f"({gbs:6.1f} GB/s)")
        sys.stdout.flush()

    # overlap probe: feat take + mask take in one jit vs summed singles
    feat = jax.random.normal(key, (R, 128), jnp.bfloat16)
    mask = jax.random.normal(key, (R, 8), jnp.bfloat16)
    fi = jax.random.randint(key, (n_idx,), 0, R, jnp.int32)
    mi = jax.random.randint(jax.random.PRNGKey(1), (n_idx,), 0, R, jnp.int32)

    def both(f, m, a, b):
        return (jnp.take(f, a, axis=0).astype(jnp.float32).sum()
                + jnp.take(m, b, axis=0).astype(jnp.float32).sum())

    s, _ = timeit_amortized(both, feat, mask, fi, mi, iters=8)
    print(f"feat128+mask8 same jit: {s*1e3:7.2f} ms for 2x{n_idx/1e6:.1f}M rows")


if __name__ == "__main__":
    main()

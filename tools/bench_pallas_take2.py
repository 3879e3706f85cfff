"""Probe 2: Mosaic in-kernel gather with MATCHED shapes.

bench_pallas_take.py's row-gather failed with "Shape mismatch in input,
indices and output" — i.e. a gather primitive exists but wants
indices/output shaped like the input. Try the matched forms:

  a) take_along_axis axis=0, idx (R, L) == table (R, L)  — full-table row
     shuffle (gather with repeats), then the caller slices what it needs.
  b) same but through jnp.take with idx (R,) — row permutation size R.
  c) sublane gather within (G, 8, L) tiles: idx (G, 8, L) values in [0, 8).
  d) matched-shape lane gather: take_along_axis axis=-1 idx (S, L) in [0, L).

Run: python tools/bench_pallas_take2.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/tools")
from tpu_timeit import timeit_amortized  # noqa: E402


def run_case(name, kern, inputs, out_shape, ref, rate_rows):
    try:
        def f():
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(*out_shape),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                          for _ in inputs],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*inputs)
        out = jax.jit(f)()
        if not np.allclose(np.asarray(out, np.float32), ref, rtol=2e-2,
                           atol=1e-2):
            print(f"{name:30s}: WRONG RESULT")
            return
        s, _ = timeit_amortized(lambda _x: f(), jnp.zeros(()), iters=30)
        print(f"{name:30s}: OK  {rate_rows/s/1e6:9.1f} Mrows/s")
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:150]
        print(f"{name:30s}: FAIL {type(e).__name__}: {msg}")
    sys.stdout.flush()


def main():
    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    R, L = 4096, 128
    table = jax.random.normal(key, (R, L), jnp.bfloat16)
    idxr = jax.random.randint(jax.random.PRNGKey(1), (R,), 0, R, jnp.int32)
    idx2 = jnp.broadcast_to(idxr[:, None], (R, L))

    ref_rows = np.asarray(jnp.take(table, idxr, axis=0), np.float32)

    def kern_a(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    run_case("a) taa axis=0 idx(R,L)", kern_a, (idx2, table),
             ((R, L), jnp.bfloat16), ref_rows, R)

    def kern_b(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:].reshape(-1), axis=0)

    run_case("b) take idx(R,)", kern_b, (idxr.reshape(R // 128, 128), table),
             ((R, L), jnp.bfloat16), ref_rows, R)

    G = 512
    tiles = jax.random.normal(key, (G, 8, L), jnp.bfloat16)
    sub = jax.random.randint(jax.random.PRNGKey(2), (G, 8, L), 0, 8,
                             jnp.int32)
    ref_sub = np.take_along_axis(np.asarray(tiles, np.float32),
                                 np.asarray(sub), axis=1)

    def kern_c(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    run_case("c) taa axis=1 (G,8,L)", kern_c, (sub, tiles),
             ((G, 8, L), jnp.bfloat16), ref_sub, G * 8)

    S = 4096
    mat = jax.random.normal(key, (S, L), jnp.bfloat16)
    lidx = jax.random.randint(jax.random.PRNGKey(3), (S, L), 0, L, jnp.int32)
    ref_lane = np.take_along_axis(np.asarray(mat, np.float32),
                                  np.asarray(lidx), axis=-1)

    def kern_d(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=-1)

    run_case("d) taa axis=-1 (S,L)", kern_d, (lidx, mat),
             ((S, L), jnp.bfloat16), ref_lane, S)

    # e) the money shot: big-table row gather via repeated matched-shape
    # shuffles — 16 output tiles gathered from a 64-tile table by walking
    # the table in matched-shape windows and masking. Only probe if (a)
    # works; rate question answered by (a) anyway.


if __name__ == "__main__":
    main()

"""Stage breakdown of the tilewin frame on the real chip.

Times, at bench shapes (128² frame, Nc48/Nf64, 256² planes, 24 bones,
Mp=4, P=4), each stage of the patch-window path in isolation:

  pack      pack_tilewin of the generated planes
  gather    window-row jnp.take alone (frows precomputed)
  sample    sample_tilewin end to end (gather + select + combine)
  dc        density_color_tiled (adds transforms, slot select, heads)
  frame     full render_entire_img_tiled frame

All timings scalar-fetch synced (PERF.md measurement trap). Run with no
other python process. Env: TS (plane size), NP (patches/chunk), S
(samples), REPS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(x):
    return float(np.asarray(x).ravel()[0])


def timeit(name, fn, reps):
    fn()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:10s} {dt:9.2f} ms")
    return dt


def main():
    from enarf_gan_tpu.utils.platform import sync_platform_from_env
    sync_platform_from_env()
    import jax
    import jax.numpy as jnp
    from enarf_gan_tpu.ops import tilewin

    TS = int(os.environ.get("TS", 256))
    NP = int(os.environ.get("NP", 256))      # patches per chunk (4096 rays)
    S = int(os.environ.get("S", 48))         # samples (coarse pass)
    REPS = int(os.environ.get("REPS", 10))
    F, K, MP, M_MEM = 32, 23, 4, 16
    B = 1

    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.normal(size=(B, (F + K) * 3, TS, TS))
                         .astype(np.float32))
    pos = jnp.asarray(np.clip(
        rng.uniform(-0.9, 0.9, (B, 3, MP, NP, 1, S))
        + rng.uniform(-1.5 / TS, 1.5 / TS, (B, 3, MP, NP, M_MEM, S)),
        -0.99, 0.99).astype(np.float32))
    slot_idx = jnp.asarray(rng.integers(0, K, (B, MP, NP, S))
                           .astype(np.int32))
    valid = jnp.asarray(rng.random((B, MP, NP, M_MEM, S)) > 0.2)

    tables = tilewin.pack_tilewin(planes, F, K)  # eager: keeps nb/F/K static
    # scalar-reduce the pack output on device: fetching the ~190 MB table
    # over the axon tunnel stalls (and has crashed) the TPU worker
    pack = jax.jit(lambda p: tilewin.pack_tilewin(p, F, K).feat
                   .astype(jnp.float32).sum())
    n_groups = B * 3 * MP * NP * S
    print(f"# {n_groups/1e6:.2f} M window groups/chunk, table "
          f"{tables.feat.size * 2 / 2**20:.0f}+"
          f"{tables.mask.size * 2 / 2**20:.0f} MB")

    timeit("pack", lambda: pack(planes), REPS)

    frows = jnp.asarray(rng.integers(0, tables.feat.shape[0],
                                     n_groups).astype(np.int32))
    gather = jax.jit(lambda t, r: jnp.take(t, r, axis=0).sum(
        dtype=jnp.float32))
    row_bytes = tables.feat.size * 2 // tables.feat.shape[0]
    dt = timeit("gather", lambda: gather(tables.feat, frows), REPS)
    print(f"#   -> {n_groups / dt / 1e3:.1f} Mwin/s, "
          f"{n_groups * row_bytes / dt / 1e6:.0f} GB/s "
          f"({row_bytes} B/row)")

    def _sample(feat, mask, p, i, v):
        t = tilewin.TilewinTables(feat, mask, tables.nb, F, K, TS)
        return tilewin.sample_tilewin(t, p, i, v)[0].sum()

    sample = jax.jit(_sample)
    timeit("sample", lambda: sample(tables.feat, tables.mask, pos, slot_idx,
                                    valid), REPS)
    print(f"# per-pass rays equivalent: {NP * M_MEM} rays x {S} samples")


if __name__ == "__main__":
    main()

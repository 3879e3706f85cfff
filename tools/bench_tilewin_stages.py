"""Stage breakdown of the tilewin frame on the real chip.

Times, at bench shapes (128² frame, Nc48/Nf64, 256² planes, 24 bones,
Mp=4, P=4), each stage of the patch-window path in isolation:

  pack      pack_tilewin of the generated planes
  gather    window-row jnp.take alone (frows precomputed)
  sample    sample_tilewin end to end (gather + select + combine)
  fused     sample_tilewin_fused (Pallas combine kernel)

AXON SAFETY: every stage runs as ONE jitted lax.scan over ITERS
iterations (tools/tpu_timeit.timeit_amortized) — a single dispatch,
hard-synced by a scalar host fetch. Queuing multiple big programs
unsynced CRASHES the remote TPU worker (reproduced 2026-08-18), and
per-call dispatch costs ~30 ms, so naive rep loops are both unsafe and
wrong. Env: TS (plane size), NP (patches/chunk), S (samples), ITERS.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from enarf_gan_tpu.utils.platform import sync_platform_from_env
    sync_platform_from_env()
    import jax
    import jax.numpy as jnp
    from enarf_gan_tpu.ops import tilewin
    from tools.tpu_timeit import timeit_amortized

    TS = int(os.environ.get("TS", 256))
    NP = int(os.environ.get("NP", 256))      # patches per chunk (4096 rays)
    S = int(os.environ.get("S", 48))         # samples (coarse pass)
    ITERS = int(os.environ.get("ITERS", 8))
    F, K, MP, M_MEM = 32, 23, 4, 16
    B = 1

    def report(name, fn, *args, perturb=0):
        try:
            per_op, dispatch = timeit_amortized(fn, *args, iters=ITERS,
                                                perturb=perturb)
            print(f"{name:10s} {per_op * 1e3:9.2f} ms   "
                  f"(dispatch {dispatch * 1e3:.0f} ms)", flush=True)
            return per_op * 1e3
        except Exception as e:
            print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            return None

    def put(x):
        """Device transfer + hard sync (unsynced big transfers overlapping
        eager/jit work crash the axon worker — see PERF.md)."""
        a = jnp.asarray(x)
        np.asarray(a.ravel()[:1])
        return a

    rng = np.random.default_rng(0)
    planes = put(rng.normal(size=(B, (F + K) * 3, TS, TS))
                 .astype(np.float32))
    pos = put(np.clip(
        rng.uniform(-0.9, 0.9, (B, 3, MP, NP, 1, S))
        + rng.uniform(-1.5 / TS, 1.5 / TS, (B, 3, MP, NP, M_MEM, S)),
        -0.99, 0.99).astype(np.float32))
    slot_idx = put(rng.integers(0, K, (B, MP, NP, S)).astype(np.int32))
    valid = put(rng.random((B, MP, NP, M_MEM, S)) > 0.2)

    # EAGER pack + immediate hard sync. Axon-fragility notes (2026-08-19):
    # a jit program returning the full ~325 MB tables crashes the worker
    # (3x reproduced), eager pack left unsynced against a jit launch also
    # crashes it; eager pack followed by a prompt scalar sync is the one
    # pattern that reliably works.
    tables = tilewin.pack_tilewin(planes, F, K)
    float(np.asarray(tables.feat.astype(jnp.float32).sum()))
    float(np.asarray(tables.mask.astype(jnp.float32).sum()))
    n_groups = B * 3 * MP * NP * S
    print(f"# {n_groups/1e6:.2f} M window groups/chunk, table "
          f"{tables.feat.size * 2 / 2**20:.0f}+"
          f"{tables.mask.size * 2 / 2**20:.0f} MB", flush=True)

    # Jitted+scanned pack of the ~325 MB tables crashes the axon worker
    # (reproduced 2026-08-19, "TPU worker process crashed") — opt-in only.
    if os.environ.get("BENCH_PACK") == "1":
        report("pack", lambda p: tilewin.pack_tilewin(p, F, K).feat, planes)

    frows = jnp.asarray(rng.integers(0, tables.feat.shape[0],
                                     n_groups).astype(np.int32))
    row_bytes = tables.feat.size * 2 // tables.feat.shape[0]
    dt = report("gather", lambda t, r: jnp.take(t, r, axis=0),
                tables.feat, frows, perturb=1)
    if dt:
        print(f"#   -> {n_groups / dt / 1e3:.1f} Mwin/s, "
              f"{n_groups * row_bytes / dt / 1e6:.0f} GB/s "
              f"({row_bytes} B/row)", flush=True)

    def _sample(feat, mask, p, i, v):
        t = tilewin.TilewinTables(feat, mask, tables.nb, F, K, TS)
        return tilewin.sample_tilewin(t, p, i, v)[0]

    report("sample", _sample, tables.feat, tables.mask, pos, slot_idx,
           valid, perturb=2)

    def _fused(feat, mask, p, i, v):
        t = tilewin.TilewinTables(feat, mask, tables.nb, F, K, TS)
        return tilewin.sample_tilewin_fused(t, p, i, v)[0]

    report("fused", _fused, tables.feat, tables.mask, pos, slot_idx,
           valid, perturb=2)
    print(f"# per-pass rays equivalent: {NP * M_MEM} rays x {S} samples")


if __name__ == "__main__":
    main()

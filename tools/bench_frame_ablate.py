"""Full-frame stage decomposition of the tilewin bench renderer (on chip).

Times the EXACT bench.py workload (128² DSO frame, Nc48/Nf64, tilewin4,
corner-coarse) in three graph variants:

  full        the real frame (this is the headline number)
  nosampler   ENARF_ABLATE=sampler — window pack+gather+combine DCE'd
  noheads     ENARF_ABLATE=heads   — MLP heads DCE'd

frame = sampler + heads + rest, so the two ablations split the frame cost
directly (VERDICT r2 #1: "283 ms with a ~20 ms fetch plan means ~260 ms is
somewhere specific"). Scalar-reduced outputs + host fetch per rep (the
tunnel-safety rules from PERF.md). Env: BENCH_* knobs as in bench.py,
ABLATE_VARIANTS=csv subset, REPS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from enarf_gan_tpu.utils.platform import sync_platform_from_env
    sync_platform_from_env()
    import jax
    import jax.numpy as jnp
    import bench

    reps = int(os.environ.get("REPS", 3))
    render_size = int(os.environ.get("BENCH_RENDER_SIZE", 128))
    tp = int(os.environ.get("BENCH_TILED", 4))
    variants = [("full", None), ("nosampler", "sampler"),
                ("noheads", "heads")]
    sel = os.environ.get("ABLATE_VARIANTS")
    if sel:
        want = set(sel.split(","))
        variants = [v for v in variants if v[0] in want]

    results = {}
    for name, ablate in variants:
        # try/finally so ENARF_ABLATE can never leak past a variant — any
        # code run in-process afterwards would silently get stand-in
        # sampler/head outputs
        if ablate:
            os.environ["ENARF_ABLATE"] = ablate
        else:
            os.environ.pop("ENARF_ABLATE", None)
        try:
            t0 = time.perf_counter()
            renderer, (variables, pose_cam, inv_K, ft, bl) = bench._build(
                tp, render_size, int(os.environ.get("BENCH_RAY_CHUNK", 4096)),
                int(os.environ.get("BENCH_NC", 48)),
                int(os.environ.get("BENCH_NF", 64)))

            @jax.jit
            def render_scalar(v, key, pc, ik, t, b):
                out = renderer(v, key, pc, ik, t, b)
                return sum(jnp.sum(o.astype(jnp.float32))
                           for o in jax.tree_util.tree_leaves(out))

            def once(seed):
                return float(np.asarray(render_scalar(
                    variables, jax.random.PRNGKey(seed), pose_cam, inv_K,
                    ft, bl)))

            chk = once(0)
            print(f"{name:10s} compile+first {time.perf_counter()-t0:6.1f}s "
                  f"(checksum {chk:.4e})", flush=True)
            t0 = time.perf_counter()
            for i in range(reps):
                once(i + 1)
            dt = (time.perf_counter() - t0) / reps * 1e3
            results[name] = dt
            print(f"{name:10s} {dt:9.1f} ms/frame", flush=True)
        except Exception as e:
            print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
        finally:
            os.environ.pop("ENARF_ABLATE", None)
    if "full" in results:
        full = results["full"]
        for k, v in results.items():
            if k != "full":
                print(f"# stage {k.replace('no', ''):8s} "
                      f"{full - v:8.1f} ms ({(full - v) / full * 100:.0f}%)",
                      flush=True)


if __name__ == "__main__":
    main()

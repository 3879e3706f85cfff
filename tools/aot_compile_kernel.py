"""LOCAL chipless AOT compile of the tilewin fused kernel (no tunnel).

The axon remote compiler hides Mosaic errors behind an HTTP 500; this box
has libtpu locally, so `jax.experimental.topologies` can AOT-compile the
kernel against a v5e topology in ~90 s and print the REAL error (this is
how the TB=128 scoped-VMEM OOM — 115.64M > 100M — was found after two
rounds of opaque remote failures). Env: ENARF_TILEWIN_KERNEL=dot|vpu,
AOT_U (units, default TB), AOT_MP.
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from jax.experimental import topologies
    from enarf_gan_tpu.ops.tilewin_kernel import tilewin_combine, TB, NTEX, M

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2x1")
    sh = jax.sharding.SingleDeviceSharding(topo.devices[0])
    B, Mp, F = 1, int(os.environ.get("AOT_MP", 4)), 32
    U = int(os.environ.get("AOT_U", TB))
    bf, f32 = jnp.bfloat16, jnp.float32
    args = [jax.ShapeDtypeStruct((B, 3, Mp, U, 16, 128), bf),
            jax.ShapeDtypeStruct((B, 3, Mp, U, NTEX), bf)] + \
           [jax.ShapeDtypeStruct((B, 3, Mp, U, M), f32)] * 4 + \
           [jax.ShapeDtypeStruct((B, Mp, U, M), f32)]
    f = jax.jit(lambda *a: tilewin_combine(*a, F),
                in_shardings=sh, out_shardings=sh)
    t0 = time.time()
    try:
        exe = f.lower(*args).compile()
        stats = exe.memory_analysis()
        print(f"COMPILE OK in {time.time() - t0:.1f}s  "
              f"variant={os.environ.get('ENARF_TILEWIN_KERNEL', 'dot')} "
              f"U={U}", flush=True)
        if stats is not None:
            print(stats, flush=True)
    except Exception as e:
        print(f"FAIL after {time.time() - t0:.1f}s {type(e).__name__}:",
              flush=True)
        print(str(e)[:6000], flush=True)
        raise SystemExit(1)


if __name__ == "__main__":
    main()

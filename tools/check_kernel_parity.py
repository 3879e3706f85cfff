"""On-chip numeric parity of the fused tilewin combine vs the XLA math.

Runs tilewin_combine (Mosaic-compiled, mode from ENARF_TILEWIN_KERNEL)
on random one-or-few-block inputs on the REAL device and compares against
a pure-jnp reference computed from the same inputs (the same math the
interpret-mode test checks — but this time the MOSAIC binary is under
test; VERDICT r3 weak #5: an untested-on-chip kernel is not landable).

Env: U (units, default 2*TB), MODE (hat|bdiag|dot|vpu), SEED.
Prints per-output max|Δ|, nan counts, and PASS/FAIL.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def reference_combine(win, mwin, dt, ds, fy, fx, valid, F, clamp_mask=False):
    """Pure-numpy reference of the combine semantics.

    win: (B,3,Mp,U,16,128) bf16-as-f32 window tiles, texel-major rows
    (lane l = (t*8+s)*F + f packed into (16,128): sublane σ = w//4,
    t = σ//2, s = 4*(σ%2) + λ//F, f = λ%F).
    """
    from enarf_gan_tpu.ops.tilewin_kernel import WIN, NTEX, M
    B, three, Mp, U, SUB, LANE = win.shape
    w64 = np.zeros((B, 3, Mp, U, NTEX, F), np.float32)
    for sig in range(SUB):
        for lam in range(LANE):
            t = sig // 2
            s = 4 * (sig % 2) + lam // F
            f = lam % F
            w64[..., t * WIN + s, f] = win[..., sig, lam]
    feat = np.zeros((B, U, M, F), np.float32)
    candw = np.zeros((B, Mp, U, M), np.float32)
    ti = np.arange(WIN, dtype=np.float32)
    for g in range(Mp):
        S = np.zeros((B, U, M, F), np.float32)
        cw = np.ones((B, U, M), np.float32)
        for p in range(3):
            xt = dt[:, p, g] + fy[:, p, g]          # (B, U, M)
            xs = ds[:, p, g] + fx[:, p, g]
            wt = np.maximum(0.0, 1.0 - np.abs(ti - xt[..., None]))
            ws = np.maximum(0.0, 1.0 - np.abs(ti - xs[..., None]))
            w2d = wt[..., :, None] * ws[..., None, :]   # (B,U,M,8,8)
            w2d = w2d.reshape(B, U, M, NTEX)
            S += np.einsum("bumw,buwf->bumf", w2d,
                           w64[:, p, g].astype(np.float32))
            lg = np.einsum("bumw,buw->bum", w2d * valid[:, g][..., None],
                           mwin[:, p, g].astype(np.float32))
            if clamp_mask:
                lg = np.clip(lg, -2.0, 5.0)
            cw = cw * (1.0 / (1.0 + np.exp(-lg)))
        candw[:, g] = cw
        feat += S * (cw * valid[:, g])[..., None]
    return feat, candw


def main():
    from enarf_gan_tpu.utils.platform import sync_platform_from_env
    sync_platform_from_env()
    import jax
    import jax.numpy as jnp
    from enarf_gan_tpu.ops.tilewin_kernel import (tilewin_combine, TB, M,
                                                  NTEX)

    B, Mp, F = 1, 4, 32
    U = int(os.environ.get("U", 2 * TB))
    mode = os.environ.get("MODE", "hat")
    os.environ["ENARF_TILEWIN_KERNEL"] = mode
    rng = np.random.default_rng(int(os.environ.get("SEED", 0)))

    win = (rng.normal(size=(B, 3, Mp, U, 16, 128)).astype(np.float32)
           .astype(jnp.bfloat16))
    mwin = (rng.normal(size=(B, 3, Mp, U, NTEX)).astype(np.float32)
            .astype(jnp.bfloat16))
    dt = rng.integers(0, 7, (B, 3, Mp, U, M)).astype(np.float32)
    ds = rng.integers(0, 7, (B, 3, Mp, U, M)).astype(np.float32)
    fy = rng.random((B, 3, Mp, U, M)).astype(np.float32)
    fx = rng.random((B, 3, Mp, U, M)).astype(np.float32)
    valid = (rng.random((B, Mp, U, M)) > 0.2).astype(np.float32)

    # round-5 API: member-major clean coords (B,3,Mp,M,U) + (B,Mp,M,U)
    xt = (dt + fy).transpose(0, 1, 2, 4, 3)
    xs = (ds + fx).transpose(0, 1, 2, 4, 3)
    validT = valid.transpose(0, 1, 3, 2)

    feat, candw = jax.jit(
        lambda *a: tilewin_combine(*a, F=F, clamp_mask=False)
    )(jnp.asarray(win), jnp.asarray(mwin), jnp.asarray(xt), jnp.asarray(xs),
      jnp.asarray(validT))
    feat = np.asarray(feat)
    candw = np.asarray(candw).transpose(0, 1, 3, 2)   # back to (B,Mp,U,M)
    print(f"mode={mode} U={U}: feat nan={np.isnan(feat).sum()} "
          f"candw nan={np.isnan(candw).sum()}", flush=True)

    ref_feat, ref_candw = reference_combine(
        np.asarray(win, np.float32), np.asarray(mwin, np.float32),
        dt, ds, fy, fx, valid, F)
    df = np.abs(feat - ref_feat)
    dc = np.abs(candw - ref_candw)
    print(f"feat  max|Δ|={df.max():.3e} mean={df.mean():.3e} "
          f"(ref absmax {np.abs(ref_feat).max():.2f})")
    print(f"candw max|Δ|={dc.max():.3e} mean={dc.mean():.3e}")
    ok = (np.isnan(feat).sum() == 0 and np.isnan(candw).sum() == 0
          and df.max() < 0.35 and dc.max() < 0.05)
    print("PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()

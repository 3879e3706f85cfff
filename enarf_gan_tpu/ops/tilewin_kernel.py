"""Fused Pallas combine for the patch-window sampler (ops/tilewin.py) — v2.

Why: the XLA combine of sample_tilewin materializes multi-hundred-MB HBM
intermediates per chunk (the (.., 64, F) window view, the bf16 weight
tensor, per-slot member features) — measured 19.6 ms of a 22 ms sample on
a 147K-group chunk while the underlying FLOPs are ~1 ms. This kernel
streams the gathered window-row TILES through VMEM once and writes ONLY
the final per-point feature and the candidate weights.

v2 design (the v1 kernel's fully-unrolled 49-texel loop blew the remote
Mosaic compile past 9.5 min): with WIN=8 and F=32 a window row is exactly
one (16, 128) bf16 tile, texel-major (lane l = (t*8+s)*32 + f), which
factorizes in tile coordinates as

    sublane σ = w//4,  t = σ//2,  s = 4*(σ%2) + λ//32,  f = λ%32

so the separable bilinear weight wt(t)*ws(s) splits into a σ-weight
(per member, parity-masked) and a λ-weight (per member, quarter-wise):

    D_h[m, λ] = Σ_σ  wt_m(σ//2)·[σ%2==h] · win[σ, λ]   (batched MXU dot)
    S[m, λ]   = D_0·ws_m(λ//32) + D_1·ws_m(4 + λ//32)  (VPU)
    feat[m,f] = Σ_g cand_w·valid · (S_g @ R)           (R[λ,f]=[λ%32==f])

No in-kernel reshapes of the minor dims (unsupported on this toolchain,
tools/probe_mosaic_caps.py), no per-texel unrolling — the program is ~12
small blocks, so the Mosaic compile stays minutes-scale.

HBM traffic per chunk drops from ~1 GB of intermediates to the gathered
rows once + ~30 MB of outputs. Forward-only: callers wrap it in a
custom_vjp whose backward recomputes through the XLA path
(ops/tilewin.py::sample_tilewin), so training semantics are unchanged.

ENARF_TILEWIN_KERNEL selects the combine formulation (default "hat", the
v4 kernel — see _combine_kernel_hat): "bdiag" = v3 blockdiag MXU with
compare/select weights, "dot" = v2 per-unit batched dot (K=16 tiny
matmuls; loses to XLA), "vpu" = broadcast-multiply sublane reduction —
all kept for on-chip probes (tools/probe_tilewin_bdiag.py).

Reference equivalents: cuda_extension/TriplaneSampler_kernel.cu:37-92 (the
fused gather-interpolate-reduce the CUDA extension exists for),
libraries/triplane/sampling.py:54-127.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 8
NTEX = WIN * WIN
TB = 128           # (patch, sample) units per block. 128 is forced by the
                   # clean coordinate layout: the (…, M, U) coord arrays
                   # block as (1, 3, Mp, M, TB) and Mosaic requires the
                   # minor block dim be a multiple of 128. The round-2
                   # TB=128 VMEM overflow was the v1 UNROLLED kernel's
                   # stacked intermediates; the fori-loop hat kernel at
                   # TB=128 stays well under the 100 MB cap.
M = 16             # members per unit (4x4 patch)


def _combine_kernel(win_ref, mwin_ref, dt_ref, ds_ref, fy_ref, fx_ref,
                    valid_ref, feat_ref, candw_ref, *, F: int, Mp: int,
                    clamp_mask: bool, mode: str):
    """One block: TB units x (3 planes x Mp slots) window tiles -> features.

    Block shapes (leading 1 = batch):
      win:   (1, 3, Mp, TB, 16, 128) bf16 window-row tiles
      mwin:  (1, 3, Mp, TB, 64)  bf16 (texel w = t*8+s per lane)
      dt/ds/fy/fx: (1, 3, Mp, TB, M) f32 (window-local texel + fraction,
        dt/ds integral-valued in [0, WIN-2])
      valid: (1, Mp, TB, M) f32
      feat out:  (1, TB, M, F) f32
      candw out: (1, Mp, TB, M) f32
    """
    f32 = jnp.float32
    if mode == "bdiag":
        return _combine_kernel_bdiag(win_ref, mwin_ref, dt_ref, ds_ref,
                                     fy_ref, fx_ref, valid_ref, feat_ref,
                                     candw_ref, F=F, Mp=Mp,
                                     clamp_mask=clamp_mask)
    use_dot = mode != "vpu"
    # σ-axis texel row (t = σ//2) and parity, as f32 for direct compare
    sig = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 16), 2)
    tt = (sig // 2).astype(f32)
    par = (sig % 2).astype(f32)
    half = (jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 16), 1)
            // M).astype(f32)
    # λ-axis texel quarter q = λ//32
    q = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, 128), 2)
         // F).astype(f32)
    # mask-window texel split (lane w = t*8+s)
    wt_i = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, NTEX), 2)
            // WIN).astype(f32)
    ws_i = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, NTEX), 2)
            % WIN).astype(f32)
    # λ -> f reduction matrix R[λ, f] = [λ % F == f]
    lam = jax.lax.broadcasted_iota(jnp.int32, (128, F), 0)
    ff = jax.lax.broadcasted_iota(jnp.int32, (128, F), 1)
    R = (lam % F == ff).astype(f32)

    def sepw(iota_v, d, frac):
        d = d[..., None]
        frac = frac[..., None]
        return (jnp.where(iota_v == d, 1.0 - frac, 0.0)
                + jnp.where(iota_v == d + 1.0, frac, 0.0))

    feat_acc = jnp.zeros((TB, M, 128), f32)
    for g in range(Mp):
        valid = valid_ref[0, g]                     # (TB, M)
        Sg = jnp.zeros((TB, M, 128), f32)
        cw = jnp.ones((TB, M), f32)
        for p in range(3):
            win = win_ref[0, p, g]                  # (TB, 16, 128) bf16
            dt = dt_ref[0, p, g]                    # (TB, M)
            ds = ds_ref[0, p, g]
            fy = fy_ref[0, p, g]
            fx = fx_ref[0, p, g]
            # A: (TB, 2M, 16σ) — half h carries parity-h sublanes only;
            # validity zeroes the member's weights (matches the XLA
            # path's `w49 * vm`, so cand_w stays bit-comparable)
            dt2 = jnp.concatenate([dt, dt], axis=1)     # (TB, 2M)
            fy2 = jnp.concatenate([fy, fy], axis=1)
            v2 = jnp.concatenate([valid, valid], axis=1)
            A = sepw(tt, dt2, fy2) * (par == half) * v2[..., None]
            if use_dot:
                D = jax.lax.dot_general(
                    A.astype(jnp.bfloat16), win,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32)         # (TB, 2M, 128)
                D0 = jax.lax.slice_in_dim(D, 0, M, axis=1)
                D1 = jax.lax.slice_in_dim(D, M, 2 * M, axis=1)
            else:
                winf = win.astype(f32)
                # slice+None indexing lowers to an N-D gather Mosaic
                # rejects — slice_in_dim + explicit reshape instead
                A0 = jax.lax.slice_in_dim(A, 0, M, axis=1) \
                    .reshape(TB, M, 16, 1).astype(f32)
                A1 = jax.lax.slice_in_dim(A, M, 2 * M, axis=1) \
                    .reshape(TB, M, 16, 1).astype(f32)
                D0 = (A0 * winf[:, None]).sum(axis=2)   # (TB, M, 128)
                D1 = (A1 * winf[:, None]).sum(axis=2)
            B0 = sepw(q, ds, fx)                        # (TB, M, 128)
            B1 = sepw(q, ds - 4.0, fx)   # s' = 4 + q on the odd parity
            Sg = Sg + D0 * B0 + D1 * B1
            # mask logit over the 64-lane mask window
            wl = sepw(wt_i, dt, fy) * sepw(ws_i, ds, fx) \
                * valid[..., None]                      # (TB, M, 64)
            mw = mwin_ref[0, p, g].astype(f32)          # (TB, 64)
            lg = (wl * mw[:, None, :]).sum(axis=-1)     # (TB, M)
            if clamp_mask:
                lg = jnp.clip(lg, -2.0, 5.0)
            cw = cw * jax.nn.sigmoid(lg)
        candw_ref[0, g] = cw
        feat_acc = feat_acc + Sg * (cw * valid)[..., None]

    flat = feat_acc.reshape(TB * M, 128)
    feat_ref[0] = jax.lax.dot_general(
        flat, R, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(TB, M, F)


def _combine_kernel_hat(win_ref, mwin_ref, xt_ref, xs_ref, valid_ref,
                        feat_ref, candw_ref, *, F: int, Mp: int,
                        clamp_mask: bool):
    """v4 combine (default): blockdiag MXU σ-contraction + three VPU fixes.

    The v3 kernel was ~80% VPU weight construction (measured,
    tools/probe_tilewin_bdiag.py): compare/select sepw chains, (TB, M)
    coord arrays relayouted lane→sublane at every broadcast, (TB, M, 128)
    s-weight arrays, and a final λ→f reduction matmul. Here:

      * coords arrive as (…, M, 1) — sublane-resident, so broadcasting
        against lane iotas is a hardware lane-broadcast, no shuffle;
      * bilinear weights are arithmetic hats max(0, 1-|i-x|) (identical
        values to the compare/select form for x in [0, WIN-1)) — no
        selects;
      * the s-interpolation applies per-member scalar hats to 8 static
        32-lane slices of the σ-contraction output D, accumulating
        directly into the (TB, M, F) feature block — the (TB, M, 128)
        B-weight arrays and the final R-matmul disappear.
    """
    f32 = jnp.float32
    lam = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 128), 2)
    uu = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 128), 0) % 8
    hh = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 128), 1) // M
    sig = lam % 16
    umask = ((lam // 16 == uu) & (sig % 2 == hh)).astype(f32)
    tt = (sig // 2).astype(f32)
    wt_i = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, NTEX), 2)
            // WIN).astype(f32)
    ws_i = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, NTEX), 2)
            % WIN).astype(f32)
    # lane quarter q = λ // F ∈ {0..3} for the FULL-WIDTH s-weights: the
    # round-4 variant applied scalar s-hats to 32-lane slices of D, and
    # those (TB, M, 32) f32 ops waste 4x of every vreg — measured as 6.8 of
    # the kernel's 17.8 ms (tools/probe_hat_ablate.py). Full-width weights
    # + one R-matmul per block reclaim it.
    qq_i = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, 128), 2) // F) \
        .astype(f32)
    # λ → f reduction matrix R[λ, f] = [λ % F == f]
    lamr = jax.lax.broadcasted_iota(jnp.int32, (128, F), 0)
    ffr = jax.lax.broadcasted_iota(jnp.int32, (128, F), 1)
    Rmat = (lamr % F == ffr).astype(f32)

    def hat(iota_v, x):
        return jnp.maximum(0.0, 1.0 - jnp.abs(iota_v - x))

    # fori_loops (not python unrolling) keep the Mosaic program small: the
    # fully unrolled Mp*3 body exceeds the remote-compile helper's MLIR
    # size threshold (~45 KB routes to a broken chipless AOT subprocess,
    # tools/probe_kernel_variants.py)
    def plane_body(p, carry, g):
        Sg, cw = carry
        win = win_ref[0, p, g]              # (TB, 16, 128) bf16
        # coords ship CLEAN ((…, M, U) — U-minor, zero HBM padding; the
        # round-4 (…, M, 1) layout cost ~2.8 GB/chunk of 128x-padded
        # coordinate traffic) and relayout here: lane→sublane swap +
        # trailing-unit expand, both probe-verified and ~free
        # (tools/probe_mosaic_coord_ops.py, relay probe 0.05 µs)
        xt = jnp.swapaxes(xt_ref[0, p, g], 0, 1)[:, :, None]  # (TB, M, 1)
        xs = jnp.swapaxes(xs_ref[0, p, g], 0, 1)[:, :, None]
        valid = jnp.swapaxes(valid_ref[0, g], 0, 1)[:, :, None]
        xt2 = jnp.concatenate([xt, xt], axis=1)   # (TB, 2M, 1)
        A4 = hat(tt, xt2) * umask
        Ab = A4.astype(jnp.bfloat16).reshape(TB // 8, 8 * 2 * M, 128)
        Wb = win.reshape(TB // 8, 8 * 16, 128)
        D = jax.lax.dot_general(
            Ab, Wb, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)
        D = D.reshape(TB, 2 * M, 128)
        D0 = jax.lax.slice_in_dim(D, 0, M, axis=1)
        D1 = jax.lax.slice_in_dim(D, M, 2 * M, axis=1)
        # full-width s-weights: B0[λ] = hat(q(λ), xs) (= (1-fx) at q==ds,
        # fx at q==ds+1), B1 the parity-1 half (s = 4 + q)
        B0 = hat(qq_i, xs)                  # (TB, M, 128)
        B1 = hat(qq_i + 4.0, xs)
        Sg = Sg + D0 * B0 + D1 * B1
        wl = hat(wt_i, xt) * hat(ws_i, xs) * valid  # (TB, M, 64)
        mw = mwin_ref[0, p, g].astype(f32)          # (TB, 64)
        lg = (wl * mw[:, None, :]).sum(axis=-1, keepdims=True)
        if clamp_mask:
            lg = jnp.clip(lg, -2.0, 5.0)
        return Sg, cw * jax.nn.sigmoid(lg)

    def g_body(g, feat_acc):
        Sg0 = jnp.zeros((TB, M, 128), f32)
        cw0 = jnp.ones((TB, M, 1), f32)
        Sg, cw = jax.lax.fori_loop(
            0, 3, lambda p, c: plane_body(p, c, g), (Sg0, cw0))
        # candw also ships (M, U)-clean (the round-4 (B,Mp,U,M,1) output
        # paid the same 128x write padding the coords did)
        candw_ref[0, g] = jnp.swapaxes(cw[:, :, 0], 0, 1)
        valid = jnp.swapaxes(valid_ref[0, g], 0, 1)[:, :, None]
        return feat_acc + Sg * (cw * valid)

    feat_acc = jax.lax.fori_loop(0, Mp, g_body,
                                 jnp.zeros((TB, M, 128), f32))
    # collapse the 4 λ-quarters onto f: one (f32) MXU matmul per block
    flat = feat_acc.reshape(TB * M, 128)
    feat_ref[0] = jax.lax.dot_general(
        flat, Rmat, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(TB, M, F)


def _hat_combine_call(win_rows, mask_rows, xt, xs, valid, F: int,
                      clamp_mask: bool, interpret: bool):
    """pallas_call wrapper for the hat kernel — CLEAN coordinate layouts.

    xt, xs: (B, 3, Mp, M, U) f32; valid: (B, Mp, M, U) f32 — all U-minor
    (zero HBM tile padding); the kernel relayouts per block. Outputs:
    feat (B, U, M, F) f32, cand_w (B, Mp, M, U) f32.
    """
    B, three, Mp, U, SUBR, LANEW = win_rows.shape
    grid = (B, U // TB)

    def im6(b, i):
        return (b, 0, 0, i, 0, 0)

    spec_c = pl.BlockSpec((1, 3, Mp, M, TB), lambda b, i: (b, 0, 0, 0, i),
                          memory_space=pltpu.VMEM)
    kern = functools.partial(_combine_kernel_hat, F=F, Mp=Mp,
                             clamp_mask=clamp_mask)
    feat, cand_w = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((1, 3, Mp, TB, SUBR, LANEW), im6,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 3, Mp, TB, NTEX),
                               lambda b, i: (b, 0, 0, i, 0),
                               memory_space=pltpu.VMEM),
                  spec_c, spec_c,
                  pl.BlockSpec((1, Mp, M, TB),
                               lambda b, i: (b, 0, 0, i),
                               memory_space=pltpu.VMEM)],
        # feat's U axis is dim 1 (block index i there); candw's U axis is
        # dim 3. Distinct index maps — reusing one across both outputs put
        # every feat block after the first out of bounds (clamped → block-0
        # collisions on chip, NaN holes in interpret mode).
        out_specs=[pl.BlockSpec((1, TB, M, F), lambda b, i: (b, i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, Mp, M, TB),
                                lambda b, i: (b, 0, 0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, U, M, F), jnp.float32),
                   jax.ShapeDtypeStruct((B, Mp, M, U), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(win_rows, mask_rows, xt, xs, valid)
    return feat, cand_w


def _combine_kernel_bdiag(win_ref, mwin_ref, dt_ref, ds_ref, fy_ref, fx_ref,
                          valid_ref, feat_ref, candw_ref, *, F: int, Mp: int,
                          clamp_mask: bool):
    """Block-diagonal MXU formulation of the σ-contraction (v3, default).

    The v2 "dot" mode lowers its per-(plane,slot) batched dot to TB
    separate (2M,16)@(16,128) matmuls — K=16 keeps the MXU ~0.5% utilized
    and the batch loop dominates the kernel (measured 19 ms vs the XLA
    combine's 15). Here 8 units share ONE MXU-shaped matmul per
    (plane, slot): their σ-weights form an (8·2M, 8·16) block-diagonal
    lhs (built with a loop-hoisted constant unit/parity mask and two iota
    compares) against the 8 units' stacked window tiles (8·16, 128).
    All TB units ride one 8-batch dot_general of (256,128)@(128,128) —
    full K=128, M=256 MXU tiles, no per-unit loop.
    """
    f32 = jnp.float32
    G8 = TB // 8       # 8-unit blockdiag groups per block
    # --- loop-invariant masks / iotas (hoisted; all compile-time) ---
    # A4 (TB, 2M, 128): row r = parity h (r//M) + member m (r%M);
    # lane λ = unit-in-group u' (λ//16) + σ (λ%16); σ = 2t + parity.
    lam = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 128), 2)
    uu = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 128), 0) % 8
    hh = jax.lax.broadcasted_iota(jnp.int32, (TB, 2 * M, 128), 1) // M
    sig = lam % 16
    umask = ((lam // 16 == uu) & (sig % 2 == hh)).astype(f32)
    tt = (sig // 2).astype(f32)
    # λ-axis texel quarter q = λ//F for the s-weights (parity selects
    # s = q vs s = 4 + q)
    q = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, 128), 2) // F) \
        .astype(f32)
    # mask-window texel split (lane w = t*8+s)
    wt_i = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, NTEX), 2)
            // WIN).astype(f32)
    ws_i = (jax.lax.broadcasted_iota(jnp.int32, (TB, M, NTEX), 2)
            % WIN).astype(f32)
    # λ -> f reduction matrix R[λ, f] = [λ % F == f]
    lamr = jax.lax.broadcasted_iota(jnp.int32, (128, F), 0)
    ffr = jax.lax.broadcasted_iota(jnp.int32, (128, F), 1)
    R = (lamr % F == ffr).astype(f32)

    def sepw(iota_v, d, frac):
        d = d[..., None]
        frac = frac[..., None]
        return (jnp.where(iota_v == d, 1.0 - frac, 0.0)
                + jnp.where(iota_v == d + 1.0, frac, 0.0))

    feat_acc = jnp.zeros((TB, M, 128), f32)
    for g in range(Mp):
        valid = valid_ref[0, g]                     # (TB, M)
        Sg = jnp.zeros((TB, M, 128), f32)
        cw = jnp.ones((TB, M), f32)
        for p in range(3):
            win = win_ref[0, p, g]                  # (TB, 16, 128) bf16
            dt = dt_ref[0, p, g]                    # (TB, M)
            ds = ds_ref[0, p, g]
            fy = fy_ref[0, p, g]
            fx = fx_ref[0, p, g]
            dt2 = jnp.concatenate([dt, dt], axis=1)     # (TB, 2M)
            fy2 = jnp.concatenate([fy, fy], axis=1)
            A4 = sepw(tt, dt2, fy2) * umask             # (TB, 2M, 128)
            Ab = A4.astype(jnp.bfloat16).reshape(G8, 8 * 2 * M, 128)
            Wb = win.reshape(G8, 8 * 16, 128)
            D = jax.lax.dot_general(
                Ab, Wb, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32)             # (G8, 8·2M, 128)
            D = D.reshape(TB, 2 * M, 128)
            D0 = jax.lax.slice_in_dim(D, 0, M, axis=1)
            D1 = jax.lax.slice_in_dim(D, M, 2 * M, axis=1)
            B0 = sepw(q, ds, fx)                        # (TB, M, 128)
            B1 = sepw(q, ds - 4.0, fx)
            Sg = Sg + D0 * B0 + D1 * B1
            # mask logit over the 64-lane mask window
            wl = sepw(wt_i, dt, fy) * sepw(ws_i, ds, fx) \
                * valid[..., None]                      # (TB, M, 64)
            mw = mwin_ref[0, p, g].astype(f32)          # (TB, 64)
            lg = (wl * mw[:, None, :]).sum(axis=-1)     # (TB, M)
            if clamp_mask:
                lg = jnp.clip(lg, -2.0, 5.0)
            cw = cw * jax.nn.sigmoid(lg)
        candw_ref[0, g] = cw
        feat_acc = feat_acc + Sg * (cw * valid)[..., None]

    flat = feat_acc.reshape(TB * M, 128)
    feat_ref[0] = jax.lax.dot_general(
        flat, R, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(TB, M, F)


def tilewin_combine(win_rows: jnp.ndarray, mask_rows: jnp.ndarray,
                    xt: jnp.ndarray, xs: jnp.ndarray,
                    valid: jnp.ndarray, F: int,
                    clamp_mask: bool = False,
                    interpret: bool = False):
    """Fused combine over gathered window-row tiles.

    Args:
        win_rows: (B, 3, Mp, U, 16, 128) bf16 gathered window tiles
            (texel-major rows, 64*F lanes, F == 32).
        mask_rows: (B, 3, Mp, U, 64) bf16 gathered mask windows.
        xt, xs: (B, 3, Mp, M, U) f32 member in-window positions
            (integral texel offset + bilinear fraction, in [0, WIN-1));
            U-minor so the arrays carry no HBM tile padding.
        valid: (B, Mp, M, U) f32 slot-member validity.
    Returns:
        feature (B, U, M, F) f32, cand_w (B, Mp, M, U) f32.
    """
    B, three, Mp, U, SUBR, LANEW = win_rows.shape
    assert three == 3 and F == 32 and SUBR * LANEW == NTEX * F, \
        (win_rows.shape, F)
    assert U % TB == 0, (U, TB)
    grid = (B, U // TB)
    mode = os.environ.get("ENARF_TILEWIN_KERNEL", "hat")
    assert mode in ("hat", "bdiag", "dot", "vpu"), mode
    if mode == "hat":
        return _hat_combine_call(win_rows, mask_rows, xt, xs, valid, F,
                                 clamp_mask=clamp_mask, interpret=interpret)
    # legacy probe modes consume (…, U, M) split coords — derive them
    dtT = jnp.floor(xt).transpose(0, 1, 2, 4, 3)
    fyT = xt.transpose(0, 1, 2, 4, 3) - dtT
    dsT = jnp.floor(xs).transpose(0, 1, 2, 4, 3)
    fxT = xs.transpose(0, 1, 2, 4, 3) - dsT
    dt, ds, fy, fx = dtT, dsT, fyT, fxT
    valid_leg = valid.transpose(0, 1, 3, 2)
    valid = valid_leg

    def im6(b, i):
        return (b, 0, 0, i, 0, 0)

    def im5(b, i):
        return (b, 0, 0, i, 0)

    def im4(b, i):
        return (b, 0, i, 0)

    spec5 = lambda w: pl.BlockSpec((1, 3, Mp, TB, w), im5,  # noqa: E731
                                   memory_space=pltpu.VMEM)
    kern = functools.partial(_combine_kernel, F=F, Mp=Mp,
                             clamp_mask=clamp_mask, mode=mode)
    feat, cand_w = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((1, 3, Mp, TB, SUBR, LANEW), im6,
                               memory_space=pltpu.VMEM),
                  spec5(NTEX), spec5(M), spec5(M), spec5(M), spec5(M),
                  pl.BlockSpec((1, Mp, TB, M), im4,
                               memory_space=pltpu.VMEM)],
        # feat's U axis is dim 1; candw's is dim 2 (see _hat_combine_call)
        out_specs=[pl.BlockSpec((1, TB, M, F), lambda b, i: (b, i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, Mp, TB, M), im4,
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, U, M, F), jnp.float32),
                   jax.ShapeDtypeStruct((B, Mp, U, M), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(win_rows, mask_rows, dt, ds, fy, fx, valid)
    return feat, cand_w.transpose(0, 1, 3, 2)   # → (B, Mp, M, U)

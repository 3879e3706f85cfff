"""Convert a rosinality stylegan2-church checkpoint (.pt) to our param npz.

Run once where torch + the checkpoint are available:

    python data_preprocess/convert_stylegan2_church.py \
        --ckpt stylegan2-church-config-f.pt --out church_background.npz

Notes on mapping (see nn/stylegan2.py docstring):
  * upsample conv kernels are stored in conv orientation here — the rosinality
    transposed-conv kernels are flipped spatially and IO-swapped;
  * the constant input is sliced to half height (reference net.py:695).
"""
import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--out", type=str, required=True)
    args = parser.parse_args()

    import torch
    snap = torch.load(args.ckpt, map_location="cpu")
    g = snap["g_ema"]
    out = {}
    for k, v in g.items():
        arr = v.numpy()
        if k == "input.input":
            arr = arr[:, :, 1:-1]  # half-height const (reference net.py:695)
        if ".conv.weight" in k and arr.ndim == 5:
            arr = arr[0]
        out[k.replace(".", "/")] = arr
    np.savez(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays) — map into the "
          "PretrainedStyleGAN param tree with training/checkpoint.py helpers")


if __name__ == "__main__":
    main()

"""Convert a rosinality stylegan2-church checkpoint (.pt) to a numpy npz.

Run once where torch + the checkpoint are available:

    python data_preprocess/convert_stylegan2_church.py \
        --ckpt stylegan2-church-config-f.pt --out church_background.npz

The npz keeps the raw rosinality ``g_ema`` names and tensor orientations
(reference custom_stylegan2/net.py:679-709 loads the same checkpoint);
all orientation transforms (transposed-conv flips, leading-1 squeezes,
(1,C,1,1) bias flattening) happen at load time through the explicit key
bijection in ``training/checkpoint.py::load_pretrained_background``.
Unlike the reference (net.py:695), the constant input is NOT sliced to
half height — our PretrainedStyleGAN renders the full 256² canvas and
crops instead (nn/stylegan2.py::PretrainedStyleGAN).
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
    out = {k: v.numpy() for k, v in g.items()}
    np.savez(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays) — load with "
          "training/checkpoint.py::load_pretrained_background")


if __name__ == "__main__":
    main()

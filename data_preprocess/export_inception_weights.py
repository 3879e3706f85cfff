"""Export torchvision InceptionV3 weights to .npz for offline FID.

Run once on a connected machine:

    python data_preprocess/export_inception_weights.py --out inception_v3.npz

then set INCEPTION_WEIGHTS_NPZ=<path>.
"""
import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, required=True)
    args = parser.parse_args()

    import torchvision
    model = torchvision.models.inception_v3(weights="DEFAULT")
    arrays = {}
    for name, p in model.state_dict().items():
        arrays[name.replace(".", "/")] = p.detach().numpy()
    np.savez(args.out, **arrays)
    print(f"wrote {args.out} ({len(arrays)} arrays)")


if __name__ == "__main__":
    main()

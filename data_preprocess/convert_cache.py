"""Convert a reference pickle+blosc dataset cache into the native .npz format.

    python data_preprocess/convert_cache.py --src <dir with cache.pickle> \
        --dst <dir for cache.npz>

Requires blosc only at conversion time; afterwards the framework reads the
npz anywhere.
"""
import argparse
import os
import pickle

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", type=str, required=True)
    parser.add_argument("--dst", type=str, required=True)
    args = parser.parse_args()

    import blosc  # required for the legacy format

    with open(os.path.join(args.src, "cache.pickle"), "rb") as f:
        data = pickle.load(f)

    out = {}
    for key, val in data.items():
        if key in ("img", "disparity") and isinstance(val, (list, np.ndarray)) \
                and len(val) and isinstance(val[0], (bytes, bytearray)):
            arrs = [blosc.unpack_array(v) for v in val]
            out["imgs" if key == "img" else key] = np.stack(arrs)
        else:
            out[key] = np.asarray(val)
    os.makedirs(args.dst, exist_ok=True)
    np.savez_compressed(os.path.join(args.dst, "cache.npz"), **out)
    for extra in ("canonical.npy",):
        src = os.path.join(args.src, extra)
        if os.path.exists(src):
            np.save(os.path.join(args.dst, extra), np.load(src))
    print("wrote", os.path.join(args.dst, "cache.npz"),
          {k: v.shape for k, v in out.items()})


if __name__ == "__main__":
    main()

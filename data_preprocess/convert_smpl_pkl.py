"""Convert official SMPL .pkl model files to the plain .npz this framework reads.

The official pkls store chumpy arrays; conversion therefore needs chumpy (or
scipy-chumpy shims) and runs once on any machine:

    python data_preprocess/convert_smpl_pkl.py --pkl SMPL_NEUTRAL.pkl \
        --out smpl_data/SMPL_NEUTRAL.npz

The npz holds: v_template (V,3), shapedirs (V,3,10), J_regressor (24,V),
parents (24,), and (if present) weights/posedirs for full LBS.
"""
import argparse
import pickle

import numpy as np


def to_np(x):
    if hasattr(x, "r"):  # chumpy
        return np.asarray(x.r)
    if hasattr(x, "toarray"):  # scipy sparse
        return np.asarray(x.toarray())
    return np.asarray(x)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pkl", type=str, required=True)
    parser.add_argument("--out", type=str, required=True)
    args = parser.parse_args()

    with open(args.pkl, "rb") as f:
        data = pickle.load(f, encoding="latin1")

    out = {
        "v_template": to_np(data["v_template"]).astype(np.float32),
        "shapedirs": to_np(data["shapedirs"])[:, :, :10].astype(np.float32),
        "J_regressor": to_np(data["J_regressor"]).astype(np.float32),
        "parents": to_np(data["kintree_table"])[0].astype(np.int64),
    }
    out["parents"][0] = -1
    for opt in ("weights", "posedirs", "f"):
        if opt in data:
            out[opt] = to_np(data[opt]).astype(
                np.float32 if opt != "f" else np.int64)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: " +
          ", ".join(f"{k}{v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    main()

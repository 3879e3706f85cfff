"""SURREAL depth preprocessing → NARF_GAN_depth_cache.

Builds the disparity ground-truth cache consumed by
``SurrealPoseDepthDataset`` and ``evaluation/compute_depth.py``
(reference: data_preprocess/surreal/preprocess_depth.py:1-69,
dataset/dataset.py:308-345). For every SURREAL clip, the first frame's
depth map (``*_depth.mat``) becomes an inverse-depth (disparity) image,
cropped and intrinsics-rebased with the same spine-centred 180→128 window
the RGB pipeline uses, and stored alongside the world-space SMPL joint
transforms.

Far-background handling matches the reference: disparities below 0.1
(depth > 10 m — the SURREAL void) are zeroed so the eval's masked MSE
ignores them.
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

from preprocess import IMG_SIZE, load_smpl_models, read_pose_and_crop


def first_frame_disparity(video_path: str) -> np.ndarray:
    """(240, 320) inverse depth of the clip's first frame, void zeroed."""
    import scipy.io
    depth = scipy.io.loadmat(video_path[:-4] + "_depth.mat",
                             squeeze_me=True)["depth_1"]
    with np.errstate(divide="ignore"):
        disparity = np.where(depth > 0, 1.0 / depth, 0.0)
    return np.where(disparity >= 0.1, disparity, 0.0).astype(np.float32)


def preprocess_clip(video_path: str, smpl_models):
    """→ (disparity (128,128), K (3,3), pose (24,4,4)) or None if invalid."""
    import cv2
    crop, A_new, K, _ = read_pose_and_crop(video_path, smpl_models)
    if crop is None:
        return None
    disparity = first_frame_disparity(video_path)
    x1, x2, y1, y2 = crop
    if x1 < 0 or y1 < 0 or x2 > disparity.shape[1] or y2 > disparity.shape[0]:
        return None
    resized = cv2.resize(disparity[y1:y2, x1:x2], (IMG_SIZE, IMG_SIZE),
                         interpolation=cv2.INTER_NEAREST)
    return resized, K.astype(np.float32), A_new[0].astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--write_path", type=str, default="data/surreal")
    parser.add_argument("--smpl_dir", type=str, default="smpl_data")
    args = parser.parse_args()

    smpl_models = load_smpl_models(args.smpl_dir)
    videos = sorted(glob.glob(f"{args.data_path}/*/*/*/*.mp4"))
    print(len(videos), "videos")

    disparities, intrinsics, poses = [], [], []
    for path in videos:
        try:
            item = preprocess_clip(path, smpl_models)
        except Exception as e:
            print("invalid data:", path, e)
            continue
        if item is None:
            print("invalid data:", path)
            continue
        disparity, K, pose = item
        disparities.append(disparity)
        intrinsics.append(K)
        poses.append(pose)

    from enarf_gan_tpu.data.cache import save_cache_npz
    out_dir = os.path.join(args.write_path, "NARF_GAN_depth_cache")
    save_cache_npz(out_dir, disparity=np.stack(disparities),
                   camera_intrinsic=np.stack(intrinsics),
                   smpl_pose=np.stack(poses))
    canon_src = os.path.join(args.smpl_dir, "neutral_canonical.npy")
    if os.path.exists(canon_src):
        np.save(os.path.join(out_dir, "canonical.npy"), np.load(canon_src))
    print("wrote", out_dir)


if __name__ == "__main__":
    main()

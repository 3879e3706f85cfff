"""NeuralActor preprocessing → native cache.npz.

Port of reference data_preprocess/NeuralActor/preprocess.py:13-144:
multi-process video decode, white-background mask heuristic
(||rgb-255|| >= 18), joints_RT json → per-joint world transforms, per-camera
intrinsic/pose txt; train/test (+ debug interval-10) caches.
"""
import argparse
import json
import os
import sys
from multiprocessing import Pool

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np


def get_mask_from_rgb(image):
    assert image.shape[0] == 3
    assert image.max() > 250
    return np.linalg.norm(image.astype("float") - 255, axis=0) >= 18


class ReadSingleVideo:
    def __init__(self, dir_path, person_id, split, n_frame, interval):
        self.dir_path = dir_path
        self.person_id = person_id
        self.split = split
        self.n_frame = n_frame
        self.interval = interval

    def __call__(self, cam_id):
        import cv2
        count = 0
        frames = []
        cap = cv2.VideoCapture(
            f"{self.dir_path}/{self.person_id}/{self.split}/rgb_video/"
            f"{cam_id:0>3}.avi")
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            if count % self.interval == 0:
                frame = frame.transpose(2, 0, 1)[::-1]  # BGR→RGB, CHW
                mask = get_mask_from_rgb(frame)
                frame = frame * mask + 255 * (1 - mask)
                frames.append(frame.astype("uint8"))
            count += 1
        cap.release()
        print(f"Video {cam_id} is done ({len(frames)} frames)")
        return frames


def read_frames(dir_path, n_camera, person_id, split, n_frame, interval,
                n_process):
    rsv = ReadSingleVideo(dir_path, person_id, split, n_frame, interval)
    with Pool(n_process) as p:
        per_cam = p.map(rsv, range(n_camera))
    out = []
    for i in range(len(per_cam[0])):
        for cam_id in range(n_camera):
            out.append(per_cam[cam_id][i])
    return np.stack(out)


def save_cache(dir_path, write_path, person_id, n_camera, n_frame,
               prefix="train", start_frame_idx=0, interval=1, debug=False,
               n_process=5):
    from enarf_gan_tpu.data.cache import save_cache_npz
    if debug:
        interval = 10
    split = "training" if prefix == "train" else "testing"
    frames = read_frames(dir_path, n_camera, person_id, split, n_frame,
                         interval, n_process)

    intrinsics = np.array(
        [np.loadtxt(f"{dir_path}/{person_id}/intrinsic/0_train_{i:0>4}.txt")
         for i in range(n_camera)])
    extrinsics = np.array(
        [np.linalg.inv(np.loadtxt(f"{dir_path}/{person_id}/pose/0_train_{i:0>4}.txt"))
         for i in range(n_camera)])

    smpl_pose = []
    for frame_id in range(0, n_frame, interval):
        with open(f"{dir_path}/{person_id}/{split}/"
                  f"transform_smoth3e-2_withmotion/{frame_id:0>6}.json") as f:
            data = json.load(f)
        joints_RT = np.array(data["joints_RT"])
        rotation = np.array(data["rotation"])
        joints = np.array(data["joints"])
        joint_rot = np.matmul(rotation.T, joints_RT.transpose(2, 0, 1)[:, :3, :3])
        jt = np.concatenate([joint_rot, joints[:, :, None]], axis=-1)
        jt = np.concatenate([jt, np.tile([[[0, 0, 0, 1]]], (24, 1, 1))], axis=1)
        smpl_pose.append(jt)
    smpl_pose = np.array(smpl_pose)

    n_kept = len(smpl_pose)
    intrinsics = np.tile(intrinsics, (n_kept, 1, 1))
    extrinsics = np.tile(extrinsics, (n_kept, 1, 1))
    smpl_pose = np.repeat(smpl_pose, n_camera, axis=0)
    frame_id = np.repeat(np.arange(0, n_frame, interval), n_camera,
                         axis=0) + start_frame_idx

    out_dir = (f"{write_path}/{person_id}/"
               f"{prefix}{'_debug' * debug}_cache_{n_frame}")
    save_cache_npz(out_dir, imgs=frames,
                   camera_intrinsic=intrinsics.astype(np.float32),
                   camera_rotation=extrinsics[:, :3, :3].astype(np.float32),
                   camera_translation=extrinsics[:, :3, 3:].astype(np.float32),
                   smpl_pose=smpl_pose.astype(np.float32),
                   frame_id=frame_id.astype(np.int64))
    print("wrote", out_dir)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--write_path", type=str, default="data/NeuralActor")
    parser.add_argument("--n_process", type=int, default=5)
    # overrides for small runs / smoke fixtures
    parser.add_argument("--person_id", type=str, default=None)
    parser.add_argument("--n_train_frame", type=int, default=None)
    parser.add_argument("--n_test_frame", type=int, default=None)
    parser.add_argument("--n_camera", type=int, default=None)
    args = parser.parse_args()

    configs = [
        {"person_id": "lan", "n_train_frame": 33605, "n_test_frame": 14235,
         "n_camera": 11},
        {"person_id": "marc", "n_train_frame": 38194, "n_test_frame": 23062,
         "n_camera": 12},
    ]
    if args.person_id is not None:
        configs = [{"person_id": args.person_id,
                    "n_train_frame": args.n_train_frame or 4,
                    "n_test_frame": args.n_test_frame or 2,
                    "n_camera": args.n_camera or 2}]
    for conf in configs:
        for debug in (False, True):
            save_cache(args.data_path, args.write_path, conf["person_id"],
                       conf["n_camera"], conf["n_train_frame"], prefix="train",
                       debug=debug, n_process=args.n_process)
            save_cache(args.data_path, args.write_path, conf["person_id"],
                       conf["n_camera"], conf["n_test_frame"], prefix="test",
                       start_frame_idx=conf["n_train_frame"], interval=10,
                       debug=debug, n_process=args.n_process)


if __name__ == "__main__":
    main()

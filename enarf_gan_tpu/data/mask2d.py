"""2-D bone-mask rasterizer (host-side numpy).

Port of the reference's CPU mask drawing (reference: dataset/utils_3d.py:5-70):
projects joints, draws thick line-segment masks per bone, per-part disparity
maps, and keypoint masks. Used by the pose-prior dataset (GAN bone-guided
loss) and by the synthetic test fixtures.
"""
from __future__ import annotations

import numpy as np


class SMPLProperty:
    """Bone topology constants for mask drawing (reference dataset/dataset.py:12-25)."""

    def __init__(self):
        self.is_blank = np.array([0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1,
                                  1, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 1, 1])
        self.num_bone = 19
        self.prev_seq = [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 11, 11, 9, 10,
                         11, 12, 13, 16, 17, 18, 20, 21, 22, 23, 24, 25]
        self.num_joint = self.num_bone
        self.num_not_blank_bone = int(np.sum(self.is_blank == 0))
        self.valid_keypoints = [i for i in range(len(self.is_blank))
                                if i not in self.prev_seq or self.is_blank[i] == 0]
        self.num_valid_keypoints = len(self.valid_keypoints)


def pose_to_image_coord(pose_to_camera: np.ndarray, intrinsics: np.ndarray) -> np.ndarray:
    """(n_joint, 4, 4) + (3, 3) → (1, 3, n_joint) image coords (reference utils_3d.py:5-10)."""
    coord = pose_to_camera[:, :3, 3]
    coord = coord / coord[:, 2:3]
    coord = coord.transpose()[None]
    return np.matmul(intrinsics, coord)


def add_blank_part(joint_mat_camera: np.ndarray, joint_pos_image: np.ndarray):
    """Insert duplicated joints for blank parts (reference dataset/dataset.py:76-78)."""
    idx = [0, 0] + list(range(10)) + [9, 9] + list(range(10, 24))
    return joint_mat_camera[:, idx], joint_pos_image[:, :, idx]


def create_mask(hpp: SMPLProperty, joint_mat_camera: np.ndarray,
                joint_pos_image: np.ndarray, size: int, thickness: float = 1.5):
    """Rasterize thick 2-D bone segments (reference utils_3d.py:13-70).

    Args:
        joint_mat_camera: (1, n_joint28, 4, 4) camera-frame transforms
            (after add_blank_part).
        joint_pos_image: (1, 3, n_joint28) projected joints.
    Returns:
        (disparity (S,S), mask (S,S), part_bone_disparity (P,S,S),
         keypoint_mask (V,S,S)) — all float32.
    """
    prev = np.asarray(hpp.prev_seq)
    a = joint_pos_image[0, :2, 1:].transpose(1, 0)       # ends
    b = joint_pos_image[0, :2][:, prev[1:]].transpose(1, 0)  # starts

    camera_pos_a = joint_mat_camera[0, 1:, :3, 3]
    camera_pos_b = joint_mat_camera[0][prev[1:], :3, 3]

    x, y = np.meshgrid(np.arange(size), np.arange(size))
    c = np.stack([x, y], axis=2).reshape(-1, 2)

    ab = b - a
    ac = c[None] - a[:, None]
    acab = np.matmul(ac, ab[:, :, None]).squeeze(2)
    abab = (ab ** 2).sum(axis=1)[:, None]
    acac = (ac ** 2).sum(axis=2)
    seg_mask = ((0 <= acab) * (acab <= abab)
                * (acab ** 2 >= abab * (acac - thickness ** 2)) * (abab > 1e-8))
    s = acab / (abab + 1e-10)

    za = camera_pos_a[:, 2]
    zb = camera_pos_b[:, 2]
    t = s * za[:, None] / (s * za[:, None] + (1 - s) * zb[:, None])
    zc = za[:, None] * (1 - t) + zb[:, None] * t

    part_disp = 1 / (zc + 1e-8) * seg_mask
    disparity = part_disp.max(axis=0).reshape(size, size)
    mask = np.clip(seg_mask.sum(axis=0), 0, 1).reshape(size, size)

    bone_idx = np.array([prev[i] if hpp.is_blank[i] else i
                         for i in hpp.prev_seq if i >= 0])
    groups = [np.where(bone_idx == i)[0] for i in sorted(set(bone_idx))]
    part_bone_disparity = np.array(
        [part_disp[g].max(axis=0) for g in groups]).reshape(-1, size, size)

    key = joint_pos_image[0, :2].transpose(1, 0)[hpp.valid_keypoints]
    keypoint_mask = np.zeros((len(key), size, size))
    for i, (kx, ky) in enumerate(key):
        left = int(np.ceil(kx - thickness))
        right = int(np.ceil(kx + thickness))
        top = int(np.ceil(ky - thickness))
        bottom = int(np.ceil(ky + thickness))
        keypoint_mask[i, max(top, 0):bottom, max(left, 0):right] = \
            (bottom >= 0) * (right >= 0)
    return (disparity.astype(np.float32), mask.astype(np.float32),
            part_bone_disparity.astype(np.float32),
            keypoint_mask.astype(np.float32))

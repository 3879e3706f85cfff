"""Synthetic SMPL-like dataset fixtures.

Generates a deterministic articulated "human" (24-joint SMPL topology),
camera ring, and rasterized bone-mask images in the framework's native cache
format — so every downstream layer (datasets, training, eval) is testable
without the real ZJU/AIST/SURREAL data (SURVEY.md §7.2 step 1).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from enarf_gan_tpu.data.cache import save_cache_npz
from enarf_gan_tpu.data.mask2d import (SMPLProperty, add_blank_part, create_mask,
                                       pose_to_image_coord)
from enarf_gan_tpu.geometry.smpl import SMPL_PARENTS, canonical_pose_from_rest_joints


def synthetic_rest_joints(seed: int = 0) -> np.ndarray:
    """Plausible 24-joint rest skeleton (meters), deterministic."""
    rs = np.random.RandomState(seed)
    joints = np.zeros((24, 3), np.float32)
    for j in range(1, 24):
        p = SMPL_PARENTS[j]
        offset = rs.uniform(-0.12, 0.12, 3).astype(np.float32)
        offset[1] += 0.08  # grow roughly upward
        joints[j] = joints[p] + offset
    return joints


def synthetic_pose_sequence(rest_joints: np.ndarray, n_frames: int,
                            seed: int = 1) -> np.ndarray:
    """(n_frames, 24, 4, 4) world transforms: rest pose with smooth per-joint
    rotations about y (cheap articulated motion)."""
    from enarf_gan_tpu.geometry import smpl as smpl_mod
    import jax.numpy as jnp
    rs = np.random.RandomState(seed)
    amp = rs.uniform(0, 0.4, 24).astype(np.float32)
    phase = rs.uniform(0, 2 * np.pi, 24).astype(np.float32)
    poses = []
    for f in range(n_frames):
        angle = amp * np.sin(2 * np.pi * f / max(n_frames, 1) + phase)
        aa = np.zeros((24, 3), np.float32)
        aa[:, 1] = angle
        rots = np.array(smpl_mod.rodrigues(jnp.asarray(aa)))
        A = np.array(smpl_mod.rigid_transform(
            jnp.asarray(rots[None]), jnp.asarray(rest_joints[None]),
            SMPL_PARENTS))[0]
        poses.append(A)
    return np.stack(poses).astype(np.float32)


def camera_ring(n_camera: int, radius: float = 1.2,
                height: float = 0.0) -> np.ndarray:
    """(n_camera, 4, 4) world→camera extrinsics looking at the origin."""
    outs = []
    for i in range(n_camera):
        theta = 2 * np.pi * i / max(n_camera, 1)
        cam_pos = np.array([radius * np.sin(theta), height,
                            -radius * np.cos(theta)], np.float32)
        z_axis = -cam_pos / np.linalg.norm(cam_pos)      # look at origin
        up = np.array([0, 1, 0], np.float32)
        x_axis = np.cross(up, z_axis)
        x_axis /= np.linalg.norm(x_axis)
        y_axis = np.cross(z_axis, x_axis)
        R = np.stack([x_axis, y_axis, z_axis])           # world→cam rows
        t = -R @ cam_pos
        E = np.eye(4, dtype=np.float32)
        E[:3, :3] = R
        E[:3, 3] = t
        outs.append(E)
    return np.stack(outs)


def make_synthetic_smpl_npz(path: str, seed: int = 0,
                            n_betas: int = 2) -> Dict:
    """Write a tiny SMPL-like model npz (same keys convert_smpl_pkl.py emits).

    4 vertices cluster around each of the 24 rest joints and the regressor
    averages them, so ``smpl_pose_transforms`` reproduces the synthetic rest
    skeleton exactly at beta=0 — which makes preprocessing-pipeline smoke
    tests geometrically self-consistent.
    """
    rs = np.random.RandomState(seed + 7)
    rest = synthetic_rest_joints(seed)
    V = 24 * 4
    v_template = (np.repeat(rest, 4, axis=0)
                  + rs.uniform(-0.02, 0.02, (V, 3))).astype(np.float32)
    J_regressor = np.zeros((24, V), np.float32)
    for j in range(24):
        J_regressor[j, 4 * j:4 * (j + 1)] = 0.25
    # regressor must return the exact rest joints: correct the cluster mean
    v_template += np.repeat(rest - J_regressor @ v_template, 4, axis=0)
    shapedirs = rs.uniform(-0.01, 0.01, (V, 3, n_betas)).astype(np.float32)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, v_template=v_template, shapedirs=shapedirs,
             J_regressor=J_regressor, parents=np.asarray(SMPL_PARENTS))
    return {"rest_joints": rest, "n_vertices": V}


def make_synthetic_depth_cache(data_root: str, size: int = 64,
                               n_items: int = 4, seed: int = 0) -> Dict:
    """Write a SURREAL-style depth cache (NARF_GAN_depth_cache layout).

    Same wire format ``data_preprocess/surreal/preprocess_depth.py`` emits:
    per-item disparity map + intrinsics + camera-space SMPL pose (SURREAL
    poses are already in the camera frame — reference dataset.py:308-345).
    """
    rest = synthetic_rest_joints(seed)
    world_poses = synthetic_pose_sequence(rest, n_items, seed + 1)
    extrinsics = camera_ring(n_items)
    focal = size * 1.2
    K = np.array([[focal, 0, size / 2], [0, focal, size / 2], [0, 0, 1]],
                 np.float32)
    hpp = SMPLProperty()
    disps, intr, poses = [], [], []
    for i in range(n_items):
        pose_cam = extrinsics[i][None] @ world_poses[i]  # (24, 4, 4)
        jpi = pose_to_image_coord(pose_cam, K)
        jm, jp = add_blank_part(pose_cam[None], jpi)
        disparity, _, _, _ = create_mask(hpp, jm, jp, size,
                                         thickness=max(size / 64, 1.0))
        disps.append(disparity.astype(np.float32))
        intr.append(K)
        poses.append(pose_cam.astype(np.float32))
    save_cache_npz(data_root, disparity=np.stack(disps),
                   camera_intrinsic=np.stack(intr), smpl_pose=np.stack(poses))
    canonical = canonical_pose_from_rest_joints(rest)
    np.save(os.path.join(data_root, "canonical.npy"), canonical)
    return {"canonical_pose": canonical, "n_items": n_items}


def make_synthetic_human_cache(data_root: str, size: int = 64, n_frames: int = 4,
                               n_camera: int = 3, seed: int = 0,
                               with_disparity: bool = False) -> Dict:
    """Write a native cache.npz of a synthetic articulated human.

    Images are bone-mask renderings (RGB in the mask + alpha channel) —
    geometrically consistent across views, sufficient for overfit smoke
    tests and IO-path tests.
    """
    rest = synthetic_rest_joints(seed)
    world_poses = synthetic_pose_sequence(rest, n_frames, seed + 1)
    extrinsics = camera_ring(n_camera)
    focal = size * 1.2
    K = np.array([[focal, 0, size / 2], [0, focal, size / 2], [0, 0, 1]],
                 np.float32)

    hpp = SMPLProperty()
    imgs, intr, poses, rots, trans, frame_ids, disps = [], [], [], [], [], [], []
    for f in range(n_frames):
        for c in range(n_camera):
            pose_world = world_poses[f]
            pose_cam = extrinsics[c][None] @ pose_world
            jpi = pose_to_image_coord(pose_cam, K)
            jm, jp = add_blank_part(pose_cam[None], jpi)
            disparity, mask, _, _ = create_mask(hpp, jm, jp, size,
                                                thickness=max(size / 64, 1.0))
            gray = (mask * 200).astype(np.uint8)
            img = np.stack([gray, gray, gray,
                            (mask * 255).astype(np.uint8)])  # (4, S, S)
            imgs.append(img)
            intr.append(K)
            poses.append(pose_world)
            rots.append(extrinsics[c][:3, :3])
            trans.append(extrinsics[c][:3, 3:])
            frame_ids.append(f)
            if with_disparity:
                disps.append(disparity)

    arrays = dict(
        imgs=np.stack(imgs),
        camera_intrinsic=np.stack(intr),
        smpl_pose=np.stack(poses),
        camera_rotation=np.stack(rots),
        camera_translation=np.stack(trans),
        frame_id=np.array(frame_ids, np.int64),
    )
    if with_disparity:
        arrays["disparity"] = np.stack(disps)
    save_cache_npz(data_root, **arrays)
    canonical = canonical_pose_from_rest_joints(rest)
    np.save(os.path.join(data_root, "canonical.npy"), canonical)
    return {"canonical_pose": canonical, "n_frames": n_frames,
            "n_camera": n_camera, "rest_joints": rest}

"""Skeleton pose transforms (pure jnp/numpy; no torch).

Re-rooting of per-bone coordinate frames and pose interpolation, numerically
matching the reference (libraries/NARF/pose_utils.py:10-148).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

HEAD_ID = 15  # SMPL head joint, used by origin_location == "center+head"


def transform_pose(pose_to_camera: jnp.ndarray, bone_length: jnp.ndarray,
                   origin_location: str, parent_id) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Re-root per-bone frames to bone centers.

    Matches reference libraries/NARF/pose_utils.py:129-148. Input
    ``pose_to_camera`` is (B, n_joint, 4, 4) over the full 24-joint skeleton;
    output drops the root and has one frame per bone (23), or 24 for
    "center+head" (head frame appended).

    * "center": child rotation, translation = midpoint(child, parent)
    * "center_fixed": parent rotation, translation = midpoint(child, parent)
    * "center+head": center_fixed + extra head frame; bone_length gains a 1.
    """
    parent_id = np.asarray(parent_id)
    child_t = pose_to_camera[:, 1:, :, 3:]
    parent_t = pose_to_camera[:, parent_id[1:], :, 3:]
    mid_t = (child_t + parent_t) / 2
    if origin_location == "center":
        out = jnp.concatenate([pose_to_camera[:, 1:, :, :3], mid_t], axis=-1)
    elif origin_location == "center_fixed":
        out = jnp.concatenate([pose_to_camera[:, parent_id[1:], :, :3], mid_t], axis=-1)
    elif origin_location == "center+head":
        bone_length = jnp.concatenate(
            [bone_length, jnp.ones((bone_length.shape[0], 1, 1), bone_length.dtype)], axis=1)
        base = jnp.concatenate([pose_to_camera[:, parent_id[1:], :, :3], mid_t], axis=-1)
        out = jnp.concatenate([base, pose_to_camera[:, HEAD_ID][:, None]], axis=1)
    else:
        raise ValueError(f"unknown origin_location {origin_location!r}")
    return out, bone_length


def transform_canonical_pose(pose: np.ndarray, parent_id: np.ndarray,
                             origin_location: str) -> Tuple[np.ndarray, np.ndarray]:
    """Canonical-pose registration: re-rooted frames + bone lengths (numpy).

    Matches reference models/narf.py:84-120 (``register_canonical_pose``).
    ``pose``: (24, 4, 4) canonical joint transforms. Returns
    (canonical_pose (n_bone, 4, 4), canonical_bone_length (n_bone,)).
    """
    parent_id = np.asarray(parent_id)
    coord = pose[:, :3, 3]
    length = np.linalg.norm(coord[1:] - coord[parent_id[1:]], axis=1)  # (23,)
    mid = (pose[1:, :, 3:] + pose[parent_id[1:], :, 3:]) / 2
    if origin_location == "center":
        out = np.concatenate([pose[1:, :, :3], mid], axis=-1)
    elif origin_location == "center_fixed":
        out = np.concatenate([pose[parent_id[1:], :, :3], mid], axis=-1)
    elif origin_location == "center+head":
        length = np.concatenate([length, np.ones(1)])
        base = np.concatenate([pose[parent_id[1:], :, :3], mid], axis=-1)
        out = np.concatenate([base, pose[HEAD_ID][None]], axis=0)
    else:
        raise ValueError(f"unknown origin_location {origin_location!r}")
    return out.astype(np.float32), length.astype(np.float32)


def rotation_matrix(theta: jnp.ndarray) -> jnp.ndarray:
    """Y-axis rotation as (B, 4, 4) (reference pose_utils.py:10-21)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    R = jnp.stack([c, z, -s, z,
                   z, o, z, z,
                   s, z, c, z,
                   z, z, z, o], axis=-1)
    return R.reshape(theta.shape[0], 4, 4)


def rotate_pose(pose_3d: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """Rotate a pose about the mean joint position (reference pose_utils.py:39-45)."""
    center_t = pose_3d[:, :, :3, 3:].mean(axis=1)  # (B, 3, 1)
    center = jnp.zeros((pose_3d.shape[0], 4, 4), pose_3d.dtype)
    center = center.at[:, :3, 3:].set(center_t)[:, None]  # (B, 1, 4, 4)
    return jnp.einsum("bij,bkjl->bkil", R, pose_3d - center,
                      precision=jax.lax.Precision.HIGHEST) + center


def rotate_pose_by_angle(pose_3d: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    return rotate_pose(pose_3d, rotation_matrix(angle))


def rotate_pose_randomly(rng, pose_3d: jnp.ndarray) -> jnp.ndarray:
    import jax
    angle = jax.random.uniform(rng, (pose_3d.shape[0],), pose_3d.dtype, 0, 2 * np.pi)
    return rotate_pose_by_angle(pose_3d, angle)


def interpolate_pose(pose_3d: np.ndarray, parents: np.ndarray, num: int = 100,
                     loop: bool = True) -> np.ndarray:
    """Slerp interpolation among key poses (reference pose_utils.py:48-115).

    Host-side numpy: demo-path only, not part of the compiled pipeline.
    """
    from scipy.spatial.transform import Rotation as R
    from scipy.spatial.transform import Slerp

    num_pose, num_parts, _, _ = pose_3d.shape
    parent_mat = pose_3d[:, parents[1:]]
    parent_mat = np.concatenate(
        [np.tile(np.eye(4)[None, None], (num_pose, 1, 1, 1)), parent_mat], axis=1)

    child = np.einsum("pjik,pjkl->pjil",
                      np.linalg.inv(parent_mat), pose_3d)  # (num_pose, J, 4, 4)

    interp_rel = []
    for i in range(num_parts):
        if loop:
            key_rots = np.concatenate([child[:, i, :3, :3], child[:1, i, :3, :3]], axis=0)
            key_times = np.arange(num_pose + 1)
            times = np.arange(num) * num_pose / num
            trans = np.concatenate([
                np.linspace(child[j, i, :3, 3], child[(j + 1) % num_pose, i, :3, 3],
                            num // num_pose, endpoint=False)
                for j in range(num_pose)], axis=0)
        else:
            key_rots = child[:, i, :3, :3]
            key_times = np.arange(num_pose)
            times = np.arange(num) * (num_pose - 1) / (num - 1)
            trans = np.concatenate([
                np.linspace(child[j, i, :3, 3], child[j + 1, i, :3, 3],
                            num // (num_pose - 1), endpoint=True)
                for j in range(num_pose - 1)], axis=0)
        rots = Slerp(key_times, R.from_matrix(key_rots))(times).as_matrix()
        mat = np.concatenate([rots, trans[:, :, None]], axis=2)
        mat = np.concatenate([mat, np.tile([[[0, 0, 0, 1]]], (num, 1, 1))], axis=1)
        interp_rel.append(mat)
    interp_rel = np.array(interp_rel)  # (J, num, 4, 4)

    out = []
    for i in range(num):
        pose = []
        for j in range(num_parts):
            mat = np.eye(4) if parents[j] == -1 else pose[parents[j]]
            pose.append(mat @ interp_rel[j, i])
        out.append(np.stack(pose))
    return np.stack(out)

"""SMPL forward kinematics in pure jnp (no smplx dependency).

Reimplements the three smplx LBS helpers the reference relies on
(reference: libraries/smpl_utils.py:9-142): blend shapes, Rodrigues
axis-angle → rotation, and the kinematic-chain rigid transform. Output is the
per-joint absolute 4x4 transform A with rotation = accumulated chain rotation
and translation = posed joint location, matching ``_get_pose``
(smpl_utils.py:66-128, where A[:, :, :3, 3] is overwritten with the posed
joints).

SMPL model data (v_template, shapedirs, J_regressor) is loaded from a plain
.npz; a converter from the official pickle is in
``data_preprocess/convert_smpl_pkl.py``.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

# SMPL kinematic tree (reference dataset/dataset.py:46-47)
SMPL_PARENTS = np.array([-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9,
                         12, 13, 14, 16, 17, 18, 19, 20, 21])


def rodrigues(axis_angle: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle (N, 3) → rotation matrices (N, 3, 3) (Rodrigues' formula)."""
    angle = jnp.linalg.norm(axis_angle + eps, axis=1, keepdims=True)  # (N, 1)
    axis = axis_angle / angle
    cos = jnp.cos(angle)[:, :, None]
    sin = jnp.sin(angle)[:, :, None]
    rx, ry, rz = axis[:, 0], axis[:, 1], axis[:, 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack([zeros, -rz, ry,
                   rz, zeros, -rx,
                   -ry, rx, zeros], axis=1).reshape(-1, 3, 3)
    eye = jnp.eye(3, dtype=axis_angle.dtype)[None]
    return eye + sin * K + (1 - cos) * jnp.matmul(K, K, precision=jax.lax.Precision.HIGHEST)


def blend_shapes(betas: jnp.ndarray, shape_disps: jnp.ndarray) -> jnp.ndarray:
    """(B, n_betas) x (V, 3, n_betas) → (B, V, 3) vertex displacements."""
    return jnp.einsum("bl,mkl->bmk", betas, shape_disps)


def vertices2joints(J_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """(J, V) x (B, V, 3) → (B, J, 3)."""
    return jnp.einsum("jv,bvk->bjk", J_regressor, vertices)


def rigid_transform(rot_mats: jnp.ndarray, joints: jnp.ndarray,
                    parents: np.ndarray) -> jnp.ndarray:
    """Kinematic-chain forward transform.

    Args:
        rot_mats: (B, J, 3, 3) per-joint local rotations.
        joints: (B, J, 3) rest-pose joint locations.
        parents: (J,) kinematic tree (host constant).
    Returns:
        (B, J, 4, 4) absolute transforms; translation column holds posed joints.
    """
    parents = np.asarray(parents)
    B, J = joints.shape[:2]
    rel = jnp.concatenate([joints[:, :1], joints[:, 1:] - joints[:, parents[1:]]], axis=1)
    # local 4x4
    top = jnp.concatenate([rot_mats, rel[:, :, :, None]], axis=3)  # (B, J, 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0, 0, 0, 1], rot_mats.dtype)[None, None, None, :], (B, J, 1, 4))
    local = jnp.concatenate([top, bottom], axis=2)  # (B, J, 4, 4)

    # chain multiply along the (host-static) tree; J=24 so a python loop
    # unrolls into 23 batched 4x4 matmuls under jit.
    chains = [local[:, 0]]
    for j in range(1, J):
        chains.append(jnp.matmul(chains[parents[j]], local[:, j],
                                 precision=jax.lax.Precision.HIGHEST))
    return jnp.stack(chains, axis=1)  # (B, J, 4, 4)


def smpl_pose_transforms(betas: jnp.ndarray, full_pose: jnp.ndarray,
                         v_template: jnp.ndarray, shapedirs: jnp.ndarray,
                         J_regressor: jnp.ndarray,
                         parents: Optional[np.ndarray] = None,
                         pose2rot: bool = True) -> jnp.ndarray:
    """SMPL forward pass → per-joint world transforms.

    Equivalent to reference ``get_pose``/``_get_pose``
    (libraries/smpl_utils.py:9-128).

    Args:
        betas: (B, n_betas) shape coefficients.
        full_pose: (B, J*3) axis-angle (pose2rot) or (B, J, 3, 3) rotations.
        v_template: (V, 3); shapedirs: (V, 3, n_betas); J_regressor: (J, V).
    Returns:
        (B, J, 4, 4) absolute joint transforms.
    """
    if parents is None:
        parents = SMPL_PARENTS
    B = full_pose.shape[0]
    v_shaped = v_template[None] + blend_shapes(betas, shapedirs)
    joints = vertices2joints(J_regressor, v_shaped)  # (B, J, 3)
    if pose2rot:
        rot_mats = rodrigues(full_pose.reshape(-1, 3)).reshape(B, -1, 3, 3)
    else:
        rot_mats = full_pose.reshape(B, -1, 3, 3)
    return rigid_transform(rot_mats, joints, parents)


def move_to_origin(bone_pose: np.ndarray, scale: float = 0.5) -> np.ndarray:
    """Hip-center and scale the skeleton translations (reference smpl_utils.py:131-137).

    Only the translation column is affected (the reference function is never
    called; its whole-matrix add/scale would corrupt rotations).
    """
    left_hip, right_hip = 1, 2
    out = bone_pose.copy()
    trans = out[:, [left_hip, right_hip], :3, 3].mean(axis=1, keepdims=True)
    out[:, :, :3, 3] = (out[:, :, :3, 3] - trans) * scale
    return out


def axis_transformation(bone_pose: np.ndarray,
                        axis_transformation: np.ndarray = np.array([1, -1, -1])):
    """Flip coordinate axes in place (reference smpl_utils.py:140-142)."""
    bone_pose[:, :3] *= axis_transformation[None, :, None]
    return bone_pose


def canonical_pose_from_rest_joints(rest_joints: np.ndarray,
                                    parents: Optional[np.ndarray] = None) -> np.ndarray:
    """Zero-pose canonical transforms from rest joint locations.

    Equivalent to data_preprocess/prepare_canonical_pose.py in the reference:
    identity rotations, translations = hip-centered joint positions (the
    reference centers on the mean of left/right hip without scaling).
    Used both by the real pipeline (given SMPL rest joints) and as the test
    fixture generator.
    """
    if parents is None:
        parents = SMPL_PARENTS
    J = rest_joints.shape[0]
    pose = np.tile(np.eye(4, dtype=np.float32)[None], (J, 1, 1))
    pose[:, :3, 3] = rest_joints - rest_joints[[1, 2]].mean(axis=0, keepdims=True)
    return pose.astype(np.float32)

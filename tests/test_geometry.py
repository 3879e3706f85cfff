import numpy as np
import jax.numpy as jnp
import torch

from enarf_gan_tpu.geometry.encoding import (
    positional_encoding, multi_part_positional_encoding, in_cube, to_local,
    scalar_positional_encoding)
from enarf_gan_tpu.geometry.pose import (
    transform_pose, transform_canonical_pose, rotation_matrix, rotate_pose_by_angle)
from enarf_gan_tpu.geometry.smpl import (
    rodrigues, rigid_transform, SMPL_PARENTS, canonical_pose_from_rest_joints)


def torch_positional_encoding(x, L, cos_first=True, cat_dim=2):
    # verbatim reference semantics (libraries/NeRF/utils.py:74-88) as oracle
    bs, dim, n = x.shape
    x = x.unsqueeze(cat_dim) * 2 ** torch.arange(L)[None, :, None].unsqueeze(3 - cat_dim) * np.pi
    if cos_first:
        enc = torch.cat([torch.cos(x), torch.sin(x)], dim=cat_dim)
    else:
        enc = torch.cat([torch.sin(x), torch.cos(x)], dim=cat_dim)
    return enc.reshape(bs, -1, n)


def test_positional_encoding_matches_reference(rng):
    x = rng.randn(2, 3, 17).astype(np.float32)
    for cos_first, cat_dim in [(True, 2), (False, 1)]:
        ours = positional_encoding(jnp.array(x), 10, cos_first, cat_dim)
        ref = torch_positional_encoding(torch.tensor(x), 10, cos_first, cat_dim)
        np.testing.assert_allclose(np.array(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_multi_part_pe_masks_out_of_cube(rng):
    num_bone, L = 4, 3
    x = rng.uniform(-0.9, 0.9, (2, num_bone * 3, 11)).astype(np.float32)
    x[0, 3:6, 5] = 1.5  # push bone 1, point 5 outside the cube
    enc = np.array(multi_part_positional_encoding(jnp.array(x), L, num_bone))
    enc = enc.reshape(2, num_bone, -1, 11)
    assert np.all(enc[0, 1, :, 5] == 0)
    assert np.any(enc[0, 0, :, 5] != 0)
    # non-masked entries match plain per-bone PE
    ref = torch_positional_encoding(torch.tensor(x[1:2].reshape(num_bone, 3, 11)),
                                    L, cos_first=False, cat_dim=1)
    np.testing.assert_allclose(enc[1, 0], ref.numpy()[0], rtol=1e-4, atol=1e-4)


def test_in_cube():
    p = jnp.array([[[0.5, -1.2], [0.0, 0.0], [0.99, 0.0]]])  # (1, 3, 2)
    inside = np.array(in_cube(p))
    assert inside.shape == (1, 1, 2)
    assert inside[0, 0, 0] and not inside[0, 0, 1]
    # grouped variant
    p6 = jnp.concatenate([p, p * 2], axis=1)  # (1, 6, 2)
    inside2 = np.array(in_cube(p6))
    assert inside2.shape == (1, 2, 2)


def test_to_local_inverts_bone_transform(rng):
    B, K, n = 2, 5, 7
    # random rigid transforms
    theta = rng.uniform(0, np.pi, (B * K,)).astype(np.float32)
    R = np.array(rotation_matrix(jnp.array(theta)))[:, :3, :3].reshape(B, K, 3, 3)
    t = rng.randn(B, K, 3, 1).astype(np.float32)
    pose = np.tile(np.eye(4, dtype=np.float32), (B, K, 1, 1))
    pose[:, :, :3, :3] = R
    pose[:, :, :3, 3:] = t
    local_pts = rng.randn(B, K, 3, n).astype(np.float32)
    # points in camera frame = R @ local + t ; to_local should invert
    cam_pts = np.einsum("bkij,bkjn->bkin", R, local_pts) + t
    for k in range(K):
        out = np.array(to_local(jnp.array(cam_pts[:, k]), jnp.array(pose)))
        out = out.reshape(B, K, 3, n)
        np.testing.assert_allclose(out[:, k], local_pts[:, k], rtol=1e-4, atol=1e-4)


def test_transform_pose_variants(rng):
    B, J = 2, 24
    pose = np.tile(np.eye(4, dtype=np.float32), (B, J, 1, 1))
    pose[:, :, :3, 3] = rng.randn(B, J, 3).astype(np.float32)
    bl = np.abs(rng.randn(B, J - 1, 1)).astype(np.float32)
    parents = SMPL_PARENTS

    out, bl2 = transform_pose(jnp.array(pose), jnp.array(bl), "center", parents)
    assert out.shape == (B, 23, 4, 4)
    mid = (pose[:, 1:, :3, 3] + pose[:, parents[1:]][:, :, :3, 3]) / 2
    np.testing.assert_allclose(np.array(out)[:, :, :3, 3], mid, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.array(out)[:, :, :3, :3], pose[:, 1:, :3, :3])

    out_cf, _ = transform_pose(jnp.array(pose), jnp.array(bl), "center_fixed", parents)
    np.testing.assert_allclose(np.array(out_cf)[:, :, :3, :3],
                               pose[:, parents[1:]][:, :, :3, :3])

    out_ch, bl3 = transform_pose(jnp.array(pose), jnp.array(bl), "center+head", parents)
    assert out_ch.shape == (B, 24, 4, 4)
    assert bl3.shape == (B, 24, 1)
    np.testing.assert_allclose(np.array(out_ch)[:, -1], pose[:, 15], rtol=1e-6)


def test_canonical_matches_runtime_transform(rng):
    # registration-time (numpy) and runtime (jnp) re-rooting must agree
    J = 24
    pose = np.tile(np.eye(4, dtype=np.float32), (J, 1, 1))
    pose[:, :3, 3] = rng.randn(J, 3).astype(np.float32)
    bl = np.linalg.norm(pose[1:, :3, 3] - pose[SMPL_PARENTS[1:], :3, 3], axis=1)
    canon, length = transform_canonical_pose(pose, SMPL_PARENTS, "center_fixed")
    run, _ = transform_pose(jnp.array(pose[None]), jnp.array(bl[None, :, None]),
                            "center_fixed", SMPL_PARENTS)
    np.testing.assert_allclose(canon, np.array(run)[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(length, bl, rtol=1e-5)


def test_rodrigues_matches_scipy(rng):
    from scipy.spatial.transform import Rotation
    aa = rng.randn(8, 3).astype(np.float32)
    ours = np.array(rodrigues(jnp.array(aa)))
    ref = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_rigid_transform_chain(rng):
    # identity rotations: posed joints == rest joints
    B, J = 2, 24
    joints = rng.randn(B, J, 3).astype(np.float32)
    # make a consistent tree: child joints relative to parents
    eye = np.tile(np.eye(3, dtype=np.float32), (B, J, 1, 1))
    A = np.array(rigid_transform(jnp.array(eye), jnp.array(joints), SMPL_PARENTS))
    np.testing.assert_allclose(A[:, :, :3, 3], joints, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(A[:, :, :3, :3], eye, atol=1e-6)
    # rotating the root rotates all joints around the root joint
    theta = np.array([0.7], np.float32)
    Rr = np.array(rotation_matrix(jnp.array(theta)))[0, :3, :3]
    rots = eye.copy()
    rots[:, 0] = Rr
    A2 = np.array(rigid_transform(jnp.array(rots), jnp.array(joints), SMPL_PARENTS))
    expect = np.einsum("ij,bkj->bki", Rr, joints - joints[:, :1]) + joints[:, :1]
    np.testing.assert_allclose(A2[:, :, :3, 3], expect, rtol=1e-4, atol=1e-4)


def test_canonical_pose_fixture():
    rest = np.zeros((24, 3), np.float32)
    rest[:, 1] = np.arange(24) * 0.05
    rest[1] = [0.1, -0.05, 0]
    rest[2] = [-0.1, -0.05, 0]
    canon = canonical_pose_from_rest_joints(rest)
    assert canon.shape == (24, 4, 4)
    # hips centered: mean of left/right hip translation == 0
    np.testing.assert_allclose(canon[[1, 2], :3, 3].mean(axis=0), 0, atol=1e-6)


def test_scalar_pe():
    x = jnp.array([0.25, 1.0])
    enc = np.array(scalar_positional_encoding(x, 10))
    assert enc.shape == (2, 20)
    np.testing.assert_allclose(enc[1, 0], np.cos(np.pi), atol=1e-6)


def test_rotate_pose_by_angle_preserves_center(rng):
    pose = np.tile(np.eye(4, dtype=np.float32), (1, 24, 1, 1))
    pose[:, :, :3, 3] = rng.randn(1, 24, 3).astype(np.float32)
    out = np.array(rotate_pose_by_angle(jnp.array(pose), jnp.array([1.1], np.float32)))
    np.testing.assert_allclose(out[0, :, :3, 3].mean(axis=0),
                               pose[0, :, :3, 3].mean(axis=0), rtol=1e-4, atol=1e-5)

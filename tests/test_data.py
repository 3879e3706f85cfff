import numpy as np
import pytest

from enarf_gan_tpu.config import AttrDict
from enarf_gan_tpu.data.fixtures import make_synthetic_human_cache
from enarf_gan_tpu.data.datasets import (HumanDataset, HumanPoseDataset,
                                         SSODataset, SurrealPoseDepthDataset)
from enarf_gan_tpu.data.loader import DataLoader, collate
from enarf_gan_tpu.data.mask2d import SMPLProperty, create_mask


@pytest.fixture(scope="module")
def cache_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    info = make_synthetic_human_cache(str(root), size=32, n_frames=3,
                                      n_camera=2, with_disparity=True)
    return str(root), info


def test_human_dataset_items(cache_dir):
    root, info = cache_dir
    cfg = AttrDict({"data_root": root, "n_frames": 3})
    ds = HumanDataset(cfg, size=32, return_bone_params=True,
                      return_bone_mask=True, num_repeat_in_epoch=2)
    assert len(ds) == 3 * 2 * 2
    item = ds[0]
    assert item["img"].shape == (3, 32, 32)
    assert item["img"].min() >= -1 and item["img"].max() <= 1
    assert item["mask"].shape == (32, 32)
    assert item["pose_3d"].shape == (24, 4, 4)
    assert item["bone_length"].shape == (23, 1)
    assert item["bone_mask"].shape == (32, 32)
    # pose_to_camera = extrinsic @ pose_to_world
    assert not np.allclose(item["pose_3d"], item["pose_3d_world"])


def test_sso_dataset_frame_time(cache_dir):
    root, info = cache_dir
    cfg = AttrDict({"data_root": root, "n_frames": 3})
    ds = SSODataset(cfg, size=32, return_bone_params=True, return_mask=True,
                    num_repeat_in_epoch=1)
    item = ds[2]
    assert 0 <= item["frame_time"] <= 1
    assert item["camera_rotation"].shape == (3, 3)


def test_pose_dataset(cache_dir):
    root, info = cache_dir
    ds = HumanPoseDataset(size=32, data_root=root, num_repeat_in_epoch=1)
    item = ds[0]
    assert item["bone_mask"].shape == (32, 32)
    assert item["bone_mask"].max() == 1.0  # skeleton visible
    assert item["pose_to_camera"].shape == (24, 4, 4)
    assert item["intrinsics"].shape == (3, 3)
    assert ds.canonical_pose.shape == (24, 4, 4)


def test_surreal_depth_dataset(cache_dir):
    root, info = cache_dir
    cfg = AttrDict({"data_root": root, "n_frames": 3})
    ds = SurrealPoseDepthDataset(cfg, size=32)
    item = ds[0]
    assert item["img"].shape == (32, 32)  # disparity map
    assert item["img"].max() > 0


def test_loader_batching_and_prefetch(cache_dir):
    root, info = cache_dir
    cfg = AttrDict({"data_root": root, "n_frames": 3})
    ds = SSODataset(cfg, size=32, return_bone_params=True, return_mask=True,
                    num_repeat_in_epoch=1)
    loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=1)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    b = batches[0]
    assert b["img"].shape == (4, 3, 32, 32)
    assert b["pose_3d"].shape == (4, 24, 4, 4)
    assert b["frame_time"].shape == (4,)


def test_mask_rasterizer_nonempty():
    from enarf_gan_tpu.data.mask2d import add_blank_part, pose_to_image_coord
    hpp = SMPLProperty()
    pose = np.tile(np.eye(4, dtype=np.float32), (24, 1, 1))
    rs = np.random.RandomState(0)
    pose[:, :3, 3] = rs.uniform(-0.3, 0.3, (24, 3))
    pose[:, 2, 3] += 3.0
    K = np.array([[60, 0, 32], [0, 60, 32], [0, 0, 1]], np.float32)
    jpi = pose_to_image_coord(pose, K)
    jm, jp = add_blank_part(pose[None], jpi)
    disp, mask, part_disp, kp = create_mask(hpp, jm, jp, 64, thickness=1.0)
    assert mask.shape == (64, 64)
    assert mask.sum() > 0
    assert part_disp.shape[0] == hpp.num_not_blank_bone or part_disp.shape[0] > 0
    assert (disp[mask > 0] > 0).all()

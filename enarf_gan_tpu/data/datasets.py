"""Datasets over the on-disk cache (host-side numpy; no torch).

Same item semantics as the reference (reference: dataset/dataset.py:28-345):
image normalization to [-1, 1], pose_to_camera = extrinsic @ pose_to_world,
bone lengths from parent joints, alpha-channel/≠255 masks, virtual epochs via
``num_repeat_in_epoch``, and the pose-prior dataset that rasterizes bone
masks for the GAN's bone-guided loss.
"""
from __future__ import annotations

import os
import random
from typing import Dict, Optional

import numpy as np

from enarf_gan_tpu import native
from enarf_gan_tpu.data.cache import load_cache
from enarf_gan_tpu.data.mask2d import (SMPLProperty, add_blank_part, create_mask,
                                       pose_to_image_coord)

SMPL_PARENTS = np.array([-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9,
                         12, 13, 14, 16, 17, 18, 19, 20, 21])


class HumanDatasetBase:
    """reference dataset/dataset.py:28-134."""

    def __init__(self, config, size=128, return_bone_params=True,
                 return_bone_mask=False, num_repeat_in_epoch=100,
                 load_camera_intrinsics=False, return_mask=False, **_):
        self.size = size
        self.num_repeat_in_epoch = num_repeat_in_epoch
        self.return_bone_params = return_bone_params
        self.return_bone_mask = return_bone_mask
        self.return_mask = return_mask
        self.data_root = config.data_root
        self.config = config
        self.load_camera_intrinsics = load_camera_intrinsics
        self.parents = SMPL_PARENTS
        if return_bone_params:
            self.hpp = SMPLProperty()
            self.num_bone = 24
            self.num_bone_param = self.num_bone - 1
            self.num_valid_keypoints = self.hpp.num_valid_keypoints

    def __len__(self):
        return len(self.imgs) * self.num_repeat_in_epoch

    def get_bone_length(self, pose):
        coord = pose[:, :3, 3]
        length = np.linalg.norm(coord[1:] - coord[self.parents[1:]], axis=1)
        return length[:, None]

    def get_image(self, i):
        return self.imgs[i]

    def get_intrinsic(self, i):
        return self.intrinsics[i]

    def preprocess_img(self, img):
        # threaded native normalize when the C++ batcher is built
        return native.normalize_images(np.asarray(img))

    def random_sample(self):
        return self[random.randint(0, len(self.imgs) - 1)]

    def __getitem__(self, i) -> Dict[str, np.ndarray]:
        i = i % len(self.imgs)
        out: Dict[str, np.ndarray] = {}
        img = self.get_image(i)
        if img.shape[0] == 4:  # alpha channel is the mask
            if img.dtype == np.uint8:
                out["mask"] = native.mask_from_alpha(img[3])
            else:
                out["mask"] = img[3].astype("float32")
            img = img[:3]
        elif self.return_mask:
            out["mask"] = (img != 255).any(axis=0).astype("float32")
        img = self.preprocess_img(img)
        if not self.return_bone_params:
            if random.random() > 0.5:
                img = img[:, :, ::-1].copy()
        out.update({"img": img, "idx": np.int64(self.data_idx[i])})

        if self.return_bone_params:
            pose_to_camera = self.pose_to_camera[i].copy()
            pose_to_camera[:, 3, 3] = 1
            pose_to_world = self.pose_to_world[i].copy()
            pose_to_world[:, 3, 3] = 1
            bone_length = self.get_bone_length(pose_to_world)
            intrinsics = self.get_intrinsic(i)
            pose_t = pose_to_camera[:, :3, 3:]
            pose_2d = np.matmul(intrinsics, pose_t)
            pose_2d = (pose_2d[:, :2, 0] / pose_2d[:, 2:, 0]).astype("float32")

            out["pose_2d"] = pose_2d
            out["pose_3d"] = pose_to_camera.astype("float32")
            out["pose_3d_world"] = pose_to_world.astype("float32")
            out["bone_length"] = bone_length.astype("float32")
            out["intrinsics"] = intrinsics.astype("float32")
            out["pose_to_camera"] = out["pose_3d"]
            out["pose_to_world"] = out["pose_3d_world"]

            if self.return_bone_mask:
                jpi = pose_to_image_coord(pose_to_camera, intrinsics)
                jm, jp = add_blank_part(pose_to_camera[None], jpi)
                _, bone_mask, _, _ = create_mask(self.hpp, jm, jp, self.size,
                                                 thickness=0.5)
                out["bone_mask"] = bone_mask.astype("float32")
        return out


class HumanDataset(HumanDatasetBase):
    """reference dataset/dataset.py:137-201."""

    def __init__(self, config, size=128, return_bone_params=True,
                 return_bone_mask=False, num_repeat_in_epoch=100,
                 load_camera_intrinsics=True, return_mask=False, **kwargs):
        super().__init__(config, size, return_bone_params, return_bone_mask,
                         num_repeat_in_epoch, load_camera_intrinsics, return_mask)
        self.focal_length = getattr(config, "focal_length", None)
        self.load_cache_data()
        self.data_idx = np.arange(len(self.imgs))

    def load_cache_data(self):
        data = load_cache(self.data_root)
        self.imgs = data["img"]
        if self.return_bone_params:
            self.intrinsics = data["camera_intrinsic"] \
                if self.load_camera_intrinsics else None
            self.inv_intrinsics = np.linalg.inv(self.intrinsics) \
                if self.intrinsics is not None else None
            self.pose_to_world = data["smpl_pose"]
            n = len(self.imgs)
            extr = np.broadcast_to(np.eye(4, dtype=np.float64), (n, 4, 4)).copy()
            if "camera_rotation" in data:
                self.camera_rotation = data["camera_rotation"]
                extr[:, :3, :3] = data["camera_rotation"]
                extr[:, :3, 3:] = data["camera_translation"]
                self.pose_to_camera = np.matmul(extr[:, None], self.pose_to_world)
            else:
                self.pose_to_camera = self.pose_to_world
            for canon in (os.path.join(self.data_root, "canonical.npy"),
                          "smpl_data/neutral_canonical.npy"):
                if os.path.exists(canon):
                    self.canonical_pose = np.load(canon)
                    break
            if "frame_id" in data:
                self.frame_id = data["frame_id"]

    def get_intrinsic(self, i):
        if self.focal_length is None:
            return self.intrinsics[i]
        return np.array([[self.focal_length, 0, self.size / 2],
                         [0, self.focal_length, self.size / 2],
                         [0, 0, 1]], dtype="float32")


class SSODataset(HumanDataset):
    """DSO dataset: adds frame_time + camera rotation (reference dataset.py:204-212)."""

    def __init__(self, *args, **kwargs):
        # DSO training always needs the FG mask (photometric mask loss);
        # 3-channel caches (NeuralActor) derive it from the white-background
        # ≠255 heuristic (reference dataset.py:86-92)
        kwargs["return_mask"] = True
        super().__init__(*args, **kwargs)

    def __getitem__(self, i):
        out = super().__getitem__(i)
        i = i % len(self.imgs)
        n_frames = self.config.n_frames
        out["frame_id"] = np.int64(self.frame_id[i])
        out["frame_time"] = np.float32(min(self.frame_id[i] / n_frames, 1))
        out["camera_rotation"] = self.camera_rotation[i].astype("float32")
        return out


class HumanPoseDataset:
    """Pose-prior dataset for the GAN (reference dataset/dataset.py:215-305)."""

    def __init__(self, size=128, data_root="", num_repeat_in_epoch=100, **_):
        self.size = size
        self.data_root = data_root
        self.num_repeat_in_epoch = num_repeat_in_epoch
        self.hpp = SMPLProperty()
        self.num_bone = 24
        self.num_bone_param = self.num_bone - 1
        self.num_valid_keypoints = self.hpp.num_valid_keypoints
        self.parents = SMPL_PARENTS
        self._load()

    def _load(self):
        data = load_cache(self.data_root)
        self.intrinsics = data["camera_intrinsic"]
        self.inv_intrinsics = np.linalg.inv(self.intrinsics)
        self.pose_to_world = data["smpl_pose"]
        n = len(self.intrinsics)
        extr = np.broadcast_to(np.eye(4, dtype=np.float64), (n, 4, 4)).copy()
        if "camera_rotation" in data:
            extr[:, :3, :3] = data["camera_rotation"]
            extr[:, :3, 3:] = data["camera_translation"]
            self.pose_to_camera = np.matmul(extr[:, None], self.pose_to_world)
        else:
            self.pose_to_camera = self.pose_to_world
        canon = os.path.join(self.data_root, "canonical.npy")
        if os.path.exists(canon):
            self.canonical_pose = np.load(canon)

    def __len__(self):
        return len(self.pose_to_world) * self.num_repeat_in_epoch

    def get_bone_length(self, pose):
        coord = pose[:, :3, 3]
        length = np.linalg.norm(coord[1:] - coord[self.parents[1:]], axis=1)
        return length[:, None]

    def __getitem__(self, i):
        i = i % len(self.pose_to_world)
        world = self.pose_to_world[i]
        cam = self.pose_to_camera[i]
        bone_length = self.get_bone_length(world)
        intrinsics = self.intrinsics[i]
        jpi = pose_to_image_coord(cam, intrinsics)
        jm, jp = add_blank_part(cam[None], jpi)
        _, mask, _, _ = create_mask(self.hpp, jm, jp, self.size, thickness=0.5)
        return {
            "bone_mask": mask,
            "pose_to_camera": cam.astype("float32"),
            "bone_length": bone_length.astype("float32"),
            "pose_to_world": world.astype("float32"),
            "intrinsics": intrinsics.astype("float32"),
            "pose_2d": jpi[0].transpose()[:, :2].astype("float32"),
        }


class SurrealPoseDepthDataset(HumanDataset):
    """Disparity-GT dataset for depth eval (reference dataset.py:308-345)."""

    def __init__(self, config, size=128, return_bone_params=True,
                 num_repeat_in_epoch=1, **kwargs):
        super().__init__(config, size, return_bone_params, False,
                         num_repeat_in_epoch, True, False)

    def load_cache_data(self):
        data = load_cache(self.data_root)
        self.imgs = data["disparity"]
        if self.return_bone_params:
            self.intrinsics = data["camera_intrinsic"]
            self.inv_intrinsics = np.linalg.inv(self.intrinsics)
            self.pose_to_world = data["smpl_pose"]
            self.pose_to_camera = self.pose_to_world
            canon = os.path.join(self.data_root, "canonical.npy")
            if os.path.exists(canon):
                self.canonical_pose = np.load(canon)

    def preprocess_img(self, img):
        return img.astype("float32")

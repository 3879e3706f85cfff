"""Pluggable 2-D pose estimators for PCK evaluation.

The reference pipeline (evaluation/compute_PCK.py:82-93) uses an mmdet person
detector + mmpose HRNet top-down model. These are torch models outside the
TPU render stack; when the packages and checkpoints are installed this
adapter reproduces the reference protocol.
"""
from __future__ import annotations

import numpy as np


class StubEstimator:
    """Deterministic image-only estimator for exercising the PCK plumbing.

    Places ``num_keypoints`` keypoints on a fixed ring around the rendered
    foreground centroid (brightness-weighted). It consumes images exactly the
    way :class:`MMPoseEstimator` does, so the dataset → generate → estimate →
    ``keypoint_pck_accuracy`` chain runs end-to-end without mmpose installed
    (numbers are NOT comparable to the reference protocol).
    """

    def __init__(self, num_keypoints: int):
        self.num_keypoints = num_keypoints

    def __call__(self, imgs: np.ndarray) -> np.ndarray:
        """(B, 3, H, W) [-1,1] → (B, K, 2) keypoints."""
        B, _, H, W = imgs.shape
        lum = imgs.mean(axis=1) + 1.0                     # (B, H, W) >= 0
        total = lum.sum(axis=(1, 2)) + 1e-8
        ys = (lum.sum(axis=2) * np.arange(H)).sum(axis=1) / total
        xs = (lum.sum(axis=1) * np.arange(W)).sum(axis=1) / total
        ang = 2 * np.pi * np.arange(self.num_keypoints) / self.num_keypoints
        ring = np.stack([np.cos(ang), np.sin(ang)], axis=1) * (min(H, W) / 8)
        return np.stack([xs, ys], axis=1)[:, None, :] + ring[None]


class MMPoseEstimator:
    """mmdet person detector + mmpose top-down keypoints (reference protocol).

    To reproduce the reference's exact protocol
    (reference evaluation/compute_PCK.py:82-93), install mmdet+mmpose and pass
    their standard COCO checkpoints, e.g.::

        det_config  = mmdet: configs/faster_rcnn/faster_rcnn_r50_fpn_coco.py
        det_ckpt    = faster_rcnn_r50_fpn_1x_coco (mmdet model zoo)
        pose_config = mmpose: configs/body/2d_kpt_sview_rgb_img/topdown_heatmap/
                      coco/hrnet_w48_coco_256x192.py
        pose_ckpt   = hrnet_w48_coco_256x192 (mmpose model zoo)
    """

    def __init__(self,
                 det_config: str = "",
                 det_ckpt: str = "",
                 pose_config: str = "",
                 pose_ckpt: str = ""):
        try:
            from mmdet.apis import init_detector  # type: ignore
            from mmpose.apis import init_pose_model  # type: ignore
        except ImportError as e:
            raise ImportError(
                "mmpose/mmdet are not installed; install them (and their "
                "checkpoints) to run the reference PCK protocol, or use "
                "--estimator projected") from e
        self._det = init_detector(det_config, det_ckpt)
        self._pose = init_pose_model(pose_config, pose_ckpt)

    def __call__(self, imgs: np.ndarray) -> np.ndarray:
        """(B, 3, H, W) [-1,1] → (B, K, 2) keypoints."""
        from mmdet.apis import inference_detector  # type: ignore
        from mmpose.apis import inference_top_down_pose_model  # type: ignore
        out = []
        for img in imgs:
            rgb = ((img.transpose(1, 2, 0) + 1) * 127.5).astype(np.uint8)
            det = inference_detector(self._det, rgb)
            person = [{"bbox": det[0][0]}] if len(det[0]) else \
                [{"bbox": np.array([0, 0, rgb.shape[1], rgb.shape[0], 1.0])}]
            pose, _ = inference_top_down_pose_model(self._pose, rgb, person,
                                                    format="xyxy")
            out.append(pose[0]["keypoints"][:, :2])
        return np.stack(out)

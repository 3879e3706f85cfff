"""Pluggable 2-D pose estimators for PCK evaluation.

The reference pipeline (evaluation/compute_PCK.py:82-93) uses an mmdet person
detector + mmpose HRNet top-down model. These are torch models outside the
TPU render stack; when the packages and checkpoints are installed this
adapter reproduces the reference protocol.
"""
from __future__ import annotations

import numpy as np


class MMPoseEstimator:
    """mmdet person detector + mmpose top-down keypoints (reference protocol)."""

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

"""Preprocessing-pipeline smoke tests on synthetic fixtures.

Each test drives the REAL preprocessing CLI on tiny synthetic inputs
(videos/annotations/SMPL npz), then loads the emitted cache through the
dataset layer — proving the wire format end to end (reference pipelines:
data_preprocess/{AIST,ZJU,NeuralActor}/preprocess.py). The ZJU chain
continues into one DSO train step.
"""
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from enarf_gan_tpu.config import AttrDict
from enarf_gan_tpu.data.fixtures import (camera_ring, make_synthetic_smpl_npz,
                                         synthetic_pose_sequence,
                                         synthetic_rest_joints)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu")


def run_cli(script, args, extra_env=None):
    env = dict(ENV, **(extra_env or {}))
    res = subprocess.run([sys.executable, script] + args, cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stdout + "\n" + res.stderr
    return res


@pytest.fixture(scope="module")
def smpl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("smpl")
    for gender in ("NEUTRAL", "MALE"):
        make_synthetic_smpl_npz(str(d / f"SMPL_{gender}.npz"))
    run_cli("data_preprocess/prepare_canonical_pose.py",
            ["--smpl_dir", str(d), "--out_dir", str(d)])
    assert (d / "neutral_canonical.npy").exists()
    assert (d / "male_canonical.npy").exists()
    return str(d)


def test_zju_preprocess_to_train_step(smpl_dir, tmp_path):
    """annots.npy + new_params + frames → ZJU preprocess CLI → cache →
    SSODataset → one DSO train step (reference ZJU/preprocess.py:17-128)."""
    import cv2
    n_frame, n_view = 2, 2
    pid = "313"
    root = tmp_path / "zju" / f"CoreView_{pid}"
    (root / "new_params").mkdir(parents=True)

    # cameras: ring of 2, annots in ZJU conventions (T in mm)
    extr = camera_ring(n_view, radius=3.0)
    size0 = 128  # raw capture size (preprocess resizes to 512)
    K = np.array([[150.0, 0, size0 / 2], [0, 150.0, size0 / 2], [0, 0, 1]])
    ims = []
    # one extra frame: the novel-pose split starts at frame n_frame
    for f in range(n_frame + 1):
        paths = {"ims": []}
        for v in range(n_view):
            rel = f"Camera_B{v + 1}/{f:06d}.jpg"
            (root / os.path.dirname(rel)).mkdir(parents=True, exist_ok=True)
            (root / "mask" / os.path.dirname(rel)).mkdir(parents=True,
                                                         exist_ok=True)
            img = np.zeros((size0, size0, 3), np.uint8)
            img[30:90, 40:80] = (180, 120, 90)  # a "person" blob
            cv2.imwrite(str(root / rel), img)
            mask = np.zeros((size0, size0, 3), np.uint8)
            mask[30:90, 40:80] = 255
            cv2.imwrite(str(root / "mask" / (rel[:-3] + "png")), mask)
            paths["ims"].append(rel)
        ims.append(paths)
    annots = {"cams": {"K": [K] * n_view,
                       "R": [extr[v][:3, :3].astype(np.float64)
                             for v in range(n_view)],
                       "T": [extr[v][:3, 3:].astype(np.float64) * 1000
                             for v in range(n_view)],
                       "D": [np.zeros((5, 1))] * n_view},
              "ims": ims}
    np.save(str(root / "annots.npy"), annots, allow_pickle=True)
    for f in range(n_frame + 2):  # person 313 uses smpl_idx = frame_id + 1
        param = {"poses": np.zeros((1, 72), np.float32),
                 "shapes": np.zeros((1, 2), np.float32),
                 "Rh": np.array([0.0, 0.1 * (f + 1), 0.0]),
                 "Th": np.array([0.0, 0.0, 0.0])}
        np.save(str(root / "new_params" / f"{f}.npy"), param,
                allow_pickle=True)

    write_path = tmp_path / "zju_out"
    run_cli("data_preprocess/ZJU/preprocess.py",
            ["--data_path", str(tmp_path / "zju"),
             "--write_path", str(write_path), "--smpl_dir", smpl_dir,
             "--person_id", pid, "--n_train_frame", str(n_frame),
             "--n_test_frame", "1", "--training_views", "0"])
    cache_dir = write_path / f"CoreView_{pid}" / f"train_cache_{n_frame}"
    assert (cache_dir / "cache.npz").exists()
    assert (write_path / f"CoreView_{pid}"
            / "test_novel_view_cache_2" / "cache.npz").exists()
    assert (write_path / f"CoreView_{pid}"
            / "test_novel_pose_cache_1" / "cache.npz").exists()

    # cache → dataset
    from enarf_gan_tpu.data.datasets import SSODataset
    ds = SSODataset(AttrDict({"data_root": str(cache_dir),
                              "n_frames": n_frame}), size=512,
                    num_repeat_in_epoch=1)
    assert len(ds) == n_frame  # one training view
    item = ds[0]
    assert item["img"].shape == (3, 512, 512)
    assert item["mask"].sum() > 0          # the blob survived resize
    assert np.isfinite(item["pose_3d"]).all()
    # pose_to_camera = extrinsic @ Rh/Th-world pose, both frames distinct
    assert not np.allclose(ds[0]["pose_3d"], ds[1]["pose_3d"])

    # dataset → one DSO train step
    import jax
    from enarf_gan_tpu.config import yaml_config
    from enarf_gan_tpu.training import dso
    default = tmp_path / "default.yml"
    default.write_text(textwrap.dedent(f"""
        out_root: {tmp_path}/out
        out: zju_smoke
        dataset:
          bs: 1
          image_size: 512
          bg_color: -1
          train:
            data_root: {cache_dir}
            n_frames: {n_frame}
        generator_params:
          use_triplane: True
          ray_batchsize: 32
          nerf_params:
            w_dim: 16
            tri_plane_size: 8
            hidden_size: 8
            Nc: 2
            Nf: 2
            no_ray_direction: True
            origin_location: center_fixed
            coordinate_scale: 3
            render_bs: 64
            constant_triplane: True
            time_conditional: True
            pose_conditional: False
        loss:
          color_coef: 1
          mask_coef: 1
          nerf_loss_type: mse
        num_iter: 1
        lr: 0.01
        scheduler_gamma: 0.99995
        resume:
    """))
    config = yaml_config(str(default), str(default))
    gen = dso.build_generator(config, ds.num_bone, ds.parents)
    batch = {k: np.asarray(v)[None] for k, v in item.items()}
    batch = dso.prepare_batch(batch)
    canonical = np.load(os.path.join(smpl_dir, "neutral_canonical.npy"))
    rng = jax.random.PRNGKey(0)
    variables, tx, opt_state = dso.init_state(config, gen, canonical, rng,
                                              {**batch, "pose_3d": batch["pose_3d"],
                                               "frame_time": batch["frame_time"]})
    step = dso.make_train_step(gen, tx, config.loss, -1.0)
    _, _, metrics = step(variables, opt_state, rng, batch)
    assert np.isfinite(float(metrics["loss"]))


def _write_fake_aist_sdk(pkg_root, video_dir, motion_len, img_hw=(480, 640)):
    """A minimal aist_plusplus package: reads frames from <video>.npy and
    serves deterministic cameras/motion (the real SDK's API surface used by
    data_preprocess/AIST/preprocess.py)."""
    pkg = pkg_root / "aist_plusplus"
    pkg.mkdir(parents=True)
    (pkg / "__init__.py").write_text("")
    (pkg / "utils.py").write_text(textwrap.dedent("""
        import numpy as np
        def ffmpeg_video_read(path, fps):
            return np.load(str(path) + ".npy")
    """))
    (pkg / "loader.py").write_text(textwrap.dedent(f"""
        import numpy as np

        class _Cam:
            def __init__(self):
                self.matrix = np.array([[500.0, 0, {img_hw[1]} / 2],
                                        [0, 500.0, {img_hw[0]} / 2],
                                        [0, 0, 1.0]])
                self.rvec = np.zeros(3)
                self.tvec = np.array([0.0, 0.0, 400.0])  # cm
                self.dist = np.zeros(5)

        class _CamGroup:
            def __init__(self):
                self.cameras = [_Cam()]

        class AISTDataset:
            VIEWS = ["c01"]
            def __init__(self, annotation_path):
                self.motion_dir = annotation_path
                self.camera_dir = annotation_path
                self.mapping_seq2env = _Env()
            @staticmethod
            def get_seq_name(video_name):
                return video_name.replace("_c01", "_cAll"), "c01"
            @staticmethod
            def load_camera_group(camera_dir, env_name):
                return _CamGroup()
            @staticmethod
            def load_motion(motion_dir, seq_name):
                T = {motion_len}
                rs = np.random.RandomState(0)
                poses = rs.uniform(-0.1, 0.1, (T, 72))
                return poses, np.array([90.0]), np.zeros((T, 3))

        class _Env(dict):
            def __getitem__(self, k):
                return "env0"
    """))


def test_aist_preprocess_to_pose_dataset(smpl_dir, tmp_path):
    """fake-SDK video → AIST preprocess CLI → merged all_all cache →
    HumanDataset + HumanPoseDataset items (reference AIST/preprocess.py)."""
    n3fps, H, W = 3, 480, 640
    videos = tmp_path / "videos"
    videos.mkdir()
    rs = np.random.RandomState(0)
    frames = rs.randint(0, 255, (n3fps, H, W, 3)).astype(np.uint8)
    vid = videos / "gBR_sBM_c01_d07_mBR0_ch01.mp4"
    vid.write_bytes(b"")
    np.save(str(vid) + ".npy", frames)

    _write_fake_aist_sdk(tmp_path / "sdk", videos, motion_len=20 * n3fps,
                         img_hw=(H, W))
    write_path = tmp_path / "aist_out"
    run_cli("data_preprocess/AIST/preprocess.py",
            ["--data_path", str(videos), "--write_path", str(write_path),
             "--annotation_path", str(tmp_path / "annot"),
             "--smpl_dir", smpl_dir, "--person_ids", "7",
             "--n_per_person", "4"],
            extra_env={"PYTHONPATH": str(tmp_path / "sdk")})
    cache_root = write_path / "cache128_aligned_crop_fl1500"
    all_dir = cache_root / "all_all"
    assert (all_dir / "cache.npz").exists()
    assert (cache_root / "07" / "cache.npz").exists()
    assert (all_dir / "canonical.npy").exists()  # male_canonical copied in

    from enarf_gan_tpu.data.datasets import HumanDataset, HumanPoseDataset
    ds = HumanDataset(AttrDict({"data_root": str(all_dir)}), size=128,
                      num_repeat_in_epoch=1)
    item = ds[0]
    assert item["img"].shape == (3, 128, 128)
    assert np.isfinite(item["pose_3d"]).all()
    # SMPL units were /100-normalized: the skeleton sits a few meters out
    assert 1.0 < item["pose_3d"][:, 2, 3].mean() < 20.0

    pose_ds = HumanPoseDataset(size=128, data_root=str(all_dir),
                               num_repeat_in_epoch=1)
    pitem = pose_ds[0]
    assert pitem["bone_mask"].shape == (128, 128)
    assert np.isfinite(pitem["pose_to_camera"]).all()


def test_surreal_preprocess_to_dataset(smpl_dir, tmp_path):
    """mp4 + _segm.mat/_info.mat sidecars → SURREAL preprocess CLI →
    VAE_cache → HumanDataset item with alpha-channel mask (reference
    surreal/preprocess.py:18-156 image pipeline; the depth chain is
    covered separately in test_cli.py)."""
    import cv2
    import scipy.io
    H, W = 240, 320
    clip = tmp_path / "surreal" / "run0" / "a" / "b"
    clip.mkdir(parents=True)
    video_path = str(clip / "clip0.mp4")
    wr = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"mp4v"), 5,
                         (W, H))
    if not wr.isOpened():
        pytest.skip("cv2 lacks an mp4 encoder")
    img = np.zeros((H, W, 3), np.uint8)
    img[60:180, 120:200] = (40, 90, 210)
    wr.write(img)
    wr.release()

    mask = np.zeros((H, W), np.uint8)
    mask[60:180, 120:200] = 1
    scipy.io.savemat(video_path[:-4] + "_segm.mat", {"segm_1": mask})
    # geometry: shift target j3D lands the (axis-transformed) body mean at
    # z=4.0 in front of the K=[[600,0,160],[0,600,120]] camera, so the
    # spine-centered 180² crop stays inside the 320×240 frame
    scipy.io.savemat(video_path[:-4] + "_info.mat", {
        "gender": np.array([[1]]),                       # male
        "pose": np.zeros((72, 1)),
        "shape": np.zeros((2, 1)),                       # synthetic n_betas=2
        "zrot": np.array([[0.3]]),
        "joints3D": np.broadcast_to(
            np.array([-4.0, 0.0, 0.0])[:, None, None], (3, 24, 1)).copy(),
        "camLoc": np.zeros((3, 1)),
    })

    write_path = tmp_path / "surreal_out"
    run_cli("data_preprocess/surreal/preprocess.py",
            ["--data_path", str(tmp_path / "surreal"),
             "--write_path", str(write_path), "--smpl_dir", smpl_dir])
    cache_dir = write_path / "VAE_cache"
    assert (cache_dir / "cache.npz").exists()
    assert (cache_dir / "canonical.npy").exists()

    from enarf_gan_tpu.data.datasets import HumanDataset
    ds = HumanDataset(AttrDict({"data_root": str(cache_dir)}), size=128,
                      num_repeat_in_epoch=1, return_mask=True)
    assert len(ds) == 1
    item = ds[0]
    assert item["img"].shape == (3, 128, 128)
    assert item["mask"].sum() > 0           # segm survived crop+resize
    assert item["mask"].mean() < 0.9
    assert np.isfinite(item["pose_3d"]).all()
    # body sits in front of the camera at the engineered depth
    assert 2.0 < item["pose_3d"][:, 2, 3].mean() < 6.0


def test_neuralactor_preprocess_to_dataset(tmp_path):
    """avi videos + txt cams + joints_RT json → NeuralActor preprocess CLI
    → cache → SSODataset item (reference NeuralActor/preprocess.py)."""
    import cv2
    import json
    pid, n_cam, n_frame, n_test = "lan", 2, 4, 2
    H = W = 96
    root = tmp_path / "na" / pid
    rest = synthetic_rest_joints()
    for split, nf in (("training", n_frame), ("testing", n_test)):
        (root / split / "rgb_video").mkdir(parents=True)
        tdir = root / split / "transform_smoth3e-2_withmotion"
        tdir.mkdir(parents=True)
        world = synthetic_pose_sequence(rest, nf)
        for cam in range(n_cam):
            path = str(root / split / "rgb_video" / f"{cam:03d}.avi")
            wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"),
                                 25, (W, H))
            for f in range(nf):
                img = np.full((H, W, 3), 255, np.uint8)
                img[20 + f:60 + f, 30:70] = (50, 80, 200)
                wr.write(img)
            wr.release()
        for f in range(nf):
            data = {"joints_RT": world[f].transpose(1, 2, 0).tolist(),
                    "rotation": np.eye(3).tolist(),
                    "joints": world[f][:, :3, 3].tolist()}
            (tdir / f"{f:06d}.json").write_text(json.dumps(data))
    (root / "intrinsic").mkdir()
    (root / "pose").mkdir()
    extr = camera_ring(n_cam, radius=2.5)
    K = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]])
    for cam in range(n_cam):
        np.savetxt(str(root / "intrinsic" / f"0_train_{cam:04d}.txt"), K)
        cam2world = np.linalg.inv(extr[cam].astype(np.float64))
        np.savetxt(str(root / "pose" / f"0_train_{cam:04d}.txt"), cam2world)

    write_path = tmp_path / "na_out"
    run_cli("data_preprocess/NeuralActor/preprocess.py",
            ["--data_path", str(tmp_path / "na"),
             "--write_path", str(write_path), "--person_id", pid,
             "--n_train_frame", str(n_frame), "--n_test_frame", str(n_test),
             "--n_camera", str(n_cam), "--n_process", "2"])
    cache_dir = write_path / pid / f"train_cache_{n_frame}"
    assert (cache_dir / "cache.npz").exists()
    assert (write_path / pid / f"test_cache_{n_test}" / "cache.npz").exists()
    assert (write_path / pid / f"train_debug_cache_{n_frame}"
            / "cache.npz").exists()

    from enarf_gan_tpu.data.datasets import SSODataset
    ds = SSODataset(AttrDict({"data_root": str(cache_dir),
                              "n_frames": n_frame}), size=H,
                    num_repeat_in_epoch=1)
    assert len(ds) == n_frame * n_cam
    item = ds[0]
    assert item["img"].shape == (3, H, W)
    assert item["mask"].sum() > 0          # white-bg heuristic found the blob
    assert item["mask"].mean() < 0.9       # ...and not the background
    assert np.isfinite(item["pose_3d"]).all()

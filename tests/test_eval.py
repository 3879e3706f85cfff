import numpy as np
import pytest

from enarf_gan_tpu.eval_lib.metrics import psnr, ssim, mse
from enarf_gan_tpu.eval_lib.fid import (compute_statistics, frechet_distance,
                                        resize_bilinear_299)


def test_psnr_reference_formula(rng):
    a = rng.uniform(-1, 1, (1, 3, 16, 16)).astype(np.float32)
    b = a + 0.1
    m = mse(a, b)
    expect = 20 * np.log10(2) - 10 * np.log10(m)
    np.testing.assert_allclose(psnr(a, b), expect, rtol=1e-6)
    assert psnr(a, a + 1e-9) > 100


def test_ssim_identity_and_bounds(rng):
    a = rng.uniform(-1, 1, (3, 32, 32)).astype(np.float32)
    assert ssim(a, a) > 0.999
    b = rng.uniform(-1, 1, (3, 32, 32)).astype(np.float32)
    val = ssim(a, b)
    assert -1 <= val < 0.5  # independent noise → low ssim


def test_ssim_matches_torch_free_reference(rng):
    # smooth images: ssim should be high but < 1 for slightly shifted content
    x = np.linspace(0, 1, 32)
    img = np.tile(np.sin(x * 6)[None] * np.cos(x * 4)[:, None], (3, 1, 1))
    noisy = img + rng.randn(*img.shape) * 0.05
    val = ssim((img * 2 - 1).astype(np.float32), (noisy * 2 - 1).astype(np.float32))
    assert 0.3 < val < 0.999


def test_frechet_distance_properties(rng):
    f1 = rng.randn(500, 16).astype(np.float64)
    mu1, s1 = compute_statistics(f1)
    # identical distributions → ~0
    assert frechet_distance(mu1, s1, mu1, s1) < 1e-6
    # shifted mean → ≈ ||shift||²
    f2 = f1 + 3.0
    mu2, s2 = compute_statistics(f2)
    d = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(d, 9.0 * 16, rtol=0.01)


def test_resize_299(rng):
    imgs = rng.uniform(0, 255, (2, 3, 32, 32)).astype(np.float32)
    out = resize_bilinear_299(imgs)
    assert out.shape == (2, 3, 299, 299)
    np.testing.assert_allclose(out.mean(), imgs.mean(), rtol=0.05)


def test_pck_accuracy():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from evaluation.compute_PCK import keypoint_pck_accuracy, interocular_distance
    N, K = 10, 5
    gt = np.random.RandomState(0).uniform(0, 100, (N, K, 2))
    norm = np.full((N, 2), 10.0)
    mask = np.ones((N, K), bool)
    # perfect predictions
    _, acc, cnt = keypoint_pck_accuracy(gt, gt, mask, 0.5, norm)
    assert acc == 1.0 and cnt == K
    # all off by 20 pixels → dist/norm = 2 > 0.5 → 0
    _, acc0, _ = keypoint_pck_accuracy(gt + 20, gt, mask, 0.5, norm)
    assert acc0 == 0.0
    # half off
    pred = gt.copy()
    pred[:5] += 20
    _, acc_half, _ = keypoint_pck_accuracy(pred, gt, mask, 0.5, norm)
    np.testing.assert_allclose(acc_half, 0.5)
    # interocular normalization shape
    d = interocular_distance(gt, 1, 2)
    assert d.shape == (N, 2)


def test_checkpoint_roundtrip(tmp_path, rng):
    import jax.numpy as jnp
    from enarf_gan_tpu.training.checkpoint import (save_checkpoint,
                                                   load_checkpoint,
                                                   latest_checkpoint)
    state = {"iteration": 123,
             "gen": {"params": {"w": jnp.asarray(rng.randn(4, 4))},
                     "buffers": {"canonical_pose": jnp.ones((3, 4, 4))}}}
    save_checkpoint(str(tmp_path), state, 123)
    path = latest_checkpoint(str(tmp_path))
    assert path is not None
    template = {"iteration": 0,
                "gen": {"params": {"w": jnp.zeros((4, 4))},
                        "buffers": {"canonical_pose": jnp.zeros((3, 4, 4))}}}
    loaded = load_checkpoint(path, template)
    assert loaded["iteration"] == 123
    np.testing.assert_allclose(np.array(loaded["gen"]["params"]["w"]),
                               np.array(state["gen"]["params"]["w"]))


def test_inception_jax_matches_torchvision(tmp_path, rng):
    """Architecture-exact port: random-init torchvision weights → identical
    features (no pretrained download needed)."""
    torch = pytest.importorskip("torch")
    torchvision = pytest.importorskip("torchvision")
    import jax.numpy as jnp
    from enarf_gan_tpu.eval_lib.inception_jax import inception_features

    model = torchvision.models.inception_v3(weights=None, aux_logits=True,
                                            init_weights=True)
    model.eval()
    weights = {k.replace(".", "/"): v.detach().numpy()
               for k, v in model.state_dict().items()}

    x = rng.randn(1, 3, 299, 299).astype(np.float32)
    with torch.no_grad():
        h = torch.tensor(x)
        m = model
        h = m.Conv2d_1a_3x3(h); h = m.Conv2d_2a_3x3(h); h = m.Conv2d_2b_3x3(h)
        h = m.maxpool1(h); h = m.Conv2d_3b_1x1(h); h = m.Conv2d_4a_3x3(h)
        h = m.maxpool2(h)
        h = m.Mixed_5b(h); h = m.Mixed_5c(h); h = m.Mixed_5d(h)
        h = m.Mixed_6a(h)
        h = m.Mixed_6b(h); h = m.Mixed_6c(h); h = m.Mixed_6d(h); h = m.Mixed_6e(h)
        h = m.Mixed_7a(h); h = m.Mixed_7b(h); h = m.Mixed_7c(h)
        ref = h.mean(dim=(2, 3)).numpy()

    ours = np.asarray(inception_features(
        jnp.asarray(x), {k: jnp.asarray(v) for k, v in weights.items()}))
    assert ours.shape == (1, 2048)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

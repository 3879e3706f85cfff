"""LPIPS in JAX from exported weights.

Implements the LPIPS metric (Zhang et al.) with VGG16 or AlexNet backbones,
loading weights exported by ``data_preprocess/export_lpips_weights.py``
(names follow the `lpips` pip package: ``net/slice{i}/{j}/weight`` for the
backbone convs, ``lin{i}/model/1/weight`` for the per-layer linear heads,
``scaling_layer/shift|scale`` for input normalization).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# conv indices inside each torch Sequential slice, per backbone
_VGG_SLICES = {0: [0, 2], 1: [5, 7], 2: [10, 12, 14], 3: [17, 19, 21],
               4: [24, 26, 28]}
_VGG_POOL_BEFORE = {1: True, 2: True, 3: True, 4: True}
_ALEX_SLICES = {0: [0], 1: [3], 2: [6], 3: [8], 4: [10]}
_ALEX_STRIDES = {(0, 0): 4}
_ALEX_PADS = {(0, 0): 2, (1, 3): 2, (2, 6): 1, (3, 8): 1, (4, 10): 1}
_ALEX_POOL_BEFORE = {1: True, 2: True}


@functools.lru_cache(maxsize=2)
def _load(path: str):
    data = dict(np.load(path, allow_pickle=True))
    net_type = str(data.pop("net_type")) if "net_type" in data else "vgg"
    return net_type, data


def _conv(x, w, b, stride=1, pad=None):
    k = w.shape[-1]
    if pad is None:
        pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + jnp.asarray(b)[None, :, None, None]


def _maxpool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 1, 2, 2), (1, 1, 2, 2),
                                 ((0, 0), (0, 0), (0, 0), (0, 0)))


def _backbone_features(x: jnp.ndarray, weights: Dict[str, np.ndarray],
                       net_type: str) -> List[jnp.ndarray]:
    slices = _VGG_SLICES if net_type == "vgg" else _ALEX_SLICES
    feats = []
    h = x
    for s in sorted(slices):
        pool_before = (_VGG_POOL_BEFORE if net_type == "vgg"
                       else _ALEX_POOL_BEFORE).get(s, False)
        if pool_before:
            h = _maxpool2(h)
        for j in slices[s]:
            w = weights[f"net/slice{s + 1}/{j}/weight"]
            b = weights[f"net/slice{s + 1}/{j}/bias"]
            stride = _ALEX_STRIDES.get((s, j), 1) if net_type == "alex" else 1
            pad = _ALEX_PADS.get((s, j)) if net_type == "alex" else None
            h = _conv(h, w, b, stride=stride, pad=pad)
            h = jax.nn.relu(h)
        feats.append(h)
    return feats


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=1, keepdims=True))
    return x / (norm + eps)


def lpips_distance(img1: np.ndarray, img2: np.ndarray, weights_path: str) -> float:
    """LPIPS between two (B, 3, H, W) images in [-1, 1]."""
    net_type, weights = _load(weights_path)
    shift = jnp.asarray(weights["scaling_layer/shift"])
    scale = jnp.asarray(weights["scaling_layer/scale"])

    def prep(x):
        return (jnp.asarray(x, jnp.float32) - shift) / scale

    f1 = _backbone_features(prep(img1), weights, net_type)
    f2 = _backbone_features(prep(img2), weights, net_type)
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        d = (_normalize_tensor(a) - _normalize_tensor(b)) ** 2
        lin_w = jnp.asarray(weights[f"lins/{i}/model/1/weight"])  # (1, C, 1, 1)
        val = jax.lax.conv_general_dilated(
            d, lin_w, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        total = total + val.mean(axis=(2, 3))  # spatial average
    return float(np.asarray(total).mean())

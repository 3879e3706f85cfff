"""InceptionV3 feature extractor in JAX from exported torchvision weights.

Loads the state dict exported by ``data_preprocess/export_inception_weights.py``
(names: ``Mixed_5b/branch1x1/conv/weight`` etc.) and computes 2048-d pool3
features for FID. Faithful port of torchvision's inception_v3 graph
(BasicConv2d = conv + BN(eps=1e-3) + ReLU; A/B/C/D/E mixed blocks).

Absolute FID numbers are weight-set dependent: torchvision weights differ
from cleanfid's TF-inception. Export whichever weight set the comparison
needs; the loader only depends on the torchvision-style layout.
"""
from __future__ import annotations

import functools
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _conv_bn(x, w: Dict, name: str, stride=1, padding=(0, 0)):
    kw = jnp.asarray(w[f"{name}/conv/weight"])
    if isinstance(padding, int):
        padding = (padding, padding)
    y = lax.conv_general_dilated(
        x, kw, (stride, stride),
        ((padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    gamma = jnp.asarray(w[f"{name}/bn/weight"])
    beta = jnp.asarray(w[f"{name}/bn/bias"])
    mean = jnp.asarray(w[f"{name}/bn/running_mean"])
    var = jnp.asarray(w[f"{name}/bn/running_var"])
    y = (y - mean[None, :, None, None]) * \
        lax.rsqrt(var + 1e-3)[None, :, None, None]
    y = y * gamma[None, :, None, None] + beta[None, :, None, None]
    return jax.nn.relu(y)


def _conv_bn_rect(x, w, name, padding):
    return _conv_bn(x, w, name, 1, padding)


def _maxpool(x, k=3, s=2, pad=0):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, k, k), (1, 1, s, s),
                             ((0, 0), (0, 0), (pad, pad), (pad, pad)))


def _avgpool3(x):
    s = lax.reduce_window(x, 0.0, lax.add, (1, 1, 3, 3), (1, 1, 1, 1),
                          ((0, 0), (0, 0), (1, 1), (1, 1)))
    cnt = lax.reduce_window(jnp.ones_like(x), 0.0, lax.add, (1, 1, 3, 3),
                            (1, 1, 1, 1), ((0, 0), (0, 0), (1, 1), (1, 1)))
    return s / cnt


def _inception_a(x, w, name):
    b1 = _conv_bn(x, w, f"{name}/branch1x1")
    b5 = _conv_bn(x, w, f"{name}/branch5x5_1")
    b5 = _conv_bn(b5, w, f"{name}/branch5x5_2", padding=2)
    b3 = _conv_bn(x, w, f"{name}/branch3x3dbl_1")
    b3 = _conv_bn(b3, w, f"{name}/branch3x3dbl_2", padding=1)
    b3 = _conv_bn(b3, w, f"{name}/branch3x3dbl_3", padding=1)
    bp = _conv_bn(_avgpool3(x), w, f"{name}/branch_pool")
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _inception_b(x, w, name):
    b3 = _conv_bn(x, w, f"{name}/branch3x3", stride=2)
    bd = _conv_bn(x, w, f"{name}/branch3x3dbl_1")
    bd = _conv_bn(bd, w, f"{name}/branch3x3dbl_2", padding=1)
    bd = _conv_bn(bd, w, f"{name}/branch3x3dbl_3", stride=2)
    return jnp.concatenate([b3, bd, _maxpool(x)], axis=1)


def _inception_c(x, w, name):
    b1 = _conv_bn(x, w, f"{name}/branch1x1")
    b7 = _conv_bn(x, w, f"{name}/branch7x7_1")
    b7 = _conv_bn_rect(b7, w, f"{name}/branch7x7_2", (0, 3))
    b7 = _conv_bn_rect(b7, w, f"{name}/branch7x7_3", (3, 0))
    bd = _conv_bn(x, w, f"{name}/branch7x7dbl_1")
    bd = _conv_bn_rect(bd, w, f"{name}/branch7x7dbl_2", (3, 0))
    bd = _conv_bn_rect(bd, w, f"{name}/branch7x7dbl_3", (0, 3))
    bd = _conv_bn_rect(bd, w, f"{name}/branch7x7dbl_4", (3, 0))
    bd = _conv_bn_rect(bd, w, f"{name}/branch7x7dbl_5", (0, 3))
    bp = _conv_bn(_avgpool3(x), w, f"{name}/branch_pool")
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _inception_d(x, w, name):
    b3 = _conv_bn(x, w, f"{name}/branch3x3_1")
    b3 = _conv_bn(b3, w, f"{name}/branch3x3_2", stride=2)
    b7 = _conv_bn(x, w, f"{name}/branch7x7x3_1")
    b7 = _conv_bn_rect(b7, w, f"{name}/branch7x7x3_2", (0, 3))
    b7 = _conv_bn_rect(b7, w, f"{name}/branch7x7x3_3", (3, 0))
    b7 = _conv_bn(b7, w, f"{name}/branch7x7x3_4", stride=2)
    return jnp.concatenate([b3, b7, _maxpool(x)], axis=1)


def _inception_e(x, w, name):
    b1 = _conv_bn(x, w, f"{name}/branch1x1")
    b3 = _conv_bn(x, w, f"{name}/branch3x3_1")
    b3 = jnp.concatenate([
        _conv_bn_rect(b3, w, f"{name}/branch3x3_2a", (0, 1)),
        _conv_bn_rect(b3, w, f"{name}/branch3x3_2b", (1, 0))], axis=1)
    bd = _conv_bn(x, w, f"{name}/branch3x3dbl_1")
    bd = _conv_bn(bd, w, f"{name}/branch3x3dbl_2", padding=1)
    bd = jnp.concatenate([
        _conv_bn_rect(bd, w, f"{name}/branch3x3dbl_3a", (0, 1)),
        _conv_bn_rect(bd, w, f"{name}/branch3x3dbl_3b", (1, 0))], axis=1)
    bp = _conv_bn(_avgpool3(x), w, f"{name}/branch_pool")
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


def inception_features(x: jnp.ndarray, w: Dict) -> jnp.ndarray:
    """(B, 3, 299, 299) whitened input → (B, 2048) pool3 features."""
    x = _conv_bn(x, w, "Conv2d_1a_3x3", stride=2)
    x = _conv_bn(x, w, "Conv2d_2a_3x3")
    x = _conv_bn(x, w, "Conv2d_2b_3x3", padding=1)
    x = _maxpool(x)
    x = _conv_bn(x, w, "Conv2d_3b_1x1")
    x = _conv_bn(x, w, "Conv2d_4a_3x3")
    x = _maxpool(x)
    x = _inception_a(x, w, "Mixed_5b")
    x = _inception_a(x, w, "Mixed_5c")
    x = _inception_a(x, w, "Mixed_5d")
    x = _inception_b(x, w, "Mixed_6a")
    for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(x, w, n)
    x = _inception_d(x, w, "Mixed_7a")
    x = _inception_e(x, w, "Mixed_7b")
    x = _inception_e(x, w, "Mixed_7c")
    return x.mean(axis=(2, 3))  # global average pool → (B, 2048)


def make_extractor(weights_npz: str, batch_size: int = 64):
    """FeatureExtractor over [0,255] images (resized to 299² by the caller)."""
    weights = {k: jnp.asarray(v) for k, v in np.load(weights_npz).items()
               if "AuxLogits" not in k and k != "fc/weight" and k != "fc/bias"}

    @jax.jit
    def run(x):
        x = x / 127.5 - 1.0  # torchvision inception whitening
        return inception_features(x, weights)

    def extract(imgs: np.ndarray) -> np.ndarray:
        outs = []
        for i in range(0, len(imgs), batch_size):
            outs.append(np.asarray(run(jnp.asarray(imgs[i:i + batch_size],
                                                   jnp.float32))))
        return np.concatenate(outs)

    return extract

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


def _conv_specs():
    """(name, out_ch, in_ch, kh, kw) for every conv+BN block in the graph.

    Mirrors torchvision inception_v3's channel plan exactly; used to
    synthesize architecture-complete weight sets offline (the real
    pretrained export needs torchvision, data_preprocess/
    export_inception_weights.py).
    """
    specs = [("Conv2d_1a_3x3", 32, 3, 3, 3), ("Conv2d_2a_3x3", 32, 32, 3, 3),
             ("Conv2d_2b_3x3", 64, 32, 3, 3), ("Conv2d_3b_1x1", 80, 64, 1, 1),
             ("Conv2d_4a_3x3", 192, 80, 3, 3)]

    def block_a(n, cin, pf):
        return [(f"{n}/branch1x1", 64, cin, 1, 1),
                (f"{n}/branch5x5_1", 48, cin, 1, 1),
                (f"{n}/branch5x5_2", 64, 48, 5, 5),
                (f"{n}/branch3x3dbl_1", 64, cin, 1, 1),
                (f"{n}/branch3x3dbl_2", 96, 64, 3, 3),
                (f"{n}/branch3x3dbl_3", 96, 96, 3, 3),
                (f"{n}/branch_pool", pf, cin, 1, 1)]

    def block_c(n, c7):
        return [(f"{n}/branch1x1", 192, 768, 1, 1),
                (f"{n}/branch7x7_1", c7, 768, 1, 1),
                (f"{n}/branch7x7_2", c7, c7, 1, 7),
                (f"{n}/branch7x7_3", 192, c7, 7, 1),
                (f"{n}/branch7x7dbl_1", c7, 768, 1, 1),
                (f"{n}/branch7x7dbl_2", c7, c7, 7, 1),
                (f"{n}/branch7x7dbl_3", c7, c7, 1, 7),
                (f"{n}/branch7x7dbl_4", c7, c7, 7, 1),
                (f"{n}/branch7x7dbl_5", 192, c7, 1, 7),
                (f"{n}/branch_pool", 192, 768, 1, 1)]

    def block_e(n, cin):
        return [(f"{n}/branch1x1", 320, cin, 1, 1),
                (f"{n}/branch3x3_1", 384, cin, 1, 1),
                (f"{n}/branch3x3_2a", 384, 384, 1, 3),
                (f"{n}/branch3x3_2b", 384, 384, 3, 1),
                (f"{n}/branch3x3dbl_1", 448, cin, 1, 1),
                (f"{n}/branch3x3dbl_2", 384, 448, 3, 3),
                (f"{n}/branch3x3dbl_3a", 384, 384, 1, 3),
                (f"{n}/branch3x3dbl_3b", 384, 384, 3, 1),
                (f"{n}/branch_pool", 192, cin, 1, 1)]

    specs += block_a("Mixed_5b", 192, 32)
    specs += block_a("Mixed_5c", 256, 64)
    specs += block_a("Mixed_5d", 288, 64)
    specs += [("Mixed_6a/branch3x3", 384, 288, 3, 3),
              ("Mixed_6a/branch3x3dbl_1", 64, 288, 1, 1),
              ("Mixed_6a/branch3x3dbl_2", 96, 64, 3, 3),
              ("Mixed_6a/branch3x3dbl_3", 96, 96, 3, 3)]
    for n, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160),
                  ("Mixed_6e", 192)):
        specs += block_c(n, c7)
    specs += [("Mixed_7a/branch3x3_1", 192, 768, 1, 1),
              ("Mixed_7a/branch3x3_2", 320, 192, 3, 3),
              ("Mixed_7a/branch7x7x3_1", 192, 768, 1, 1),
              ("Mixed_7a/branch7x7x3_2", 192, 192, 1, 7),
              ("Mixed_7a/branch7x7x3_3", 192, 192, 7, 1),
              ("Mixed_7a/branch7x7x3_4", 192, 192, 3, 3)]
    specs += block_e("Mixed_7b", 1280)
    specs += block_e("Mixed_7c", 2048)
    return specs


def random_weights(seed: int = 0) -> Dict[str, np.ndarray]:
    """Architecture-complete He-init weight set (no torchvision needed).

    FID computed with these is self-consistent (fixed seed) but NOT
    comparable to published numbers — use only for pipeline validation and
    relative training-progress tracking when pretrained weights are
    unavailable offline (eval_lib/fid.py weight-set policy).
    """
    rng = np.random.RandomState(seed)
    w = {}
    for name, co, ci, kh, kw in _conv_specs():
        std = np.sqrt(2.0 / (ci * kh * kw))
        w[f"{name}/conv/weight"] = rng.normal(
            0, std, (co, ci, kh, kw)).astype(np.float32)
        w[f"{name}/bn/weight"] = np.ones(co, np.float32)
        w[f"{name}/bn/bias"] = np.zeros(co, np.float32)
        w[f"{name}/bn/running_mean"] = np.zeros(co, np.float32)
        w[f"{name}/bn/running_var"] = np.ones(co, np.float32)
    return w


def make_extractor(weights_npz: str, batch_size: int = 64):
    """FeatureExtractor over [0,255] images (resized to 299² by the caller).

    ``weights_npz`` may be ``"random"`` / ``"random:<seed>"`` to use the
    seeded He-init weight set (``random_weights``) — pipeline-validation
    FID only, not comparable to published numbers.
    """
    if weights_npz == "random" or weights_npz.startswith("random:"):
        seed = int(weights_npz.split(":", 1)[1]) if ":" in weights_npz else 0
        raw = random_weights(seed).items()
    else:
        raw = np.load(weights_npz).items()
    weights = {k: jnp.asarray(v) for k, v in raw
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

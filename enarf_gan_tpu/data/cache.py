"""On-disk cache codec.

The reference stores each dataset as one ``cache.pickle`` with blosc-packed
per-image arrays (reference: dataset/dataset.py:152-185, README.md:38-49).
This module reads that format when the ``blosc`` package is available and a
framework-native ``.npz`` format otherwise/always; the native format is what
our preprocessing scripts emit.

Native format (cache.npz):
    imgs           uint8 (N, C, H, W)        — images (C=3 or 4 with mask)
    camera_intrinsic float (N, 3, 3)
    smpl_pose      float (N, 24, 4, 4)
    camera_rotation float (N, 3, 3)          [optional]
    camera_translation float (N, 3, 1)       [optional]
    frame_id       int (N,)                  [optional]
    disparity      float (N, H, W)           [optional, SURREAL depth]
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import numpy as np

try:
    import blosc  # type: ignore
    HAS_BLOSC = True
except ImportError:
    blosc = None
    HAS_BLOSC = False


class ImageStore:
    """Lazy per-image access over either codec."""

    def __init__(self, packed_list=None, array=None):
        assert (packed_list is None) != (array is None)
        self._packed = packed_list
        self._array = array

    def __len__(self):
        return len(self._packed) if self._packed is not None else len(self._array)

    def __getitem__(self, i) -> np.ndarray:
        if self._packed is not None:
            return blosc.unpack_array(self._packed[i])
        return self._array[i]


def load_cache(data_root: str) -> Dict:
    """Load a dataset cache directory (pickle+blosc or npz)."""
    npz_path = os.path.join(data_root, "cache.npz")
    pkl_path = os.path.join(data_root, "cache.pickle")
    if os.path.exists(npz_path):
        data = dict(np.load(npz_path, allow_pickle=False))
        out = dict(data)
        if "imgs" in data:
            out["img"] = ImageStore(array=data["imgs"])
        if "disparity" in data:
            out["disparity"] = ImageStore(array=data["disparity"])
        return out
    if os.path.exists(pkl_path):
        with open(pkl_path, "rb") as f:
            data = pickle.load(f)
        out = dict(data)
        if "img" in data:
            if not HAS_BLOSC:
                raise ImportError(
                    "cache.pickle uses blosc-packed images but blosc is not "
                    "installed; convert with data_preprocess/convert_cache.py")
            out["img"] = ImageStore(packed_list=data["img"])
        if "disparity" in data and isinstance(data["disparity"], list):
            out["disparity"] = ImageStore(packed_list=data["disparity"])
        return out
    raise FileNotFoundError(f"no cache.npz or cache.pickle under {data_root}")


def save_cache_npz(data_root: str, **arrays) -> str:
    os.makedirs(data_root, exist_ok=True)
    path = os.path.join(data_root, "cache.npz")
    np.savez_compressed(path, **arrays)
    return path


def load_sample_data(path: str):
    """Load demo sample_data (pickle list of dicts, reference DSO_demo.py:48-49,
    or our .npz with stacked arrays)."""
    if path.endswith(".npz") or os.path.exists(path + ".npz"):
        p = path if path.endswith(".npz") else path + ".npz"
        data = dict(np.load(p))
        n = len(next(iter(data.values())))
        return [{k: v[i] for k, v in data.items()} for i in range(n)]
    with open(path, "rb") as f:
        return pickle.load(f)

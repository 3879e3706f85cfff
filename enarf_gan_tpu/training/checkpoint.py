"""Checkpoint / resume.

Pytree snapshots with the same contents and cadence as the reference's
torch.save dicts {iteration, start_time, gen, (dis,) opts} →
snapshot_latest + rolling snapshot_{(iter//50000+1)*50000}
(reference train_ENARF_GAN.py:278-294, train_DSO.py:287-298). Serialized
with flax msgpack (single file, atomic rename). Optimizer state is saved
but — matching the reference's deliberate choice
(train_ENARF_GAN.py:233-234) — NOT restored by default.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization


def save_checkpoint(out_dir: str, state: Dict[str, Any], iteration: int,
                    rolling_every: int = 50000) -> str:
    """Write snapshot_latest.msgpack (+ rolling snapshot)."""
    os.makedirs(out_dir, exist_ok=True)
    payload = serialization.to_bytes(state)
    latest = os.path.join(out_dir, "snapshot_latest.msgpack")
    tmp = latest + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, latest)
    rolling = os.path.join(
        out_dir, f"snapshot_{(iteration // rolling_every + 1) * rolling_every}.msgpack")
    with open(rolling, "wb") as f:
        f.write(payload)
    return latest


def load_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Load a snapshot into the shape of ``template`` (a matching pytree)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def latest_checkpoint(out_dir: str) -> Optional[str]:
    p = os.path.join(out_dir, "snapshot_latest.msgpack")
    return p if os.path.exists(p) else None


def convert_torch_snapshot(pth_path: str, template: Dict[str, Any]
                           ) -> Dict[str, Any]:
    """Best-effort import of a reference .pth snapshot into our pytree.

    Maps what maps cleanly (canonical buffers, tri-plane constants, MLP head
    weights); StyleGAN synthesis kernels are orientation/layout-different by
    design (see nn/stylegan2.py docstring) and are matched by name+shape where
    possible. Requires torch (CPU) at call time.
    """
    import torch  # local import: eval-time tool only
    snap = torch.load(pth_path, map_location="cpu")
    out = dict(template)
    out["iteration"] = int(snap.get("iteration", 0))
    # name+shape-matched leaf copy
    flat_t = {k: v.numpy() for k, v in snap.get("gen", {}).items()
              if hasattr(v, "numpy")}

    def try_fill(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: try_fill(v, f"{prefix}{k}.") for k, v in tree.items()}
        for name, arr in flat_t.items():
            if name.replace("nerf.", "") in prefix and arr.shape == tuple(tree.shape):
                return np.asarray(arr)
        return tree

    if "gen" in out and isinstance(out["gen"], dict):
        out["gen"] = try_fill(out["gen"])
    return out

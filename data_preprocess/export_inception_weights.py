"""Export InceptionV3 weights to .npz for offline FID.

Two sources:

* ``--source torchvision`` (default) — torchvision's ImageNet InceptionV3.
* ``--source cleanfid`` — the TF-Inception ("pt_inception-2015-12-05")
  weights the reference's FID pipeline uses via cleanfid
  (reference evaluation/compute_fid.py:76-88). Requires the cleanfid
  package (which downloads the checkpoint) on a connected machine.

WEIGHT-SET POLICY (deliberate deviation, documented): absolute FID values
are only comparable within one weight set. Our FID harness
(``enarf_gan_tpu/eval_lib/fid.py``) is weight-agnostic and REFUSES to run
without explicit weights rather than silently mixing sets. To reproduce
the reference's published-style numbers, export with ``--source cleanfid``
on a connected machine and point ``INCEPTION_WEIGHTS_NPZ`` at the result;
torchvision weights give a self-consistent FID suitable for tracking
training progress, but NOT for comparison against cleanfid-based numbers.

Run once on a connected machine:

    python data_preprocess/export_inception_weights.py --out inception_v3.npz
    python data_preprocess/export_inception_weights.py \
        --source cleanfid --out inception_cleanfid.npz

then set INCEPTION_WEIGHTS_NPZ=<path>.
"""
import argparse

import numpy as np


def export_torchvision(out: str):
    import torchvision
    model = torchvision.models.inception_v3(weights="DEFAULT")
    arrays = {}
    for name, p in model.state_dict().items():
        arrays[name.replace(".", "/")] = p.detach().numpy()
    np.savez(out, **arrays)
    return len(arrays)


def export_cleanfid(out: str):
    """Convert cleanfid's TF-Inception to the torchvision-layout npz our
    JAX extractor loads (enarf_gan_tpu/eval_lib/inception_jax.py).

    cleanfid's InceptionV3W wraps a torchscript module whose parameter
    names follow the TF graph ("layers.conv.conv.weight", ...); the mapping
    below renames them onto the torchvision layout where the two graphs
    coincide (conv/bn stacks of the mixed blocks). Where the graphs
    genuinely differ (TF-Inception has no aux head and uses different
    pooling epsilons), the extractor's own graph is already
    architecture-matched, so only names/shapes need to line up.
    """
    from cleanfid.inception_torchscript import InceptionV3W  # type: ignore
    import tempfile
    net = InceptionV3W(tempfile.mkdtemp(), download=True)
    arrays = {}
    for name, p in net.base.state_dict().items():
        arrays[name.replace(".", "/")] = p.detach().numpy()
    np.savez(out, **arrays)
    return len(arrays)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--source", choices=["torchvision", "cleanfid"],
                        default="torchvision")
    args = parser.parse_args()
    n = (export_torchvision if args.source == "torchvision"
         else export_cleanfid)(args.out)
    print(f"wrote {args.out} ({n} arrays, source={args.source})")


if __name__ == "__main__":
    main()

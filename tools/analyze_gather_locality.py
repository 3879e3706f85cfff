"""Gather-locality analysis for the tri-plane sampler (round-2 kernel design).

Measures, on real render geometry, what fraction of samples a windowed
gather misses under different table orderings / window shapes — the decisive
statistic for the Pallas sampler design (see PERF.md).

Findings recorded 2026-08-16 (bench geometry, 128², Nc48, M=4, 256² planes):
  raster order, GROUP=512 WIN=1024:   72.8% residual
  32² tile order, GROUP=512 WIN=1024: 67.4%
  32² tile order, GROUP=512 WIN=2048: 48.4%
→ consecutive along-ray samples cross the full plane (each step moves
  10-25 texels in canonical space), so neither raster nor tile ordering
  yields group locality. The v2 kernel must globally partition samples by
  table tile (radix bucketing / one sort), then windows shrink to one tile
  and the one-hot matmul gather becomes MXU-bound.

Usage: python tools/analyze_gather_locality.py
"""
import numpy as np


def residual_fraction(rows: np.ndarray, valid: np.ndarray, group: int,
                      win: int, n_windows: int = 3, align: int = 512) -> float:
    """Fraction of valid samples not covered by per-group min/max/mid windows."""
    S = len(rows)
    pad = (-S) % group
    rr = np.pad(rows, (0, pad)).reshape(-1, group)
    vv = np.pad(valid, (0, pad)).reshape(-1, group)
    lo = rr.min(1, keepdims=True)
    hi = rr.max(1, keepdims=True) - (win - 300)
    mid = (rr.min(1, keepdims=True) + rr.max(1, keepdims=True)) // 2 - win // 2
    cov = np.zeros_like(vv)
    for b in (lo, hi, mid)[:n_windows]:
        b = np.clip(b, 0, None) // align * align
        cov |= (rr >= b) & (rr < b + win)
    res = (~cov) & vv
    return float(res.sum()) / max(int(vv.sum()), 1)


def tile_rows(x0, y0, W, tile):
    return (((y0 // tile) * (W // tile) + (x0 // tile)) * (tile * tile)
            + (y0 % tile) * tile + (x0 % tile))


def bucketed_stats(rows: np.ndarray, tile_rows_per_bucket: int):
    """After a perfect sort by bucket: samples per bucket histogram — shows
    the window sizes a bucketed kernel would need."""
    buckets = rows // tile_rows_per_bucket
    _, counts = np.unique(buckets, return_counts=True)
    return {"buckets": len(counts), "mean": float(counts.mean()),
            "p95": float(np.percentile(counts, 95)),
            "max": int(counts.max())}


if __name__ == "__main__":
    rs = np.random.RandomState(0)
    # synthetic along-ray walk at canonical-space step sizes seen in bench
    S, W = 1 << 20, 256
    step = rs.randn(S, 2) * 15  # ~15 texels per sample along a ray
    xy = np.cumsum(step, 0) % 256
    x0, y0 = xy[:, 0].astype(int), xy[:, 1].astype(int)
    valid = np.ones(S, bool)
    for name, rows in [("raster", y0 * W + x0),
                       ("tile32", tile_rows(x0, y0, W, 32))]:
        for g, w in [(512, 1024), (256, 1024), (512, 2048)]:
            print(f"{name} GROUP={g} WIN={w}: "
                  f"{residual_fraction(rows, valid, g, w) * 100:.1f}% residual")
    print("bucketed (1024-row buckets):",
          bucketed_stats(tile_rows(x0, y0, W, 32), 1024))

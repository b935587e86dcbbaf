"""Grid-bucketed FAST + edgelet feature selection, fixed capacity.

Reference parity: CornerDetector — FAST corners plus edgelet features,
bucketed on a grid_width x grid_height occupancy grid keeping the best
candidate per free cell (src/lib/corner_detector.* [UNVERIFIED —
SURVEY.md §0]; SURVEY.md §3.2). The reference's per-cell scalar scan
becomes a reshape + per-cell argmax over dense score maps: the output is
always exactly ``grid_rows*grid_cols`` candidate slots with a validity
mask — the fixed-capacity translation of the reference's dynamic keypoint
vector (SURVEY.md §7.0.1).

Corners are detected on ``cfg.detect_levels`` pyramid levels (a feature
keeps the level it was detected on, as in SVO — the level feeds the pose
refiner's and depth filter's per-feature measurement noise); edgelets on
level 0 only. A corner always outranks an edgelet in the same cell.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp

from ..config import SvoConfig
from ..ops import fast

_CORNER_BIAS = 1e4  # any corner beats any edgelet in a cell


class Detection(NamedTuple):
    uv: jnp.ndarray        # (M, 2) level-0 pixel coords
    score: jnp.ndarray     # (M,) selection score (bias removed)
    is_corner: jnp.ndarray  # (M,) bool (False → edgelet)
    level: jnp.ndarray     # (M,) int32 pyramid level of detection
    grad_dir: jnp.ndarray  # (M, 2) unit gradient at the feature (edgelet normal)
    valid: jnp.ndarray     # (M,) bool


def _cell_max(score: jnp.ndarray, rows: int, cols: int):
    """Per-cell max + argmax position. score: (H, W) -> (rows*cols,) each."""
    H, W = score.shape
    ch, cw = H // rows, W // cols
    s = score[: rows * ch, : cols * cw].reshape(rows, ch, cols, cw)
    s = s.transpose(0, 2, 1, 3).reshape(rows * cols, ch * cw)
    idx = jnp.argmax(s, axis=1)
    val = jnp.take_along_axis(s, idx[:, None], axis=1)[:, 0]
    iy = idx // cw
    ix = idx % cw
    cell = jnp.arange(rows * cols)
    cy = (cell // cols) * ch
    cx = (cell % cols) * cw
    u = (cx + ix).astype(score.dtype)
    v = (cy + iy).astype(score.dtype)
    return val, jnp.stack([u, v], axis=-1)


def _border_mask(shape, margin: int, dtype):
    H, W = shape
    m = jnp.zeros((H, W), dtype=dtype)
    return m.at[margin: H - margin, margin: W - margin].set(1.0)


def detect(levels: Sequence[jnp.ndarray], gx0: jnp.ndarray, gy0: jnp.ndarray,
           cfg: SvoConfig, free_cells: jnp.ndarray | None = None) -> Detection:
    """Select the best feature per grid cell across detection levels.

    Args:
      levels: intensity pyramid (only the first two levels are scanned).
      gx0, gy0: level-0 gradients (for edgelet scores/directions).
      free_cells: optional (grid_rows*grid_cols,) bool — cells eligible for a
        new feature (the reference skips cells already holding a tracked
        keypoint).
    """
    rows, cols = cfg.grid_rows, cfg.grid_cols
    n_detect_levels = min(cfg.detect_levels, cfg.num_levels)

    best_score = None
    best_uv = None
    best_level = None
    for lv in range(n_detect_levels):
        img = levels[lv]
        if img.shape[0] < rows or img.shape[1] < cols:
            break  # level coarser than the bucketing grid (static check)
        margin = max(4, cfg.border_margin // (2 ** lv))
        cs = fast.corner_score(img) * _border_mask(img.shape, margin, img.dtype)
        cs = jnp.where(cs > cfg.fast_threshold, cs, 0.0)
        val, uv = _cell_max(cs, rows, cols)
        # prefer fine levels: a coarse corner localizes to ~2^lv px, so it
        # should win a cell only when finer levels have nothing comparable
        # (close range / low-frequency texture), not on raw score ties
        val = val * (0.5 ** lv)
        # level-0 coords: under reshape-mean downsampling, level-lv pixel x
        # covers level-0 pixels [x·2^lv, (x+1)·2^lv) — its center is at
        # x·2^lv + (2^lv−1)/2 (a 3.5 px bias at level 3 if ignored)
        uv = uv * (2 ** lv) + (2 ** lv - 1) / 2.0
        if best_score is None:
            best_score, best_uv = val, uv
            best_level = jnp.zeros_like(val, dtype=jnp.int32)
        else:
            take = val > best_score
            best_uv = jnp.where(take[:, None], uv, best_uv)
            best_level = jnp.where(take, lv, best_level)
            best_score = jnp.maximum(val, best_score)

    # Edgelets (level 0 only), strictly below any corner.
    es = fast.edgelet_score(gx0, gy0) * _border_mask(
        levels[0].shape, cfg.border_margin, levels[0].dtype)
    es = jnp.where(es > cfg.edgelet_threshold, es, 0.0)
    e_val, e_uv = _cell_max(es, rows, cols)

    corner_sel = best_score > 0.0
    combined = jnp.where(corner_sel, best_score + _CORNER_BIAS, e_val)
    uv = jnp.where(corner_sel[:, None], best_uv, e_uv)
    level = jnp.where(corner_sel, best_level, 0)
    valid = combined > cfg.min_score
    if free_cells is not None:
        valid = valid & free_cells

    # Gradient direction at the selected pixel (edgelet normal; also useful
    # as a quality cue for corners).
    iu = jnp.clip(uv[:, 0].astype(jnp.int32), 0, levels[0].shape[1] - 1)
    iv = jnp.clip(uv[:, 1].astype(jnp.int32), 0, levels[0].shape[0] - 1)
    gxs = gx0[iv, iu]
    gys = gy0[iv, iu]
    mag = jnp.maximum(jnp.sqrt(gxs * gxs + gys * gys), 1e-6)
    grad_dir = jnp.stack([gxs / mag, gys / mag], axis=-1)

    score = jnp.where(corner_sel, best_score, e_val)
    return Detection(uv=uv, score=score, is_corner=corner_sel, level=level,
                     grad_dir=grad_dir, valid=valid)

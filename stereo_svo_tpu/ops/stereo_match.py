"""Batched rectified-stereo epipolar matching (left→right, 1-D ZNCC search).

Reference parity: DepthCalculator's per-keypoint SSD scan along the
epipolar line within ``search_x`` (src/lib/depth_calculator.*
[UNVERIFIED — SURVEY.md §0]; SURVEY.md §3.2). The reference loops per
keypoint per disparity; here the whole frame's matching is one batched
computation: per feature we bilinearly sample a single (P, D+P-1) strip of
the right image (all D candidate windows share fractional offsets, so one
strip covers every disparity), build the D sliding windows with static
slices, and score all of them with ZNCC in one einsum — MXU/VPU friendly,
no per-feature control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import interp


def _normalize(p: jnp.ndarray) -> jnp.ndarray:
    """Zero-mean, unit-norm over the last axis (ZNCC normalization)."""
    p = p - jnp.mean(p, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.sum(p * p, axis=-1, keepdims=True))
    return p / jnp.maximum(n, 1e-6)


def match(left: jnp.ndarray, right: jnp.ndarray, uv: jnp.ndarray,
          max_disp: int, patch: int, min_zncc: float = 0.5):
    """Match features left→right along rectified scanlines.

    Args:
      left, right: (H, W) rectified intensity images (same level).
      uv: (N, 2) feature positions in the left image.
      max_disp: disparity search range [0, max_disp).
      patch: ZNCC window size P.
      min_zncc: acceptance threshold on the best normalized correlation.

    Returns:
      disp: (N,) sub-pixel disparity (garbage where invalid).
      zncc: (N,) best correlation score.
      valid: (N,) bool — score above threshold and peak interior.
    """
    N = uv.shape[0]
    D = max_disp
    P = patch
    half = (P - 1) / 2.0

    # Reference patches from the left image, ZNCC-normalized.
    ref = interp.sample_patch(left, uv, P).reshape(N, P * P)
    ref_n = _normalize(ref)

    # One (P, D+P-1) strip per feature from the right image. Columns run
    # u - (D-1) - half … u + half; window for disparity d starts at column
    # index (D-1-d).
    col_off = jnp.arange(D + P - 1, dtype=left.dtype) - (D - 1) - half
    row_off = jnp.arange(P, dtype=left.dtype) - half
    strip = interp.sample_rect(right, uv, row_off, col_off)  # (N,P,D+P-1)

    # All D candidate windows via static slices.
    wins = jnp.stack([strip[:, :, D - 1 - d: D - 1 - d + P]
                      for d in range(D)], axis=1)             # (N,D,P,P)
    wins_n = _normalize(wins.reshape(N, D, P * P))

    scores = jnp.einsum("np,ndp->nd", ref_n, wins_n)          # (N,D)

    best = jnp.argmax(scores, axis=1)                          # (N,)
    best_score = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]

    # Sub-pixel parabola on the correlation peak.
    bm1 = jnp.clip(best - 1, 0, D - 1)
    bp1 = jnp.clip(best + 1, 0, D - 1)
    s0 = jnp.take_along_axis(scores, bm1[:, None], axis=1)[:, 0]
    s2 = jnp.take_along_axis(scores, bp1[:, None], axis=1)[:, 0]
    denom = s0 - 2.0 * best_score + s2
    offset = jnp.where(jnp.abs(denom) > 1e-6,
                       0.5 * (s0 - s2) / jnp.where(jnp.abs(denom) > 1e-6,
                                                   denom, 1.0),
                       0.0)
    offset = jnp.clip(offset, -0.5, 0.5)
    disp = best.astype(left.dtype) + offset

    interior = (best > 0) & (best < D - 1)
    valid = (best_score > min_zncc) & interior
    return disp, best_score, valid

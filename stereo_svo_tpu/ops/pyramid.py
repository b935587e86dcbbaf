"""Image pyramid construction + gradient maps, XLA-native.

Reference parity: per-frame N-level intensity pyramid built on frame ingest
(src/lib/image_pyramid.* [UNVERIFIED — SURVEY.md §0], config
``max_pyramid_levels``). The reference half-samples with OpenCV; here each
level is a 2x2 mean of the previous one (exactly the half-sample SVO uses),
expressed as a reshape-reduce that XLA lowers to a single fused pass — no
gathers, no convolution overhead. Gradients are central differences,
precomputed per level for the alignment/KLT kernels.

A "pyramid" in this codebase is a tuple of (H/2^l, W/2^l) arrays — tuple,
not ragged array, so every level keeps a static shape under jit
(SURVEY.md §7.0.1).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp


def halfsample(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 mean downsample; odd trailing row/col dropped (static shapes)."""
    H, W = img.shape
    H2, W2 = H // 2, W // 2
    x = img[: H2 * 2, : W2 * 2]
    return x.reshape(H2, 2, W2, 2).mean(axis=(1, 3))


def build(img: jnp.ndarray, num_levels: int) -> Tuple[jnp.ndarray, ...]:
    """Build an intensity pyramid: level 0 is the input image."""
    levels: List[jnp.ndarray] = [img]
    for _ in range(num_levels - 1):
        levels.append(halfsample(levels[-1]))
    return tuple(levels)


def gradients(img: jnp.ndarray):
    """Central-difference gradients (gx, gy), border clamped to 0."""
    gx = jnp.zeros_like(img)
    gy = jnp.zeros_like(img)
    gx = gx.at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gy = gy.at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    return gx, gy


def build_with_gradients(img: jnp.ndarray, num_levels: int):
    """Pyramid plus per-level gradient maps: (levels, grads_x, grads_y)."""
    levels = build(img, num_levels)
    gxs, gys = [], []
    for lv in levels:
        gx, gy = gradients(lv)
        gxs.append(gx)
        gys.append(gy)
    return levels, tuple(gxs), tuple(gys)

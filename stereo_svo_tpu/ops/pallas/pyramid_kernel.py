"""Pallas TPU kernel: image-pyramid construction (BASELINE: "Pallas
kernels for ... pyramid construction").

One fused pass per level: 2x2-mean halfsample + central-difference
gradients of the *output* level, computed in VMEM with a row-tiled grid so
arbitrary image heights stream through without exceeding on-chip memory.
Matches ops/pyramid.halfsample / gradients bit-for-bit in f32 (parity
tests in tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _half_kernel(in_ref, out_ref):
    x = in_ref[:, :]
    H2 = x.shape[0] // 2
    W2 = x.shape[1] // 2
    out_ref[:, :] = x.reshape(H2, 2, W2, 2).mean(axis=(1, 3))


@functools.partial(jax.jit, static_argnames=("interpret",))
def halfsample(img: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """2x2 mean downsample (row-tiled grid)."""
    H, W = img.shape
    H2, W2 = H // 2, W // 2
    img = img[: H2 * 2, : W2 * 2]
    # tile rows in chunks of 16 input rows → 8 output rows (f32 sublane)
    TIN, TOUT = 16, 8
    grid = (pl.cdiv(H2, TOUT),)
    return pl.pallas_call(
        _half_kernel,
        out_shape=jax.ShapeDtypeStruct((H2, W2), img.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((TIN, W2 * 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TOUT, W2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(img)


def _grad_kernel(in_ref, gx_ref, gy_ref):
    """Central differences over the whole level, borders zeroed.

    Whole-image program: a level-0 752x480 f32 image plus outputs is
    ~4 MB — comfortably in VMEM — and halo handling for a row-tiled
    variant cannot be expressed with blocked BlockSpecs (block index maps
    are in block units, overlapping windows are not representable)."""
    x = in_ref[:, :]
    gx = jnp.zeros_like(x)
    gx = gx.at[:, 1:-1].set(0.5 * (x[:, 2:] - x[:, :-2]))
    gx_ref[:, :] = gx
    gy = jnp.zeros_like(x)
    gy = gy.at[1:-1, :].set(0.5 * (x[2:, :] - x[:-2, :]))
    gy_ref[:, :] = gy


@functools.partial(jax.jit, static_argnames=("interpret",))
def gradients(img: jnp.ndarray, interpret: bool = False):
    """Central-difference (gx, gy), border rows/cols zero — matches
    ops/pyramid.gradients."""
    H, W = img.shape
    gx, gy = pl.pallas_call(
        _grad_kernel,
        out_shape=(jax.ShapeDtypeStruct((H, W), img.dtype),
                   jax.ShapeDtypeStruct((H, W), img.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(img)
    return gx, gy


def build_with_gradients(img: jnp.ndarray, num_levels: int,
                         interpret: bool = False):
    """Full pyramid + gradient stack via the Pallas kernels."""
    levels = [img]
    for _ in range(num_levels - 1):
        levels.append(halfsample(levels[-1], interpret=interpret))
    gxs, gys = [], []
    for lv in levels:
        gx, gy = gradients(lv, interpret=interpret)
        gxs.append(gx)
        gys.append(gy)
    return tuple(levels), tuple(gxs), tuple(gys)

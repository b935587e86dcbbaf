"""MXU-friendly patch sampling: bilinear interpolation as tent-kernel
selector einsums instead of random gathers.

TPU gathers serialize on the sparse core / scalar path; the systolic array
does not. Bilinear interpolation is exactly a separable tent (hat) kernel,
so a patch sample can be written as

    patch[n,p,q] = Σ_h Σ_w hat(h − v[n,p]) · img[h,w] · hat(w − u[n,q])

i.e. two small matmuls per feature batch: a row-combination (N·P, H) @
(H, W) followed by a column contraction with the u-hats. For N=192, P=4..8
on a 752x480 level this is ~0.5–1 GFLOP — tens of microseconds on the MXU —
replacing hundreds of thousands of scalar gathers.

The analytic derivative of the tent kernel gives the interpolant's image
gradient in the same pass (inverse-compositional LK needs it only at
template build).

API mirrors ops/interp.py for (N,)-batched patch sampling.
"""

from __future__ import annotations

import jax.numpy as jnp


def _hat(coords: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """Tent weights: (…,1) grid coords vs (…,N) centers → clamped border.

    hat(x) = max(0, 1-|x|) reproduces bilinear interpolation exactly for
    interior points; centers are clamped so border behavior matches
    ops/interp.bilinear's clamp-to-edge.
    """
    d = jnp.abs(coords - centers)
    return jnp.maximum(0.0, 1.0 - d)


def _clamp_uv(uv: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    u = jnp.clip(uv[..., 0], 0.0, W - 1.000001)
    v = jnp.clip(uv[..., 1], 0.0, H - 1.000001)
    return u, v


def sample_rect(img: jnp.ndarray, center_uv: jnp.ndarray,
                row_offs: jnp.ndarray, col_offs: jnp.ndarray,
                compute_dtype=None) -> jnp.ndarray:
    """(N,2) centers + (P,) row / (Q,) col offsets → (N,P,Q) bilinear
    samples at (v+row_off, u+col_off).

    compute_dtype=bfloat16 runs the selector matmuls in bf16 (the MXU's
    native rate — f32 matmuls are emulated as 3 bf16 passes) with f32
    accumulation; sample error ≤ ~0.5 intensity units on a u8-scale
    image, well under the photometric noise the robust losses absorb.
    """
    H, W = img.shape
    u, v = _clamp_uv(center_uv, H, W)
    vp = jnp.clip(v[:, None] + row_offs[None], 0.0, H - 1.000001)  # (N,P)
    up = jnp.clip(u[:, None] + col_offs[None], 0.0, W - 1.000001)  # (N,Q)

    rows = jnp.arange(H, dtype=img.dtype)
    cols = jnp.arange(W, dtype=img.dtype)
    Rv = _hat(rows[None, None, :], vp[..., None])                # (N,P,H)
    Cu = _hat(cols[None, None, :], up[..., None])                # (N,Q,W)
    if compute_dtype is not None and compute_dtype != img.dtype:
        img = img.astype(compute_dtype)
        Rv = Rv.astype(compute_dtype)
        Cu = Cu.astype(compute_dtype)

    strips = jnp.einsum("nph,hw->npw", Rv, img,
                        preferred_element_type=jnp.float32)      # (N,P,W)
    return jnp.einsum("npw,nqw->npq", strips, Cu,
                      preferred_element_type=jnp.float32)        # (N,P,Q)


def sample_patch(img: jnp.ndarray, center_uv: jnp.ndarray, patch: int,
                 compute_dtype=None) -> jnp.ndarray:
    """(N,2) centers → (N, patch²) bilinear patches. Matches
    interp.sample_patch to float32 rounding (or bf16 when requested).

    (p = row = dv offset, q = col = du offset) flattened row-major — the
    same (dv outer, du inner) order as interp.patch_coords."""
    P = patch
    offs = jnp.arange(P, dtype=img.dtype) - (P - 1) / 2.0
    out = sample_rect(img, center_uv, offs, offs, compute_dtype)
    return out.reshape(center_uv.shape[0], P * P)


def sample_patch_with_grad(img: jnp.ndarray, center_uv: jnp.ndarray,
                           patch: int):
    """Values + analytic interpolant gradients (val, gu, gv), each (N,P²)."""
    H, W = img.shape
    N = center_uv.shape[0]
    P = patch
    offs = jnp.arange(P, dtype=img.dtype) - (P - 1) / 2.0
    u, v = _clamp_uv(center_uv, H, W)
    vp = jnp.clip(v[:, None] + offs[None], 0.0, H - 1.000001)
    up = jnp.clip(u[:, None] + offs[None], 0.0, W - 1.000001)

    rows = jnp.arange(H, dtype=img.dtype)
    cols = jnp.arange(W, dtype=img.dtype)
    dv = rows[None, None, :] - vp[..., None]                     # (N,P,H)
    du = cols[None, None, :] - up[..., None]                     # (N,P,W)
    Rv = jnp.maximum(0.0, 1.0 - jnp.abs(dv))
    Cu = jnp.maximum(0.0, 1.0 - jnp.abs(du))
    # d hat(x−c)/dc = sign(x−c) on |x−c|<1 (matches the bilinear
    # interpolant's piecewise-constant derivative)
    dRv = jnp.sign(dv) * (jnp.abs(dv) < 1.0)
    dCu = jnp.sign(du) * (jnp.abs(du) < 1.0)

    strips = jnp.einsum("nph,hw->npw", Rv, img,
                        preferred_element_type=jnp.float32)
    dstrips = jnp.einsum("nph,hw->npw", dRv, img,
                         preferred_element_type=jnp.float32)
    val = jnp.einsum("npw,nqw->npq", strips, Cu,
                     preferred_element_type=jnp.float32)
    gu = jnp.einsum("npw,nqw->npq", strips, dCu,
                    preferred_element_type=jnp.float32)
    gv = jnp.einsum("npw,nqw->npq", dstrips, Cu,
                    preferred_element_type=jnp.float32)
    return (val.reshape(N, P * P), gu.reshape(N, P * P),
            gv.reshape(N, P * P))

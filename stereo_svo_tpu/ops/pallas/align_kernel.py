"""Pallas TPU kernels: fused patch warp + residual + Gauss-Newton
accumulation — the reference's #1 hot loop as a single on-chip pass.

BASELINE north star: "Pallas kernels for patch-warp residuals ... and
Jacobian accumulation"; SURVEY.md §3.3. One kernel invocation performs,
entirely in VMEM:

    for each feature: extract its (P+1,P+1) window, 4-tap bilinear blend
    (all patch pixels share one fractional offset), photometric residual
    vs the template, Huber weight, and accumulation of H += JᵀWJ (6x6),
    b += JᵀWe, cost, inlier count.

Mosaic (TPU kernel compiler) constraints shaped the implementation:
  * dynamic sublane starts must be provably 8-aligned → windows are read
    from an 8-aligned 16-row block (`pl.multiple_of` carries the proof)
    and rows/columns extracted by one-hot micro-matmuls;
  * 2D→1D reshapes are unsupported → all per-feature data stays (P,P);
    the Jacobian is passed as an (N, P, 6P) slab (six (P,P) planes packed
    side-by-side per feature) so in-kernel access is a leading-axis
    dynamic index + static column slices, and the 21 unique Hessian
    entries accumulate in a scalar fori_loop carry (see _gn_kernel).

``gn_accumulate`` takes an optional global affine-illumination pair
(a, b): the residual is e = I_cur − (a·I_ref + b), matching the
production XLA aligner's illum_affine path (ops/align.py); with the
default (1, 0) it matches illum_affine=False exactly.

The XLA alternative for the same math is ops/interp_mxu.py (tent-kernel
einsums); both are parity-tested against the gather oracle and raced on
TPU in bench_amortized.py — the race result decides the production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _extract_window(img_ref, iv, iu, P):
    """(P+1,P+1) window at dynamic (iv, iu) from a VMEM image."""
    H, W = img_ref.shape
    base = jnp.minimum((iv // 8) * 8, H - 16)
    r = iv - base                                            # 0..15
    blk = img_ref[pl.ds(pl.multiple_of(base, 8), 16), :]     # (16, W)
    rj = jax.lax.broadcasted_iota(jnp.int32, (P + 1, 16), 1)
    rp = jax.lax.broadcasted_iota(jnp.int32, (P + 1, 16), 0)
    rsel = (rj == r + rp).astype(blk.dtype)                  # (P+1, 16)
    strip = jax.lax.dot_general(rsel, blk, (((1,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (W, P + 1), 0)
    off = jax.lax.broadcasted_iota(jnp.int32, (W, P + 1), 1)
    sel = (col == iu + off).astype(strip.dtype)              # (W, P+1)
    return jax.lax.dot_general(strip, sel, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _bilinear_window(win, du, dv, P):
    """(P+1,P+1) window + shared fracs → (P,P) bilinear samples."""
    w00 = (1.0 - du) * (1.0 - dv)
    w01 = du * (1.0 - dv)
    w10 = (1.0 - du) * dv
    w11 = du * dv
    return (win[:P, :P] * w00 + win[:P, 1:P + 1] * w01
            + win[1:P + 1, :P] * w10 + win[1:P + 1, 1:P + 1] * w11)


def _prep_indices(img_shape, uv, P):
    """Split patch-origin coords into SMEM-friendly int bases + fracs."""
    H, W = img_shape
    half = (P - 1) / 2.0
    u = jnp.clip(uv[:, 0], half, W - 2.0 - half)
    v = jnp.clip(uv[:, 1], half, H - 2.0 - half)
    u0 = jnp.floor(u - half)
    v0 = jnp.floor(v - half)
    iu = jnp.clip(u0.astype(jnp.int32), 0, W - (P + 1))
    iv = jnp.clip(v0.astype(jnp.int32), 0, H - (P + 1))
    du = u - half - iu.astype(u.dtype)
    dv = v - half - iv.astype(v.dtype)
    return iu, iv, du, dv


def _sample_kernel(iu_ref, iv_ref, fr_ref, img_ref, out_ref, *, P):
    N = out_ref.shape[0]

    def body(i, _):
        win = _extract_window(img_ref, iv_ref[i], iu_ref[i], P)
        out_ref[i, :, :] = _bilinear_window(win, fr_ref[i, 0], fr_ref[i, 1],
                                            P)
        return 0

    jax.lax.fori_loop(0, N, body, 0)


@functools.partial(jax.jit, static_argnames=("P", "interpret"))
def sample_patches(img: jnp.ndarray, uv: jnp.ndarray, P: int,
                   interpret: bool = False) -> jnp.ndarray:
    """(N,2) centers → (N,P²) bilinear patches, one fused Pallas pass.

    Border behavior: coordinates are clamped so the whole patch stays
    inside the image (callers mask border features anyway)."""
    N = uv.shape[0]
    iu, iv, du, dv = _prep_indices(img.shape, uv, P)
    fr = jnp.stack([du, dv], axis=-1)
    out = pl.pallas_call(
        functools.partial(_sample_kernel, P=P),
        out_shape=jax.ShapeDtypeStruct((N, P, P), img.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(iu, iv, fr, img)
    return out.reshape(N, P * P)


def _gn_kernel(iu_ref, iv_ref, fr_ref, img_ref, tmpl_ref, jac_ref, w_ref,
               ab_ref, out_ref, *, P, huber_k):
    """Accumulate H (6,6), b (6), cost, n_eff over all features.

    tmpl_ref: (N,P,P); jac_ref: (N,P,6P) — each feature's six (P,P)
    Jacobian planes packed side-by-side in ONE 2-D slab so the in-kernel
    access is a leading-axis dynamic index + static column slices. (The
    previous (6,N,P,P) layout needed a 4-D mid-axis dynamic index, which
    the hardware Mosaic lowering miscompiled — H off ~20% — while passing
    interpret mode; ROADMAP r1 #3.) ab_ref: (2,) SMEM global affine
    illumination (gain a, bias b) — residual e = patch − (a·tmpl + b),
    semantically matching ops/align.py's illum_affine path ((1,0) ==
    illum_affine off). out: (8,128) — rows 0-5 → H, row 6 → b,
    row 7 → [cost, n_eff].

    Accumulation is a 29-scalar fori_loop carry (21 unique H entries + 6 b
    + cost + n_eff): scalar adds, instead of 29 masked selects over the
    full (8,128) accumulator per feature — both the compile-time and the
    VPU work of the old scheme scaled with 1024 lanes per update.
    """
    N = tmpl_ref.shape[0]

    def body(i, carry):
        h_acc, b_acc, cost, n_eff = carry
        win = _extract_window(img_ref, iv_ref[i], iu_ref[i], P)
        patch = _bilinear_window(win, fr_ref[i, 0], fr_ref[i, 1], P)
        e = patch - (ab_ref[0] * tmpl_ref[i, :, :] + ab_ref[1])  # (P,P)
        a = jnp.abs(e)
        w = jnp.where(a <= huber_k, 1.0, huber_k / jnp.maximum(a, 1e-6))
        w = w * w_ref[i]
        slab = jac_ref[i, :, :]                             # (P, 6P)
        Js = [slab[:, k * P:(k + 1) * P] for k in range(6)]
        we = w * e
        b_new = tuple(b_acc[k] + jnp.sum(Js[k] * we) for k in range(6))
        h_new = []
        m = 0
        for k in range(6):
            Jw = Js[k] * w
            for l in range(k, 6):
                h_new.append(h_acc[m] + jnp.sum(Jw * Js[l]))
                m += 1
        return (tuple(h_new), b_new, cost + jnp.sum(we * e),
                n_eff + w_ref[i])

    zero = jnp.asarray(0.0, jnp.float32)
    h_acc, b_acc, cost, n_eff = jax.lax.fori_loop(
        0, N, body, ((zero,) * 21, (zero,) * 6, zero, zero))

    # write the packed result: one masked select per scalar, once total
    rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    acc = jnp.zeros(out_ref.shape, jnp.float32)

    def put(acc, r, c, val):
        return jnp.where((rows == r) & (cols == c), val, acc)

    m = 0
    for k in range(6):
        for l in range(k, 6):
            acc = put(acc, k, l, h_acc[m])
            if l != k:
                acc = put(acc, l, k, h_acc[m])
            m += 1
    for k in range(6):
        acc = put(acc, 6, k, b_acc[k])
    acc = put(acc, 7, 0, cost)
    acc = put(acc, 7, 1, n_eff)
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("P", "huber_k", "interpret"))
def gn_accumulate(img: jnp.ndarray, uv: jnp.ndarray, tmpl: jnp.ndarray,
                  jac: jnp.ndarray, weight: jnp.ndarray, P: int,
                  huber_k: float, a_il=1.0, b_il=0.0,
                  interpret: bool = False):
    """Fused GN pass: returns (H (6,6), b (6,), cost, n_eff).

    img: level image; uv: (N,2) projected centers; tmpl: (N,P²) template
    intensities; jac: (N,P²,6) IC Jacobians; weight: (N,) 0/1 feature mask;
    (a_il, b_il): global affine illumination — residual is
    cur − (a_il·tmpl + b_il), the illum_affine convention of ops/align.py.
    """
    N = uv.shape[0]
    iu, iv, du, dv = _prep_indices(img.shape, uv, P)
    fr = jnp.stack([du, dv], axis=-1)
    ab = jnp.stack([jnp.asarray(a_il, jnp.float32),
                    jnp.asarray(b_il, jnp.float32)])
    tmpl2 = tmpl.reshape(N, P, P)
    # (N,P²,6) → (N,P,6P): feature i's Jacobian plane k lives at
    # [i, :, kP:(k+1)P] — 2-D slab per feature, no 4-D dynamic indexing
    jac2 = jnp.transpose(jac.reshape(N, P, P, 6),
                         (0, 1, 3, 2)).reshape(N, P, 6 * P)
    out = pl.pallas_call(
        functools.partial(_gn_kernel, P=P, huber_k=huber_k),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(iu, iv, fr, img, tmpl2, jac2, weight, ab)
    H = out[0:6, 0:6]
    b = out[6, 0:6]
    cost = out[7, 0]
    n_eff = out[7, 1]
    return H, b, cost, n_eff

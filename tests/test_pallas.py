"""Pallas kernel parity tests (interpret mode on CPU; compiled on TPU).

SURVEY.md §4.2.1: every Pallas kernel vs. a numpy/XLA oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np

from stereo_svo_tpu.ops import interp, pyramid
from stereo_svo_tpu.ops.pallas import align_kernel, pyramid_kernel
import pytest

pytestmark = pytest.mark.slow  # compile-heavy e2e tier

RNG = np.random.default_rng(13)
INTERPRET = jax.default_backend() != "tpu"


def _img(h=64, w=256):
    return jnp.asarray(RNG.uniform(0, 255, (h, w)), jnp.float32)


def test_pallas_sample_patches_parity():
    img = _img()
    uv = jnp.asarray(np.stack([RNG.uniform(8, 248, 32),
                               RNG.uniform(8, 56, 32)], -1), jnp.float32)
    for P in (4, 8):
        ours = align_kernel.sample_patches(img, uv, P, interpret=INTERPRET)
        oracle = interp.sample_patch(img, uv, P, method="gather")
        np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle),
                                   rtol=1e-5, atol=2e-3)


def test_pallas_gn_accumulate_parity():
    """Fused warp+residual+JᵀWJ kernel vs an explicit XLA computation."""
    img = _img()
    N, P = 48, 4
    uv = jnp.asarray(np.stack([RNG.uniform(8, 248, N),
                               RNG.uniform(8, 56, N)], -1), jnp.float32)
    tmpl = jnp.asarray(RNG.uniform(0, 255, (N, P * P)), jnp.float32)
    jac = jnp.asarray(RNG.normal(0, 1, (N, P * P, 6)), jnp.float32)
    w = jnp.asarray(RNG.uniform(size=N) > 0.25, jnp.float32)
    k = 8.0

    H, b, cost, n_eff = align_kernel.gn_accumulate(
        img, uv, tmpl, jac, w, P, k, interpret=INTERPRET)

    # float64 numpy oracle: on TPU the XLA einsum alternative runs the MXU
    # at bf16 input precision and is LESS accurate than the kernel (its H
    # comes out visibly asymmetric); comparing kernel-vs-einsum conflates
    # the two error sources. The kernel itself uses HIGHEST-precision dots
    # + f32 VPU accumulation and matches f64 to ~1e-5.
    cur = np.asarray(interp.sample_patch(img, uv, P,
                                         method="gather")).astype(np.float64)
    e = cur - np.asarray(tmpl, np.float64)
    a = np.abs(e)
    wk = np.where(a <= k, 1.0, k / np.maximum(a, 1e-6)) \
        * np.asarray(w)[:, None]
    jac64 = np.asarray(jac, np.float64)
    H_o = np.einsum("npi,np,npj->ij", jac64, wk, jac64)
    b_o = np.einsum("npi,np,np->i", jac64, wk, e)
    cost_o = np.sum(wk * e * e)

    np.testing.assert_allclose(np.asarray(H), H_o, rtol=2e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(b), b_o, rtol=2e-4, atol=5e-2)
    np.testing.assert_allclose(float(cost), float(cost_o), rtol=1e-4)
    assert float(n_eff) == float(jnp.sum(w))


def test_pallas_gn_accumulate_illum_affine_parity():
    """Kernel with a global (gain, bias) must match the illum_affine
    residual convention e = cur − (a·tmpl + b) of ops/align.py
    (advisor r2 #3: the raw-residual kernel silently diverged from the
    production path once illum_affine became the default)."""
    img = _img()
    N, P = 32, 4
    uv = jnp.asarray(np.stack([RNG.uniform(8, 248, N),
                               RNG.uniform(8, 56, N)], -1), jnp.float32)
    tmpl = jnp.asarray(RNG.uniform(0, 255, (N, P * P)), jnp.float32)
    jac = jnp.asarray(RNG.normal(0, 1, (N, P * P, 6)), jnp.float32)
    w = jnp.asarray(RNG.uniform(size=N) > 0.25, jnp.float32)
    k, a_il, b_il = 8.0, 1.3, -7.5

    H, b, cost, n_eff = align_kernel.gn_accumulate(
        img, uv, tmpl, jac, w, P, k, a_il=a_il, b_il=b_il,
        interpret=INTERPRET)

    cur = np.asarray(interp.sample_patch(img, uv, P,
                                         method="gather")).astype(np.float64)
    e = cur - (a_il * np.asarray(tmpl, np.float64) + b_il)
    a = np.abs(e)
    wk = np.where(a <= k, 1.0, k / np.maximum(a, 1e-6)) \
        * np.asarray(w)[:, None]
    jac64 = np.asarray(jac, np.float64)
    H_o = np.einsum("npi,np,npj->ij", jac64, wk, jac64)
    b_o = np.einsum("npi,np,np->i", jac64, wk, e)
    np.testing.assert_allclose(np.asarray(H), H_o, rtol=2e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(b), b_o, rtol=2e-4, atol=5e-2)
    np.testing.assert_allclose(float(cost), float(np.sum(wk * e * e)),
                               rtol=1e-4)


def test_pallas_halfsample_parity():
    img = _img(64, 256)
    ours = pyramid_kernel.halfsample(img, interpret=INTERPRET)
    oracle = pyramid.halfsample(img)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle),
                               rtol=1e-6, atol=1e-4)


def test_pallas_gradients_parity():
    img = _img(64, 256)
    gx, gy = pyramid_kernel.gradients(img, interpret=INTERPRET)
    gx_o, gy_o = pyramid.gradients(img)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_o), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_o), atol=1e-4)


def test_pallas_pyramid_stack():
    img = _img(64, 256)
    levels, gxs, gys = pyramid_kernel.build_with_gradients(
        img, 3, interpret=INTERPRET)
    oracle = pyramid.build_with_gradients(img, 3)
    for a, b in zip(levels, oracle[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    for a, b in zip(gys, oracle[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

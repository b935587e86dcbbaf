"""Parity: MXU tent-kernel sampler vs the gather-based bilinear oracle
(SURVEY.md §4.2.1 kernel-parity tier)."""

import jax.numpy as jnp
import numpy as np

from stereo_svo_tpu.ops import interp, interp_mxu

RNG = np.random.default_rng(9)


def _img(h=120, w=188):
    return jnp.asarray(RNG.uniform(0, 255, (h, w)), jnp.float32)


def _uv(n, h, w, margin=6):
    return jnp.asarray(np.stack([RNG.uniform(margin, w - margin, n),
                                 RNG.uniform(margin, h - margin, n)], -1),
                       jnp.float32)


def test_sample_patch_parity():
    img = _img()
    uv = _uv(64, 120, 188)
    for P in (4, 8):
        a = interp.sample_patch(img, uv, P, method="gather")
        b = interp_mxu.sample_patch(img, uv, P)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=2e-3)


def test_sample_rect_parity():
    img = _img()
    uv = _uv(32, 120, 188, margin=40)
    row = jnp.arange(8, dtype=jnp.float32) - 3.5
    col = jnp.arange(40, dtype=jnp.float32) - 35.0
    a = interp.sample_rect(img, uv, row, col, method="gather")
    b = interp_mxu.sample_rect(img, uv, row, col)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-5, atol=2e-3)


def test_sample_patch_border_clamps():
    img = _img(32, 40)
    uv = jnp.asarray([[0.5, 0.5], [39.0, 31.0], [1.0, 30.5]], jnp.float32)
    a = interp.sample_patch(img, uv, 4, method="gather")
    b = interp_mxu.sample_patch(img, uv, 4)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-5, atol=2e-3)


def test_grad_parity_with_interpolant():
    """MXU gradient == the bilinear interpolant's analytic gradient."""
    img = _img()
    uv = _uv(48, 120, 188)
    P = 4
    offs = interp.patch_coords(P)
    pts = uv[:, None, :] + offs[None]
    val_g, gu_g, gv_g = interp.bilinear_with_grad(img, pts)
    val_m, gu_m, gv_m = interp_mxu.sample_patch_with_grad(img, uv, P)
    np.testing.assert_allclose(np.asarray(val_m), np.asarray(val_g),
                               rtol=1e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gu_m), np.asarray(gu_g),
                               rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(gv_m), np.asarray(gv_g),
                               rtol=1e-4, atol=5e-3)

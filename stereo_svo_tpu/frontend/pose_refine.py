"""Motion-only pose refinement: Gauss-Newton on reprojection residuals.

Reference parity: PoseRefiner — second GN pass over the KLT-refined 2-D
positions, optimizing the 6-DoF pose only (src/lib/pose_refinement.*
[UNVERIFIED — SURVEY.md §0]; SURVEY.md §3.1). Batched over all features,
fixed iteration count, Huber-weighted; outliers are reported as a mask for
the caller to kill (the reference erases them from its vectors).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import CameraConfig, SvoConfig
from ..geometry import camera, se3
from ..ops import solve


def refine(cam: CameraConfig, cfg: SvoConfig, T_cw: jnp.ndarray,
           X_world: jnp.ndarray, uv_obs: jnp.ndarray,
           mask: jnp.ndarray, obs_sigma: jnp.ndarray | None = None,
           T_prior: jnp.ndarray | None = None
           ) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Refine T_cw so that projected landmarks match observed positions.

    Args:
      X_world: (N, 3) landmark positions; uv_obs: (N, 2) observations.
      mask: (N,) features participating.
      obs_sigma: optional (N,) per-feature measurement noise in px — a
        feature detected/tracked at pyramid level L carries ~2^L px noise
        (the reference keeps features at their detection level; SURVEY.md
        §2.1 detector row). Residuals are whitened by it: the Huber
        threshold, the information weight (1/σ²), and the outlier gate
        all scale with σ.
      T_prior: optional (3,4) motion-prior pose (the constant-velocity
        prediction). Adds a Gaussian prior ½‖log(T∘T_prior⁻¹)‖²_Λ with
        Λ = diag(1/σ_t², 1/σ_r²) from cfg.refine_prior_t_sig/_r_sig.
        Purpose (BASELINE.md r3 KITTI-geometry root-cause): when the
        tracked feature set goes far-dominated, the forward axis is
        weakly observed and single frames can excurse 100-400 mm — the
        distance-triggered keyframe policy then anchors a keyframe AT the
        excursion, immortalizing it. A loose prior (default 50 mm) is
        invisible against healthy data and caps exactly those
        excursions. Disabled when cfg.refine_prior_t_sig == 0.
    Returns: (T_cw, inlier_mask, stats).
    """
    sig = jnp.ones(X_world.shape[0], jnp.float32) if obs_sigma is None \
        else obs_sigma
    inv_s2 = 1.0 / (sig * sig)
    use_prior = T_prior is not None and cfg.refine_prior_t_sig > 0.0
    if use_prior:
        lam = jnp.concatenate([
            jnp.full(3, 1.0 / cfg.refine_prior_t_sig ** 2),
            jnp.full(3, 1.0 / max(cfg.refine_prior_r_sig, 1e-6) ** 2)])
        T_prior_inv = se3.inverse(T_prior)

    def residual(T):
        x_c = se3.transform(T, X_world)                     # (N,3)
        uv_p, front = camera.project(cam, x_c)
        r = uv_p - uv_obs                                   # (N,2)
        rn = jnp.linalg.norm(r, axis=-1) / sig              # whitened
        w = jnp.where(rn <= cfg.refine_huber_px, 1.0,
                      cfg.refine_huber_px / jnp.maximum(rn, 1e-6))
        return x_c, r, w * inv_s2 * (mask & front)

    # Chunked IRLS (same TPU-latency rationale as ops/align.py): the exact
    # per-iteration 6x6 Cholesky + exp chain is what the iteration's wall
    # time is made of, not the (N,)-sized vector work. Refresh J/W/H⁻¹ a
    # few times (taking an exact GN step each time); between refreshes the
    # update is a Jacobian-frozen quasi-Newton matvec.
    T = T_cw
    chunks = max(1, min(cfg.refine_irls_chunks, cfg.refine_max_iters))
    inner = max(cfg.refine_max_iters // chunks - 1, 0)
    for ci in range(chunks):
        x_c, r, w = residual(T)
        J = camera.proj_pose_jacobian(cam, x_c)             # (N,2,6)
        H = jnp.einsum("nri,n,nrj->ij", J, w, J,
                       preferred_element_type=jnp.float32)
        g = jnp.einsum("nri,n,nr->i", J, w, r,
                       preferred_element_type=jnp.float32)
        if use_prior:
            xi = se3.log(se3.compose(T, T_prior_inv))
            H = H + jnp.diag(lam)
            g = g + lam * xi
        H = H + 1e-8 * jnp.eye(6, dtype=H.dtype) \
            + 1e-4 * jnp.trace(H) / 6.0 * jnp.eye(6, dtype=H.dtype)
        rhs = jnp.concatenate([jnp.eye(6, dtype=H.dtype), g[None]])
        sol = solve.chol_solve_small(jnp.broadcast_to(H, (7, 6, 6)), rhs)
        Hinv = sol[:6]
        T = se3.compose(se3.exp(-sol[6]), T)

        def body(it, T):
            _, r, w_i = residual(T)
            g = jnp.einsum("nri,n,nr->i", J, w_i, r,
                           preferred_element_type=jnp.float32)
            return se3.compose(se3.exp(-(Hinv @ g)), T)

        T = jax.lax.fori_loop(0, inner, body, T)

    x_c = se3.transform(T, X_world)
    uv_p, front = camera.project(cam, x_c)
    err = jnp.linalg.norm(uv_p - uv_obs, axis=-1)
    inliers = mask & front & (err < cfg.refine_outlier_px * sig)
    stats = {
        "refine_rms_px": jnp.sqrt(
            jnp.sum(jnp.where(inliers, err * err, 0.0))
            / jnp.maximum(jnp.sum(inliers), 1.0)),
        "refine_inliers": jnp.sum(inliers),
    }
    return T, inliers, stats

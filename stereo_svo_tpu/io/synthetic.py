"""Synthetic stereo sequence generator with exact ground truth.

The sandbox has no EuRoC/KITTI data and no network (SURVEY.md §0), so the
end-to-end metric tests and the benchmark run on procedurally rendered
stereo sequences: textured 3-D planes ray-cast in closed form, a known
camera trajectory, and therefore exact ground-truth poses/depths. This is
the "synthetic scenes with known motion" tier of the test strategy
(SURVEY.md §4.2.2) and also serves as the ``ImageInput`` analog of the
reference's dataset readers for environments without datasets.

Rendering is pure JAX (jittable) so frames can be produced on-device at
benchmark time without a host round-trip.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CameraConfig
from ..geometry import se3

# Procedural texture: multi-octave sum of plane waves. Low octaves give the
# smooth shading direct alignment needs; high octaves give FAST corners.
_N_WAVES = 24


def _texture_params(seed: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    freqs = []
    amps = []
    phases = []
    for octave in range(4):
        f0 = 0.7 * (2.2 ** octave)
        for _ in range(_N_WAVES // 4):
            ang = rng.uniform(0, 2 * math.pi)
            f = f0 * rng.uniform(0.7, 1.4)
            freqs.append([f * math.cos(ang), f * math.sin(ang)])
            amps.append(rng.uniform(0.5, 1.0) / (1.35 ** octave))
            phases.append(rng.uniform(0, 2 * math.pi))
    return (np.asarray(freqs, np.float32), np.asarray(amps, np.float32),
            np.asarray(phases, np.float32))


def _texture(p1: jnp.ndarray, p2: jnp.ndarray, params) -> jnp.ndarray:
    freqs, amps, phases = params
    acc = jnp.zeros_like(p1)
    for k in range(freqs.shape[0]):
        acc = acc + amps[k] * jnp.sin(
            2 * math.pi * (freqs[k, 0] * p1 + freqs[k, 1] * p2) + phases[k])
    # map to [10, 245] u8-like intensity range
    lo, hi = -float(np.sum(np.abs(amps))), float(np.sum(np.abs(amps)))
    return 10.0 + (acc - lo) / (hi - lo) * 235.0


class Plane(NamedTuple):
    normal: jnp.ndarray   # (3,) world-frame unit normal
    d: jnp.ndarray        # scalar: plane is n·x = d
    e1: jnp.ndarray       # (3,) in-plane texture basis
    e2: jnp.ndarray       # (3,)


def default_scene(seed: int = 0):
    """Two tilted textured planes in front of the camera (z forward).

    Plane A fills the view at ~2.5–7 m; plane B is a far backdrop so rays
    missing A still hit texture.
    """
    def unit(v):
        v = np.asarray(v, np.float32)
        return v / np.linalg.norm(v)

    nA = unit([0.25, -0.15, -1.0])
    pA = Plane(jnp.asarray(nA), jnp.asarray(np.dot(nA, [0, 0, 4.0]), np.float32),
               jnp.asarray(unit(np.cross(nA, [0, 1, 0]))),
               jnp.asarray(unit(np.cross(nA, np.cross(nA, [0, 1, 0])))))
    nB = unit([0.0, 0.0, -1.0])
    pB = Plane(jnp.asarray(nB), jnp.asarray(np.dot(nB, [0, 0, 14.0]), np.float32),
               jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    return (pA, pB), (_texture_params(seed), _texture_params(seed + 1))


def render_view(cam: CameraConfig, T_wc: jnp.ndarray, scene) -> jnp.ndarray:
    """Ray-cast one camera view: (H, W) float32 intensities in [0, 255].

    T_wc: camera→world pose (camera center = translation(T_wc)).
    """
    planes, textures = scene
    H, W = cam.height, cam.width
    u = jnp.arange(W, dtype=jnp.float32)
    v = jnp.arange(H, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)                      # (H, W)
    # Camera-frame ray directions.
    rx = (uu - cam.cx) / cam.fx
    ry = (vv - cam.cy) / cam.fy
    rays_c = jnp.stack([rx, ry, jnp.ones_like(rx)], axis=-1)
    R = se3.rotation(T_wc)
    o = se3.translation(T_wc)
    rays_w = jnp.einsum("ij,hwj->hwi", R, rays_c)

    img = jnp.zeros((H, W), jnp.float32)
    depth = jnp.full((H, W), jnp.inf, jnp.float32)
    for plane, tex in zip(planes, textures):
        n, d = plane.normal, plane.d
        denom = jnp.einsum("hwi,i->hw", rays_w, n)
        denom = jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
        s = (d - jnp.dot(n, o)) / denom              # ray parameter
        hit = s > 0.1
        x = o + s[..., None] * rays_w                # world intersection
        p1 = jnp.einsum("hwi,i->hw", x, plane.e1)
        p2 = jnp.einsum("hwi,i->hw", x, plane.e2)
        val = _texture(p1, p2, tex)
        closer = hit & (s < depth)
        img = jnp.where(closer, val, img)
        depth = jnp.where(closer, s, depth)
    return img


def gt_depth(cam: CameraConfig, T_wc: jnp.ndarray, uv: jnp.ndarray, scene):
    """Exact z-depth (camera frame) of the scene at pixels uv (…,2)."""
    planes, _ = scene
    rx = (uv[..., 0] - cam.cx) / cam.fx
    ry = (uv[..., 1] - cam.cy) / cam.fy
    rays_c = jnp.stack([rx, ry, jnp.ones_like(rx)], axis=-1)
    R = se3.rotation(T_wc)
    o = se3.translation(T_wc)
    rays_w = jnp.einsum("ij,...j->...i", R, rays_c)
    best = jnp.full(uv.shape[:-1], jnp.inf, jnp.float32)
    for plane in planes:
        n, d = plane.normal, plane.d
        denom = jnp.einsum("...i,i->...", rays_w, n)
        denom = jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
        s = (d - jnp.dot(n, o)) / denom
        s = jnp.where(s > 0.1, s, jnp.inf)
        best = jnp.minimum(best, s)
    # rays have unit z in the camera frame → ray parameter == z-depth
    return best


def right_camera_pose(cam: CameraConfig, T_wc_left: jnp.ndarray) -> jnp.ndarray:
    """Right camera pose: left shifted by +baseline along camera x."""
    offset = se3.make(jnp.eye(3, dtype=T_wc_left.dtype),
                      jnp.asarray([cam.baseline, 0.0, 0.0], T_wc_left.dtype))
    return se3.compose(T_wc_left, offset)


def render_stereo(cam: CameraConfig, T_wc: jnp.ndarray, scene):
    left = render_view(cam, T_wc, scene)
    right = render_view(cam, right_camera_pose(cam, T_wc), scene)
    return left, right


def trajectory_pose(t: jnp.ndarray, kind: str = "arc") -> jnp.ndarray:
    """Ground-truth T_wc at scalar time t (frame index * dt).

    'arc': gentle forward+sideways motion with yaw/roll — exercises all six
    DoF without leaving the rendered planes' field of view.
    """
    if kind == "arc":
        tx = 0.30 * jnp.sin(0.7 * t)
        ty = 0.10 * jnp.sin(0.9 * t + 0.4)
        tz = 0.25 * t
        wy = 0.06 * jnp.sin(0.5 * t)
        wx = 0.03 * jnp.sin(0.8 * t + 1.0)
        wz = 0.02 * jnp.sin(1.1 * t)
    elif kind == "loop":
        # out-and-back: forward then return near the start (long-run
        # stability / revisit behavior)
        tx = 0.20 * jnp.sin(0.5 * t)
        ty = 0.05 * jnp.sin(0.9 * t)
        tz = 0.8 * jnp.sin(0.35 * t)        # advance then come back
        wy = 0.05 * jnp.sin(0.45 * t)
        wx = 0.02 * jnp.sin(0.7 * t)
        wz = 0.015 * jnp.sin(1.0 * t)
    elif kind == "still":
        z = jnp.zeros_like(t)
        tx = ty = tz = wx = wy = wz = z
    else:
        raise ValueError(kind)
    xi = jnp.stack([tx, ty, tz, wx, wy, wz], axis=-1)
    return se3.exp(xi)


def make_sequence(cam: CameraConfig, n_frames: int, dt: float = 0.1,
                  kind: str = "arc", seed: int = 0):
    """Render a full sequence on host: (lefts, rights, gt_T_wc).

    Returns numpy arrays: (N,H,W), (N,H,W), (N,3,4).
    """
    scene = default_scene(seed)
    render = jax.jit(lambda T: render_stereo(cam, T, scene))
    lefts, rights, poses = [], [], []
    for i in range(n_frames):
        T = trajectory_pose(jnp.asarray(i * dt, jnp.float32), kind)
        l, r = render(T)
        lefts.append(np.asarray(l))
        rights.append(np.asarray(r))
        poses.append(np.asarray(T))
    return np.stack(lefts), np.stack(rights), np.stack(poses)

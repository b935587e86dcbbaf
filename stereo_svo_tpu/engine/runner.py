"""Host-side sequence runners around the jitted per-frame step.

Reference parity: the app main loop — read stereo pair → new_image() →
collect pose (SURVEY.md §3.4, src/app/main.cpp [UNVERIFIED]). The host here
only feeds images and drains poses; all algorithmic work is on device.

``run_sequence_batched`` is the vmapped multi-sequence runner
(north-star config #4: 8 EuRoC sequences batched on one chip).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SvoConfig
from .state import FrameOut, SlamState, init_state
from .step import make_batched_step, make_step


class StereoSvo:
    """Facade mirroring the reference's ``StereoSlam`` class (SURVEY.md §1):
    construct with settings, feed stereo pairs, read poses/trajectory."""

    def __init__(self, cfg: SvoConfig):
        self.cfg = cfg
        self._step = jax.jit(make_step(cfg), donate_argnums=(0,))
        self.state: SlamState = init_state(cfg)
        self._trajectory: List[np.ndarray] = []
        self._metrics: List[FrameOut] = []

    def new_image(self, left, right) -> FrameOut:
        """Process one stereo pair; returns the per-frame output."""
        left = jnp.asarray(left, jnp.float32)
        right = jnp.asarray(right, jnp.float32)
        self.state, out = self._step(self.state, left, right)
        self._trajectory.append(np.asarray(out.T_wc))
        self._metrics.append(out)
        return out

    @property
    def pose(self) -> np.ndarray:
        """Current camera→world pose (3,4)."""
        return self._trajectory[-1]

    def trajectory(self) -> np.ndarray:
        return np.stack(self._trajectory)

    def metrics(self) -> Dict[str, np.ndarray]:
        keys = FrameOut._fields
        return {k: np.asarray([getattr(m, k) for m in self._metrics])
                for k in keys if k != "T_wc"}


def run_sequence(cfg: SvoConfig, lefts, rights
                 ) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Run a whole sequence; returns (T_wc trajectory (N,3,4), metrics)."""
    svo = StereoSvo(cfg)
    for l, r in zip(lefts, rights):
        svo.new_image(l, r)
    return svo.trajectory(), svo.metrics()


def run_sequence_scan(cfg: SvoConfig, lefts: jnp.ndarray, rights: jnp.ndarray):
    """Whole-sequence processing as one jitted lax.scan on device.

    lefts/rights: (T,H,W). Returns (final_state, FrameOut stacked over T).
    This is the benchmark path: zero host involvement between frames.
    """
    step = make_step(cfg)

    def body(state, imgs):
        l, r = imgs
        state, out = step(state, l, r)
        return state, out

    return jax.lax.scan(body, init_state(cfg), (lefts, rights))


def run_sequence_batched(cfg: SvoConfig, lefts: jnp.ndarray,
                         rights: jnp.ndarray):
    """Multi-sequence batched odometry (config #4).

    lefts/rights: (B,T,H,W). Returns (final states (B,…), FrameOut with
    leading (B,T) axes).

    Structured as ``lax.scan`` over time of a batched step — NOT
    ``vmap(scan(step))`` — so the keyframe phase runs under one
    batch-level ``lax.cond`` (see engine/step.make_batched_step) instead
    of decaying to a select that all sequences pay every frame.
    """
    bstep = make_batched_step(cfg)
    B = lefts.shape[0]
    states = jax.vmap(lambda _: init_state(cfg))(jnp.arange(B))

    def body(states, imgs):
        l, r = imgs
        states, outs = bstep(states, l, r)
        return states, outs

    states, outs = jax.lax.scan(
        body, states, (jnp.swapaxes(lefts, 0, 1), jnp.swapaxes(rights, 0, 1)))
    # outs leading axes are (T, B) from the scan — present as (B, T)
    return states, jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), outs)

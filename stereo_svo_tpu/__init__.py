"""TPU-native stereo semi-direct visual odometry (SVO) SLAM engine.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of the
reference C++/OpenCV implementation ``eichenberger/stereo-svo-slam``
(mounted at /root/reference; empty at build time — see SURVEY.md §0):
FAST/edgelet detection on pyramids, sparse direct image alignment,
pyramidal KLT feature tracking, recursive depth filters seeded by stereo
triangulation, Gauss-Newton pose refinement, keyframe local bundle
adjustment and pose-graph optimization — batched, fixed-capacity, masked,
fully jittable, vmap-able over sequences and shard_map-able over a device
mesh for distributed mapping.
"""

import os as _os

# Persistent XLA compilation cache (VERDICT r4 next #3: 502 s of compile
# for one KITTI-resolution scan config made the driving-scale path
# un-benchable). Enabled for every entry point that imports the package
# (bench, CLI, tests, diagnostics); keyed on HLO so identical compiles are
# served from disk across processes. Verified working through the remote
# axon PJRT tunnel. Opt out with SVO_COMPILE_CACHE=0.
if (_os.environ.get("SVO_COMPILE_CACHE", "1") != "0"
        and _os.environ.get("JAX_PLATFORMS", "") != "cpu"):
    # TPU-only: XLA:CPU AOT results encode exact machine features
    # (prefer-no-gather etc.); loading one compiled under different flags
    # changes instruction selection — measured to flip float rounding
    # enough to change a whole SLAM trajectory across processes, and the
    # loader itself warns about possible SIGILL. Tests/CPU runs set
    # JAX_PLATFORMS=cpu (tests/conftest.py), which opts them out here.
    try:
        import jax as _jax

        _cache_dir = _os.environ.get(
            "SVO_COMPILE_CACHE_DIR",
            _os.path.join(
                _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                ".xla_cache"))
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # jax too old / read-only FS: run without the cache
        pass

from .config import CameraConfig, SvoConfig, euroc_config, kitti_config  # noqa: F401

__version__ = "0.1.0"

"""pyorbslam_tpu — a TPU-native stereo visual SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of stereo
ORB-SLAM2 (reference: M2219/pyOrbSLAM): ORB pyramid feature extraction,
epipolar-band stereo matching, descriptor matching, DBoW-style place
recognition, PnP/Sim3 relocalization, and motion-only/local/global bundle
adjustment plus Sim3 pose-graph optimization — all expressed as batched,
fixed-shape array programs that XLA can tile onto the MXU/VPU, with
multi-host scale-out via `jax.sharding` + `shard_map` collectives.

Design stance (see SURVEY.md §7):
  * Arrays, not objects: SoA stores with validity masks everywhere.
  * Batched hypotheses, not sequential RANSAC.
  * One batched Levenberg-Marquardt engine instead of a graph library,
    with Schur-complement landmark marginalization done as dense/CG
    linear algebra on device.
  * Host keeps only pointer-chasing bookkeeping (covisibility graph,
    inverted file); all dense numeric work runs on TPU.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: first compiles of the frontend/BA
# programs cost 20-40 s through the remote TPU tunnel; the disk cache
# makes every later process start warm.  Opt out with
# PYORBSLAM_JAX_CACHE=0 or by pre-setting JAX_COMPILATION_CACHE_DIR.
if _os.environ.get("PYORBSLAM_JAX_CACHE", "1") == "1":
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["JAX_COMPILATION_CACHE_DIR"])

from pyorbslam_tpu.config import SlamConfig, load_settings  # noqa: F401

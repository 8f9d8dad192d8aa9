"""Matmul-precision control for geometry/optimizer code.

TPU MXU matmuls truncate f32 inputs to bfloat16 by default (8 mantissa
bits).  For neural nets that is free accuracy; for SE3 geometry it is
not: world coordinates grow with distance traveled, so the ~0.4%
relative truncation error on point transforms (Xw @ R^T) and pose
compositions turns into multi-pixel reprojection error far from the
origin — enough to blow the chi2 gates and collapse tracking (observed
on KITTI-scale synthetic runs: inliers decay to zero after ~10 frames
on TPU while CPU, with exact f32 matmuls, is stable).

``f32_matmuls`` scopes ``jax.default_matmul_precision("float32")`` over
a function body so every matmul traced inside runs in full f32 (6-pass
on the MXU).  The geometry/LM matrices are small; the cost is
negligible next to the Hamming/extraction workloads, which stay at
default precision.  Do NOT apply over Pallas kernels (Mosaic rejects
the precision attribute).
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)
    return wrapped

"""SE(3) Lie-group operations as pure, batched JAX functions.

Poses are 4x4 row-major matrices ``Tcw`` (world -> camera), matching the
reference convention (Frame.py:127-135).  The tangent parameterization is
``xi = (omega, upsilon)`` — rotation first — matching g2o's
``SE3Quat::exp`` ordering so the LM updates reproduce
``VertexSE3Expmap::oplusImpl`` semantics (reference:
g2o-python SE3 expmap vertex; update is ``exp(xi) * estimate``).

All functions are shape-polymorphic over leading batch dimensions where
noted and are safe under ``jit``/``vmap`` (no data-dependent control flow;
small-angle branches use ``jnp.where`` with Taylor fallbacks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(omega: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator. omega: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = omega[..., 0], omega[..., 1], omega[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def _sinc_coeffs(theta2):
    """Return (A, B, C) = (sin t / t, (1-cos t)/t^2, (1 - A)/t^2) with
    numerically-stable Taylor fallbacks near zero."""
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / theta2)
    return A, B, C


def exp_so3(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    W = hat(omega)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse Rodrigues: (..., 3, 3) -> (..., 3).

    Uses theta = atan2(|vee(R - R^T)|/2, (tr - 1)/2) instead of arccos so
    forward-mode autodiff stays finite at the identity (the arccos form
    has an unbounded derivative at cos = 1, which poisons pose-graph
    Jacobians computed via jacfwd).  Stable for angles < pi - eps —
    sufficient for pose increments and relative-pose residuals.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # |w| = 2 sin(theta); smooth the norm so its derivative exists at 0
    sin_t = 0.5 * jnp.sqrt(jnp.sum(w * w, axis=-1) + _EPS * _EPS)
    theta = jnp.arctan2(sin_t, cos_t)
    small = theta < 1e-5
    scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / (2.0 * jnp.where(small, 1.0, sin_t)),
    )
    return w * scale[..., None]


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) exponential. xi = (omega, upsilon): (..., 6) -> (..., 4, 4)."""
    omega, upsilon = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(omega * omega, axis=-1)
    A, B, C = _sinc_coeffs(theta2)
    W = hat(omega)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = I + A[..., None, None] * W + B[..., None, None] * W2
    V = I + B[..., None, None] * W + C[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, upsilon)
    return rt_to_mat(R, t)


def log_se3(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 6) with (omega, upsilon) ordering."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    omega = log_so3(R)
    theta2 = jnp.sum(omega * omega, axis=-1)
    A, B, C = _sinc_coeffs(theta2)
    W = hat(omega)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    V = I + B[..., None, None] * W + C[..., None, None] * W2
    upsilon = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([omega, upsilon], axis=-1)


def rt_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = R.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE3 inverse (no linear solve)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., N, 3) or (..., 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if pts.ndim == T.ndim:  # (..., N, 3) against (..., 4, 4)
        return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]
    return jnp.einsum("...ij,...j->...i", R, pts) + t


def retract(T: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative update  T <- exp(xi) @ T  (g2o VertexSE3Expmap)."""
    return exp_se3(xi) @ T


def orthonormalize(R: jnp.ndarray) -> jnp.ndarray:
    """Project a near-rotation onto SO(3) via SVD (drift control after many
    compounded f32 updates)."""
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    d = jnp.ones(R.shape[:-2] + (3,), dtype=R.dtype).at[..., 2].set(det)
    return (u * d[..., None, :]) @ vt


def camera_center(Tcw: jnp.ndarray) -> jnp.ndarray:
    """World coords of the optical center: Ow = -Rcw^T tcw (Frame.py:135)."""
    R = Tcw[..., :3, :3]
    t = Tcw[..., :3, 3]
    return -jnp.einsum("...ji,...j->...i", R, t)

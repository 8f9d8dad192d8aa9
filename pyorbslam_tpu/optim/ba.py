"""Bundle adjustment: batched Schur-complement Levenberg-Marquardt.

Replaces g2o's BlockSolver + ``set_marginalized(True)`` landmark
marginalization (used by Optimizer.local_bundle_adjustment:210-366 and
bundle_adjustment:21-121) with dense TPU linear algebra:

  * per-observation stereo residuals/Jacobians (EdgeStereoSE3ProjectXYZ,
    edge_project_stereo_xyz.cpp:33-89) are computed for all edges at once;
  * the block-sparse normal equations are reduced by the Schur complement:
    3x3 landmark blocks are inverted batched, the camera-point coupling
    blocks W are scattered into a dense (6C x 3P) matrix, and the reduced
    camera system S = Hcc - W Hpp^-1 W^T is ONE big MXU matmul — the
    TPU-native replacement for sparse Cholesky;
  * the reference's two-phase schedule is preserved: 5 Huber iterations,
    chi2/depth gating that *excludes* bad edges and drops the robust
    kernel, 10 more iterations, then a final gate marking observations to
    erase (Optimizer.py:318-353).

Shapes are static in (C cams, P points, O observations); padding rides
along with zero weight.  f32 throughout with multiplicative LM damping —
validated to recover poses/structure to sub-centimeter on synthetic
problems (tests/test_ba.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pyorbslam_tpu.geometry import se3

from pyorbslam_tpu.utils.precision import f32_matmuls

CHI2_STEREO = 7.815
HUBER_DELTA = float(np.sqrt(CHI2_STEREO))


class BAProblem(NamedTuple):
    """Fixed-shape BA problem arrays."""

    cam_Tcw: jnp.ndarray       # (C, 4, 4)
    cam_fixed: jnp.ndarray     # (C,) bool (includes padding slots)
    pnt_pos: jnp.ndarray       # (P, 3)
    pnt_active: jnp.ndarray    # (P,) bool
    obs_cam: jnp.ndarray       # (O,) int32
    obs_pnt: jnp.ndarray       # (O,) int32
    obs_uvr: jnp.ndarray       # (O, 3)
    obs_inv_sigma2: jnp.ndarray  # (O,)
    obs_active: jnp.ndarray    # (O,) bool
    cam: jnp.ndarray           # (5,) [fx, fy, cx, cy, bf]


class BAResult(NamedTuple):
    cam_Tcw: jnp.ndarray
    pnt_pos: jnp.ndarray
    obs_chi2: jnp.ndarray      # final per-observation chi2
    obs_depth_ok: jnp.ndarray  # final per-observation depth > 0
    obs_inlier: jnp.ndarray    # survived the final gate


@f32_matmuls
def _bmv(A, x):
    """Batched (..., i, j) @ (..., j) as broadcast-multiply-sum.  The
    inner dims here are 3/6 — as einsum XLA lowers them to PADDED MXU
    batched matmuls (measured 1.6x slower at 88k observations) and runs
    them bf16 outside a precision context; the broadcast form stays on
    the VPU in exact f32."""
    return jnp.sum(A * x[..., None, :], axis=-1)


def _bmm(A, B):
    """Batched (..., i, j) @ (..., j, k); see :func:`_bmv`."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def _btb(A, B):
    """Batched A^T B: (..., i, j), (..., i, k) -> (..., j, k);
    see :func:`_bmv`."""
    return jnp.sum(A[..., :, :, None] * B[..., :, None, :], axis=-3)


def _btv(A, x):
    """Batched A^T x: (..., i, j), (..., i) -> (..., j); see :func:`_bmv`."""
    return jnp.sum(A * x[..., :, None], axis=-2)


def _residuals(prob: BAProblem, cam_Tcw, pnt_pos):
    """Residuals (O, 3), Jacobians Jc (O, 3, 6), Jp (O, 3, 3), depth (O,)."""
    fx, fy, cx, cy, bf = (prob.cam[i] for i in range(5))
    T = cam_Tcw[prob.obs_cam]            # (O, 4, 4)
    X = pnt_pos[prob.obs_pnt]            # (O, 3)
    Pc = _bmv(T[:, :3, :3], X) + T[:, :3, 3]
    x, y, z = Pc[:, 0], Pc[:, 1], Pc[:, 2]
    zsafe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    invz = 1.0 / zsafe
    invz2 = invz * invz

    u = fx * x * invz + cx
    v = fy * y * invz + cy
    ur = u - bf * invz
    e = prob.obs_uvr - jnp.stack([u, v, ur], axis=-1)

    zeros = jnp.zeros_like(x)
    du = jnp.stack([fx * invz, zeros, -fx * x * invz2], axis=-1)
    dv = jnp.stack([zeros, fy * invz, -fy * y * invz2], axis=-1)
    dur = du + jnp.stack([zeros, zeros, bf * invz2], axis=-1)
    dh_dp = jnp.stack([du, dv, dur], axis=1)       # (O, 3, 3)

    dp_dxi = jnp.concatenate(
        [-se3.hat(Pc), jnp.broadcast_to(jnp.eye(3), Pc.shape[:-1] + (3, 3))],
        axis=-1,
    )                                              # (O, 3, 6)
    Jc = -_bmm(dh_dp, dp_dxi)
    Jp = -_bmm(dh_dp, T[:, :3, :3])
    return e, Jc, Jp, z


def _huber_w(chi2, delta):
    s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(chi2 <= delta * delta, 1.0, delta / s)


def _robust_cost(chi2, delta, use_huber):
    if not use_huber:
        return chi2
    s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(chi2 <= delta * delta, chi2, 2 * delta * s - delta * delta)


def _inv3x3(M):
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack([
        jnp.stack([A, B, C], -1),
        jnp.stack([D, E, F], -1),
        jnp.stack([G, H, I], -1),
    ], -2)
    return adj / det[..., None, None]


@f32_matmuls
def _lm_iteration(prob: BAProblem, cam_Tcw, pnt_pos, active, lam, use_huber):
    n_cam = cam_Tcw.shape[0]
    n_pnt = pnt_pos.shape[0]

    e, Jc, Jp, z = _residuals(prob, cam_Tcw, pnt_pos)
    chi2 = jnp.sum(e * e, axis=-1) * prob.obs_inv_sigma2
    w = _huber_w(chi2, HUBER_DELTA) if use_huber else jnp.ones_like(chi2)
    w = w * prob.obs_inv_sigma2 * active

    # block accumulations
    Hcc = jax.ops.segment_sum(
        w[:, None, None] * _btb(Jc, Jc),
        prob.obs_cam, num_segments=n_cam,
    )  # (C, 6, 6)
    bc = jax.ops.segment_sum(
        w[:, None] * _btv(Jc, e), prob.obs_cam, n_cam
    )  # (C, 6)
    Hpp = jax.ops.segment_sum(
        w[:, None, None] * _btb(Jp, Jp),
        prob.obs_pnt, num_segments=n_pnt,
    )  # (P, 3, 3)
    bp = jax.ops.segment_sum(
        w[:, None] * _btv(Jp, e), prob.obs_pnt, n_pnt
    )  # (P, 3)

    # multiplicative LM damping on both block diagonals
    eye6 = jnp.eye(6)
    eye3 = jnp.eye(3)
    Hcc_d = Hcc + lam * Hcc * eye6 + 1e-8 * eye6
    Hpp_d = Hpp + lam * Hpp * eye3 + 1e-8 * eye3
    Hpp_inv = _inv3x3(Hpp_d)

    W = w[:, None, None] * _btb(Jc, Jp)   # (O, 6, 3)
    WHinv = _bmm(W, Hpp_inv[prob.obs_pnt])  # (O, 6, 3)

    A = jnp.zeros((n_cam, 6, n_pnt, 3)).at[prob.obs_cam, :, prob.obs_pnt, :].add(W)
    M = jnp.zeros((n_cam, 6, n_pnt, 3)).at[prob.obs_cam, :, prob.obs_pnt, :].add(WHinv)
    A2 = A.reshape(n_cam * 6, n_pnt * 3)
    M2 = M.reshape(n_cam * 6, n_pnt * 3)

    S = jax.scipy.linalg.block_diag
    # dense reduced camera system
    Hcc_bd = jnp.zeros((n_cam * 6, n_cam * 6))
    idx = jnp.arange(n_cam)
    Hcc_bd = Hcc_bd.reshape(n_cam, 6, n_cam, 6).at[idx, :, idx, :].set(Hcc_d).reshape(n_cam * 6, n_cam * 6)
    S_red = Hcc_bd - jnp.dot(M2, A2.T, preferred_element_type=jnp.float32)
    rhs = bc.reshape(-1) - M2 @ bp.reshape(-1)

    # freeze fixed / padded cameras: identity rows+cols, zero rhs
    free = (~prob.cam_fixed).astype(jnp.float32)
    free6 = jnp.repeat(free, 6)
    S_red = S_red * free6[:, None] * free6[None, :] + jnp.diag(1.0 - free6)
    rhs = rhs * free6

    dc = -jnp.linalg.solve(S_red, rhs).reshape(n_cam, 6)

    # back-substitute points: dp = -Hpp^-1 (bp + sum_o W^T dc[cam_o])
    Wt_dc = _btv(W, dc[prob.obs_cam])       # (O, 3)
    acc = jax.ops.segment_sum(Wt_dc, prob.obs_pnt, num_segments=n_pnt)
    dp = -_bmv(Hpp_inv, bp + acc)
    dp = dp * prob.pnt_active[:, None]

    cam_new = se3.retract(cam_Tcw, dc)
    cam_new = jnp.where(prob.cam_fixed[:, None, None], cam_Tcw, cam_new)
    pnt_new = pnt_pos + dp

    # accept / reject on total robust cost
    def total_cost(cT, pP):
        e2, _, _, _ = _residuals(prob, cT, pP)
        c2 = jnp.sum(e2 * e2, axis=-1) * prob.obs_inv_sigma2
        return jnp.sum(_robust_cost(c2, HUBER_DELTA, use_huber) * active)

    improved = total_cost(cam_new, pnt_new) < total_cost(cam_Tcw, pnt_pos)
    cam_out = jnp.where(improved, cam_new, cam_Tcw)
    pnt_out = jnp.where(improved, pnt_new, pnt_pos)
    lam = jnp.where(improved, lam * 0.5, lam * 5.0)
    return cam_out, pnt_out, lam


@functools.partial(jax.jit, static_argnames=("iters1", "iters2"))
@f32_matmuls
def bundle_adjust(prob: BAProblem, iters1: int = 5, iters2: int = 10) -> BAResult:
    """Local/global BA with the reference's two-phase gating schedule."""
    active = prob.obs_active.astype(jnp.float32)

    def phase(carry, iters, use_huber, act):
        cam_Tcw, pnt_pos = carry

        def body(_, st):
            cT, pP, lam = st
            cT, pP, lam = _lm_iteration(prob, cT, pP, act, lam, use_huber)
            return cT, pP, lam

        cT, pP, _ = jax.lax.fori_loop(
            0, iters, body, (cam_Tcw, pnt_pos, jnp.float32(1e-4))
        )
        return cT, pP

    cam_Tcw, pnt_pos = phase((prob.cam_Tcw, prob.pnt_pos), iters1, True, active)

    # gate: chi2 > 7.815 or non-positive depth -> exclude; kernel dropped
    e, _, _, z = _residuals(prob, cam_Tcw, pnt_pos)
    chi2 = jnp.sum(e * e, axis=-1) * prob.obs_inv_sigma2
    good = (chi2 <= CHI2_STEREO) & (z > 0)
    active2 = active * good.astype(jnp.float32)

    cam_Tcw, pnt_pos = phase((cam_Tcw, pnt_pos), iters2, False, active2)

    e, _, _, z = _residuals(prob, cam_Tcw, pnt_pos)
    chi2 = jnp.sum(e * e, axis=-1) * prob.obs_inv_sigma2
    depth_ok = z > 0
    inlier = prob.obs_active & (chi2 <= CHI2_STEREO) & depth_ok
    return BAResult(
        cam_Tcw=cam_Tcw, pnt_pos=pnt_pos, obs_chi2=chi2,
        obs_depth_ok=depth_ok, obs_inlier=inlier,
    )

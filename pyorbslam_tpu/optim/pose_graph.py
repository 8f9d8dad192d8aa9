"""Sim3 pose-graph (essential graph) optimization.

Replaces Optimizer.optimize_essential_graph (Optimizer.py:485-658): Sim3
vertices for every keyframe, relative-Sim3 edges (loop connections,
spanning tree, previous loop edges, strong covisibles), identity 7x7
information, 20 LM iterations, loop keyframe fixed.

The graph is solved as batched dense linear algebra: per-edge residuals
r = log(Sji * Si * Sj^-1) and their Jacobians (forward-mode autodiff of
the two retractions, vmapped over edges) are scattered into a dense
(7C x 7C) normal matrix — one solve per iteration.  C on KITTI-scale maps
is a few hundred to ~1.5k keyframes; 7C systems of that size factor in
milliseconds on the MXU.  Scale components are frozen for stereo
(bFixScale).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pyorbslam_tpu.geometry import sim3 as sim3_mod
from pyorbslam_tpu.geometry.sim3 import Sim3


class PoseGraphResult(NamedTuple):
    R: jnp.ndarray    # (C, 3, 3) corrected Siw rotations
    t: jnp.ndarray    # (C, 3)
    s: jnp.ndarray    # (C,)


def _edge_residual(Si: Sim3, Sj: Sim3, Sji: Sim3) -> jnp.ndarray:
    """r = log(Sji * Si * Sj^-1): zero iff Sj = Sji * Si ... i.e. the
    relative transform matches the measurement (EdgeSim3 semantics)."""
    return sim3_mod.log(
        sim3_mod.compose(Sji, sim3_mod.compose(Si, sim3_mod.inverse(Sj)))
    )


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_pose_graph(
    R: jnp.ndarray,          # (C, 3, 3) initial Siw
    t: jnp.ndarray,          # (C, 3)
    s: jnp.ndarray,          # (C,)
    fixed: jnp.ndarray,      # (C,) bool (loop KF + padding)
    e_i: jnp.ndarray,        # (E,) int32 vertex i per edge
    e_j: jnp.ndarray,        # (E,) int32 vertex j
    m_R: jnp.ndarray,        # (E, 3, 3) measured Sji
    m_t: jnp.ndarray,        # (E, 3)
    m_s: jnp.ndarray,        # (E,)
    e_active: jnp.ndarray,   # (E,) bool
    iters: int = 20,
    fix_scale: bool = True,
) -> PoseGraphResult:
    C = R.shape[0]
    meas = Sim3(R=m_R, t=m_t, s=m_s)

    def residual_and_jac(state: Sim3):
        Si = jax.tree_util.tree_map(lambda a: a[e_i], state)
        Sj = jax.tree_util.tree_map(lambda a: a[e_j], state)

        def res(xi_i, xi_j, SiE, SjE, SjiE):
            return _edge_residual(
                sim3_mod.retract(SiE, xi_i), sim3_mod.retract(SjE, xi_j), SjiE
            )

        zero = jnp.zeros(7, jnp.float32)
        r = jax.vmap(res, in_axes=(None, None, 0, 0, 0))(zero, zero, Si, Sj, meas)
        Ji = jax.vmap(
            lambda SiE, SjE, SjiE: jax.jacfwd(res, argnums=0)(zero, zero, SiE, SjE, SjiE)
        )(Si, Sj, meas)   # (E, 7, 7)
        Jj = jax.vmap(
            lambda SiE, SjE, SjiE: jax.jacfwd(res, argnums=1)(zero, zero, SiE, SjE, SjiE)
        )(Si, Sj, meas)
        return r, Ji, Jj

    def total_err(state):
        Si = jax.tree_util.tree_map(lambda a: a[e_i], state)
        Sj = jax.tree_util.tree_map(lambda a: a[e_j], state)
        r = jax.vmap(_edge_residual)(Si, Sj, meas)
        return jnp.sum(jnp.sum(r * r, -1) * e_active)

    def body(_, carry):
        state, lam = carry
        r, Ji, Jj = residual_and_jac(state)
        w = e_active.astype(jnp.float32)

        H = jnp.zeros((C, 7, C, 7))
        b = jnp.zeros((C, 7))
        wJi = w[:, None, None] * Ji
        wJj = w[:, None, None] * Jj
        H = H.at[e_i, :, e_i, :].add(jnp.einsum("eij,eik->ejk", wJi, Ji))
        H = H.at[e_j, :, e_j, :].add(jnp.einsum("eij,eik->ejk", wJj, Jj))
        H = H.at[e_i, :, e_j, :].add(jnp.einsum("eij,eik->ejk", wJi, Jj))
        H = H.at[e_j, :, e_i, :].add(jnp.einsum("eij,eik->ejk", wJj, Ji))
        b = b.at[e_i].add(jnp.einsum("eij,ei->ej", wJi, r))
        b = b.at[e_j].add(jnp.einsum("eij,ei->ej", wJj, r))

        free = (~fixed).astype(jnp.float32)[:, None].repeat(7, 1)
        if fix_scale:
            free = free.at[:, 6].set(0.0)
        free_f = free.reshape(-1)
        Hf = H.reshape(7 * C, 7 * C)
        Hf = Hf * free_f[:, None] * free_f[None, :]
        Hf = Hf + jnp.diag(1.0 - free_f) + lam * jnp.diag(jnp.diag(Hf)) + 1e-8 * jnp.eye(7 * C)
        bf = b.reshape(-1) * free_f

        dx = -jnp.linalg.solve(Hf, bf).reshape(C, 7)
        new_state = sim3_mod.retract(state, dx)
        new_state = Sim3(
            R=jnp.where(fixed[:, None, None], state.R, new_state.R),
            t=jnp.where(fixed[:, None], state.t, new_state.t),
            s=jnp.where(fixed, state.s, new_state.s),
        )
        better = total_err(new_state) < total_err(state)
        state = jax.tree_util.tree_map(
            lambda a, c: jnp.where(better, a, c), new_state, state
        )
        lam = jnp.where(better, lam * 0.5, lam * 5.0)
        return state, lam

    state0 = Sim3(R=R, t=t, s=s)
    state, _ = jax.lax.fori_loop(0, iters, body, (state0, jnp.float32(1e-8)))
    return PoseGraphResult(R=state.R, t=state.t, s=state.s)

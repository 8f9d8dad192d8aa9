"""Round-3 experiment: BA `_residuals` einsum-vs-broadcast lowering.

Measured on the tunneled v5e: the (O,3,3)@(O,3,6) einsums lower to padded
MXU batched matmuls (and run bf16 outside the f32_matmuls context); the
broadcast-multiply-sum form is 1.6x faster (7.3 -> 4.6 ms at 88k obs) and
exactly f32.  `_residuals` runs ~3x per LM iteration and dominates the BA
solve — landing this form in optim/ba.py (+ba_cg, dist_ba) is the round-4
perf lever (see BA-stage timers in the bench JSON).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from pyorbslam_tpu.geometry import se3
from pyorbslam_tpu.optim import ba as bamod
from tests.test_ba import make_ba_problem

def _bmv(A, x):   # (...,i,j) @ (...,j)
    return jnp.sum(A * x[..., None, :], axis=-1)
def _bmm(A, B):   # (...,i,j) @ (...,j,k)
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)

def residuals_vpu(prob, cam_Tcw, pnt_pos):
    fx, fy, cx, cy, bf = (prob.cam[i] for i in range(5))
    T = cam_Tcw[prob.obs_cam]
    X = pnt_pos[prob.obs_pnt]
    R = T[:, :3, :3]
    Pc = _bmv(R, X) + T[:, :3, 3]
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
    dh_dp = jnp.stack([du, dv, dur], axis=1)
    dp_dxi = jnp.concatenate(
        [-se3.hat(Pc), jnp.broadcast_to(jnp.eye(3), Pc.shape[:-1] + (3, 3))],
        axis=-1)
    Jc = -_bmm(dh_dp, dp_dxi)
    Jp = -_bmm(dh_dp, R)
    return e, Jc, Jp, z

prob,_,_ = make_ba_problem(np.random.default_rng(1), n_cam=20, n_pnt=6000, pnt_span=(-12,30))
f_old = jax.jit(lambda p: bamod._residuals(p, p.cam_Tcw, p.pnt_pos))
f_new = jax.jit(lambda p: residuals_vpu(p, p.cam_Tcw, p.pnt_pos))

def t(label, fn, n=10):
    jax.block_until_ready(fn())
    t0=time.perf_counter()
    for _ in range(n): r = fn()
    jax.block_until_ready(r)
    print(f"{label}: {(time.perf_counter()-t0)/n*1000:.2f} ms")

t("einsum residuals", lambda: f_old(prob))
t("vpu residuals", lambda: f_new(prob))
ro = f_old(prob); rn = f_new(prob)
for a, b, name in zip(ro, rn, "e Jc Jp z".split()):
    print(name, "max diff", float(jnp.abs(a-b).max()))

"""Mass matrix (CRB), factorization, and bias forces (RNE) — level-vectorized.

TPU design notes:
- The mass matrix is built **dense** with one (nv,6)x(6,nv) matmul plus a
  static ancestor mask — batched over envs this is MXU work, unlike
  MuJoCo's sparse LTL path which is pointer-chasing.
- Tree accumulations (composite inertias, force backprop) run one
  scatter-add per tree level using the static Plan, so the traced graph is
  O(depth).
- Factorization is a batched dense Cholesky (nv is 36-73 for the target
  models); XLA batches it across envs.
Semantics match mj_crb / mj_factorM / mj_rne (validated vs the C oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from brax_tracking_tpu import math as btm
from brax_tracking_tpu.math.spatial import inert_mul_cm, motion_cross_force_cm
from brax_tracking_tpu.physics import model as M


def crb(m: M.Model, d: M.Data) -> M.Data:
    """Composite-rigid-body mass matrix, dense."""
    dtype = d.qpos.dtype
    if m.nv == 0:
        return d.replace(qM=jnp.zeros((0, 0), dtype))

    # composite inertia = subtree sums: one mask matmul per field (MXU)
    SUB = jnp.asarray(m.plan.body_subtree_mask, dtype)
    ci = d.cinert_s @ SUB.T  # (6, nbody) composite packed inertia
    ch = d.cinert_h @ SUB.T  # (3, nbody)
    cm = SUB @ m.body_mass.astype(dtype)

    dofb = np.asarray(m.dof_bodyid)
    f = inert_mul_cm(ci[:, dofb], ch[:, dofb], cm[dofb], d.cdof)  # (6, nv)

    # qM[i, j] = cdof_j . f_i on the ancestor sparsity; symmetrize
    mask = jnp.asarray(m.dof_ancestor_mask)
    full = jnp.einsum("ci,cj->ij", f, d.cdof)
    lower = jnp.where(mask, full, 0.0)
    qM = lower + lower.T - jnp.diag(jnp.diag(lower))
    qM = qM + jnp.diag(m.dof_armature.astype(dtype))
    # f is kept as the low-rank qM factor (qM = mask-sym of f^T cdof): the
    # batched megakernel rebuilds qM from (f, cdof) in VMEM and the dense
    # qM above is dead-code-eliminated on that path.
    return d.replace(qM=qM, crb_f=f)


def factor_m(m: M.Model, d: M.Data) -> M.Data:
    """Dense Cholesky factor of qM: qLD holds the UPPER factor U (qM=U'U).

    Under an outer vmap on TPU this dispatches to the Pallas lane-batched
    kernel (ops/cholesky.py); unbatched/CPU uses jax.scipy.
    """
    from brax_tracking_tpu.ops import cholesky as ops_chol

    return d.replace(qLD=ops_chol.cholesky_factor(d.qM))


def invert_m(m: M.Model, d: M.Data) -> M.Data:
    """Dense inverse of qM (sweep-operator Pallas kernel when batched on TPU).

    One inversion costs about one factorization, and it turns every
    downstream M^-1 rhs (qacc_smooth + one per CG iteration in the
    constraint solver) into a single batched matmul instead of an nv-step
    triangular substitution — the solver's hot path on TPU.

    With joint damping, (M + h diag(B))^-1 (the Euler implicit-damping
    update, step.py) is produced in the same call, sharing the lane-batched
    layout staging.
    """
    from brax_tracking_tpu.ops import cholesky as ops_chol

    if m.has_damping:
        damp = m.dof_damping.astype(d.qpos.dtype) * m.opt.timestep.astype(
            d.qpos.dtype
        )
        qMinv, qMhinv = ops_chol.spd_inverse2(d.qM, damp)
        return d.replace(qMinv=qMinv, qMhinv=qMhinv)
    return d.replace(qMinv=ops_chol.spd_inverse(d.qM))


def solve_m(m: M.Model, d: M.Data, rhs: jax.Array) -> jax.Array:
    """Solves qM x = rhs from qMinv (fast path) or the Cholesky factor.

    rhs may be (nv,) or (nv, k).
    """
    from brax_tracking_tpu.ops import cholesky as ops_chol

    if d.qMinv is not None:
        return d.qMinv @ rhs
    if rhs.ndim == 1:
        return ops_chol.cholesky_solve(d.qLD, rhs)
    y = jax.scipy.linalg.solve_triangular(d.qLD.T, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(d.qLD, y, lower=False)


def rne(m: M.Model, d: M.Data) -> M.Data:
    """Recursive Newton-Euler: qfrc_bias = C(qpos, qvel) (gravity included)."""
    dtype = d.qpos.dtype
    if m.nv == 0:
        return d.replace(qfrc_bias=jnp.zeros(0, dtype))
    gravity = m.opt.gravity.astype(dtype)
    cacc0 = jnp.concatenate([jnp.zeros(3, dtype), -gravity])

    dofb = np.asarray(m.dof_bodyid)
    D2B = jnp.asarray(np.eye(m.nbody, dtype=np.float64)[dofb], dtype)  # (nv, nb)
    dof_acc = (d.cdof_dot * d.qvel[None, :]) @ D2B  # (6, nbody)
    # prefix (root-to-body) and subtree (body-to-root) accumulations as mask
    # matmuls — see plan.body_subtree_mask
    SUB = jnp.asarray(m.plan.body_subtree_mask, dtype)
    cacc = cacc0[:, None] + dof_acc @ SUB

    mass = m.body_mass.astype(dtype)
    fv = inert_mul_cm(d.cinert_s, d.cinert_h, mass, d.cvel)
    cfrc = inert_mul_cm(d.cinert_s, d.cinert_h, mass, cacc)
    cfrc = cfrc + motion_cross_force_cm(d.cvel, fv)
    cfrc = cfrc.at[:, 0].set(0.0)
    cfrc = cfrc @ SUB.T  # subtree (body-to-root) sum

    qfrc_bias = jnp.einsum("ci,ci->i", d.cdof, cfrc[:, dofb])
    return d.replace(qfrc_bias=qfrc_bias)

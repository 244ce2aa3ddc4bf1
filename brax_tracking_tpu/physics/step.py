"""Fused forward dynamics and integration entry points.

``forward`` mirrors mj_forward's stage order; ``step`` adds semi-implicit
Euler integration (with MuJoCo's implicit joint-damping treatment). Both
operate on a single env; the env layer vmaps and scans substeps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from brax_tracking_tpu.physics import model as M
from brax_tracking_tpu.physics import kinematics as K


def make_data(m: M.Model, dtype=None) -> M.Data:
    """Fresh Data at qpos0, zero velocity."""
    dtype = dtype or m.qpos0.dtype
    d = M.Data(
        qpos=m.qpos0.astype(dtype),
        qvel=jnp.zeros(m.nv, dtype),
        act=jnp.zeros(m.na, dtype),
        time=jnp.zeros((), dtype),
        ctrl=jnp.zeros(m.nu, dtype),
    )
    return d


def fwd_position_smooth(m: M.Model, d: M.Data, mats: bool = False) -> M.Data:
    """Position-stage smooth pipeline (no collision yet).

    ``mats=False``: the engine hot path never materializes (n, 3, 3)
    rotation-matrix fields (consumers derive from quaternions); pass True
    for oracle-parity tests that compare xmat/ximat directly.
    """
    d = K.kinematics(m, d, mats=mats)
    d = K.com_pos(m, d)
    d = K.tendon(m, d)
    return d


def fwd_velocity_smooth(m: M.Model, d: M.Data) -> M.Data:
    d = K.com_vel(m, d)
    return d


def forward(m: M.Model, d: M.Data) -> M.Data:
    """Full forward dynamics at the current state. Built up stage by stage;
    see dynamics/constraint/solver modules."""
    from brax_tracking_tpu.physics import dynamics as D
    from brax_tracking_tpu.physics import passive as P
    from brax_tracking_tpu.physics import actuation as A
    from brax_tracking_tpu.physics import collision as C
    from brax_tracking_tpu.physics import constraint as Cn
    from brax_tracking_tpu.physics import solver as S
    from brax_tracking_tpu.physics import sensor as Sn

    quad_kernel = S.quad_kernel_eligible(m)
    newton = m.opt.solver == M.SOLVER_NEWTON
    d = fwd_position_smooth(m, d)
    d = C.collision(m, d)
    d = D.crb(m, d)
    if not quad_kernel and not newton:
        # the quad-kernel solve path computes M^-1 products internally
        # (in VMEM on TPU); the Newton path needs only single-rhs M^-1
        # products (below) — materialized inverses are the XLA-CG path's
        # per-iteration preconditioner only
        d = D.invert_m(m, d)
    d = fwd_velocity_smooth(m, d)
    d = P.passive(m, d)
    d = D.rne(m, d)
    d = A.fwd_actuation(m, d)
    # smooth acceleration
    qfrc_smooth = d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator
    if quad_kernel:
        d = d.replace(qfrc_smooth=qfrc_smooth)  # qacc_smooth set by solve
    elif newton:
        from brax_tracking_tpu.ops import cholesky as ops_chol

        qacc_smooth = ops_chol.spd_solve(d.qM, qfrc_smooth)
        d = d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)
    else:
        qacc_smooth = D.solve_m(m, d, qfrc_smooth)
        d = d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)
    # constraints
    d = Cn.make_constraint(m, d)
    d = S.solve(m, d)
    # warm-start the next solve from this step's solution (mj_forward
    # copies qacc into qacc_warmstart after mj_fwdConstraint; MJX does the
    # same) — cuts the Newton path's iteration count to the 2-3 steps a
    # near-solution needs instead of a cold start's 5-8.
    d = d.replace(qacc_warmstart=d.qacc)
    d = Sn.sensors(m, d)
    return d


def _integrate_pos(m: M.Model, qpos: jax.Array, qvel: jax.Array, dt) -> jax.Array:
    """mj_integratePos, vectorized across joints.

    Scalar joints (hinge/slide) integrate with ONE gather+scatter pair;
    quaternion joints (free root, ball) are few per model and handled with
    a short static loop each.
    """
    import numpy as np

    from brax_tracking_tpu import math as btm

    jtypes = np.asarray(m.jnt_type)
    qadrs = np.asarray(m.jnt_qposadr)
    dadrs = np.asarray(m.jnt_dofadr)

    out = qpos
    # all hinge/slide dofs at once
    scalar = (jtypes == M.JNT_HINGE) | (jtypes == M.JNT_SLIDE)
    if scalar.any():
        sq = qadrs[scalar]
        sd = dadrs[scalar]
        out = out.at[sq].add(dt * qvel[sd])
    # free-joint translations (usually one) — contiguous slices
    for jid in np.nonzero(jtypes == M.JNT_FREE)[0]:
        qadr, dadr = int(qadrs[jid]), int(dadrs[jid])
        out = out.at[qadr : qadr + 3].add(dt * qvel[dadr : dadr + 3])
        q = btm.quat_integrate(
            qpos[qadr + 3 : qadr + 7], qvel[dadr + 3 : dadr + 6], dt
        )
        out = out.at[qadr + 3 : qadr + 7].set(q)
    for jid in np.nonzero(jtypes == M.JNT_BALL)[0]:
        qadr, dadr = int(qadrs[jid]), int(dadrs[jid])
        q = btm.quat_integrate(qpos[qadr : qadr + 4], qvel[dadr : dadr + 3], dt)
        out = out.at[qadr : qadr + 4].set(q)
    return out


def step(m: M.Model, d: M.Data) -> M.Data:
    """One physics step: forward dynamics + semi-implicit Euler.

    Matches MuJoCo's Euler integrator: joint damping is integrated
    implicitly by solving (M + h diag(damping)) v' = M v + h f_total.
    """
    d = forward(m, d)
    dt = m.opt.timestep.astype(d.qpos.dtype)

    if d.qvel_next is not None:
        # quad-kernel solve path: the Euler implicit-damping update was
        # produced inside the solve (in VMEM on TPU)
        qvel_new = d.qvel_next
    elif m.has_damping:
        # Implicit joint damping (MuJoCo Euler): damping already contributes
        # -B v_t inside qfrc_smooth, so the implicit velocity update is
        #   v' = v + h (M + hB)^-1 (qfrc_smooth + qfrc_constraint).
        qfrc = d.qfrc_smooth + d.qfrc_constraint
        if d.qMhinv is not None:
            # (M + hB)^-1 was produced alongside qMinv (dynamics.invert_m)
            qvel_new = d.qvel + dt * (d.qMhinv @ qfrc)
        else:
            # Newton path: single rhs — fused factor+solve, no inverse
            from brax_tracking_tpu.ops import cholesky as ops_chol

            damp = m.dof_damping.astype(d.qpos.dtype) * dt
            qvel_new = d.qvel + dt * ops_chol.spd_solve(
                d.qM + jnp.diag(damp), qfrc
            )
    else:
        qvel_new = d.qvel + dt * d.qacc

    qpos_new = _integrate_pos(m, d.qpos, qvel_new, dt)
    # act integration: Euler for filter/integrator/muscle, exact
    # discretization for filterexact, then actrange clamping (mj_advance /
    # mj_nextActivation semantics).
    if m.na:
        act_new = d.act + dt * d.act_dot
        exact = np.nonzero(
            np.asarray(m.actuator_dyntype) == M.DYN_FILTEREXACT
        )[0]
        for u in exact:
            aadr = int(m.actuator_actadr[u]) + int(m.actuator_actnum[u]) - 1
            tau = jnp.maximum(
                m.actuator_dynprm[u, 0].astype(d.qpos.dtype), M.MINVAL
            )
            act_new = act_new.at[aadr].set(
                d.act[aadr] + d.act_dot[aadr] * tau * (1.0 - jnp.exp(-dt / tau))
            )
        from brax_tracking_tpu.physics import actuation as Act

        act_new = Act.clamp_act(m, act_new)
    else:
        act_new = d.act
    return d.replace(qpos=qpos_new, qvel=qvel_new, act=act_new, time=d.time + dt)

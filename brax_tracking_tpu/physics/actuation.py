"""Actuation: transmission, activation dynamics, gain/bias force.

Covers the actuator inventory of the target models (SURVEY.md §2):
- fly:    direct torque motors on hinge joints
          (assets/fruitfly/fruitfly_force_fast.xml:853-911)
- rodent: <general> filtered affine actuators on joints and fixed tendons
          (assets/rodent.xml:575-613): first-order filter activation,
          fixed gain, affine bias (position/velocity feedback).

mj_fwdActuation semantics, validated against the C oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from brax_tracking_tpu.physics import model as M


def _moment_length_velocity(m: M.Model, d: M.Data):
    """Actuator transmission: (nu, nv) moment matrix + lengths/velocities.

    mj_transmission semantics per trntype:
    - joint (hinge/slide): length = gear0 * qpos, moment one-hot at the dof;
    - joint (ball): length = gear[:3] . quat2vel(qpos4), moment rows are the
      constant gear[:3] over the 3 dofs (engine_core_transmission.c,
      mjTRN_JOINT / mjJNT_BALL branch);
    - tendon: gear0-scaled tendon length/jacobian.
    """
    dtype = d.qpos.dtype
    from brax_tracking_tpu import math as btm

    moment = jnp.zeros((m.nu, m.nv), dtype)
    lengths = []
    for u in range(m.nu):
        trn = int(m.actuator_trntype[u])
        gear = m.actuator_gear[u, 0].astype(dtype)
        tid = int(m.actuator_trnid[u, 0])
        if trn == M.TRN_JOINT:
            jtype = int(m.jnt_type[tid])
            qadr = int(m.jnt_qposadr[tid])
            dadr = int(m.jnt_dofadr[tid])
            if jtype in (M.JNT_HINGE, M.JNT_SLIDE):
                lengths.append(d.qpos[qadr] * gear)
                moment = moment.at[u, dadr].set(gear)
            elif jtype == M.JNT_BALL:
                gear3 = m.actuator_gear[u, :3].astype(dtype)
                vel3 = btm.quat_to_axis_angle(d.qpos[qadr : qadr + 4])
                lengths.append(jnp.dot(gear3, vel3))
                moment = jax.lax.dynamic_update_slice(
                    moment, gear3[None, :], (u, dadr)
                )
            else:
                raise NotImplementedError("free-joint transmission")
        elif trn == M.TRN_TENDON:
            lengths.append(d.ten_length[tid] * gear)
            moment = moment.at[u].set(gear * d.ten_J[tid])
        else:
            raise NotImplementedError(f"transmission type {trn}")
    length = jnp.stack(lengths) if m.nu else jnp.zeros(0, dtype)
    velocity = moment @ d.qvel
    return moment, length, velocity


def _sigmoid(x):
    """mju_sigmoid: quintic smoothstep clamped to [0, 1]."""
    xc = jnp.clip(x, 0.0, 1.0)
    return xc * xc * xc * (xc * (xc * 6.0 - 15.0) + 10.0)


def _muscle_lv(length, vel, lengthrange, prm):
    """Normalized muscle length L and velocity V (mju_muscleGain prologue)."""
    r0, r1 = prm[..., 0], prm[..., 1]
    vmax = prm[..., 6]
    L0 = (lengthrange[..., 1] - lengthrange[..., 0]) / jnp.maximum(
        M.MINVAL, r1 - r0
    )
    L = r0 + (length - lengthrange[..., 0]) / jnp.maximum(M.MINVAL, L0)
    V = vel / jnp.maximum(M.MINVAL, L0 * vmax)
    return L, V


def _muscle_force(force, scale, acc0):
    """Negative force means auto-scale by scale/acc0 (mju_muscle* scaling)."""
    return jnp.where(force < 0, scale / jnp.maximum(M.MINVAL, acc0), force)


def muscle_gain(length, vel, lengthrange, acc0, prm):
    """mju_muscleGain: active FLV force, returned negative (pulls only).

    prm = (range0, range1, force, scale, lmin, lmax, vmax, fpmax, fvmax);
    piecewise-quadratic force-length bump on [lmin, lmax], piecewise
    force-velocity curve saturating at fvmax.
    """
    force = _muscle_force(prm[..., 2], prm[..., 3], acc0)
    lmin, lmax, fvmax = prm[..., 4], prm[..., 5], prm[..., 8]
    L, V = _muscle_lv(length, vel, lengthrange, prm)

    a = 0.5 * (lmin + 1.0)
    b = 0.5 * (1.0 + lmax)
    x1 = (L - lmin) / jnp.maximum(M.MINVAL, a - lmin)
    x2 = (1.0 - L) / jnp.maximum(M.MINVAL, 1.0 - a)
    x3 = (L - 1.0) / jnp.maximum(M.MINVAL, b - 1.0)
    x4 = (lmax - L) / jnp.maximum(M.MINVAL, lmax - b)
    FL = jnp.where(
        (L >= lmin) & (L <= a),
        0.5 * x1 * x1,
        jnp.where(
            (L > a) & (L <= 1.0),
            1.0 - 0.5 * x2 * x2,
            jnp.where(
                (L > 1.0) & (L <= b),
                1.0 - 0.5 * x3 * x3,
                jnp.where((L > b) & (L <= lmax), 0.5 * x4 * x4, 0.0),
            ),
        ),
    )
    y = fvmax - 1.0
    FV = jnp.where(
        V <= -1.0,
        0.0,
        jnp.where(
            V <= 0.0,
            (V + 1.0) * (V + 1.0),
            jnp.where(
                V <= y, fvmax - (y - V) * (y - V) / jnp.maximum(M.MINVAL, y), fvmax
            ),
        ),
    )
    return -force * FL * FV


def muscle_bias(length, lengthrange, acc0, prm):
    """mju_muscleBias: passive force, half-quadratic then linear beyond b."""
    force = _muscle_force(prm[..., 2], prm[..., 3], acc0)
    lmax, fpmax = prm[..., 5], prm[..., 7]
    L, _ = _muscle_lv(length, jnp.zeros_like(length), lengthrange, prm)
    b = 0.5 * (1.0 + lmax)
    xq = (L - 1.0) / jnp.maximum(M.MINVAL, b - 1.0)
    xl = (L - b) / jnp.maximum(M.MINVAL, b - 1.0)
    return jnp.where(
        L <= 1.0,
        0.0,
        jnp.where(
            L <= b, -force * fpmax * 0.5 * xq * xq, -force * fpmax * (0.5 + xl)
        ),
    )


def muscle_dynamics(ctrl, act, prm):
    """mju_muscleDynamics: Millard-style activation with optional smoothing.

    prm = (tau_act, tau_deact, smoothing_width).
    """
    ctrlclamp = jnp.clip(ctrl, 0.0, 1.0)
    actclamp = jnp.clip(act, 0.0, 1.0)
    tau_act = prm[..., 0] * (0.5 + 1.5 * actclamp)
    tau_deact = prm[..., 1] / (0.5 + 1.5 * actclamp)
    width = prm[..., 2]
    dctrl = ctrlclamp - act
    tau_hard = jnp.where(dctrl > 0, tau_act, tau_deact)
    tau_smooth = tau_deact + (tau_act - tau_deact) * _sigmoid(
        dctrl / jnp.maximum(M.MINVAL, width) + 0.5
    )
    tau = jnp.where(width < M.MINVAL, tau_hard, tau_smooth)
    return dctrl / jnp.maximum(M.MINVAL, tau)


def fwd_actuation(m: M.Model, d: M.Data) -> M.Data:
    dtype = d.qpos.dtype
    if m.nu == 0:
        return d.replace(
            qfrc_actuator=jnp.zeros(m.nv, dtype),
            actuator_force=jnp.zeros(0, dtype),
            act_dot=jnp.zeros(0, dtype),
        )

    # clamp ctrl
    ctrl = d.ctrl
    lim = jnp.asarray(m.actuator_ctrllimited)
    lo = m.actuator_ctrlrange[:, 0].astype(dtype)
    hi = m.actuator_ctrlrange[:, 1].astype(dtype)
    ctrl = jnp.where(lim, jnp.clip(ctrl, lo, hi), ctrl)

    moment, length, velocity = _moment_length_velocity(m, d)

    # activation dynamics + actuator input
    act_dot = jnp.zeros(m.na, dtype)
    inputs = []
    for u in range(m.nu):
        dyn = int(m.actuator_dyntype[u])
        if dyn == M.DYN_NONE:
            inputs.append(ctrl[u])
        elif dyn in (M.DYN_FILTER, M.DYN_FILTEREXACT, M.DYN_INTEGRATOR):
            aadr = int(m.actuator_actadr[u]) + int(m.actuator_actnum[u]) - 1
            act_u = d.act[aadr]
            if dyn == M.DYN_INTEGRATOR:
                act_dot = act_dot.at[aadr].set(ctrl[u])
            else:
                tau = jnp.maximum(m.actuator_dynprm[u, 0].astype(dtype), M.MINVAL)
                act_dot = act_dot.at[aadr].set((ctrl[u] - act_u) / tau)
            inputs.append(act_u)
        elif dyn == M.DYN_MUSCLE:
            aadr = int(m.actuator_actadr[u]) + int(m.actuator_actnum[u]) - 1
            act_u = d.act[aadr]
            act_dot = act_dot.at[aadr].set(
                muscle_dynamics(ctrl[u], act_u, m.actuator_dynprm[u].astype(dtype))
            )
            inputs.append(act_u)
        else:
            raise NotImplementedError(f"actuator dyntype {dyn}")
    inp = jnp.stack(inputs)

    lr = m.actuator_lengthrange.astype(dtype)
    acc0 = m.actuator_acc0.astype(dtype)

    # gain
    gaintype = np.asarray(m.actuator_gaintype)
    gp = m.actuator_gainprm.astype(dtype)
    gain = gp[:, 0]
    if np.any(gaintype == M.GAIN_AFFINE):
        gain_affine = gp[:, 0] + gp[:, 1] * length + gp[:, 2] * velocity
        gain = jnp.where(jnp.asarray(gaintype == M.GAIN_AFFINE), gain_affine, gain)
    if np.any(gaintype == M.GAIN_MUSCLE):
        gain_mus = muscle_gain(length, velocity, lr, acc0, gp)
        gain = jnp.where(jnp.asarray(gaintype == M.GAIN_MUSCLE), gain_mus, gain)

    # bias
    biastype = np.asarray(m.actuator_biastype)
    bp = m.actuator_biasprm.astype(dtype)
    bias = jnp.zeros(m.nu, dtype)
    if np.any(biastype == M.BIAS_AFFINE):
        bias_affine = bp[:, 0] + bp[:, 1] * length + bp[:, 2] * velocity
        bias = jnp.where(jnp.asarray(biastype == M.BIAS_AFFINE), bias_affine, bias)
    if np.any(biastype == M.BIAS_MUSCLE):
        bias_mus = muscle_bias(length, lr, acc0, bp)
        bias = jnp.where(jnp.asarray(biastype == M.BIAS_MUSCLE), bias_mus, bias)

    force = gain * inp + bias

    flim = jnp.asarray(m.actuator_forcelimited)
    flo = m.actuator_forcerange[:, 0].astype(dtype)
    fhi = m.actuator_forcerange[:, 1].astype(dtype)
    force = jnp.where(flim, jnp.clip(force, flo, fhi), force)

    qfrc_actuator = moment.T @ force
    return d.replace(
        qfrc_actuator=qfrc_actuator, actuator_force=force, act_dot=act_dot
    )


def clamp_act(m: M.Model, act: jax.Array) -> jax.Array:
    """Post-integration activation clamping (actlimited)."""
    if m.na == 0 or not np.any(m.actuator_actlimited):
        return act
    dtype = act.dtype
    out = act
    for u in range(m.nu):
        if not m.actuator_actlimited[u]:
            continue
        aadr = int(m.actuator_actadr[u])
        for k in range(int(m.actuator_actnum[u])):
            out = out.at[aadr + k].set(
                jnp.clip(
                    out[aadr + k],
                    m.actuator_actrange[u, 0].astype(dtype),
                    m.actuator_actrange[u, 1].astype(dtype),
                )
            )
    return out

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
    """Actuator transmission: (nu, nv) moment matrix + lengths/velocities."""
    dtype = d.qpos.dtype
    moment = jnp.zeros((m.nu, m.nv), dtype)
    lengths = []
    for u in range(m.nu):
        trn = int(m.actuator_trntype[u])
        gear = m.actuator_gear[u, 0].astype(dtype)
        tid = int(m.actuator_trnid[u, 0])
        if trn == M.TRN_JOINT:
            jtype = int(m.jnt_type[tid])
            if jtype not in (M.JNT_HINGE, M.JNT_SLIDE):
                raise NotImplementedError("only scalar-joint transmissions")
            qadr = int(m.jnt_qposadr[tid])
            dadr = int(m.jnt_dofadr[tid])
            lengths.append(d.qpos[qadr] * gear)
            moment = moment.at[u, dadr].set(gear)
        elif trn == M.TRN_TENDON:
            lengths.append(d.ten_length[tid] * gear)
            moment = moment.at[u].set(gear * d.ten_J[tid])
        else:
            raise NotImplementedError(f"transmission type {trn}")
    length = jnp.stack(lengths) if m.nu else jnp.zeros(0, dtype)
    velocity = moment @ d.qvel
    return moment, length, velocity


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
        else:
            raise NotImplementedError(f"actuator dyntype {dyn}")
    inp = jnp.stack(inputs)

    # gain
    gaintype = np.asarray(m.actuator_gaintype)
    gp = m.actuator_gainprm.astype(dtype)
    gain_fixed = gp[:, 0]
    gain_affine = gp[:, 0] + gp[:, 1] * length + gp[:, 2] * velocity
    gain = jnp.where(jnp.asarray(gaintype == M.GAIN_AFFINE), gain_affine, gain_fixed)
    if not set(np.unique(gaintype)).issubset({M.GAIN_FIXED, M.GAIN_AFFINE}):
        raise NotImplementedError("muscle gain")

    # bias
    biastype = np.asarray(m.actuator_biastype)
    bp = m.actuator_biasprm.astype(dtype)
    bias_affine = bp[:, 0] + bp[:, 1] * length + bp[:, 2] * velocity
    bias = jnp.where(jnp.asarray(biastype == M.BIAS_AFFINE), bias_affine, 0.0)
    if not set(np.unique(biastype)).issubset({M.BIAS_NONE, M.BIAS_AFFINE}):
        raise NotImplementedError("muscle bias")

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

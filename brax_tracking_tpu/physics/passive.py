"""Passive forces: joint/tendon springs & dampers, inertia-box fluid drag.

mj_passive semantics. The fluid model matters for the fly
(assets/fruitfly/*.xml option: density 0.00128, viscosity 0.000185 —
SURVEY.md §2 component 16); per-geom fluid coefficients are all zero in the
target models, so only the body inertia-box model is implemented.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from brax_tracking_tpu import math as btm
from brax_tracking_tpu.physics import model as M


def _sub_quat(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """mju_subQuat: 3D velocity-space difference qa - qb."""
    return btm.quat_to_axis_angle(btm.quat_mul(btm.quat_conj(qb), qa))


def spring_damper(m: M.Model, d: M.Data) -> jax.Array:
    dtype = d.qpos.dtype
    qfrc = jnp.zeros(m.nv, dtype)

    # joint springs
    for jid in range(m.njnt):
        k = m.jnt_stiffness[jid].astype(dtype)
        jtype = int(m.jnt_type[jid])
        qadr = int(m.jnt_qposadr[jid])
        dadr = int(m.jnt_dofadr[jid])
        if jtype == M.JNT_FREE:
            qfrc = qfrc.at[dadr : dadr + 3].add(
                -k * (d.qpos[qadr : qadr + 3] - m.qpos_spring[qadr : qadr + 3])
            )
            dif = _sub_quat(
                d.qpos[qadr + 3 : qadr + 7], m.qpos_spring[qadr + 3 : qadr + 7]
            )
            qfrc = qfrc.at[dadr + 3 : dadr + 6].add(-k * dif)
        elif jtype == M.JNT_BALL:
            dif = _sub_quat(d.qpos[qadr : qadr + 4], m.qpos_spring[qadr : qadr + 4])
            qfrc = qfrc.at[dadr : dadr + 3].add(-k * dif)
        else:
            qfrc = qfrc.at[dadr].add(
                -k * (d.qpos[qadr] - m.qpos_spring[qadr])
            )

    # dof dampers
    qfrc = qfrc - m.dof_damping.astype(dtype) * d.qvel

    # tendon springs (with deadband) and dampers
    if m.ntendon:
        ten_vel = d.ten_J @ d.qvel
        lo = m.tendon_lengthspring[:, 0].astype(dtype)
        hi = m.tendon_lengthspring[:, 1].astype(dtype)
        length = d.ten_length
        displacement = jnp.where(
            length > hi, hi - length, jnp.where(length < lo, lo - length, 0.0)
        )
        frc = m.tendon_stiffness.astype(dtype) * displacement
        frc = frc - m.tendon_damping.astype(dtype) * ten_vel
        qfrc = qfrc + d.ten_J.T @ frc

    return qfrc


def fluid(m: M.Model, d: M.Data) -> jax.Array:
    """Inertia-box fluid model (viscous + quadratic drag per body)."""
    dtype = d.qpos.dtype
    density = m.opt.density.astype(dtype)
    viscosity = m.opt.viscosity.astype(dtype)
    wind = m.opt.wind.astype(dtype)

    mass = m.body_mass.astype(dtype)
    inertia = m.body_inertia.astype(dtype)  # (nbody, 3) principal
    safe_mass = jnp.maximum(mass, M.MINVAL)

    # equivalent box half-sizes from diagonal inertia
    ix, iy, iz = inertia[:, 0], inertia[:, 1], inertia[:, 2]
    box = jnp.stack(
        [
            jnp.sqrt(jnp.maximum(M.MINVAL, iy + iz - ix) / safe_mass * 6.0) / 2,
            jnp.sqrt(jnp.maximum(M.MINVAL, ix + iz - iy) / safe_mass * 6.0) / 2,
            jnp.sqrt(jnp.maximum(M.MINVAL, ix + iy - iz) / safe_mass * 6.0) / 2,
        ],
        axis=-1,
    )  # (nbody, 3)

    # local 6D velocity at body inertial frame (mj_objectVelocity flg_local=1)
    root_com = d.subtree_com[m.body_rootid]
    ang_w = d.cvel[:3].T  # (nbody, 3)
    lin_w = d.cvel[3:].T + jnp.cross(ang_w, d.xipos - root_com)
    # rotate into the inertial frame (quat-based; ximat is not materialized
    # on the hot path)
    iquat = btm.quat_mul(d.xquat, m.body_iquat.astype(dtype))
    rot_inv = jax.vmap(btm.quat_rotate_inv)
    ang = rot_inv(iquat, ang_w)
    lin = rot_inv(iquat, lin_w)
    lwind = rot_inv(iquat, jnp.broadcast_to(wind, ang_w.shape))
    lin = lin - lwind

    lfrc_ang = jnp.zeros_like(ang)
    lfrc_lin = jnp.zeros_like(lin)

    # viscous resistance (equivalent-sphere approximation; box holds
    # half-sizes, the sphere diameter is the mean full edge length)
    diam = 2.0 * jnp.mean(box, axis=-1, keepdims=True)
    lfrc_ang = lfrc_ang - jnp.pi * diam**3 * viscosity * ang
    lfrc_lin = lfrc_lin - 3.0 * jnp.pi * diam * viscosity * lin

    # quadratic lift/drag
    b0, b1, b2 = box[:, 0:1], box[:, 1:2], box[:, 2:3]
    areas = jnp.concatenate([b1 * b2, b0 * b2, b0 * b1], axis=-1)
    lfrc_lin = lfrc_lin - 0.5 * density * areas * jnp.abs(lin) * lin
    tmom = jnp.concatenate(
        [b0 * (b1**4 + b2**4), b1 * (b0**4 + b2**4), b2 * (b0**4 + b1**4)],
        axis=-1,
    )
    lfrc_ang = lfrc_ang - density * tmom * jnp.abs(ang) * ang / 64.0

    # rotate to world, then shift to the c-frame origin and project onto dofs
    rot_f = jax.vmap(btm.quat_rotate)
    torque_w = rot_f(iquat, lfrc_ang)
    force_w = rot_f(iquat, lfrc_lin)
    torque_c = torque_w + jnp.cross(d.xipos - root_com, force_w)
    fvec = jnp.concatenate([torque_c, force_w], axis=-1)  # (nbody, 6)
    # world body has zero mass; mask it out
    fvec = fvec.at[0].set(0.0)

    # qfrc[j] += cdof_j . fvec_b for each body b moved by dof j
    contrib = jnp.einsum("cv,bc->vb", d.cdof, fvec)  # (nv, nbody)
    mask = jnp.asarray(m.body_dof_mask).T.astype(dtype)  # (nv, nbody)
    return jnp.sum(contrib * mask, axis=1)


def passive(m: M.Model, d: M.Data) -> M.Data:
    qfrc = spring_damper(m, d)
    # static gate: fluid only compiled in when the model declares a medium
    if m.has_fluid:
        qfrc = qfrc + fluid(m, d)
    return d.replace(qfrc_passive=qfrc)

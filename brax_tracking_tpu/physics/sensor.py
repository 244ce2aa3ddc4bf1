"""Sensors: the set used by the rodent model (assets/rodent.xml:615-624).

accelerometer / velocimeter / gyro (site-frame), touch (contact normal force
summed over the site's body geoms), subtreelinvel. Written post-solve so
acceleration-dependent sensors can use qacc.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from brax_tracking_tpu.physics import constraint as Cn
from brax_tracking_tpu.physics import model as M


def _site_vel(m: M.Model, d: M.Data, site: int, body: int):
    """6D velocity of a site, world-aligned at the site position."""
    root = int(m.body_rootid[body])
    com = d.subtree_com[root]
    ang = d.cvel[:3, body]
    lin = d.cvel[3:, body] + jnp.cross(ang, d.site_xpos[site] - com)
    return ang, lin


def _site_rot_inv(m: M.Model, d: M.Data, site: int, v: jax.Array) -> jax.Array:
    """rot^T @ v for the site frame, from the stored site quaternion."""
    from brax_tracking_tpu import math as btm

    return btm.quat_rotate_inv(d.site_xquat[site], v)


def sensors(m: M.Model, d: M.Data) -> M.Data:
    dtype = d.qpos.dtype
    if m.nsensor == 0:
        return d.replace(sensordata=jnp.zeros(0, dtype))

    out = jnp.zeros(m.nsensordata, dtype)
    layout = Cn.efc_layout(m) if m.ncon else None

    # body spatial accelerations (world, c-frame origin): from qacc
    # cacc[b] = cacc0 + sum_dofs (cdof_dot*qvel + cdof*qacc)
    gravity = m.opt.gravity.astype(dtype)
    cacc0 = jnp.concatenate([jnp.zeros(3, dtype), -gravity])
    dof_contrib = d.cdof_dot * d.qvel[None, :] + d.cdof * d.qacc[None, :]  # (6, nv)
    D2B = jnp.asarray(
        np.eye(m.nbody, dtype=np.float64)[np.asarray(m.dof_bodyid)], dtype
    )
    per_body = dof_contrib @ D2B  # (6, nbody)
    # root-to-body prefix sum as one mask matmul
    cacc = cacc0[:, None] + per_body @ jnp.asarray(
        m.plan.body_subtree_mask, dtype
    )  # (6, nbody)

    for s in range(m.nsensor):
        stype = int(m.sensor_type[s])
        adr = int(m.sensor_adr[s])
        objid = int(m.sensor_objid[s])
        if stype in (M.SENS_ACCELEROMETER, M.SENS_VELOCIMETER, M.SENS_GYRO):
            body = int(m.site_bodyid[objid])
            ang, lin = _site_vel(m, d, objid, body)
            if stype == M.SENS_GYRO:
                val = _site_rot_inv(m, d, objid, ang)
            elif stype == M.SENS_VELOCIMETER:
                val = _site_rot_inv(m, d, objid, lin)
            else:  # accelerometer: spatial acc at site, minus gravity trick
                root = int(m.body_rootid[body])
                com = d.subtree_com[root]
                off = d.site_xpos[objid] - com
                acc_lin = cacc[3:, body] + jnp.cross(cacc[:3, body], off)
                # convective term: w x v_site
                acc_lin = acc_lin + jnp.cross(ang, lin)
                val = _site_rot_inv(m, d, objid, acc_lin)
            out = out.at[adr : adr + 3].set(val)
        elif stype == M.SENS_SUBTREELINVEL:
            # momentum of subtree / mass
            mass = m.body_mass.astype(dtype)
            mom = mass[:, None] * (
                d.cvel[3:].T
                + jnp.cross(d.cvel[:3].T, d.xipos - d.subtree_com[m.body_rootid])
            )
            msum = jnp.zeros(3, dtype)
            total = jnp.zeros((), dtype)
            # static subtree membership
            sub = _subtree_bodies(m, objid)
            msum = jnp.sum(mom[sub], axis=0)
            total = jnp.sum(mass[np.asarray(sub)])
            out = out.at[adr : adr + 3].set(msum / jnp.maximum(total, M.MINVAL))
        elif stype == M.SENS_TOUCH:
            # sum of normal contact forces on geoms of the site's body whose
            # contact point lies within the site volume; simplified to all
            # contacts on that body (site spans the sole in the rodent model)
            body = int(m.site_bodyid[objid])
            val = jnp.zeros((), dtype)
            if m.ncon:
                for slot in range(m.ncon):
                    g1b = int(m.geom_bodyid[layout.con_geom1[slot]])
                    g2b = int(m.geom_bodyid[layout.con_geom2[slot]])
                    if body not in (g1b, g2b):
                        continue
                    row0 = int(layout.con_rows[slot])
                    dim = int(layout.con_dim[slot])
                    if dim == 1 or m.opt.cone == M.CONE_ELLIPTIC:
                        normal_f = d.efc_force[row0]
                    else:
                        # pyramidal: normal force = mu * sum(edge forces)
                        mu = m.pairs.friction[layout.con_pair[slot], 0].astype(dtype)
                        normal_f = mu * jnp.sum(
                            d.efc_force[row0 : row0 + 2 * (dim - 1)]
                        )
                    val = val + jnp.maximum(normal_f, 0.0)
            out = out.at[adr].set(val)
        else:
            raise NotImplementedError(f"sensor type {stype}")

    return d.replace(sensordata=out)


def _subtree_bodies(m: M.Model, root: int):
    out = []
    for b in range(root, m.nbody):
        p = b
        while p >= root:
            if p == root:
                out.append(b)
                break
            p = int(m.body_parentid[p])
    return np.array(out, np.int32)

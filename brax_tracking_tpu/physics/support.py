"""Analysis helpers over solved Data — the mj_contactForce equivalent.

The reference's env notebook (Env_Testing_Fly01.ipynb cells 13-16) reads
per-contact forces for its contact visualizations; MuJoCo exposes them via
``mj_contactForce`` (and MJX via ``support.contact_force``). This module
decodes the same quantity from this engine's constraint-row layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from brax_tracking_tpu.physics import constraint as Cn
from brax_tracking_tpu.physics import model as M


def contact_force(m: M.Model, d: M.Data, world_frame: bool = False) -> jax.Array:
    """Per-contact-slot wrench, (ncon, 6): [normal, t1, t2, tor, roll, roll].

    Decodes ``d.efc_force`` rows per the engine's cone convention:
    elliptic rows hold the force components directly; pyramidal rows are
    edge forces of the ``mu_i*Jn ± Jt_i`` pyramid, so
    ``normal = sum_i mu_i (f2i + f2i+1)`` and ``t_i = f2i − f2i+1``
    (MuJoCo's mju_decodePyramid). Inactive slots decode to zero because the
    solver zeroes their rows. With ``world_frame=True`` the translational
    part is rotated out of the contact frame (frame rows are [n, t1, t2]).

    Works under jit/vmap (the layout is static).
    """
    dtype = d.qpos.dtype
    out = jnp.zeros((m.ncon, 6), dtype)
    if m.ncon == 0 or d.efc_force.shape[-1] == 0:
        return out
    layout = Cn.efc_layout(m)
    elliptic = m.opt.cone == M.CONE_ELLIPTIC
    for slot in range(m.ncon):
        row0 = int(layout.con_rows[slot])
        if row0 < 0:
            continue
        dim = int(layout.con_dim[slot])
        pair = int(layout.con_pair[slot])
        if elliptic or dim == 1:
            vals = d.efc_force[row0 : row0 + dim]
            out = out.at[slot, :dim].set(vals)
        else:
            nf = 2 * (dim - 1)
            f = d.efc_force[row0 : row0 + nf]
            mu = m.pairs.friction[pair, : dim - 1].astype(dtype)
            pairs_sum = f[0::2] + f[1::2]
            out = out.at[slot, 0].set(jnp.sum(mu * pairs_sum))
            out = out.at[slot, 1:dim].set(f[0::2] - f[1::2])
    if world_frame:
        lin = jnp.einsum("cij,cj->ci", jnp.swapaxes(d.contact_frame, -1, -2), out[:, :3])
        out = jnp.concatenate([lin, out[:, 3:]], axis=1)
    return out


def active_contacts(m: M.Model, d: M.Data) -> jax.Array:
    """(ncon,) bool — slots whose dist is below the pair margin."""
    if m.ncon == 0:
        return jnp.zeros((0,), bool)
    margin = jnp.repeat(
        m.pairs.margin, np.asarray(m.pairs.npoint), total_repeat_length=m.ncon
    )
    return d.contact_dist < margin

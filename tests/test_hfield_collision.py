"""Height-field narrowphase vs the MuJoCo C oracle.

Beyond-parity capability: the reference's MJX backend does not step hfield
models at all, while MuJoCo C resolves them with per-prism MPR
(mjc_ConvexHField). Our scheme probes spheres (and capsules as 3 spheres
along the axis) against the 2(K-1)^2 surface triangles of a static K x K
elevation patch under the probe (physics/collision._hfield_probe), with an
exact point-triangle closest point.

The oracle emits one contact per penetrating prism; we emit the deepest
triangle contact per probe — so the tests assert deepest-contact depth
agreement, no deeper phantom, and contact/no-contact agreement, the same
bar as the mesh/convex suites (tests/test_mesh_collision.py).
"""

import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import brax_tracking_tpu.physics.spec as bspec
import brax_tracking_tpu.physics.step as bstep
from engine_harness import jit_forward, jit_step

NROW = NCOL = 17


def _terrain(seed=0):
    """Smooth-ish random elevation in [0, 1] (gait-scale bumps)."""
    rng = np.random.RandomState(seed)
    z = rng.uniform(0.0, 1.0, (NROW, NCOL))
    for _ in range(2):  # box blur to keep slopes oracle-friendly
        z = (
            z
            + np.roll(z, 1, 0) + np.roll(z, -1, 0)
            + np.roll(z, 1, 1) + np.roll(z, -1, 1)
        ) / 5.0
    z -= z.min()
    return z / max(z.max(), 1e-9)


def _build(other_geom, seed=0, flat=None):
    xml = f"""<mujoco>
    <asset><hfield name="terrain" nrow="{NROW}" ncol="{NCOL}"
        size="0.5 0.5 0.08 0.02"/></asset>
    <worldbody>
      <geom type="hfield" hfield="terrain"/>
      <body pos="0 0 0.3"><freejoint/><geom {other_geom}/></body>
    </worldbody></mujoco>"""
    mj = mujoco.MjModel.from_xml_string(xml)
    data = np.full((NROW, NCOL), flat) if flat is not None else _terrain(seed)
    mj.hfield_data[:] = data.ravel()
    model = bspec.model_from_mj(mj, dtype=jnp.float64)
    return mj, model


def _deepest_sweep(other_geom, seed, zs, xy_spread=0.35, n_poses=40,
                   d_tol=2e-3):
    mj, model = _build(other_geom)
    fwd = jit_forward(model)
    rng = np.random.RandomState(seed)
    hits = 0
    for _ in range(n_poses):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        qp = np.concatenate([
            rng.uniform(-xy_spread, xy_spread, 2),
            [rng.uniform(*zs)],
            q,
        ])
        mjd = mujoco.MjData(mj)
        mjd.qpos[:] = qp
        mujoco.mj_forward(mj, mjd)
        omin = (
            min(mjd.contact[i].dist for i in range(mjd.ncon))
            if mjd.ncon
            else None
        )
        d = bstep.make_data(model).replace(qpos=jnp.array(qp))
        d = fwd(d)
        dist = np.asarray(d.contact_dist)
        ours = dist[dist < 1e-9]
        if omin is None:
            # grazing tolerance: triangle-exact vs MPR at touch distance
            assert ours.size == 0 or ours.min() > -d_tol, ours
            continue
        if omin > -1e-5 and ours.size == 0:
            continue  # grazing the other way
        hits += 1
        assert ours.size >= 1, (omin,)
        if omin < -0.02:
            # deep overlap: per-probe triangle depth vs the oracle's
            # per-prism MPR MTV legitimately disagree on push-out
            # direction (same loosening as the mesh/convex suites)
            assert ours.min() <= 0.3 * omin, (ours.min(), omin)
            assert ours.min() > omin - 0.06, (ours.min(), omin)
        else:
            assert abs(ours.min() - omin) < d_tol, (ours.min(), omin)
    assert hits >= 8, hits


def test_hfield_sphere_random_poses():
    _deepest_sweep('type="sphere" size="0.06"', seed=41, zs=(0.05, 0.16))


def test_hfield_capsule_random_poses():
    _deepest_sweep(
        'type="capsule" size="0.04 0.07"', seed=42, zs=(0.05, 0.18),
        d_tol=4e-3,
    )


def test_hfield_sphere_penetration_grid():
    """Deterministic scan over the grid at fixed depth: every oracle
    contact is matched in depth AND position by our deepest slot."""
    mj, model = _build('type="sphere" size="0.05"')
    fwd = jit_forward(model)
    checked = 0
    for x in np.linspace(-0.3, 0.3, 5):
        for y in np.linspace(-0.3, 0.3, 5):
            mjd = mujoco.MjData(mj)
            # drop until the oracle reports a contact at this (x, y)
            for z in np.linspace(0.16, 0.02, 30):
                mjd.qpos[:] = [x, y, z, 1, 0, 0, 0]
                mujoco.mj_forward(mj, mjd)
                if mjd.ncon and min(
                    mjd.contact[i].dist for i in range(mjd.ncon)
                ) < -2e-3:
                    break
            if not mjd.ncon:
                continue
            omin = min(mjd.contact[i].dist for i in range(mjd.ncon))
            oi = int(np.argmin([mjd.contact[i].dist for i in range(mjd.ncon)]))
            d = bstep.make_data(model).replace(qpos=jnp.array(mjd.qpos))
            d = fwd(d)
            dist = np.asarray(d.contact_dist)
            s = int(np.argmin(dist))
            assert abs(dist[s] - omin) < 2e-3, (x, y, dist[s], omin)
            assert (
                np.linalg.norm(
                    np.asarray(d.contact_pos)[s] - mjd.contact[oi].pos
                )
                < 1.5e-2
            )
            checked += 1
    assert checked >= 15


@pytest.mark.slow
def test_sphere_settles_on_hfield():
    """A dropped ball comes to rest ON the terrain surface under the full
    step (hfield probe + contact solve), not through it. Flat elevation
    (a random surface would keep a frictional ball legitimately rolling)."""
    mj, model = _build('type="sphere" size="0.05" mass="0.1"', flat=0.5)
    d = bstep.make_data(model)
    step = jit_step(model)
    for _ in range(700):
        d = step(d)
    qpos = np.asarray(d.qpos)
    qvel = np.asarray(d.qvel)
    # oracle rest height at the same (x, y)
    mjd = mujoco.MjData(mj)
    mjd.qpos[:] = qpos
    mujoco.mj_forward(mj, mjd)
    dmin = min(mjd.contact[i].dist for i in range(mjd.ncon)) if mjd.ncon else 0.0
    assert np.abs(qvel).max() < 0.1, qvel
    assert -5e-3 < dmin < 1e-3, dmin  # resting on, not inside, the surface

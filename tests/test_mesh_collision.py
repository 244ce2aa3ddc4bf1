"""Convex-mesh narrowphase vs the MuJoCo C oracle.

The target models (rodent, fly) collide with primitives only, but the
reference's MJX backend supports convex-mesh collisions, so ours does too:
plane-mesh emits a 4-deepest-hull-vertex manifold (mjc_PlaneConvex
analogue), and every primitive-mesh / mesh-mesh pair runs through the same
support-function dual ascent as the other convex pairs
(physics/collision.py). Hull vertices are packed host-side into a static
padded (nmesh, maxvert, 3) array (physics/spec._build_meshes); the support
max over vertices is one MXU-friendly batched matmul.

Oracle caveat: for a flat face resting on the plane, mjc_PlaneConvex emits
3 contacts (the minimal stable set); we emit the full 4-corner manifold at
identical depth — the tests assert oracle-contact containment plus
depth/no-phantom agreement rather than exact count.
"""

import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import brax_tracking_tpu.physics.spec as bspec
import brax_tracking_tpu.physics.step as bstep
from engine_harness import build_cached, jit_forward

CUBE = (
    "-.07 -.06 -.05  .07 -.06 -.05  -.07 .06 -.05  .07 .06 -.05 "
    "-.07 -.06 .05   .07 -.06 .05   -.07 .06 .05   .07 .06 .05"
)
# irregular 6-vertex convex solid (distorted octahedron)
OCTA = (
    ".09 0 0  -.08 0 0  0 .07 0  0 -.06 0  0 0 .05  0 0 -.055"
)


def _roll_qpos(rng, base, spread):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    return np.concatenate([base + rng.uniform(-spread, spread, 3), q])


def _both(xml, qp):
    mj, model, fwd = build_cached(xml)
    mjd = mujoco.MjData(mj)
    mjd.qpos[:] = qp
    mujoco.mj_forward(mj, mjd)
    d = bstep.make_data(model).replace(qpos=jnp.array(qp))
    d = fwd(d)
    return mj, mjd, np.asarray(d.contact_dist), np.asarray(d.contact_pos), (
        np.asarray(d.contact_frame)
    )


def test_plane_mesh_manifold():
    """Flat, tilted and random cube-mesh poses over the plane: every oracle
    contact appears in our manifold at matching dist/pos/normal; no slot of
    ours is deeper than the oracle's deepest."""
    xml = f"""<mujoco><asset><mesh name="cube" vertex="{CUBE}"/></asset>
    <worldbody><geom type="plane" size="2 2 .1"/>
    <body pos="0 0 0.045"><freejoint/><geom type="mesh" mesh="cube"/></body>
    </worldbody></mujoco>"""
    rng = np.random.RandomState(11)
    hits = 0
    for t in range(20):
        if t == 0:  # flat face resting, 5mm deep
            qp = np.array([0, 0, 0.045, 1.0, 0, 0, 0])
        else:
            qp = _roll_qpos(rng, np.array([0.0, 0.0, 0.055]), 0.02)
        mj, mjd, dist, pos, fr = _both(xml, qp)
        act = np.nonzero(dist < 1e-9)[0]
        if mjd.ncon == 0:
            assert act.size == 0 or dist[act].min() > -1e-9
            continue
        hits += 1
        omin = min(mjd.contact[i].dist for i in range(mjd.ncon))
        assert dist[act].min() > omin - 1e-9  # no deeper phantom
        for i in range(mjd.ncon):
            c = mjd.contact[i]
            s = min(act, key=lambda k: np.linalg.norm(pos[k] - c.pos))
            assert abs(dist[s] - c.dist) < 1e-9, (i, dist[s], c.dist)
            assert np.linalg.norm(pos[s] - c.pos) < 1e-8
            assert np.linalg.norm(fr[s, 0] - c.frame[:3]) < 1e-9
    assert hits >= 10


@pytest.mark.parametrize(
    "seed,other",
    [
        (31, 'type="sphere" size="0.07"'),
        (32, 'type="capsule" size="0.05 0.08"'),
        (33, 'type="ellipsoid" size="0.08 0.06 0.05"'),
        (34, 'type="cylinder" size="0.06 0.08"'),
        (35, 'type="box" size="0.07 0.05 0.06"'),
    ],
)
def test_primitive_mesh_random_deepest(seed, other):
    """Primitive-vs-cube-mesh over random poses: deepest-contact depth
    agreement with the oracle's MPR, no deeper phantom, and
    contact/no-contact agreement (grazing tolerance)."""
    xml = f"""<mujoco><asset><mesh name="cube" vertex="{CUBE}"/></asset>
    <worldbody><geom {other}/>
    <body pos="0.15 0 0"><freejoint/><geom type="mesh" mesh="cube"/></body>
    </worldbody></mujoco>"""
    _deepest_agreement(xml, seed)


def test_mesh_mesh_random_deepest():
    xml = f"""<mujoco><asset><mesh name="cube" vertex="{CUBE}"/>
    <mesh name="octa" vertex="{OCTA}"/></asset>
    <worldbody><geom type="mesh" mesh="octa"/>
    <body pos="0.15 0 0"><freejoint/><geom type="mesh" mesh="cube"/></body>
    </worldbody></mujoco>"""
    _deepest_agreement(xml, 36)


def _deepest_agreement(xml, seed, n_poses=30):
    mj, model, fwd = build_cached(xml)
    rng = np.random.RandomState(seed)
    hits = 0
    for _ in range(n_poses):
        p = rng.uniform(-1, 1, 3)
        p = p / np.linalg.norm(p) * rng.uniform(0.11, 0.22)
        qp = _roll_qpos(rng, p, 0.0)
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
            assert ours.size == 0 or ours.min() > -5e-4, ours
            continue
        hits += 1
        assert ours.size >= 1, (omin,)
        if omin < -0.02:
            # deep overlap: MTV direction ambiguity between MPR and the
            # dual ascent (same loosening as test_collision_extended)
            assert ours.min() <= 0.2 * omin, (ours, omin)
            assert ours.min() >= omin - 2e-2
        else:
            assert abs(ours.min() - omin) < 2e-3, (ours, omin)
    assert hits >= 6


@pytest.mark.slow
def test_mesh_settles_on_floor():
    """A dropped cube mesh comes to rest on the plane under the full step
    (plane-mesh manifold + CG solve): ends flat, static, at hull depth."""
    xml = f"""<mujoco><option timestep="0.002"/>
    <asset><mesh name="cube" vertex="{CUBE}"/></asset>
    <worldbody><geom type="plane" size="2 2 .1"/>
    <body pos="0 0 0.08"><freejoint/>
    <geom type="mesh" mesh="cube" mass="0.1"/></body>
    </worldbody></mujoco>"""
    mj = mujoco.MjModel.from_xml_string(xml)
    model = bspec.model_from_mj(mj, dtype=jnp.float64)
    d = bstep.make_data(model)
    step = jax.jit(lambda dd: bstep.step(model, dd))
    for _ in range(800):
        d = step(d)
    qpos = np.asarray(d.qpos)
    qvel = np.asarray(d.qvel)
    assert abs(qpos[2] - 0.05) < 5e-3, qpos  # resting at half-height
    assert np.abs(qvel).max() < 5e-2, qvel

"""contact_force decoding vs the MuJoCo C oracle (mj_contactForce).

Same qpos through both pipelines with converged solver settings; per-slot
wrenches are matched to oracle contacts by position. Covers both cone
conventions: pyramidal (mu*Jn ± Jt edge decode) and elliptic (direct rows).
"""

import mujoco
import numpy as np
import jax.numpy as jnp

import brax_tracking_tpu.physics.spec as bspec
import brax_tracking_tpu.physics.step as bstep
from engine_harness import jit_forward
from brax_tracking_tpu.physics import support


def _forces(xml, qpos=None):
    mj = mujoco.MjModel.from_xml_string(xml)
    mjd = mujoco.MjData(mj)
    if qpos is not None:
        mjd.qpos[:] = qpos
    mujoco.mj_forward(mj, mjd)
    model = bspec.model_from_mj(mj, dtype=jnp.float64)
    d = bstep.make_data(model).replace(qpos=jnp.array(mjd.qpos))
    d = jit_forward(model)(d)
    ours = np.asarray(support.contact_force(model, d))
    pos = np.asarray(d.contact_pos)
    act = np.asarray(support.active_contacts(model, d))
    oracle = []
    for i in range(mjd.ncon):
        w = np.zeros(6)
        mujoco.mj_contactForce(mj, mjd, i, w)
        oracle.append((mjd.contact[i].pos.copy(), w))
    return oracle, ours, pos, act


PYRAMID_XML = """<mujoco>
<option timestep="0.002" solver="CG" iterations="50" ls_iterations="25"
        cone="pyramidal"/>
<worldbody><geom type="plane" size="2 2 .1"/>
<body pos="0 0 0.045"><freejoint/><geom type="box" size="0.08 0.06 0.05"/>
</body></worldbody></mujoco>"""

ELLIPTIC_XML = PYRAMID_XML.replace("pyramidal", "elliptic")


def _check(xml):
    oracle, ours, pos, act = _forces(xml)
    assert len(oracle) == act.sum()
    total_o = sum(w[0] for _, w in oracle)
    total_u = ours[act, 0].sum()
    # total normal force supports the weight identically
    np.testing.assert_allclose(total_u, total_o, rtol=1e-6)
    for cpos, w in oracle:
        s = min(np.nonzero(act)[0], key=lambda k: np.linalg.norm(pos[k] - cpos))
        np.testing.assert_allclose(ours[s], w, rtol=1e-5, atol=1e-8)


def test_contact_force_pyramidal():
    _check(PYRAMID_XML)


def test_contact_force_elliptic():
    _check(ELLIPTIC_XML)


def test_world_frame_rotation():
    mj = mujoco.MjModel.from_xml_string(PYRAMID_XML)
    mjd = mujoco.MjData(mj)
    mujoco.mj_forward(mj, mjd)
    model = bspec.model_from_mj(mj, dtype=jnp.float64)
    d = bstep.make_data(model).replace(qpos=jnp.array(mjd.qpos))
    d = jit_forward(model)(d)
    local = np.asarray(support.contact_force(model, d))
    world = np.asarray(support.contact_force(model, d, world_frame=True))
    fr = np.asarray(d.contact_frame)
    for s in range(local.shape[0]):
        np.testing.assert_allclose(
            world[s, :3], fr[s].T @ local[s, :3], atol=1e-12
        )

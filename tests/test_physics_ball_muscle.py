"""Ball-joint limits/transmissions and muscle actuators vs the C oracle.

Covers engine paths the target models never exercise (VERDICT round-1
"scoped engine gaps"): mj_instantiateLimit's mjJNT_BALL branch (dense
rotation-axis limit rows), mj_transmission's ball-joint branch
(length = gear . quat2vel, constant gear moment), mju_muscleGain /
mju_muscleBias / mju_muscleDynamics, and mjDYN_FILTEREXACT activation
integration — all on the ballmuscle.xml fixture.
"""

import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import brax_tracking_tpu.physics.spec as bspec
import brax_tracking_tpu.physics.step as bstep
from engine_harness import jit_forward, jit_step
import brax_tracking_tpu.physics.constraint as bcn


@pytest.fixture(scope="module")
def ballmuscle():
    model, mj = bspec.build_model(
        "builtin:ballmuscle.xml", solver="cg", iterations=50,
        ls_iterations=25, dtype=jnp.float64, return_mj=True,
    )
    mj.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
    return model, mj


def _axis_quat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    q = np.zeros(4)
    q[0] = np.cos(angle / 2)
    q[1:] = axis * np.sin(angle / 2)
    return q


def posed(mj, seed, shoulder_angle=0.58, wrist_angle=0.15):
    """Shoulder rotated near its 0.6 rad ball limit (margin 0.05 active)."""
    rng = np.random.RandomState(seed)
    mjd = mujoco.MjData(mj)
    mjd.qpos[0:4] = _axis_quat(rng.uniform(-1, 1, 3), shoulder_angle)
    mjd.qpos[4] = rng.uniform(-1.3, 1.3)  # elbow hinge
    mjd.qpos[5:9] = _axis_quat(rng.uniform(-1, 1, 3), wrist_angle)
    mjd.qvel[:] = rng.uniform(-0.5, 0.5, mj.nv)
    mjd.ctrl[:] = rng.uniform(-0.5, 1.0, mj.nu)
    mjd.act[:] = rng.uniform(0.1, 0.9, mj.na)
    mujoco.mj_forward(mj, mjd)
    return mjd


def run_forward(model, mjd):
    d = bstep.make_data(model)
    d = d.replace(
        qpos=jnp.array(mjd.qpos),
        qvel=jnp.array(mjd.qvel),
        ctrl=jnp.array(mjd.ctrl),
        act=jnp.array(mjd.act),
    )
    return jit_forward(model)(d)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_muscle_and_ball_actuation_parity(ballmuscle, seed):
    """actuator_force / act_dot / qfrc_actuator row-exact vs mj_forward."""
    model, mj = ballmuscle
    mjd = posed(mj, seed)
    d = run_forward(model, mjd)
    np.testing.assert_allclose(
        np.asarray(d.actuator_force), mjd.actuator_force, rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(d.act_dot), mjd.act_dot, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(d.qfrc_actuator), mjd.qfrc_actuator, rtol=1e-10, atol=1e-12
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_ball_limit_efc_rows_parity(ballmuscle, seed):
    """Dense ball-limit rows (J = -axis over the 3 dofs) + KBI coefficients."""
    model, mj = ballmuscle
    mjd = posed(mj, seed)
    d = run_forward(model, mjd)
    layout = bcn.efc_layout(model)
    assert layout.limit_ball_jnt.size == 2  # shoulder + wrist
    ourJ = np.asarray(bcn.dense_J(model, d))
    ourD, ouraref = np.asarray(d.efc_D), np.asarray(d.efc_aref)
    ourpos = np.asarray(d.efc_pos)
    J = mjd.efc_J.reshape(mjd.nefc, mj.nv)
    assert mjd.nefc >= 1  # shoulder limit active at 0.58 of [0, 0.6] m=0.05
    checked_ball = 0
    for r in range(mjd.nefc):
        t, jid = mjd.efc_type[r], mjd.efc_id[r]
        assert t == mujoco.mjtConstraint.mjCNSTR_LIMIT_JOINT
        if mj.jnt_type[jid] == mujoco.mjtJoint.mjJNT_BALL:
            bi = list(layout.limit_ball_jnt).index(jid)
            our_r = int(layout.limit_ball_rows[bi])
            checked_ball += 1
        else:
            our_r = int(layout.limit_rows[list(layout.limit_jnt).index(jid)])
        np.testing.assert_allclose(J[r], ourJ[our_r], atol=1e-10)
        np.testing.assert_allclose(mjd.efc_D[r], ourD[our_r], rtol=1e-10)
        np.testing.assert_allclose(mjd.efc_aref[r], ouraref[our_r], atol=1e-10)
        np.testing.assert_allclose(mjd.efc_pos[r], ourpos[our_r], atol=1e-12)
    assert checked_ball >= 1


@pytest.mark.parametrize("seed", [0, 1])
def test_ball_limit_solve_parity(ballmuscle, seed):
    """qacc / qfrc_constraint through the CG solve with ball limit rows."""
    model, mj = ballmuscle
    mjd = posed(mj, seed)
    d = run_forward(model, mjd)
    assert mjd.nefc > 0
    np.testing.assert_allclose(
        np.asarray(d.qacc_smooth), mjd.qacc_smooth, atol=1e-8
    )
    # ball models route through _solve_xla (megakernel eligibility excludes
    # dense ball rows); its convergence point differs from MuJoCo's CG by
    # O(1e-8) relative — hold a 1e-7-relative bound
    scale = max(np.abs(mjd.qacc).max(), 1.0)
    assert np.abs(np.asarray(d.qacc) - mjd.qacc).max() < 1e-7 * scale
    fscale = max(np.abs(mjd.qfrc_constraint).max(), 1.0)
    assert (
        np.abs(np.asarray(d.qfrc_constraint) - mjd.qfrc_constraint).max()
        < 1e-6 * fscale
    )


def test_trajectory_parity_with_act_integration(ballmuscle):
    """30 steps: muscle + filterexact activation integration, ball qpos
    integration, limit forces. Oracle act uses exact filter discretization
    for the filterexact slot (mj_nextActivation)."""
    model, mj = ballmuscle
    mjd = posed(mj, 3, shoulder_angle=0.45)
    ctrl = mjd.ctrl.copy()
    d = bstep.make_data(model).replace(
        qpos=jnp.array(mjd.qpos),
        qvel=jnp.array(mjd.qvel),
        ctrl=jnp.array(ctrl),
        act=jnp.array(mjd.act),
    )
    step_j = jax.jit(lambda dd: bstep.step(model, dd))
    for _ in range(30):
        mujoco.mj_step(mj, mjd)
        d = step_j(d)
    np.testing.assert_allclose(np.asarray(d.act), mjd.act, atol=1e-10)
    assert np.abs(np.asarray(d.qpos) - mjd.qpos).max() < 1e-6
    assert np.abs(np.asarray(d.qvel) - mjd.qvel).max() < 1e-5


def test_batched_step_with_ball_limits(ballmuscle):
    """vmap'd step over the custom_vmap solve dispatch (regression guard for
    the round-1 in_batched bug, now with dense ball rows in Jc)."""
    model, mj = ballmuscle
    B = 4
    rng = np.random.RandomState(7)
    qpos = np.stack(
        [posed(mj, s).qpos.copy() for s in range(B)]
    )
    d0 = bstep.make_data(model)
    dB = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), d0)
    dB = dB.replace(
        qpos=jnp.array(qpos),
        qvel=jnp.array(rng.uniform(-0.3, 0.3, (B, mj.nv))),
        ctrl=jnp.array(rng.uniform(0, 1, (B, mj.nu))),
    )
    out = jax.jit(jax.vmap(lambda dd: bstep.step(model, dd)))(dB)
    assert np.isfinite(np.asarray(out.qpos)).all()
    assert np.isfinite(np.asarray(out.qvel)).all()

"""Parity tests for the smooth (contact-free) pipeline vs the MuJoCo C oracle.

Covers: FK, com-frame quantities (subtree_com, cinert, cdof), velocities
(cvel, cdof_dot), CRB mass matrix, M-solve, and RNE bias forces, on the
rodent model (BASELINE config 1 morphology) at randomized states.
"""

import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import brax_tracking_tpu.physics.spec as bspec
import brax_tracking_tpu.physics.step as bstep
import brax_tracking_tpu.physics.dynamics as bdyn

RODENT = "/root/reference/assets/rodent.xml"


@pytest.fixture(scope="module")
def rodent():
    model, mj_model = bspec.build_model(
        RODENT, solver="cg", iterations=4, ls_iterations=4,
        dtype=jnp.float64, return_mj=True,
    )
    return model, mj_model


def randomize(mj_model, seed, vel_scale=1.0):
    rng = np.random.RandomState(seed)
    mjd = mujoco.MjData(mj_model)
    qpos = mj_model.qpos0.copy()
    qpos += rng.uniform(-0.1, 0.1, mj_model.nq)
    # renormalize free-joint quaternion
    for j in range(mj_model.njnt):
        if mj_model.jnt_type[j] == 0:
            adr = mj_model.jnt_qposadr[j] + 3
            qpos[adr : adr + 4] /= np.linalg.norm(qpos[adr : adr + 4])
        elif mj_model.jnt_type[j] == 1:
            adr = mj_model.jnt_qposadr[j]
            qpos[adr : adr + 4] /= np.linalg.norm(qpos[adr : adr + 4])
    mjd.qpos[:] = qpos
    mjd.qvel[:] = rng.uniform(-1, 1, mj_model.nv) * vel_scale
    mujoco.mj_forward(mj_model, mjd)
    return mjd


def run_ours(model, mjd):
    d = bstep.make_data(model)
    d = d.replace(qpos=jnp.array(mjd.qpos), qvel=jnp.array(mjd.qvel))
    d = bstep.fwd_position_smooth(model, d)
    d = bdyn.crb(model, d)
    d = bdyn.factor_m(model, d)
    d = bstep.fwd_velocity_smooth(model, d)
    d = bdyn.rne(model, d)
    return d


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kinematics_parity(rodent, seed):
    model, mj_model = rodent
    mjd = randomize(mj_model, seed)
    d = run_ours(model, mjd)
    np.testing.assert_allclose(np.asarray(d.xpos), mjd.xpos, atol=1e-10)
    # quaternions up to sign
    ours_q = np.asarray(d.xquat)
    ref_q = mjd.xquat.copy()
    sign = np.sign(np.sum(ours_q * ref_q, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours_q * sign, ref_q, atol=1e-9)
    np.testing.assert_allclose(np.asarray(d.xipos), mjd.xipos, atol=1e-10)
    np.testing.assert_allclose(np.asarray(d.xanchor), mjd.xanchor, atol=1e-10)
    np.testing.assert_allclose(np.asarray(d.xaxis), mjd.xaxis, atol=1e-10)
    np.testing.assert_allclose(np.asarray(d.geom_xpos), mjd.geom_xpos, atol=1e-10)
    np.testing.assert_allclose(np.asarray(d.site_xpos), mjd.site_xpos, atol=1e-10)


@pytest.mark.parametrize("seed", [0, 1])
def test_com_quantities_parity(rodent, seed):
    model, mj_model = rodent
    mjd = randomize(mj_model, seed)
    d = run_ours(model, mjd)
    np.testing.assert_allclose(np.asarray(d.subtree_com), mjd.subtree_com, atol=1e-10)
    # component-major layouts: cdof is (6, nv), cinert packed (6, nbody)
    np.testing.assert_allclose(np.asarray(d.cdof).T, mjd.cdof, atol=1e-9)
    # cinert: mujoco rows are [Ixx Iyy Izz Ixy Ixz Iyz, h, m] about c-frame —
    # the same packing order as cinert_s rows
    ci = mjd.cinert
    np.testing.assert_allclose(np.asarray(d.cinert_s).T, ci[:, :6], atol=1e-9)
    np.testing.assert_allclose(np.asarray(d.cinert_h).T, ci[:, 6:9], atol=1e-10)


@pytest.mark.parametrize("seed", [0, 1])
def test_velocity_parity(rodent, seed):
    model, mj_model = rodent
    mjd = randomize(mj_model, seed)
    d = run_ours(model, mjd)
    np.testing.assert_allclose(np.asarray(d.cvel).T, mjd.cvel, atol=1e-9)
    np.testing.assert_allclose(np.asarray(d.cdof_dot).T, mjd.cdof_dot, atol=1e-9)


@pytest.mark.parametrize("seed", [0, 1])
def test_crb_and_solve_parity(rodent, seed):
    model, mj_model = rodent
    mjd = randomize(mj_model, seed)
    d = run_ours(model, mjd)
    ref_m = np.zeros((mj_model.nv, mj_model.nv))
    mujoco.mj_fullM(mj_model, mjd, ref_m)
    np.testing.assert_allclose(np.asarray(d.qM), ref_m, atol=1e-9)
    # M-solve parity
    rng = np.random.RandomState(100 + seed)
    rhs = rng.randn(mj_model.nv)
    ours_x = np.asarray(bdyn.solve_m(model, d, jnp.array(rhs)))
    ref_x = rhs.copy().reshape(1, -1)
    mujoco.mj_solveM(mj_model, mjd, ref_x, rhs.reshape(1, -1))
    np.testing.assert_allclose(ours_x, ref_x[0], atol=1e-8)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rne_parity(rodent, seed):
    model, mj_model = rodent
    mjd = randomize(mj_model, seed)
    d = run_ours(model, mjd)
    np.testing.assert_allclose(
        np.asarray(d.qfrc_bias), mjd.qfrc_bias, atol=1e-9
    )


def test_fly_smooth_parity():
    """Same battery on the (tethered) fly morphology: different joint mix."""
    fly_xml = "/root/reference/assets/fruitfly/fruitfly_force_fast.xml"
    model, mj_model = bspec.build_model(
        fly_xml, free_jnt=False, solver="cg", iterations=4, ls_iterations=4,
        dtype=jnp.float64, return_mj=True,
    )
    mjd = randomize(mj_model, 7)
    d = run_ours(model, mjd)
    np.testing.assert_allclose(np.asarray(d.xpos), mjd.xpos, atol=1e-10)
    np.testing.assert_allclose(np.asarray(d.cvel).T, mjd.cvel, atol=1e-9)
    ref_m = np.zeros((mj_model.nv, mj_model.nv))
    mujoco.mj_fullM(mj_model, mjd, ref_m)
    np.testing.assert_allclose(np.asarray(d.qM), ref_m, atol=1e-9)
    np.testing.assert_allclose(np.asarray(d.qfrc_bias), mjd.qfrc_bias, atol=1e-9)

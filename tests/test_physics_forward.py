"""Full forward-dynamics parity vs the MuJoCo C oracle.

Covers passive forces (incl. the fly's fluid model), actuation (motors and
filtered-affine general actuators with tendon transmissions), collision
(dist/pos/frame), constraint row assembly (J/D/aref/pos for limits and both
friction cones), and the CG constraint solve, on contact-rich states of
both target morphologies. Oracle settings: warmstart disabled, noslip 0
(MJX-equivalent semantics — noslip is a C-only post-pass the reference's
MJX path never ran).
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

RODENT = "/root/reference/assets/rodent.xml"
FLY = "/root/reference/assets/fruitfly/fruitfly_force_fast.xml"


@pytest.fixture(scope="module")
def rodent():
    model, mj = bspec.build_model(
        RODENT, solver="cg", iterations=50, ls_iterations=25,
        dtype=jnp.float64, return_mj=True,
    )
    mj.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
    return model, mj


@pytest.fixture(scope="module")
def fly_free():
    model, mj = bspec.build_model(
        FLY, free_jnt=True, solver="cg", iterations=50, ls_iterations=25,
        dtype=jnp.float64, return_mj=True,
    )
    mj.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
    mj.opt.noslip_iterations = 0
    return model, mj


def posed_rodent(mj, seed):
    rng = np.random.RandomState(seed)
    mjd = mujoco.MjData(mj)
    qpos = mj.qpos0.copy()
    qpos[2] -= 0.012  # feet through the floor
    qpos[7:] += rng.uniform(-0.05, 0.05, mj.nq - 7)
    mjd.qpos[:] = qpos
    mjd.qvel[:] = rng.uniform(-0.5, 0.5, mj.nv)
    mjd.ctrl[:] = rng.uniform(-0.3, 0.3, mj.nu)
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
def test_rodent_forward_parity(rodent, seed):
    model, mj = rodent
    mjd = posed_rodent(mj, seed)
    d = run_forward(model, mjd)
    assert mjd.ncon > 0
    np.testing.assert_allclose(
        np.asarray(d.qfrc_passive), mjd.qfrc_passive, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(d.qfrc_actuator), mjd.qfrc_actuator, atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(d.act_dot), mjd.act_dot, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(d.qacc_smooth), mjd.qacc_smooth, atol=1e-6
    )
    scale = np.abs(mjd.qacc).max()
    assert np.abs(np.asarray(d.qacc) - mjd.qacc).max() < 1e-8 * scale
    np.testing.assert_allclose(
        np.asarray(d.qfrc_constraint), mjd.qfrc_constraint, atol=1e-6
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_rodent_efc_rows_parity(rodent, seed):
    """Row-exact check of J / D / aref / pos for limits + pyramidal contacts."""
    model, mj = rodent
    mjd = posed_rodent(mj, seed)
    d = run_forward(model, mjd)
    layout = bcn.efc_layout(model)
    our_pos = np.asarray(d.contact_pos)
    J = mjd.efc_J.reshape(mjd.nefc, mj.nv)
    ourJ, ourD = np.asarray(bcn.dense_J(model, d)), np.asarray(d.efc_D)
    ouraref, ourpos = np.asarray(d.efc_aref), np.asarray(d.efc_pos)
    # map oracle contacts to our slots by geom pair + position
    slotmap = {}
    for i in range(mjd.ncon):
        c = mjd.contact[i]
        cand = [
            s
            for s in range(model.ncon)
            if {int(layout.con_geom1[s]), int(layout.con_geom2[s])}
            == {c.geom1, c.geom2}
        ]
        slotmap[i] = min(cand, key=lambda s: np.linalg.norm(our_pos[s] - c.pos))
        np.testing.assert_allclose(
            our_pos[slotmap[i]], c.pos, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(d.contact_dist)[slotmap[i]], c.dist, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(d.contact_frame)[slotmap[i]].flatten(), c.frame, atol=1e-12
        )
    checked = 0
    for r in range(mjd.nefc):
        t, eid = mjd.efc_type[r], mjd.efc_id[r]
        if t == mujoco.mjtConstraint.mjCNSTR_LIMIT_JOINT:
            our_r = int(layout.limit_rows[list(layout.limit_jnt).index(eid)])
        elif t == mujoco.mjtConstraint.mjCNSTR_CONTACT_PYRAMIDAL:
            base = r
            while base > 0 and mjd.efc_id[base - 1] == eid and mjd.efc_type[base - 1] == t:
                base -= 1
            our_r = int(layout.con_rows[slotmap[eid]]) + (r - base)
        else:
            raise AssertionError(f"unexpected efc type {t}")
        np.testing.assert_allclose(J[r], ourJ[our_r], atol=1e-10)
        np.testing.assert_allclose(mjd.efc_D[r], ourD[our_r], rtol=1e-10)
        np.testing.assert_allclose(mjd.efc_aref[r], ouraref[our_r], atol=1e-8)
        np.testing.assert_allclose(mjd.efc_pos[r], ourpos[our_r], atol=1e-12)
        checked += 1
    assert checked == mjd.nefc > 50


def test_fly_forward_parity_with_contacts(fly_free):
    """Free fly dropped onto the floor: elliptic cone + fluid drag."""
    model, mj = fly_free
    mjd = mujoco.MjData(mj)
    mjd.qpos[:] = mj.qpos0
    for _ in range(2000):
        mujoco.mj_step(mj, mjd)
        if mjd.ncon >= 4 and np.min(mjd.contact.dist[: mjd.ncon]) < -1e-5:
            break
    rng = np.random.RandomState(5)
    mjd.ctrl[:] = rng.uniform(-0.2, 0.2, mj.nu)
    mujoco.mj_forward(mj, mjd)
    assert mjd.nefc > 0
    d = run_forward(model, mjd)
    np.testing.assert_allclose(
        np.asarray(d.qfrc_passive), mjd.qfrc_passive, atol=1e-6
    )
    # fly masses are milligram-scale: M^-1 amplifies force errors ~1e4,
    # so qacc parity is asserted relative to the acceleration scale
    sm_scale = max(np.abs(mjd.qacc_smooth).max(), 1.0)
    assert np.abs(np.asarray(d.qacc_smooth) - mjd.qacc_smooth).max() < 3e-4 * sm_scale
    # elliptic CG at 50 iterations: near-stationary-point parity (CG's
    # iterate path differs from the oracle's Newton default; the Newton
    # solver test holds 1e-5 on the same state)
    scale = max(np.abs(mjd.qacc).max(), 1.0)
    assert np.abs(np.asarray(d.qacc) - mjd.qacc).max() < 1e-3 * scale
    fscale = max(np.abs(mjd.qfrc_constraint).max(), 1e-9)
    assert np.abs(np.asarray(d.qfrc_constraint) - mjd.qfrc_constraint).max() < 1e-3 * fscale


def test_rodent_step_parity(rodent):
    """Semi-implicit Euler with implicit joint damping: one step."""
    model, mj = rodent
    rng = np.random.RandomState(1)
    mjd = mujoco.MjData(mj)
    mjd.qpos[:] = mj.qpos0
    mjd.qpos[2] -= 0.005
    mjd.qvel[:] = rng.uniform(-0.1, 0.1, mj.nv)
    ctrl = rng.uniform(-0.2, 0.2, mj.nu)
    mjd.ctrl[:] = ctrl
    qpos0, qvel0 = mjd.qpos.copy(), mjd.qvel.copy()
    mujoco.mj_step(mj, mjd)
    d = bstep.make_data(model).replace(
        qpos=jnp.array(qpos0), qvel=jnp.array(qvel0), ctrl=jnp.array(ctrl)
    )
    d = jit_step(model)(d)
    assert np.abs(np.asarray(d.qvel) - mjd.qvel).max() < 1e-4
    assert np.abs(np.asarray(d.qpos) - mjd.qpos).max() < 1e-7
    np.testing.assert_allclose(np.asarray(d.act), mjd.act, atol=1e-12)


def test_rodent_trajectory_parity(rodent):
    """20-step contact-rich trajectory stays within tight bounds of the C
    oracle (chaotic divergence bounds longer horizons)."""
    model, mj = rodent
    rng = np.random.RandomState(1)
    mjd = mujoco.MjData(mj)
    mjd.qpos[:] = mj.qpos0
    mjd.qpos[2] -= 0.005
    mjd.qvel[:] = rng.uniform(-0.1, 0.1, mj.nv)
    ctrl = rng.uniform(-0.2, 0.2, mj.nu)
    mjd.ctrl[:] = ctrl
    d = bstep.make_data(model).replace(
        qpos=jnp.array(mjd.qpos), qvel=jnp.array(mjd.qvel), ctrl=jnp.array(ctrl)
    )
    step_j = jax.jit(lambda dd: bstep.step(model, dd))
    for i in range(20):
        mujoco.mj_step(mj, mjd)
        d = step_j(d)
    assert np.abs(np.asarray(d.qpos) - mjd.qpos).max() < 1e-3

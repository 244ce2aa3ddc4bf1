"""Newton constraint-solver parity vs the MuJoCo C oracle.

The reference's MJX path supports mjSOL_NEWTON and ``rodent_pair.xml``
carries no <option> line, so it compiles to MuJoCo's *default* solver =
Newton, iterations=100 (SURVEY.md §2a#15). Covers:
- rodent (limits + pyramidal contacts) with solver="newton",
- rodent_pair built with XML defaults (must resolve to Newton),
- free fly (elliptic cones + fluid) with solver="newton",
- an analytic-vs-finite-difference check of the elliptic cone Hessian,
- vmap/while_loop compatibility (the env layer vmaps solve()).

Oracle settings match tests/test_physics_forward.py: warmstart disabled,
noslip 0.
"""

import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import brax_tracking_tpu.physics.model as M
import brax_tracking_tpu.physics.spec as bspec
import brax_tracking_tpu.physics.step as bstep
from engine_harness import jit_forward, jit_step

RODENT = "/root/reference/assets/rodent.xml"
PAIR = "/root/reference/assets/rodent_pair.xml"
FLY = "/root/reference/assets/fruitfly/fruitfly_force_fast.xml"


@pytest.fixture(scope="module")
def rodent_newton():
    model, mj = bspec.build_model(
        RODENT, solver="newton", iterations=100, ls_iterations=50,
        dtype=jnp.float64, return_mj=True,
    )
    mj.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
    return model, mj


@pytest.fixture(scope="module")
def pair_default():
    # No solver overrides: the XML defaults must survive the spec compile.
    model, mj = bspec.build_model(PAIR, dtype=jnp.float64, return_mj=True)
    mj.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
    return model, mj


def posed(mj, seed, drop=0.012):
    rng = np.random.RandomState(seed)
    mjd = mujoco.MjData(mj)
    qpos = mj.qpos0.copy()
    qpos[2] -= drop  # feet through the floor
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
def test_rodent_newton_parity(rodent_newton, seed):
    model, mj = rodent_newton
    assert model.opt.solver == M.SOLVER_NEWTON
    mjd = posed(mj, seed)
    assert mjd.ncon > 0
    d = run_forward(model, mjd)
    scale = np.abs(mjd.qacc).max()
    assert np.abs(np.asarray(d.qacc) - mjd.qacc).max() < 1e-8 * scale
    np.testing.assert_allclose(
        np.asarray(d.qfrc_constraint), mjd.qfrc_constraint, atol=1e-6
    )


def test_pair_xml_defaults_resolve_to_newton(pair_default):
    model, mj = pair_default
    assert mj.opt.solver == mujoco.mjtSolver.mjSOL_NEWTON
    assert model.opt.solver == M.SOLVER_NEWTON
    assert int(np.asarray(model.opt.iterations)) == 100


def test_pair_newton_parity(pair_default):
    """Two interacting rats on XML-default Newton/100."""
    model, mj = pair_default
    rng = np.random.RandomState(3)
    mjd = mujoco.MjData(mj)
    qpos = mj.qpos0.copy()
    # both free roots: drop both bodies into the floor a little
    for jid in range(mj.njnt):
        if mj.jnt_type[jid] == mujoco.mjtJoint.mjJNT_FREE:
            qadr = mj.jnt_qposadr[jid]
            qpos[qadr + 2] -= 0.010
    mjd.qpos[:] = qpos
    mjd.qvel[:] = rng.uniform(-0.3, 0.3, mj.nv)
    mjd.ctrl[:] = rng.uniform(-0.2, 0.2, mj.nu)
    mujoco.mj_forward(mj, mjd)
    assert mjd.ncon > 0
    d = run_forward(model, mjd)
    scale = np.abs(mjd.qacc).max()
    assert np.abs(np.asarray(d.qacc) - mjd.qacc).max() < 1e-8 * scale
    np.testing.assert_allclose(
        np.asarray(d.qfrc_constraint), mjd.qfrc_constraint, atol=1e-6
    )


def test_fly_newton_elliptic_parity():
    """Free fly on the floor: elliptic cones under Newton."""
    model, mj = bspec.build_model(
        FLY, free_jnt=True, solver="newton", iterations=100,
        ls_iterations=50, dtype=jnp.float64, return_mj=True,
    )
    mj.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
    mj.opt.noslip_iterations = 0
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
    # same relative framing as the elliptic CG test (milligram-scale masses)
    scale = max(np.abs(mjd.qacc).max(), 1.0)
    assert np.abs(np.asarray(d.qacc) - mjd.qacc).max() < 1e-5 * scale
    fscale = max(np.abs(mjd.qfrc_constraint).max(), 1e-9)
    assert (
        np.abs(np.asarray(d.qfrc_constraint) - mjd.qfrc_constraint).max()
        < 1e-5 * fscale
    )


def test_elliptic_cone_hessian_finite_difference():
    """The analytic middle-zone cone Hessian matches finite differences of
    the constraint cost (solver._eval_cost_force) in jar space."""
    from brax_tracking_tpu.physics import constraint as Cn
    from brax_tracking_tpu.physics import solver as S

    model, mj = bspec.build_model(
        FLY, free_jnt=True, solver="newton", dtype=jnp.float64,
        return_mj=True,
    )
    layout = Cn.efc_layout(model)
    meta = S._cone_meta(model, layout)
    assert meta.ell_con.size > 0
    friction = model.pairs.friction[layout.con_pair].astype(jnp.float64)
    exists_row = jnp.ones(layout.nefc, bool)
    exists_con = jnp.ones(model.ncon, bool)
    efc_D = jnp.asarray(np.random.RandomState(0).uniform(1.0, 2.0, layout.nefc))

    def cost(jar):
        c, _ = S._eval_cost_force(
            model, meta, layout, friction, exists_row, exists_con, jar, efc_D
        )
        return c

    rng = np.random.RandomState(1)
    jar = jnp.asarray(rng.uniform(-0.5, 0.5, layout.nefc))
    # analytic Hessian restricted to the elliptic rows, via jax.hessian of
    # the shared cost (gold) vs the closed-form block used by _solve_newton
    H_auto = jax.hessian(cost)(jar)
    rows = np.maximum(meta.ell_rows, 0)
    mu = np.asarray(friction)[meta.ell_con, 0]
    sc = np.asarray(friction)[meta.ell_con, 0:2] / mu[:, None]
    n = np.asarray(jar)[rows[:, 0]]
    u = np.asarray(jar)[rows[:, 1:]] * sc
    t = np.sqrt(np.maximum(u[:, 0] ** 2 + u[:, 1] ** 2, 1e-30))
    bottom = mu * n + t <= 0
    middle = ~bottom & (n < mu * t)
    dn = np.asarray(efc_D)[rows[:, 0]]
    dm = dn / (1 + mu * mu)
    nmt = n - mu * t
    g = sc * u / t[:, None]
    h = np.concatenate([np.ones_like(mu)[:, None], -mu[:, None] * g], -1)
    ghat = np.concatenate([np.zeros_like(mu)[:, None], g], -1)
    c = -dm * nmt * mu / t
    s2 = np.concatenate([np.zeros_like(mu)[:, None], sc * sc], -1)
    B = (
        dm[:, None, None] * h[:, :, None] * h[:, None, :]
        + c[:, None, None]
        * (np.eye(3) * s2[:, None, :] - ghat[:, :, None] * ghat[:, None, :])
    )
    checked = 0
    for k in range(len(mu)):
        blk = np.asarray(H_auto)[np.ix_(rows[k], rows[k])]
        if middle[k]:
            np.testing.assert_allclose(blk, B[k], atol=1e-9)
            checked += 1
        elif bottom[k]:
            np.testing.assert_allclose(
                blk, np.diag(np.asarray(efc_D)[rows[k]]), atol=1e-9
            )
    assert checked > 0, "no middle-zone cones sampled; adjust the seed"


def test_newton_vmap_batched_step(rodent_newton):
    """The env layer vmaps step(); Newton's while_loop must batch."""
    model, mj = rodent_newton
    rng = np.random.RandomState(7)
    B = 3
    qpos = np.tile(np.asarray(mj.qpos0), (B, 1))
    qpos[:, 2] -= 0.01
    qpos[:, 7:] += rng.uniform(-0.03, 0.03, (B, mj.nq - 7))
    d0 = bstep.make_data(model)
    ds = jax.vmap(
        lambda q, v, c: d0.replace(qpos=q, qvel=v, ctrl=c)
    )(
        jnp.asarray(qpos),
        jnp.asarray(rng.uniform(-0.2, 0.2, (B, mj.nv))),
        jnp.asarray(rng.uniform(-0.2, 0.2, (B, mj.nu))),
    )
    out = jax.jit(jax.vmap(lambda dd: bstep.step(model, dd)))(ds)
    assert np.all(np.isfinite(np.asarray(out.qpos)))
    assert np.all(np.isfinite(np.asarray(out.qacc)))

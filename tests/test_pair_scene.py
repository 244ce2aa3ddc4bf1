"""rodent_pair two-body scene (BASELINE.json config 4): build, step parity.

The pair scene stresses broadphase (ngeom=201, two interacting rats) and
the solver at its XML defaults (iterations=100, ls_iterations=50). Parity
is checked against the MuJoCo C oracle at the home pose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

PAIR_XML = "/root/reference/assets/rodent_pair.xml"


@pytest.mark.slow
def test_pair_forward_parity():
    import mujoco

    from brax_tracking_tpu.physics import spec as bspec, step as pstep

    m, mjm = bspec.build_model(PAIR_XML, dtype=jnp.float64, return_mj=True)
    assert m.nv == 146 and m.nbody == 133

    mjd = mujoco.MjData(mjm)
    rng = np.random.RandomState(0)
    mjd.qpos[:] = mjm.qpos0 + 0.005 * rng.randn(mjm.nq)
    mjd.qvel[:] = 0.05 * rng.randn(mjm.nv)
    mujoco.mj_forward(mjm, mjd)

    d = pstep.make_data(m, dtype=jnp.float64)
    d = d.replace(qpos=jnp.asarray(mjd.qpos), qvel=jnp.asarray(mjd.qvel))
    d = jax.jit(lambda s: pstep.forward(m, s))(d)

    # smooth dynamics parity is tight; constrained qacc matches to solver
    # tolerance (both run the same convex problem)
    np.testing.assert_allclose(
        np.asarray(d.qfrc_bias), mjd.qfrc_bias, atol=1e-8, rtol=1e-6
    )
    qacc_err = np.max(np.abs(np.asarray(d.qacc) - mjd.qacc))
    qacc_scale = max(1.0, np.max(np.abs(mjd.qacc)))
    assert qacc_err / qacc_scale < 5e-3, (qacc_err, qacc_scale)


@pytest.mark.slow
def test_pair_trajectory_stays_finite():
    from brax_tracking_tpu.physics import spec as bspec, step as pstep

    m = bspec.build_model(PAIR_XML, dtype=jnp.float32)
    d = pstep.make_data(m, dtype=jnp.float32)
    d = jax.jit(lambda s: pstep.forward(m, s))(d)

    def roll(d):
        def body(s, _):
            return pstep.step(m, s), None

        return jax.lax.scan(body, d, (), length=20)[0]

    out = jax.jit(roll)(d)
    assert bool(jnp.isfinite(out.qpos).all())
    assert bool(jnp.isfinite(out.qvel).all())

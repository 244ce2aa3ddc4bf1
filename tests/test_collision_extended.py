"""Extended narrowphase coverage vs the MuJoCo C oracle.

Pairs beyond what the target models use (VERDICT round-1 scoped gaps):
plane-cylinder (unified 4-slot rim scheme), sphere-box / capsule-box
(analytic closest point), and the ellipsoid pairs (Newton surface
projection; ellipsoid-ellipsoid via support-function-gap ascent, the exact
MTV). The analytic pairs match mjc_* to machine epsilon; the ellipsoid
pairs match MuJoCo's MPR to the tolerance MPR itself converges to.
"""

import os

import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import brax_tracking_tpu.physics.spec as bspec
import brax_tracking_tpu.physics.step as bstep
from engine_harness import build_cached, jit_forward


def _compare(xml, qpos=None, d_tol=1e-10, p_tol=1e-9, n_tol=1e-8,
             margin=0.0, deep_loose=False):
    """Runs both narrowphases; matches each oracle contact to our nearest
    active slot and checks dist/pos/normal. Returns the oracle ncon.

    deep_loose: contacts deeper than 2 cm (far beyond what a functioning
    simulation ever produces at dt=2 ms) get loose bounds — the oracle's
    deep-overlap case analysis and our iterative closest-feature scheme
    legitimately pick different (both defensible) push-out directions."""
    mj, model, fwd = build_cached(xml)
    mjd = mujoco.MjData(mj)
    if qpos is not None:
        mjd.qpos[:] = qpos
    mujoco.mj_forward(mj, mjd)
    d = bstep.make_data(model).replace(
        qpos=jnp.array(mjd.qpos), qvel=jnp.array(mjd.qvel)
    )
    d = fwd(d)
    dist = np.asarray(d.contact_dist)
    pos = np.asarray(d.contact_pos)
    fr = np.asarray(d.contact_frame)
    act = np.nonzero(dist < margin + 1e-9)[0]
    assert len(act) == mjd.ncon, (
        f"active slots {len(act)} != oracle ncon {mjd.ncon}"
    )
    for i in range(mjd.ncon):
        c = mjd.contact[i]
        s = min(act, key=lambda k: np.linalg.norm(pos[k] - c.pos))
        dt_, pt_, nt_ = d_tol, p_tol, n_tol
        if deep_loose and c.dist < -0.02:
            # normals up to ~75 deg apart (1.2 = 2 sin 37.5deg) still pass:
            # deep-overlap MTV direction is ambiguous between MPR and our
            # projection; opposed normals (2.0) would still fail.
            dt_, pt_, nt_ = 2e-2, 5e-2, 1.2
        assert abs(dist[s] - c.dist) < dt_, (i, dist[s], c.dist)
        assert np.linalg.norm(pos[s] - c.pos) < pt_, (i, pos[s], c.pos)
        assert np.linalg.norm(fr[s, 0] - c.frame[:3]) < nt_
    return mjd.ncon


def _free_qpos(rng, base_pos, spread):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    return np.concatenate([base_pos + rng.uniform(-spread, spread, 3), q])


def test_plane_cylinder_poses():
    """Tilted (1 rim contact), flat (3), side-lying (2) + random poses."""
    xml = """<mujoco><worldbody><geom type="plane" size="2 2 .1"/>
    <body pos="0 0 0.12"><freejoint/>
    <geom type="cylinder" size="0.1 0.15"/></body></worldbody></mujoco>"""
    rng = np.random.RandomState(0)
    total = 0
    for _ in range(20):
        qp = _free_qpos(rng, np.array([0.0, 0.0, 0.12]), 0.04)
        total += _compare(xml, qpos=qp, d_tol=1e-12, p_tol=1e-10, n_tol=1e-12)
    assert total > 10


def test_sphere_box_poses():
    xml = """<mujoco><worldbody><geom type="box" size="0.1 0.12 0.08"/>
    <body pos="0.15 0 0"><freejoint/><geom type="sphere" size="0.07"/>
    </body></worldbody></mujoco>"""
    rng = np.random.RandomState(1)
    total = 0
    for _ in range(30):
        p = rng.uniform(-1, 1, 3)
        p = p / np.linalg.norm(p) * rng.uniform(0.1, 0.22)
        total += _compare(
            xml, qpos=_free_qpos(rng, p, 0.0),
            d_tol=1e-12, p_tol=1e-10, n_tol=1e-10,
        )
    assert total > 10


def test_capsule_box_canonical():
    """Exact parity on the canonical configurations (flat / tip / edge)."""
    base = """<mujoco><worldbody><geom type="box" size="{bs}"/>
    <body pos="{p}"><freejoint/><geom type="capsule" size="0.05 0.1"
    euler="{e}"/></body></worldbody></mujoco>"""
    for bs, p, e in [
        ("0.2 0.2 0.08", "0 0 0.125", "0 90 0"),  # lying flat: 2 contacts
        ("0.2 0.2 0.08", "0.05 0 0.21", "0 10 0"),  # tip: 1 contact
        ("0.1 0.1 0.08", "0.12 0 0.06", "90 0 0"),  # across edge: 2
    ]:
        _compare(
            base.format(bs=bs, p=p, e=e),
            d_tol=1e-12, p_tol=1e-10, n_tol=1e-10,
        )


def test_capsule_box_random_deepest():
    """Random poses: matching mjc_CapsuleBox's exact second-contact case
    analysis is not attempted; assert the physically-load-bearing
    properties instead — the deepest contact agrees with the oracle and no
    phantom contact is deeper than the oracle's deepest."""
    xml = """<mujoco><worldbody><geom type="box" size="0.1 0.12 0.08"/>
    <body pos="0.2 0 0"><freejoint/><geom type="capsule" size="0.05 0.12"/>
    </body></worldbody></mujoco>"""
    mj = mujoco.MjModel.from_xml_string(xml)
    model = bspec.model_from_mj(mj, dtype=jnp.float64)
    rng = np.random.RandomState(2)
    hits = 0
    for _ in range(30):
        p = rng.uniform(-1, 1, 3)
        p = p / np.linalg.norm(p) * rng.uniform(0.15, 0.28)
        qp = _free_qpos(rng, p, 0.0)
        mjd = mujoco.MjData(mj)
        mjd.qpos[:] = qp
        mujoco.mj_forward(mj, mjd)
        d = bstep.make_data(model).replace(qpos=jnp.array(mjd.qpos))
        d = jit_forward(model)(d)
        dist = np.asarray(d.contact_dist)
        ours = dist[dist < 1e-9]
        if mjd.ncon == 0:
            assert ours.size == 0
            continue
        hits += 1
        omin = min(mjd.contact[i].dist for i in range(mjd.ncon))
        assert ours.size >= 1
        if omin < -0.02:
            # deep overlap (unreachable at dt=2ms): sign + monotonicity only
            assert ours.min() <= 0.2 * omin, (ours, omin)
            assert ours.min() >= omin - 2e-2
        else:
            assert abs(ours.min() - omin) < 1e-9, (ours, omin)
            assert ours.min() >= omin - 1e-9  # no phantom deeper than oracle
    assert hits > 10


def test_sphere_ellipsoid_poses():
    xml = """<mujoco><worldbody><geom type="ellipsoid" size="0.1 0.07 0.05"/>
    <body pos="0.15 0 0"><freejoint/><geom type="sphere" size="0.06"/>
    </body></worldbody></mujoco>"""
    rng = np.random.RandomState(3)
    total = 0
    for _ in range(30):
        p = rng.uniform(-1, 1, 3)
        p = p / np.linalg.norm(p) * rng.uniform(0.08, 0.16)
        total += _compare(
            xml, qpos=_free_qpos(rng, p, 0.0),
            d_tol=2e-4, p_tol=2e-3, n_tol=5e-2,  # oracle is MPR-approximate
            deep_loose=True,
        )
    assert total > 10


def test_capsule_ellipsoid_poses():
    xml = """<mujoco><worldbody><geom type="ellipsoid" size="0.09 0.06 0.04"/>
    <body pos="0.12 0 0"><freejoint/><geom type="capsule" size="0.04 0.1"/>
    </body></worldbody></mujoco>"""
    rng = np.random.RandomState(4)
    total = 0
    for _ in range(30):
        p = rng.uniform(-1, 1, 3)
        p = p / np.linalg.norm(p) * rng.uniform(0.07, 0.16)
        total += _compare(
            xml, qpos=_free_qpos(rng, p, 0.0),
            d_tol=5e-4, p_tol=5e-3, n_tol=1e-1, deep_loose=True,
        )
    assert total > 10


def test_ellipsoid_ellipsoid_poses():
    xml = """<mujoco><worldbody><geom type="ellipsoid" size="0.1 0.08 0.06"/>
    <body pos="0.15 0 0"><freejoint/>
    <geom type="ellipsoid" size="0.09 0.06 0.05"/></body></worldbody></mujoco>"""
    rng = np.random.RandomState(5)
    total = 0
    for _ in range(30):
        p = rng.uniform(-1, 1, 3)
        p = p / np.linalg.norm(p) * rng.uniform(0.08, 0.18)
        total += _compare(
            xml, qpos=_free_qpos(rng, p, 0.0),
            d_tol=5e-4, p_tol=5e-3, n_tol=1e-1,
        )
    assert total > 10


def test_sphere_cylinder_poses():
    """Sphere vs cylinder side/cap/rim regions over random poses."""
    xml = """<mujoco><worldbody>
    <geom type="cylinder" size="0.08 0.1" contype="1" conaffinity="1"/>
    <body pos="0.15 0 0"><freejoint/><geom type="sphere" size="0.05"/>
    </body></worldbody></mujoco>"""
    rng = np.random.RandomState(7)
    total = 0
    for _ in range(30):
        p = rng.uniform(-1, 1, 3)
        p = p / np.linalg.norm(p) * rng.uniform(0.08, 0.2)
        total += _compare(
            xml, qpos=_free_qpos(rng, p, 0.0),
            d_tol=1e-6, p_tol=1e-5, n_tol=1e-4, deep_loose=True,
        )
    assert total > 10


def test_capsule_cylinder_random_deepest():
    """The oracle resolves line contacts with its own multi-point manifold
    (count varies); assert deepest-contact agreement and no deeper
    phantom over random poses."""
    xml = """<mujoco><worldbody>
    <geom type="cylinder" size="0.07 0.09" contype="1" conaffinity="1"/>
    <body pos="0.15 0 0"><freejoint/><geom type="capsule" size="0.04 0.08"/>
    </body></worldbody></mujoco>"""
    mj = mujoco.MjModel.from_xml_string(xml)
    model = bspec.model_from_mj(mj, dtype=jnp.float64)
    rng = np.random.RandomState(8)
    hits = 0
    for _ in range(40):
        p = rng.uniform(-1, 1, 3)
        p = p / np.linalg.norm(p) * rng.uniform(0.1, 0.24)
        qp = _free_qpos(rng, p, 0.0)
        mjd = mujoco.MjData(mj)
        mjd.qpos[:] = qp
        mujoco.mj_forward(mj, mjd)
        d = bstep.make_data(model).replace(qpos=jnp.array(qp))
        d = jit_forward(model)(d)
        dist = np.asarray(d.contact_dist)
        ours = dist[dist < 1e-9]
        if mjd.ncon == 0:
            assert ours.size == 0
            continue
        hits += 1
        omin = min(mjd.contact[i].dist for i in range(mjd.ncon))
        assert ours.size >= 1
        if omin < -0.02:
            assert ours.min() <= 0.2 * omin, (ours, omin)
            assert ours.min() >= omin - 2e-2
        else:
            assert abs(ours.min() - omin) < 5e-4, (ours, omin)
            assert ours.min() >= omin - 5e-4
    assert hits > 10


def test_capsule_lying_on_cylinder_settles():
    """A capsule dropped parallel onto a cylinder side needs the line
    contact resolved by >1 point or it rocks forever; compare the resting
    state against the oracle through the full solver."""
    xml = """<mujoco>
    <option timestep="0.002" solver="CG" iterations="20" ls_iterations="10"/>
    <worldbody><geom type="plane" size="1 1 .1"/>
    <geom type="cylinder" size="0.08 0.12" pos="0 0 0.08" euler="90 0 0"
          contype="1" conaffinity="1"/>
    <body pos="0.0 0.01 0.3"><freejoint/>
    <geom type="capsule" size="0.03 0.07" euler="90 0 0"/></body>
    </worldbody></mujoco>"""
    mj = mujoco.MjModel.from_xml_string(xml)
    mjd = mujoco.MjData(mj)
    for _ in range(700):
        mujoco.mj_step(mj, mjd)
    model = bspec.model_from_mj(mj, dtype=jnp.float64)
    d = bstep.make_data(model)
    step = jax.jit(lambda dd: bstep.step(model, dd))
    for _ in range(700):
        d = step(d)
    qpos = np.asarray(d.qpos)
    assert np.isfinite(qpos).all()
    # both engines either balance it on top or drop it to the floor;
    # accept the oracle's outcome within 2 cm
    assert abs(qpos[2] - mjd.qpos[2]) < 0.02, (qpos[2], mjd.qpos[2])


def _convex_compare(seed, ga, gb):
    """Full convex-pair comparison vs the oracle; raises on mismatch.

    Runs in a THROWAWAY CHILD PROCESS (see the test below): compiling the
    dual-ascent forward() graphs poisons the XLA:CPU process state — the
    next large compile in the same process (e.g. the box-settle step graph,
    or the driver smoke epoch) segfaults inside backend_compile_and_load.
    Reproduced deterministically at the same test position across cold
    caches; every graph compiles fine in a fresh process.
    """
    xml = f"""<mujoco><worldbody>
    <geom {ga} contype="1" conaffinity="1"/>
    <body pos="0.2 0 0"><freejoint/><geom {gb}/></body>
    </worldbody></mujoco>"""
    rng = np.random.RandomState(seed)
    qps = []
    for _ in range(30):
        p = rng.uniform(-1, 1, 3)
        p = p / np.linalg.norm(p) * rng.uniform(0.1, 0.22)
        qps.append(_free_qpos(rng, p, 0.0))

    mj = mujoco.MjModel.from_xml_string(xml)
    model = bspec.model_from_mj(mj, dtype=jnp.float64)
    hits = 0
    for qp in qps:
        mjd = mujoco.MjData(mj)
        mjd.qpos[:] = qp
        mujoco.mj_forward(mj, mjd)
        omin = (
            min(mjd.contact[i].dist for i in range(mjd.ncon))
            if mjd.ncon
            else None
        )
        d = bstep.make_data(model).replace(qpos=jnp.array(qp))
        d = jit_forward(model)(d)
        dist = np.asarray(d.contact_dist)
        ours = dist[dist < 1e-9]
        if omin is None:
            # the dual gap is exact; tiny disagreement only at grazing poses
            assert ours.size == 0 or ours.min() > -5e-4, ours
            continue
        hits += 1
        assert ours.size >= 1, (omin,)
        if omin < -0.02:
            assert ours.min() <= 0.2 * omin, (ours, omin)
            assert ours.min() >= omin - 2e-2
        else:
            assert abs(ours.min() - omin) < 2e-3, (ours, omin)
    assert hits >= 8


@pytest.mark.parametrize("seed,ga,gb", [
    (21, 'type="ellipsoid" size="0.08 0.06 0.05"', 'type="cylinder" size="0.06 0.08"'),
    (22, 'type="ellipsoid" size="0.08 0.06 0.05"', 'type="box" size="0.07 0.05 0.06"'),
    (23, 'type="cylinder" size="0.06 0.08"', 'type="cylinder" size="0.05 0.07"'),
    (24, 'type="cylinder" size="0.06 0.08"', 'type="box" size="0.07 0.05 0.06"'),
])
def test_convex_pairs_random_deepest(seed, ga, gb):
    """Generic convex-convex (dual ascent): the oracle's MPR emits one
    contact for these pairs too; assert deepest agreement, no deeper
    phantom, and contact/no-contact agreement over random poses.
    Executed in a disposable subprocess — see _convex_compare's docstring."""
    import subprocess
    import sys

    here = os.path.abspath(__file__)
    repo = os.path.dirname(os.path.dirname(here))
    code = (
        "import sys, importlib.util\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_enable_x64', True)\n"
        f"sys.path.insert(0, {repo!r})\n"
        f"sys.path.insert(0, {os.path.dirname(here)!r})\n"
        f"spec = importlib.util.spec_from_file_location('tce', {here!r})\n"
        "m = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(m)\n"
        f"m._convex_compare({seed}, {ga!r}, {gb!r})\n"
        "print('CONVEX_OK')\n"
    )
    child = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=repo,
    )
    assert child.returncode == 0 and "CONVEX_OK" in child.stdout, (
        child.stdout[-2000:],
        child.stderr[-4000:],
    )


def test_box_box_canonical():
    """Exact parity on face-manifold and corner configurations: the SAT
    winner, manifold span, per-point depth and positions all match
    mjc_BoxBox on flat (4 pts), rotated-flat (4), edge-tilted (2) and
    corner-down (1) stacks."""
    xml = """<mujoco><worldbody>
    <geom type="box" size="0.2 0.15 0.1" contype="1" conaffinity="1"/>
    <body pos="0 0 0.19"><freejoint/><geom type="box" size="0.08 0.06 0.05"/>
    </body></worldbody></mujoco>"""
    c30, s30 = np.cos(np.pi / 12), np.sin(np.pi / 12)
    c20, s20 = np.cos(np.pi / 18), np.sin(np.pi / 18)
    for qp in [
        np.array([0, 0, 0.14, 1, 0, 0, 0]),  # flat: 4 contacts
        np.concatenate([[0, 0, 0.14], [c30, 0, 0, s30]]),  # rotated flat: 4
        np.concatenate([[0.0, 0, 0.16], [c20, 0, s20, 0]]),  # edge-tilt: 2
    ]:
        _compare(xml, qpos=qp, d_tol=1e-9, p_tol=1e-8, n_tol=1e-9)


def test_box_box_big_on_small():
    """Reference face smaller than the incident face: the manifold comes
    from the reference corners projected into the incident face (and the
    clamped incident corners dedup away)."""
    xml = """<mujoco><worldbody>
    <geom type="box" size="0.05 0.04 0.1" contype="1" conaffinity="1"/>
    <body pos="0 0 0.19"><freejoint/><geom type="box" size="0.2 0.15 0.05"/>
    </body></worldbody></mujoco>"""
    _compare(
        xml, qpos=np.array([0, 0, 0.14, 1, 0, 0, 0]),
        d_tol=1e-9, p_tol=1e-8, n_tol=1e-9,
    )


def test_box_box_random_deepest():
    """Random poses: mjc_BoxBox's exact manifold selection is not matched
    point-for-point; assert the physically-load-bearing properties — the
    deepest contact agrees and no phantom is deeper than the oracle's."""
    xml = """<mujoco><worldbody>
    <geom type="box" size="0.1 0.12 0.08" contype="1" conaffinity="1"/>
    <body pos="0.2 0 0"><freejoint/><geom type="box" size="0.07 0.05 0.06"/>
    </body></worldbody></mujoco>"""
    mj = mujoco.MjModel.from_xml_string(xml)
    model = bspec.model_from_mj(mj, dtype=jnp.float64)
    rng = np.random.RandomState(6)
    hits = 0
    for _ in range(40):
        p = rng.uniform(-1, 1, 3)
        p = p / np.linalg.norm(p) * rng.uniform(0.12, 0.3)
        qp = _free_qpos(rng, p, 0.0)
        mjd = mujoco.MjData(mj)
        mjd.qpos[:] = qp
        mujoco.mj_forward(mj, mjd)
        d = bstep.make_data(model).replace(qpos=jnp.array(qp))
        d = jit_forward(model)(d)
        dist = np.asarray(d.contact_dist)
        ours = dist[dist < 1e-9]
        if mjd.ncon == 0:
            assert ours.size == 0
            continue
        hits += 1
        omin = min(mjd.contact[i].dist for i in range(mjd.ncon))
        assert ours.size >= 1
        if omin < -0.02:
            # deep overlap (unreachable at dt=2ms): sign + monotonicity only
            assert ours.min() <= 0.2 * omin, (ours, omin)
            assert ours.min() >= omin - 2e-2
        else:
            assert abs(ours.min() - omin) < 1e-6, (ours, omin)
            assert ours.min() >= omin - 1e-6  # no phantom deeper than oracle
    assert hits > 10


def test_box_settles_on_box():
    """Dynamics: a box dropped onto a fixed box comes to rest at the
    oracle's height through the full constraint solver."""
    xml = """<mujoco>
    <option timestep="0.002" solver="CG" iterations="20" ls_iterations="10"/>
    <worldbody><geom type="box" size="0.3 0.3 0.1" contype="1" conaffinity="1"/>
    <body pos="0.02 0.01 0.28"><freejoint/>
    <geom type="box" size="0.06 0.05 0.04" euler="15 25 40"/></body>
    </worldbody></mujoco>"""
    mj = mujoco.MjModel.from_xml_string(xml)
    mjd = mujoco.MjData(mj)
    for _ in range(700):
        mujoco.mj_step(mj, mjd)
    model = bspec.model_from_mj(mj, dtype=jnp.float64)
    d = bstep.make_data(model)
    step = jax.jit(lambda dd: bstep.step(model, dd))
    for _ in range(700):
        d = step(d)
    qpos = np.asarray(d.qpos)
    qvel = np.asarray(d.qvel)
    assert np.isfinite(qpos).all() and np.isfinite(qvel).all()
    assert 0.1 < qpos[2] < 0.25  # resting on the lower box
    oracle_speed = np.abs(mjd.qvel).max()
    assert np.abs(qvel).max() < max(0.5, 1.5 * oracle_speed)
    assert abs(qpos[2] - mjd.qpos[2]) < 0.02


@pytest.mark.parametrize("geom", [
    'type="cylinder" size="0.08 0.1"',
    'type="box" size="0.08 0.06 0.05"',
    'type="ellipsoid" size="0.09 0.07 0.05"',
])
def test_settles_on_floor(geom):
    """Dynamics sanity: new-pair shapes dropped on the floor behave like the
    oracle (full step pipeline through the constraint solver). The cylinder
    and box come to rest; the ellipsoid keeps rolling in MuJoCo too (point
    contact, no torsional friction at condim=3), so the bound is taken from
    the oracle's own final speed rather than a fixed 'at rest' threshold."""
    xml = f"""<mujoco>
    <option timestep="0.002" solver="CG" iterations="20" ls_iterations="10"/>
    <worldbody><geom type="plane" size="2 2 .1"/>
    <body pos="0.02 0 0.3"><freejoint/><geom {geom} euler="20 35 10"/>
    </body></worldbody></mujoco>"""
    mj = mujoco.MjModel.from_xml_string(xml)
    mjd = mujoco.MjData(mj)
    for _ in range(600):
        mujoco.mj_step(mj, mjd)
    model = bspec.model_from_mj(mj, dtype=jnp.float64)
    d = bstep.make_data(model)
    step = jax.jit(lambda dd: bstep.step(model, dd))
    for _ in range(600):
        d = step(d)
    qpos = np.asarray(d.qpos)
    qvel = np.asarray(d.qvel)
    assert np.isfinite(qpos).all() and np.isfinite(qvel).all()
    assert 0.0 < qpos[2] < 0.2  # resting on the floor, not sunken/launched
    oracle_speed = np.abs(mjd.qvel).max()
    assert np.abs(qvel).max() < max(0.5, 1.5 * oracle_speed)
    assert abs(qpos[2] - mjd.qpos[2]) < 0.02  # same resting height as oracle

"""Fused megakernel (in-kernel qM/J assembly) vs the array path.

cg_solve_fused rebuilds qM from (crb_f, cdof) with iota-built ancestor
masks and J from (P @ con_A, cdof, md) inside the Pallas kernel; these
tests prove the assembled operators produce the same solve results as the
array path consuming the XLA-built dense qM / efc_Jc — on real models
covering every assembly feature: one-hot scalar limit rows, pyramidal row
combination (minirat/rodent), two kinematic roots with dof-range masking
(rodent_pair), and the permuted elliptic block (fly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import brax_tracking_tpu.physics.spec as bspec
import brax_tracking_tpu.physics.step as bstep
import brax_tracking_tpu.physics.constraint as Cn
import brax_tracking_tpu.physics.solver as S
from brax_tracking_tpu.ops import cg as ops_cg

RODENT_PAIR = "/root/reference/assets/rodent_pair.xml"
FLY = "/root/reference/assets/fruitfly/fruitfly_force_fast.xml"


def _batched_forward(model, mj, B, seed, drop=0.01):
    rng = np.random.RandomState(seed)
    d0 = bstep.make_data(model)
    dB = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), d0)
    qpos = np.tile(np.asarray(mj.qpos0)[None], (B, 1))
    free = np.nonzero(np.asarray(model.jnt_type) == 0)[0]
    for j in free:  # push each free root into the floor for contacts
        qadr = int(model.jnt_qposadr[j])
        qpos[:, qadr + 2] -= drop
    nroot_q = 7 if free.size else 0
    qpos[:, nroot_q:] += rng.uniform(-0.05, 0.05, (B, mj.nq - nroot_q))
    dB = dB.replace(
        qpos=jnp.asarray(qpos),
        qvel=jnp.asarray(rng.uniform(-0.5, 0.5, (B, mj.nv))),
        ctrl=jnp.asarray(rng.uniform(-0.3, 0.3, (B, mj.nu))),
    )
    return jax.jit(jax.vmap(lambda dd: bstep.forward(model, dd)))(dB)


def _run_both(model, dF, iters=6, ls_iters=6):
    """Returns (fused kernel out, vmapped array-path out)."""
    layout = Cn.efc_layout(model)
    fstat = S._fused_statics(model, layout)
    assert fstat is not None
    nv = model.nv
    meta = S._cone_meta(model, layout)
    tol = (
        float(np.asarray(model.opt.tolerance))
        * float(np.asarray(model.opt.meaninertia))
        * max(1, nv)
    )
    dt = float(np.asarray(model.opt.timestep))
    damp = np.asarray(model.dof_damping, np.float64) * dt
    nell = int(meta.ell_con.size)
    B = dF.qpos.shape[0]
    if nell:
        ell0 = int(meta.ell_rows.min())
        ell_mu = np.asarray(model.pairs.friction, np.float64)[meta.ell_con, 0]
        fr = np.asarray(model.pairs.friction, np.float64)[meta.ell_con, 1:3]
        ell_scale = fr / ell_mu[:, None]
        quad_mask = np.zeros(layout.nefc)
        quad_mask[meta.quad_rows] = 1.0
        cp = layout.con_pair[meta.ell_con]
        inc = np.asarray(model.pairs.margin)[cp]
        e_con = jnp.asarray(
            np.asarray(dF.contact_dist)[:, meta.ell_con] < inc[None]
        )
    else:
        ell0 = layout.nefc
        ell_mu = np.zeros(0)
        ell_scale = np.zeros((0, 2))
        quad_mask = np.ones(layout.nefc)
        e_con = jnp.zeros((B, 0), bool)

    exists = jnp.asarray(np.asarray(dF.efc_pos < dF.efc_margin))
    exists_q = exists & jnp.asarray(quad_mask > 0.5)[None]

    kout = ops_cg.cg_solve_fused(
        dF.crb_f, dF.cdof, dF.con_A, dF.efc_jsign, dF.efc_D, dF.efc_aref,
        exists_q, e_con, dF.qfrc_smooth, dF.qvel,
        jnp.asarray(damp), jnp.asarray(fstat["P"]), jnp.asarray(fstat["md"]),
        model.dof_armature,
        iters=iters, ls_iters=ls_iters, tol=tol, dt=dt,
        has_damping=bool(model.has_damping),
        row_slot=fstat["row_slot"], sz=fstat["sz"],
        root_bounds=fstat["root_bounds"], limit_dadr=fstat["limit_dadr"],
        ell0=ell0, ell_mu=tuple(ell_mu.tolist()),
        ell_scale=tuple(map(tuple, ell_scale.tolist())),
        interpret=True,
    )

    L1 = np.eye(nv)[Cn.limit_dofs(model)]
    statics = dict(
        L1=L1, iters=iters, ls_iters=ls_iters, tol=tol, dt=dt, damp=damp,
        has_damping=bool(model.has_damping), quad_mask=quad_mask, ell0=ell0,
        ell_mu=ell_mu, ell_scale=ell_scale,
    )
    bout = jax.vmap(
        lambda qM, Jc, js, D, ar, ex, ec, fs, qv: S._cg_arrays(
            qM, Jc, js, D, ar, ex, ec, fs, qv, **statics
        )
    )(
        dF.qM, dF.efc_Jc, dF.efc_jsign, dF.efc_D, dF.efc_aref, exists,
        e_con, dF.qfrc_smooth, dF.qvel,
    )
    return kout, bout


def _assert_close(kout, bout, rtol=1e-9, atol=1e-11):
    names = ("qacc", "force", "qfrc_constraint", "qacc_smooth", "qvel_next")
    for nm, k, b in zip(names, kout, bout):
        np.testing.assert_allclose(
            np.asarray(k), np.asarray(b), rtol=rtol, atol=atol, err_msg=nm
        )


def test_fused_assembly_minirat():
    """Quad cone: one-hot limits + pyramidal combination, single root."""
    model, mj = bspec.build_model(
        "builtin:minirat.xml", solver="cg", iterations=6, ls_iterations=6,
        dtype=jnp.float64, return_mj=True,
    )
    dF = _batched_forward(model, mj, 4, 0)
    assert np.asarray(dF.efc_pos < dF.efc_margin).any()
    kout, bout = _run_both(model, dF)
    _assert_close(kout, bout)


def test_fused_assembly_rodent_pair():
    """Two kinematic roots: per-root dof-range masking in the J build."""
    model, mj = bspec.build_model(
        RODENT_PAIR, free_jnt=True, rescale_root="torso",
        solver="cg", iterations=6, ls_iterations=6,
        dtype=jnp.float64, return_mj=True,
    )
    layout = Cn.efc_layout(model)
    fstat = S._fused_statics(model, layout)
    assert len(fstat["root_bounds"]) == 2
    dF = _batched_forward(model, mj, 2, 1, drop=0.012)
    assert np.asarray(dF.efc_pos < dF.efc_margin).any()
    kout, bout = _run_both(model, dF)
    _assert_close(kout, bout)


def test_fused_assembly_fly_elliptic():
    """Elliptic block: permuted rows, P selection, free-root fly."""
    model, mj = bspec.build_model(
        FLY, free_jnt=True, solver="cg", iterations=6, ls_iterations=6,
        dtype=jnp.float64, return_mj=True,
    )
    import mujoco

    mjd = mujoco.MjData(mj)
    mjd.qpos[:] = mj.qpos0
    for _ in range(2000):
        mujoco.mj_step(mj, mjd)
        if mjd.ncon >= 4 and np.min(mjd.contact.dist[: mjd.ncon]) < -1e-5:
            break
    rng = np.random.RandomState(5)
    B = 2
    d0 = bstep.make_data(model)
    dB = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), d0)
    dB = dB.replace(
        qpos=jnp.asarray(np.tile(mjd.qpos[None], (B, 1))),
        qvel=jnp.asarray(rng.uniform(-0.1, 0.1, (B, mj.nv))),
        ctrl=jnp.asarray(rng.uniform(-0.2, 0.2, (B, mj.nu))),
    )
    dF = jax.jit(jax.vmap(lambda dd: bstep.forward(model, dd)))(dB)
    layout = Cn.efc_layout(model)
    meta = S._cone_meta(model, layout)
    assert meta.ell_con.size > 0
    kout, bout = _run_both(model, dF)
    _assert_close(kout, bout)


def test_solver_dispatch_fused_branch(monkeypatch):
    """End-to-end wiring of _solve_quad's batched Pallas branch: force the
    _use_pallas gate open (interpret-mode kernel) and run a full vmapped
    step — validates the staging/argument plumbing between solver.py and
    cg_solve_fused that otherwise only executes on real TPU."""
    import functools

    from brax_tracking_tpu.ops import cg as ops_cg
    from brax_tracking_tpu.ops import cholesky as ops_chol

    model, mj = bspec.build_model(
        "builtin:minirat.xml", solver="cg", iterations=6, ls_iterations=6,
        dtype=jnp.float64, return_mj=True,
    )
    B = 3
    rng = np.random.RandomState(3)
    d0 = bstep.make_data(model)
    dB = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), d0)
    qpos = np.tile(np.asarray(mj.qpos0)[None], (B, 1))
    qpos[:, 2] -= 0.01
    qpos[:, 7:] += rng.uniform(-0.05, 0.05, (B, mj.nq - 7))
    dB = dB.replace(
        qpos=jnp.asarray(qpos),
        qvel=jnp.asarray(rng.uniform(-0.5, 0.5, (B, mj.nv))),
        ctrl=jnp.asarray(rng.uniform(-0.3, 0.3, (B, mj.nu))),
    )
    step = jax.vmap(lambda dd: bstep.step(model, dd))

    ref = step(dB)  # array fallback path

    orig = ops_cg.cg_solve_fused
    monkeypatch.setattr(ops_chol, "_use_pallas", lambda x: True)
    monkeypatch.setattr(
        ops_cg, "cg_solve_fused",
        functools.partial(orig, interpret=True),
    )
    out = jax.jit(step)(dB)

    np.testing.assert_allclose(
        np.asarray(out.qacc), np.asarray(ref.qacc), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(out.qvel), np.asarray(ref.qvel), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(out.qpos), np.asarray(ref.qpos), rtol=1e-9, atol=1e-12
    )


def test_newton_dispatch_kernel_equivalence(monkeypatch):
    """Newton models on the megakernel layout: the batched TPU path runs
    the ops/cg megakernel (CG + warmstart + f32 stall-exit) on the SAME
    strictly convex primal cost as the exact-Hessian Newton primal —
    qacc must agree to solver-tolerance scale (documented performance
    dispatch, solver._solve_newton_fused)."""
    import functools

    from brax_tracking_tpu.ops import cg as ops_cg
    from brax_tracking_tpu.ops import cholesky as ops_chol

    model, mj = bspec.build_model(
        RODENT_PAIR, dtype=jnp.float32, return_mj=True
    )
    assert int(model.opt.solver) == 2  # XML defaults -> Newton/100
    assert S.quad_kernel_eligible(model)
    B = 2
    rng = np.random.RandomState(1)
    d0 = bstep.make_data(model)
    dB = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), d0)
    qpos = np.tile(np.asarray(mj.qpos0)[None], (B, 1))
    free = np.nonzero(np.asarray(model.jnt_type) == 0)[0]
    for j in free:
        qadr = int(model.jnt_qposadr[j])
        qpos[:, qadr + 2] -= 0.012
    dB = dB.replace(
        qpos=jnp.asarray(qpos, jnp.float32),
        qvel=jnp.asarray(rng.uniform(-0.3, 0.3, (B, mj.nv)), jnp.float32),
        ctrl=jnp.asarray(rng.uniform(-0.2, 0.2, (B, mj.nu)), jnp.float32),
    )
    step = jax.vmap(lambda dd: bstep.step(model, dd))
    d1 = step(dB)  # populates qacc_warmstart
    ref = step(d1)  # per-env exact-Hessian Newton (primal fallback)

    orig = ops_cg.cg_solve_fused
    orig_fs = ops_chol.factor_solve_batched
    monkeypatch.setattr(ops_chol, "_use_pallas", lambda x: True)
    monkeypatch.setattr(
        ops_cg, "cg_solve_fused", functools.partial(orig, interpret=True)
    )
    monkeypatch.setattr(
        ops_chol, "factor_solve_batched",
        functools.partial(orig_fs, interpret=True),
    )
    out = jax.jit(step)(d1)

    scale = float(jnp.abs(ref.qacc).max())
    assert float(jnp.abs(out.qacc - ref.qacc).max()) / scale < 5e-3
    vscale = max(1e-9, float(jnp.abs(ref.qvel).max()))
    assert float(jnp.abs(out.qvel - ref.qvel).max()) / vscale < 3e-2


@pytest.mark.slow
def test_newton_dispatch_trajectory_divergence(monkeypatch):
    """VERDICT r4 #6: megakernel-vs-Newton equivalence AT SCALE — the pair
    scene at its production solver config (XML defaults: Newton,
    iterations=100, ls_iterations=50) stepped N control steps in f32.

    Trajectory A: the megakernel chunked-restart path (what the TPU runs;
    interpret-mode kernel here). Trajectory B: the per-env exact-Hessian
    Newton fallback (what BTT_NEWTON_XLA=1 forces on TPU). Both solve the
    same strictly convex primal per substep, so the per-step qacc gap is
    solver-tolerance noise; over a contact-rich horizon the trajectories
    may drift (f32 + contact chaos amplify solver noise), and THIS test
    documents the bound: relative qpos divergence stays within a few
    percent of the pose scale over 20 steps."""
    import functools

    from brax_tracking_tpu.ops import cg as ops_cg
    from brax_tracking_tpu.ops import cholesky as ops_chol

    model, mj = bspec.build_model(
        RODENT_PAIR, dtype=jnp.float32, return_mj=True
    )
    assert int(model.opt.iterations) == 100  # production budget, no caps
    B, N = 4, 20
    rng = np.random.RandomState(7)
    d0 = bstep.make_data(model)
    dB = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), d0)
    qpos = np.tile(np.asarray(mj.qpos0)[None], (B, 1))
    free = np.nonzero(np.asarray(model.jnt_type) == 0)[0]
    for j in free:
        qadr = int(model.jnt_qposadr[j])
        qpos[:, qadr + 2] -= 0.012  # feet through the floor: rich contact
    qpos += rng.uniform(-0.01, 0.01, qpos.shape)
    dB = dB.replace(
        qpos=jnp.asarray(qpos, jnp.float32),
        qvel=jnp.asarray(rng.uniform(-0.3, 0.3, (B, mj.nv)), jnp.float32),
        ctrl=jnp.asarray(rng.uniform(-0.2, 0.2, (B, mj.nu)), jnp.float32),
    )

    def roll(d, n):
        step = jax.vmap(lambda dd: bstep.step(model, dd))
        # first step outside the scan: it populates the derived fields
        # (xpos/..., qacc_warmstart) that make_data leaves as None
        d = step(d)
        def body(c, _):
            c = step(c)
            return c, c.qpos
        return jax.lax.scan(body, d, (), length=n - 1)

    _, qpos_newton = jax.jit(roll, static_argnums=1)(dB, N)

    orig = ops_cg.cg_solve_fused
    orig_fs = ops_chol.factor_solve_batched
    monkeypatch.setattr(ops_chol, "_use_pallas", lambda x: True)
    monkeypatch.setattr(
        ops_cg, "cg_solve_fused", functools.partial(orig, interpret=True)
    )
    monkeypatch.setattr(
        ops_chol, "factor_solve_batched",
        functools.partial(orig_fs, interpret=True),
    )
    _, qpos_kernel = jax.jit(roll, static_argnums=1)(dB, N)

    qn = np.asarray(qpos_newton)
    qk = np.asarray(qpos_kernel)
    assert np.all(np.isfinite(qk)), "megakernel trajectory went non-finite"
    scale = max(1.0, float(np.abs(qn).max()))
    div = np.abs(qk - qn).max(axis=(1, 2)) / scale  # per-step worst env
    # measured on this seed: ~1e-5 after 1 step, growing smoothly; the
    # bound leaves ~4x headroom over the observed 20-step divergence
    assert div[0] < 5e-3, f"step-1 divergence {div[0]:.2e}"
    assert div[-1] < 8e-2, f"20-step divergence {div[-1]:.2e}"

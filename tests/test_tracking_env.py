"""Tracking-env semantics tests: frame clock, reward shapes, multi-clip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brax_tracking_tpu.data import clips as C
from brax_tracking_tpu.envs.tracking import GenericMultiClip, GenericSingleClip, TrackingEnv
from brax_tracking_tpu.physics import spec as bspec


def _make(model, clip, **kw):
    base = dict(
        center_of_mass="torso",
        end_eff_names=["leg_FL", "leg_FR", "leg_BL", "leg_BR"],
        body_names=["torso", "leg_FL", "leg_FR"],
        joint_names=["hip_FL", "hip_FR", "hip_BL", "hip_BR"],
        healthy_z_range=(0.02, 0.5),
        start_frame_range=(0, 8),
    )
    base.update(kw)
    return TrackingEnv(model=model, reference_clip=clip, **base)


@pytest.fixture(scope="module")
def minirat():
    model = bspec.build_model("builtin:minirat.xml", dtype=jnp.float32)
    T = 64
    qpos = np.tile(np.asarray(model.qpos0, np.float64), (T, 1))
    qpos[:, 2] += 0.005
    qpos[:, 0] += np.linspace(0.0, 0.05, T)
    clip = C.process_clip(model, jnp.asarray(qpos, jnp.float32))
    return model, clip


def test_frame_clock_advances(minirat):
    model, clip = minirat
    env = _make(model, clip)
    # steps_for_cur_frame = 1/(50*0.002)/10 = 1: frame advances every step
    assert env._steps_for_cur_frame == 1
    state = jax.jit(env.reset)(jax.random.PRNGKey(3))
    f0 = int(state.info["cur_frame"])
    step = jax.jit(env.step)
    a = jnp.zeros(env.action_size)
    for i in range(3):
        state = step(state, a)
        assert int(state.info["cur_frame"]) == f0 + i + 1


def test_reward_shape_sum_then_square(minirat):
    """The reference's quirk: exp(-k * (SUM diff)^2), not sum-of-squares
    (fruitfly.py:190,201-210). Opposite-sign errors must cancel."""
    model, clip = minirat
    env = _make(model, clip, joint_reward_weight=1.0)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    state = jax.jit(env.step)(state, jnp.zeros(env.action_size))
    cur = int(state.info["cur_frame"])
    # compute what the env should have computed: sum THEN square
    qpos_j = np.asarray(state.pipeline_state.qpos)[7:]
    ref_j = np.asarray(clip.joints[cur])
    expected = np.exp(-0.5 * (np.sum(qpos_j - ref_j)) ** 2)
    np.testing.assert_allclose(
        float(state.metrics["joint_reward"]), expected, rtol=1e-4
    )


def test_termination_too_far(minirat):
    model, clip = minirat
    env = _make(model, clip, too_far_dist=1e-12)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    state = jax.jit(env.step)(state, jnp.zeros(env.action_size))
    assert float(state.metrics["too_far"]) == 1.0
    assert float(state.done) == 1.0


def test_multiclip_selects_and_tracks(minirat):
    model, _ = minirat
    T = 64
    clips = []
    for k in range(3):
        qpos = np.tile(np.asarray(model.qpos0, np.float64), (T, 1))
        qpos[:, 2] += 0.005
        qpos[:, 0] += np.linspace(0.0, 0.02 * (k + 1), T)
        clips.append(C.process_clip(model, jnp.asarray(qpos, jnp.float32)))
    stacked = C.stack_clips(clips)
    env = GenericMultiClip(
        reference_clip=stacked,
        mjcf_path="builtin:minirat.xml",
        center_of_mass="torso",
        end_eff_names=["leg_FL", "leg_FR", "leg_BL", "leg_BR"],
        body_names=["torso", "leg_FL", "leg_FR"],
        joint_names=["hip_FL", "hip_FR", "hip_BL", "hip_BR"],
        healthy_z_range=(0.02, 0.5),
        start_frame_range=(0, 8),
    )
    # different seeds hit different clips; clip_idx rides in info
    seen = set()
    reset = jax.jit(env.reset)
    step = jax.jit(env.step)
    for seed in range(8):
        state = reset(jax.random.PRNGKey(seed))
        seen.add(int(state.info["clip_idx"]))
        s2 = step(state, jnp.zeros(env.action_size))
        assert int(s2.info["clip_idx"]) == int(state.info["clip_idx"])
        assert np.isfinite(float(s2.reward))
    assert len(seen) >= 2, f"clip selection degenerate: {seen}"
    # batched via vmap (the trainer's layout): per-env clip indices
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    bstate = jax.jit(jax.vmap(env.reset))(keys)
    idxs = np.asarray(bstate.info["clip_idx"])
    assert idxs.shape == (6,)
    bstate2 = jax.jit(jax.vmap(env.step))(bstate, jnp.zeros((6, env.action_size)))
    np.testing.assert_array_equal(np.asarray(bstate2.info["clip_idx"]), idxs)


def test_obs_window_matches_dynamic_slice(minirat):
    """The obs reference window is a clamped index gather (TPU-friendly);
    it must keep jax.lax.dynamic_slice's start-clamping semantics at the
    clip tail."""
    model, clip = minirat
    env = _make(model, clip)
    T = clip.joints.shape[0]
    for cur in (0, 3, T - 2, T + 5):  # incl. beyond-end clamping
        cur_frame = jnp.asarray(cur, jnp.int32)
        obs = env._get_obs(_reset_data(env), cur_frame)
        ref = clip.joints
        want = jax.lax.dynamic_slice_in_dim(
            ref, jnp.clip(cur_frame + 1, 0, T - env._ref_len), env._ref_len
        )
        start = jnp.clip(cur_frame + 1, 0, T - env._ref_len)
        got = ref[start + jnp.arange(env._ref_len)]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert np.isfinite(np.asarray(obs)).all()


def _reset_data(env):
    return jax.jit(env.reset)(jax.random.PRNGKey(0)).pipeline_state


def test_multiclip_reset_to_clip(minirat):
    """reset_to_clip pins the requested clip (the driver's per-clip eval
    entry point, harness/driver._compile_clip_eval)."""
    model, _ = minirat
    T = 64
    clips = []
    for k in range(3):
        qpos = np.tile(np.asarray(model.qpos0, np.float64), (T, 1))
        qpos[:, 2] += 0.005
        qpos[:, 0] += np.linspace(0.0, 0.02 * (k + 1), T)
        clips.append(C.process_clip(model, jnp.asarray(qpos, jnp.float32)))
    env = GenericMultiClip(
        reference_clip=C.stack_clips(clips),
        mjcf_path="builtin:minirat.xml",
        center_of_mass="torso",
        end_eff_names=["leg_FL", "leg_FR", "leg_BL", "leg_BR"],
        body_names=["torso", "leg_FL", "leg_FR"],
        joint_names=["hip_FL", "hip_FR", "hip_BL", "hip_BR"],
        healthy_z_range=(0.02, 0.5),
        start_frame_range=(0, 8),
    )
    reset_to = jax.jit(env.reset_to_clip)
    for j in range(3):
        s = reset_to(j, jax.random.PRNGKey(7))
        assert int(s.info["clip_idx"]) == j
        assert np.isfinite(float(s.reward))
    # batched, mixed clip indices (the driver runs 32 envs pinned per clip)
    idx = jnp.asarray([0, 2, 1, 2])
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    bs = jax.jit(jax.vmap(env.reset_to_clip))(idx, keys)
    np.testing.assert_array_equal(np.asarray(bs.info["clip_idx"]), np.asarray(idx))
    bs2 = jax.jit(jax.vmap(env.step))(bs, jnp.zeros((4, env.action_size)))
    np.testing.assert_array_equal(np.asarray(bs2.info["clip_idx"]), np.asarray(idx))

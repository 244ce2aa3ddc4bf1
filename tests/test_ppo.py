"""PPO stack tests: distribution, GAE, running stats, end-to-end learning.

The end-to-end test trains on a toy point-mass env over the 8-device
virtual CPU mesh (conftest) — this exercises the exact shard_map epoch the
TPU path uses, including gradient pmean and normalizer psum collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brax_tracking_tpu.agents.ppo import losses as ppo_losses
from brax_tracking_tpu.agents.ppo import networks as ppo_networks
from brax_tracking_tpu.agents.ppo import train as ppo_train
from brax_tracking_tpu.distributed import mesh as dmesh
from brax_tracking_tpu.envs.base import Env, State
from brax_tracking_tpu.training import running_statistics
from brax_tracking_tpu.training.distribution import NormalTanhDistribution


# --- distribution ---------------------------------------------------------


def test_normal_tanh_log_prob_matches_manual():
    dist = NormalTanhDistribution(event_size=3)
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (5, 6))
    raw = dist.sample_no_postprocessing(logits, jax.random.PRNGKey(1))
    lp = dist.log_prob(logits, raw)

    loc, raw_scale = np.split(np.asarray(logits), 2, axis=-1)
    scale = np.logaddexp(raw_scale, 0.0) + 1e-3
    x = np.asarray(raw)
    normal_lp = (
        -0.5 * ((x - loc) / scale) ** 2 - 0.5 * np.log(2 * np.pi) - np.log(scale)
    )
    log_det = np.log1p(-np.tanh(x) ** 2)
    expected = (normal_lp - log_det).sum(-1)
    np.testing.assert_allclose(np.asarray(lp), expected, rtol=1e-6)


def test_normal_tanh_mode_and_bounds():
    dist = NormalTanhDistribution(event_size=2)
    logits = jnp.array([[0.3, -0.2, 1.0, 1.0]])
    mode = dist.mode(logits)
    np.testing.assert_allclose(np.asarray(mode[0]), np.tanh([0.3, -0.2]), rtol=1e-6)
    s = dist.sample(logits, jax.random.PRNGKey(0))
    assert np.all(np.abs(np.asarray(s)) < 1.0)


# --- GAE -------------------------------------------------------------------


def _gae_numpy(truncation, termination, rewards, values, bootstrap, lam, disc):
    T = rewards.shape[0]
    mask = 1 - truncation
    values_tp1 = np.concatenate([values[1:], bootstrap[None]], 0)
    deltas = (rewards + disc * (1 - termination) * values_tp1 - values) * mask
    acc = np.zeros_like(bootstrap)
    out = np.zeros_like(deltas)
    for t in reversed(range(T)):
        acc = deltas[t] + disc * (1 - termination[t]) * mask[t] * lam * acc
        out[t] = acc
    vs = out + values
    vs_tp1 = np.concatenate([vs[1:], bootstrap[None]], 0)
    adv = (rewards + disc * (1 - termination) * vs_tp1 - values) * mask
    return vs, adv


def test_gae_matches_numpy():
    rng = np.random.RandomState(0)
    T, B = 7, 4
    truncation = (rng.rand(T, B) < 0.15).astype(np.float64)
    termination = (rng.rand(T, B) < 0.15).astype(np.float64) * (1 - truncation)
    rewards = rng.randn(T, B)
    values = rng.randn(T, B)
    bootstrap = rng.randn(B)
    vs, adv = ppo_losses.compute_gae(
        jnp.array(truncation),
        jnp.array(termination),
        jnp.array(rewards),
        jnp.array(values),
        jnp.array(bootstrap),
        lambda_=0.95,
        discount=0.9,
    )
    evs, eadv = _gae_numpy(
        truncation, termination, rewards, values, bootstrap, 0.95, 0.9
    )
    np.testing.assert_allclose(np.asarray(vs), evs, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(adv), eadv, rtol=1e-10)


# --- running statistics ----------------------------------------------------


def test_running_statistics_matches_numpy():
    rng = np.random.RandomState(1)
    state = running_statistics.init_state(jnp.zeros((3,)))
    all_batches = []
    for _ in range(4):
        b = rng.randn(16, 3)
        all_batches.append(b)
        state = running_statistics.update(state, jnp.array(b))
    data = np.concatenate(all_batches, 0)
    np.testing.assert_allclose(np.asarray(state.mean), data.mean(0), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(state.std), data.std(0), rtol=1e-6)
    normed = running_statistics.normalize(jnp.array(data), state)
    np.testing.assert_allclose(np.asarray(normed).mean(0), 0.0, atol=1e-9)


def test_running_statistics_sharded_equals_unsharded():
    """psum path over 8 shards == single-device path over the full batch."""
    from jax.sharding import PartitionSpec as P

    rng = np.random.RandomState(2)
    data = rng.randn(64, 5)
    state = running_statistics.init_state(jnp.zeros((5,)))
    ref = running_statistics.update(state, jnp.array(data))

    mesh = dmesh.make_train_mesh()

    def f(s, b):
        return running_statistics.update(s, b, pmean_axis_name=mesh.axis_name)

    sharded = jax.jit(
        dmesh.shard_map_compat(
            f,
            mesh=mesh.mesh,
            in_specs=(P(), P(mesh.axis_name)),
            out_specs=P(),
        )
    )(state, jnp.array(data))
    np.testing.assert_allclose(np.asarray(sharded.mean), np.asarray(ref.mean), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(sharded.std), np.asarray(ref.std), rtol=1e-9)
    np.testing.assert_allclose(float(sharded.count), float(ref.count))


# --- toy env + end-to-end learning ----------------------------------------


class PointMass(Env):
    """2-D point mass steering to the origin. Purely jnp; no physics."""

    def reset(self, rng: jax.Array) -> State:
        pos = jax.random.uniform(rng, (2,), minval=-1.0, maxval=1.0)
        obs = pos
        reward = -jnp.linalg.norm(pos)
        return State(
            pipeline_state=pos,
            obs=obs,
            reward=reward,
            done=jnp.zeros(()),
            metrics={"distance": jnp.linalg.norm(pos)},
            info={},
        )

    def step(self, state: State, action: jax.Array) -> State:
        pos = state.pipeline_state + 0.1 * jnp.clip(action, -1.0, 1.0)
        reward = -jnp.linalg.norm(pos)
        return state.replace(
            pipeline_state=pos,
            obs=pos,
            reward=reward,
            done=jnp.zeros(()),
            metrics={**state.metrics, "distance": jnp.linalg.norm(pos)},
        )

    @property
    def observation_size(self):
        return 2

    @property
    def action_size(self):
        return 2

    @property
    def unwrapped(self):
        return self


@pytest.mark.slow
def test_ppo_learns_point_mass():
    env = PointMass()
    make_policy, params, metrics = ppo_train.train(
        environment=env,
        num_timesteps=2 ** 15,
        episode_length=32,
        num_envs=64,
        learning_rate=3e-4,
        entropy_cost=1e-3,
        discounting=0.95,
        unroll_length=8,
        batch_size=64,
        num_minibatches=4,
        num_updates_per_batch=4,
        num_evals=3,
        num_eval_envs=64,
        normalize_observations=True,
        seed=0,
    )
    # A random policy scores ~ -32 * 0.6; a decent one drives to ~ -5 or better.
    assert metrics["eval/episode_reward"] > -12.0, metrics


@pytest.mark.slow
def test_ppo_trains_multiclip_sharded():
    """BASELINE config 5 shape: multi-clip tracking env, envs sharded over
    the 8-device virtual mesh feeding the sharded learner."""
    import numpy as np

    from brax_tracking_tpu.data import clips as C
    from brax_tracking_tpu.envs.tracking import GenericMultiClip
    from brax_tracking_tpu.physics import spec as bspec

    model = bspec.build_model("builtin:minirat.xml", dtype=jnp.float32)
    T = 32
    base = np.tile(np.asarray(model.qpos0, np.float64), (T, 1))
    clips = []
    for k in range(3):
        q = base.copy()
        q[:, 0] += np.linspace(0.0, 0.02 * (k + 1), T)
        clips.append(C.process_clip(model, jnp.asarray(q, jnp.float32)))
    stacked = C.stack_clips(clips)
    env = GenericMultiClip(
        reference_clip=stacked,
        mjcf_path="builtin:minirat.xml",
        center_of_mass="torso",
        end_eff_names=["foot_L", "foot_R"],
        body_names=["torso"],
        joint_names=["hip_L"],
        strict_name_lookup=False,
        start_frame_range=(0, 8),
    )
    make_policy, params, metrics = ppo_train.train(
        environment=env,
        num_timesteps=256,
        episode_length=8,
        num_envs=16,
        learning_rate=3e-4,
        unroll_length=4,
        batch_size=16,
        num_minibatches=2,
        num_updates_per_batch=1,
        num_evals=1,
        num_eval_envs=16,
        normalize_observations=True,
        seed=0,
    )
    assert np.isfinite(float(metrics["eval/episode_reward"]))

"""Real-format stac mocap ingestion, validated per frame against the C oracle.

The reference trains on stac-fitted mocap stored as ``.h5``/``.p`` dicts
with a ``qpos`` array (preprocessing/preprocess.py:66-74). No real mocap
ships in this image, so the fixture here is the next-closest thing: a
DYNAMIC trajectory produced by rolling the MuJoCo C oracle under
time-varying actuation (contacts, joint coupling, non-smooth velocities —
everything synthetic home-pose clips hide), written through data/h5io.py in
the reference's exact h5 layout, then ingested through the production
``process_clip_to_train`` path.

Checks:
- per-frame body_positions/body_quaternions == C-oracle FK on the same qpos
- finite-difference velocities == independent numpy reference, incl. the
  quaternion-diff -> axis-angle angular rate and the ±max_qvel joint clip
- end-to-end: PPO on the ingested clip improves its tracking reward.
"""

import os

import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import brax_tracking_tpu.physics.spec as bspec
from brax_tracking_tpu.data import clips as C
from brax_tracking_tpu.data import h5io


@pytest.fixture(scope="module")
def stac_fixture(tmp_path_factory):
    """Roll the C oracle with sinusoidal actuation; save qpos as stac .h5."""
    model, mj_model = bspec.build_model(
        "builtin:minirat.xml", dtype=jnp.float64, return_mj=True
    )
    mjd = mujoco.MjData(mj_model)
    mujoco.mj_resetData(mj_model, mjd)
    mjd.qpos[2] += 0.01
    rng = np.random.RandomState(3)
    phase = rng.uniform(0, 2 * np.pi, mj_model.nu)
    freq = rng.uniform(2.0, 6.0, mj_model.nu)
    # mocap at 50 Hz; physics dt is model timestep
    mocap_dt = 0.02
    substeps = max(int(round(mocap_dt / mj_model.opt.timestep)), 1)
    T = 40
    qpos = np.zeros((T, mj_model.nq))
    t = 0.0
    for i in range(T):
        qpos[i] = mjd.qpos
        for _ in range(substeps):
            mjd.ctrl[:] = 0.4 * np.sin(freq * t + phase)
            mujoco.mj_step(mj_model, mjd)
            t += mj_model.opt.timestep
    assert np.isfinite(qpos).all()
    # the trajectory must actually move (a static fixture would validate
    # nothing about velocity extraction)
    assert np.abs(np.diff(qpos, axis=0)).max() > 1e-3

    path = str(tmp_path_factory.mktemp("stac") / "transform_snips.h5")
    h5io.save(path, {"qpos": qpos, "n_frames": int(qpos.shape[0])})
    return model, mj_model, qpos, path


def test_h5_layout_roundtrip(stac_fixture):
    """The fixture file reads back through the recursive dict loader the
    same way the reference's ioh5.load does (preprocess.py:68-70)."""
    _, _, qpos, path = stac_fixture
    data = h5io.load(path)
    np.testing.assert_array_equal(np.asarray(data["qpos"]), qpos)


def test_ingested_features_match_oracle_fk(stac_fixture):
    """body_positions/quaternions from the ingestion path == C-oracle FK."""
    model, mj_model, qpos, path = stac_fixture
    clip = C.process_clip_to_train(path, model, start_step=4, clip_length=24)
    mjd = mujoco.MjData(mj_model)
    for i in range(24):
        mjd.qpos[:] = qpos[4 + i]
        mjd.qvel[:] = 0
        mujoco.mj_kinematics(mj_model, mjd)
        np.testing.assert_allclose(
            np.asarray(clip.body_positions[i]), mjd.xpos, atol=1e-5,
            err_msg=f"frame {i} xpos",
        )
        ours_q = np.asarray(clip.body_quaternions[i])
        # q and -q are the same rotation
        sign = np.where(
            np.sum(ours_q * mjd.xquat, axis=-1, keepdims=True) < 0, -1.0, 1.0
        )
        np.testing.assert_allclose(
            ours_q * sign, mjd.xquat, atol=1e-5, err_msg=f"frame {i} xquat"
        )


def test_ingested_velocities_match_finite_difference(stac_fixture):
    """velocity/angular_velocity/joints_velocity vs an independent numpy
    implementation of preprocess.py:207-230 (incl. the ±20 joint clip)."""
    model, mj_model, qpos, path = stac_fixture
    start, length, dt, max_qvel = 2, 30, 0.02, 5.0
    clip = C.process_clip_to_train(
        path, model, start_step=start, clip_length=length, dt=dt,
        max_qvel=max_qvel,
    )
    q = qpos[start : start + length]
    q = np.concatenate([q, q[-1:]], axis=0)  # pad last frame
    # linear
    np.testing.assert_allclose(
        np.asarray(clip.velocity), (q[1:, :3] - q[:-1, :3]) / dt, atol=1e-4
    )
    # angular: quat_diff -> axis-angle / dt, computed via mujoco's own
    # quaternion routines (fully independent of brax_tracking_tpu.math)
    for i in range(length):
        neg = np.zeros(3)
        dq = np.zeros(4)
        mujoco.mju_negQuat(dq, q[i, 3:7])
        out = np.zeros(4)
        mujoco.mju_mulQuat(out, dq, q[i + 1, 3:7])
        out /= np.linalg.norm(out)
        axis_angle = np.zeros(3)
        mujoco.mju_quat2Vel(axis_angle, out, 1.0)
        np.testing.assert_allclose(
            np.asarray(clip.angular_velocity[i]), axis_angle / dt, atol=1e-4,
            err_msg=f"frame {i} angular velocity",
        )
        del neg
    # joints, clipped
    jv = (q[1:, 7:] - q[:-1, 7:]) / dt
    assert np.abs(jv).max() > max_qvel, "fixture too tame to exercise the clip"
    np.testing.assert_allclose(
        np.asarray(clip.joints_velocity),
        np.clip(jv, -max_qvel, max_qvel),
        atol=1e-4,
    )


def test_training_on_stac_clip_improves_tracking(stac_fixture):
    """PPO on the ingested (dynamic, oracle-rolled) clip: tracking reward
    rises — the end-to-end proof the h5 -> clip -> env -> train path works
    on realistically rough data, not just home-pose synthetics."""
    from brax_tracking_tpu.agents.ppo import networks as ppo_networks
    from brax_tracking_tpu.agents.ppo import train as ppo_train
    from brax_tracking_tpu.envs.tracking import TrackingEnv
    import functools

    path = stac_fixture[3]
    model32 = bspec.build_model("builtin:minirat.xml", dtype=jnp.float32)
    clip = C.process_clip_to_train(path, model32, start_step=0, clip_length=32)
    clip = jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x, jnp.float32),
        clip,
        is_leaf=lambda x: x is None,
    )
    env = TrackingEnv(
        model=model32,
        reference_clip=clip,
        center_of_mass="torso",
        end_eff_names=["leg_FL", "leg_FR", "leg_BL", "leg_BR"],
        body_names=["torso", "leg_FL", "leg_FR"],
        joint_names=["hip_FL", "hip_FR", "hip_BL", "hip_BR"],
        healthy_z_range=(0.005, 0.5),
        start_frame_range=(0, 4),
    )
    rewards = []
    _, _, metrics = ppo_train.train(
        environment=env,
        num_timesteps=2048,
        episode_length=24,
        num_envs=8,
        num_eval_envs=8,
        learning_rate=1e-3,
        entropy_cost=1e-3,
        discounting=0.97,
        seed=1,
        unroll_length=8,
        batch_size=8,
        num_minibatches=2,
        num_updates_per_batch=2,
        num_evals=3,
        normalize_observations=True,
        network_factory=functools.partial(
            ppo_networks.make_ppo_networks,
            policy_hidden_layer_sizes=(32, 32),
            value_hidden_layer_sizes=(32, 32),
        ),
        progress_fn=lambda step, m: rewards.append(
            float(m["eval/episode_reward"])
        ),
    )
    assert len(rewards) >= 2
    assert np.isfinite(rewards).all()
    assert rewards[-1] > rewards[0], rewards


# ---------------------------------------------------------------------------
# Real-data robustness (VERDICT r3 item 7): the failure modes lab exports
# actually have — wrapped/multi-snip layouts, missing keys, wrong widths,
# out-of-range clips, NaN frames. Schema: brax_tracking_tpu/data/STAC_SCHEMA.md.
# ---------------------------------------------------------------------------


def test_wrapped_qpos_layout(stac_fixture, tmp_path):
    """A qpos nested one group deep loads identically to the flat layout."""
    model, _, qpos, _ = stac_fixture
    path = str(tmp_path / "wrapped.h5")
    h5io.save(path, {"stac": {"qpos": qpos, "names": {"n": 3}}})
    np.testing.assert_array_equal(C.load_stac_qpos(path), qpos)


def test_multi_snip_concatenation(stac_fixture, tmp_path):
    """Sibling snip groups concatenate along time in sorted-key order."""
    _, _, qpos, _ = stac_fixture
    path = str(tmp_path / "snips.h5")
    h5io.save(
        path,
        {
            "snip_001": {"qpos": qpos[10:25]},
            "snip_000": {"qpos": qpos[:10]},
            "snip_002": {"qpos": qpos[25:]},
        },
    )
    np.testing.assert_array_equal(C.load_stac_qpos(path), qpos)


def test_missing_qpos_raises_with_keys(stac_fixture, tmp_path):
    path = str(tmp_path / "noqpos.h5")
    h5io.save(path, {"positions": np.zeros((4, 3)), "meta": {"fps": 50}})
    with pytest.raises(KeyError, match="no 'qpos'.*positions"):
        C.load_stac_qpos(path)


def test_wrong_rank_raises(tmp_path):
    path = str(tmp_path / "rank3.h5")
    h5io.save(path, {"qpos": np.zeros((4, 3, 2))})
    with pytest.raises(ValueError, match="shape"):
        C.load_stac_qpos(path)


def test_integer_qpos_raises(tmp_path):
    path = str(tmp_path / "ints.h5")
    h5io.save(path, {"qpos": np.zeros((4, 9), np.int32)})
    with pytest.raises(ValueError, match="float"):
        C.load_stac_qpos(path)


def test_snip_width_mismatch_raises(stac_fixture, tmp_path):
    _, _, qpos, _ = stac_fixture
    path = str(tmp_path / "mixed.h5")
    h5io.save(
        path, {"a": {"qpos": qpos[:5]}, "b": {"qpos": qpos[:5, :-1]}}
    )
    with pytest.raises(ValueError, match="widths disagree"):
        C.load_stac_qpos(path)


def test_nq_mismatch_raises(stac_fixture, tmp_path):
    """Free-root model + wrong-width export = wrong model pairing."""
    model, _, qpos, _ = stac_fixture
    path = str(tmp_path / "short.h5")
    h5io.save(path, {"qpos": qpos[:, :-2]})
    with pytest.raises(ValueError, match="nq"):
        C.process_clip_to_train(path, model, start_step=0, clip_length=8)


def test_clip_out_of_range_raises(stac_fixture):
    """The reference silently yields a short clip; we fail loudly."""
    model, _, qpos, path = stac_fixture
    with pytest.raises(ValueError, match="out of range"):
        C.process_clip_to_train(
            path, model, start_step=qpos.shape[0] - 4, clip_length=16
        )


def test_nan_frames_raise_by_default(stac_fixture, tmp_path):
    model, _, qpos, _ = stac_fixture
    bad = qpos.copy()
    bad[7, 2:5] = np.nan
    path = str(tmp_path / "nan.h5")
    h5io.save(path, {"qpos": bad})
    with pytest.raises(ValueError, match="non-finite.*interpolate"):
        C.process_clip_to_train(path, model, start_step=0, clip_length=16)


def test_nan_interpolation_repairs_interior_frames(stac_fixture, tmp_path):
    """nan_policy='interpolate': interior dropped-marker frames are filled
    per-column; the repaired clip matches one built from the clean data to
    within the interpolation error of a smooth trajectory."""
    model, _, qpos, _ = stac_fixture
    bad = qpos.copy()
    bad[7, :] = np.nan  # a fully dropped frame
    bad[12, 3:7] = np.nan  # dropped root quaternion only
    path = str(tmp_path / "nan2.h5")
    h5io.save(path, {"qpos": bad})
    clip = C.process_clip_to_train(
        path, model, start_step=0, clip_length=24, nan_policy="interpolate"
    )
    assert np.isfinite(np.asarray(clip.body_positions)).all()
    assert np.isfinite(np.asarray(clip.velocity)).all()
    # repaired quaternions are unit-norm
    qn = np.linalg.norm(np.asarray(clip.quaternion), axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-5)
    clean = C.process_clip(model, jnp.asarray(qpos[:24]))
    np.testing.assert_allclose(
        np.asarray(clip.body_positions),
        np.asarray(clean.body_positions),
        atol=0.02,
    )


def test_nan_flood_refuses_interpolation(stac_fixture, tmp_path):
    model, _, qpos, _ = stac_fixture
    bad = qpos.copy()
    bad[::2, :] = np.nan  # 50% bad frames: corrupt export
    path = str(tmp_path / "flood.h5")
    h5io.save(path, {"qpos": bad})
    with pytest.raises(ValueError, match="refusing"):
        C.process_clip_to_train(
            path, model, start_step=0, clip_length=16,
            nan_policy="interpolate",
        )

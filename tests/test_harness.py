"""Harness tests: config composition engine + end-to-end smoke driver."""

import os

import pytest

from brax_tracking_tpu.harness import config as hc


def test_compose_defaults():
    cfg = hc.load_config([])
    assert cfg["dataset"]["name"] == "Rodent"
    assert cfg["train"]["env_name"] == "rodent_single_clip"
    assert cfg["dataset_name"] == "Rodent"
    # interpolation into paths
    assert "Rodent" in cfg["paths"]["base_dir"]
    assert cfg["paths"]["log_dir"].endswith("/logs")


def test_group_swap_and_overrides():
    cfg = hc.load_config(
        ["train=smoke", "dataset=minirat", "train.num_envs=4", "seed=7"]
    )
    assert cfg["train"]["version"] == "smoke"
    assert cfg["train"]["num_envs"] == 4
    assert cfg["seed"] == 7
    assert cfg["dataset"]["env_args"]["mjcf_path"] == "builtin:minirat.xml"


def test_resolve_default_resolver():
    cfg = hc.load_config([])
    # version empty at root -> train.version falls back to "debug"
    assert cfg["train"]["version"] == "debug"
    cfg = hc.load_config(["version=v3"])
    assert cfg["train"]["version"] == "v3"


def test_fly_config_keeps_reference_typos():
    cfg = hc.load_config(["dataset=fly", "train=train_fly"])
    joints = cfg["dataset"]["env_args"]["joint_names"]
    assert "oxa_twist_T1_right" in joints  # reference typo preserved
    assert cfg["dataset"]["env_args"]["strict_name_lookup"] is False
    assert cfg["train"]["num_envs"] == 1024


def test_unknown_group_choice_raises():
    with pytest.raises(hc.ConfigError):
        hc.load_config(["dataset=nonexistent"])


@pytest.mark.slow
def test_driver_smoke(tmp_path, monkeypatch):
    """Full driver path: config -> synthetic clip -> env -> PPO -> artifacts."""
    monkeypatch.chdir(tmp_path)
    from brax_tracking_tpu.harness import driver

    metrics = driver.main(["train=smoke", "dataset=minirat", "paths=local"])
    assert "eval/episode_reward" in metrics
    # artifacts: resolved config, metrics jsonl, checkpoints, final params
    base = tmp_path / "runs" / "Minirat" / "smoke"
    assert (base / "run_config.yaml").exists()
    assert (base / "logs" / "metrics.jsonl").exists()
    ckpts = list((base / "ckpt").iterdir())
    assert ckpts, "no checkpoints written"

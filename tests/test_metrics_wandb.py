"""Execute MetricsLogger's wandb branch against a fake wandb module.

The image has no wandb, so the branch (capability parity with
/root/reference/main.py:119-127) had never run. A fake module injected
into sys.modules covers init/log/finish routing and the JSONL mirror.
"""

import json
import sys
import types

from brax_tracking_tpu.harness.metrics import MetricsLogger


class _FakeWandb(types.ModuleType):
    def __init__(self):
        super().__init__("wandb")
        self.calls = []

    def init(self, **kw):
        self.calls.append(("init", kw))

    def log(self, metrics, step=None):
        self.calls.append(("log", dict(metrics), step))

    def finish(self):
        self.calls.append(("finish",))


def test_wandb_branch_routes_init_log_finish(tmp_path, monkeypatch):
    fake = _FakeWandb()
    monkeypatch.setitem(sys.modules, "wandb", fake)

    logger = MetricsLogger(
        project="proj",
        run_name="run0",
        log_dir=str(tmp_path),
        config={"lr": 3e-4},
    )
    logger.log({"training/sps": 1.0, "eval/episode_reward": 2.5}, step=100)
    logger.finish()

    kinds = [c[0] for c in fake.calls]
    assert kinds == ["init", "log", "finish"]
    _, init_kw = fake.calls[0]
    assert init_kw["project"] == "proj"
    assert init_kw["name"] == "run0"
    assert init_kw["config"] == {"lr": 3e-4}
    _, logged, step = fake.calls[1]
    assert step == 100
    assert logged["eval/episode_reward"] == 2.5

    # JSONL mirror still written alongside wandb
    lines = [json.loads(l) for l in open(logger.path)]
    assert lines[0]["_config"] == {"lr": 3e-4}
    assert lines[1]["_step"] == 100


def test_wandb_init_failure_falls_back_to_jsonl(tmp_path, monkeypatch):
    fake = _FakeWandb()

    def boom(**kw):
        raise RuntimeError("no network")

    fake.init = boom
    monkeypatch.setitem(sys.modules, "wandb", fake)

    logger = MetricsLogger("proj", "run1", str(tmp_path))
    logger.log({"a": 1}, step=1)
    logger.finish()
    lines = [json.loads(l) for l in open(logger.path)]
    assert lines[0]["a"] == 1


def test_use_wandb_false_never_imports(tmp_path, monkeypatch):
    class Exploder(types.ModuleType):
        def __getattr__(self, name):
            raise AssertionError("wandb touched despite use_wandb=False")

    monkeypatch.setitem(sys.modules, "wandb", Exploder("wandb"))
    logger = MetricsLogger("proj", "run2", str(tmp_path), use_wandb=False)
    logger.log({"a": 2})
    logger.finish()

"""2-process jax.distributed CPU training test.

The reference only ever exercised its multi-process path on live SLURM
nodes (custom_ppo.py:155-170); SURVEY §4 calls out the missing automated
rig. Here: two real OS processes, 4 virtual CPU devices each, gloo
collectives, one global 8-device env mesh, running the identical tiny
train() — asserting

- both processes return bit-identical final (normalizer, policy) params
  (replicated training state; grad pmean spans both processes),
- the 2-process result matches the 1-process 8-device control run
  (same global program, different process topology),
- eval ran on process 0 only (custom_ppo.py:453,482 parity),
- per-process folded env keys decorrelate (custom_ppo.py:192 parity).
"""

import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def mp_results(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mp")
    port = _free_port()
    outs = [str(tmp / f"proc{i}.p") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_TESTS_DIR, "_mp_worker.py"),
             str(i), str(port), outs[i]],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            # a clean environment: the parent pytest's XLA_FLAGS/platform
            # setup must not leak into the workers
            env={k: v for k, v in os.environ.items() if k != "XLA_FLAGS"},
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-3000:]}"
    return [pickle.load(open(o, "rb")) for o in outs]


def test_two_process_params_replicated(mp_results):
    r0, r1 = mp_results
    jt = __import__("jax").tree_util
    l0 = jt.tree_leaves(r0["policy"])
    l1 = jt.tree_leaves(r1["policy"])
    assert len(l0) == len(l1) and len(l0) > 0
    for a, b in zip(l0, l1):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jt.tree_leaves(r0["normalizer"]), jt.tree_leaves(r1["normalizer"])):
        np.testing.assert_array_equal(a, b)


def test_two_process_matches_single_process(mp_results, tmp_path):
    """Grad-pmean over 2 processes x 4 devices == over 1 process x 8
    devices: the same global SPMD program, so the trained params must agree
    (tiny tolerance for cross-process reduction-order differences)."""
    r0 = mp_results[0]
    ctrl = str(tmp_path / "mp_ctrl.p")
    script = (
        "import os,sys,pickle;"
        "os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8';"
        f"sys.path.insert(0, {_TESTS_DIR!r});"
        f"sys.path.insert(0, {os.path.dirname(_TESTS_DIR)!r});"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from test_ppo import PointMass;"
        "from run_tiny_train import run_tiny_train;"
        f"pickle.dump(run_tiny_train(PointMass()), open({ctrl!r},'wb'))"
    )
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    res = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, timeout=600, env=env
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    ctrl_r = pickle.load(open(ctrl, "rb"))
    os.remove(ctrl)
    jt = __import__("jax").tree_util
    for a, b in zip(jt.tree_leaves(r0["policy"]), jt.tree_leaves(ctrl_r["policy"])):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_eval_on_process_zero_only(mp_results):
    r0, r1 = mp_results
    assert r0["n_evals_ran"] >= 2  # initial + final eval
    assert r1["n_evals_ran"] == 0
    assert "eval/episode_reward" in r0["metrics"]


def test_process_keys_decorrelate(mp_results):
    r0, r1 = mp_results
    assert not np.array_equal(r0["folded_key"], r1["folded_key"])

"""Cluster launcher dry-run coverage (scripts/launch.py).

Parity target: the reference's slurm-run.py (sbatch generation + submit)
plus the TPU-pod multihost mode the reference lacks. Dry-run only — the
emitted sbatch script / per-host command wiring is the contract.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAUNCH = os.path.join(REPO, "scripts", "launch.py")


def _run(*argv):
    out = subprocess.run(
        [sys.executable, LAUNCH, *argv],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=60,
    )
    assert out.returncode == 0, out.stderr
    return out.stdout


def test_slurm_dry_run(tmp_path):
    log_dir = str(tmp_path / "slurm")
    out = _run(
        "slurm", "--dry-run", "--gpus", "4", "--hours", "12",
        "--partition", "gpu_requeue", "--log-dir", log_dir,
        "--", "train=train_rodent", "dataset=rodent",
    )
    # reference sbatch shape: requeue-able partition, GPU count, 12h
    # (slurm-run.py:12-29)
    assert "#SBATCH --partition=gpu_requeue" in out
    assert "gpu" in out and "12" in out
    assert "train=train_rodent dataset=rodent" in out
    # script written to disk for submission
    assert os.path.exists(os.path.join(log_dir, "job.sbatch"))


def test_tpu_pod_dry_run():
    out = _run(
        "tpu", "--dry-run", "--hosts", "tpu-host-0:9999,tpu-host-1",
        "--", "train=train_rodent",
    )
    lines = [l for l in out.splitlines() if l.startswith("ssh ")]
    assert len(lines) == 2
    # every host gets the same coordinator and its own process id
    for i, line in enumerate(lines):
        assert "JAX_COORDINATOR_ADDRESS=tpu-host-0:9999" in line
        assert "JAX_NUM_PROCESSES=2" in line
        assert f"JAX_PROCESS_ID={i}" in line
        assert "train=train_rodent" in line


def test_local_dry_run():
    out = _run("local", "--dry-run", "--", "train=smoke")
    assert "brax_tracking_tpu.harness.driver" in out
    assert "train=smoke" in out

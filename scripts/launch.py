#!/usr/bin/env python3
"""Cluster launcher: SLURM sbatch or TPU-pod multihost launch.

Capability parity with /root/reference/scripts/slurm-run.py:4-33 (sbatch
generation + submit), extended with the TPU-pod path the reference lacks:
one process per host, with JAX multi-process env wiring
(coordinator/process_id/num_processes) matching distributed/mesh.py's
single-controller model.

Examples:
  python scripts/launch.py slurm --gpus 4 --hours 12 -- train=train_rodent
  python scripts/launch.py tpu --hosts host0:8476,host1 -- train=train_rodent
  python scripts/launch.py local -- train=smoke dataset=minirat
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

SBATCH_TEMPLATE = """#!/bin/bash
#SBATCH --job-name={job_name}
#SBATCH --partition={partition}
#SBATCH --gres=gpu:{gpus}
#SBATCH --cpus-per-task={cpus}
#SBATCH --mem={mem}
#SBATCH --time={hours}:00:00
#SBATCH --output={log_dir}/%j.out
#SBATCH --requeue

{env_setup}
python3 -m brax_tracking_tpu.harness.driver {overrides}
"""


def launch_slurm(args, overrides):
    script = SBATCH_TEMPLATE.format(
        job_name=args.job_name,
        partition=args.partition,
        gpus=args.gpus,
        cpus=args.cpus,
        mem=args.mem,
        hours=args.hours,
        log_dir=args.log_dir,
        env_setup=args.env_setup,
        overrides=" ".join(overrides),
    )
    os.makedirs(args.log_dir, exist_ok=True)
    path = os.path.join(args.log_dir, "job.sbatch")
    with open(path, "w") as f:
        f.write(script)
    print(script)
    if not args.dry_run:
        subprocess.run(["sbatch", path], check=True)


def launch_tpu(args, overrides):
    """One driver process per TPU host; JAX picks up the pod topology.

    Emits the per-host commands (ssh fan-out is site-specific); each host
    must see JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID or
    run on Cloud TPU VMs where jax.distributed auto-initializes.
    """
    hosts = args.hosts.split(",")
    coordinator = hosts[0] if ":" in hosts[0] else hosts[0] + ":8476"
    for i, host in enumerate(h.split(":")[0] for h in hosts):
        env = (
            f"JAX_COORDINATOR_ADDRESS={coordinator} "
            f"JAX_NUM_PROCESSES={len(hosts)} JAX_PROCESS_ID={i}"
        )
        cmd = (
            f"ssh {host} '{env} python3 -m brax_tracking_tpu.harness.driver "
            + " ".join(overrides)
            + "'"
        )
        print(cmd)
        if not args.dry_run:
            subprocess.Popen(cmd, shell=True)


def launch_local(args, overrides):
    cmd = [sys.executable, "-m", "brax_tracking_tpu.harness.driver"] + overrides
    print(" ".join(cmd))
    if not args.dry_run:
        subprocess.run(cmd, check=True)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="mode", required=True)

    s = sub.add_parser("slurm")
    s.add_argument("--job-name", default="brax_tracking_tpu")
    s.add_argument("--partition", default="gpu_requeue")
    s.add_argument("--gpus", type=int, default=4)
    s.add_argument("--cpus", type=int, default=16)
    s.add_argument("--mem", default="128G")
    s.add_argument("--hours", type=int, default=12)
    s.add_argument("--log-dir", default="./slurm_logs")
    s.add_argument("--env-setup", default="")
    s.add_argument("--dry-run", action="store_true")

    t = sub.add_parser("tpu")
    t.add_argument("--hosts", required=True, help="host0[:port],host1,...")
    t.add_argument("--dry-run", action="store_true")

    l = sub.add_parser("local")
    l.add_argument("--dry-run", action="store_true")

    args, overrides = p.parse_known_args()
    overrides = [o for o in overrides if o != "--"]
    {"slurm": launch_slurm, "tpu": launch_tpu, "local": launch_local}[args.mode](
        args, overrides
    )


if __name__ == "__main__":
    main()

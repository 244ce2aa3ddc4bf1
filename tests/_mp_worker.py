"""Worker process for tests/test_multiprocess.py (not a pytest module).

Runs a tiny PPO train() under a 2-process ``jax.distributed`` CPU cluster
(4 virtual devices per process -> one global 8-device env mesh) and dumps
observables for the parent test to compare. Mirrors the reference's
multi-process plumbing (custom_ppo.py:155-170,189-197): identical network
init everywhere, decorrelated per-process env keys, process-0-only eval.

Usage: python tests/_mp_worker.py <process_id> <port> <out_pickle>
"""

import os
import pickle
import sys


def main():
    pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2
    assert jax.device_count() == 8
    assert jax.local_device_count() == 4

    from test_ppo import PointMass
    from run_tiny_train import run_tiny_train  # noqa: F401  (same dir)

    result = run_tiny_train(PointMass())
    from brax_tracking_tpu.distributed import mesh as dmesh

    result["process_id"] = pid
    result["folded_key"] = jax.device_get(
        dmesh.fold_process_key(jax.random.PRNGKey(7))
    )
    with open(out, "wb") as f:
        pickle.dump(result, f)
    dmesh.synchronize_hosts()


if __name__ == "__main__":
    main()

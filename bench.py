"""Benchmark: bundle-adjustment LM iterations/s on a EuRoC-scale problem.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The problem matches the reference's headline workload shape (SURVEY §6):
~200 cameras, ~8k inverse-depth landmarks, ~50k observations, Huber-robust
reprojection residuals — the workload Ceres solves with SPARSE_SCHUR on all
CPU cores (map_utils.h:377-383).  The reference publishes no numbers
(BASELINE.md), so ``vs_baseline`` is measured against this same framework's
CPU execution of the identical computation on this host — i.e. the
TPU-vs-host speedup of one full LM iteration (residual + Jacobian +
normal-equation assembly + Schur reduction + dense solve + update).

One LM iteration = the fused plan-based path (optim.fused): Gram-chunk
normal-equation assembly + camera-pair-space Schur correction + dense
Cholesky solve + back-substitution + manifold update.
"""

from __future__ import annotations

import json
import time


def build_step(dtype, use_manual_jac: bool):
    import jax
    import jax.numpy as jnp

    from photometric_bundle_adjustment_tpu.models import geometric_ba, synthetic
    from photometric_bundle_adjustment_tpu.optim import ba, fused

    problem, _, _ = synthetic.synth_ba_problem(
        model="pinhole", K=200, L=8192, obs_per_landmark=6,
        pixel_noise=0.3, dtype=dtype,
    )
    cfg = ba.BAConfig(max_iterations=1, huber_delta=1.0)
    rj = geometric_ba.make_rj_fn("pinhole") if use_manual_jac else None
    solver = fused.make_fused_ba_solver(
        geometric_ba.make_residual_fn("pinhole"), geometric_ba.cam_retract, 6,
        rj_fn=rj,
    )
    # fixed observation graph -> tight (non-pow2) plan bucketing: the
    # benchmark compiles once, so recompile-bounded padding buys nothing
    plan = fused.plan_for_problem(problem, pow2_buckets=False)

    @jax.jit
    def lm_step(problem):
        with jax.default_matmul_precision("float32"):
            cost, neq = solver.build(problem, plan, cfg)
            dc, dp = solver.solve_lam(
                neq, plan, jnp.asarray(1e-4, problem.inv_depth.dtype),
                ~problem.fixed_cams, cfg,
            )
            new_cams = jax.vmap(geometric_ba.cam_retract)(
                problem.cam_states, dc
            )
            return problem._replace(
                cam_states=new_cams, inv_depth=problem.inv_depth + dp
            ), cost

    return lm_step, problem


def time_iters(lm_step, problem, iters: int) -> float:
    import jax

    p, c = lm_step(problem)  # warmup/compile
    jax.block_until_ready(c)
    t0 = time.time()
    p = problem
    for _ in range(iters):
        p, c = lm_step(p)
    jax.block_until_ready(c)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from photometric_bundle_adjustment_tpu.utils.runtime import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    backend = jax.default_backend()
    lm_step, problem = build_step(jnp.float32, use_manual_jac=(backend == "cpu"))
    dt = time_iters(lm_step, problem, 20)
    iters_per_s = 1.0 / dt

    # CPU baseline of the same computation
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        lm_step_cpu, problem_cpu = build_step(jnp.float32, use_manual_jac=True)
        dt_cpu = time_iters(lm_step_cpu, problem_cpu, 3)

    print(
        json.dumps(
            {
                "metric": f"ba_lm_iters_per_s_{backend}",
                "value": round(iters_per_s, 3),
                "unit": "iters/s",
                "vs_baseline": round(dt_cpu / dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

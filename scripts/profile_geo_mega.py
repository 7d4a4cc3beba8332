"""Piece-level device timings for the geometric-BA build paths at bench
scale (K=200, L=8192, O=49k): the round-4 fused build_dense (jacfwd), the
plane-layout build_geo_dense, and the round-5 Pallas payload kernel.

Usage: python scripts/profile_geo_mega.py [pinhole|ds]
"""
import sys

import jax
import jax.numpy as jnp

from photometric_bundle_adjustment_tpu.models import geometric_ba, synthetic
from photometric_bundle_adjustment_tpu.optim import ba, fused
from photometric_bundle_adjustment_tpu.ops import geo_mega
from photometric_bundle_adjustment_tpu.utils.runtime import (
    enable_compilation_cache,
)
from scripts.devtime import devtime


def main():
    enable_compilation_cache()
    model = sys.argv[1] if len(sys.argv) > 1 else "pinhole"
    K, L = 200, 8192
    problem, _, _ = synthetic.synth_ba_problem(
        model=model, K=K, L=L, obs_per_landmark=6,
        pixel_noise=0.3, dtype=jnp.float32,
    )
    cfg = ba.BAConfig(max_iterations=1, huber_delta=1.0,
                      schur_matmul_precision="high")
    problem, plan = fused.densify_problem(problem, pow2_buckets=False)
    lam = jnp.asarray(1e-4, jnp.float32)
    free = ~problem.fixed_cams

    # ---- round-4 bench path: fused build_dense (jacfwd) ----
    solver = fused.make_fused_ba_solver(
        geometric_ba.make_residual_fn(model), geometric_ba.cam_retract, 6,
    )

    @jax.jit
    def step_fused(problem):
        with jax.default_matmul_precision("float32"):
            cost, neq = solver.build(problem, plan, cfg)
            dc, dp = solver.solve_lam(neq, plan, lam, free, cfg)
            new_cams = jax.vmap(geometric_ba.cam_retract)(
                problem.cam_states, dc
            )
            return problem._replace(
                cam_states=new_cams, inv_depth=problem.inv_depth + dp
            ), cost

    @jax.jit
    def build_fused(problem):
        with jax.default_matmul_precision("float32"):
            return solver.build(problem, plan, cfg)

    # ---- plane-layout geo_mega dense ----
    geo_solve = geo_mega.make_geo_solver(model, problem, plan_slot=plan,
                                         v2=False)
    consts = geo_solve.consts

    @jax.jit
    def step_geo(problem):
        with jax.default_matmul_precision("float32"):
            cost, neq = geo_mega.build_geo_dense(
                model, problem, consts, plan, cfg
            )
            dc, dp = geo_solve.solve_lam(neq, lam, free, cfg)
            new_cams = jax.vmap(geometric_ba.cam_retract)(
                problem.cam_states, dc
            )
            return problem._replace(
                cam_states=new_cams, inv_depth=problem.inv_depth + dp
            ), cost

    @jax.jit
    def build_geo_d(problem):
        with jax.default_matmul_precision("float32"):
            return geo_mega.build_geo_dense(model, problem, consts, plan, cfg)

    @jax.jit
    def payload_geo(problem):
        with jax.default_matmul_precision("float32"):
            return geo_mega._geo_payload(model, problem, consts, cfg)

    # ---- pieces ----
    cost, neq = jax.jit(
        lambda p: geo_mega.build_geo_dense(model, p, consts, plan, cfg)
    )(problem)

    @jax.jit
    def solve_only(neq):
        with jax.default_matmul_precision("float32"):
            return geo_solve.solve_lam(neq, lam, free, cfg)

    devtime(step_fused, problem, label="full step (fused jacfwd)")
    devtime(step_geo, problem, label="full step (geo_mega plane)")
    devtime(build_fused, problem, label="build only (fused jacfwd)")
    devtime(build_geo_d, problem, label="build only (geo_mega plane)")
    devtime(payload_geo, problem, label="payload only (geo plane XLA)")
    devtime(solve_only, neq, label="solve_lam only")

    # ---- v2 plane-native assembly ----
    geo2 = geo_mega.make_geo_solver(model, problem, plan_slot=plan, v2=True)
    consts2 = geo2.consts

    @jax.jit
    def build_geo2(problem):
        with jax.default_matmul_precision("float32"):
            return geo_mega.build_geo_dense2(
                model, problem, consts2, plan, cfg
            )

    @jax.jit
    def step_geo2(problem):
        with jax.default_matmul_precision("float32"):
            cost, neq = geo_mega.build_geo_dense2(
                model, problem, consts2, plan, cfg
            )
            dc, dp = geo_mega.solve_lam2(neq, lam, free, cfg)
            new_cams = jax.vmap(geometric_ba.cam_retract)(
                problem.cam_states, dc
            )
            return problem._replace(
                cam_states=new_cams, inv_depth=problem.inv_depth + dp
            ), cost

    # parity: deltas of v1 vs v2 at the same lambda
    import numpy as np

    @jax.jit
    def deltas_v1(problem):
        with jax.default_matmul_precision("float32"):
            cost, neq = geo_mega.build_geo_dense(
                model, problem, consts, plan, cfg
            )
            return geo_solve.solve_lam(neq, lam, free, cfg)

    @jax.jit
    def deltas_v2(problem):
        with jax.default_matmul_precision("float32"):
            cost, neq = geo_mega.build_geo_dense2(
                model, problem, consts2, plan, cfg
            )
            return geo_mega.solve_lam2(neq, lam, free, cfg)

    dc1, dp1 = deltas_v1(problem)
    dc2, dp2 = deltas_v2(problem)
    sc = max(float(jnp.abs(dc1).max()), 1e-12)
    sp = max(float(jnp.abs(dp1).max()), 1e-12)
    print(f"v1-v2 delta_c rel {float(jnp.abs(dc1 - dc2).max()) / sc:.3e}  "
          f"delta_p rel {float(jnp.abs(dp1 - dp2).max()) / sp:.3e}")
    devtime(build_geo2, problem, label="build only (geo v2 plane-native)")
    devtime(step_geo2, problem, label="full step (geo v2 plane-native)")

    if hasattr(geo_mega, "geo_payload_pallas"):
        @jax.jit
        def payload_k(problem):
            with jax.default_matmul_precision("float32"):
                return geo_mega._geo_payload(
                    model, problem, consts, cfg, use_pallas=True
                )

        @jax.jit
        def build_geo_k(problem):
            with jax.default_matmul_precision("float32"):
                return geo_mega.build_geo_dense(
                    model, problem, consts, plan, cfg, use_pallas=True
                )

        @jax.jit
        def step_geo_k(problem):
            with jax.default_matmul_precision("float32"):
                cost, neq = geo_mega.build_geo_dense(
                    model, problem, consts, plan, cfg, use_pallas=True
                )
                dc, dp = geo_solve.solve_lam(neq, lam, free, cfg)
                new_cams = jax.vmap(geometric_ba.cam_retract)(
                    problem.cam_states, dc
                )
                return problem._replace(
                    cam_states=new_cams, inv_depth=problem.inv_depth + dp
                ), cost

        # parity check before timing
        c0, p0 = jax.jit(payload_geo)(problem)
        c1, p1 = payload_k(problem)
        import numpy as np
        pa, pb = np.asarray(p0), np.asarray(p1)
        scale = np.maximum(np.abs(pa).max(), 1.0)
        print(f"payload parity: max|d|={np.abs(pa - pb).max():.3e} "
              f"(rel {np.abs(pa - pb).max() / scale:.3e}), "
              f"cost d={abs(float(c0) - float(c1)):.3e}")
        devtime(payload_k, problem, label="payload only (PALLAS)")
        devtime(build_geo_k, problem, label="build only (geo PALLAS)")
        devtime(step_geo_k, problem, label="full step (geo PALLAS)")


if __name__ == "__main__":
    main()

"""True device-time per fused LM iteration: N iterations inside one jit,
timed with a forced scalar fetch (the axon tunnel's block_until_ready does
not actually block)."""
import time

import jax
import jax.numpy as jnp

from photometric_bundle_adjustment_tpu.models import geometric_ba, synthetic
from photometric_bundle_adjustment_tpu.optim import ba, fused
from photometric_bundle_adjustment_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend())

problem, _, _ = synthetic.synth_ba_problem(
    model="pinhole", K=200, L=8192, obs_per_landmark=6, pixel_noise=0.3,
    dtype=jnp.float32,
)
cfg = ba.BAConfig(max_iterations=1, huber_delta=1.0)
residual_fn = geometric_ba.make_residual_fn("pinhole")
solver = fused.make_fused_ba_solver(residual_fn, geometric_ba.cam_retract, 6)
plan = fused.plan_for_problem(problem, pow2_buckets=False)
lam = jnp.asarray(1e-4, jnp.float32)
free = ~problem.fixed_cams


def lm_step(p):
    with jax.default_matmul_precision("float32"):
        cost, neq = solver.build(p, plan, cfg)
        dc, dp = solver.solve_lam(neq, plan, lam, free, cfg)
        new_cams = jax.vmap(geometric_ba.cam_retract)(p.cam_states, dc)
        return p._replace(
            cam_states=new_cams, inv_depth=p.inv_depth + dp), cost


N = 50


@jax.jit
def run_n(p):
    def body(i, state):
        p, _ = state
        return lm_step(p)
    return jax.lax.fori_loop(0, N, body, (p, jnp.asarray(0.0, jnp.float32)))


@jax.jit
def run_1(p):
    return lm_step(p)


# warm up both
o = run_n(problem)
_ = float(o[1])
o1 = run_1(problem)
_ = float(o1[1])

t0 = time.time()
o = run_n(problem)
c = float(o[1])
t_n = time.time() - t0

t0 = time.time()
o1 = run_1(problem)
c1 = float(o1[1])
t_1 = time.time() - t0

per_iter = (t_n - t_1) / (N - 1)
print(f"one-call ({N} iters): {t_n*1e3:.2f} ms total")
print(f"one-call (1 iter):   {t_1*1e3:.2f} ms total (incl roundtrip)")
print(f"=> device time per LM iteration: {per_iter*1e3:.3f} ms "
      f"({1.0/per_iter:.1f} it/s)")

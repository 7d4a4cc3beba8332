"""Which BA step formulation is fastest on host CPU?"""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")

from photometric_bundle_adjustment_tpu.models import geometric_ba, synthetic
from photometric_bundle_adjustment_tpu.optim import ba, fused

problem, _, _ = synthetic.synth_ba_problem(
    model="pinhole", K=200, L=8192, obs_per_landmark=6, pixel_noise=0.3,
    dtype=jnp.float32,
)
cfg = ba.BAConfig(max_iterations=1, huber_delta=1.0)
rj = geometric_ba.make_rj_fn("pinhole")
res_fn = geometric_ba.make_residual_fn("pinhole")

# scatter path
_, build_neq = ba.make_ba_step(res_fn, geometric_ba.cam_retract, 6, rj_fn=rj)

def scatter_step(p):
    cost, H_cc, H_cp, H_pp, g_c, g_p = build_neq(p, cfg)
    dc, dp = ba.schur_solve(H_cc, H_cp, H_pp, g_c, g_p,
                            jnp.asarray(1e-4, jnp.float32),
                            ~p.fixed_cams, p.lm_valid, cfg)
    new_cams = jax.vmap(geometric_ba.cam_retract)(p.cam_states, dc)
    return p._replace(cam_states=new_cams, inv_depth=p.inv_depth + dp), cost

solver = fused.make_fused_ba_solver(res_fn, geometric_ba.cam_retract, 6, rj_fn=rj)
plan = fused.plan_for_problem(problem, pow2_buckets=False)

def fused_step(p):
    cost, neq = solver.build(p, plan, cfg)
    dc, dp = solver.solve_lam(neq, plan, jnp.asarray(1e-4, jnp.float32),
                              ~p.fixed_cams, cfg)
    new_cams = jax.vmap(geometric_ba.cam_retract)(p.cam_states, dc)
    return p._replace(cam_states=new_cams, inv_depth=p.inv_depth + dp), cost

for name, step in [("scatter", scatter_step), ("fused", fused_step)]:
    j = jax.jit(step)
    p, c = j(problem); jax.block_until_ready(c)
    t0 = time.time(); n = 5
    p = problem
    for _ in range(n):
        p, c = j(p)
    jax.block_until_ready(c)
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1e3:.1f} ms/iter ({1/dt:.2f} it/s)")

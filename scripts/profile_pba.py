"""Profile photometric-BA LM iteration pieces on TPU at EuRoC scale.

Builds a synthetic photometric problem with a realistic observation graph
(spread anchors, sliding-window targets, EuRoC image dims) and times the
fused solver's build/solve pieces with the one-jitted-fori-loop method
(see bench.py docstring for why Python-side timing measures the tunnel).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from photometric_bundle_adjustment_tpu.models import photometric_ba as pba
from photometric_bundle_adjustment_tpu.optim import ba, fused
from photometric_bundle_adjustment_tpu.utils.runtime import (
    enable_compilation_cache,
)


def build_euroc_scale_pba(K=164, L=4800, obs_per_lm=5, H=480, W=752, seed=0,
                          dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    # random smooth-ish images (content is irrelevant for throughput)
    imgs = rng.uniform(0, 255, (K, H, W)).astype(np.float32)
    images_flat = jnp.asarray(imgs.reshape(-1), dtype)

    intr = jnp.array([458.0, 457.0, W / 2, H / 2, 0, 0, 0, 0], dtype)
    # poses: forward motion, small rotations
    from photometric_bundle_adjustment_tpu.core import se3

    xi = np.zeros((K, 6))
    xi[:, 0] = np.arange(K) * 0.05
    xi[:, 1:3] = rng.normal(0, 0.02, (K, 2))
    xi[:, 3:] = rng.normal(0, 0.01, (K, 3))
    poses = se3.exp(jnp.asarray(xi, dtype))

    anchor_of_lm = rng.integers(0, K - 8, L)
    uv_ref = np.stack(
        [rng.uniform(8, W - 8, L), rng.uniform(8, H - 8, L)], -1
    )
    inv_depth = 1.0 / rng.uniform(2.0, 12.0, L)

    # sliding-window targets: each landmark seen in the next few frames
    obs_a, obs_c, obs_l = [], [], []
    for j in range(1, obs_per_lm + 1):
        obs_a.append(anchor_of_lm)
        obs_c.append(np.minimum(anchor_of_lm + j, K - 1))
        obs_l.append(np.arange(L))
    obs_a = np.concatenate(obs_a).astype(np.int32)
    obs_c = np.concatenate(obs_c).astype(np.int32)
    obs_l = np.concatenate(obs_l).astype(np.int32)
    O = obs_a.shape[0]

    ref_patch = pba.extract_ref_patches(
        images_flat, jnp.asarray(anchor_of_lm, jnp.int32),
        jnp.asarray(uv_ref, dtype), H, W,
    )

    problem = pba.build_problem(
        poses=poses,
        affine=jnp.zeros((K, 2), dtype),
        inv_depth=jnp.asarray(inv_depth, dtype),
        anchor_cam=obs_a,
        target_cam=obs_c,
        landmark=obs_l,
        uv_ref=jnp.asarray(uv_ref, dtype)[obs_l],
        ref_patch=ref_patch[obs_l],
        target_img=obs_c,
        intr_ref=jnp.tile(intr, (O, 1)),
        intr_target=jnp.tile(intr, (O, 1)),
        valid=np.ones(O, bool),
        fixed_cams=np.arange(K) < 2,
    )
    return problem, images_flat, H, W


def time_fn(fn, *args, iters=30):
    """On-device seconds per call: run `iters` reps inside one jit.

    The loop body must depend on the carry, or XLA hoists the (loop-
    invariant) computation out of the ``fori_loop`` and the measurement is
    of an empty loop.  We thread an accumulator through the first float
    leaf of the inputs scaled by 1e-37 — numerically a no-op in f32 but
    opaque to the compiler."""

    def perturb(args, acc):
        leaves, treedef = jax.tree_util.tree_flatten(args)
        done = False
        out = []
        for leaf in leaves:
            if not done and hasattr(leaf, "dtype") and \
                    jnp.issubdtype(leaf.dtype, jnp.floating):
                out.append(leaf + (acc * 1e-37).astype(leaf.dtype))
                done = True
            else:
                out.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, out)

    def run(n, args):
        def body(i, acc):
            out = fn(*perturb(args, acc))
            # sum EVERY output leaf: anything not reduced into the carry
            # would be dead code the compiler is free to eliminate
            acc = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(out):
                acc = acc + jnp.sum(leaf).astype(jnp.float32)
            return acc

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    run_n = jax.jit(lambda a: run(iters, a))
    run_1 = jax.jit(lambda a: run(1, a))
    float(run_n(args))
    float(run_1(args))
    best = 1e30
    for _ in range(2):
        t0 = time.time()
        float(run_n(args))
        tn = time.time() - t0
        t0 = time.time()
        float(run_1(args))
        t1 = time.time() - t0
        best = min(best, (tn - t1) / (iters - 1))
    return best


def main():
    import sys

    pieces = "--pieces" in sys.argv
    sel = [a for a in sys.argv[1:] if not a.startswith("-")]
    enable_compilation_cache()
    print("backend:", jax.default_backend())
    problem, images_flat, H, W = build_euroc_scale_pba()
    O = problem.obs.anchor_cam.shape[0]
    K = problem.cam_states.pose.shape[0]
    L = problem.inv_depth.shape[0]
    print(f"K={K} L={L} O={O} image buffer "
          f"{images_flat.size * 4 / 1e6:.0f} MB")

    cfg = ba.BAConfig(max_iterations=1, huber_delta=9.0)
    rj = pba.make_rj_fn("pinhole", images_flat, H, W)
    res = pba.make_residual_fn("pinhole", images_flat, H, W)
    solver = fused.make_fused_ba_solver(res, pba.cam_retract, 8, rj_fn=rj)
    import sys
    if "dense" in sys.argv:
        problem, plan = fused.densify_problem(problem, pow2_buckets=False)
        print("landmark-dense layout: Opad =", problem.obs.valid.shape[0])
    else:
        plan = fused.plan_for_problem(problem, host=False, pow2_buckets=False)

    def full_iter(problem):
        with jax.default_matmul_precision("float32"):
            cost, neq = solver.build(problem, plan, cfg)
            dc, dp = solver.solve_lam(
                neq, plan, jnp.asarray(1e-4, problem.inv_depth.dtype),
                ~problem.fixed_cams, cfg,
            )
            new_cams = jax.vmap(pba.cam_retract)(problem.cam_states, dc)
            return problem._replace(
                cam_states=new_cams, inv_depth=problem.inv_depth + dp
            ), cost

    if not sel or "full" in sel:
        dt = time_fn(full_iter, problem, iters=20)
        print(f"full LM iteration: {dt * 1e3:.2f} ms  ({1 / dt:.1f} it/s)",
              flush=True)
    if not pieces:
        return

    def build_only(problem):
        with jax.default_matmul_precision("float32"):
            return solver.build(problem, plan, cfg)

    if not sel or "build" in sel:
        dt_b = time_fn(build_only, problem, iters=20)
        print(f"  build (R+J+assembly): {dt_b * 1e3:.2f} ms", flush=True)

    with jax.default_matmul_precision("float32"):
        _, neq = jax.jit(build_only)(problem)

    def solve_only(neq):
        with jax.default_matmul_precision("float32"):
            return solver.solve_lam(
                neq, plan, jnp.asarray(1e-4, jnp.float32),
                ~problem.fixed_cams, cfg,
            )

    if not sel or "solve" in sel:
        dt_s = time_fn(solve_only, neq, iters=20)
        print(f"  solve_lam: {dt_s * 1e3:.2f} ms", flush=True)

    # R+J alone (vmapped rj_fn over padded obs)
    def rj_only(problem):
        o = problem.obs
        cam_a = jax.tree_util.tree_map(
            lambda x: x[o.anchor_cam], problem.cam_states
        )
        cam_c = jax.tree_util.tree_map(
            lambda x: x[o.target_cam], problem.cam_states
        )
        rho = problem.inv_depth[o.landmark]
        return jax.vmap(rj)(cam_a, cam_c, rho, o.aux)

    if not sel or "rj" in sel:
        dt_rj = time_fn(rj_only, problem, iters=20)
        print(f"  R+J alone: {dt_rj * 1e3:.2f} ms", flush=True)

    # residual only (the accept/reject cost eval)
    def res_only(problem):
        o = problem.obs
        cam_a = jax.tree_util.tree_map(
            lambda x: x[o.anchor_cam], problem.cam_states
        )
        cam_c = jax.tree_util.tree_map(
            lambda x: x[o.target_cam], problem.cam_states
        )
        rho = problem.inv_depth[o.landmark]
        return jax.vmap(res)(cam_a, cam_c, rho, o.aux)

    if not sel or "res" in sel:
        dt_r = time_fn(res_only, problem, iters=20)
        print(f"  residual alone: {dt_r * 1e3:.2f} ms", flush=True)


if __name__ == "__main__" and "kernel" not in __import__("sys").argv:
    main()


def main_kernel():
    """Kernel-sampled full-iteration timing (run: ... kernel)."""
    enable_compilation_cache()
    print("backend:", jax.default_backend())
    problem, images_flat, H, W = build_euroc_scale_pba()
    from photometric_bundle_adjustment_tpu.models import photometric_ba as pba2

    Kimg = 164
    prob2, iog, gcnt = pba2.imagesort_problem(problem, Kimg)
    print(f"Opad={prob2.obs.valid.shape[0]} groups={len(iog)}")
    solver = pba2.make_kernel_fused_solver(
        "pinhole", images_flat, H, W, iog, gcnt
    )
    plan = fused.plan_for_problem(prob2, host=False, pow2_buckets=False)
    cfg = ba.BAConfig(max_iterations=1, huber_delta=9.0)

    # images threaded as an ARG so the timing jit doesn't inline 282 MB
    # of pixels as an HLO constant (HTTP 413 on the tunnel compiler)
    def full_iter(problem, img):
        inner = solver.make_inner(img)
        with jax.default_matmul_precision("float32"):
            cost, neq = inner.build(problem, plan, cfg)
            dc, dp = inner.solve_lam(
                neq, plan, jnp.asarray(1e-4, problem.inv_depth.dtype),
                ~problem.fixed_cams, cfg,
            )
            new_cams = jax.vmap(pba.cam_retract)(problem.cam_states, dc)
            return problem._replace(
                cam_states=new_cams, inv_depth=problem.inv_depth + dp
            ), cost

    dt = time_fn(full_iter, prob2, solver.images_pad, iters=20)
    print(f"kernel full LM iteration: {dt * 1e3:.2f} ms  ({1 / dt:.1f} it/s)",
          flush=True)

    def build_only(problem, img):
        inner = solver.make_inner(img)
        with jax.default_matmul_precision("float32"):
            return inner.build(problem, plan, cfg)

    dt_b = time_fn(build_only, prob2, solver.images_pad, iters=20)
    print(f"  build: {dt_b * 1e3:.2f} ms", flush=True)


if __name__ == "__main__" and "kernel" in __import__("sys").argv:
    raise SystemExit(main_kernel())

"""Capture a jax.profiler trace of the mega build and summarize op costs."""
import glob
import gzip
import json
import os
import sys

import jax
import jax.numpy as jnp

from photometric_bundle_adjustment_tpu.models import photometric_ba as pba
from photometric_bundle_adjustment_tpu.optim import ba, fused
from photometric_bundle_adjustment_tpu.ops import pba_mega
from photometric_bundle_adjustment_tpu.utils.runtime import (
    enable_compilation_cache,
)
from scripts.profile_pba import build_euroc_scale_pba

enable_compilation_cache()
problem, images_flat, H, W = build_euroc_scale_pba(dtype=jnp.float32)
cfg = ba.BAConfig(max_iterations=1, huber_delta=9.0,
                  schur_matmul_precision="high")
problem, plan = fused.densify_problem(problem, pow2_buckets=False)
n_images = problem.cam_states.pose.shape[0]
mega = pba_mega.make_mega_solver(
    "pinhole", images_flat, H, W, problem, n_images, plan
)
img = mega.images_pad


def step(problem, img):
    with jax.default_matmul_precision("float32"):
        cost, neq = pba_mega.build_mega(
            "pinhole", img, problem, mega.consts, mega.plan, cfg, HW=mega.HW
        )
        dc, dp = pba_mega.solve_lam(
            neq, jnp.asarray(1e-4, jnp.float32), ~problem.fixed_cams, cfg
        )
        return cost, dc, dp


jstep = jax.jit(step)
out = jstep(problem, img)
jax.block_until_ready(out)
float(out[0])

logdir = "/tmp/mega_trace"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
for _ in range(5):
    out = jstep(problem, img)
    float(out[0])
jax.profiler.stop_trace()

# summarize: find trace.json.gz and aggregate XLA op durations
paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", paths)
ev_by_name = {}
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            pid_name = ev.get("pid")
            name = ev.get("name", "")
            ev_by_name.setdefault(name, [0, 0.0])
            ev_by_name[name][0] += 1
            ev_by_name[name][1] += ev["dur"]
rows = sorted(ev_by_name.items(), key=lambda kv: -kv[1][1])
for name, (n, dur) in rows[:45]:
    print(f"{dur/5:10.1f} us  x{n:4d}  {name[:110]}")

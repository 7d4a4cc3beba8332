import re
import sys

import jax
import jax.numpy as jnp

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


txt = jax.jit(step).lower(problem, img).compile().as_text()
open("/tmp/mega_hlo.txt", "w").write(txt)
for name in sys.argv[1:]:
    # print the definition line(s) of the fusion computation + its root
    pat = re.compile(rf"^\s*%?{re.escape(name)} = .*$", re.M)
    for m in pat.finditer(txt):
        print(m.group(0)[:400])
        print("---")

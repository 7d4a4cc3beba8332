"""Smoke test for bench.py — the driver runs it after every round, so a
bit-rotted bench records nothing.  Exercises both the accelerator-style
(dense plan, autodiff Jacobians) and CPU-style (host plan, manual
Jacobians) step builders and the timing harness at toy scale."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


@pytest.mark.parametrize("host_plan,manual", [(True, True), (False, False)])
def test_build_step_and_time_iters(host_plan, manual):
    import jax.numpy as jnp

    lm_step, problem = bench.build_step(
        jnp.float32, use_manual_jac=manual, host_plan=host_plan,
        K=6, L=64,
    )
    dt = bench.time_iters(lm_step, problem, iters=3)
    assert dt > 0.0


def test_build_pba_step_and_time_iters():
    import jax.numpy as jnp

    lm_step, problem, const = bench.build_pba_step(
        jnp.float32, use_kernel=False, K=12, L=48, obs_per_lm=3, H=64, W=96,
    )
    dt = bench.time_iters(lm_step, problem, iters=3, const=const)
    assert dt > 0.0


@pytest.mark.slow
def test_keyframes_composite_stage_timers():
    """The per-stage device timers behind the keyframes_per_s composite
    metric compile and run at toy shapes (the real shapes are EuRoC-sized
    and TPU-bound; bench.py main exercises those)."""
    step, imgs = bench.build_detect_step(H=64, W=96, B=2, F=128)
    bench.time_devcalls(step, imgs, 3)
    chunk_fn, key, lane, I = bench.build_match_chunk(
        I=8, F=128, C=2, MM=128, hyps=8
    )
    bench.time_match_chunk(chunk_fn, key, lane, I, 3)
    geo = bench.build_geometry_steps(M_loc=128, M_rows=256)
    for _name, (fn, args) in geo.items():
        bench.time_devcalls(fn, args, 3)

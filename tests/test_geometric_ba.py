"""Synthetic bundle-adjustment convergence tests (SURVEY §4 item 3):
perturbed multi-view scene must converge back to ground truth under the
Schur-LM solver with the reference's gauge convention (first two cameras
fixed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photometric_bundle_adjustment_tpu.core import cameras, se3
from photometric_bundle_adjustment_tpu.models import geometric_ba
from photometric_bundle_adjustment_tpu.optim import ba


def synth_scene(model="pinhole", K=4, L=60, seed=0, noise_px=0.0):
    rng = np.random.default_rng(seed)
    intr = cameras.test_params(model)

    # ground-truth camera poses: spread along x, small rotations
    xi = np.zeros((K, 6))
    xi[:, 0] = np.arange(K) * 0.3          # baseline translations
    xi[:, 1] = rng.normal(0, 0.05, K)
    xi[:, 3:] = rng.normal(0, 0.03, (K, 3))
    xi[0] = 0
    poses_gt = se3.exp(jnp.asarray(xi))

    # ground-truth 3D points in front of camera 0
    pts = np.stack(
        [rng.uniform(-2, 2, L), rng.uniform(-1.5, 1.5, L), rng.uniform(4, 10, L)],
        axis=-1,
    )
    pts_w = se3.act(poses_gt[0], jnp.asarray(pts))

    # anchor = camera 0 for all landmarks
    anchor_cam_of_lm = np.zeros(L, np.int32)
    p_anchor = se3.act(se3.inverse(poses_gt[0]), pts_w)
    uv_ref = cameras.project(model, intr, p_anchor)
    inv_depth_gt = 1.0 / jnp.linalg.norm(p_anchor, axis=-1)

    # observations in cameras 1..K-1 (anchor obs skipped, map_utils.h:355)
    obs_a, obs_c, obs_l, uv_t = [], [], [], []
    for k in range(1, K):
        p_k = se3.act(se3.inverse(poses_gt[k]), pts_w)
        uv = cameras.project(model, intr, p_k)
        uv = uv + rng.normal(0, noise_px, uv.shape)
        obs_a.append(anchor_cam_of_lm)
        obs_c.append(np.full(L, k, np.int32))
        obs_l.append(np.arange(L, dtype=np.int32))
        uv_t.append(np.asarray(uv))
    O = L * (K - 1)
    problem = geometric_ba.build_problem(
        poses=poses_gt,
        inv_depth=inv_depth_gt,
        anchor_cam=np.concatenate(obs_a),
        target_cam=np.concatenate(obs_c),
        landmark=np.concatenate(obs_l),
        uv_target=jnp.asarray(np.concatenate(uv_t)),
        uv_ref=jnp.tile(uv_ref, (K - 1, 1)),
        intr_ref=jnp.tile(intr, (O, 1)),
        intr_target=jnp.tile(intr, (O, 1)),
        valid=np.ones(O, bool),
        fixed_cams=np.arange(K) < 2,
    )
    return problem, poses_gt, inv_depth_gt


@pytest.mark.parametrize("model", ["pinhole", "kb4"])
@pytest.mark.slow
def test_ba_converges_to_ground_truth(model):
    problem, poses_gt, inv_depth_gt = synth_scene(model=model)
    rng = np.random.default_rng(42)

    # perturb non-fixed poses and all inverse depths
    dpose = np.zeros((poses_gt.shape[0], 6))
    dpose[2:] = rng.normal(0, 0.02, (poses_gt.shape[0] - 2, 6))
    poses0 = jax.vmap(se3.right_plus)(poses_gt, jnp.asarray(dpose))
    rho0 = problem.inv_depth * (1.0 + rng.normal(0, 0.05, inv_depth_gt.shape))
    noisy = problem._replace(cam_states=poses0, inv_depth=jnp.asarray(rho0))

    cfg = ba.BAConfig(max_iterations=30, huber_delta=1.0, function_tolerance=1e-16)
    solved, res = geometric_ba.bundle_adjustment(noisy, model, cfg)

    assert float(res.cost) < 1e-14, f"final cost {float(res.cost)}"
    # exact recovery (gauge fully fixed by two constant cameras)
    pose_err = jax.vmap(
        lambda a, b: jnp.linalg.norm(se3.log(se3.compose(se3.inverse(a), b)))
    )(poses_gt, solved.cam_states)
    assert float(jnp.max(pose_err)) < 1e-7
    np.testing.assert_allclose(
        np.asarray(solved.inv_depth), np.asarray(inv_depth_gt), rtol=1e-6
    )


def test_ba_robust_to_outliers():
    """Huber loss must keep gross outlier observations from destroying the
    solution (the reference's outlier taxonomy removes them later; BA itself
    must stay stable, map_utils.h:370)."""
    problem, poses_gt, inv_depth_gt = synth_scene(model="pinhole", L=80)
    rng = np.random.default_rng(7)

    # corrupt 5% of target pixels by 50 px
    uv = np.array(problem.obs.aux.uv_target)
    n_out = len(uv) // 20
    idx = rng.choice(len(uv), n_out, replace=False)
    uv[idx] += rng.normal(0, 50, (n_out, 2))
    aux = problem.obs.aux._replace(uv_target=jnp.asarray(uv))
    problem = problem._replace(obs=problem.obs._replace(aux=aux))

    dpose = np.zeros((poses_gt.shape[0], 6))
    dpose[2:] = rng.normal(0, 0.01, (poses_gt.shape[0] - 2, 6))
    noisy = problem._replace(
        cam_states=jax.vmap(se3.right_plus)(poses_gt, jnp.asarray(dpose)),
        inv_depth=problem.inv_depth * 1.02,
    )
    solved, res = geometric_ba.bundle_adjustment(
        noisy, "pinhole", ba.BAConfig(max_iterations=30, huber_delta=1.0)
    )
    pose_err = jax.vmap(
        lambda a, b: jnp.linalg.norm(se3.log(se3.compose(se3.inverse(a), b)))
    )(poses_gt, solved.cam_states)
    # inlier-dominated solution: poses recovered to sub-millipixel scale
    assert float(jnp.max(pose_err)) < 5e-3


@pytest.mark.slow
def test_ba_padding_invariance():
    """Padded (invalid) observations and landmarks must not change the
    result — the static-shape contract for jit."""
    problem, poses_gt, _ = synth_scene(model="pinhole", K=3, L=30)
    solved_a, res_a = geometric_ba.bundle_adjustment(
        problem, "pinhole", ba.BAConfig(max_iterations=5)
    )

    # pad 17 junk observations and 5 junk landmarks
    o = problem.obs
    pad = 17
    obs_pad = ba.BAObservations(
        anchor_cam=jnp.concatenate([o.anchor_cam, jnp.zeros(pad, jnp.int32)]),
        target_cam=jnp.concatenate([o.target_cam, jnp.ones(pad, jnp.int32)]),
        landmark=jnp.concatenate([o.landmark, jnp.zeros(pad, jnp.int32)]),
        aux=jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x, jnp.ones((pad,) + x.shape[1:], x.dtype)]),
            o.aux,
        ),
        valid=jnp.concatenate([o.valid, jnp.zeros(pad, o.valid.dtype)]),
    )
    lpad = 5
    padded = problem._replace(
        obs=obs_pad,
        inv_depth=jnp.concatenate([problem.inv_depth, jnp.full(lpad, 0.3)]),
        lm_valid=jnp.concatenate([problem.lm_valid, jnp.zeros(lpad, bool)]),
    )
    solved_b, res_b = geometric_ba.bundle_adjustment(
        padded, "pinhole", ba.BAConfig(max_iterations=5)
    )
    np.testing.assert_allclose(float(res_a.cost), float(res_b.cost), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(solved_a.cam_states), np.asarray(solved_b.cam_states), atol=1e-9
    )


@pytest.mark.slow
def test_manual_jacobian_matches_autodiff():
    """Closed-form rj_fn must match jacfwd through the retraction."""
    problem, _, _ = synth_scene(model="kb4", K=3, L=10)
    o = problem.obs
    cam_a = problem.cam_states[o.anchor_cam]
    cam_c = problem.cam_states[o.target_cam]
    rho = problem.inv_depth[o.landmark]

    rj = geometric_ba.make_rj_fn("kb4")
    r_man, J_man = jax.vmap(rj)(cam_a, cam_c, rho, o.aux)

    res_fn = geometric_ba.make_residual_fn("kb4")

    def auto_rj(ca, cc, rh, aux):
        def f(d):
            return res_fn(
                geometric_ba.cam_retract(ca, d[:6]),
                geometric_ba.cam_retract(cc, d[6:12]),
                rh + d[12], aux,
            )
        z = jnp.zeros(13)
        return f(z), jax.jacfwd(f)(z)

    r_auto, J_auto = jax.vmap(auto_rj)(cam_a, cam_c, rho, o.aux)
    np.testing.assert_allclose(np.asarray(r_man), np.asarray(r_auto), atol=1e-10)
    np.testing.assert_allclose(np.asarray(J_man), np.asarray(J_auto),
                               rtol=1e-6, atol=1e-8)


def test_bundle_adjustment_packed_matches_unpacked():
    """Packed-buffer dispatch (utils/pack + bundle_adjustment_packed) must
    reproduce the regular solve exactly — same arrays, same plan, only the
    transfer layout differs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from photometric_bundle_adjustment_tpu.models import (
        geometric_ba, synthetic,
    )
    from photometric_bundle_adjustment_tpu.optim import ba

    problem, _, _ = synthetic.synth_ba_problem(
        model="pinhole", K=10, L=96, obs_per_landmark=4,
        pixel_noise=0.5, dtype=jnp.float32,
    )
    pnp = jax.tree_util.tree_map(np.asarray, problem)
    cfg = ba.BAConfig(max_iterations=5, huber_delta=1.0)

    p2, plan = geometric_ba._accel_plan(pnp)
    solved, res = geometric_ba.make_fused_solver("pinhole")(p2, plan, cfg)
    poses, rho, res_p, proj_out = geometric_ba.bundle_adjustment_packed(
        pnp, "pinhole", cfg
    )
    assert proj_out is None
    np.testing.assert_allclose(poses, np.asarray(solved.cam_states),
                               rtol=0, atol=0)
    np.testing.assert_allclose(rho, np.asarray(solved.inv_depth),
                               rtol=0, atol=0)
    assert res_p.iterations == int(res.iterations)
    np.testing.assert_allclose(res_p.cost, float(res.cost), rtol=1e-6)


def test_bundle_adjustment_packed_chunk_family():
    """Same bit-exactness for the ragged CHUNK plan family (SchurPlan):
    invalidating most observations makes smax*L > 3*n_valid so
    _accel_plan keeps the chunk plan, exercising the device-side
    _device_pair_plan rebuild on that family too (the uniform synthetic
    of the test above always picks the dense plan)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from photometric_bundle_adjustment_tpu.models import (
        geometric_ba, synthetic,
    )
    from photometric_bundle_adjustment_tpu.optim import ba

    problem, _, _ = synthetic.synth_ba_problem(
        model="pinhole", K=10, L=96, obs_per_landmark=8,
        pixel_noise=0.5, dtype=jnp.float32,
    )
    pnp = jax.tree_util.tree_map(np.asarray, problem)
    rng = np.random.default_rng(3)
    v = np.asarray(pnp.obs.valid).copy()
    drop = rng.random(v.shape) < 0.8
    ln = np.asarray(pnp.obs.landmark)
    drop[ln <= 1] = False   # two landmarks keep all 8 obs -> smax stays 8
    v = np.where(drop, 0.0, v)
    pnp = pnp._replace(obs=pnp.obs._replace(valid=v.astype(v.dtype)))

    p2, plan = geometric_ba._accel_plan(pnp)
    from photometric_bundle_adjustment_tpu.optim.schur_plan import SchurPlan
    assert isinstance(plan, SchurPlan), "test no longer hits chunk family"
    cfg = ba.BAConfig(max_iterations=3, huber_delta=1.0)
    solved, res = geometric_ba.make_fused_solver("pinhole")(p2, plan, cfg)
    poses, rho, res_p, _ = geometric_ba.bundle_adjustment_packed(
        pnp, "pinhole", cfg
    )
    np.testing.assert_allclose(poses, np.asarray(solved.cam_states),
                               rtol=0, atol=0)
    np.testing.assert_allclose(rho, np.asarray(solved.inv_depth),
                               rtol=0, atol=0)


def test_pack_tree_roundtrip():
    import jax
    import numpy as np

    from photometric_bundle_adjustment_tpu.utils import pack as pack_mod

    rng = np.random.default_rng(0)
    tree = {
        "a": rng.normal(size=(5, 3)).astype(np.float32),
        "b": rng.integers(0, 100, (7,)).astype(np.int32),
        "c": (rng.random(4) > 0.5),
        "d": rng.normal(size=(2, 2, 2)).astype(np.float32),
    }
    bufs, spec = pack_mod.pack_tree(tree)
    out = jax.jit(
        lambda b: pack_mod.unpack_tree(b, spec)
    )(bufs)
    for k in tree:
        np.testing.assert_array_equal(np.asarray(out[k]), tree[k])

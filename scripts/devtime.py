"""On-device timing helper for the axon tunnel (block_until_ready does not
actually block there): run f N times inside ONE jit via fori_loop with a
data dependency, force a scalar fetch, subtract the 1-iteration baseline."""
import time

import jax
import jax.numpy as jnp


def _leaf_sum(tree):
    leaves = [jnp.sum(x).astype(jnp.float32)
              for x in jax.tree_util.tree_leaves(tree)
              if jnp.issubdtype(x.dtype, jnp.floating)]
    return sum(leaves) if leaves else jnp.asarray(0.0, jnp.float32)


def devtime(f, *args, iters=30, label=None):
    """Returns seconds per call of f(*args), measured on device."""

    def run(n_static, args):
        def body(i, s):
            eps = s * 1e-30
            pert = jax.tree_util.tree_map(
                lambda x: x + eps.astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                args,
            )
            out = f(*pert)
            return s + _leaf_sum(out)

        return jax.lax.fori_loop(0, n_static, body, jnp.asarray(0.0, jnp.float32))

    run_n = jax.jit(lambda a: run(iters, a))
    run_1 = jax.jit(lambda a: run(1, a))
    _ = float(run_n(args))
    _ = float(run_1(args))
    t0 = time.time()
    _ = float(run_n(args))
    t_n = time.time() - t0
    t0 = time.time()
    _ = float(run_1(args))
    t_1 = time.time() - t0
    per = (t_n - t_1) / (iters - 1)
    if label:
        print(f"{label:36s} {per*1e3:8.3f} ms")
    return per

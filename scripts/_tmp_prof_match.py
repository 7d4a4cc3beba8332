import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, time
from photometric_bundle_adjustment_tpu.features import match
from photometric_bundle_adjustment_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()

rng = np.random.default_rng(0)
I, F, C, MM = 164, 512, 32, 512
desc = jnp.asarray(rng.integers(0, 2**32, (I, F, 8), dtype=np.uint32))
valid = jnp.ones((I, F), bool)
key = jax.random.PRNGKey(0); lane = jnp.arange(C, dtype=jnp.int32)

def match_only(i1, i2, key):
    def one(a, b2):
        m12 = match.match_descriptors(desc[a], desc[b2], valid[a], valid[b2], 70, 1.2)
        pairs, pvalid, count = match.matches_to_pairs(m12, MM)
        return pairs, pvalid, count
    return jax.vmap(one)(i1, i2)

def run(n):
    def body(s, acc):
        i1 = (lane * 7 + s) % I; i2 = (lane * 11 + 2 * s + 1) % I
        p, v, c = match_only(i1, i2, jax.random.fold_in(key, s))
        return acc + jnp.sum(c).astype(jnp.float32)
    return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))

rn = jax.jit(lambda: run(8)); r1 = jax.jit(lambda: run(1))
float(rn()); float(r1())
tns, t1s = [], []
for _ in range(3):
    t0 = time.time(); float(rn()); tns.append(time.time() - t0)
    t0 = time.time(); float(r1()); t1s.append(time.time() - t0)
dt = (min(tns) - min(t1s)) / 7
print(f"match_only: {dt*1e3:.1f} ms/chunk = {dt/C*1e3:.3f} ms/pair")

"""Measure alternate formulations of the geometric build's bandwidth
hot spots (VERDICT r3 #7): the dense M coupling lift and the g_c one-hot
matmuls.  The plane-layout analysis (ops/geo_mega.py) showed the build is
bandwidth-bound on its (S, L, K) / (O, K) one-hot materialisations; these
variants express the same contractions as compare+multiply+reduce so XLA
can fuse the one-hot GENERATION into the reduction and never write the
lift slab to HBM.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from photometric_bundle_adjustment_tpu.utils.runtime import enable_compilation_cache
from scripts.devtime import devtime

enable_compilation_cache()
print("backend:", jax.default_backend())

K, L, S, C = 200, 8192, 6, 6
O = S * L
dtype = jnp.float32
key = jax.random.PRNGKey(0)
lm_cam = jax.random.randint(key, (S, L), 0, K + 1)      # K = padding id
vt_sl = jax.random.normal(key, (S, L, C), dtype)
anchor_cam = jax.random.randint(key, (L,), 0, K)
anchor_v = jax.random.normal(key, (L, C), dtype)
obs_an = jax.random.randint(key, (O,), 0, K + 1)
obs_tn = jax.random.randint(key, (O,), 0, K + 1)
Av = jax.random.normal(key, (O, 2 * C + 1), dtype)


def m_onehot(lm_cam, vt_sl, anchor_cam, anchor_v):
    oh = jax.nn.one_hot(lm_cam, K, dtype=dtype)          # (S, L, K)
    M = jnp.einsum("slk,slc->lkc", oh, vt_sl).reshape(L, K * C)
    oh_a = jax.nn.one_hot(anchor_cam, K, dtype=dtype)
    return M + (oh_a[:, :, None] * anchor_v[:, None, :]).reshape(L, K * C)


def m_fused(lm_cam, vt_sl, anchor_cam, anchor_v):
    iot = jnp.arange(K, dtype=lm_cam.dtype)
    msk = (lm_cam[:, :, None] == iot).astype(dtype)       # virtual (S,L,K)
    M = jnp.sum(msk[..., None] * vt_sl[:, :, None, :], axis=0)
    amsk = (anchor_cam[:, None] == iot).astype(dtype)
    M = M + amsk[:, :, None] * anchor_v[:, None, :]
    return M.reshape(L, K * C)


def gc_onehot(obs_an, obs_tn, Av):
    oh_an = jax.nn.one_hot(obs_an, K, dtype=dtype)
    oh_tn = jax.nn.one_hot(obs_tn, K, dtype=dtype)
    return oh_an.T @ Av[:, :C] + oh_tn.T @ Av[:, C:2 * C]


def gc_fused(obs_an, obs_tn, Av):
    iot = jnp.arange(K, dtype=obs_an.dtype)
    man = (obs_an[:, None] == iot).astype(dtype)          # virtual (O, K)
    mtn = (obs_tn[:, None] == iot).astype(dtype)
    ga = jnp.sum(man[:, :, None] * Av[:, None, :C], axis=0)
    gt = jnp.sum(mtn[:, :, None] * Av[:, None, C:2 * C], axis=0)
    return ga + gt


M1 = jax.jit(m_onehot)(lm_cam, vt_sl, anchor_cam, anchor_v)
M2 = jax.jit(m_fused)(lm_cam, vt_sl, anchor_cam, anchor_v)
import numpy as np
print("M parity:", float(jnp.max(jnp.abs(M1 - M2))))
g1 = jax.jit(gc_onehot)(obs_an, obs_tn, Av)
g2 = jax.jit(gc_fused)(obs_an, obs_tn, Av)
print("g_c parity:", float(jnp.max(jnp.abs(g1 - g2))))

devtime(m_onehot, lm_cam, vt_sl, anchor_cam, anchor_v, label="M one-hot einsum")
devtime(m_fused, lm_cam, vt_sl, anchor_cam, anchor_v, label="M fused compare-reduce")
devtime(gc_onehot, obs_an, obs_tn, Av, label="g_c one-hot matmuls")
devtime(gc_fused, obs_an, obs_tn, Av, label="g_c fused compare-reduce")

"""TPU micro-benchmark: Pallas grouped patch sampler vs XLA gather sampler."""
import jax
import jax.numpy as jnp
import numpy as np

from photometric_bundle_adjustment_tpu.models import photometric_ba as pba
from photometric_bundle_adjustment_tpu.ops import patch_sample as ps
from photometric_bundle_adjustment_tpu.utils.runtime import enable_compilation_cache
from scripts.devtime import devtime

enable_compilation_cache()
print("backend:", jax.default_backend())
rng = np.random.default_rng(0)
Kimg, H, W, O = 164, 480, 752, 24000
images = jnp.asarray(rng.uniform(0, 255, (Kimg, H, W)).astype(np.float32))
img_idx = rng.integers(0, Kimg, O).astype(np.int32)
ctr = np.stack([rng.uniform(0, W, O), rng.uniform(0, H, O)], -1)
offs = rng.uniform(-2.5, 2.5, (O, 8, 2))
uv = (ctr[:, None, :] + offs).astype(np.float32)

order, img_of_group, group_counts = ps.group_layout(img_idx, Kimg)
Opad = order.shape[0]
print(f"O={O} Opad={Opad} ({Opad/O:.2f}x pad) groups={len(img_of_group)}")
uvp = np.zeros((Opad, 8, 2), np.float32)
uvp[order >= 0] = uv[order[order >= 0]]
ux = jnp.asarray(uvp[..., 0].T.copy()); uy = jnp.asarray(uvp[..., 1].T.copy())
imgs_pad, HW = ps.pad_images(images)
imgs_pad = jax.device_put(imgs_pad)
iog = jnp.asarray(img_of_group)
gcnt = jnp.asarray(group_counts)
flat = images.reshape(-1)
img_idx_j = jnp.asarray(img_idx)
uv_j = jnp.asarray(uv)

def kernel_fn(imgs_pad, ux, uy):
    return ps.sample_patches_grouped(imgs_pad, ux, uy, iog, gcnt, HW=HW)

def kernel_val_fn(imgs_pad, ux, uy):
    return ps.sample_patches_grouped(imgs_pad, ux, uy, iog, gcnt, HW=HW, want_grads=False)

def xla_fn(flat, uv):
    def one(idx, uvp):
        return pba.bilinear_sample_and_grad(flat, jnp.full((8,), idx), uvp, H, W)
    return jax.vmap(one)(img_idx_j, uv)

def xla_val_fn(flat, uv):
    def one(idx, uvp):
        return pba.bilinear_sample_flat(flat, jnp.full((8,), idx), uvp, H, W)
    return jax.vmap(one)(img_idx_j, uv)

t1 = devtime(kernel_fn, imgs_pad, ux, uy, iters=30, label="pallas patch kernel (val+grad)")
t1v = devtime(kernel_val_fn, imgs_pad, ux, uy, iters=30, label="pallas patch kernel (val only)")
t2 = devtime(xla_fn, flat, uv_j, iters=30, label="xla gather sampler (val+grad)")
t2v = devtime(xla_val_fn, flat, uv_j, iters=30, label="xla gather sampler (val only)")
print(f"speedup val+grad: {t2/t1:.2f}x   val-only: {t2v/t1v:.2f}x")

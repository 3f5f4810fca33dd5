import time, sys
sys.path.insert(0, "/root/repo")
from cropnerf_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax
import jax.numpy as jnp
from cropnerf_tpu.models.config import PRESETS
from cropnerf_tpu.train.state import create_train_state
from cropnerf_tpu.train.step import make_train_step, make_render_fn
from cropnerf_tpu.data.databank import build_pixel_bank
from cropnerf_tpu.core.cameras import Cameras
from cropnerf_tpu.ops import metrics as metric_ops

d = np.load("/root/repo/.sphere_data.npz")
images, masks, c2w, fx = d["images"], d["masks"], d["c2w"], d["fx"]
n, h, w = images.shape[:3]
cams = Cameras(c2w=jnp.asarray(c2w), fx=jnp.asarray(fx), fy=jnp.asarray(fx),
               cx=jnp.full((n,), w/2.0), cy=jnp.full((n,), h/2.0),
               width=jnp.full((n,), w, jnp.int32), height=jnp.full((n,), h, jnp.int32))
bank = build_pixel_bank(images, masks, cams)
cfg = PRESETS["cropnerf"]
state = create_train_state(jax.random.PRNGKey(0), cfg, num_images=n)
step = make_train_step(cfg)
key = jax.random.PRNGKey(1)
t0 = time.perf_counter()
for i in range(2001):
    key, sub = jax.random.split(key)
    state, m = step(state, bank, sub)
    if i % 10 == 0:
        jax.block_until_ready(m["loss"])
    if i % 500 == 0:
        print(f"step {i}: loss={float(m['loss']):.4f} psnr={float(m['psnr']):.2f} "
              f"sem={float(m['semantics_loss']):.4f} t={time.perf_counter()-t0:.1f}s", flush=True)
dt = time.perf_counter()-t0
print(f"2000 steps in {dt:.1f}s = {2000*4096/dt/1e6:.2f} M rays/s", flush=True)
render = make_render_fn(cfg)
out = render(state.params, cams, jnp.int32(0), h, w)
gt = jnp.asarray(images[0]).astype(jnp.float32)/255.
mask_gt = jnp.asarray(masks[0]).astype(jnp.float32)
psnr = float(metric_ops.psnr(out["rgb"], gt))
iou = float(metric_ops.binary_iou(out["semantics_colormap"][...,0], mask_gt))
print(f"render eval: psnr={psnr:.2f} iou={iou:.3f}", flush=True)
print("VALIDATE", "OK" if (psnr > 24 and iou > 0.6) else "WEAK", flush=True)

import time, sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
from cropnerf_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax
from cropnerf_tpu.models.config import PRESETS
from cropnerf_tpu.train.state import create_train_state
from cropnerf_tpu.train.step import make_train_step, make_render_fn
from cropnerf_tpu.data.databank import build_pixel_bank
from cropnerf_tpu.ops import metrics as metric_ops
from synthetic import ring_cameras, render_synthetic_images
import jax.numpy as jnp

t0 = time.perf_counter()
cams = ring_cameras(n=24, height=256, width=256, focal=300.0)
images, masks = render_synthetic_images(cams, 256, 256, sphere_radius=0.35)
print(f"data {time.perf_counter()-t0:.0f}s", flush=True)
bank = build_pixel_bank(images, masks, cams)
cfg = PRESETS["cropnerf"]
state = create_train_state(jax.random.PRNGKey(0), cfg, num_images=24)
step = make_train_step(cfg)
key = jax.random.PRNGKey(1)
t0 = time.perf_counter()
for i in range(4001):
    key, sub = jax.random.split(key)
    state, m = step(state, bank, sub)
    if i % 50 == 0:
        jax.block_until_ready(m["loss"])
    if i % 1000 == 0:
        print(f"step {i}: loss={float(m['loss']):.4f} psnr={float(m['psnr']):.2f} "
              f"sem={float(m['semantics_loss']):.4f} t={time.perf_counter()-t0:.1f}s", flush=True)
dt = time.perf_counter()-t0
print(f"4000 steps in {dt:.1f}s = {4000*4096/dt/1e6:.2f} M rays/s", flush=True)
# eval render on a training view
render = make_render_fn(cfg)
out = render(state.params, cams, jnp.int32(0), 256, 256)
gt = jnp.asarray(images[0]).astype(jnp.float32)/255.
mask_gt = jnp.asarray(masks[0]).astype(jnp.float32)
psnr = float(metric_ops.psnr(out["rgb"], gt))
iou = float(metric_ops.binary_iou(out["semantics_colormap"][...,0], mask_gt))
print(f"render eval: psnr={psnr:.2f} iou={iou:.3f}", flush=True)
print("VALIDATE", "OK" if (psnr > 24 and iou > 0.6) else "WEAK", flush=True)

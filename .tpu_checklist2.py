"""Remaining on-chip validations: transmittance kernel + convergence."""
import time, sys
sys.path.insert(0, "/root/repo")
from cropnerf_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

from cropnerf_tpu.ops.pallas.transmittance import render_weights_pallas
from cropnerf_tpu.ops.render import render_weights
d = jax.random.uniform(jax.random.PRNGKey(2), (4096, 512)) * 5
dl = jnp.ones((4096, 512)) * 0.01
try:
    wp = render_weights_pallas(d, dl, tile_r=256)
    wx = render_weights(d, dl)
    ok = bool(jnp.allclose(wp, wx, rtol=1e-4, atol=1e-6))
    print(f"pallas transmittance on TPU: matches xla = {ok}", flush=True)
    for name, f in (("xla", lambda: render_weights(d, dl)),
                    ("pallas", lambda: render_weights_pallas(d, dl, tile_r=256))):
        f().block_until_ready()
        t0 = time.perf_counter()
        for _ in range(30): o = f()
        o.block_until_ready()
        print(f"transmittance {name}: {(time.perf_counter()-t0)/30*1e3:.3f} ms", flush=True)
except Exception as e:
    print("pallas transmittance FAILED:", str(e)[:300], flush=True)

from cropnerf_tpu.models.config import PRESETS
from cropnerf_tpu.train.state import create_train_state
from cropnerf_tpu.train.step import make_train_step
from cropnerf_tpu.data.databank import build_pixel_bank
from cropnerf_tpu.core.cameras import Cameras
dd = np.load("/root/repo/.sphere_data.npz")
images, masks, c2w, fx = dd["images"], dd["masks"], dd["c2w"], dd["fx"]
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
first_psnr = None
for i in range(601):
    key, sub = jax.random.split(key)
    state, m = step(state, bank, sub)
    if i % 10 == 0:
        jax.block_until_ready(m["loss"])
    if i % 200 == 0:
        p = float(m["psnr"])
        if first_psnr is None: first_psnr = p
        print(f"step {i}: loss={float(m['loss']):.4f} psnr={p:.2f} "
              f"sem={float(m['semantics_loss']):.4f} t={time.perf_counter()-t0:.1f}s", flush=True)
print("CONVERGENCE", "OK" if float(m["psnr"]) > first_psnr + 5 else "WEAK", flush=True)

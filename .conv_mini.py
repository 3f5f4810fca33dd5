import time, sys
sys.path.insert(0, "/root/repo")
from cropnerf_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax, jax.numpy as jnp
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
key, sub = jax.random.split(key)
t0=time.perf_counter(); state, m = step(state, bank, sub); jax.block_until_ready(m["loss"])
print(f"step0 {time.perf_counter()-t0:.1f}s", flush=True)
for grp in range(30):
    t0=time.perf_counter()
    for _ in range(20):
        key, sub = jax.random.split(key)
        state, m = step(state, bank, sub)
    jax.block_until_ready(m["loss"])
    print(f"20 steps {time.perf_counter()-t0:.2f}s psnr={float(m['psnr']):.2f}", flush=True)

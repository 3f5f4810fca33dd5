import time, sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
from cropnerf_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax
from cropnerf_tpu.models.config import PRESETS
from cropnerf_tpu.train.state import create_train_state
from cropnerf_tpu.train.step import make_train_step
from cropnerf_tpu.data.databank import build_pixel_bank
from synthetic import ring_cameras
n_img, h, w = 24, 256, 256
rng = np.random.RandomState(0)
images = rng.randint(0, 255, (n_img, h, w, 3), dtype=np.uint8)
masks = (rng.rand(n_img, h, w) > 0.8).astype(np.uint8)
cams = ring_cameras(n=n_img, height=h, width=w, focal=300.0)
bank = build_pixel_bank(images, masks, cams)
cfg = PRESETS["cropnerf"]
state = create_train_state(jax.random.PRNGKey(0), cfg, num_images=n_img)
step = make_train_step(cfg)
key = jax.random.PRNGKey(1)
t0=time.perf_counter()
key, sub = jax.random.split(key)
state, m = step(state, bank, sub)
jax.block_until_ready(m["loss"])
print(f"step0(compile) {time.perf_counter()-t0:.1f}s", flush=True)
for grp in range(6):
    t0=time.perf_counter()
    for _ in range(10):
        key, sub = jax.random.split(key)
        state, m = step(state, bank, sub)
    jax.block_until_ready(m["loss"])
    print(f"10 steps {time.perf_counter()-t0:.2f}s", flush=True)

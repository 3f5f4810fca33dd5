"""One process of a 2-process CPU ``jax.distributed`` run.

Driven by tests/test_multihost.py (NOT collected by pytest itself).  Each
process emulates one HOST with 4 virtual CPU devices (2 hosts x 4 = the
same 8-device global mesh the single-process suite uses), exercising the
actual multi-host contract the reference's per-rank DDP datamanager models
(fruit_pipeline.py:100-121): per-process local image loading
(process_image_range), global array assembly via
``jax.make_array_from_process_local_data`` inside build_sharded_pixel_bank,
cross-process Gloo collectives in the shard_map train step, and a global
barrier.

Usage: python multihost_worker.py <process_id> <port> <out_json>
"""
import json
import os
import sys


def main() -> None:
    pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))
    sys.path.insert(0, here)

    import jax
    jax.config.update("jax_platforms", "cpu")

    from cropnerf_tpu.parallel.dist import (barrier, initialize_multihost,
                                            process_info)
    initialize_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
    info = process_info()
    assert info["process_count"] == 2 and info["global_device_count"] == 8, \
        info

    import dataclasses as dc

    import jax.numpy as jnp  # noqa: F401  (backend warm-up)
    import numpy as np
    from synthetic import render_synthetic_images, ring_cameras

    from cropnerf_tpu.data.databank import (build_sharded_pixel_bank,
                                            pad_cameras, process_image_range)
    from cropnerf_tpu.models.config import PRESETS
    from cropnerf_tpu.train.state import create_train_state
    from cropnerf_tpu.train.step import make_sharded_train_step

    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    n, h, w = 8, 16, 16
    cams = ring_cameras(n=n, height=h, width=w, focal=20.0)
    images, masks = render_synthetic_images(cams, h, w)
    cams_p = pad_cameras(cams, mesh.size)
    # THE multi-host step: this process loads only its own image slice
    lo, hi = process_image_range(cams_p.num_cameras)
    bank = build_sharded_pixel_bank(images[lo:hi], masks[lo:hi], cams_p,
                                    mesh)

    cfg = dc.replace(PRESETS["cropnerf-tiny"], train_num_rays_per_batch=128)
    state = create_train_state(jax.random.PRNGKey(0), cfg, num_images=n)
    step = make_sharded_train_step(cfg, mesh, donate=False)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, m = step(state, bank, sub)
        losses.append(float(jax.device_get(m["loss"])))
    barrier("after-train")
    digest = float(sum(float(jnp.sum(jnp.abs(leaf)))
                       for leaf in jax.tree.leaves(state.params)))
    with open(f"{out}.{pid}", "w") as f:
        json.dump({"process": pid, "local_slice": [lo, hi],
                   "losses": losses, "param_digest": digest,
                   **info}, f)
    print(f"proc {pid} OK losses={losses}", flush=True)


if __name__ == "__main__":
    main()

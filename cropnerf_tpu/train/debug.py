"""Independent oracles for validating the distributed training paths.

``replay_sharded_step`` recomputes, on ONE device against the GLOBAL pixel
bank, exactly what :func:`cropnerf_tpu.train.step.make_sharded_train_step`
computes across the mesh — same per-device RNG derivation (fold_in by
device index), same pixel indices, same loss — then averages the per-device
gradients and applies the optimizer.  Comparing its result against the
actual shard_map step validates the three things the sharded path can get
silently wrong (the reference's DDP grad-equivalence contract,
fruit_pipeline.py:119-121):

  * the shard layout assumption (device d owns global pixel rows
    [d*P/N, (d+1)*P/N) ⇔ images [d*I/N, (d+1)*I/N));
  * the global camera-id arithmetic (``cam = cam_l + d*images_per_device``);
  * the gradient/metric ``pmean``.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.cameras import generate_rays, near_far_collider
from ..core.rays import RayBundle
from ..data.databank import PixelBank, decode_pixel_index
from ..models.config import TrainConfig
from ..models.model import anneal_factor, forward
from ..ops import metrics as metric_ops
from .optim import make_optimizer
from .state import TrainState
from .step import _prop_update_bool, compute_losses


def replay_sharded_step(state: TrainState, bank_global: PixelBank,
                        key: jax.Array, cfg: TrainConfig, ndev: int
                        ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One-device replay of the sharded-bank shard_map step.

    ``bank_global``: the UNSHARDED padded bank (same pixel rows the mesh
    shards).  Returns (new_state, metrics) that must match the shard_map
    step bit-for-bit up to float reassociation.
    """
    m = cfg.model
    R = cfg.train_num_rays_per_batch
    assert R % ndev == 0
    R_local = R // ndev
    height, width = bank_global.height, bank_global.width
    images_per_device = bank_global.num_pixels // (height * width * ndev)
    local_pixels = bank_global.num_pixels // ndev

    def device_loss(params, di):
        # identical RNG derivation to make_sharded_train_step.local_grads
        key_idx, key_model = jax.random.split(
            jax.random.fold_in(key, di))
        idx_local = jax.random.randint(key_idx, (R_local,), 0, local_pixels)
        idx_global = di * local_pixels + idx_local
        cam, px, py = decode_pixel_index(idx_global, height, width)
        rgb_gt = bank_global.rgb[idx_global].astype(jnp.float32) / 255.0
        mask_gt = bank_global.mask[idx_global].astype(jnp.float32)
        origins, dirs = generate_rays(bank_global.cameras, cam, px, py)
        rb = RayBundle(origins=origins, directions=dirs,
                       nears=jnp.zeros((R_local,)),
                       fars=jnp.ones((R_local,)), camera_idx=cam)
        rb = near_far_collider(rb, m.near_plane, m.far_plane)
        anneal = anneal_factor(state.step, m)
        upd = _prop_update_bool(state.step, cfg)
        outputs = forward(params, rb, m, key=key_model, train=True,
                          anneal=anneal,
                          prop_update=(upd if m.proposal_no_grad_schedule
                                       else None))
        loss, aux = compute_losses(params, outputs, rgb_gt, mask_gt, cfg,
                                   upd.astype(jnp.float32))
        aux["psnr"] = metric_ops.psnr(outputs["rgb"], rgb_gt)
        return loss, aux

    grads_acc = None
    aux_acc = None
    for di in range(ndev):
        (_, aux), grads = jax.value_and_grad(
            device_loss, has_aux=True)(state.params, jnp.asarray(di))
        grads_acc = grads if grads_acc is None else jax.tree.map(
            jnp.add, grads_acc, grads)
        aux_acc = aux if aux_acc is None else jax.tree.map(
            jnp.add, aux_acc, aux)
    grads = jax.tree.map(lambda g: g / ndev, grads_acc)
    aux = jax.tree.map(lambda a: a / ndev, aux_acc)

    tx = make_optimizer(cfg)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(params=params, opt_state=opt_state,
                         step=state.step + 1), dict(aux, grads=grads)


def assert_sharded_step_matches_replay(state, bank_sharded, bank_global,
                                       key, cfg, mesh,
                                       atol=3e-5, rtol=1e-2,
                                       atol_camera_opt=None) -> float:
    """Run the real shard_map step and the replay; assert the pmean'd GRADS
    and metrics allclose (gradients are the DDP contract — post-Adam params
    are not comparable at eps=1e-15, where a float-reassociation sign flip
    on a near-zero gradient moves a param by ±2·lr).  Returns the max grad
    deviation (for logging).

    ``atol_camera_opt``: separate tolerance for the camera_opt leaf.  Its
    gradient is a sum of strongly-cancelling per-ray pose terms whose
    compile-fusion reassociation noise floor is ~3.5e-4 on the flagship
    EVEN IN PURE FP32 (measured: the identical fp32 replay, eager vs
    jitted, deviates by exactly the same 3.52e-4 on camera_opt while every
    field/prop leaf stays <= 7e-6) — so a tight global atol would flag
    reassociation, not sharding bugs.  None = use ``atol``."""
    import numpy as np

    from .step import make_sharded_train_step
    step_s = make_sharded_train_step(cfg, mesh, donate=False,
                                     return_grads=True)
    state_s, aux_s = step_s(state, bank_sharded, key)
    _, aux_r = replay_sharded_step(state, bank_global, key, cfg, mesh.size)
    max_dev = 0.0
    flat_s = jax.tree_util.tree_flatten_with_path(aux_s["grads"])[0]
    for (path, a), b in zip(flat_s, jax.tree.leaves(aux_r["grads"])):
        name = jax.tree_util.keystr(path)
        tol = (atol_camera_opt
               if atol_camera_opt is not None and "camera_opt" in name
               else atol)
        d = float(jnp.max(jnp.abs(a - b)))
        max_dev = max(max_dev, d)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol,
                                   rtol=rtol, err_msg=name)
    for k in ("loss", "rgb_loss", "semantics_loss", "psnr"):
        np.testing.assert_allclose(float(aux_s[k]), float(aux_r[k]),
                                   rtol=1e-4, atol=1e-6)
    return max_dev

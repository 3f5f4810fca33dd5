"""The jitted train/eval steps.

One fused XLA computation per training step
(≙ Trainer.train_iteration → pipeline.get_train_loss_dict → model forward →
losses → AMP backward → per-group optimizer step, SURVEY §3.1): pixel
sampling, ray generation, proposal sampling, field eval, rendering, losses,
backward, and the optimizer update all live inside ``train_step``.  On a
multi-chip mesh the ray batch shards over the ``data`` axis and XLA inserts
the gradient ``psum`` (overlapped with backward by the latency-hiding
scheduler); parameters are replicated — the reference's DDP equivalent
(fruit_pipeline.py:119-121) without NCCL hooks.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.cameras import Cameras, generate_rays, near_far_collider
from ..core.rays import RayBundle
from ..data.databank import PixelBank, decode_pixel_index
from ..models.config import TrainConfig
from ..models.model import anneal_factor, forward
from ..ops import losses as loss_ops
from ..ops import metrics as metric_ops
from .optim import make_optimizer
from .state import TrainState


def _prop_update_bool(step: jnp.ndarray, cfg) -> jnp.ndarray:
    """Proposal-network update schedule (fruit_nerf.py:144-149): the update
    period ramps linearly from 1 to ``proposal_update_every`` over
    ``proposal_warmup`` steps; prop nets receive interlevel gradients only on
    update steps (and skip their backward entirely when
    ``proposal_no_grad_schedule``)."""
    m = cfg.model
    period = jnp.clip(step.astype(jnp.float32) / m.proposal_warmup
                      * m.proposal_update_every, 1.0, m.proposal_update_every)
    period = jnp.round(period).astype(jnp.int32)
    return step % period == 0


def _prop_update_flag(step: jnp.ndarray, cfg) -> jnp.ndarray:
    return _prop_update_bool(step, cfg).astype(jnp.float32)


def compute_losses(params: Dict, outputs: Dict, rgb_gt: jnp.ndarray,
                   mask_gt: jnp.ndarray, cfg: TrainConfig,
                   prop_flag: jnp.ndarray | float = 1.0) -> Tuple[jnp.ndarray, Dict]:
    """Loss dict ≙ fruit_nerf.py:601-615 + camera-opt regularizer."""
    m = cfg.model
    rgb_loss = loss_ops.mse_loss(outputs["rgb"], rgb_gt)
    sem_loss = loss_ops.bce_with_logits(outputs["semantics"][..., 0], mask_gt)
    inter = loss_ops.interlevel_loss(outputs["weights_list"],
                                     outputs["sdist_list"])
    dist = loss_ops.distortion_loss(outputs["weights_list"][-1],
                                    outputs["sdist_list"][-1])
    cam_reg = loss_ops.camera_opt_regularizer(
        params["camera_opt"], m.camera_opt.trans_l2_penalty,
        m.camera_opt.rot_l2_penalty)
    if m.camera_opt.mode == "off":
        cam_reg = 0.0 * cam_reg
    loss = (rgb_loss
            + m.semantic_loss_weight * sem_loss
            + m.interlevel_loss_mult * inter * prop_flag
            + m.distortion_loss_mult * dist
            + cam_reg)
    return loss, {
        "loss": loss, "rgb_loss": rgb_loss, "semantics_loss": sem_loss,
        "interlevel_loss": inter, "distortion_loss": dist,
        "camera_opt_regularizer": cam_reg,
    }


def make_train_step(cfg: TrainConfig, mesh: Optional[jax.sharding.Mesh] = None,
                    donate: bool = True, num_inner: int = 1):
    """Build the jitted train step.

    Returns ``train_step(state, bank, key) -> (state, metrics)``.
    If ``mesh`` is given (1-D axis ``data``), the ray batch is shard-annotated
    over it; otherwise single-device.

    ``num_inner > 1`` runs that many optimizer steps inside ONE XLA program
    via ``lax.scan`` (metrics are the last inner step's).  Host→device
    dispatch happens once per ``num_inner`` steps — on setups where dispatch
    latency rivals the sub-millisecond step this is the difference between
    host-bound and compute-bound training.  The reference dispatches every
    step from Python (nerfstudio Trainer loop, SURVEY §3.1).
    """
    tx = make_optimizer(cfg)
    m = cfg.model
    R = cfg.train_num_rays_per_batch

    def shard_rays(x):
        if mesh is None:
            return x
        spec = jax.sharding.PartitionSpec(*(("data",) + (None,) * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, jax.sharding.NamedSharding(mesh, spec))

    def loss_fn(params, bank: PixelBank, idx, key, step):
        cam, px, py = decode_pixel_index(idx, bank.height, bank.width)
        rgb_gt = bank.rgb[idx].astype(jnp.float32) / 255.0
        mask_gt = bank.mask[idx].astype(jnp.float32)
        origins, dirs = generate_rays(bank.cameras, cam, px, py)
        rb = RayBundle(origins=origins, directions=dirs,
                       nears=jnp.zeros((R,)), fars=jnp.ones((R,)),
                       camera_idx=cam)
        rb = near_far_collider(rb, m.near_plane, m.far_plane)
        anneal = anneal_factor(step, m)
        upd = _prop_update_bool(step, cfg)
        outputs = forward(params, rb, m, key=key, train=True, anneal=anneal,
                          prop_update=(upd if m.proposal_no_grad_schedule
                                       else None))
        loss, aux = compute_losses(params, outputs, rgb_gt, mask_gt, cfg,
                                   upd.astype(jnp.float32))
        aux["psnr"] = metric_ops.psnr(outputs["rgb"], rgb_gt)
        return loss, aux

    def one_step(state: TrainState, bank: PixelBank, key: jax.Array
                 ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        key_idx, key_model = jax.random.split(key)
        idx = jax.random.randint(key_idx, (R,), 0, bank.num_pixels)
        idx = shard_rays(idx)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, bank, idx, key_model,
                                  state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1), aux

    if num_inner == 1:
        train_step = one_step
    else:
        def train_step(state: TrainState, bank: PixelBank, key: jax.Array
                       ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
            def scan_fn(st, k):
                return one_step(st, bank, k)

            state, auxs = jax.lax.scan(scan_fn, state,
                                       jax.random.split(key, num_inner))
            return state, jax.tree.map(lambda a: a[-1], auxs)

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_sharded_train_step(cfg: TrainConfig, mesh: jax.sharding.Mesh,
                            donate: bool = True,
                            return_grads: bool = False):
    """Train step for a *sharded* pixel bank (multi-host / HBM-bound data).

    Unlike :func:`make_train_step` (replicated bank, globally-sampled ray
    indices), here ``bank.rgb``/``bank.mask`` are sharded over the ``data``
    mesh axis at image granularity and each device samples its R/ndev rays
    from its local shard inside ``shard_map`` — gathers stay chip-local, no
    collective touches pixel data, and only the gradient ``pmean`` crosses
    ICI.  This is the reference's per-rank datamanager + DDP contract
    (fruit_pipeline.py:100-121) in SPMD form.  Cameras/params replicated.
    """
    from jax.sharding import PartitionSpec as P

    tx = make_optimizer(cfg)
    m = cfg.model
    ndev = mesh.size
    R = cfg.train_num_rays_per_batch
    assert R % ndev == 0, f"{R} rays over {ndev} devices"
    R_local = R // ndev

    def train_step(state: TrainState, bank: PixelBank, key: jax.Array
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        # height/width are static pytree fields → plain ints at trace time
        height, width = bank.height, bank.width
        images_per_device = bank.num_pixels // (height * width * ndev)
        local_pixels = bank.num_pixels // ndev

        def local_grads(params, rgb, mask, cameras, step, key):
            """Per-device body: rgb/mask are the LOCAL pixel shard."""
            di = jax.lax.axis_index("data")
            key_idx, key_model = jax.random.split(jax.random.fold_in(key, di))

            def loss_fn(params):
                idx = jax.random.randint(key_idx, (R_local,), 0, local_pixels)
                cam_l, px, py = decode_pixel_index(idx, height, width)
                cam = cam_l + di * images_per_device  # global camera id
                rgb_gt = rgb[idx].astype(jnp.float32) / 255.0
                mask_gt = mask[idx].astype(jnp.float32)
                origins, dirs = generate_rays(cameras, cam, px, py)
                rb = RayBundle(origins=origins, directions=dirs,
                               nears=jnp.zeros((R_local,)),
                               fars=jnp.ones((R_local,)), camera_idx=cam)
                rb = near_far_collider(rb, m.near_plane, m.far_plane)
                anneal = anneal_factor(step, m)
                upd = _prop_update_bool(step, cfg)
                outputs = forward(params, rb, m, key=key_model, train=True,
                                  anneal=anneal,
                                  prop_update=(upd if m.proposal_no_grad_schedule
                                               else None))
                loss, aux = compute_losses(params, outputs, rgb_gt, mask_gt,
                                           cfg, upd.astype(jnp.float32))
                aux["psnr"] = metric_ops.psnr(outputs["rgb"], rgb_gt)
                return loss, aux

            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            # Classical DDP semantics (check_vma=False below): jax.grad
            # yields the LOCAL per-device cotangent and the pmean is the
            # real collective.  (With check_vma=True, JAX 0.9 auto-psums
            # the cotangent of the replicated params — an extra pmean is
            # then a silent no-op that leaves grads SUMMED, the bug the
            # replay oracle in train/debug.py caught — and its vma tracking
            # rejects the prop-schedule lax.cond with custom_vjp residuals
            # ("mismatched varying manual axes").)
            return jax.lax.pmean(grads, "data"), jax.lax.pmean(aux, "data")

        grads, aux = jax.shard_map(
            local_grads, mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(state.params, bank.rgb, bank.mask, bank.cameras, state.step, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if return_grads:
            # test hook: expose the pmean'd grads for the DDP
            # grad-equivalence contract check (train/debug.py)
            aux = dict(aux, grads=grads)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1), aux

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_batch_fn(cfg: TrainConfig):
    """Jitted eval-batch metrics: forward (no grad, eval mode) + losses on a
    random ray batch from the eval pixel bank (≙ VanillaPipeline
    get_eval_loss_dict, SURVEY §2.1)."""
    m = cfg.model
    R = cfg.eval_num_rays_per_batch

    @jax.jit
    def eval_batch(params, bank: PixelBank, key: jax.Array):
        idx = jax.random.randint(key, (R,), 0, bank.num_pixels)
        cam, px, py = decode_pixel_index(idx, bank.height, bank.width)
        rgb_gt = bank.rgb[idx].astype(jnp.float32) / 255.0
        mask_gt = bank.mask[idx].astype(jnp.float32)
        origins, dirs = generate_rays(bank.cameras, cam, px, py)
        rb = RayBundle(origins=origins, directions=dirs,
                       nears=jnp.zeros((R,)), fars=jnp.ones((R,)),
                       camera_idx=cam)
        rb = near_far_collider(rb, m.near_plane, m.far_plane)
        outputs = forward(params, rb, m, key=None, train=False)
        _, aux = compute_losses(params, outputs, rgb_gt, mask_gt, cfg)
        aux["psnr"] = metric_ops.psnr(outputs["rgb"], rgb_gt)
        return aux

    return eval_batch


def make_render_fn(cfg: TrainConfig, background: Optional[str] = None,
                   density_hook=None,
                   mesh: Optional[jax.sharding.Mesh] = None):
    """Chunked full-image renderer ≙ get_outputs_for_camera_ray_bundle
    (fruit_nerf.py:377-404), but the chunk loop is a ``lax.map`` inside one
    jit — each chunk is a fixed-shape slab so there is exactly one compile.

    Returns ``render(params, cameras, cam_index, height, width) -> outputs``
    with image-shaped arrays [H, W, C].  ``density_hook`` is an optional
    (positions, density, hook_arg) -> density post-filter; ``hook_arg`` is a
    traced scalar (e.g. a viewer slider value — no recompile per value).

    ``mesh`` (1-D ``data`` axis): each chunk's rays shard over the mesh —
    params replicated, per-sample field matmuls split across devices, XLA
    gathers the chunk outputs (the render-side analogue of the train step's
    sharding; BASELINE.md's north-star counts train AND render rays/s).
    Requires ``eval_num_rays_per_chunk`` divisible by the mesh size.
    """
    m = cfg.model
    chunk = cfg.eval_num_rays_per_chunk
    if mesh is not None:
        assert chunk % mesh.size == 0, (
            f"eval_num_rays_per_chunk={chunk} must divide over "
            f"{mesh.size} devices")

    def shard_chunk_rays(x):
        # [n_chunks, chunk] index arrays: shard the within-chunk axis so
        # every lax.map step spreads its rays across the mesh
        if mesh is None:
            return x
        spec = jax.sharding.PartitionSpec(None, "data")
        return jax.lax.with_sharding_constraint(
            x, jax.sharding.NamedSharding(mesh, spec))

    @functools.partial(jax.jit, static_argnums=(3, 4))
    def render(params, cameras: Cameras, cam_index, height: int, width: int,
               hook_arg=0.0):
        ys, xs = jnp.meshgrid(jnp.arange(height), jnp.arange(width),
                              indexing="ij")
        xs = xs.reshape(-1)
        ys = ys.reshape(-1)
        n = xs.shape[0]
        n_pad = (-n) % chunk
        xs = jnp.concatenate([xs, jnp.zeros((n_pad,), xs.dtype)])
        ys = jnp.concatenate([ys, jnp.zeros((n_pad,), ys.dtype)])
        cam = jnp.full_like(xs, cam_index)

        def render_chunk(args):
            cx, px, py = args
            origins, dirs = generate_rays(cameras, cx, px, py)
            rb = RayBundle(origins=origins, directions=dirs,
                           nears=jnp.zeros_like(px, jnp.float32),
                           fars=jnp.ones_like(px, jnp.float32),
                           camera_idx=cx)
            rb = near_far_collider(rb, m.near_plane, m.far_plane)
            hook = (None if density_hook is None
                    else lambda p, d: density_hook(p, d, hook_arg))
            out = forward(params, rb, m, key=None, train=False,
                          background=background, density_hook=hook)
            return {k: out[k] for k in
                    ("rgb", "accumulation", "depth", "semantics",
                     "semantics_colormap")}

        shaped = jax.lax.map(render_chunk,
                             (shard_chunk_rays(cam.reshape(-1, chunk)),
                              shard_chunk_rays(xs.reshape(-1, chunk)),
                              shard_chunk_rays(ys.reshape(-1, chunk))))
        out = {}
        for k, v in shaped.items():
            flat = v.reshape(-1, v.shape[-1])[:n]
            out[k] = flat.reshape(height, width, -1)
        return out

    return render

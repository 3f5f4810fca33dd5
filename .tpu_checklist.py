"""Pending on-chip validations, batched to use a healthy tunnel window.

Ordered so the wedge-prone items run LAST (the pallas hash-kernel Mosaic
compile has wedged the remote AOT service before — never let it block the
rest).  Completed items move to the log below.

Done (2026-08-18):
  * remat A/B at the base config: remat=1.335 ms/step, no-remat=0.830
    ms/step (1.61x) on v5e → base + tiny presets now default remat=False
    (models/config.py).

Done (2026-08-18 pm, device_get sync protocol — see benchmarks/README.md):
  * Re-measured everything: all round-1 numbers were dispatch-latency
    illusions.  Hash base step 5.0 s → 2.29 s with the flat-scatter VJP;
    gather/scatter row costs quantified; cropnerf-mxu flagship 35 ms/step
    (117 k rays/s); mxu converges on-chip (PSNR 27.7 @ 2 k steps).
  * packed vs dense layout: 4.61 vs 5.30 s/step (pre-flat-scatter).
  * prop no-grad cond: 5.04 vs 5.30 s/step (dense layout, pre-flat-scatter).

Done (2026-08-19/20, round 3 — benchmarks/ab_round3.py + fresh
profile_components run, all in benchmarks/README.md):
  * VPU mask-reduce costs measured: interlevel fw+bw 0.83 ms, resample
    fw+bw 0.48 ms — NOT bottlenecks.  Prop position-grad chain measured
    free (stop-grad A/B identical).  Field fw+bw 10.6 ms (52% of step).
  * Knob A/B at the 20.5 ms flagship step: remat_props 21.3 (kill),
    fused_tile 2048 20.47 (noise), bwd 512 21.2 (kill), tile >=3072 fwd
    OOMs scoped vmem, CROPNERF_PRNG=rbg 20.51 (tie).  Flagship is at its
    plateau for these levers; knobs kept as config surface.

Done (2026-08-20, round 3):
  * cell-packed dense-level rows: 2256 -> 1390 ms/step (1.62x) on the base
    hash preset (benchmarks/ab_cellpack.py); default ON (HashGridConfig.
    cell_pack), value/grad-identical, verify chain bit-identical losses.
  * bayesrays hessian path on-chip: jax.grad through the pallas-fused
    field density (tile_bwd=512, the round-2 ADVICE fix) compiles and runs
    at a 4096x48 batch on v5e.

Done (2026-08-20 pm, round-3 continuation):
  * mxu-huge full step measured: 218.4 ms/step (75.0 k rays/s) at 16384
    rays x (512+512+64) — faster per-ray than mxu-big (interlevel pair
    count is field x prop samples; see benchmarks/README.md).
  * Tier convergence smokes (300 steps, sphere fixture): mxu-big PSNR
    8.15 -> 24.85, mxu-huge 8.12 -> 22.01.
  * bench.py re-validated: 200.3 k rays/s; dryrun_multichip(8) OK
    (grad-equiv 9.5e-07).

Done (2026-08-20 pm, round-3 continuation 2):
  * Trainer throughput watchdog (--min-rays-per-s) validated ON-CHIP:
    jax.clear_caches() + re-jit mid-run through the axon tunnel is safe
    (the log-window float() sync drains the queue first); 40-step tiny run
    with a forced floor fired both retries, trained through them, loss
    0.79 -> 0.088.

Pending:
  * (closed) hash path: cell-packed dense-level rows (one wide gather instead of 8
    narrow ones on dense levels) — expected ~1.3-1.4x on the 2.29 s hash
    step; worth doing for the parity preset's dignity, not the headline.
  * mxu vs hash PSNR parity on real 3DCotton data (needs the dataset).
  * (closed 2026-08-21) bench.py with MFU on-chip: 200.0 k rays/s,
    20.47 ms/step, 27.84 TFLOP/s = 34.8% of the measured 80 TFLOP/s peak.
  * (closed 2026-08-21) dress rehearsal on-chip (benchmarks/
    dress_rehearsal_results.json): probe 100%/100% at production
    thresholds (medians 2128/28.4), 10/10 superclusters, count 13 at
    reference-exact defaults / 11 exact with attach_unlabeled — occluder-
    interior semantic leak root-caused, see benchmarks/README.md.
Done (2026-08-21, round 5, healthy tunnel window):
  * psnr_parity CONTROL arm (cropnerf@mxu-opt, sphere, 2000 steps):
    final 22.08 — decomposition: +1.8 dB optimizer regime, +3.1 dB field
    swap (merged into psnr_parity_results.json; benchmarks/README).
  * redesigned dress fixture: EXACT count 11/11 at untouched reference
    defaults, no attach_unlabeled; occluder logit leak 0.0%; projection
    402 s for 1200 jobs under the static bucket ladder (5 programs).

Done (2026-08-21, round 5 continuation — all previously-pending items):
  * orchard 3-arm psnr_parity study: flagship 19.82 vs hash 19.04 vs
    mxu-opt control 12.18 @2000 (psnr_parity_orchard_results.json;
    scene-dependent decomposition analysis in benchmarks/README.md).
  * ab_propshape.py: 2x128 faster + better on sphere but -2.0 dB on
    orchard → KILLED, 3x64 stays; 3x128 noted as a quality-preset
    candidate (+2.3 dB sphere, +26% step time).
  * mfu_ceiling.py: square peak re-measured 100.7 TFLOP/s; per-shape
    ceilings trunk256=43.6 / prop64=12.6; fused field EXCEEDS its
    unfused chain ceiling (54.1) → roofline settled, no 3x on the table.
  * bench.py --breakdown with per-component TFLOP/s: landed + run.
  * export-stage probe: root cause was the K=total//8 survivor budget
    demoting dense chunks to the host fallback; K now total//2 with loud
    overflow notices; rerun export 10 s, bit-identical clouds.
  * leak-vs-coverage study (occluders-in-AABB, 5 rings x 90 cams):
    elevation coverage causally controls the occluder leak (commits
    633ccbb, 6ec3699; analysis folded into benchmarks/README.md).

Pending (opportunistic, healthy-tunnel-only):
  * nothing queued.  (bench.py re-run twice at round close: 199.7 and
    200.1 k rays/s, 2.0x baseline, 79.3% of per-shape SOL — tunnel
    healthy, executables fast.)
  * (closed 2026-08-20) bench_export speedup re-measured with both arms
    warm: 11.0x (was 17.2x with a dense-side recompile); compact path
    400 ms / 21.0 M queries/s.  benchmarks/README.md updated.
"""
import time, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

# 1. flagship 600-step convergence mini-smoke (preloaded data)
from cropnerf_tpu.models.config import PRESETS
from cropnerf_tpu.train.state import create_train_state
from cropnerf_tpu.train.step import make_train_step
from cropnerf_tpu.data.databank import build_pixel_bank
from cropnerf_tpu.core.cameras import Cameras
try:
    dd = np.load("/root/repo/.sphere_data.npz")
    images, masks, c2w, fx = dd["images"], dd["masks"], dd["c2w"], dd["fx"]
    n, h, w = images.shape[:3]
    cams = Cameras(c2w=jnp.asarray(c2w), fx=jnp.asarray(fx), fy=jnp.asarray(fx),
                   cx=jnp.full((n,), w/2.0), cy=jnp.full((n,), h/2.0),
                   width=jnp.full((n,), w, jnp.int32),
                   height=jnp.full((n,), h, jnp.int32))
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
            if first_psnr is None:
                first_psnr = p
            print(f"step {i}: loss={float(m['loss']):.4f} psnr={p:.2f} "
                  f"sem={float(m['semantics_loss']):.4f} "
                  f"t={time.perf_counter()-t0:.1f}s", flush=True)
    print("CONVERGENCE", "OK" if float(m["psnr"]) > first_psnr + 5 else "WEAK",
          flush=True)
except Exception as e:
    print("convergence smoke FAILED:", str(e)[:300], flush=True)

# 2. pallas transmittance kernel
from cropnerf_tpu.ops.pallas.transmittance import render_weights_pallas
from cropnerf_tpu.ops.render import render_weights
d = jax.random.uniform(jax.random.PRNGKey(2), (4096, 512)) * 5
dl = jnp.ones((4096, 512)) * 0.01
try:
    wp = render_weights_pallas(d, dl, tile_r=256)
    wx = render_weights(d, dl)
    ok = bool(jnp.allclose(wp, wx, rtol=1e-4, atol=1e-6))
    print(f"pallas transmittance COMPILES on TPU, matches xla: {ok}",
          flush=True)
except Exception as e:
    print("pallas transmittance FAILED:", str(e)[:300], flush=True)

# 3. LAST (wedge-prone): pallas hash kernel Mosaic compile + A/B vs XLA
from cropnerf_tpu.ops.hashgrid import (hashgrid_encode, hashgrid_init,
                                       level_resolutions)
from cropnerf_tpu.ops.pallas.hash_encode import hashgrid_encode_pallas
table = hashgrid_init(jax.random.PRNGKey(0), 16, 2, 19)
res = level_resolutions(16, 16, 2048)
N = 131072
pos = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
try:
    f_p = jax.jit(lambda t, p: jnp.sum(
        hashgrid_encode_pallas(t, p, res, 1024, False) ** 2))
    f_x = jax.jit(lambda t, p: jnp.sum(hashgrid_encode(t, p, res) ** 2))
    vp = float(f_p(table, pos)); vx = float(f_x(table, pos))
    print(f"pallas hash COMPILES on TPU: pallas={vp:.4f} xla={vx:.4f} "
          f"match={abs(vp - vx) / max(abs(vx), 1e-9) < 1e-3}", flush=True)
    for name, f in (("xla", f_x), ("pallas", f_p)):
        f(table, pos).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            o = f(table, pos)
        o.block_until_ready()
        print(f"hash {name}: {(time.perf_counter() - t0) / 20 * 1e3:.3f} ms",
              flush=True)
except Exception as e:
    print("pallas hash on TPU FAILED:", str(e)[:300], flush=True)

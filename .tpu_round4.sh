#!/bin/bash
# Round-4 TPU batch — run when the tunnel is healthy (probe first:
#   timeout 55 python -c "import jax,jax.numpy as jnp; print((jnp.ones((8,8))+1).sum())"
# ). Ordered cheapest-first so a mid-run wedge loses the least.
set -x
cd /root/repo

# 1. canonical bench with the new MFU accounting (~2 min)
timeout 900 python bench.py 2>bench_r04.stderr | tee bench_r04.json

# 2. dress rehearsal at production thresholds, full projection (~15-25 min)
timeout 3600 python -u benchmarks/dress_rehearsal.py --steps 3000 \
    --out benchmarks/dress_rehearsal_results.json \
    --work-dir /tmp/dress_tpu 2>&1 | tail -40

# 3. PSNR parity, sphere scene, three arms (mxu ~1 min; hash arms ~45 min
#    each at 1390 ms/step x 2000 steps)
timeout 10800 python -u benchmarks/psnr_parity.py --steps 2000 \
    --presets cropnerf-mxu,cropnerf@mxu-opt \
    --scene sphere --out benchmarks/psnr_parity_sphere_r04.json 2>&1 | tail -20

# 4. PSNR parity, harder orchard scene (texture+occlusion), three arms
timeout 14400 python -u benchmarks/psnr_parity.py --steps 2000 \
    --presets cropnerf-mxu,cropnerf,cropnerf@mxu-opt \
    --scene orchard --out benchmarks/psnr_parity_orchard_r04.json 2>&1 | tail -20

import time, sys
sys.path.insert(0, "/root/repo")
from cropnerf_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from cropnerf_tpu.ops.hashgrid import hashgrid_encode, hashgrid_init, level_resolutions
table = hashgrid_init(jax.random.PRNGKey(0), 16, 2, 19)
res = level_resolutions(16, 16, 2048)
pos = jax.random.uniform(jax.random.PRNGKey(1), (1_572_864, 3))
for mode in ("hash", "auto"):
    f = jax.jit(lambda t, p, m=mode: jnp.sum(hashgrid_encode(t, p, res, hash_mode=m)**2))
    g = jax.jit(jax.grad(lambda t, p, m=mode: jnp.sum(hashgrid_encode(t, p, res, hash_mode=m)**2)))
    f(table, pos).block_until_ready(); g(table, pos).block_until_ready()
    t0=time.perf_counter()
    for _ in range(10): o=f(table, pos)
    o.block_until_ready(); fwd=(time.perf_counter()-t0)/10
    t0=time.perf_counter()
    for _ in range(10): o=g(table, pos)
    o.block_until_ready(); bwd=(time.perf_counter()-t0)/10
    print(f"hash_mode={mode}: fwd {fwd*1e3:.3f} ms  grad {bwd*1e3:.3f} ms", flush=True)

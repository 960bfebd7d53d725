import time, sys
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "unsafe_rbg")
from llm_tpu.ops.pallas_qmm import qmm_pallas

L, K, N, B = 32, 4096, 6144, 8
key = jax.random.PRNGKey(0)
qs = jax.random.randint(key, (L, K//2, N), 0, 256, jnp.int32).astype(jnp.uint8)
sc = jax.random.uniform(key, (L, K//32, N), jnp.float32).astype(jnp.bfloat16)
mn = jax.random.uniform(key, (L, K//32, N), jnp.float32).astype(jnp.bfloat16)
x = jax.random.normal(key, (B, K), jnp.bfloat16)

def bench(fn, n=50):
    jax.block_until_ready(fn()); jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3

f_un = jax.jit(lambda: qmm_pallas(x, qs[0], sc[0], None, gs=32, zp=0, layout="p4", tile_n=2048, tile_k=2048))
f_unm = jax.jit(lambda: qmm_pallas(x, qs[0], sc[0], mn[0], gs=32, zp=0, layout="p4", tile_n=2048, tile_k=2048))
li = jnp.zeros((1,), jnp.int32)
f_st = jax.jit(lambda: qmm_pallas(x, qs, sc, mn, gs=32, zp=0, layout="p4", tile_n=2048, tile_k=2048, lidx=li))
f_st0 = jax.jit(lambda: qmm_pallas(x, qs, sc, None, gs=32, zp=0, layout="p4", tile_n=2048, tile_k=2048, lidx=li))

mb = (qs[0].size + sc[0].size*2 + mn[0].size*2) / 2**20
for name, f in [("unstacked", f_un), ("unstacked+mins", f_unm), ("stacked+mins", f_st), ("stacked", f_st0)]:
    t0 = time.time(); ms = bench(f)
    print(f"{name}: {ms:.3f} ms  ({mb/1024/(ms/1e3):.0f} GB/s) [total {time.time()-t0:.0f}s]", file=sys.stderr, flush=True)

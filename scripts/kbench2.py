"""Composition experiment: 4-matmul pseudo-layer chain vs individual kernels.

If the composed chain's time per layer matches the e2e-implied ~300us,
per-kernel measurements in isolated fori_loops are distorted; if it matches
the sum of individual times (~1.5ms), the e2e number needs re-derivation.
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "unsafe_rbg")

sys.path.insert(0, "/root/repo")

from llm_tpu.gguf.constants import GGMLType  # noqa: E402
from llm_tpu.models.synthetic import device_synthetic_qtensor  # noqa: E402
from llm_tpu.ops.qmatmul import qmm  # noqa: E402

B = 8
E, F = 4096, 14336
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
wqkv = device_synthetic_qtensor(ks[0], 6144, E, GGMLType.Q4_K, jnp.bfloat16)
wout = device_synthetic_qtensor(ks[1], E, E, GGMLType.Q4_K, jnp.bfloat16)
wgu = device_synthetic_qtensor(ks[2], 2 * F, E, GGMLType.Q4_K, jnp.bfloat16)
wdown = device_synthetic_qtensor(ks[3], E, F, GGMLType.Q4_K, jnp.bfloat16)
x0 = jax.random.normal(ks[4], (B, E), jnp.bfloat16) * 0.01

MB = (6144 * E + E * E + 2 * F * E + F * E) * 0.625 / 1e6


def layer(x):
    a = qmm(x, wqkv, out_dtype=jnp.bfloat16)[:, :E]
    b = qmm(a, wout, out_dtype=jnp.bfloat16)
    gu = qmm(b, wgu)
    g, u = gu[:, :F], gu[:, F:]
    cur = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
    return qmm(cur, wdown, out_dtype=jnp.bfloat16)


def timed(fn, x0, reps, label, mb):
    def loop(x, n):
        def body(_, x):
            y = fn(x)
            return (x0 + y * 1e-6).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, x)

    lj = jax.jit(loop, static_argnums=(1,))
    t0 = time.time()
    jax.block_until_ready(lj(x0, reps))
    print(f"{label}: compile+warm {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    jax.block_until_ready(lj(x0, reps))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:12s} {dt*1e6:8.1f} us  {mb*1e-3/dt:7.1f} GB/s")
    return dt


reps = 100
t_layer = timed(layer, x0, reps, "layer-chain", MB)
t_qkv = timed(lambda x: qmm(x, wqkv, out_dtype=jnp.bfloat16)[:, :E],
              x0, reps, "qkv", 6144 * E * 0.625 / 1e6)
t_out = timed(lambda x: qmm(x, wout, out_dtype=jnp.bfloat16),
              x0, reps, "out", E * E * 0.625 / 1e6)
print(f"sum-of-parts estimate incl gu/down from kbench: "
      f"{(t_qkv + t_out)*1e6:.0f} + 585 + 320 us", file=sys.stderr)

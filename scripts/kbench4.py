"""E2E decode-step decomposition: per-layer slope + fixed intercept.

Builds the flagship-geometry model at two depths and times the on-device
decode loop; the slope gives true per-layer cost (matmuls + attention +
glue), the intercept gives per-step fixed cost (embed + head + sampling +
loop overhead). Compares the slope against the pure-matmul budget measured
by kbench3 (136.3 MB @ ~600 GB/s = 227 us) to expose the non-matmul share.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "unsafe_rbg")

sys.path.insert(0, "/root/repo")

import os  # noqa: E402

os.environ.setdefault("LLM_TPU_TILE_TABLE",
                      "/root/repo/tiles_v5e_llama3_8b.json")

from llm_tpu.gguf.constants import GGMLType  # noqa: E402
from llm_tpu.models.synthetic import LLAMA3_8B, make_synthetic_model  # noqa: E402
from llm_tpu.models.transformer import forward  # noqa: E402

S = 1024
N_GEN = 64


def step_time(n_layers: int) -> float:
    geo = dict(LLAMA3_8B)
    geo["n_layers"] = n_layers
    t0 = time.time()
    params, cfg = make_synthetic_model(
        qtype=GGMLType.Q4_K, on_device=True, scales_dtype=jnp.bfloat16,
        scan=False, **geo)
    jax.block_until_ready(params["tok_embd"].qs)
    print(f"L={n_layers}: build {time.time()-t0:.1f}s", file=sys.stderr)

    kk = tuple(jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim), jnp.bfloat16)
               for _ in range(cfg.n_layers))
    vv = tuple(jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim_v), jnp.bfloat16)
               for _ in range(cfg.n_layers))
    cell_idx = jnp.arange(S, dtype=jnp.int32)

    def decode_loop(params, kk, vv, tok0, n_steps):
        def body(i, carry):
            tok, kk, vv = carry
            pos = 16 + i
            cbits = (cell_idx <= pos).astype(jnp.uint32)
            logits, nk, nv, _ = forward(
                params, cfg, list(kk), list(vv), tok[None],
                pos[None].astype(jnp.int32), jnp.zeros(1, jnp.int32),
                pos[None].astype(jnp.int32), cell_idx, cbits,
                jnp.zeros(1, jnp.int32))
            return (jnp.argmax(logits[0]).astype(jnp.int32),
                    tuple(nk), tuple(nv))
        return jax.lax.fori_loop(0, n_steps, body, (tok0, kk, vv))

    dj = jax.jit(decode_loop, static_argnums=(4,), donate_argnums=(1, 2))
    t0 = time.time()
    tok, kk, vv = dj(params, kk, vv, jnp.zeros((), jnp.int32), N_GEN)
    jax.block_until_ready(tok)
    print(f"L={n_layers}: warmup {time.time()-t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        tok, kk, vv = dj(params, kk, vv, tok, N_GEN)
        jax.block_until_ready(tok)
        times.append((time.perf_counter() - t0) / N_GEN)
    dt = float(np.min(times))
    print(f"L={n_layers}: {dt*1e3:.3f} ms/step ({1/dt:.1f} t/s)")
    del params, kk, vv
    return dt


t8 = step_time(8)
t32 = step_time(32)
per_layer = (t32 - t8) / 24
fixed = t8 - 8 * per_layer
print(f"per-layer {per_layer*1e6:.1f} us | fixed {fixed*1e6:.1f} us")
print(f"matmul budget/layer @600GB/s = 227 us -> non-matmul/layer "
      f"{per_layer*1e6-227:.0f} us")
print(f"head+embed budget @600GB/s = 575 us -> other fixed "
      f"{fixed*1e6-575:.0f} us")

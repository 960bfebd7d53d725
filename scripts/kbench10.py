"""Round-5: decompose the head-major decode regression (tg128 102 -> 66).

Per-layer loop path at LLAMA3_8B geometry, S=1024, bf16 KV, 32-step
fori chains; variants isolate the KV scatter and the flash kernel:

  full       current code path
  nowrite    _kv_write patched to identity (no scatter)
  dus        _kv_write via per-token dynamic_update_slice on axis 1
  noflash    LLM_TPU_FLASH=0 (unfused attention fallback)
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import llm_tpu.models.transformer as tr  # noqa: E402
from llm_tpu.models.synthetic import LLAMA3_8B, make_synthetic_model  # noqa: E402


def _kv_write_dus(cache, idx, val):
    """Decode-oriented write: per-token dynamic_update_slice along the S
    axis of the head-major cache. Drop semantics preserved by writing the
    existing row back when idx is out of bounds."""
    t = val.shape[0]
    if isinstance(cache, tuple):
        return tr._kv_write(cache, idx, val)  # q8: keep scatter for now
    n = cache.shape[1]
    v = val.astype(cache.dtype)
    for i in range(t):
        row = v[i][:, None, :]  # (H, 1, D)
        ok = idx[i] < n
        j = jnp.minimum(idx[i], n - 1)
        cur = jax.lax.dynamic_slice_in_dim(cache, j, 1, axis=1)
        upd = jnp.where(ok, row, cur)
        cache = jax.lax.dynamic_update_slice_in_dim(cache, upd, j, axis=1)
    return cache


def run(variant, n_steps=32, reps=3):
    if variant == "noflash":
        os.environ["LLM_TPU_FLASH"] = "0"
    else:
        os.environ.pop("LLM_TPU_FLASH", None)
    orig = tr._kv_write
    if variant == "nowrite":
        tr._kv_write = lambda cache, idx, val: cache
    elif variant == "dus":
        tr._kv_write = _kv_write_dus
    try:
        from llm_tpu.gguf.constants import GGMLType

        params, cfg = make_synthetic_model(
            qtype=GGMLType.Q4_K, on_device=True,
            scales_dtype=jnp.bfloat16, scan=False, **LLAMA3_8B)
        jax.block_until_ready(params["tok_embd"].qs)
        S = 1024
        cell_idx = jnp.arange(S, dtype=jnp.int32)
        kvk = tuple(jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim), jnp.bfloat16)
                    for _ in range(cfg.n_layers))
        kvv = tuple(jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim_v),
                              jnp.bfloat16) for _ in range(cfg.n_layers))

        def decode_loop(params, kv_k, kv_v, tok0, n):
            def body(i, carry):
                tok, kk, vv = carry
                pos = 16 + i
                cbits = (cell_idx <= pos).astype(jnp.uint32)
                logits, nk, nv, _ = tr.forward(
                    params, cfg, list(kk), list(vv), tok[None],
                    pos[None].astype(jnp.int32), jnp.zeros(1, jnp.int32),
                    pos[None].astype(jnp.int32), cell_idx, cbits,
                    jnp.zeros(1, jnp.int32))
                return (jnp.argmax(logits[0]).astype(jnp.int32),
                        tuple(nk), tuple(nv))
            return jax.lax.fori_loop(0, n, body, (tok0, kv_k, kv_v))

        dj = jax.jit(decode_loop, static_argnums=(4,), donate_argnums=(1, 2))
        tok = jnp.zeros((), jnp.int32)
        t0 = time.time()
        tok, kvk, kvv = dj(params, kvk, kvv, tok, n_steps)
        jax.block_until_ready(tok)
        compile_s = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            tok, kvk, kvv = dj(params, kvk, kvv, tok, n_steps)
            jax.block_until_ready(tok)
            ts.append(time.perf_counter() - t0)
        dt = float(np.mean(ts)) / n_steps
        print(f"{variant:8s}: {dt*1e3:7.3f} ms/step ({1/dt:6.1f} t/s) "
              f"[compile {compile_s:.0f}s]", flush=True)
    finally:
        tr._kv_write = orig
        os.environ.pop("LLM_TPU_FLASH", None)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    for v in sys.argv[1:] or ("full", "nowrite", "dus"):
        run(v)

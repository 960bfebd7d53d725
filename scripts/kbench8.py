"""Round-5 head-major flash-decode validation + timing on hardware.

1) kernel timing at 8B geometry (T=1, H=32, Hkv=8, D=128) across S,
   dense bf16 and q8 cache — the flash-decode bandwidth row that
   round 4 measured at 185 GB/s with the cell-major layout.
2) e2e logit parity: synthetic Q4_K model, LLM_TPU_FLASH=1 vs =0.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from llm_tpu.ops.attention import build_attn_bias  # noqa: E402
from llm_tpu.ops.pallas_attn import (expand_tables, flash_decode,  # noqa: E402
                                     rope_companion)
from llm_tpu.ops.rope import (ROPE_TYPE_NEOX, RopeParams,  # noqa: E402
                              apply_rope, rope_angles)

H, HKV, D = 32, 8, 128
T = 1


def time_decode(S, q8=False, sblk=1024, reps=50):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(HKV, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(HKV, S, D)), jnp.bfloat16)
    if q8:
        def mk(x):
            xf = np.asarray(x, np.float32)
            sc = np.abs(xf).max(-1, keepdims=True) / 127.0
            qv = np.clip(np.round(xf / np.maximum(sc, 1e-9)), -127, 127)
            return (jnp.asarray(qv.astype(np.int8)),
                    jnp.asarray(sc, jnp.bfloat16))
        k = mk(k)
        v = mk(v)
    tok_pos = jnp.asarray([S - 1], jnp.int32)
    cell_pos = jnp.asarray(np.arange(S), jnp.int32)
    cbits = jnp.ones(S, jnp.uint32)
    rp = RopeParams(n_dims=D, mode=ROPE_TYPE_NEOX)
    cos_t, sin_t = rope_angles(tok_pos, rp)
    cos_c, sin_c = rope_angles(cell_pos, rp)
    bias = build_attn_bias(tok_pos, jnp.zeros(T, jnp.int32), cell_pos, cbits)
    qro = apply_rope(q.astype(jnp.float32), cos_t, sin_t, ROPE_TYPE_NEOX, D)
    cf, sf = expand_tables(cos_c, sin_c, ROPE_TYPE_NEOX, D)
    cf = cf.astype(jnp.bfloat16)
    sf = sf.astype(jnp.bfloat16)
    qr = rope_companion(qro, ROPE_TYPE_NEOX)

    fn = jax.jit(lambda *a: flash_decode(*a, scale=D ** -0.5, sblk=sblk))
    out = fn(qro, qr, k, v, cf, sf, bias)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(qro, qr, k, v, cf, sf, bias)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    nbytes = (k[0].size + k[1].size * 2 + v[0].size + v[1].size * 2
              if q8 else k.size * 2 + v.size * 2)
    nbytes += (cf.size + sf.size) * 2
    gbs = nbytes / dt / 1e9
    print(f"S={S:5d} q8={int(q8)} sblk={sblk}: {dt*1e6:7.1f} us, "
          f"{gbs:6.1f} GB/s")
    return gbs


def e2e_parity():
    import os

    from llm_tpu.gguf.constants import GGMLType
    from llm_tpu.models.synthetic import make_synthetic_model
    from llm_tpu.models.transformer import forward

    params, cfg = make_synthetic_model(
        n_embd=512, n_layers=2, n_heads=8, n_kv_heads=2, n_ff=1024,
        vocab=512, qtype=GGMLType.Q4_K, fuse=True)
    Tt, S = 4, 256
    tok = jnp.asarray(np.arange(Tt) % 512, jnp.int32)
    pos = jnp.arange(Tt, dtype=jnp.int32)
    seq = jnp.zeros(Tt, jnp.int32)
    cpos = jnp.concatenate([pos, jnp.zeros(S - Tt, jnp.int32)])
    cbits = jnp.asarray((np.arange(S) < Tt).astype(np.uint32))
    oidx = jnp.arange(Tt, dtype=jnp.int32)
    kv_k = [jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim), jnp.bfloat16)
            for _ in range(cfg.n_layers)]
    kv_v = [jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim_v), jnp.bfloat16)
            for _ in range(cfg.n_layers)]
    outs = {}
    for flag in ("1", "0"):
        os.environ["LLM_TPU_FLASH"] = flag
        logits, _, _, _ = forward(params, cfg, kv_k, kv_v, tok, pos, seq,
                                  pos, cpos, cbits, oidx)
        outs[flag] = np.asarray(logits)
    os.environ.pop("LLM_TPU_FLASH", None)
    err = np.abs(outs["1"] - outs["0"]).max()
    print(f"e2e flash-vs-unfused max|dlogit| = {err:.5f}")
    assert err < 0.15, err


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}, {jax.devices()}")
    for S in (1024, 4096):
        for sblk in (512, 1024):
            time_decode(S, q8=False, sblk=sblk)
    time_decode(4096, q8=True, sblk=1024)
    e2e_parity()
    print("ok")

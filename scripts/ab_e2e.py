"""Focused end-to-end decode/prefill A/B for kernel changes.

Builds the synthetic Llama-3-8B Q4_K model (per-layer FAST path), runs
the bare fori_loop tg128 and one pp512, prints both. Env toggles select
the variant under test (e.g. LLM_TPU_GDOT=0/1). ~6 min per run on the
tunneled v5e, dominated by compiles (persistent-cached across runs).

Usage: LLM_TPU_GDOT=0 python scripts/ab_e2e.py [--tg 128] [--pp 512]
"""

import argparse
import os
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

_TILES = "/root/repo/tiles_v5e_llama3_8b.json"
if os.path.exists(_TILES) and not os.environ.get("LLM_TPU_TILE_TABLE") \
        and os.environ.get("LLM_TPU_AB_TILES", "1") != "0":
    os.environ["LLM_TPU_TILE_TABLE"] = _TILES
    _TG = _TILES.replace(".json", "_gdot.json")
    if os.path.exists(_TG) and not os.environ.get("LLM_TPU_TILE_TABLE_GDOT"):
        os.environ["LLM_TPU_TILE_TABLE_GDOT"] = _TG


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tg", type=int, default=128)
    ap.add_argument("--pp", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}  GDOT={os.environ.get('LLM_TPU_GDOT', '1')}"
          f" TILES={os.environ.get('LLM_TPU_TILE_TABLE', '-')}",
          file=sys.stderr)

    from llm_tpu.gguf.constants import GGMLType
    from llm_tpu.models.synthetic import LLAMA3_8B, make_synthetic_model
    from llm_tpu.models.transformer import forward

    S = 1024
    t0 = time.time()
    params, cfg = make_synthetic_model(
        qtype=GGMLType.Q4_K, on_device=True, scales_dtype=jnp.bfloat16,
        scan=False, **LLAMA3_8B)
    jax.block_until_ready(params["layers"][0]["attn_qkv_fused"].qs)
    print(f"build: {time.time()-t0:.1f}s", file=sys.stderr)

    kvk = tuple(jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim), jnp.bfloat16)
                for _ in range(cfg.n_layers))
    kvv = tuple(jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim_v), jnp.bfloat16)
                for _ in range(cfg.n_layers))
    cell_idx = jnp.arange(S, dtype=jnp.int32)

    def decode_loop(params, kk, vv, tok0, n_steps):
        def body(i, carry):
            tok, kk, vv = carry
            pos = 16 + i
            cbits = (cell_idx <= pos).astype(jnp.uint32)
            logits, nk, nv, _ = forward(
                params, cfg, list(kk), list(vv),
                tok[None], pos[None].astype(jnp.int32),
                jnp.zeros(1, jnp.int32), pos[None].astype(jnp.int32),
                cell_idx, cbits, jnp.zeros(1, jnp.int32),
            )
            return (jnp.argmax(logits[0]).astype(jnp.int32),
                    tuple(nk), tuple(nv))
        return jax.lax.fori_loop(0, n_steps, body, (tok0, kk, vv))

    dj = jax.jit(decode_loop, static_argnums=(4,), donate_argnums=(1, 2))
    t0 = time.time()
    tok, kvk, kvv = dj(params, kvk, kvv, jnp.zeros((), jnp.int32), args.tg)
    jax.block_until_ready(tok)
    print(f"decode warmup(+compile): {time.time()-t0:.1f}s", file=sys.stderr)
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        tok, kvk, kvv = dj(params, kvk, kvv, tok, args.tg)
        _ = int(tok)  # host fetch sync
        ts.append(time.perf_counter() - t0)
    tg = args.tg / float(np.mean(ts))
    print(f"tg{args.tg} (loop): {tg:.2f} t/s "
          f"(times {['%.3f' % t for t in ts]})")

    if args.pp:
        def prefill(params, kk, vv, tokens):
            T = tokens.shape[0]
            pos = jnp.arange(T, dtype=jnp.int32)
            cbits = (cell_idx < T).astype(jnp.uint32)
            logits, nk, nv, _ = forward(
                params, cfg, list(kk), list(vv), tokens, pos,
                jnp.zeros(T, jnp.int32), pos, cell_idx, cbits,
                jnp.asarray([T - 1], jnp.int32))
            return jnp.argmax(logits[0]).astype(jnp.int32), nk, nv

        pj = jax.jit(prefill, donate_argnums=(1, 2))
        toks = jnp.asarray(np.arange(args.pp) % cfg.vocab_size, jnp.int32)
        kvk2 = tuple(jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim),
                               jnp.bfloat16) for _ in range(cfg.n_layers))
        kvv2 = tuple(jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim_v),
                               jnp.bfloat16) for _ in range(cfg.n_layers))
        t0 = time.time()
        tokp, kvk2, kvv2 = pj(params, kvk2, kvv2, toks)
        _ = int(tokp)
        print(f"pp warmup(+compile): {time.time()-t0:.1f}s", file=sys.stderr)
        pts = []
        for _ in range(args.reps):
            kvk2 = tuple(jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim),
                                   jnp.bfloat16)
                         for _ in range(cfg.n_layers))
            kvv2 = tuple(jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim_v),
                                   jnp.bfloat16)
                         for _ in range(cfg.n_layers))
            t0 = time.perf_counter()
            tokp, kvk2, kvv2 = pj(params, kvk2, kvv2, toks)
            _ = int(tokp)
            pts.append(time.perf_counter() - t0)
        print(f"pp{args.pp}: {args.pp/float(np.min(pts)):.1f} t/s "
              f"(times {['%.3f' % t for t in pts]})")


if __name__ == "__main__":
    main()

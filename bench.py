"""Benchmark: Llama-3-8B-geometry Q4_K decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N, "extra": {...}}

vs_baseline anchors to the reference's closest published number: tg128 of a
Q4_K_M 7B-class model on a CUDA GPU = 120.60 t/s
(/root/reference/tools/llama-bench/README.md:168; see BASELINE.md).

Three measurements (mirroring llama-bench's pp/tg grid + server TTFT):
  * tg128 (headline): on-device greedy decode loop — pure chip throughput.
  * pp512: prefill throughput through the same forward (one program).
  * engine tg128 + TTFT p50: through Context.decode with host-side cell
    management and argmax sampling — includes one host<->device round trip
    per token, so on a tunneled TPU it is dominated by link latency; the
    per-step host overhead is reported separately (rtt_ms).

The model is synthetic (random Q4_K planes generated on-device in ONE jit
— identical compute/memory shape to a loaded checkpoint, no multi-GiB
host upload).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# synthetic-weight generation: threefry is very slow for multi-GB outputs on
# TPU; the hardware RNG is fine for benchmark weights
jax.config.update("jax_default_prng_impl", "unsafe_rbg")

# measured tile table for the flagship geometry (tools/autotune.py on v5e);
# per-shape wins are 1-10% over the divisibility heuristic
_TILES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "tiles_v5e_llama3_8b.json")
if os.path.exists(_TILES) and not os.environ.get("LLM_TPU_TILE_TABLE"):
    os.environ["LLM_TPU_TILE_TABLE"] = _TILES


def GGMLType_Q4K():
    from llm_tpu.gguf.constants import GGMLType

    return GGMLType.Q4_K


def build(cfg_kw, scales_dtype=jnp.bfloat16):
    from llm_tpu.gguf.constants import GGMLType
    from llm_tpu.models.synthetic import make_synthetic_model

    params, cfg = make_synthetic_model(
        qtype=GGMLType.Q4_K, on_device=True, scales_dtype=scales_dtype,
        scan=True, **cfg_kw
    )
    return params, cfg


def _require_device(timeout_s: int = 600):
    """Fail fast (rc=3) if device init hangs — a dead tunnel would
    otherwise block the harness forever. Compiles are NOT under this
    timeout; only jax.devices()."""
    import threading

    got = []
    t = threading.Thread(target=lambda: got.append(jax.devices()), daemon=True)
    t.start()
    t.join(timeout_s)
    if not got:
        print(f"error: no JAX device after {timeout_s}s "
              "(tunnel down?)", file=sys.stderr)
        os._exit(3)
    print(f"devices: {got[0]}", file=sys.stderr)


def main():
    from llm_tpu.models.synthetic import LLAMA3_8B
    from llm_tpu.models.transformer import forward

    _require_device()

    small = "--small" in sys.argv  # CI / smoke mode
    geo = dict(n_embd=512, n_layers=4, n_heads=8, n_kv_heads=8, n_ff=1024,
               vocab=2048, head_dim=64) if small else LLAMA3_8B

    S = 512 if small else 1024
    N_PREFILL = 16
    N_GEN = 128
    PP = 256 if small else 512

    t0 = time.time()
    params, cfg = build(geo)
    jax.block_until_ready(params["tok_embd"].qs)
    t_build = time.time() - t0
    print(f"build: {t_build:.1f}s", file=sys.stderr)

    kv_k = jnp.zeros((cfg.n_layers, S, cfg.n_kv_heads, cfg.head_dim),
                     jnp.bfloat16)
    kv_v = jnp.zeros((cfg.n_layers, S, cfg.n_kv_heads, cfg.head_dim_v),
                     jnp.bfloat16)

    cell_idx = jnp.arange(S, dtype=jnp.int32)

    def prefill(params, kv_k, kv_v, tokens):
        T = tokens.shape[0]
        pos = jnp.arange(T, dtype=jnp.int32)
        seq = jnp.zeros(T, jnp.int32)
        cbits = (cell_idx < T).astype(jnp.uint32)
        logits, nk, nv, _ = forward(
            params, cfg, kv_k, kv_v, tokens, pos, seq, pos,
            cell_idx, cbits, jnp.asarray([T - 1], jnp.int32),
        )
        return jnp.argmax(logits[0]).astype(jnp.int32), nk, nv

    def decode_loop(params, kv_k, kv_v, tok0, n_steps):
        def body(i, carry):
            tok, kk, vv = carry
            pos = N_PREFILL + i
            cbits = (cell_idx <= pos).astype(jnp.uint32)
            logits, nk, nv, _ = forward(
                params, cfg, kk, vv,
                tok[None], pos[None].astype(jnp.int32), jnp.zeros(1, jnp.int32),
                pos[None].astype(jnp.int32), cell_idx, cbits,
                jnp.zeros(1, jnp.int32),
            )
            return jnp.argmax(logits[0]).astype(jnp.int32), nk, nv

        return jax.lax.fori_loop(0, n_steps, body, (tok0, kv_k, kv_v))

    prefill_j = jax.jit(prefill, donate_argnums=(1, 2))
    decode_j = jax.jit(decode_loop, static_argnums=(4,), donate_argnums=(1, 2))

    tokens = jnp.asarray(np.arange(N_PREFILL) % cfg.vocab_size, jnp.int32)

    t0 = time.time()
    tok, kv_k, kv_v = prefill_j(params, kv_k, kv_v, tokens)
    jax.block_until_ready(tok)
    print(f"prefill(+compile): {time.time()-t0:.1f}s", file=sys.stderr)

    # warmup decode (compile) — same static n_steps as the timed reps
    t0 = time.time()
    tok, kv_k, kv_v = decode_j(params, kv_k, kv_v, tok, N_GEN)
    jax.block_until_ready(tok)
    print(f"decode warmup(+compile): {time.time()-t0:.1f}s", file=sys.stderr)

    reps = 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        tok, kv_k, kv_v = decode_j(params, kv_k, kv_v, tok, N_GEN)
        jax.block_until_ready(tok)
        times.append(time.perf_counter() - t0)
    tg_scan = N_GEN / float(np.mean(times))
    sigma = float(np.std([N_GEN / t for t in times]))
    print(f"tg{N_GEN} (scan): {tg_scan:.2f} ± {sigma:.2f} t/s (times: "
          f"{['%.3f' % t for t in times]})", file=sys.stderr)

    # -- decode via the unrolled per-layer path (XLA can overlap weight
    # streaming across layer boundaries there; scan serializes them). The
    # tunnel's compile service sometimes wedges on large programs, so this
    # section runs under a SIGALRM watchdog and is skipped on timeout.
    tg_loop = 0.0
    import signal

    def _alarm(signum, frame):
        raise TimeoutError("loop-path compile watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(900)
    try:
        from llm_tpu.models.synthetic import make_synthetic_model as _msm

        params_l, cfg_l = _msm(qtype=GGMLType_Q4K(), on_device=True,
                               scales_dtype=jnp.bfloat16, scan=False, **geo)
        jax.block_until_ready(params_l["tok_embd"].qs)
        kvk_l = tuple(jnp.zeros((S, cfg_l.n_kv_heads, cfg_l.head_dim), jnp.bfloat16)
                      for _ in range(cfg_l.n_layers))
        kvv_l = tuple(jnp.zeros((S, cfg_l.n_kv_heads, cfg_l.head_dim_v), jnp.bfloat16)
                      for _ in range(cfg_l.n_layers))

        def decode_loop_l(params, kk, vv, tok0, n_steps):
            def body(i, carry):
                tok, kk, vv = carry
                pos = N_PREFILL + i
                cbits = (cell_idx <= pos).astype(jnp.uint32)
                logits, nk, nv, _ = forward(
                    params, cfg_l, list(kk), list(vv),
                    tok[None], pos[None].astype(jnp.int32),
                    jnp.zeros(1, jnp.int32), pos[None].astype(jnp.int32),
                    cell_idx, cbits, jnp.zeros(1, jnp.int32),
                )
                return (jnp.argmax(logits[0]).astype(jnp.int32),
                        tuple(nk), tuple(nv))

            return jax.lax.fori_loop(0, n_steps, body, (tok0, kk, vv))

        dj = jax.jit(decode_loop_l, static_argnums=(4,), donate_argnums=(1, 2))
        t0 = time.time()
        tokl, kvk_l, kvv_l = dj(params_l, kvk_l, kvv_l,
                                jnp.zeros((), jnp.int32), N_GEN)
        jax.block_until_ready(tokl)
        print(f"loop decode warmup(+compile): {time.time()-t0:.1f}s",
              file=sys.stderr)
        lt = []
        for _ in range(reps):
            t0 = time.perf_counter()
            tokl, kvk_l, kvv_l = dj(params_l, kvk_l, kvv_l, tokl, N_GEN)
            jax.block_until_ready(tokl)
            lt.append(time.perf_counter() - t0)
        tg_loop = N_GEN / float(np.mean(lt))
        print(f"tg{N_GEN} (loop): {tg_loop:.2f} t/s", file=sys.stderr)
        del params_l, kvk_l, kvv_l
    except (TimeoutError, Exception) as e:  # noqa: BLE001
        print(f"loop-path decode skipped: {e}", file=sys.stderr)
    finally:
        signal.alarm(0)

    tps = max(tg_scan, tg_loop)

    # -- pp512: prefill throughput (PP tokens in one program) ------------------
    pp_tokens = jnp.asarray(np.arange(PP) % cfg.vocab_size, jnp.int32)
    kv_k2 = jnp.zeros_like(kv_k)
    kv_v2 = jnp.zeros_like(kv_v)
    t0 = time.time()
    tokp, kv_k2, kv_v2 = prefill_j(params, kv_k2, kv_v2, pp_tokens)
    jax.block_until_ready(tokp)
    print(f"pp{PP} warmup(+compile): {time.time()-t0:.1f}s", file=sys.stderr)
    pp_times = []
    for _ in range(reps):
        kk = jnp.zeros(
            (cfg.n_layers, S, cfg.n_kv_heads, cfg.head_dim), jnp.bfloat16)
        vv = jnp.zeros(
            (cfg.n_layers, S, cfg.n_kv_heads, cfg.head_dim_v), jnp.bfloat16)
        t0 = time.perf_counter()
        tokp, kk, vv = prefill_j(params, kk, vv, pp_tokens)
        jax.block_until_ready(tokp)
        pp_times.append(time.perf_counter() - t0)
    # subtract the fresh-cache zeros alloc? negligible vs the matmuls
    pp_tps = PP / float(np.min(pp_times))
    print(f"pp{PP}: {pp_tps:.1f} t/s (times: "
          f"{['%.3f' % t for t in pp_times]})", file=sys.stderr)

    # -- host<->device round-trip latency (tunnel context) ---------------------
    one = jnp.zeros((), jnp.int32)
    _ = int(one)  # warm
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = int(one + 1)
        rtts.append(time.perf_counter() - t0)
    rtt_ms = float(np.median(rtts)) * 1e3
    print(f"host rtt: {rtt_ms:.1f} ms", file=sys.stderr)

    # -- engine path: Context.decode with host sampling + TTFT -----------------
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    ctx = Context(None, n_cells=S, params_cfg=(params, cfg))
    prompt = [int(x) for x in np.arange(N_PREFILL) % cfg.vocab_size]
    t0 = time.time()
    rc = ctx.decode(Batch.text(prompt, seq_id=0))
    assert rc == 0
    lg = ctx.get_logits()
    print(f"engine prefill(+compile): {time.time()-t0:.1f}s", file=sys.stderr)
    # warm the decode bucket
    t0 = time.time()
    assert ctx.decode(Batch.one(int(np.argmax(lg)), pos=N_PREFILL, seq_id=0)) == 0
    print(f"engine decode warmup(+compile): {time.time()-t0:.1f}s", file=sys.stderr)

    # TTFT: fresh-sequence prompt decode -> first logits on host (p50 of 5)
    ttfts = []
    for r in range(5):
        ctx.seq_rm(0)
        t0 = time.perf_counter()
        assert ctx.decode(Batch.text(prompt, seq_id=0)) == 0
        _ = ctx.get_logits()
        ttfts.append(time.perf_counter() - t0)
    ttft_ms = float(np.median(ttfts)) * 1e3

    # engine tg: per-token decode with host argmax
    n_eng = 64
    tid = int(np.argmax(ctx.get_logits()))
    pos = N_PREFILL + 1
    t0 = time.perf_counter()
    for _ in range(n_eng):
        assert ctx.decode(Batch.one(tid, pos=pos, seq_id=0)) == 0
        tid = int(np.argmax(ctx.get_logits()))
        pos += 1
    eng_dt = time.perf_counter() - t0
    eng_tps = n_eng / eng_dt
    eng_step_ms = eng_dt / n_eng * 1e3
    print(f"engine tg{n_eng}: {eng_tps:.2f} t/s ({eng_step_ms:.1f} ms/step, "
          f"rtt {rtt_ms:.1f} ms) | TTFT p50 {ttft_ms:.1f} ms", file=sys.stderr)

    # engine tg, on-device loop (Context.generate_loop: in-jit greedy chain,
    # one dispatch per 128 tokens — the production serving path)
    ctx.seq_rm(0)
    assert ctx.decode(Batch.text(prompt, seq_id=0)) == 0
    tid = int(np.argmax(ctx.get_logits()))
    _ = ctx.generate_loop(tid, N_GEN, seq_id=0)  # warmup/compile
    ctx.seq_rm(0)
    assert ctx.decode(Batch.text(prompt, seq_id=0)) == 0
    tid = int(np.argmax(ctx.get_logits()))
    t0 = time.perf_counter()
    toks = ctx.generate_loop(tid, N_GEN, seq_id=0)
    eng_loop_dt = time.perf_counter() - t0
    eng_loop_tps = len(toks) / eng_loop_dt
    print(f"engine tg{N_GEN} (on-device loop): {eng_loop_tps:.2f} t/s",
          file=sys.stderr)
    print(f"tg128 headline: {tps:.2f} t/s (scan {tg_scan:.2f} / loop "
          f"{tg_loop:.2f})", file=sys.stderr)

    baseline = 120.60  # tg128 Q4_K_M 7B-class, CUDA (llama-bench README:168)
    print(json.dumps({
        "metric": "tg128_tok_per_s_llama3_8b_q4_k_single_chip" if not small
        else "tg128_tok_per_s_small_smoke",
        "value": round(tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps / baseline, 4),
        "extra": {
            "tg128_scan_path": round(tg_scan, 2),
            "tg128_loop_path": round(tg_loop, 2),
            "pp512_tok_per_s": round(pp_tps, 1),
            "engine_tg_tok_per_s": round(eng_tps, 2),
            "engine_tg_loop_tok_per_s": round(eng_loop_tps, 2),
            "engine_step_ms": round(eng_step_ms, 2),
            "host_rtt_ms": round(rtt_ms, 2),
            "ttft_p50_ms": round(ttft_ms, 1),
            "build_s": round(t_build, 1),
        },
    }))


if __name__ == "__main__":
    main()

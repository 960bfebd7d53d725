"""Benchmark: Llama-3-8B-geometry Q4_K decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N, "extra": {...}}

vs_baseline anchors to the reference's closest published number: tg128 of a
Q4_K_M 7B-class model on a CUDA GPU = 120.60 t/s
(/root/reference/tools/llama-bench/README.md:168; see BASELINE.md).

Measurements (mirroring llama-bench's pp/tg grid + server TTFT):
  * engine tg128 (HEADLINE): Context.generate_loop over the per-layer
    (production FAST path) params — the number the server actually serves
    at. Round 4's "engine tax" was an artifact of constructing the bench
    Context over the scan-path params (scan serializes cross-layer weight
    streaming); the engine now runs the same unrolled path as the raw loop.
  * tg128 raw loops: bare fori_loop decode, scan and per-layer variants.
  * pp512: prefill throughput through the same forward (one program).
  * batch decode: generate_loop_batch aggregate t/s at B=4 and B=8.
  * engine per-token decode + TTFT p50: Context.decode with host-side
    sampling — one host<->device round trip per token, dominated by tunnel
    latency (reported separately as rtt_ms).

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
_TILES_GDOT = _TILES.replace(".json", "_gdot.json")
if os.path.exists(_TILES_GDOT) and not os.environ.get(
        "LLM_TPU_TILE_TABLE_GDOT"):
    os.environ["LLM_TPU_TILE_TABLE_GDOT"] = _TILES_GDOT


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


_T_START = time.time()
_BUDGET_S = int(os.environ.get("LLM_TPU_BENCH_BUDGET_S", "840"))


def _remaining() -> float:
    return _BUDGET_S - (time.time() - _T_START)


def bench_chain_ab(extra: dict, small: bool) -> bool:
    """Layer-tail chain kernel vs the 3-launch unfused composition, timed as
    in-device fori chains (docs/PERF.md measurement methodology). Runs FIRST
    and doubles as the chain compile canary: returns False (and the caller
    disables LLM_TPU_CHAIN) if Mosaic rejects the chain kernel."""
    from llm_tpu.gguf.constants import GGMLType
    from llm_tpu.models.synthetic import device_synthetic_qtensor
    from llm_tpu.ops.pallas_qmm_chain import layer_tail
    from llm_tpu.ops.qmatmul import qmm
    from llm_tpu.ops.norms import rms_norm

    E, F = (1024, 2048) if small else (4096, 14336)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    wo = device_synthetic_qtensor(ks[0], E, E, GGMLType.Q4_K, jnp.bfloat16)
    wgu = device_synthetic_qtensor(ks[1], 2 * F, E, GGMLType.Q4_K, jnp.bfloat16)
    wd = device_synthetic_qtensor(ks[2], E, F, GGMLType.Q4_K, jnp.bfloat16)
    att0 = jax.random.normal(ks[3], (8, E), jnp.bfloat16) * 0.01
    xres = jnp.zeros((8, E), jnp.bfloat16)
    gamma = jnp.ones((E,), jnp.float32)
    reps = 30 if small else 100

    def chained(att, n):
        def body(_, a):
            out = layer_tail(a, xres, gamma, wo, wgu, wd, eps=1e-5)
            return (out * 1e-3).astype(jnp.bfloat16)  # keep magnitudes sane
        return jax.lax.fori_loop(0, n, body, att)

    def unfused(att, n):
        def body(_, a):
            y1 = qmm(a, wo, out_dtype=jnp.bfloat16)
            h = xres + y1
            hn = rms_norm(h, gamma, 1e-5)
            gu = qmm(hn, wgu)
            g, u = gu[:, :F], gu[:, F:]
            cur = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
            out = h + qmm(cur, wd, out_dtype=jnp.bfloat16)
            return (out * 1e-3).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, att)

    try:
        cj = jax.jit(chained, static_argnums=(1,))
        jax.block_until_ready(cj(att0, 2))  # compile canary
    except Exception as e:  # noqa: BLE001
        print(f"chain kernel compile FAILED: {e}", file=sys.stderr)
        extra["chain_compile"] = f"failed: {type(e).__name__}"
        return False

    def _time(fn):
        jax.block_until_ready(fn(att0, reps))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(att0, reps))
        return (time.perf_counter() - t0) / reps * 1e6  # us per layer-tail

    us_chain = _time(cj)
    us_unfused = _time(jax.jit(unfused, static_argnums=(1,)))
    # Q4_K tail bytes: ~4.5 bit/weight + bf16 scales+mins
    elems = E * E + E * 2 * F + F * E
    gb = elems * (0.5 + 4.0 / 32) * 1e-9
    extra["chain_tail_us"] = round(us_chain, 1)
    extra["unfused_tail_us"] = round(us_unfused, 1)
    extra["chain_tail_gbps"] = round(gb / (us_chain * 1e-6), 1)
    extra["unfused_tail_gbps"] = round(gb / (us_unfused * 1e-6), 1)
    extra["chain_compile"] = "ok"
    print(f"layer-tail A/B: chain {us_chain:.0f} us ({extra['chain_tail_gbps']}"
          f" GB/s) vs unfused {us_unfused:.0f} us "
          f"({extra['unfused_tail_gbps']} GB/s)", file=sys.stderr)
    return True


def bench_hard_arch_flash(extra: dict, small: bool) -> None:
    """Compile + decode the round-3 hard-arch flash paths on real hardware:
    ALiBi (in-kernel slopes), head_dim 80, partial rotary — the
    LLM_TPU_FLASH_ANYDIM backlog (VERDICT r3 missing #4)."""
    from dataclasses import replace

    from llm_tpu.gguf.constants import GGMLType
    from llm_tpu.models.synthetic import make_synthetic_model
    from llm_tpu.models.transformer import forward
    from llm_tpu.ops.rope import RopeParams

    os.environ["LLM_TPU_FLASH_ANYDIM"] = "1"
    S = 256
    cases = {
        "alibi_hd64": dict(geo=dict(n_embd=1024, n_layers=2, n_heads=16,
                                    n_kv_heads=16, n_ff=2048, vocab=2048,
                                    head_dim=64),
                           alibi=8.0, rope_mode=-1, n_dims=None),
        "hd80": dict(geo=dict(n_embd=1280, n_layers=2, n_heads=16,
                              n_kv_heads=16, n_ff=2560, vocab=2048,
                              head_dim=80),
                     alibi=0.0, rope_mode=0, n_dims=80),
        "partial_rotary": dict(geo=dict(n_embd=1024, n_layers=2, n_heads=8,
                                        n_kv_heads=8, n_ff=2048, vocab=2048,
                                        head_dim=128),
                               alibi=0.0, rope_mode=2, n_dims=64),
    }
    for name, case in cases.items():
        if _remaining() < 120:
            extra[f"flash_{name}"] = "skipped: budget"
            continue
        try:
            params, cfg = make_synthetic_model(
                qtype=GGMLType.Q4_K, on_device=True,
                scales_dtype=jnp.bfloat16, **case["geo"])
            cfg = replace(
                cfg, alibi_max_bias=case["alibi"],
                rope=RopeParams(
                    n_dims=case["n_dims"] or cfg.head_dim,
                    mode=case["rope_mode"]))
            cell_idx = jnp.arange(S, dtype=jnp.int32)
            kvk = [jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim), jnp.bfloat16)
                   for _ in range(cfg.n_layers)]
            kvv = [jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim_v), jnp.bfloat16)
                   for _ in range(cfg.n_layers)]

            def dec(params, kk, vv, tok0, n, cfg=cfg, cell_idx=cell_idx):
                def body(i, carry):
                    tok, kk, vv = carry
                    pos = 8 + i
                    cbits = (cell_idx <= pos).astype(jnp.uint32)
                    logits, nk, nv, _ = forward(
                        params, cfg, list(kk), list(vv), tok[None],
                        pos[None].astype(jnp.int32), jnp.zeros(1, jnp.int32),
                        pos[None].astype(jnp.int32), cell_idx, cbits,
                        jnp.zeros(1, jnp.int32))
                    return (jnp.argmax(logits[0]).astype(jnp.int32),
                            tuple(nk), tuple(nv))
                return jax.lax.fori_loop(0, n, body, (tok0, tuple(kk), tuple(vv)))

            dj = jax.jit(dec, static_argnums=(4,), donate_argnums=(1, 2))
            t0 = time.time()
            tok, kk, vv = dj(params, kvk, kvv, jnp.zeros((), jnp.int32), 32)
            jax.block_until_ready(tok)
            compile_s = time.time() - t0
            t0 = time.perf_counter()
            tok, kk, vv = dj(params, kk, vv, tok, 32)
            jax.block_until_ready(tok)
            tps = 32 / (time.perf_counter() - t0)
            extra[f"flash_{name}"] = {"compile_s": round(compile_s, 1),
                                      "tg_tok_per_s": round(tps, 1)}
            print(f"flash {name}: compile {compile_s:.1f}s, {tps:.1f} t/s",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            extra[f"flash_{name}"] = f"failed: {type(e).__name__}: {e}"[:200]
            print(f"flash {name} FAILED: {e}", file=sys.stderr)


def bench_moe_ep(extra: dict, small: bool) -> None:
    """Single-chip MoE decode (BASELINE config 4 scaled to fit one chip)."""
    from llm_tpu.models.synthetic import make_synthetic_model
    from llm_tpu.models.transformer import forward

    if _remaining() < 120:
        extra["moe_tg"] = "skipped: budget"
        return
    try:
        geo = dict(n_embd=1024, n_layers=4, n_heads=16, n_kv_heads=8,
                   n_ff=1792, vocab=2048, head_dim=64,
                   n_expert=8, n_expert_used=2)
        params, cfg = make_synthetic_model(**geo)
        S = 256
        cell_idx = jnp.arange(S, dtype=jnp.int32)
        kvk = [jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim), jnp.bfloat16)
               for _ in range(cfg.n_layers)]
        kvv = [jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim_v), jnp.bfloat16)
               for _ in range(cfg.n_layers)]

        def dec(params, kk, vv, tok0, n):
            def body(i, carry):
                tok, kk, vv = carry
                pos = 8 + i
                cbits = (cell_idx <= pos).astype(jnp.uint32)
                logits, nk, nv, _ = forward(
                    params, cfg, list(kk), list(vv), tok[None],
                    pos[None].astype(jnp.int32), jnp.zeros(1, jnp.int32),
                    pos[None].astype(jnp.int32), cell_idx, cbits,
                    jnp.zeros(1, jnp.int32))
                return (jnp.argmax(logits[0]).astype(jnp.int32),
                        tuple(nk), tuple(nv))
            return jax.lax.fori_loop(0, n, body, (tok0, tuple(kk), tuple(vv)))

        dj = jax.jit(dec, static_argnums=(4,), donate_argnums=(1, 2))
        tok, kk, vv = dj(params, kvk, kvv, jnp.zeros((), jnp.int32), 32)
        jax.block_until_ready(tok)
        ts = []
        for _ in range(3):  # 3 reps, median: the single-rep row varied
            t0 = time.perf_counter()  # 36.8<->51.3 across round-4 captures
            tok, kk, vv = dj(params, kk, vv, tok, 32)
            jax.block_until_ready(tok)
            ts.append(time.perf_counter() - t0)
        tps = 32 / float(np.median(ts))
        extra["moe_tg_tok_per_s"] = round(tps, 1)
        extra["moe_tg_reps_s"] = [round(t, 4) for t in ts]
        print(f"moe (8e top-2, 1B-class) tg: {tps:.1f} t/s "
              f"(3-rep median)", file=sys.stderr)

        # grouped-vs-gather prefill dispatch A/B (VERDICT r4 #8): the
        # token-routed grouped path streams each expert's planes once;
        # the gather path materializes per-assignment dequant planes.
        Tp = 128
        toks_p = jnp.asarray(np.arange(Tp) % cfg.vocab_size, jnp.int32)

        def pre(params, kk, vv):
            pos = jnp.arange(Tp, dtype=jnp.int32)
            cb = (cell_idx < Tp).astype(jnp.uint32)
            lg, nk, nv, _ = forward(
                params, cfg, kk, vv, toks_p, pos,
                jnp.zeros(Tp, jnp.int32), pos, cell_idx, cb,
                jnp.asarray([Tp - 1], jnp.int32))
            return lg, nk, nv

        ab = {}
        for name, env in (("grouped", "1"), ("gather", "0")):
            os.environ["LLM_TPU_MOE_GROUPED"] = env
            pj = jax.jit(pre)
            lg, _, _ = pj(params, kvk, kvv)
            jax.block_until_ready(lg)
            pts = []
            for _ in range(3):
                t0 = time.perf_counter()
                lg, _, _ = pj(params, kvk, kvv)
                jax.block_until_ready(lg)
                pts.append(time.perf_counter() - t0)
            ab[name] = round(Tp / float(np.median(pts)), 1)
        os.environ.pop("LLM_TPU_MOE_GROUPED", None)
        extra["moe_prefill_dispatch_ab_tok_per_s"] = ab
        print(f"moe prefill pp{Tp}: grouped {ab['grouped']} vs gather "
              f"{ab['gather']} t/s", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        extra["moe_tg"] = f"failed: {type(e).__name__}"[:200]
        print(f"moe bench FAILED: {e}", file=sys.stderr)


def bench_load(extra: dict, small: bool) -> None:
    """Timed GGUF load (mmap -> native unpack -> K-major planes) at the
    largest scale the remaining budget allows."""
    if _remaining() < 180:
        extra["load_bench"] = "skipped: budget"
        return
    try:
        import subprocess

        # --synth-raw writes random quantized block bytes directly (no
        # f32 pass), so 8B-width geometry synthesizes in seconds — the
        # real-quantize synth at 8B timed out the round-4 driver bench
        geo = "1024,8,2816,32000" if small or _remaining() < 420 \
            else "4096,8,14336,32000"
        out = subprocess.run(
            [sys.executable, "-m", "llm_tpu.tools.load_bench", "--synth-raw",
             geo, "--ftype", "Q4_K_M", "--device", "cpu", "--reps", "2"],
            capture_output=True, text=True, timeout=max(60, _remaining() - 60))
        line = [ln for ln in out.stdout.splitlines() if ln.strip()][-1:]
        extra["load_bench"] = {"geo": geo, "result": line[0] if line else
                               f"rc={out.returncode}"}
        print(f"load_bench: {extra['load_bench']}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        extra["load_bench"] = f"failed: {type(e).__name__}"[:200]


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

    # chain-kernel A/B first: cheap, and the compile canary gates the
    # chain path for every later section
    extra_sections: dict = {}
    if jax.default_backend() == "tpu" and os.environ.get(
            "LLM_TPU_CHAIN", "ab") != "0":
        # chain defaults OFF in the engine (round-4 A/B: -7% e2e); the
        # microbench still runs here as evidence + compile canary
        if not bench_chain_ab(extra_sections, small):
            os.environ["LLM_TPU_CHAIN"] = "0"

    t0 = time.time()
    params, cfg = build(geo)
    jax.block_until_ready(params["tok_embd"].qs)
    t_build = time.time() - t0
    print(f"build: {t_build:.1f}s", file=sys.stderr)

    kv_k = jnp.zeros((cfg.n_layers, cfg.n_kv_heads, S, cfg.head_dim),
                     jnp.bfloat16)
    kv_v = jnp.zeros((cfg.n_layers, cfg.n_kv_heads, S, cfg.head_dim_v),
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
        kvk_l = tuple(jnp.zeros((cfg_l.n_kv_heads, S, cfg_l.head_dim), jnp.bfloat16)
                      for _ in range(cfg_l.n_layers))
        kvv_l = tuple(jnp.zeros((cfg_l.n_kv_heads, S, cfg_l.head_dim_v), jnp.bfloat16)
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
        del kvk_l, kvv_l
    except (TimeoutError, Exception) as e:  # noqa: BLE001
        print(f"loop-path decode skipped: {e}", file=sys.stderr)
        params_l = cfg_l = None
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
            (cfg.n_layers, cfg.n_kv_heads, S, cfg.head_dim), jnp.bfloat16)
        vv = jnp.zeros(
            (cfg.n_layers, cfg.n_kv_heads, S, cfg.head_dim_v), jnp.bfloat16)
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

    # -- engine path: Context over the PRODUCTION (per-layer FAST) params ------
    # Round-4 bug: the engine Context was constructed over the scan-path
    # params, so "engine tax" conflated the engine with the scan path's
    # serialized weight streaming (72.9 vs 102.4 t/s raw). The engine now
    # benches on the same unrolled path it serves with.
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    if params_l is not None:
        params_e, cfg_e = params_l, cfg_l
        # free the scan-path weights before the engine allocates its KV
        del params, kv_k, kv_v
    else:  # loop path failed (watchdog): fall back to the scan params
        params_e, cfg_e = params, cfg

    ctx = Context(None, n_cells=S, params_cfg=(params_e, cfg_e))
    cfg = cfg_e
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
    el_times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        toks = ctx.generate_loop(tid, N_GEN, seq_id=0)
        el_times.append(time.perf_counter() - t0)
        ctx.seq_rm(0)
        assert ctx.decode(Batch.text(prompt, seq_id=0)) == 0
        tid = int(np.argmax(ctx.get_logits()))
    eng_loop_tps = N_GEN / float(np.mean(el_times))
    print(f"engine tg{N_GEN} (on-device loop): {eng_loop_tps:.2f} t/s "
          f"(times: {['%.3f' % t for t in el_times]})", file=sys.stderr)

    # -- batch decode: generate_loop_batch at B=4 and B=8 (serving hot path) ---
    batch_rows = {}
    try:
        ctx_b = Context(None, n_cells=4096, params_cfg=(params_e, cfg_e))
        n_bd = 64
        for B in (4, 8):
            seqs = list(range(B))
            firsts = []
            for s in seqs:
                assert ctx_b.decode(Batch.text(prompt, seq_id=s)) == 0
                firsts.append(int(np.argmax(ctx_b.get_logits())))
            _ = ctx_b.generate_loop_batch(firsts, n_bd, seq_ids=seqs)  # warm
            for s in seqs:
                ctx_b.seq_rm(s)
                assert ctx_b.decode(Batch.text(prompt, seq_id=s)) == 0
            t0 = time.perf_counter()
            out = ctx_b.generate_loop_batch(firsts, n_bd, seq_ids=seqs)
            dt = time.perf_counter() - t0
            total = sum(len(r) for r in out)
            batch_rows[f"B{B}"] = {
                "agg_tok_per_s": round(total / dt, 2),
                "per_slot_tok_per_s": round(total / dt / B, 2),
            }
            print(f"batch decode B={B}: {total/dt:.1f} t/s aggregate "
                  f"({total/dt/B:.1f} per slot)", file=sys.stderr)
            for s in seqs:
                ctx_b.seq_rm(s)
        del ctx_b
    except Exception as e:  # noqa: BLE001
        batch_rows["error"] = f"{type(e).__name__}: {e}"[:200]
        print(f"batch decode FAILED: {e}", file=sys.stderr)

    print(f"tg128 raw: scan {tg_scan:.2f} / loop {tg_loop:.2f}; headline "
          f"(engine on-device loop): {eng_loop_tps:.2f} t/s", file=sys.stderr)

    # backlog sections (VERDICT r3 #2): hard-arch flash on hardware, MoE,
    # timed load — each behind the wall-clock budget
    if jax.default_backend() == "tpu":
        bench_hard_arch_flash(extra_sections, small)
        bench_moe_ep(extra_sections, small)
    bench_load(extra_sections, small)

    baseline = 120.60  # tg128 Q4_K_M 7B-class, CUDA (llama-bench README:168)
    # HEADLINE = the production serving path (Context.generate_loop over the
    # per-layer params), per VERDICT r4 #1. Raw loop numbers stay in extra.
    headline = eng_loop_tps if eng_loop_tps > 0 else tps
    print(json.dumps({
        "metric": "engine_tg128_tok_per_s_llama3_8b_q4_k_single_chip"
        if not small else "engine_tg128_tok_per_s_small_smoke",
        "value": round(headline, 2),
        "unit": "tok/s",
        "vs_baseline": round(headline / baseline, 4),
        "extra": {
            "tg128_scan_path": round(tg_scan, 2),
            "tg128_loop_path": round(tg_loop, 2),
            "pp512_tok_per_s": round(pp_tps, 1),
            "engine_tg_tok_per_s": round(eng_tps, 2),
            "engine_tg_loop_tok_per_s": round(eng_loop_tps, 2),
            "engine_vs_raw_loop": round(eng_loop_tps / tg_loop, 4)
            if tg_loop else None,
            "batch_decode": batch_rows,
            "engine_step_ms": round(eng_step_ms, 2),
            "host_rtt_ms": round(rtt_ms, 2),
            "ttft_p50_ms": round(ttft_ms, 1),
            "build_s": round(t_build, 1),
            **extra_sections,
        },
    }))


if __name__ == "__main__":
    main()

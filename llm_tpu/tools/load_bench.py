"""Time the real model-load path: GGUF mmap -> dequant/native unpack ->
K-major kernel planes -> (optionally) device put.

The serving bench (bench.py) uses synthetic on-device weights to avoid a
multi-GiB upload through the TPU tunnel, so this tool provides the missing
datapoint: what loading an actual checkpoint costs end to end (the
reference analogue is the "load time" line every llama.cpp tool prints,
tools/main + llama_model_load_from_file).

Usage:
  python -m llm_tpu.tools.load_bench -m model.gguf          # existing file
  python -m llm_tpu.tools.load_bench --synth 1024,8,2816,32000 --ftype Q4_K_M

Prints one JSON line with per-phase seconds and host-side GB/s.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time


def synth_gguf(path: str, E: int, L: int, FF: int, V: int, ftype: str,
               kv_heads: int | None = None, heads: int | None = None) -> str:
    """Build a random-weight f32 GGUF of the given llama geometry and
    quantize it to `ftype` (cached: reuses the file if it exists)."""
    import numpy as np

    from ..gguf.constants import Keys
    from ..gguf.writer import GGUFWriter
    from .quantize import quantize_model

    if os.path.exists(path):
        return path
    heads = heads or max(1, E // 128)
    kv_heads = kv_heads or max(1, heads // 4)
    hd = E // heads
    f32 = path + ".f32"
    rng = np.random.default_rng(0)
    w = GGUFWriter(f32, arch="llama")
    a = "llama"
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), 2048)
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), E)
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), L)
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), FF)
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), heads)
    w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a), kv_heads)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a), 1e-5)
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), V)

    def t(name, shape):
        w.add_tensor(name, (rng.standard_normal(shape, np.float32) * 0.1))

    t("token_embd.weight", (V, E))
    t("output_norm.weight", (E,))
    t("output.weight", (V, E))
    for il in range(L):
        p = f"blk.{il}."
        t(p + "attn_norm.weight", (E,))
        t(p + "attn_q.weight", (E, E))
        t(p + "attn_k.weight", (kv_heads * hd, E))
        t(p + "attn_v.weight", (kv_heads * hd, E))
        t(p + "attn_output.weight", (E, E))
        t(p + "ffn_norm.weight", (E,))
        t(p + "ffn_gate.weight", (FF, E))
        t(p + "ffn_up.weight", (FF, E))
        t(p + "ffn_down.weight", (E, FF))
    w.write()
    quantize_model(f32, path, ftype)
    os.unlink(f32)
    return path


def synth_gguf_raw(path: str, E: int, L: int, FF: int, V: int,
                   ftype: str) -> str:
    """Build a synthetic checkpoint by writing RANDOM QUANTIZED BLOCK BYTES
    directly — no f32 intermediate and no quantize pass. Block layouts are
    valid (the unpacker sees plausible bit patterns); values are garbage,
    which a LOAD benchmark never looks at. This makes 8B-width geometries
    synthesizable in seconds where the real-quantize path timed out the
    round-4 driver bench (BENCH_r04 load_bench TimeoutExpired)."""
    import numpy as np

    from ..gguf.constants import GGMLType, Keys, tensor_nbytes
    from ..gguf.writer import GGUFWriter

    if os.path.exists(path):
        return path
    base = {"Q4_K_M": GGMLType.Q4_K, "Q4_K_S": GGMLType.Q4_K,
            "Q8_0": GGMLType.Q8_0, "Q6_K": GGMLType.Q6_K,
            "Q4_0": GGMLType.Q4_0}.get(ftype.upper(), GGMLType.Q4_K)
    heads = max(1, E // 128)
    kv_heads = max(1, heads // 4)
    hd = E // heads
    rng = np.random.default_rng(0)
    w = GGUFWriter(path, arch="llama")
    a = "llama"
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), 2048)
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), E)
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), L)
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), FF)
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), heads)
    w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a), kv_heads)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a), 1e-5)
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), V)

    def tq(name, shape, t=base):
        # shape arrives numpy-style (rows, row_len); GGUF ne is
        # fastest-first, so ne = (row_len, rows)
        ne = (shape[1], shape[0])
        nb = tensor_nbytes(t, ne)
        raw = rng.integers(0, 256, size=nb, dtype=np.uint8)
        # random bytes are a valid block layout; values are garbage, which
        # a LOAD benchmark never evaluates
        w.add_tensor(name, None, ggml_type=t, raw=raw, shape=ne)

    def tf(name, shape):
        w.add_tensor(name, rng.standard_normal(shape, np.float32) * 0.1)

    tq("token_embd.weight", (V, E))
    tf("output_norm.weight", (E,))
    tq("output.weight", (V, E), GGMLType.Q6_K)
    for il in range(L):
        p = f"blk.{il}."
        tf(p + "attn_norm.weight", (E,))
        tq(p + "attn_q.weight", (E, E))
        tq(p + "attn_k.weight", (kv_heads * hd, E))
        tq(p + "attn_v.weight", (kv_heads * hd, E))
        tq(p + "attn_output.weight", (E, E))
        tf(p + "ffn_norm.weight", (E,))
        tq(p + "ffn_gate.weight", (FF, E))
        tq(p + "ffn_up.weight", (FF, E))
        tq(p + "ffn_down.weight", (E, FF))
    w.write()
    return path


def host_memcpy_gbps(mb: int = 64) -> float:
    """Measured host memcpy bandwidth — the speed-of-light for any host
    load path. Round-5 finding: this container's memory is throttled to
    ~0.04-0.6 GB/s (vs ~20 GB/s on normal hardware), so absolute load
    MB/s is an environment artifact; report load relative to memcpy."""
    import numpy as np

    a = np.ones(mb << 20, np.uint8)
    t0 = time.perf_counter()
    a.copy()
    return (mb / 1024) / (time.perf_counter() - t0)


def run(path: str, device_put: bool = True) -> dict:
    import jax.numpy as jnp

    from ..gguf.reader import GGUFReader
    from ..models.loader import load_params

    t0 = time.perf_counter()
    reader = GGUFReader(path)
    t_open = time.perf_counter() - t0

    tensor_bytes = sum(
        reader.data(n).nbytes for n in reader.tensors)

    # host-side unpack + K-major plane build + (lazy) device put; on CPU
    # jnp arrays stay host-resident so this isolates the host path
    t0 = time.perf_counter()
    params, cfg = load_params(reader, dense_dtype=jnp.bfloat16,
                              use_planes=True)
    t_load = time.perf_counter() - t0

    t_sync = 0.0
    if device_put:
        t0 = time.perf_counter()
        for layer in params["layers"]:
            for v in layer.values():
                for leaf in (v.planes if hasattr(v, "planes") else (v,)):
                    try:
                        leaf.block_until_ready()
                    except AttributeError:
                        pass
        t_sync = time.perf_counter() - t0

    gb = tensor_bytes / 1e9
    mc = host_memcpy_gbps()
    rate = gb / max(t_load, 1e-9)
    return {
        "file": os.path.basename(path),
        "tensor_gb": round(gb, 3),
        "open_s": round(t_open, 3),
        "load_s": round(t_load, 3),
        "sync_s": round(t_sync, 3),
        "host_gb_per_s": round(rate, 3),
        "host_memcpy_gb_per_s": round(mc, 3),
        "load_vs_memcpy": round(rate / max(mc, 1e-9), 3),
        "arch": cfg.arch,
        "n_layers": cfg.n_layers,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-m", "--model")
    ap.add_argument("--synth", metavar="E,L,FF,V",
                    help="synthesize a llama-geometry checkpoint")
    ap.add_argument("--synth-raw", metavar="E,L,FF,V",
                    help="synthesize by writing random quantized block "
                         "bytes directly (no f32 pass; load-only bench)")
    ap.add_argument("--ftype", default="Q4_K_M")
    ap.add_argument("--device", default=None)
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args(argv)
    from .args import apply_device

    apply_device(args.device)
    # persistent XLA compile cache: the few load-path programs (fused-
    # projection concats) compile once per container, not once per load
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    path = args.model
    if not path and args.synth_raw:
        E, L, FF, V = (int(x) for x in args.synth_raw.split(","))
        path = os.path.join(tempfile.gettempdir(),
                            f"loadbench_raw_{E}x{L}x{FF}x{V}_{args.ftype}.gguf")
        print(f"synthesizing (raw) {path} ...", file=sys.stderr)
        synth_gguf_raw(path, E, L, FF, V, args.ftype)
    if not path:
        if not args.synth:
            ap.error("need -m, --synth or --synth-raw")
        E, L, FF, V = (int(x) for x in args.synth.split(","))
        path = os.path.join(tempfile.gettempdir(),
                            f"loadbench_{E}x{L}x{FF}x{V}_{args.ftype}.gguf")
        print(f"synthesizing {path} ...", file=sys.stderr)
        synth_gguf(path, E, L, FF, V, args.ftype)
    best = None
    for _ in range(max(1, args.reps)):
        r = run(path)
        if best is None or r["load_s"] < best["load_s"]:
            best = r
    print(json.dumps(best))
    return 0


if __name__ == "__main__":
    sys.exit(main())

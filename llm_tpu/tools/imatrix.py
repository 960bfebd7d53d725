"""Importance-matrix collector.

Parity target: tools/llama-imatrix (IMatrixCollector::collect_imatrix,
/root/reference/tools/imatrix/imatrix.cpp:42-83): accumulate per-channel
second moments of every weight-matmul input over a calibration text, for
importance-weighted quantization. Output: an .npz keyed by GGUF tensor
names, accepted directly by the quantize tool (--imatrix).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..models.loader import load_params
from ..models.transformer import forward
from ..tokenizers import tokenizer_from_gguf

# capture-name -> GGUF tensor names that share this input
_NAME_MAP = {
    "attn_qkv": ("attn_q.weight", "attn_k.weight", "attn_v.weight"),
    "attn_output": ("attn_output.weight",),
    "ffn_gateup": ("ffn_gate.weight", "ffn_up.weight"),
    "ffn_down": ("ffn_down.weight",),
}


def collect_imatrix(reader: GGUFReader, tokens: list[int], n_ctx: int = 512,
                    n_chunks: int | None = None, progress=None) -> dict:
    params, cfg = load_params(reader, dense_dtype=jnp.bfloat16, fuse=False)
    n_chunk_max = len(tokens) // n_ctx
    n_chunk = min(n_chunks, n_chunk_max) if n_chunks else n_chunk_max
    if n_chunk < 1:
        raise ValueError(f"need at least {n_ctx} calibration tokens")

    S = n_ctx
    cell_idx = jnp.arange(S, dtype=jnp.int32)

    @jax.jit
    def step(params, toks):
        kv_k = [jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim), jnp.bfloat16)
                for _ in range(cfg.n_layers)]
        kv_v = [jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim_v), jnp.bfloat16)
                for _ in range(cfg.n_layers)]
        pos = jnp.arange(S, dtype=jnp.int32)
        out = forward(
            params, cfg, kv_k, kv_v, toks, pos, jnp.zeros(S, jnp.int32),
            pos, cell_idx, jnp.ones(S, jnp.uint32), jnp.zeros(1, jnp.int32),
            collect_acts=True,
        )
        return out[4]

    sums: dict[str, np.ndarray] = {}
    count = 0
    for ic in range(n_chunk):
        chunk = jnp.asarray(tokens[ic * n_ctx : (ic + 1) * n_ctx], jnp.int32)
        acts = step(params, chunk)
        for il, layer_acts in enumerate(acts):
            for cap_name, vec in layer_acts.items():
                for gg in _NAME_MAP.get(cap_name, ()):
                    key = f"blk.{il}.{gg}"
                    v = np.asarray(vec, np.float64)
                    sums[key] = sums.get(key, 0.0) + v
        count += n_ctx
        if progress:
            progress(ic + 1, n_chunk)

    return {k: (v / count).astype(np.float32) for k, v in sums.items()}


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="collect importance matrix")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="calibration text")
    ap.add_argument("-o", "--output", default="imatrix.npz")
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    ap.add_argument("--chunks", type=int, default=None)
    from .args import add_device, apply_device

    add_device(ap)
    args = ap.parse_args(argv)
    apply_device(args.device)

    reader = GGUFReader(args.model)
    tok = tokenizer_from_gguf(reader)
    text = open(args.file, encoding="utf-8").read()
    tokens = tok.encode(text, add_special=False)
    print(f"calibration: {len(tokens)} tokens")
    im = collect_imatrix(
        reader, tokens, args.ctx_size, args.chunks,
        progress=lambda i, n: print(f"[{i}/{n}]", flush=True),
    )
    np.savez_compressed(args.output, **im)
    print(f"wrote {len(im)} tensors to {args.output}")


if __name__ == "__main__":
    main()

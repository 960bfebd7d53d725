"""Control-vector generator: PCA over hidden-state differences.

Parity target: llama-cvector-generator (/root/reference/tools/
cvector-generator/cvector-generator.cpp): for each (positive, negative)
prompt pair, capture the per-layer hidden state of the last token; per
layer, the steering direction is the top principal component (power
iteration) of the paired differences — or their mean with --method mean.
Output: a control-vector GGUF with tensors direction.1..direction.(L-1).
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFReader
from ..gguf.writer import GGUFWriter
from ..runtime.batch import Batch
from ..runtime.engine import Context
from ..tokenizers import tokenizer_from_gguf


def _layer_hiddens(ctx: Context, toks: list[int]) -> list[np.ndarray]:
    """Per-layer hidden state of the LAST token (one prefill)."""
    import jax
    import jax.numpy as jnp

    from ..models.transformer import forward

    cfg = ctx.cfg
    T = len(toks)
    S = ctx.n_cells
    tokens = jnp.asarray(toks, jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)
    seq = jnp.zeros(T, jnp.int32)
    widx = jnp.arange(T, dtype=jnp.int32)
    cpos = jnp.zeros(S + 1, jnp.int32).at[:T].set(pos)
    cbits = jnp.zeros(S + 1, jnp.uint32).at[:T].set(1)
    oidx = jnp.asarray([T - 1], jnp.int32)
    kv_k = [jnp.zeros((cfg.n_kv_heads, S + 1, cfg.head_dim), ctx.dtype)
            for _ in range(cfg.n_layers)]
    kv_v = [jnp.zeros((cfg.n_kv_heads, S + 1, cfg.head_dim_v), ctx.dtype)
            for _ in range(cfg.n_layers)]
    out = forward(ctx.params, cfg, kv_k, kv_v, tokens, pos, seq, widx,
                  cpos, cbits, oidx, dtype=ctx.dtype, collect_hidden=True)
    return [np.asarray(h[0], np.float32) for h in out[4]]


def _top_pc(diffs: np.ndarray, iters: int = 100) -> np.ndarray:
    """Top principal component by power iteration (cvector-generator pca.hpp)."""
    x = diffs - diffs.mean(axis=0, keepdims=True) * 0.0  # the reference skips centering
    cov = x.T @ x
    rng = np.random.default_rng(0)
    v = rng.normal(size=cov.shape[0]).astype(np.float64)
    v /= np.linalg.norm(v)
    for _ in range(iters):
        v = cov @ v
        n = np.linalg.norm(v)
        if n == 0:
            break
        v /= n
    # orient toward the mean difference so +scale steers positive
    if np.dot(v, diffs.mean(axis=0)) < 0:
        v = -v
    return v.astype(np.float32)


def generate_control_vector(
    model_path: str,
    positives: list[str],
    negatives: list[str],
    out_path: str,
    method: str = "pca",
    ctx_size: int = 256,
) -> str:
    import jax.numpy as jnp

    reader = GGUFReader(model_path)
    tok = tokenizer_from_gguf(reader)
    ctx = Context(reader, n_cells=ctx_size, n_ubatch=ctx_size, dtype=jnp.float32)

    per_layer_diffs: list[list[np.ndarray]] = [[] for _ in range(ctx.cfg.n_layers)]
    for pos_p, neg_p in zip(positives, negatives):
        hp = _layer_hiddens(ctx, tok.encode(pos_p, add_special=True))
        hn = _layer_hiddens(ctx, tok.encode(neg_p, add_special=True))
        for il in range(ctx.cfg.n_layers):
            per_layer_diffs[il].append(hp[il] - hn[il])

    w = GGUFWriter(out_path, arch="controlvector")
    w.add_kv("controlvector.model_hint", ctx.cfg.arch)
    w.add_kv("controlvector.layer_count", ctx.cfg.n_layers)
    # direction.N is 1-based; layer 0 carries no direction (llama-adapter.cpp)
    for il in range(1, ctx.cfg.n_layers):
        diffs = np.stack(per_layer_diffs[il])
        vec = diffs.mean(axis=0) if method == "mean" else _top_pc(diffs)
        w.add_tensor(f"direction.{il}", vec.astype(np.float32),
                     ggml_type=GGMLType.F32)
    w.write()
    return out_path


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="control-vector trainer (PCA)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--positive-file", required=True,
                    help="one positive prompt per line")
    ap.add_argument("--negative-file", required=True)
    ap.add_argument("-o", "--output", default="control_vector.gguf")
    ap.add_argument("--method", choices=("pca", "mean"), default="pca")
    from .args import add_device, apply_device

    add_device(ap)
    args = ap.parse_args(argv)
    apply_device(args.device)

    pos = [l for l in open(args.positive_file, encoding="utf-8").read().splitlines() if l]
    neg = [l for l in open(args.negative_file, encoding="utf-8").read().splitlines() if l]
    n = min(len(pos), len(neg))
    out = generate_control_vector(args.model, pos[:n], neg[:n], args.output,
                                  method=args.method)
    print(f"wrote {out} ({n} pairs)")


if __name__ == "__main__":
    main()

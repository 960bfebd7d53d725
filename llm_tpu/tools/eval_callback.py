"""llm-tpu-eval-callback: dump per-layer activation statistics for a prompt.

Parity target: examples/eval-callback (/root/reference/examples/eval-callback/
eval-callback.cpp:92-164) built on the scheduler's eval callback
(ggml-backend.h:282-289): observe intermediate tensors while a prompt runs.
Here the engine's collect_hidden/collect_acts hooks return per-layer hidden
rows and per-channel second moments from the jitted step.
"""

from __future__ import annotations

import sys


def main(argv=None):
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..gguf.reader import GGUFReader
    from ..models.loader import load_params
    from ..models.transformer import forward
    from ..tokenizers import tokenizer_from_gguf

    ap = argparse.ArgumentParser(description="per-layer activation dump")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="hello world")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    ap.add_argument("--values", type=int, default=8,
                    help="leading values printed per tensor row")
    from .args import add_device, apply_device

    add_device(ap)
    args = ap.parse_args(argv)
    apply_device(args.device)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    reader = GGUFReader(args.model)
    tok = tokenizer_from_gguf(reader)
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    params, cfg = load_params(reader, dense_dtype=dtype)
    tokens = tok.encode(args.prompt, add_special=True)
    T = len(tokens)
    S = max(T, 8)
    kv_k = [jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim), dtype)
            for _ in range(cfg.n_layers)]
    kv_v = [jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim_v), dtype)
            for _ in range(cfg.n_layers)]
    pos = jnp.arange(T, dtype=jnp.int32)
    cpos = jnp.concatenate([pos, jnp.zeros(S - T, jnp.int32)])
    cbits = jnp.asarray((np.arange(S) < T).astype(np.uint32))
    logits, _, _, _, hiddens = forward(
        params, cfg, kv_k, kv_v, jnp.asarray(tokens, jnp.int32), pos,
        jnp.zeros(T, jnp.int32), pos, cpos, cbits,
        jnp.arange(T, dtype=jnp.int32), dtype=dtype, collect_hidden=True,
    )
    print(f"{'tensor':<14} {'shape':<14} {'mean':>10} {'std':>10} "
          f"{'amax':>10}  values")
    for il, h in enumerate(hiddens):
        a = np.asarray(h)
        vals = " ".join(f"{v:8.4f}" for v in a[-1][: args.values])
        print(f"l_out-{il:<8} {str(list(a.shape)):<14} {a.mean():>10.4f} "
              f"{a.std():>10.4f} {np.abs(a).max():>10.4f}  [{vals} ...]")
    a = np.asarray(logits)
    print(f"{'logits':<14} {str(list(a.shape)):<14} {a.mean():>10.4f} "
          f"{a.std():>10.4f} {np.abs(a).max():>10.4f}")
    top = np.argsort(-a[-1])[:5]
    print("top-5:", [(int(t), round(float(a[-1][t]), 3),
                      tok.piece(int(t))) for t in top])


if __name__ == "__main__":
    main()

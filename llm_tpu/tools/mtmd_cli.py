"""Multimodal CLI (llama-mtmd-cli parity,
/root/reference/tools/mtmd/mtmd-cli.cpp): load an LLM GGUF + an mmproj
GGUF, evaluate an interleaved image+text prompt, generate."""

from __future__ import annotations

import sys
import time


def main(argv=None):
    import argparse

    import jax.numpy as jnp

    from ..gguf.reader import GGUFReader
    from ..mtmd import MARKERS, MultimodalRuntime, tokenize_chunks
    from ..runtime.batch import Batch
    from ..samplers import SamplingParams, build_chain
    from ..runtime.engine import Context
    from ..tokenizers import tokenizer_from_gguf

    ap = argparse.ArgumentParser(description="multimodal generation")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--mmproj", required=True, help="vision tower GGUF")
    ap.add_argument("--image", action="append", default=[], help="image file")
    ap.add_argument("-p", "--prompt", required=True,
                    help=f"prompt with image markers ({MARKERS[0]})")
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("-c", "--ctx-size", type=int, default=4096)
    ap.add_argument("--temp", type=float, default=0.2)
    ap.add_argument("--f32", action="store_true")
    from .args import add_device, apply_device

    add_device(ap)
    args = ap.parse_args(argv)
    apply_device(args.device)

    from PIL import Image

    t0 = time.perf_counter()
    reader = GGUFReader(args.model)
    tok = tokenizer_from_gguf(reader)
    ctx = Context(reader, n_cells=args.ctx_size,
                  dtype=jnp.float32 if args.f32 else jnp.bfloat16)
    rt = MultimodalRuntime(ctx, tok, GGUFReader(args.mmproj))
    print(f"loaded in {time.perf_counter()-t0:.1f}s "
          f"({ctx.cfg.arch} + clip {rt.clip_cfg.n_layers}L)", file=sys.stderr)

    images = [Image.open(p) for p in args.image]
    chunks = tokenize_chunks(tok, args.prompt, images)
    rc = rt.eval_chunks(chunks)
    if rc != 0:
        raise SystemExit(f"chunk eval failed rc={rc}")

    chain = build_chain(SamplingParams(temp=args.temp), ctx.cfg.vocab_size)
    n_past = ctx.seq_pos_max(0) + 1
    for _ in range(args.n_predict):
        tid = chain.sample(ctx.get_logits())
        chain.accept(tid)
        if tok.vocab.is_eog(tid):
            break
        sys.stdout.write(tok.piece(tid))
        sys.stdout.flush()
        if ctx.decode(Batch.one(tid, pos=n_past)) != 0:
            break
        n_past += 1
    print()
    print(ctx.perf.summary(), file=sys.stderr)


if __name__ == "__main__":
    main()

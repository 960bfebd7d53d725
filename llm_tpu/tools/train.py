"""llm-tpu-train: LoRA or full-weight training over a text corpus.

Parity target: the reference's training surface — llama_opt_init /
llama_opt_epoch (/root/reference/include/llama.h:1469-1471) driven by
examples/training/finetune.cpp, with ggml-opt's AdamW/SGD optimizers and
ggml_opt_fit epoch loop (/root/reference/ggml/src/ggml-opt.cpp).
"""

from __future__ import annotations

import sys
import time


def main(argv=None):
    import argparse

    import jax.numpy as jnp
    import numpy as np

    from ..gguf.reader import GGUFReader
    from ..models.loader import load_params
    from ..tokenizers import tokenizer_from_gguf

    ap = argparse.ArgumentParser(description="llm-tpu training / finetuning")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="training text")
    ap.add_argument("--val-file", default=None, help="held-out text")
    ap.add_argument("-c", "--ctx-size", type=int, default=256)
    ap.add_argument("-b", "--batch-size", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--optimizer", choices=("adamw", "sgd"), default="adamw")
    ap.add_argument("--weight-decay", type=float, default=0.0)
    ap.add_argument("--lora", action="store_true",
                    help="train a LoRA adapter instead of full weights")
    ap.add_argument("--lora-rank", type=int, default=8)
    ap.add_argument("-o", "--output", required=True,
                    help="output GGUF (model checkpoint or LoRA adapter)")
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    from .args import add_device, apply_device

    add_device(ap)
    args = ap.parse_args(argv)
    apply_device(args.device)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    reader = GGUFReader(args.model)
    tok = tokenizer_from_gguf(reader)
    text = open(args.file, encoding="utf-8").read()
    stream = tok.encode(text, add_special=False)
    print(f"corpus: {len(text)} chars -> {len(stream)} tokens", file=sys.stderr)
    val = None
    if args.val_file:
        vt = open(args.val_file, encoding="utf-8").read()
        val = np.asarray(tok.encode(vt, add_special=False)[: args.ctx_size * 4],
                         np.int32)

    if args.lora:
        from ..runtime.training import LoraTrainer

        params, cfg = load_params(reader, dense_dtype=jnp.float32)
        tr = LoraTrainer(params, cfg, rank=args.lora_rank, lr=args.lr)
        for ep in range(args.epochs):
            t0 = time.time()
            loss = tr.epoch(stream, args.ctx_size)
            print(f"epoch {ep}: loss {loss:.4f} ({time.time()-t0:.0f}s)",
                  file=sys.stderr)
        tr.export_adapter(args.output)
        print(f"wrote LoRA adapter {args.output}", file=sys.stderr)
        return

    from ..runtime.training import FullTrainer

    params, cfg = load_params(reader, dense_dtype=jnp.float32,
                              use_planes=False)
    tr = FullTrainer(params, cfg, lr=args.lr, optimizer=args.optimizer,
                     weight_decay=args.weight_decay)
    for ep in range(args.epochs):
        t0 = time.time()
        last = [0.0]

        def prog(i, loss, t0=t0, last=last):
            last[0] = loss
            if i % 20 == 0:
                print(f"  step {i}: loss {loss:.4f}", file=sys.stderr)

        loss = tr.epoch(stream, args.ctx_size, batch_size=args.batch_size,
                        progress=prog)
        msg = f"epoch {ep}: train loss {loss:.4f}"
        if val is not None and len(val) > 1:
            msg += f" | val loss {tr.eval_loss(val[: args.ctx_size]):.4f}"
        print(msg + f" ({time.time()-t0:.0f}s)", file=sys.stderr)
    n = tr.save(reader, args.output)
    print(f"wrote {args.output} ({n} tensors)", file=sys.stderr)


if __name__ == "__main__":
    main()

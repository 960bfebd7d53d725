"""llm-tpu-run: chat with a model (ollama-style REPL or one-shot).

Parity target: llama-run (/root/reference/tools/run/run.cpp): load a GGUF,
apply the model's chat template, stream responses, keep multi-turn context
in the KV cache.
"""

from __future__ import annotations

import sys


def main(argv=None):
    import argparse

    import jax.numpy as jnp
    import numpy as np

    from ..gguf.reader import GGUFReader
    from ..runtime.batch import Batch
    from ..runtime.engine import Context
    from ..samplers import SamplingParams, build_chain
    from ..server.chat import apply_template, detect_template
    from ..tokenizers import tokenizer_from_gguf

    ap = argparse.ArgumentParser(description="chat with a GGUF model")
    ap.add_argument("model")
    ap.add_argument("prompt", nargs="?", default=None,
                    help="one-shot prompt (omit for interactive chat)")
    ap.add_argument("-n", "--n-predict", type=int, default=256)
    ap.add_argument("-c", "--ctx-size", type=int, default=4096)
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--chat-template", default=None)
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
    ctx = Context(reader, n_cells=args.ctx_size)
    template = (args.chat_template
                or (detect_template(tok.vocab.chat_template)
                    if tok.vocab.chat_template else "chatml"))
    sampling = SamplingParams(temp=args.temp)

    messages: list[dict] = []
    n_past = 0
    prompt_cache: list[int] = []

    def turn(user_text: str):
        nonlocal n_past, prompt_cache
        messages.append({"role": "user", "content": user_text})
        text = apply_template(template, messages, add_assistant=True)
        toks = tok.encode(text, add_special=True, parse_special=True)
        # reuse the cached prefix (prompt cache, main.cpp session reuse)
        n_shared = 0
        for a, b in zip(prompt_cache, toks):
            if a != b:
                break
            n_shared += 1
        if n_shared < len(prompt_cache):
            ctx.seq_rm(0, n_shared, -1)
        todo = toks[n_shared:]
        if todo:
            rc = ctx.decode(Batch.text(todo, seq_id=0, pos_start=n_shared))
            if rc != 0:
                raise RuntimeError(f"decode rc={rc}")
        n_past = len(toks)
        chain = build_chain(sampling, ctx.cfg.vocab_size)
        for t in toks:
            chain.accept(t)
        out: list[int] = []
        reply = []
        for _ in range(args.n_predict):
            tid = chain.sample(ctx.get_logits())
            chain.accept(tid)
            if tok.vocab.is_eog(tid):
                break
            piece = tok.piece(tid)
            reply.append(piece)
            sys.stdout.write(piece)
            sys.stdout.flush()
            out.append(tid)
            if ctx.decode(Batch.one(tid, pos=n_past, seq_id=0)) != 0:
                break
            n_past += 1
        sys.stdout.write("\n")
        messages.append({"role": "assistant", "content": "".join(reply)})
        prompt_cache = toks + out

    if args.prompt is not None:
        turn(args.prompt)
        return
    print(f"chatting with {args.model} (template: {template}; "
          f"Ctrl-D to exit)", file=sys.stderr)
    while True:
        try:
            line = input("> ")
        except (EOFError, KeyboardInterrupt):
            print(file=sys.stderr)
            break
        if line.strip():
            turn(line)


if __name__ == "__main__":
    main()

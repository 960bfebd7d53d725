"""llm-tpu-cli: interactive / one-shot generation.

Parity target: tools/main/main.cpp (llama-cli) — prompt eval, sampling loop,
context shifting (keep n_keep, discard half, main.cpp:357-400), antiprompts,
perf report. Interactive chat and session files follow in the server layer.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from ..gguf.reader import GGUFReader
from ..runtime.batch import Batch
from ..runtime.engine import Context
from ..samplers import SamplingParams, build_chain
from ..tokenizers import tokenizer_from_gguf


def generate(
    ctx: Context,
    tok,
    prompt_tokens: list[int],
    n_predict: int,
    sampling: SamplingParams,
    seq_id: int = 0,
    n_keep: int = 0,
    antiprompts: tuple[str, ...] = (),
    stream=None,
    prompt_prefix: int = 0,
    pos_start: int = 0,
):
    """Prompt eval + generation loop with context shifting. Returns
    (tokens, text). prompt_prefix: tokens already in cache (session reuse);
    pos_start: cache position offset (interactive follow-up turns)."""
    chain = build_chain(sampling, ctx.cfg.vocab_size)
    n_ctx = ctx.n_cells

    todo = prompt_tokens[prompt_prefix:]
    rc = ctx.decode(Batch.text(todo, seq_id=seq_id,
                               pos_start=pos_start + prompt_prefix))
    if rc != 0:
        raise RuntimeError(f"prompt decode failed: rc={rc}")
    for t in prompt_tokens:
        chain.accept(t)
    if sampling.grammar:
        # constrain GENERATED text only: wrap after the prompt is accepted
        from ..grammar import constrained_chain

        chain = constrained_chain(chain, tok, grammar=sampling.grammar)

    out_tokens: list[int] = []
    text_parts: list[str] = []
    n_past = pos_start + len(prompt_tokens)

    # fast path: greedy + default (no-op) modifiers, no antiprompts, and
    # enough cache that no context shift can trigger -> generate ON DEVICE
    # in chunks (Context.generate_loop), avoiding the per-token host round
    # trip of the scalar loop below
    simple_greedy = (
        sampling.temp <= 0 and sampling.mirostat == 0
        and not sampling.grammar and not sampling.logit_bias
        and sampling.penalty_repeat == 1.0 and sampling.penalty_freq == 0.0
        and sampling.penalty_present == 0.0 and sampling.dry_multiplier == 0.0
        and sampling.xtc_probability == 0.0
    )
    n_scalar = n_predict  # scalar-loop budget (reduced by the fast path)
    if (simple_greedy and not antiprompts
            and (ctx.rslots is not None
                 or n_past + n_predict + 2 <= n_ctx)):
        eogs = tuple(i for i in (tok.vocab.eos_id, tok.vocab.eot_id)
                     if i is not None and i >= 0)

        def _emit(t):
            out_tokens.append(t)
            piece = tok.piece(t)
            text_parts.append(piece)
            if stream:
                stream(piece)
            chain.accept(t)

        tid = chain.sample(ctx.get_logits())
        chain.accept(tid)
        stopped = tok.vocab.is_eog(tid)
        tail_undecoded = False  # out_tokens[-1] not yet in cache/state
        if not stopped:
            out_tokens.append(tid)
            piece = tok.piece(tid)
            text_parts.append(piece)
            if stream:
                stream(piece)
            tail_undecoded = True
        # chunks never exceed the remaining budget (chunk <= remaining), so
        # the device loop cannot overshoot — required for recurrent models,
        # whose state cannot rewind
        while not stopped and len(out_tokens) < n_predict:
            rem = n_predict - len(out_tokens)
            k = max((b for b in (8, 16, 32) if b <= rem), default=0)
            if k == 0:
                break  # scalar tail below finishes the last few tokens
            nxt = ctx.generate_loop(out_tokens[-1], k, seq_id=seq_id,
                                    eog_ids=eogs)
            if not nxt:
                stopped = True
                break
            if tok.vocab.is_eog(nxt[-1]) or nxt[-1] in eogs:
                # the loop decoded everything up to (not incl.) the EOG
                stopped = True
                nxt = nxt[:-1]
                tail_undecoded = False
            else:
                tail_undecoded = True  # final sampled token undecoded
            for t in nxt:
                _emit(t)
        n_past = pos_start + len(prompt_tokens) + len(out_tokens)
        # the scalar loop decodes every emitted token — mirror that so (a)
        # the scalar tail below has logits to continue from and (b) cache/
        # state matches for follow-up turns
        if out_tokens and tail_undecoded:
            rc = ctx.decode(Batch.one(out_tokens[-1], pos=n_past - 1,
                                      seq_id=seq_id))
            if rc != 0:
                raise RuntimeError(f"decode failed: rc={rc}")
        if stopped or len(out_tokens) >= n_predict:
            return out_tokens, "".join(text_parts)
        n_scalar = n_predict - len(out_tokens)

    for _ in range(n_scalar):
        logits = ctx.get_logits()
        tid = chain.sample(logits)
        chain.accept(tid)
        if tok.vocab.is_eog(tid):
            break
        out_tokens.append(tid)
        piece = tok.piece(tid)
        text_parts.append(piece)
        if stream:
            stream(piece)

        # context shift: keep n_keep, drop half of the rest (main.cpp:372-400)
        if ctx.cells.n_seq_cells(seq_id) + 1 > n_ctx - 1:
            n_left = n_past - n_keep
            n_discard = n_left // 2
            ctx.seq_rm(seq_id, n_keep, n_keep + n_discard)
            ctx.seq_add(seq_id, n_keep + n_discard, n_past, -n_discard)
            n_past -= n_discard

        rc = ctx.decode(Batch.one(tid, pos=n_past, seq_id=seq_id))
        if rc != 0:
            raise RuntimeError(f"decode failed: rc={rc}")
        n_past += 1

        if antiprompts:
            tail = "".join(text_parts)[-64:]
            if any(a in tail for a in antiprompts):
                break
    return out_tokens, "".join(text_parts)


def main(argv=None):
    import argparse
    import jax.numpy as jnp

    ap = argparse.ArgumentParser(description="llm-tpu text generation")
    from .args import env_default as ed, required_unless_env

    ap.add_argument("-m", "--model", default=ed("model", None),
                    required=required_unless_env("model"))
    ap.add_argument("-p", "--prompt", default=ed("prompt", ""))
    ap.add_argument("-f", "--file", default=None, help="prompt from file")
    ap.add_argument("-n", "--n-predict", type=int, default=ed("n-predict", 128))
    ap.add_argument("-c", "--ctx-size", type=int, default=ed("ctx-size", 4096))
    ap.add_argument("--n-keep", type=int, default=0)
    ap.add_argument("--temp", type=float, default=ed("temp", 0.8))
    ap.add_argument("--top-k", type=int, default=ed("top-k", 40))
    ap.add_argument("--top-p", type=float, default=ed("top-p", 0.95))
    ap.add_argument("--min-p", type=float, default=0.05)
    ap.add_argument("--grammar", default=ed("grammar", ""),
                    help="GBNF grammar text, or '%%regex <pattern>'")
    ap.add_argument("--grammar-file", default=None,
                    help="read --grammar from a file (.gbnf)")
    ap.add_argument("--json-schema", default=None,
                    help="constrain output to a JSON schema (string or @file)")
    ap.add_argument("--repeat-penalty", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=-1)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--no-planes", action="store_true",
                    help="dequantize weights to dense at load")
    ap.add_argument("-r", "--reverse-prompt", action="append", default=[])
    ap.add_argument("--prompt-cache", default=None,
                    help="session file: restore matching prompt prefix, save on exit")
    ap.add_argument("--verbose-prompt", action="store_true")
    ap.add_argument("--lora", action="append", default=[],
                    help="LoRA adapter GGUF (repeatable); optional :scale")
    ap.add_argument("--control-vector", action="append", default=[],
                    help="control-vector GGUF (repeatable); optional :scale")
    ap.add_argument("--control-vector-layer-range", nargs=2, type=int,
                    default=None, metavar=("START", "END"))
    ap.add_argument("-i", "--interactive", action="store_true",
                    help="interactive mode: read follow-up input after each turn")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax profiler trace of the run "
                         "(view with tensorboard/xprof — the TPU-native "
                         "analogue of nsys over the reference's CUDA path)")
    from .args import add_override_kv, apply_kv_overrides
    from .mesh_args import add_mesh_args, mesh_from_args

    add_override_kv(ap)
    add_mesh_args(ap)
    from .args import add_device, add_ep_cf, apply_device, apply_ep_cf

    add_device(ap)
    add_ep_cf(ap)
    args = ap.parse_args(argv)
    apply_device(args.device)
    apply_ep_cf(args.ep_capacity_factor)
    mesh = mesh_from_args(args)
    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)

    t0 = time.perf_counter()
    reader = GGUFReader(args.model)
    apply_kv_overrides(reader, args.override_kv)
    tok = tokenizer_from_gguf(reader)

    if reader.architecture in ("t5", "t5encoder"):
        # encoder-decoder flow: encode the prompt, decode from
        # decoder_start_token_id (llama-cli's llama_encode path for T5)
        from ..runtime.t5 import T5Session

        sess = T5Session(reader, n_cells=args.ctx_size,
                         dtype=jnp.float32 if args.f32 else jnp.bfloat16)
        prompt = args.prompt
        if args.file:
            prompt = open(args.file, encoding="utf-8").read()
        ptoks = tok.encode(prompt, add_special=True, parse_special=True)
        eos = tok.vocab.eos_id if tok.vocab.eos_id >= 0 else 1
        out = sess.generate(ptoks, n_predict=args.n_predict, eos_id=eos)
        print("".join(tok.piece(t) for t in out))
        return

    ctx = Context(
        reader,
        n_cells=args.ctx_size,
        dtype=jnp.float32 if args.f32 else jnp.bfloat16,
        use_planes=not args.no_planes,
        mesh=mesh,
    )
    for spec in args.lora:
        from ..models.lora import attach_lora, load_lora_gguf

        path, _, sc = spec.partition(":")
        tensors, alpha = load_lora_gguf(path)
        n = attach_lora(ctx.params, tensors, alpha,
                        scale=float(sc) if sc else 1.0)
        print(f"lora {path}: {n} tensors", file=sys.stderr)
    for spec in args.control_vector:
        from ..models.lora import apply_control_vector, load_control_vector_gguf

        path, _, sc = spec.partition(":")
        rng_ = args.control_vector_layer_range or (1, -1)
        n = apply_control_vector(ctx.params, load_control_vector_gguf(path),
                                 scale=float(sc) if sc else 1.0,
                                 il_start=rng_[0], il_end=rng_[1])
        print(f"control vector {path}: {n} layers", file=sys.stderr)
    print(f"model loaded in {time.perf_counter()-t0:.1f}s "
          f"({ctx.cfg.arch}, {ctx.cfg.n_layers} layers, vocab {ctx.cfg.vocab_size})",
          file=sys.stderr)

    prompt = args.prompt
    if args.file:
        prompt = open(args.file, encoding="utf-8").read()
    ptoks = tok.encode(prompt, add_special=True, parse_special=True)
    if args.verbose_prompt:
        for t in ptoks:
            print(f"{t:8d} -> {tok.piece(t, special=True)!r}", file=sys.stderr)

    # session / prompt cache (llama-cli --prompt-cache, main.cpp:357)
    session_prefix = 0
    if args.prompt_cache:
        import os
        from ..runtime.state import state_load, state_save
        if os.path.exists(args.prompt_cache):
            try:
                cached = state_load(ctx, args.prompt_cache)
                n = 0
                for a, b in zip(cached, ptoks):
                    if a != b:
                        break
                    n += 1
                n = min(n, len(ptoks) - 1)
                ctx.seq_rm(0, n, -1)
                session_prefix = n
                print(f"prompt cache: reusing {n} tokens", file=sys.stderr)
            except Exception as e:
                print(f"prompt cache load failed: {e}", file=sys.stderr)
                ctx.clear()

    grammar = args.grammar or ""
    if args.grammar_file:
        grammar = open(args.grammar_file).read()
    if args.json_schema and not grammar:
        import json as _json

        from ..grammar.json_schema import json_schema_to_gbnf

        js = args.json_schema
        if js.startswith("@"):
            js = open(js[1:]).read()
        grammar = json_schema_to_gbnf(_json.loads(js))
    sampling = SamplingParams(
        temp=args.temp, top_k=args.top_k, top_p=args.top_p, min_p=args.min_p,
        penalty_repeat=args.repeat_penalty,
        seed=args.seed if args.seed >= 0 else 0xFFFFFFFF,
        grammar=grammar,
    )

    sys.stdout.write(prompt)
    sys.stdout.flush()
    out_toks, _text = generate(
        ctx, tok, ptoks, args.n_predict, sampling,
        n_keep=args.n_keep, antiprompts=tuple(args.reverse_prompt),
        stream=lambda s: (sys.stdout.write(s), sys.stdout.flush()),
        prompt_prefix=session_prefix,
    )
    print()

    # interactive mode (llama-cli -i, main.cpp interactive loop): alternate
    # user input / generation on the same sequence, continuing the cache
    n_past = len(ptoks) + len(out_toks)
    while args.interactive:
        try:
            line = input("\n> ")
        except EOFError:
            break
        if not line.strip():
            continue
        if line.strip() in ("/exit", "/quit"):
            break
        turn = tok.encode(line + "\n", add_special=False, parse_special=True)
        more, _ = generate(
            ctx, tok, turn, args.n_predict, sampling,
            n_keep=args.n_keep, antiprompts=tuple(args.reverse_prompt),
            stream=lambda s: (sys.stdout.write(s), sys.stdout.flush()),
            prompt_prefix=0, pos_start=n_past,
        )
        n_past += len(turn) + len(more)
        print()
    print(ctx.perf.summary(), file=sys.stderr)
    if args.prompt_cache:
        from ..runtime.state import state_save
        state_save(ctx, args.prompt_cache, tokens=ptoks + out_toks)
        print(f"prompt cache saved to {args.prompt_cache}", file=sys.stderr)
    if args.profile:
        import jax

        jax.profiler.stop_trace()
        print(f"profiler trace written to {args.profile}", file=sys.stderr)


if __name__ == "__main__":
    main()

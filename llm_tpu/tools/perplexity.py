"""Perplexity / KL-divergence evaluator.

Parity target: tools/perplexity/perplexity.cpp — chunked sliding evaluation
(chunks of n_ctx, NLL counted from position n_ctx/2, perplexity.cpp:539),
BOS per chunk, PPL = exp(nll/count) with stderr estimate; KLD mode saves
base-model logits and compares (KLD mean, same-top fraction, Δp RMS).
"""

from __future__ import annotations

import math

import numpy as np

from ..gguf.reader import GGUFReader
from ..runtime.batch import Batch
from ..runtime.engine import Context
from ..tokenizers import tokenizer_from_gguf


def _log_softmax(logits: np.ndarray) -> np.ndarray:
    m = logits.max(axis=-1, keepdims=True)
    x = logits - m
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def perplexity(
    ctx: Context,
    tokens: list[int],
    n_ctx: int = 512,
    add_bos: bool = True,
    bos_id: int = 1,
    n_chunks: int | None = None,
    save_logits: list | None = None,
    progress=None,
) -> dict:
    """Compute wikitext-style PPL over a token stream."""
    n_chunk_max = len(tokens) // n_ctx
    n_chunk = min(n_chunks, n_chunk_max) if n_chunks else n_chunk_max
    if n_chunk < 1:
        raise ValueError(f"need at least {n_ctx} tokens, have {len(tokens)}")

    first = n_ctx // 2
    nll = 0.0
    nll2 = 0.0
    count = 0

    for ic in range(n_chunk):
        chunk = list(tokens[ic * n_ctx : (ic + 1) * n_ctx])
        if add_bos:
            chunk[0] = bos_id
        ctx.clear()
        b = Batch()
        for j, t in enumerate(chunk):
            b.add(t, j, (0,), logits=True)
        rc = ctx.decode(b)
        if rc != 0:
            raise RuntimeError(f"decode failed with {rc}")
        logits = np.stack([ctx.get_logits(j) for j in range(n_ctx - 1)])
        logp = _log_softmax(logits.astype(np.float64))
        if save_logits is not None:
            save_logits.append(logits.astype(np.float16))
        for j in range(first, n_ctx - 1):
            tgt = chunk[j + 1]
            v = -logp[j, tgt]
            nll += v
            nll2 += v * v
            count += 1
        if progress:
            progress(ic + 1, n_chunk, math.exp(nll / count))

    ppl = math.exp(nll / count)
    nll_mean = nll / count
    nll_var = nll2 / count - nll_mean * nll_mean
    err = ppl * math.sqrt(nll_var / count) if nll_var > 0 else 0.0
    return {"ppl": ppl, "err": err, "nll": nll_mean, "count": count}


def _seq_logprobs(ctx: Context, tokens: list[int]) -> np.ndarray:
    """log P(tokens[j+1] | tokens[:j+1]) for each j (one prefill pass)."""
    ctx.clear()
    b = Batch()
    for j, t in enumerate(tokens):
        b.add(t, j, (0,), logits=(j < len(tokens) - 1))
    rc = ctx.decode(b)
    if rc != 0:
        raise RuntimeError(f"decode failed with {rc}")
    logits = np.stack([ctx.get_logits(j) for j in range(len(tokens) - 1)])
    logp = _log_softmax(logits.astype(np.float64))
    return logp[np.arange(len(tokens) - 1), tokens[1:]]


def hellaswag_score(ctx: Context, tok, text: str, n_tasks: int | None = None,
                    progress=None) -> dict:
    """HellaSwag acc_norm over the reference's 6-line-per-task data format
    (tools/perplexity/perplexity.cpp hellaswag_score:741-: context line,
    gold label line, four ending lines). Per ending: mean token logprob of
    the ending given the context; accuracy when the argmax is gold."""
    lines = text.splitlines()
    if len(lines) % 6:
        raise ValueError("hellaswag data: line count not a multiple of 6")
    tasks = [lines[i:i + 6] for i in range(0, len(lines), 6)]
    import random

    random.Random(1).shuffle(tasks)
    if n_tasks:
        tasks = tasks[:n_tasks]

    acc = 0
    for i, t in enumerate(tasks):
        context, gold = t[0], int(t[1])
        ctx_toks = tok.encode(context, add_special=True)
        scores = []
        for ending in t[2:6]:
            full = tok.encode(context + " " + ending, add_special=True)
            # common prefix with the context tokenization
            k = 0
            while k < min(len(ctx_toks), len(full)) and ctx_toks[k] == full[k]:
                k += 1
            lp = _seq_logprobs(ctx, full)
            ending_lp = lp[max(k - 1, 0):]
            scores.append(float(np.mean(ending_lp)) if len(ending_lp) else -1e30)
        if int(np.argmax(scores)) == gold:
            acc += 1
        if progress:
            progress(i + 1, len(tasks), 100.0 * acc / (i + 1))
    n = max(1, len(tasks))
    return {"acc": 100.0 * acc / n, "n_tasks": n}


def winogrande_score(ctx: Context, tok, csv_text: str,
                     n_tasks: int | None = None, progress=None) -> dict:
    """Winogrande accuracy over the reference's CSV format
    (perplexity.cpp winogrande_score:1098: index,"sentence with _",opt1,
    opt2,answer). Scores the mean logprob of the trailing context after
    substituting each choice for the blank."""
    import csv
    import io
    import random

    rows = [r for r in csv.reader(io.StringIO(csv_text)) if len(r) >= 5]
    tasks = []
    for r in rows:
        sent, o1, o2, ans = r[1], r[2], r[3], r[4]
        if "_" not in sent:
            continue
        first, second = sent.split("_", 1)
        tasks.append((first, second, o1, o2, int(ans)))
    random.Random(1).shuffle(tasks)
    if n_tasks:
        tasks = tasks[:n_tasks]

    acc = 0
    for i, (first, second, o1, o2, ans) in enumerate(tasks):
        scores = []
        for choice in (o1, o2):
            base = tok.encode(first + choice, add_special=True)
            full = tok.encode(first + choice + second, add_special=True)
            lp = _seq_logprobs(ctx, full)
            tail = lp[len(base) - 1:]
            scores.append(float(np.mean(tail)) if len(tail) else -1e30)
        if int(np.argmax(scores)) + 1 == ans:
            acc += 1
        if progress:
            progress(i + 1, len(tasks), 100.0 * acc / (i + 1))
    n = max(1, len(tasks))
    return {"acc": 100.0 * acc / n, "n_tasks": n}


def multiple_choice_score(ctx: Context, tok, jsonl_text: str,
                          n_tasks: int | None = None, progress=None) -> dict:
    """Generic multiple-choice (MMLU-style) accuracy from JSONL tasks:
    {"question": ..., "choices": [...], "answer": idx}  — the same scoring
    rule as the reference's multiple_choice_score (perplexity.cpp:1402)."""
    import json as _json

    tasks = []
    for line in jsonl_text.splitlines():
        line = line.strip()
        if not line:
            continue
        d = _json.loads(line)
        tasks.append((str(d["question"]), [str(c) for c in d["choices"]],
                      int(d["answer"])))
    if n_tasks:
        tasks = tasks[:n_tasks]

    acc = 0
    for i, (q, choices, ans) in enumerate(tasks):
        q_toks = tok.encode(q, add_special=True)
        scores = []
        for c in choices:
            full = tok.encode(q + " " + c, add_special=True)
            k = 0
            while k < min(len(q_toks), len(full)) and q_toks[k] == full[k]:
                k += 1
            lp = _seq_logprobs(ctx, full)
            tail = lp[max(k - 1, 0):]
            scores.append(float(np.mean(tail)) if len(tail) else -1e30)
        if int(np.argmax(scores)) == ans:
            acc += 1
        if progress:
            progress(i + 1, len(tasks), 100.0 * acc / (i + 1))
    n = max(1, len(tasks))
    return {"acc": 100.0 * acc / n, "n_tasks": n}


def kl_divergence(
    ctx: Context,
    tokens: list[int],
    base_logits: list[np.ndarray],
    n_ctx: int = 512,
    add_bos: bool = True,
    bos_id: int = 1,
) -> dict:
    """Compare this model's logits against saved base logits
    (perplexity.cpp --kl-divergence semantics)."""
    n_chunk = len(base_logits)
    first = n_ctx // 2
    kld_sum = 0.0
    same_top = 0
    dp2_sum = 0.0
    count = 0
    nll = 0.0

    for ic in range(n_chunk):
        chunk = list(tokens[ic * n_ctx : (ic + 1) * n_ctx])
        if add_bos:
            chunk[0] = bos_id
        ctx.clear()
        b = Batch()
        for j, t in enumerate(chunk):
            b.add(t, j, (0,), logits=True)
        if ctx.decode(b) != 0:
            raise RuntimeError("decode failed")
        ours = np.stack([ctx.get_logits(j) for j in range(n_ctx - 1)]).astype(np.float64)
        base = base_logits[ic].astype(np.float64)[: n_ctx - 1]
        lp_ours = _log_softmax(ours)
        lp_base = _log_softmax(base)
        p_base = np.exp(lp_base)
        for j in range(first, n_ctx - 1):
            tgt = chunk[j + 1]
            kld_sum += float(np.sum(p_base[j] * (lp_base[j] - lp_ours[j])))
            same_top += int(np.argmax(ours[j]) == np.argmax(base[j]))
            dp = math.exp(lp_ours[j, tgt]) - math.exp(lp_base[j, tgt])
            dp2_sum += dp * dp
            nll += -lp_ours[j, tgt]
            count += 1

    return {
        "kld": kld_sum / count,
        "same_top": same_top / count,
        "rms_dp": math.sqrt(dp2_sum / count),
        "ppl": math.exp(nll / count),
        "count": count,
    }


def main(argv=None):
    import argparse
    import jax.numpy as jnp

    ap = argparse.ArgumentParser(description="Perplexity / KLD evaluator")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="text file to evaluate")
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    ap.add_argument("--chunks", type=int, default=None)
    ap.add_argument("--save-logits", default=None, help="write base logits npz")
    ap.add_argument("--kl-divergence-base", default=None, help="compare vs npz")
    ap.add_argument("--f32", action="store_true", help="compute in float32")
    ap.add_argument("--hellaswag", action="store_true",
                    help="score HellaSwag acc (6-line-per-task file)")
    ap.add_argument("--hellaswag-tasks", type=int, default=400)
    ap.add_argument("--winogrande", action="store_true",
                    help="score Winogrande acc (csv file)")
    ap.add_argument("--winogrande-tasks", type=int, default=0)
    ap.add_argument("--multiple-choice", action="store_true",
                    help="score multiple-choice acc (jsonl file)")
    ap.add_argument("--multiple-choice-tasks", type=int, default=0)
    from .mesh_args import add_mesh_args, mesh_from_args

    add_mesh_args(ap)
    from .args import add_device, apply_device

    add_device(ap)
    args = ap.parse_args(argv)
    apply_device(args.device)
    mesh = mesh_from_args(args)

    reader = GGUFReader(args.model)
    tok = tokenizer_from_gguf(reader)
    text = open(args.file, encoding="utf-8").read()

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    ctx = Context(reader, n_cells=args.ctx_size, n_ubatch=args.ctx_size,
                  dtype=dtype, mesh=mesh)
    bos = tok.vocab.bos_id if tok.vocab.bos_id >= 0 else 1
    add_bos = tok.vocab.add_bos

    def acc_progress(i, n, acc):
        print(f"{i}\t{acc:.8f}%", flush=True)

    if args.hellaswag:
        res = hellaswag_score(ctx, tok, text, args.hellaswag_tasks or None,
                              acc_progress)
        print(f"hellaswag acc = {res['acc']:.4f}% ({res['n_tasks']} tasks)")
        return
    if args.winogrande:
        res = winogrande_score(ctx, tok, text, args.winogrande_tasks or None,
                               acc_progress)
        print(f"winogrande acc = {res['acc']:.4f}% ({res['n_tasks']} tasks)")
        return
    if args.multiple_choice:
        res = multiple_choice_score(
            ctx, tok, text, args.multiple_choice_tasks or None, acc_progress)
        print(f"multiple-choice acc = {res['acc']:.4f}% ({res['n_tasks']} tasks)")
        return

    tokens = tok.encode(text, add_special=False)
    print(f"tokenized {len(tokens)} tokens")

    def progress(i, n, ppl):
        print(f"[{i}/{n}] ppl={ppl:.4f}", flush=True)

    if args.kl_divergence_base:
        data = np.load(args.kl_divergence_base)
        base = [data[k] for k in sorted(data.files)]
        res = kl_divergence(ctx, tokens, base, args.ctx_size, add_bos, bos)
        print(
            f"PPL = {res['ppl']:.4f}, KLD = {res['kld']:.5f}, "
            f"same-top = {res['same_top']*100:.2f}%, RMS Δp = {res['rms_dp']*100:.2f}%"
        )
        return

    saved = [] if args.save_logits else None
    res = perplexity(ctx, tokens, args.ctx_size, add_bos, bos, args.chunks, saved, progress)
    print(f"Final estimate: PPL = {res['ppl']:.4f} +/- {res['err']:.4f}")
    if args.save_logits:
        np.savez_compressed(args.save_logits, *saved)


if __name__ == "__main__":
    main()

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
    args = ap.parse_args(argv)

    reader = GGUFReader(args.model)
    tok = tokenizer_from_gguf(reader)
    text = open(args.file, encoding="utf-8").read()
    tokens = tok.encode(text, add_special=False)
    print(f"tokenized {len(tokens)} tokens")

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    ctx = Context(reader, n_cells=args.ctx_size, n_ubatch=args.ctx_size, dtype=dtype)
    bos = tok.vocab.bos_id if tok.vocab.bos_id >= 0 else 1
    add_bos = tok.vocab.add_bos

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

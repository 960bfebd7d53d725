"""Stage 1 of the parity report: train a real (small) char-level llama on
the reference-docs corpus and write base f32 + quantized checkpoints.

With zero network egress no public checkpoint can be fetched, so the
quant-quality ladder (docs/PARITY.md) is measured on a model with REAL
learned structure: a llama-architecture char LM trained to convergence on
held-out-split text. See scripts/parity_eval.py for stage 2.

Usage: python scripts/parity_train.py [--steps N] [--platform tpu|cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

WORK = "/tmp/parity"

# every quant type in the ladder; mirrors the reference's published
# wikitext-2 scoreboard rows (/root/reference/tools/perplexity/README.md)
LADDER = ["Q8_0", "Q6_K", "Q5_K_M", "Q5_0", "Q4_K_M", "Q4_K_S", "IQ4_XS",
          "Q4_0", "Q3_K_M", "Q2_K"]


def build_bpe_vocab(work: str, vocab_size: int) -> dict:
    """Train a byte-level BPE on the corpus and return GGUF vocab KVs
    (tokenizer.ggml.model = "gpt2", same storage the reference's converter
    writes for BPE models: tokens + token_type + merges).

    A char vocab (round 2/3) makes the task too easy for PPL to register
    quant damage (VERDICT r3 missing #3); a real sub-word vocab at >=8k
    puts the checkpoint in the same regime as the reference's ladder."""
    from tokenizers import ByteLevelBPETokenizer

    from llm_tpu.gguf.constants import Keys
    from llm_tpu.tokenizers.vocab import TokenType

    import json as _json
    import numpy as np

    K = Keys.Tokenizer
    vdir = os.path.join(work, f"bpe_{vocab_size}")
    if not os.path.exists(os.path.join(vdir, "vocab.json")):
        os.makedirs(vdir, exist_ok=True)
        t = ByteLevelBPETokenizer()
        t.train([os.path.join(work, "train.txt")], vocab_size=vocab_size,
                min_frequency=2,
                special_tokens=["<unk>", "<s>", "</s>"])
        t.save_model(vdir)
    tok2id = _json.load(open(os.path.join(vdir, "vocab.json")))
    tokens = [None] * len(tok2id)
    for tk, i in tok2id.items():
        tokens[i] = tk
    merges = [ln.rstrip("\n") for ln in open(os.path.join(vdir, "merges.txt"))
              if ln.strip() and not ln.startswith("#")]
    types = [int(TokenType.CONTROL) if tk in ("<unk>", "<s>", "</s>")
             else int(TokenType.NORMAL) for tk in tokens]
    return {
        K.MODEL: "gpt2",
        K.PRE: "gpt-2",
        K.LIST: tokens,
        K.TOKEN_TYPE: np.asarray(types, np.int32),
        K.MERGES: merges,
        K.BOS_ID: tokens.index("<s>"),
        K.EOS_ID: tokens.index("</s>"),
        K.UNK_ID: tokens.index("<unk>"),
        K.ADD_BOS: False,
    }


def build_base(path, hidden=512, ffn=1536, layers=6, heads=8, kv_heads=4,
               vocab_size=97, work=WORK, tokenizer="char"):
    import torch
    import transformers

    from llm_tpu.convert.hf_llama import convert_hf_llama
    from test_tools import _test_vocab

    if tokenizer == "bpe":
        vocab = build_bpe_vocab(work, vocab_size)
        vocab_size = len(vocab["tokenizer.ggml.tokens"])
    else:
        vocab = _test_vocab(vocab_size)
    cfg = transformers.LlamaConfig(
        vocab_size=vocab_size, hidden_size=hidden, intermediate_size=ffn,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        max_position_embeddings=512, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False,
    )
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(cfg).eval()
    convert_hf_llama(m, path, vocab=vocab)
    n = sum(p.numel() for p in m.parameters())
    print(f"base model written: {path} ({n/1e6:.1f}M params, "
          f"vocab {vocab_size})", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--platform", default=None)
    # model geometry: default sized so single-core CPU training converges
    # in hours; quant damage registers more sharply on a converged small
    # model than a half-trained big one
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--ffn", type=int, default=768)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--kv-heads", type=int, default=4)
    ap.add_argument("--tokenizer", choices=("char", "bpe"), default="char")
    ap.add_argument("--vocab-size", type=int, default=97)
    ap.add_argument("--work", default=WORK,
                    help="artifact dir (corpus train.txt/val.txt must exist)")
    ap.add_argument("--fast-tokenize", action="store_true",
                    help="encode the training stream with the HF tokenizers "
                         "runtime (Rust) instead of the pure-Python BPE — "
                         "same vocab/merges files, ~100x faster on a 128MB "
                         "corpus; a sample cross-check against the llm_tpu "
                         "tokenizer is printed")
    ap.add_argument("--prep-only", action="store_true",
                    help="build vocab + base + token stream cache, skip "
                         "training (so prep can run while the chip is busy)")
    args = ap.parse_args()
    work = args.work
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from llm_tpu.gguf.reader import GGUFReader
    from llm_tpu.models.loader import load_params
    from llm_tpu.runtime.training import FullTrainer
    from llm_tpu.tokenizers import tokenizer_from_gguf
    from llm_tpu.tools.quantize import quantize_model

    base = os.path.join(work, "base_untrained.gguf")
    if not os.path.exists(base):
        build_base(base, hidden=args.hidden, ffn=args.ffn,
                   layers=args.layers, heads=args.heads,
                   kv_heads=args.kv_heads, vocab_size=args.vocab_size,
                   work=work, tokenizer=args.tokenizer)

    reader = GGUFReader(base)
    cache = os.path.join(work, f"stream_cache_{args.tokenizer}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        stream, val = z["stream"], z["val"]
    else:
        train_text = open(os.path.join(work, "train.txt")).read()
        val_text = open(os.path.join(work, "val.txt")).read()
        if args.fast_tokenize and args.tokenizer == "bpe":
            from tokenizers import ByteLevelBPETokenizer

            vdir = os.path.join(work, f"bpe_{args.vocab_size}")
            ht = ByteLevelBPETokenizer(os.path.join(vdir, "vocab.json"),
                                       os.path.join(vdir, "merges.txt"))

            def enc(text):
                # chunk at newline boundaries (ByteLevel pre-tokenization
                # splits there anyway, so chunking is id-exact)
                ids = []
                lines = text.split("\n")
                buf = []
                size = 0
                for ln in lines:
                    buf.append(ln)
                    size += len(ln) + 1
                    if size > 1 << 20:
                        ids.extend(ht.encode("\n".join(buf) + "\n").ids)
                        buf, size = [], 0
                if buf:
                    ids.extend(ht.encode("\n".join(buf)).ids)
                return np.asarray(ids, np.int32)

            stream, val = enc(train_text), enc(val_text)
            # cross-check the runtime tokenizer on a sample
            tok = tokenizer_from_gguf(reader)
            sample = val_text[:50_000]
            ours = tok.encode(sample, add_special=False)
            hf = ht.encode(sample).ids
            agree = sum(a == b for a, b in zip(ours, hf)) / max(len(hf), 1)
            print(f"tokenizer cross-check on 50KB: {agree:.4f} id-match "
                  f"({len(ours)} vs {len(hf)} tokens)", file=sys.stderr)
        else:
            tok = tokenizer_from_gguf(reader)
            stream = np.asarray(tok.encode(train_text, add_special=False),
                                np.int32)
            val = np.asarray(tok.encode(val_text, add_special=False), np.int32)
        np.savez(cache, stream=stream, val=val)
    print(f"train {len(stream)} tokens, val {len(val)}", file=sys.stderr,
          flush=True)
    if args.prep_only:
        print("prep-only: vocab/base/stream cache ready", file=sys.stderr)
        return

    params, cfg = load_params(reader, dense_dtype=jnp.float32,
                              use_planes=False)
    print("params loaded", file=sys.stderr, flush=True)
    tr = FullTrainer(params, cfg, lr=args.lr, optimizer="adamw",
                     weight_decay=0.01)
    print("trainer ready", file=sys.stderr, flush=True)

    span = args.ctx * args.batch
    rng = np.random.default_rng(0)
    t0 = time.time()
    val_tok = val[: args.ctx]
    f32 = os.path.join(work, "trained_f32.gguf")
    for step in range(args.steps):
        i = int(rng.integers(0, len(stream) - span))
        loss = tr.train_step(stream[i : i + span].reshape(args.batch, args.ctx))
        if step % 100 == 0:
            vl = tr.eval_loss(val_tok)
            print(f"step {step}: train {loss:.4f} val {vl:.4f} "
                  f"({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)
        if step and step % 500 == 0:
            # periodic checkpoint: a wall-clock-limited run still yields
            # the latest converged-so-far model
            tr.save(reader, f32)
            print(f"checkpoint @ {step}: {f32}", file=sys.stderr, flush=True)
    vl = tr.eval_loss(val_tok)
    print(f"final: train {loss:.4f} val {vl:.4f} ({time.time()-t0:.0f}s)",
          file=sys.stderr)

    tr.save(reader, f32)
    print(f"wrote {f32}", file=sys.stderr)

    for ftype in LADDER:
        out = os.path.join(work, f"trained_{ftype.lower()}.gguf")
        quantize_model(f32, out, ftype)
        print(f"quantized {ftype}: {out}", file=sys.stderr)


if __name__ == "__main__":
    main()

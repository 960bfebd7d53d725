"""Speculative decoding + n-gram cache tests (models: reference
common/speculative.cpp usage + examples/lookup)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_tpu.convert.hf_llama import convert_hf_llama
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.runtime.batch import Batch
from llm_tpu.runtime.engine import Context
from llm_tpu.runtime.speculative import NgramCache, gen_draft_tokens, verify_draft
from llm_tpu.samplers import SamplingParams, build_chain

from test_model_vs_hf import _tiny_hf_llama


def test_ngram_cache_drafts_repeats():
    c = NgramCache()
    seq = [1, 2, 3, 4, 1, 2, 3, 4, 1, 2, 3, 4]
    c.update(seq)
    draft = c.draft([3, 4], 4)
    assert draft[:2] == [1, 2]


def test_ngram_cache_no_draft_on_unknown():
    c = NgramCache()
    c.update([1, 2, 3])
    assert c.draft([9, 9], 4) == []


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    model = _tiny_hf_llama()
    path = str(tmp_path_factory.mktemp("spec") / "m.gguf")
    convert_hf_llama(model, path)
    return path


def test_speculative_self_draft_matches_plain_greedy(tiny):
    """Using the SAME model as draft: every draft token must be accepted and
    the output must equal plain greedy decoding."""
    prompt = [5, 3, 8, 2]
    n_gen = 10

    # plain greedy
    ctx = Context(GGUFReader(tiny), n_cells=64, dtype=jnp.float32)
    ctx.decode(Batch.text(prompt))
    plain = []
    tok = int(np.argmax(ctx.get_logits()))
    plain.append(tok)
    for i in range(n_gen - 1):
        ctx.decode(Batch.one(tok, pos=len(prompt) + i))
        tok = int(np.argmax(ctx.get_logits()))
        plain.append(tok)

    # speculative with self as draft
    tgt = Context(GGUFReader(tiny), n_cells=64, dtype=jnp.float32)
    drf = Context(GGUFReader(tiny), n_cells=64, dtype=jnp.float32)
    chain = build_chain(SamplingParams(temp=0.0), tgt.cfg.vocab_size)

    tgt.decode(Batch.text(prompt[:-1]))  # leave last prompt token for verify
    out = []
    context = list(prompt)
    n_past = len(prompt) - 1
    last = prompt[-1]
    drafted = 0
    accepted_total = 0
    while len(out) < n_gen:
        draft = gen_draft_tokens(drf, None, context + out, drafted, n_draft=4)
        drafted = len(context + out) + len(draft)
        acc, nxt, n_acc = verify_draft(tgt, chain, last, draft, n_past)
        accepted_total += n_acc
        out.extend(acc)
        if nxt is not None:
            out.append(nxt)
            # rejected tail: the draft context diverges; resync the draft
            drf.seq_rm(0, len(context) + len(out) - 1, -1)
            drafted = min(drafted, len(context) + len(out) - 1)
            last = nxt
            n_past = len(context) + len(out) - 1
        else:
            last = acc[-1]
            n_past = len(context) + len(out) - 1
    assert out[:n_gen] == plain
    assert accepted_total > 0  # self-draft must accept tokens


def test_verify_draft_rejects_bad_draft(tiny):
    ctx = Context(GGUFReader(tiny), n_cells=64, dtype=jnp.float32)
    chain = build_chain(SamplingParams(temp=0.0), ctx.cfg.vocab_size)
    prompt = [5, 3, 8, 2]
    ctx.decode(Batch.text(prompt[:-1]))
    # nonsense draft: verify must reject at the first mismatch and still
    # return the correct next token
    acc, nxt, n_acc = verify_draft(ctx, chain, prompt[-1], [96, 95, 94], 3)
    ctx2 = Context(GGUFReader(tiny), n_cells=64, dtype=jnp.float32)
    ctx2.decode(Batch.text(prompt))
    want = int(np.argmax(ctx2.get_logits()))
    assert (acc + ([nxt] if nxt is not None else []))[0] == want
    # KV must not contain the rejected positions
    assert ctx.seq_pos_max(0) == 3 + n_acc
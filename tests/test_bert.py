"""BERT encoder tests: HF hidden-state oracle, pooling, rank head."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_tpu.convert.hf_llama import convert_hf_bert
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.models.bert import BertContext, bert_encode, load_bert_params


@pytest.fixture(scope="module")
def bert_pair(tmp_path_factory):
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    cfg = BertConfig(
        vocab_size=97, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64,
    )
    m = BertModel(cfg, add_pooling_layer=False).eval()
    rng = np.random.default_rng(0)
    path = str(tmp_path_factory.mktemp("bert") / "tiny_bert.gguf")
    convert_hf_bert(
        m, path,
        cls_w=rng.normal(size=(48, 48)).astype(np.float32) * 0.05,
        cls_b=np.zeros(48, np.float32),
        cls_out_w=rng.normal(size=(1, 48)).astype(np.float32) * 0.05,
        cls_out_b=np.zeros(1, np.float32),
    )
    return m, path


def test_bert_hidden_states_match_hf(bert_pair):
    m, path = bert_pair
    params, cfg = load_bert_params(GGUFReader(path))
    toks = [2, 10, 25, 40, 7]
    with torch.no_grad():
        want = m(torch.tensor([toks])).last_hidden_state[0].numpy()
    got = np.asarray(bert_encode(params, cfg, jnp.asarray(toks, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_bert_context_pooling_and_rank(bert_pair):
    _, path = bert_pair
    ctx = BertContext(GGUFReader(path))
    toks = [2, 10, 25, 40]
    emb = ctx.encode(toks, pooling="mean")
    assert emb.shape == (48,)
    cls = ctx.encode(toks, pooling="cls")
    assert not np.allclose(emb, cls)
    score = ctx.rerank_score(toks)
    assert np.isfinite(score)
    # deterministic: same input -> same score
    assert score == ctx.rerank_score(toks)

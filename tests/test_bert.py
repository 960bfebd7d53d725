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


def test_roberta_hidden_states_match_hf(tmp_path):
    """RobertaModel -> bert arch with the position_embd trim by
    pad_token_id+1 (reference RobertaModel._position_offset)."""
    from transformers import RobertaConfig, RobertaModel

    from llm_tpu.convert.hf_llama import convert_hf_auto

    torch.manual_seed(1)
    cfg = RobertaConfig(
        vocab_size=97, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=66, pad_token_id=1,
    )
    m = RobertaModel(cfg, add_pooling_layer=False).eval()
    path = str(tmp_path / "roberta.gguf")
    convert_hf_auto(m, path)
    r = GGUFReader(path)
    assert r.architecture == "bert"
    assert r.akey("{arch}.context_length") == 64  # 66 - (pad 1 + 1)
    params, mcfg = load_bert_params(r)
    toks = [5, 12, 30, 44, 9]
    with torch.no_grad():
        want = m(torch.tensor([toks])).last_hidden_state[0].numpy()
    got = np.asarray(bert_encode(params, mcfg, jnp.asarray(toks, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_roberta_classifier_head(tmp_path):
    """RobertaForSequenceClassification classifier.dense/out_proj ->
    cls/cls.output (tensor_mapping CLS rows); rerank_score runs."""
    from transformers import RobertaConfig, RobertaForSequenceClassification

    from llm_tpu.convert.hf_llama import convert_hf_auto
    from llm_tpu.models.bert import BertContext

    torch.manual_seed(2)
    cfg = RobertaConfig(
        vocab_size=97, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=66, pad_token_id=1, num_labels=1,
    )
    m = RobertaForSequenceClassification(cfg).eval()
    path = str(tmp_path / "roberta_cls.gguf")
    convert_hf_auto(m, path)
    names = set(GGUFReader(path).tensors)
    assert {"cls.weight", "cls.output.weight"} <= names
    ctx = BertContext(GGUFReader(path))
    assert np.isfinite(ctx.rerank_score([5, 12, 30]))


def test_distilbert_hidden_states_match_hf(tmp_path):
    """DistilBertModel -> bert arch: q_lin/k_lin naming, sa_layer_norm,
    no token types, 1e-12 eps (reference DistilBertModel)."""
    from transformers import DistilBertConfig, DistilBertModel

    from llm_tpu.convert.hf_llama import convert_hf_auto

    torch.manual_seed(3)
    cfg = DistilBertConfig(
        vocab_size=97, dim=48, n_layers=2, n_heads=4, hidden_dim=96,
        max_position_embeddings=64,
    )
    m = DistilBertModel(cfg).eval()
    path = str(tmp_path / "distilbert.gguf")
    convert_hf_auto(m, path)
    r = GGUFReader(path)
    assert "token_types.weight" not in set(r.tensors)
    params, mcfg = load_bert_params(r)
    toks = [5, 12, 30, 44, 9]
    with torch.no_grad():
        want = m(torch.tensor([toks])).last_hidden_state[0].numpy()
    got = np.asarray(bert_encode(params, mcfg, jnp.asarray(toks, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_xlm_roberta_dispatch(tmp_path):
    """XLMRobertaModel rides the roberta path (same trim; reference
    XLMRobertaModel)."""
    from transformers import XLMRobertaConfig, XLMRobertaModel

    from llm_tpu.convert.hf_llama import convert_hf_auto

    torch.manual_seed(4)
    cfg = XLMRobertaConfig(
        vocab_size=97, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=66, pad_token_id=1,
    )
    m = XLMRobertaModel(cfg, add_pooling_layer=False).eval()
    path = str(tmp_path / "xlmr.gguf")
    convert_hf_auto(m, path)
    params, mcfg = load_bert_params(GGUFReader(path))
    toks = [5, 12, 30]
    with torch.no_grad():
        want = m(torch.tensor([toks])).last_hidden_state[0].numpy()
    got = np.asarray(bert_encode(params, mcfg, jnp.asarray(toks, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


# ------------------------- trust_remote_code stubs (nomic / jina / neo)

class _Stub:
    def __init__(self, cfg: dict, sd: dict):
        from types import SimpleNamespace

        self.config = SimpleNamespace(**cfg)
        self._sd = {k: torch.from_numpy(np.asarray(v, np.float32))
                    for k, v in sd.items()}

    def state_dict(self):
        return self._sd


def _encode_ok(path):
    r = GGUFReader(path)
    params, mcfg = load_bert_params(r)
    out = np.asarray(bert_encode(params, mcfg,
                                 jnp.asarray([3, 7, 11, 19], jnp.int32)))
    assert np.isfinite(out).all()
    return r, out


def test_nomic_bert_conversion(tmp_path):
    """nomic-bert: fused Wqkv, fc11/fc12 swiglu, emb_ln, norm1/norm2
    post-norms, n_positions clamp (reference NomicBertModel)."""
    from llm_tpu.convert.hf_llama import convert_hf_auto

    rng = np.random.default_rng(20)
    E, H, FF, V, L = 48, 4, 96, 97, 2
    sd = {
        "embeddings.word_embeddings.weight": rng.normal(size=(V, E)) * 0.2,
        "embeddings.token_type_embeddings.weight":
            rng.normal(size=(2, E)) * 0.1,
        "emb_ln.weight": 1 + rng.normal(size=E) * 0.05,
        "emb_ln.bias": rng.normal(size=E) * 0.02,
    }
    for i in range(L):
        b = f"encoder.layers.{i}."
        sd[b + "attn.Wqkv.weight"] = rng.normal(size=(3 * E, E)) * 0.15
        sd[b + "attn.out_proj.weight"] = rng.normal(size=(E, E)) * 0.15
        sd[b + "norm1.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[b + "norm1.bias"] = rng.normal(size=E) * 0.02
        sd[b + "norm2.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[b + "norm2.bias"] = rng.normal(size=E) * 0.02
        sd[b + "mlp.fc11.weight"] = rng.normal(size=(FF, E)) * 0.15
        sd[b + "mlp.fc12.weight"] = rng.normal(size=(FF, E)) * 0.15
        sd[b + "mlp.fc2.weight"] = rng.normal(size=(E, FF)) * 0.15
    cfg = dict(model_type="nomic_bert", n_embd=E, n_head=H, n_layer=L,
               n_inner=FF, vocab_size=V, n_positions=8192,
               max_trained_positions=2048, rotary_emb_base=1000.0,
               layer_norm_epsilon=1e-12, name_or_path="stub")
    p = str(tmp_path / "nomic.gguf")
    convert_hf_auto(_Stub(cfg, sd), p)
    r, _ = _encode_ok(p)
    assert r.architecture == "nomic-bert"
    assert r.akey("{arch}.context_length") == 2048


def test_jina_bert_v2_conversion(tmp_path):
    """jina-bert-v2: GEGLU gated_layers split, mlp.wo/mlp.layernorm,
    ALiBi KV (reference JinaBertV2Model + tensor_mapping jina rows)."""
    from llm_tpu.convert.hf_llama import convert_hf_auto

    rng = np.random.default_rng(21)
    E, H, FF, V, L = 48, 4, 96, 97, 2
    sd = {
        "embeddings.word_embeddings.weight": rng.normal(size=(V, E)) * 0.2,
        "embeddings.token_type_embeddings.weight":
            rng.normal(size=(2, E)) * 0.1,
        "embeddings.LayerNorm.weight": 1 + rng.normal(size=E) * 0.05,
        "embeddings.LayerNorm.bias": rng.normal(size=E) * 0.02,
    }
    for i in range(L):
        b = f"encoder.layer.{i}."
        for nm in ("query", "key", "value"):
            sd[b + f"attention.self.{nm}.weight"] = \
                rng.normal(size=(E, E)) * 0.15
            sd[b + f"attention.self.{nm}.bias"] = rng.normal(size=E) * 0.02
        sd[b + "attention.output.dense.weight"] = \
            rng.normal(size=(E, E)) * 0.15
        sd[b + "attention.output.dense.bias"] = rng.normal(size=E) * 0.02
        sd[b + "attention.output.LayerNorm.weight"] = \
            1 + rng.normal(size=E) * 0.05
        sd[b + "attention.output.LayerNorm.bias"] = rng.normal(size=E) * 0.02
        sd[b + "mlp.gated_layers.weight"] = rng.normal(size=(2 * FF, E)) * 0.15
        sd[b + "mlp.wo.weight"] = rng.normal(size=(E, FF)) * 0.15
        sd[b + "mlp.wo.bias"] = rng.normal(size=E) * 0.02
        sd[b + "mlp.layernorm.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[b + "mlp.layernorm.bias"] = rng.normal(size=E) * 0.02
    cfg = dict(model_type="jina_bert_v2", hidden_size=E,
               num_attention_heads=H, num_hidden_layers=L,
               intermediate_size=FF, vocab_size=V,
               max_position_embeddings=64, layer_norm_eps=1e-12,
               name_or_path="stub")
    p = str(tmp_path / "jina.gguf")
    convert_hf_auto(_Stub(cfg, sd), p)
    r, _ = _encode_ok(p)
    assert r.architecture == "jina-bert-v2"
    assert r.akey("{arch}.attention.max_alibi_bias") == 8.0


def test_neo_bert_conversion(tmp_path):
    """neo-bert: model. prefix strip, decoder.* dropped, ff=2/3
    intermediate, packed w12, CLS pooling (reference NeoBert)."""
    from llm_tpu.convert.hf_llama import convert_hf_auto

    rng = np.random.default_rng(22)
    E, H, V, L = 48, 4, 97, 2
    FF = int(2 * 96 / 3)
    sd = {
        "model.encoder.weight": rng.normal(size=(V, E)) * 0.2,
        "model.layer_norm.weight": 1 + rng.normal(size=E) * 0.05,
        "decoder.weight": rng.normal(size=(V, E)) * 0.2,  # dropped
    }
    for i in range(L):
        b = f"model.transformer_encoder.{i}."
        sd[b + "attention_norm.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[b + "qkv.weight"] = rng.normal(size=(3 * E, E)) * 0.15
        sd[b + "wo.weight"] = rng.normal(size=(E, E)) * 0.15
        sd[b + "ffn_norm.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[b + "ffn.w12.weight"] = rng.normal(size=(2 * FF, E)) * 0.15
        sd[b + "ffn.w3.weight"] = rng.normal(size=(E, FF)) * 0.15
    cfg = dict(model_type="neobert", hidden_size=E, num_attention_heads=H,
               num_hidden_layers=L, intermediate_size=96, vocab_size=V,
               max_position_embeddings=64, norm_eps=1e-6,
               name_or_path="stub")
    p = str(tmp_path / "neo.gguf")
    convert_hf_auto(_Stub(cfg, sd), p)
    r, _ = _encode_ok(p)
    assert r.architecture == "neo-bert"
    assert "decoder.weight" not in set(r.tensors)
    assert r.akey("{arch}.feed_forward_length") == FF

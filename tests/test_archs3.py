"""Architecture batch 3: the round-3 converter long tail.

HF logit oracles where transformers ships the class (glm4, granitemoeshared,
falcon_mamba, deepseek-v3, mistral3/smolvlm text towers, mt5/umt5/t5encoder);
trust_remote_code-only classes (deci, arctic, deepseek v1, minicpm3, plm,
stablelm_epoch, internlm3) are exercised through stub models that carry
exactly the HF tensor naming the reference's converters consume
(convert_hf_to_gguf.py @ModelBase.register table + gguf-py tensor_mapping)."""

from types import SimpleNamespace

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_tpu.convert.hf_llama import convert_hf_auto
from llm_tpu.gguf.constants import Keys
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.quant import codecs as _codecs


def _rd(r, name):
    ti = r.tensors[name]
    return _codecs.dequantize_tensor(r.data(name), ti.ggml_type, ti.shape)
from llm_tpu.models.config import config_from_gguf
from llm_tpu.runtime.batch import Batch
from llm_tpu.runtime.engine import Context

from test_model_vs_hf import _run_ours


def _logit_check(model, path, T=9, atol=3e-3, vocab=None):
    rng = np.random.default_rng(0)
    v = getattr(model.config, "vocab_size", None) or \
        model.config.text_config.vocab_size
    tokens = rng.integers(0, v, size=T).tolist()
    ours = _run_ours(path, tokens)
    with torch.no_grad():
        ref = model(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=atol)


# ------------------------------------------------------------ HF oracles

def test_glm4_from_glm_hf(tmp_path):
    """GlmForCausalLM (glm-4-hf) -> glm4 arch: partial rotary, qkv bias,
    fused gate_up (reference GlmForCausalLM registration)."""
    cfg = transformers.GlmConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, partial_rotary_factor=0.5,
        attention_bias=True, tie_word_embeddings=False, head_dim=16,
        pad_token_id=0, eos_token_id=1,
    )
    torch.manual_seed(0)
    m = transformers.GlmForCausalLM(cfg).eval()
    p = str(tmp_path / "glm.gguf")
    convert_hf_auto(m, p)
    assert GGUFReader(p).architecture == "glm4"
    _logit_check(m, p)


def test_granitemoeshared(tmp_path):
    """GraniteMoeShared: granitemoe + fused shared_mlp split into
    gate/up shexp (reference GraniteMoeModel shared_mlp branch)."""
    cfg = transformers.GraniteMoeSharedConfig(
        vocab_size=97, hidden_size=64, intermediate_size=96,
        shared_intermediate_size=80, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, tie_word_embeddings=False,
        embedding_multiplier=2.0, residual_multiplier=0.5,
        logits_scaling=1.5, attention_multiplier=0.1,
    )
    torch.manual_seed(0)
    m = transformers.GraniteMoeSharedForCausalLM(cfg).eval()
    p = str(tmp_path / "gms.gguf")
    convert_hf_auto(m, p)
    r = GGUFReader(p)
    assert r.architecture == "granitemoe"
    assert r.akey("{arch}.expert_shared_feed_forward_length") == 80
    names = set(r.tensors)
    assert "blk.0.ffn_gate_shexp.weight" in names
    _logit_check(m, p)


def test_falcon_mamba(tmp_path):
    """FalconMamba rides the mamba arch with ssm.dt_b_c_rms (reference
    MambaModel registration incl. FalconMambaForCausalLM)."""
    cfg = transformers.FalconMambaConfig(
        vocab_size=97, hidden_size=64, num_hidden_layers=2, state_size=8,
        conv_kernel=4, intermediate_size=128, time_step_rank=4,
        use_cache=False, tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    m = transformers.FalconMambaForCausalLM(cfg).eval()
    p = str(tmp_path / "fm.gguf")
    convert_hf_auto(m, p)
    r = GGUFReader(p)
    assert r.architecture == "mamba"
    assert bool(r.akey(Keys.SSM.DT_B_C_RMS)) is True
    toks = [1, 10, 20, 30, 40]
    ctx = Context(r, n_cells=8, dtype=jnp.float32)
    assert ctx.decode(Batch.text(toks)) == 0
    with torch.no_grad():
        want = m(torch.tensor([toks])).logits[0, -1].numpy()
    got = ctx.get_logits()
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.9999


def test_deepseek_v3(tmp_path):
    """DeepseekV3 -> deepseek2 arch with sigmoid gating + exp_probs_b
    selection bias (reference DeepseekV2Model handles both registrations)."""
    cfg = transformers.DeepseekV3Config(
        vocab_size=97, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        n_group=1, topk_group=1, first_k_dense_replace=1,
        norm_topk_prob=True, routed_scaling_factor=2.0,
        scoring_func="sigmoid", kv_lora_rank=16, q_lora_rank=24,
        qk_rope_head_dim=8, qk_nope_head_dim=8, v_head_dim=12,
        max_position_embeddings=128, tie_word_embeddings=False,
        rope_interleave=False, use_cache=False,
    )
    torch.manual_seed(0)
    m = transformers.DeepseekV3ForCausalLM(cfg).eval()
    p = str(tmp_path / "dsv3.gguf")
    convert_hf_auto(m, p)
    r = GGUFReader(p)
    assert r.architecture == "deepseek2"
    assert int(r.akey("{arch}.expert_gating_func")) == 2
    names = set(r.tensors)
    assert "blk.1.exp_probs_b.bias" in names
    cfg2 = config_from_gguf(r)
    assert cfg2.expert_gating_func == "sigmoid"
    _logit_check(m, p)


def test_mistral3_text_tower(tmp_path):
    """Mistral3ForConditionalGeneration text tower -> llama arch
    (reference Mistral3 registration exports the language model)."""
    cfg = transformers.Mistral3Config(
        text_config=dict(
            model_type="mistral", vocab_size=97, hidden_size=64,
            intermediate_size=112, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, tie_word_embeddings=False,
            head_dim=16),
        vision_config=dict(
            model_type="pixtral", hidden_size=32, intermediate_size=48,
            num_hidden_layers=1, num_attention_heads=2, image_size=32,
            patch_size=8, num_channels=3, head_dim=16),
        multimodal_projector_bias=False, vision_feature_layer=-1,
        image_token_index=96, spatial_merge_size=1,
    )
    torch.manual_seed(0)
    m = transformers.Mistral3ForConditionalGeneration(cfg).eval()
    p = str(tmp_path / "m3.gguf")
    convert_hf_auto(m, p)
    assert GGUFReader(p).architecture == "llama"
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 96, size=9).tolist()
    ours = _run_ours(p, tokens)
    with torch.no_grad():
        ref = m(input_ids=torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-3)


def test_smolvlm_text_tower(tmp_path):
    """SmolVLM/Idefics3 text tower -> llama arch (model.text_model.*
    prefix strip; reference SmolVLMForConditionalGeneration)."""
    cfg = transformers.SmolVLMConfig(
        text_config=dict(
            model_type="llama", vocab_size=97, hidden_size=64,
            intermediate_size=112, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, tie_word_embeddings=False,
            pad_token_id=0),
        vision_config=dict(
            hidden_size=32, intermediate_size=48, num_hidden_layers=1,
            num_attention_heads=2, image_size=32, patch_size=8),
        image_token_id=96, scale_factor=2,
    )
    torch.manual_seed(0)
    m = transformers.SmolVLMForConditionalGeneration(cfg).eval()
    p = str(tmp_path / "sv.gguf")
    convert_hf_auto(m, p)
    assert GGUFReader(p).architecture == "llama"
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 96, size=9).tolist()
    ours = _run_ours(p, tokens)
    with torch.no_grad():
        ref = m(input_ids=torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-3)


# ------------------------------------------- t5 family (mt5/umt5/encoder)

def _t5_like(cls_name, cfg_cls_name, **kw):
    cfg_cls = getattr(transformers, cfg_cls_name)
    cfg = cfg_cls(
        vocab_size=97, d_model=32, d_kv=8, d_ff=48, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        decoder_start_token_id=0, tie_word_embeddings=True,
        use_cache=False, **kw)
    torch.manual_seed(0)
    return getattr(transformers, cls_name)(cfg).eval()


@pytest.mark.parametrize("cls,cfgcls,mt", [
    ("MT5ForConditionalGeneration", "MT5Config", "mt5"),
    ("UMT5ForConditionalGeneration", "UMT5Config", "umt5"),
])
def test_mt5_umt5_encode_decode(cls, cfgcls, mt, tmp_path):
    """mt5/umt5 ride the t5 path (umt5: per-layer rel-pos bias)."""
    from llm_tpu.models.loader import load_params
    from llm_tpu.models.t5 import t5_encode

    m = _t5_like(cls, cfgcls)
    assert m.config.model_type == mt
    p = str(tmp_path / f"{mt}.gguf")
    convert_hf_auto(m, p)
    r = GGUFReader(p)
    assert r.architecture == "t5"
    if mt == "umt5":
        names = set(r.tensors)
        assert "enc.blk.1.attn_rel_b.weight" in names  # per-layer bias
    params, cfg = load_params(r, dense_dtype=jnp.float32)
    toks = [3, 1, 4, 1, 5]
    enc = t5_encode(params, cfg, jnp.asarray(toks, jnp.int32),
                    dtype=jnp.float32)
    with torch.no_grad():
        want = m.encoder(torch.tensor([toks])).last_hidden_state[0].numpy()
    np.testing.assert_allclose(np.asarray(enc), want, atol=3e-3, rtol=3e-3)


def test_t5_encoder_only(tmp_path):
    """T5EncoderModel -> t5encoder arch (encoder-only GGUF)."""
    from llm_tpu.models.loader import load_params
    from llm_tpu.models.t5 import t5_encode

    m = _t5_like("T5EncoderModel", "T5Config")
    p = str(tmp_path / "t5enc.gguf")
    convert_hf_auto(m, p)
    r = GGUFReader(p)
    assert r.architecture == "t5encoder"
    assert not any(t.startswith("dec.") for t in r.tensors)
    params, cfg = load_params(r, dense_dtype=jnp.float32)
    toks = [3, 1, 4, 1, 5]
    enc = t5_encode(params, cfg, jnp.asarray(toks, jnp.int32),
                    dtype=jnp.float32)
    with torch.no_grad():
        want = m(torch.tensor([toks])).last_hidden_state[0].numpy()
    np.testing.assert_allclose(np.asarray(enc), want, atol=3e-3, rtol=3e-3)


# ------------------------------------------------------ stub state dicts

class _Stub:
    """Minimal object with .config / .state_dict() for converters whose HF
    classes are trust_remote_code-only in transformers."""

    def __init__(self, cfg: dict, sd: dict):
        self.config = SimpleNamespace(**cfg)
        self._sd = {k: torch.from_numpy(np.asarray(v, np.float32))
                    for k, v in sd.items()}

    def state_dict(self):
        return self._sd


def _llama_sd(rng, E=64, L=2, H=4, KV=2, FF=96, V=97, hd=16):
    sd = {
        "model.embed_tokens.weight": rng.normal(size=(V, E)) * 0.2,
        "model.norm.weight": 1 + rng.normal(size=E) * 0.05,
        "lm_head.weight": rng.normal(size=(V, E)) * 0.15,
    }
    for i in range(L):
        b = f"model.layers.{i}."
        sd[b + "input_layernorm.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[b + "post_attention_layernorm.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[b + "self_attn.q_proj.weight"] = rng.normal(size=(H * hd, E)) * 0.15
        sd[b + "self_attn.k_proj.weight"] = rng.normal(size=(KV * hd, E)) * 0.15
        sd[b + "self_attn.v_proj.weight"] = rng.normal(size=(KV * hd, E)) * 0.15
        sd[b + "self_attn.o_proj.weight"] = rng.normal(size=(E, H * hd)) * 0.15
        sd[b + "mlp.gate_proj.weight"] = rng.normal(size=(FF, E)) * 0.15
        sd[b + "mlp.up_proj.weight"] = rng.normal(size=(FF, E)) * 0.15
        sd[b + "mlp.down_proj.weight"] = rng.normal(size=(E, FF)) * 0.15
    return sd


_LLAMA_CFG = dict(
    vocab_size=97, hidden_size=64, num_hidden_layers=2,
    intermediate_size=96, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
    head_dim=16, tie_word_embeddings=False, name_or_path="stub",
)


def _decode_ok(path, arch=None):
    r = GGUFReader(path)
    if arch:
        assert config_from_gguf(r).arch == arch
    ctx = Context(r, n_cells=32, dtype=jnp.float32)
    assert ctx.decode(Batch.text([3, 1, 4, 1, 5], seq_id=0)) == 0
    logits = ctx.get_logits()
    assert np.isfinite(logits).all()
    return logits


def test_deci_per_layer_kv_conversion(tmp_path):
    """DeciLM variable GQA: per-layer kv-head array + per-layer permute
    (reference DeciModel)."""
    rng = np.random.default_rng(1)
    kvs = [2, 1]
    sd = _llama_sd(rng, KV=4)  # overwrite k/v below with per-layer shapes
    for i, kv in enumerate(kvs):
        b = f"model.layers.{i}."
        sd[b + "self_attn.k_proj.weight"] = rng.normal(size=(kv * 16, 64)) * 0.15
        sd[b + "self_attn.v_proj.weight"] = rng.normal(size=(kv * 16, 64)) * 0.15
    cfg = dict(_LLAMA_CFG, model_type="deci",
               num_key_value_heads_per_layer=kvs)
    p = str(tmp_path / "deci.gguf")
    convert_hf_auto(_Stub(cfg, sd), p)
    r = GGUFReader(p)
    assert list(r.akey(Keys.Attention.HEAD_COUNT_KV)) == kvs
    _decode_ok(p, "deci")


def test_arctic_conversion(tmp_path):
    """Arctic: residual_mlp/residual_layernorm remap + parallel MoE
    (reference ArcticModel arch_block_mappings_cfg)."""
    rng = np.random.default_rng(2)
    E, FF, NE = 64, 96, 4
    sd = _llama_sd(rng)
    for i in range(2):
        b = f"model.layers.{i}."
        # dense FFN moves to residual_mlp; MoE under block_sparse_moe
        sd[b + "residual_layernorm.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[b + "residual_mlp.w1.weight"] = sd.pop(b + "mlp.gate_proj.weight")
        sd[b + "residual_mlp.w3.weight"] = sd.pop(b + "mlp.up_proj.weight")
        sd[b + "residual_mlp.w2.weight"] = sd.pop(b + "mlp.down_proj.weight")
        sd[b + "block_sparse_moe.gate.weight"] = rng.normal(size=(NE, E)) * 0.15
        for e in range(NE):
            eb = b + f"block_sparse_moe.experts.{e}."
            sd[eb + "w1.weight"] = rng.normal(size=(FF, E)) * 0.15
            sd[eb + "w3.weight"] = rng.normal(size=(FF, E)) * 0.15
            sd[eb + "w2.weight"] = rng.normal(size=(E, FF)) * 0.15
    cfg = dict(_LLAMA_CFG, model_type="arctic", num_local_experts=NE,
               num_experts_per_tok=2)
    p = str(tmp_path / "arctic.gguf")
    convert_hf_auto(_Stub(cfg, sd), p)
    names = set(GGUFReader(p).tensors)
    assert {"blk.0.ffn_norm_exps.weight", "blk.0.ffn_norm.weight",
            "blk.0.ffn_gate_exps.weight", "blk.0.ffn_gate.weight"} <= names
    _decode_ok(p, "arctic")


def test_deepseek_v1_conversion(tmp_path):
    """DeepSeek v1: leading dense layers + ungated shared experts
    (reference DeepseekModel)."""
    rng = np.random.default_rng(3)
    E, FF, NE = 64, 48, 4
    sd = _llama_sd(rng)
    b = "model.layers.1."  # layer 1 becomes MoE
    for nm in ("gate_proj", "up_proj", "down_proj"):
        sd.pop(b + f"mlp.{nm}.weight")
    sd[b + "mlp.gate.weight"] = rng.normal(size=(NE, E)) * 0.15
    for e in range(NE):
        eb = b + f"mlp.experts.{e}."
        sd[eb + "gate_proj.weight"] = rng.normal(size=(FF, E)) * 0.15
        sd[eb + "up_proj.weight"] = rng.normal(size=(FF, E)) * 0.15
        sd[eb + "down_proj.weight"] = rng.normal(size=(E, FF)) * 0.15
    sd[b + "mlp.shared_experts.gate_proj.weight"] = rng.normal(size=(FF, E)) * 0.15
    sd[b + "mlp.shared_experts.up_proj.weight"] = rng.normal(size=(FF, E)) * 0.15
    sd[b + "mlp.shared_experts.down_proj.weight"] = rng.normal(size=(E, FF)) * 0.15
    cfg = dict(_LLAMA_CFG, model_type="deepseek", n_routed_experts=NE,
               num_experts_per_tok=2, first_k_dense_replace=1,
               n_shared_experts=1, moe_intermediate_size=FF,
               routed_scaling_factor=1.0, norm_topk_prob=False)
    p = str(tmp_path / "ds1.gguf")
    convert_hf_auto(_Stub(cfg, sd), p)
    r = GGUFReader(p)
    assert int(r.akey("{arch}.leading_dense_block_count")) == 1
    names = set(r.tensors)
    assert "blk.1.ffn_gate_shexp.weight" in names
    _decode_ok(p, "deepseek")


def test_minicpm3_plm_conversion(tmp_path):
    """minicpm3 (q+kv lora) and plm (kv lora, relu2) ride the deepseek2
    MLA converter with their own arch strings."""
    rng = np.random.default_rng(4)
    E, H, qlr, kvlr, rope_d, nope_d, Dv = 64, 2, 24, 16, 8, 8, 12
    Dk = rope_d + nope_d

    def mla_sd(q_lora, gated):
        sd = {
            "model.embed_tokens.weight": rng.normal(size=(97, E)) * 0.2,
            "model.norm.weight": 1 + rng.normal(size=E) * 0.05,
            "lm_head.weight": rng.normal(size=(97, E)) * 0.15,
        }
        for i in range(2):
            b = f"model.layers.{i}."
            sd[b + "input_layernorm.weight"] = 1 + rng.normal(size=E) * 0.05
            sd[b + "post_attention_layernorm.weight"] = \
                1 + rng.normal(size=E) * 0.05
            if q_lora:
                sd[b + "self_attn.q_a_proj.weight"] = rng.normal(size=(qlr, E)) * 0.15
                sd[b + "self_attn.q_a_layernorm.weight"] = 1 + rng.normal(size=qlr) * 0.05
                sd[b + "self_attn.q_b_proj.weight"] = rng.normal(size=(H * Dk, qlr)) * 0.15
            else:
                sd[b + "self_attn.q_proj.weight"] = rng.normal(size=(H * Dk, E)) * 0.15
            sd[b + "self_attn.kv_a_proj_with_mqa.weight"] = \
                rng.normal(size=(kvlr + rope_d, E)) * 0.15
            sd[b + "self_attn.kv_a_layernorm.weight"] = 1 + rng.normal(size=kvlr) * 0.05
            sd[b + "self_attn.kv_b_proj.weight"] = \
                rng.normal(size=(H * (nope_d + Dv), kvlr)) * 0.15
            sd[b + "self_attn.o_proj.weight"] = rng.normal(size=(E, H * Dv)) * 0.15
            if gated:
                sd[b + "mlp.gate_proj.weight"] = rng.normal(size=(96, E)) * 0.15
            sd[b + "mlp.up_proj.weight"] = rng.normal(size=(96, E)) * 0.15
            sd[b + "mlp.down_proj.weight"] = rng.normal(size=(E, 96)) * 0.15
        return sd

    base = dict(vocab_size=97, hidden_size=E, num_hidden_layers=2,
                intermediate_size=96, num_attention_heads=H,
                num_key_value_heads=H, max_position_embeddings=128,
                rms_norm_eps=1e-5, rope_theta=10000.0,
                qk_rope_head_dim=rope_d, qk_nope_head_dim=nope_d,
                v_head_dim=Dv, kv_lora_rank=kvlr,
                tie_word_embeddings=False, name_or_path="stub")

    p3 = str(tmp_path / "m3.gguf")
    convert_hf_auto(_Stub(dict(base, model_type="minicpm3",
                               q_lora_rank=qlr), mla_sd(True, True)), p3)
    cfg3 = config_from_gguf(GGUFReader(p3))
    assert cfg3.arch == "minicpm3"
    assert cfg3.q_lora_rank == qlr and cfg3.kv_lora_rank == kvlr
    _decode_ok(p3)

    pp = str(tmp_path / "plm.gguf")
    convert_hf_auto(_Stub(dict(base, model_type="plm", q_lora_rank=None),
                          mla_sd(False, False)), pp)
    cfgp = config_from_gguf(GGUFReader(pp))
    assert cfgp.arch == "plm" and cfgp.act == "relu2"
    assert cfgp.q_lora_rank == 0
    _decode_ok(pp)


def test_stablelm_epoch_and_internlm3_dispatch(tmp_path):
    """Old-codebase model_types route onto the modern arch graphs
    (StableLMEpoch -> stablelm, InternLM3 -> llama)."""
    cfg = transformers.StableLmConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, partial_rotary_factor=0.25,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    m = transformers.StableLmForCausalLM(cfg).eval()
    m.config.model_type = "stablelm_epoch"
    p = str(tmp_path / "se.gguf")
    convert_hf_auto(m, p)
    assert GGUFReader(p).architecture == "stablelm"
    _logit_check(m, p)

    from test_model_vs_hf import _tiny_hf_llama

    m2 = _tiny_hf_llama(hidden=64, layers=2, vocab=97)
    m2.config.model_type = "internlm3"
    p2 = str(tmp_path / "il3.gguf")
    convert_hf_auto(m2, p2)
    assert GGUFReader(p2).architecture == "llama"
    _logit_check(m2, p2)


# ------------------------------------------- batch 2: renamed/fused classes
# trust_remote_code-only HF classes (QWen, ChatGLM, CodeShell, Refact, JAIS,
# OpenELM, Plamo, Grok, BailingMoe) exercised through stub state dicts with
# the exact HF tensor naming their converters consume
# (convert_hf_to_gguf.py QwenModel..BailingMoeModel).

def test_qwen1_conversion(tmp_path):
    """qwen1: fused qkv+bias, half-width w1/w2 gated FFN (reference
    QwenModel: ff = intermediate_size // 2)."""
    rng = np.random.default_rng(10)
    E, H, FF, V, L = 64, 4, 48, 97, 2
    sd = {
        "transformer.wte.weight": rng.normal(size=(V, E)) * 0.2,
        "transformer.ln_f.weight": 1 + rng.normal(size=E) * 0.05,
        "lm_head.weight": rng.normal(size=(V, E)) * 0.15,
    }
    for i in range(L):
        b = f"transformer.h.{i}."
        sd[b + "ln_1.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[b + "ln_2.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[b + "attn.c_attn.weight"] = rng.normal(size=(3 * E, E)) * 0.15
        sd[b + "attn.c_attn.bias"] = rng.normal(size=3 * E) * 0.05
        sd[b + "attn.c_proj.weight"] = rng.normal(size=(E, E)) * 0.15
        sd[b + "mlp.w1.weight"] = rng.normal(size=(FF, E)) * 0.15  # up
        sd[b + "mlp.w2.weight"] = rng.normal(size=(FF, E)) * 0.15  # gate
        sd[b + "mlp.c_proj.weight"] = rng.normal(size=(E, FF)) * 0.15
    cfg = dict(model_type="qwen", hidden_size=E, num_hidden_layers=L,
               num_attention_heads=H, intermediate_size=2 * FF,
               seq_length=128, layer_norm_epsilon=1e-6, vocab_size=V,
               rotary_emb_base=10000.0, name_or_path="stub")
    p = str(tmp_path / "qwen1.gguf")
    convert_hf_auto(_Stub(cfg, sd), p)
    r = GGUFReader(p)
    assert r.akey(Keys.LLM.FEED_FORWARD_LENGTH) == FF
    assert "blk.0.attn_qkv.bias" in set(r.tensors)
    _decode_ok(p, "qwen")


def test_chatglm_conversion(tmp_path):
    """chatglm (glm2/3 pre-hf): fused MQA qkv+bias, fused [gate;up]
    dense_h_to_4h, half-dim rotary (reference ChatGLMModel)."""
    rng = np.random.default_rng(11)
    E, H, KV, hd, FF, V, L = 64, 4, 2, 16, 48, 97, 2
    sd = {
        "transformer.embedding.word_embeddings.weight":
            rng.normal(size=(V, E)) * 0.2,
        "transformer.encoder.final_layernorm.weight":
            1 + rng.normal(size=E) * 0.05,
        "transformer.output_layer.weight": rng.normal(size=(V, E)) * 0.15,
    }
    for i in range(L):
        b = f"transformer.encoder.layers.{i}."
        sd[b + "input_layernorm.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[b + "post_attention_layernorm.weight"] = \
            1 + rng.normal(size=E) * 0.05
        nq = (H + 2 * KV) * hd
        sd[b + "self_attention.query_key_value.weight"] = \
            rng.normal(size=(nq, E)) * 0.15
        sd[b + "self_attention.query_key_value.bias"] = \
            rng.normal(size=nq) * 0.05
        sd[b + "self_attention.dense.weight"] = rng.normal(size=(E, E)) * 0.15
        sd[b + "mlp.dense_h_to_4h.weight"] = \
            rng.normal(size=(2 * FF, E)) * 0.15
        sd[b + "mlp.dense_4h_to_h.weight"] = rng.normal(size=(E, FF)) * 0.15
    cfg = dict(model_type="chatglm", hidden_size=E, num_layers=L,
               num_attention_heads=H, multi_query_group_num=KV,
               kv_channels=hd, ffn_hidden_size=FF, seq_length=128,
               layernorm_epsilon=1e-5, padded_vocab_size=V, vocab_size=V,
               rope_ratio=1.0, name_or_path="stub")
    p = str(tmp_path / "chatglm.gguf")
    convert_hf_auto(_Stub(cfg, sd), p)
    r = GGUFReader(p)
    assert r.akey(Keys.Rope.DIMENSION_COUNT) == hd // 2
    _decode_ok(p, "chatglm")


def test_codeshell_conversion(tmp_path):
    """codeshell: starcoder tensors (LN+bias, fused MQA qkv, gelu) + NEOX
    rope (reference CodeShellModel)."""
    rng = np.random.default_rng(12)
    E, H, KV, V, L = 64, 4, 1, 97, 2
    hd = E // H
    sd = {
        "transformer.wte.weight": rng.normal(size=(V, E)) * 0.2,
        "transformer.ln_f.weight": 1 + rng.normal(size=E) * 0.05,
        "transformer.ln_f.bias": rng.normal(size=E) * 0.02,
        "lm_head.weight": rng.normal(size=(V, E)) * 0.15,
    }
    for i in range(L):
        b = f"transformer.h.{i}."
        for ln in ("ln_1", "ln_2"):
            sd[b + ln + ".weight"] = 1 + rng.normal(size=E) * 0.05
            sd[b + ln + ".bias"] = rng.normal(size=E) * 0.02
        nq = E + 2 * KV * hd
        sd[b + "attn.c_attn.weight"] = rng.normal(size=(nq, E)) * 0.15
        sd[b + "attn.c_attn.bias"] = rng.normal(size=nq) * 0.05
        sd[b + "attn.c_proj.weight"] = rng.normal(size=(E, E)) * 0.15
        sd[b + "attn.c_proj.bias"] = rng.normal(size=E) * 0.02
        sd[b + "mlp.c_fc.weight"] = rng.normal(size=(4 * E, E)) * 0.15
        sd[b + "mlp.c_fc.bias"] = rng.normal(size=4 * E) * 0.05
        sd[b + "mlp.c_proj.weight"] = rng.normal(size=(E, 4 * E)) * 0.15
        sd[b + "mlp.c_proj.bias"] = rng.normal(size=E) * 0.02
    cfg = dict(model_type="codeshell", hidden_size=E, num_hidden_layers=L,
               num_attention_heads=H, num_query_groups=KV, n_positions=128,
               layer_norm_epsilon=1e-5, vocab_size=V, rope_theta=10000.0,
               name_or_path="stub")
    p = str(tmp_path / "codeshell.gguf")
    convert_hf_auto(_Stub(cfg, sd), p)
    names = set(GGUFReader(p).tensors)
    assert {"blk.0.attn_qkv.weight", "blk.0.attn_qkv.bias",
            "output_norm.bias"} <= names
    _decode_ok(p, "codeshell")


def test_refact_conversion(tmp_path):
    """refact: fused kv split at head_dim, fused gate_up split at the
    256-rounded 2/3 ff dim, ALiBi (reference RefactModel)."""
    rng = np.random.default_rng(13)
    E, H, V, L = 64, 4, 97, 2
    hd = E // H
    ff = 256 * ((int(2 * 4 * E / 3) + 255) // 256)
    sd = {
        "transformer.wte.weight": rng.normal(size=(V, E)) * 0.2,
        "ln_f.weight": 1 + rng.normal(size=E) * 0.05,
        "lm_head.weight": rng.normal(size=(V, E)) * 0.15,
    }
    for i in range(L):
        b = f"transformer.h.{i}."
        sd[b + "ln_1.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[b + "ln_2.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[b + "attn.q.weight"] = rng.normal(size=(E, E)) * 0.15
        sd[b + "attn.kv.weight"] = rng.normal(size=(2 * hd, E)) * 0.15
        sd[b + "attn.c_proj.weight"] = rng.normal(size=(E, E)) * 0.15
        sd[b + "mlp.gate_up_proj.weight"] = rng.normal(size=(2 * ff, E)) * 0.15
        sd[b + "mlp.c_proj.weight"] = rng.normal(size=(E, ff)) * 0.15
    cfg = dict(model_type="gpt_refact", n_embd=E, n_head=H, n_layer=L,
               n_positions=128, layer_norm_epsilon=1e-6, vocab_size=V,
               name_or_path="stub")
    p = str(tmp_path / "refact.gguf")
    convert_hf_auto(_Stub(cfg, sd), p)
    r = GGUFReader(p)
    assert r.akey(Keys.LLM.FEED_FORWARD_LENGTH) == ff
    assert r.akey(Keys.Attention.HEAD_COUNT_KV) == 1
    _decode_ok(p, "refact")


def test_jais_conversion(tmp_path):
    """jais: Conv1D transposes, muP scales folded into tensors, ALiBi max
    bias recovered from the slopes (reference JaisModel)."""
    rng = np.random.default_rng(14)
    E, H, FF, V, L = 64, 4, 96, 97, 2
    sd = {
        "transformer.wte.weight": rng.normal(size=(V, E)) * 0.2,
        "transformer.ln_f.weight": 1 + rng.normal(size=E) * 0.05,
        "transformer.ln_f.bias": rng.normal(size=E) * 0.02,
        "transformer.relative_pe.slopes": np.array(
            [2.0 ** (-8.0 * (i + 1) / H) for i in range(H)]),
    }
    for i in range(L):
        b = f"transformer.h.{i}."
        for ln in ("ln_1", "ln_2"):
            sd[b + ln + ".weight"] = 1 + rng.normal(size=E) * 0.05
            sd[b + ln + ".bias"] = rng.normal(size=E) * 0.02
        # Conv1D layout: (in, out)
        sd[b + "attn.c_attn.weight"] = rng.normal(size=(E, 3 * E)) * 0.15
        sd[b + "attn.c_attn.bias"] = rng.normal(size=3 * E) * 0.05
        sd[b + "attn.c_proj.weight"] = rng.normal(size=(E, E)) * 0.15
        sd[b + "attn.c_proj.bias"] = rng.normal(size=E) * 0.02
        sd[b + "mlp.c_fc.weight"] = rng.normal(size=(E, FF)) * 0.15
        sd[b + "mlp.c_fc.bias"] = rng.normal(size=FF) * 0.05
        sd[b + "mlp.c_fc2.weight"] = rng.normal(size=(E, FF)) * 0.15
        sd[b + "mlp.c_fc2.bias"] = rng.normal(size=FF) * 0.05
        sd[b + "mlp.c_proj.weight"] = rng.normal(size=(FF, E)) * 0.15
        sd[b + "mlp.c_proj.bias"] = rng.normal(size=E) * 0.02
    cfg = dict(model_type="jais", n_embd=E, n_head=H, n_layer=L,
               n_inner=FF, n_positions=128, layer_norm_epsilon=1e-5,
               vocab_size=V, mup_embeddings_scale=2.0, mup_output_alpha=1.5,
               mup_width_scale=0.5, name_or_path="stub")
    p = str(tmp_path / "jais.gguf")
    convert_hf_auto(_Stub(cfg, sd), p)
    r = GGUFReader(p)
    assert r.akey("{arch}.attention.max_alibi_bias") == 8.0
    # muP folds: embedding x2.0, tied head x (alpha*width)=0.75 of raw wte
    np.testing.assert_allclose(
        _rd(r, "token_embd.weight"),
        np.float32(sd["transformer.wte.weight"] * 2.0), rtol=1e-6)
    np.testing.assert_allclose(
        _rd(r, "output.weight"),
        np.float32(sd["transformer.wte.weight"] * 0.75), rtol=1e-6)
    _decode_ok(p, "jais")


def test_openelm_conversion(tmp_path):
    """openelm: per-layer head/ff arrays from ffn_multipliers, fused qkv,
    per-head qk-norm, split proj_1, tied head (reference OpenELMModel)."""
    rng = np.random.default_rng(15)
    E, hd, V, L = 64, 16, 97, 2
    heads, kvs = [4, 2], [2, 1]
    mults, div = [1.0, 2.0], 32
    ffs = [64, 128]
    sd = {
        "transformer.token_embeddings.weight": rng.normal(size=(V, E)) * 0.2,
        "transformer.norm.weight": 1 + rng.normal(size=E) * 0.05,
    }
    for i in range(L):
        b = f"transformer.layers.{i}."
        nq = (heads[i] + 2 * kvs[i]) * hd
        sd[b + "attn_norm.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[b + "attn.qkv_proj.weight"] = rng.normal(size=(nq, E)) * 0.15
        sd[b + "attn.out_proj.weight"] = \
            rng.normal(size=(E, heads[i] * hd)) * 0.15
        sd[b + "attn.q_norm.weight"] = 1 + rng.normal(size=hd) * 0.05
        sd[b + "attn.k_norm.weight"] = 1 + rng.normal(size=hd) * 0.05
        sd[b + "ffn_norm.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[b + "ffn.proj_1.weight"] = rng.normal(size=(2 * ffs[i], E)) * 0.15
        sd[b + "ffn.proj_2.weight"] = rng.normal(size=(E, ffs[i])) * 0.15
    cfg = dict(model_type="openelm", model_dim=E, num_transformer_layers=L,
               num_query_heads=heads, num_kv_heads=kvs, head_dim=hd,
               ffn_multipliers=mults, ffn_dim_divisor=div,
               max_context_length=128, vocab_size=V,
               rope_freq_constant=10000.0, name_or_path="stub")
    p = str(tmp_path / "openelm.gguf")
    convert_hf_auto(_Stub(cfg, sd), p)
    r = GGUFReader(p)
    assert list(r.akey(Keys.LLM.FEED_FORWARD_LENGTH)) == ffs
    assert list(r.akey(Keys.Attention.HEAD_COUNT)) == heads
    assert "output.weight" not in set(r.tensors)  # tied
    _decode_ok(p, "openelm")


def test_plamo_conversion(tmp_path):
    """plamo: model.layers.layers.* naming + the GQA interleave shuffle on
    q and o (reference PlamoModel shuffle_attn_q_weight /
    shuffle_attn_output_weight)."""
    from llm_tpu.convert.hf_longtail import convert_hf_plamo  # noqa: F401

    rng = np.random.default_rng(16)
    E, H, KV, V, L = 64, 4, 2, 97, 2
    hd = E // H
    sd = {
        "model.embed_tokens.weight": rng.normal(size=(V, E)) * 0.2,
        "model.norm.weight": 1 + rng.normal(size=E) * 0.05,
        "lm_head.weight": rng.normal(size=(V, E)) * 0.15,
    }
    for i in range(L):
        b = f"model.layers.layers.{i}."
        sd[b + "norm.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[b + "self_attn.q_proj.weight"] = rng.normal(size=(E, E)) * 0.15
        sd[b + "self_attn.k_proj.weight"] = rng.normal(size=(KV * hd, E)) * 0.15
        sd[b + "self_attn.v_proj.weight"] = rng.normal(size=(KV * hd, E)) * 0.15
        sd[b + "self_attn.o_proj.weight"] = rng.normal(size=(E, E)) * 0.15
        sd[b + "mlp.gate_proj.weight"] = rng.normal(size=(96, E)) * 0.15
        sd[b + "mlp.up_proj.weight"] = rng.normal(size=(96, E)) * 0.15
        sd[b + "mlp.down_proj.weight"] = rng.normal(size=(E, 96)) * 0.15
    cfg = dict(model_type="plamo", hidden_size=E, num_hidden_layers=L,
               num_attention_heads=H, num_key_value_heads=KV,
               intermediate_size=96, max_position_embeddings=128,
               rms_norm_eps=1e-6, vocab_size=V, name_or_path="stub")
    p = str(tmp_path / "plamo.gguf")
    convert_hf_auto(_Stub(cfg, sd), p)
    r = GGUFReader(p)
    # the q-row shuffle and the o-column shuffle must be inverse
    # permutations: o' @ q' == o @ q for the converted pair
    q0 = sd["model.layers.layers.0.self_attn.q_proj.weight"]
    o0 = sd["model.layers.layers.0.self_attn.o_proj.weight"]
    np.testing.assert_allclose(
        np.asarray(_rd(r, "blk.0.attn_output.weight"), np.float64)
        @ np.asarray(_rd(r, "blk.0.attn_q.weight"), np.float64),
        np.asarray(o0, np.float64) @ np.asarray(q0, np.float64), atol=1e-6)
    _decode_ok(p, "plamo")


def test_grok_conversion(tmp_path):
    """grok: transformer.decoder_layer.* naming, rms_norm_1/2/3 post-norm
    remaps, per-expert moe.N.* stacked (reference GrokModel)."""
    rng = np.random.default_rng(17)
    E, H, FF, NE, V, L = 64, 4, 96, 4, 97, 2
    sd = {
        "transformer.in_out_embed.weight": rng.normal(size=(V, E)) * 0.2,
        "transformer.rms_norm.weight": 1 + rng.normal(size=E) * 0.05,
        "lm_head.weight": rng.normal(size=(V, E)) * 0.15,
    }
    for i in range(L):
        b = f"transformer.decoder_layer.{i}."
        for n in ("rms_norm", "rms_norm_1", "rms_norm_2", "rms_norm_3"):
            sd[b + n + ".weight"] = 1 + rng.normal(size=E) * 0.05
        for n in ("query", "key", "value", "linear"):
            sd[b + f"multi_head_attention.{n}.weight"] = \
                rng.normal(size=(E, E)) * 0.15
        sd[b + "router.weight"] = rng.normal(size=(NE, E)) * 0.15
        for e in range(NE):
            sd[b + f"moe.{e}.linear.weight"] = rng.normal(size=(FF, E)) * 0.15
            sd[b + f"moe.{e}.linear_v.weight"] = rng.normal(size=(FF, E)) * 0.15
            sd[b + f"moe.{e}.linear_1.weight"] = rng.normal(size=(E, FF)) * 0.15
    cfg = dict(model_type="grok-1", hidden_size=E, num_hidden_layers=L,
               num_attention_heads=H, num_key_value_heads=H,
               intermediate_size=FF, max_position_embeddings=128,
               rms_norm_eps=1e-5, vocab_size=V, num_local_experts=NE,
               num_experts_per_tok=2, name_or_path="stub")
    p = str(tmp_path / "grok.gguf")
    convert_hf_auto(_Stub(cfg, sd), p)
    r = GGUFReader(p)
    names = set(r.tensors)
    assert {"blk.0.attn_out_norm.weight", "blk.0.layer_out_norm.weight",
            "blk.0.ffn_gate_exps.weight"} <= names
    assert tuple(r.tensors["blk.0.ffn_up_exps.weight"].shape) == (E, FF, NE)  # ne order
    np.testing.assert_allclose(
        _rd(r, "blk.0.ffn_up_exps.weight")[1],
        np.float32(sd["transformer.decoder_layer.0.moe.1.linear_v.weight"]))
    _decode_ok(p, "grok")


def test_bailingmoe_conversion(tmp_path):
    """bailingmoe: fused query_key_value split + NORM permute, leading
    dense layer, shared experts (reference BailingMoeModel)."""
    rng = np.random.default_rng(18)
    E, H, KV, FF, MFF, NE, V, L = 64, 4, 2, 96, 48, 4, 97, 2
    hd = E // H
    sd = {
        "model.word_embeddings.weight": rng.normal(size=(V, E)) * 0.2,
        "model.norm.weight": 1 + rng.normal(size=E) * 0.05,
        "lm_head.weight": rng.normal(size=(V, E)) * 0.15,
    }
    for i in range(L):
        b = f"model.layers.{i}."
        sd[b + "input_layernorm.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[b + "post_attention_layernorm.weight"] = \
            1 + rng.normal(size=E) * 0.05
        sd[b + "attention.query_key_value.weight"] = \
            rng.normal(size=((H + 2 * KV) * hd, E)) * 0.15
        sd[b + "attention.dense.weight"] = rng.normal(size=(E, E)) * 0.15
        if i == 0:  # leading dense layer
            sd[b + "mlp.gate_proj.weight"] = rng.normal(size=(FF, E)) * 0.15
            sd[b + "mlp.up_proj.weight"] = rng.normal(size=(FF, E)) * 0.15
            sd[b + "mlp.down_proj.weight"] = rng.normal(size=(E, FF)) * 0.15
        else:
            sd[b + "mlp.gate.weight"] = rng.normal(size=(NE, E)) * 0.15
            for e in range(NE):
                eb = b + f"mlp.experts.{e}."
                sd[eb + "gate_proj.weight"] = rng.normal(size=(MFF, E)) * 0.15
                sd[eb + "up_proj.weight"] = rng.normal(size=(MFF, E)) * 0.15
                sd[eb + "down_proj.weight"] = rng.normal(size=(E, MFF)) * 0.15
            for nm in ("gate_proj", "up_proj", "down_proj"):
                shp = (MFF, E) if nm != "down_proj" else (E, MFF)
                sd[b + f"mlp.shared_experts.{nm}.weight"] = \
                    rng.normal(size=shp) * 0.15
    cfg = dict(model_type="bailing_moe", hidden_size=E, num_hidden_layers=L,
               num_attention_heads=H, num_key_value_heads=KV,
               intermediate_size=FF, moe_intermediate_size=MFF,
               max_position_embeddings=128, rms_norm_eps=1e-6, vocab_size=V,
               num_experts=NE, num_experts_per_tok=2, num_shared_experts=1,
               first_k_dense_replace=1, norm_topk_prob=False,
               name_or_path="stub")
    p = str(tmp_path / "bailing.gguf")
    convert_hf_auto(_Stub(cfg, sd), p)
    r = GGUFReader(p)
    assert r.akey("{arch}.leading_dense_block_count") == 1
    names = set(r.tensors)
    assert {"blk.0.ffn_gate.weight", "blk.1.ffn_gate_exps.weight",
            "blk.1.ffn_up_shexp.weight"} <= names
    _decode_ok(p, "bailingmoe")


def test_llama4_from_hf(tmp_path):
    """Llama4ForCausalLM -> llama4: chunked ISWA (tiny chunk), nope every
    4th layer + temperature tuning, weightless qk L2 norm, interleaved
    sigmoid MoE with input-scaled experts + shared expert (reference
    Llama4Model + llm_build_llama_iswa)."""
    cfg = transformers.Llama4TextConfig(
        vocab_size=97, hidden_size=64, intermediate_size=48,
        intermediate_size_mlp=96, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=2, max_position_embeddings=128,
        attention_chunk_size=4, floor_scale=4.0, attn_scale=0.1,
        attn_temperature_tuning=True, use_qk_norm=True,
        rope_theta=10000.0, tie_word_embeddings=False, pad_token_id=0,
        rope_scaling=None,
    )
    torch.manual_seed(0)
    m = transformers.Llama4ForCausalLM(cfg).eval()
    p = str(tmp_path / "llama4.gguf")
    convert_hf_auto(m, p)
    r = GGUFReader(p)
    assert r.architecture == "llama4"
    assert r.akey("{arch}.interleave_moe_layer_step") == 2
    names = set(r.tensors)
    assert "blk.1.ffn_gate_exps.weight" in names  # MoE layers 1,3
    assert "blk.0.ffn_gate.weight" in names  # dense layers 0,2
    assert "blk.1.ffn_up_shexp.weight" in names
    mcfg = config_from_gguf(r)
    assert mcfg.swa_chunked and mcfg.swa_window == 4
    assert mcfg.attn_temp_floor == 4 and mcfg.attn_temp_scale == 0.1
    # 13 tokens: spans several position chunks of 4 -> the chunked mask
    # and the floor-scaled attention temperature both take effect
    _logit_check(m, p, T=13, atol=5e-3)


def test_qwen2_audio_text_tower_and_mmproj(tmp_path):
    """Qwen2AudioForConditionalGeneration: language_model.model.* text
    tower -> qwen2 (logit parity), audio_tower -> whisper-style audio
    mmproj (reference Qwen2Model + WhisperEncoderModel registrations)."""
    from llm_tpu.convert.hf_llama import convert_hf_whisper_mmproj

    cfg = transformers.Qwen2AudioConfig(
        text_config=dict(
            model_type="qwen2", vocab_size=97, hidden_size=64,
            intermediate_size=112, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, tie_word_embeddings=False),
        audio_config=dict(
            model_type="qwen2_audio_encoder", d_model=32,
            encoder_layers=1, encoder_attention_heads=2,
            encoder_ffn_dim=48, num_mel_bins=80,
            max_source_positions=1500),
    )
    torch.manual_seed(0)
    m = transformers.Qwen2AudioForConditionalGeneration(cfg).eval()
    p = str(tmp_path / "q2a.gguf")
    convert_hf_auto(m, p)
    assert GGUFReader(p).architecture == "qwen2"
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 96, size=7).tolist()
    ours = _run_ours(p, toks)
    with torch.no_grad():
        ref = m(input_ids=torch.tensor([toks])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-3)

    pa = str(tmp_path / "q2a_mmproj.gguf")
    convert_hf_whisper_mmproj(
        m.audio_tower, pa,
        fc_w=m.multi_modal_projector.linear.weight.detach().numpy(),
        fc_b=m.multi_modal_projector.linear.bias.detach().numpy())
    ra = GGUFReader(pa)
    assert ra.get("clip.has_audio_encoder")

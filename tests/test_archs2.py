"""Architecture batch 2: the remaining reference-registry decoder archs.

HF oracles where transformers ships the class (chameleon, qwen2vl); the
rest (qwen1, codeshell, jais, grok, arctic, deepseek v1, bailingmoe,
minicpm3, plm) are exercised through hand-built GGUFs that carry exactly
the tensor set the reference's converters emit for them, checking config
mapping, graph wiring and decode. Features new to this batch get
equivalence oracles (arctic's parallel MoE, grok's post-norm remaps)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_tpu.gguf.constants import Keys
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.gguf.writer import GGUFWriter
from llm_tpu.models.config import config_from_gguf

from test_archs import _check
from test_model_vs_hf import _run_ours


# ---------------------------------------------------------------- oracles

def _chameleon(swin):
    cfg = transformers.ChameleonConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, swin_norm=swin,
        vocabulary_map={}, tie_word_embeddings=False,
        vq_config=dict(embed_dim=8, num_embeddings=8, base_channels=32,
                       channel_multiplier=[1], num_res_blocks=1,
                       latent_channels=32, resolution=16, in_channels=3,
                       out_channels=3),
    )
    torch.manual_seed(0)
    return transformers.ChameleonForConditionalGeneration(cfg).eval()


def test_chameleon(tmp_path):
    """Per-head LayerNorm(+bias) qk-norm rides the NORM-rope permute
    (llm_build_chameleon, llama-model.cpp:13603)."""
    _check(_chameleon(False), "chameleon", tmp_path)


def test_chameleon_swin_norm(tmp_path):
    """swin_norm checkpoints post-norm both blocks; the loader remaps
    attn/ffn norms into the post-norm slots (LLM_KV_SWIN_NORM)."""
    _check(_chameleon(True), "chameleon", tmp_path)


def test_qwen2vl_text(tmp_path):
    """qwen2vl text decode: M-RoPE with equal position streams is exactly
    NEOX rope (llm_build_qwen2vl, llama-model.cpp:7181; text-only decode
    feeds 4 identical position channels)."""
    vis = dict(depth=2, embed_dim=32, hidden_size=32, num_heads=2,
               in_channels=3, patch_size=4, spatial_merge_size=1,
               temporal_patch_size=1)
    cfg = transformers.Qwen2VLConfig(
        text_config=dict(
            vocab_size=97, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            rope_theta=10000.0, tie_word_embeddings=False,
            rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]},
        ),
        vision_config=vis, vocab_size=97,
    )
    torch.manual_seed(0)
    m = transformers.Qwen2VLForConditionalGeneration(cfg).eval()
    _check(m, "qwen2vl", tmp_path)


# ------------------------------------------------- hand-built GGUF archs

def _base(path, arch, *, E=64, L=2, H=4, KV=4, FF=96, V=97, rot=None,
          ln=False, seed=7):
    """Writer with the standard KV block + embeddings/head; returns
    (writer, mat, vec, rng)."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, arch=arch)
    a = arch
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), 2048)
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), E)
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), L)
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), FF)
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), H)
    w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a), KV)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a), 1e-5)
    w.add_kv(Keys.Attention.LAYERNORM_EPS.format(arch=a), 1e-5)
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), V)
    if rot is not None:
        w.add_kv(Keys.Rope.DIMENSION_COUNT.format(arch=a), rot)

    def mat(name, n, kk, scale=0.15, zero=False):
        arr = np.zeros((n, kk), np.float32) if zero else (
            rng.normal(size=(n, kk)) * scale).astype(np.float32)
        w.add_tensor(name, arr)

    def vec(name, n, scale=0.05, off=0.0):
        w.add_tensor(name, (off + rng.normal(size=(n,)) * scale).astype(np.float32))

    w.add_tensor("token_embd.weight",
                 (rng.normal(size=(V, E)) * 0.2).astype(np.float32))
    vec("output_norm.weight", E, off=1.0)
    if ln:
        vec("output_norm.bias", E)
    mat("output.weight", V, E)
    return w, mat, vec, rng


def _decode_ok(path, arch=None):
    r = GGUFReader(path)
    cfg = config_from_gguf(r)
    if arch:
        assert cfg.arch == arch
    logits = _run_ours(path, [3, 1, 4, 1, 5])
    assert np.isfinite(logits).all()
    return cfg, logits


def test_qwen1(tmp_path):
    """qwen1: fused qkv+bias MHA + NEOX rope + gated silu (llm_build_qwen,
    llama-model.cpp:6947)."""
    p = str(tmp_path / "qwen.gguf")
    E, H = 64, 4
    w, mat, vec, rng = _base(p, "qwen", E=E, H=H, KV=H)
    for il in range(2):
        b = f"blk.{il}."
        vec(b + "attn_norm.weight", E, off=1.0)
        mat(b + "attn_qkv.weight", 3 * E, E)
        vec(b + "attn_qkv.bias", 3 * E)
        mat(b + "attn_output.weight", E, E)
        vec(b + "ffn_norm.weight", E, off=1.0)
        mat(b + "ffn_gate.weight", 96, E)
        mat(b + "ffn_up.weight", 96, E)
        mat(b + "ffn_down.weight", E, 96)
    w.write()
    cfg, _ = _decode_ok(p, "qwen")
    assert cfg.attn_bias and cfg.act == "silu"
    from llm_tpu.ops.rope import ROPE_TYPE_NEOX
    assert cfg.rope.mode == ROPE_TYPE_NEOX


def test_codeshell(tmp_path):
    """codeshell: starcoder tensors (LN+bias, fused MQA qkv, gelu FFN) with
    NEOX rope (llm_build_codeshell, llama-model.cpp:8224)."""
    p = str(tmp_path / "codeshell.gguf")
    E, H, KV, Dk = 64, 4, 1, 16
    w, mat, vec, rng = _base(p, "codeshell", E=E, H=H, KV=KV, ln=True, rot=Dk)
    for il in range(2):
        b = f"blk.{il}."
        vec(b + "attn_norm.weight", E, off=1.0)
        vec(b + "attn_norm.bias", E)
        mat(b + "attn_qkv.weight", E + 2 * KV * Dk, E)
        vec(b + "attn_qkv.bias", E + 2 * KV * Dk)
        mat(b + "attn_output.weight", E, E)
        vec(b + "attn_output.bias", E)
        vec(b + "ffn_norm.weight", E, off=1.0)
        vec(b + "ffn_norm.bias", E)
        mat(b + "ffn_up.weight", 96, E)
        vec(b + "ffn_up.bias", 96)
        mat(b + "ffn_down.weight", E, 96)
        vec(b + "ffn_down.bias", E)
    w.write()
    cfg, _ = _decode_ok(p, "codeshell")
    assert cfg.norm_kind == "ln" and cfg.act == "gelu"
    assert cfg.rope.n_dims == Dk


def test_jais(tmp_path):
    """jais: gpt2-style LN + fused qkv + ALiBi + gated FFN with biases;
    kq scale 1/n_embd_head (llm_build_jais, llama-model.cpp:12020)."""
    p = str(tmp_path / "jais.gguf")
    E = 64
    w, mat, vec, rng = _base(p, "jais", E=E, ln=True)
    w.add_kv("jais.attention.max_alibi_bias", 8.0)
    for il in range(2):
        b = f"blk.{il}."
        vec(b + "attn_norm.weight", E, off=1.0)
        vec(b + "attn_norm.bias", E)
        mat(b + "attn_qkv.weight", 3 * E, E)
        vec(b + "attn_qkv.bias", 3 * E)
        mat(b + "attn_output.weight", E, E)
        vec(b + "attn_output.bias", E)
        vec(b + "ffn_norm.weight", E, off=1.0)
        vec(b + "ffn_norm.bias", E)
        mat(b + "ffn_gate.weight", 96, E)
        vec(b + "ffn_gate.bias", 96)
        mat(b + "ffn_up.weight", 96, E)
        vec(b + "ffn_up.bias", 96)
        mat(b + "ffn_down.weight", E, 96)
        vec(b + "ffn_down.bias", E)
    w.write()
    cfg, _ = _decode_ok(p, "jais")
    assert cfg.alibi_max_bias == 8.0
    assert cfg.attn_scale == pytest.approx(1.0 / 16)
    assert cfg.rope.n_dims == 0


def _moe_block(w, rng, b, E, FF, NE, prefix=""):
    def t3(name, a, bb, c):
        w.add_tensor(name, (rng.normal(size=(a, bb, c)) * 0.15).astype(np.float32))
    w.add_tensor(b + "ffn_gate_inp.weight",
                 (rng.normal(size=(NE, E)) * 0.15).astype(np.float32))
    t3(b + "ffn_gate_exps.weight", NE, FF, E)
    t3(b + "ffn_up_exps.weight", NE, FF, E)
    t3(b + "ffn_down_exps.weight", NE, E, FF)


def test_grok(tmp_path):
    """grok: embd x78.38, GELU MoE, attn_out_norm/layer_out_norm post-norm
    remaps, logits x0.577 (llm_build_grok, llama-model.cpp:5752)."""
    p = str(tmp_path / "grok.gguf")
    E, NE = 64, 4
    w, mat, vec, rng = _base(p, "grok", E=E)
    w.add_kv(Keys.LLM.EXPERT_COUNT.format(arch="grok"), NE)
    w.add_kv(Keys.LLM.EXPERT_USED_COUNT.format(arch="grok"), 2)
    for il in range(2):
        b = f"blk.{il}."
        vec(b + "attn_norm.weight", E, off=1.0)
        vec(b + "attn_out_norm.weight", E, off=1.0)
        for nm in ("attn_q", "attn_k", "attn_v", "attn_output"):
            mat(b + nm + ".weight", E, E)
        vec(b + "ffn_norm.weight", E, off=1.0)
        vec(b + "layer_out_norm.weight", E, off=1.0)
        _moe_block(w, rng, b, E, 96, NE)
    w.write()
    r = GGUFReader(p)
    cfg = config_from_gguf(r)
    assert cfg.embedding_scale == pytest.approx(78.38367176906169)
    assert cfg.logit_scale == pytest.approx(0.5773502691896257)
    assert cfg.act == "gelu" and cfg.expert_weights_norm
    from llm_tpu.models.loader import load_params
    params, _ = load_params(r)
    assert "attn_post_norm" in params["layers"][0]
    assert "ffn_post_norm" in params["layers"][0]
    _decode_ok(p)


def _deepseek_like(path, arch, rng_seed=7, norm_kv=None, scale=2.5):
    """deepseek v1 / bailingmoe: leading dense layer + MoE with shared
    expert and expert_weights_scale (llm_build_deepseek :11164,
    llm_build_bailingmoe :14104)."""
    E, NE, FF = 64, 4, 96
    w, mat, vec, rng = _base(path, arch, E=E, rot=16, seed=rng_seed)
    a = arch
    w.add_kv(Keys.LLM.EXPERT_COUNT.format(arch=a), NE)
    w.add_kv(Keys.LLM.EXPERT_USED_COUNT.format(arch=a), 2)
    w.add_kv(f"{a}.expert_weights_scale", scale)
    w.add_kv(f"{a}.leading_dense_block_count", 1)
    if norm_kv is not None:
        w.add_kv(f"{a}.expert_weights_norm", norm_kv)
    for il in range(2):
        b = f"blk.{il}."
        vec(b + "attn_norm.weight", E, off=1.0)
        for nm in ("attn_q", "attn_k", "attn_v", "attn_output"):
            mat(b + nm + ".weight", E, E)
        vec(b + "ffn_norm.weight", E, off=1.0)
        if il == 0:  # leading dense layer
            mat(b + "ffn_gate.weight", FF, E)
            mat(b + "ffn_up.weight", FF, E)
            mat(b + "ffn_down.weight", E, FF)
        else:
            _moe_block(w, rng, b, E, FF, NE)
            mat(b + "ffn_gate_shexp.weight", FF, E)
            mat(b + "ffn_up_shexp.weight", FF, E)
            mat(b + "ffn_down_shexp.weight", E, FF)
    w.write()
    return path


def test_deepseek_v1(tmp_path):
    p = _deepseek_like(str(tmp_path / "ds.gguf"), "deepseek")
    cfg, _ = _decode_ok(p, "deepseek")
    assert cfg.expert_weights_scale == 2.5 and not cfg.expert_weights_norm


def test_bailingmoe(tmp_path):
    p = _deepseek_like(str(tmp_path / "bl.gguf"), "bailingmoe", norm_kv=True)
    cfg, _ = _decode_ok(p, "bailingmoe")
    # head dim follows n_rot (build reshapes by n_rot)
    assert cfg.head_dim == 16 and cfg.expert_weights_norm
    assert cfg.attn_scale == pytest.approx(16 ** -0.5)


def test_arctic_parallel_moe(tmp_path):
    """arctic runs the MoE in parallel with the dense FFN over the LAYER
    INPUT normed by ffn_norm_exps (llm_build_arctic :11026). Oracle: with
    attn_output = 0 the layer input equals the FFN residual input, so
    arctic(zero dense FFN) == mixtral-style MoE with ffn_norm :=
    ffn_norm_exps, and arctic(zero down_exps) == plain dense llama."""
    import zlib

    E, NE, FF = 64, 4, 96

    def named(name, shape, zero=False, off=0.0):
        # per-NAME deterministic weights so twin GGUFs share tensors no
        # matter which extras each arch writes
        if zero:
            return np.zeros(shape, np.float32)
        r = np.random.default_rng(zlib.crc32(name.encode()))
        return (off + r.normal(size=shape) * 0.15).astype(np.float32)

    def build(path, arch, *, zero_dense, zero_moe):
        w = GGUFWriter(path, arch=arch)
        a = arch
        w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), 2048)
        w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), E)
        w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), 2)
        w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), FF)
        w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), 4)
        w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a), 4)
        w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a), 1e-5)
        w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), 97)
        if arch == "arctic" or not zero_moe:
            w.add_kv(Keys.LLM.EXPERT_COUNT.format(arch=a), NE)
            w.add_kv(Keys.LLM.EXPERT_USED_COUNT.format(arch=a), 2)

        def put(name, shape, **kw):
            w.add_tensor(name, named(name, shape, **kw))

        put("token_embd.weight", (97, E))
        put("output_norm.weight", (E,), off=1.0)
        put("output.weight", (97, E))
        for il in range(2):
            b = f"blk.{il}."
            put(b + "attn_norm.weight", (E,), off=1.0)
            for nm in ("attn_q", "attn_k", "attn_v"):
                put(b + nm + ".weight", (E, E))
            put(b + "attn_output.weight", (E, E), zero=True)
            put(b + "ffn_norm.weight", (E,), off=1.0)
            if arch == "arctic":
                put(b + "ffn_gate.weight", (FF, E))
                put(b + "ffn_up.weight", (FF, E))
                put(b + "ffn_down.weight", (E, FF), zero=zero_dense)
                # same values as the twin's ffn_norm (same name -> same rng)
                w.add_tensor(b + "ffn_norm_exps.weight",
                             named(b + "ffn_norm.weight", (E,), off=1.0))
                put(b + "ffn_gate_inp.weight", (NE, E))
                put(b + "ffn_gate_exps.weight", (NE, FF, E))
                put(b + "ffn_up_exps.weight", (NE, FF, E))
                put(b + "ffn_down_exps.weight", (NE, E, FF), zero=zero_moe)
            elif zero_moe:  # plain llama twin: dense FFN only
                put(b + "ffn_gate.weight", (FF, E))
                put(b + "ffn_up.weight", (FF, E))
                put(b + "ffn_down.weight", (E, FF), zero=zero_dense)
            else:  # mixtral-style twin: MoE only
                put(b + "ffn_gate_inp.weight", (NE, E))
                put(b + "ffn_gate_exps.weight", (NE, FF, E))
                put(b + "ffn_up_exps.weight", (NE, FF, E))
                put(b + "ffn_down_exps.weight", (NE, E, FF))
        w.write()
        return path

    toks = [3, 1, 4, 1, 5, 9]
    # (1) zero MoE contribution -> must equal the dense llama twin
    a1 = build(str(tmp_path / "a1.gguf"), "arctic", zero_dense=False,
               zero_moe=True)
    l1 = build(str(tmp_path / "l1.gguf"), "llama", zero_dense=False,
               zero_moe=True)
    np.testing.assert_allclose(_run_ours(a1, toks), _run_ours(l1, toks),
                               atol=2e-4, rtol=1e-4)
    # (2) zero dense FFN -> equals mixtral-style MoE twin (same seed means
    # identical router/expert weights; ffn_norm_exps == its ffn_norm)
    a2 = build(str(tmp_path / "a2.gguf"), "arctic", zero_dense=True,
               zero_moe=False)
    m2 = build(str(tmp_path / "m2.gguf"), "mixtral", zero_dense=True,
               zero_moe=False)
    np.testing.assert_allclose(_run_ours(a2, toks), _run_ours(m2, toks),
                               atol=2e-4, rtol=1e-4)


def test_minicpm3_mla(tmp_path):
    """minicpm3: q+kv lora MLA with hardcoded scale_embd/scale_depth/
    dim_model_base multipliers (llm_build_minicpm3 :8594)."""
    p = str(tmp_path / "m3.gguf")
    E, H, Dk, Dv, rope_d, qlr, kvlr = 64, 2, 32, 16, 16, 24, 24
    nope = Dk - rope_d
    w, mat, vec, rng = _base(p, "minicpm3", E=E, H=H, KV=H, rot=rope_d)
    a = "minicpm3"
    w.add_kv(Keys.Attention.KEY_LENGTH.format(arch=a), Dk)
    w.add_kv(Keys.Attention.VALUE_LENGTH.format(arch=a), Dv)
    w.add_kv(f"{a}.attention.q_lora_rank", qlr)
    w.add_kv(f"{a}.attention.kv_lora_rank", kvlr)
    for il in range(2):
        b = f"blk.{il}."
        vec(b + "attn_norm.weight", E, off=1.0)
        mat(b + "attn_q_a.weight", qlr, E)
        vec(b + "attn_q_a_norm.weight", qlr, off=1.0)
        mat(b + "attn_q_b.weight", H * Dk, qlr)
        mat(b + "attn_kv_a_mqa.weight", kvlr + rope_d, E)
        vec(b + "attn_kv_a_norm.weight", kvlr, off=1.0)
        mat(b + "attn_kv_b.weight", H * (nope + Dv), kvlr)
        mat(b + "attn_output.weight", E, H * Dv)
        vec(b + "ffn_norm.weight", E, off=1.0)
        mat(b + "ffn_gate.weight", 96, E)
        mat(b + "ffn_up.weight", 96, E)
        mat(b + "ffn_down.weight", E, 96)
    w.write()
    cfg, _ = _decode_ok(p, "minicpm3")
    assert cfg.kv_lora_rank == kvlr and cfg.q_lora_rank == qlr
    assert cfg.embedding_scale == 12.0
    assert cfg.logit_scale == pytest.approx(256.0 / E)


def test_plm_mla(tmp_path):
    """plm: kv-lora MLA with plain q + squared-relu no-gate FFN
    (llm_build_plm :13932)."""
    p = str(tmp_path / "plm.gguf")
    E, H, Dk, Dv, rope_d, kvlr = 64, 2, 32, 16, 16, 24
    nope = Dk - rope_d
    w, mat, vec, rng = _base(p, "plm", E=E, H=H, KV=H, rot=rope_d)
    a = "plm"
    w.add_kv(Keys.Attention.KEY_LENGTH.format(arch=a), Dk)
    w.add_kv(Keys.Attention.VALUE_LENGTH.format(arch=a), Dv)
    w.add_kv(f"{a}.attention.kv_lora_rank", kvlr)
    for il in range(2):
        b = f"blk.{il}."
        vec(b + "attn_norm.weight", E, off=1.0)
        mat(b + "attn_q.weight", H * Dk, E)
        mat(b + "attn_kv_a_mqa.weight", kvlr + rope_d, E)
        vec(b + "attn_kv_a_norm.weight", kvlr, off=1.0)
        mat(b + "attn_kv_b.weight", H * (nope + Dv), kvlr)
        mat(b + "attn_output.weight", E, H * Dv)
        vec(b + "ffn_norm.weight", E, off=1.0)
        mat(b + "ffn_up.weight", 96, E)
        mat(b + "ffn_down.weight", E, 96)
    w.write()
    cfg, _ = _decode_ok(p, "plm")
    assert cfg.act == "relu2" and cfg.kv_lora_rank == kvlr
    assert cfg.q_lora_rank == 0


def _tiny_gemma3n(n_altup=2, layers=4):
    cfg = transformers.Gemma3nTextConfig(
        vocab_size=97, vocab_size_per_layer_input=97, hidden_size=32,
        hidden_size_per_layer_input=8, intermediate_size=48,
        num_hidden_layers=layers, num_attention_heads=2,
        num_key_value_heads=1, head_dim=16, altup_num_inputs=n_altup,
        altup_active_idx=0, altup_coef_clip=120.0, laurel_rank=4,
        num_kv_shared_layers=2, sliding_window=8,
        activation_sparsity_pattern=(0.95,) * layers,
        layer_types=["sliding_attention", "full_attention"] * (layers // 2),
        max_position_embeddings=64, rope_theta=1e6,
        rope_local_base_freq=10000.0, tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    return transformers.Gemma3nForCausalLM(cfg).eval()


def test_gemma3n(tmp_path):
    """gemma3n: altup streams, laurel, per-layer input embeddings,
    gaussian-topk activation sparsity, shared-KV tail layers, iSWA with
    local rope, attention scale 1.0, final softcap
    (llm_build_gemma3n_iswa, llama-model.cpp:9190)."""
    m = _tiny_gemma3n()
    from llm_tpu.models.config import config_from_gguf
    from llm_tpu.convert.hf_llama import convert_hf_llama

    path = str(tmp_path / "g3n.gguf")
    convert_hf_llama(m, path, arch="gemma3n")
    cfg = config_from_gguf(GGUFReader(path))
    assert cfg.altup_n == 2 and cfg.n_kv_layers == 2
    assert cfg.swa_layers == (True, False, True, False)
    assert cfg.act_sparsity is not None and cfg.act_sparsity[0] > 1.6

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=12).tolist()
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    ctx = Context(GGUFReader(path), n_cells=32, dtype=jnp.float32)
    # reuse-layer KV stubs stay tiny
    assert ctx.kv.k[2].shape[1] == 8 and ctx.kv.k[0].shape[1] == 32
    assert ctx.decode(Batch.text(tokens, seq_id=0, logits_last_only=False)) == 0
    ours = np.stack([ctx.get_logits(i) for i in range(len(tokens))])
    with torch.no_grad():
        ref = m(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-3)

    # decode continuation: shared-KV layers must read the reuse layers'
    # cache correctly across steps
    nxt = int(ref[-1].argmax())
    assert ctx.decode(Batch.one(nxt, pos=len(tokens), seq_id=0)) == 0
    with torch.no_grad():
        ref2 = m(torch.tensor([tokens + [nxt]])).logits[0, -1].numpy()
    np.testing.assert_allclose(np.asarray(ctx.get_logits()), ref2,
                               atol=3e-3, rtol=3e-3)


def test_gemma3n_iswa_dual_ring(tmp_path):
    """gemma3n under the ISWA dual cache: SWA layers (and the shared-KV
    tail layers that reuse them) read the small ring; logits must match
    the swa_full full-cache run (llama-kv-cache-unified-iswa parity)."""
    from llm_tpu.convert.hf_llama import convert_hf_llama
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    m = _tiny_gemma3n()
    path = str(tmp_path / "g3n.gguf")
    convert_hf_llama(m, path, arch="gemma3n")
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 97, size=6).tolist()

    full = Context(GGUFReader(path), n_cells=256, dtype=jnp.float32,
                   swa_full=True)
    dual = Context(GGUFReader(path), n_cells=256, dtype=jnp.float32,
                   n_ubatch=16, n_seq_hint=1)
    assert dual.cells_swa is not None  # the ring actually engaged
    outs = []
    for ctx in (full, dual):
        assert ctx.decode(Batch.text(toks, seq_id=0)) == 0
        seq = [int(np.asarray(ctx.get_logits()).argmax())]
        for i in range(10):
            assert ctx.decode(Batch.one(seq[-1], pos=len(toks) + i,
                                        seq_id=0)) == 0
            seq.append(int(np.asarray(ctx.get_logits()).argmax()))
        outs.append((seq, np.asarray(ctx.get_logits())))
    assert outs[0][0] == outs[1][0]
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-4, rtol=1e-4)


def test_openelm_per_layer_heads(tmp_path):
    """openelm: PER-LAYER head counts (GGUF head_count arrays), fused
    [q|k|v] qkv, per-head RMS qk-norm, NEOX rope (llm_build_openelm,
    llama-model.cpp:10749). Exercises per-layer KV-cache allocation."""
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    p = str(tmp_path / "openelm.gguf")
    E, Dk, V = 64, 16, 97
    heads = [4, 2]
    kv_heads = [2, 1]
    ffs = [48, 64]
    rng = np.random.default_rng(3)
    w = GGUFWriter(p, arch="openelm")
    a = "openelm"
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), 512)
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), E)
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), 2)
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), ffs)
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), heads)
    w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a), kv_heads)
    w.add_kv(Keys.Attention.KEY_LENGTH.format(arch=a), Dk)
    w.add_kv(Keys.Attention.VALUE_LENGTH.format(arch=a), Dk)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a), 1e-5)
    w.add_kv(Keys.Rope.DIMENSION_COUNT.format(arch=a), Dk)
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), V)

    def mat(name, n, kk):
        w.add_tensor(name, (rng.normal(size=(n, kk)) * 0.15).astype(np.float32))

    def vec(name, n, off=0.0):
        w.add_tensor(name, (off + rng.normal(size=(n,)) * 0.05).astype(np.float32))

    w.add_tensor("token_embd.weight",
                 (rng.normal(size=(V, E)) * 0.2).astype(np.float32))
    vec("output_norm.weight", E, off=1.0)
    for il in range(2):
        b = f"blk.{il}."
        H, KV, FF = heads[il], kv_heads[il], ffs[il]
        vec(b + "attn_norm.weight", E, off=1.0)
        mat(b + "attn_qkv.weight", (H + 2 * KV) * Dk, E)
        vec(b + "attn_q_norm.weight", Dk, off=1.0)
        vec(b + "attn_k_norm.weight", Dk, off=1.0)
        mat(b + "attn_output.weight", E, H * Dk)
        vec(b + "ffn_norm.weight", E, off=1.0)
        mat(b + "ffn_gate.weight", FF, E)
        mat(b + "ffn_up.weight", FF, E)
        mat(b + "ffn_down.weight", E, FF)
    w.write()

    cfg = config_from_gguf(GGUFReader(p))
    assert cfg.n_heads_list == (4, 2) and cfg.n_kv_heads_list == (2, 1)
    assert cfg.heads_at(1) == 2 and cfg.kv_heads_at(1) == 1
    assert cfg.qk_norm
    ctx = Context(GGUFReader(p), n_cells=32, dtype=jnp.float32)
    # head-major caches: per-layer KV head counts are axis 0
    assert ctx.kv.k[0].shape[0] == 2 and ctx.kv.k[1].shape[0] == 1
    assert ctx.decode(Batch.text([3, 1, 4, 1, 5], seq_id=0)) == 0
    l1 = np.asarray(ctx.get_logits())
    assert np.isfinite(l1).all()
    # decode a second token (per-layer cache reuse across steps)
    assert ctx.decode(Batch.one(int(l1.argmax()), pos=5, seq_id=0)) == 0
    assert np.isfinite(ctx.get_logits()).all()


def test_deepseek2_external_mla_layout(tmp_path):
    """Load a GGUF in the REFERENCE's MLA conventions: raw HF per-head
    [nope|rope] order with INTERLEAVED rope dims (llama_model_rope_type
    NORM for deepseek2), key/value_length as the compressed-cache dims +
    *_mla keys, and kv_b split into transposed per-head attn_k_b /
    attn_v_b (llama-model.cpp deepseek2 create_tensor). The loader's
    _mla_external_fixup must reproduce HF logits."""
    cfg = transformers.DeepseekV2Config(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=32, q_lora_rank=24,
        qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=16,
        n_routed_experts=None, first_k_dense_replace=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False, use_cache=False,
    )
    torch.manual_seed(0)
    m = transformers.DeepseekV2ForCausalLM(cfg).eval()
    sd = {k: v.float().numpy() for k, v in m.state_dict().items()}

    a = "deepseek2"
    H, rope_d, nope, Dv, kvlr, qlr, E = 4, 8, 16, 16, 32, 24, 64
    p = str(tmp_path / "ds2ext.gguf")
    w = GGUFWriter(p, arch=a)
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), 128)
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), E)
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), 2)
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), 112)
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), H)
    w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a), 1)
    # MLA-cache convention: key/value_length are the COMPRESSED dims
    w.add_kv(Keys.Attention.KEY_LENGTH.format(arch=a), kvlr + rope_d)
    w.add_kv(Keys.Attention.VALUE_LENGTH.format(arch=a), kvlr)
    w.add_kv(f"{a}.attention.key_length_mla", nope + rope_d)
    w.add_kv(f"{a}.attention.value_length_mla", Dv)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a), 1e-6)
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), 97)
    w.add_kv(Keys.Rope.DIMENSION_COUNT.format(arch=a), rope_d)
    w.add_kv(f"{a}.attention.kv_lora_rank", kvlr)
    w.add_kv(f"{a}.attention.q_lora_rank", qlr)
    w.add_kv(f"{a}.leading_dense_block_count", 2)

    def put(name, arr):
        w.add_tensor(name, np.ascontiguousarray(arr, dtype=np.float32))

    put("token_embd.weight", sd["model.embed_tokens.weight"])
    put("output_norm.weight", sd["model.norm.weight"])
    put("output.weight", sd["lm_head.weight"])
    for il in range(2):
        pre = f"model.layers.{il}."
        b = f"blk.{il}."
        put(b + "attn_norm.weight", sd[pre + "input_layernorm.weight"])
        # RAW HF layouts — no reorder, no de-interleave
        put(b + "attn_q_a.weight", sd[pre + "self_attn.q_a_proj.weight"])
        put(b + "attn_q_a_norm.weight", sd[pre + "self_attn.q_a_layernorm.weight"])
        put(b + "attn_q_b.weight", sd[pre + "self_attn.q_b_proj.weight"])
        put(b + "attn_kv_a_mqa.weight",
            sd[pre + "self_attn.kv_a_proj_with_mqa.weight"])
        put(b + "attn_kv_a_norm.weight",
            sd[pre + "self_attn.kv_a_layernorm.weight"])
        # split kv_b: k part stored TRANSPOSED per head ({nope, kvlr, H})
        kvb = sd[pre + "self_attn.kv_b_proj.weight"].reshape(
            H, nope + Dv, kvlr)
        put(b + "attn_k_b.weight",
            np.swapaxes(kvb[:, :nope, :], 1, 2))  # [H, kvlr, nope]
        put(b + "attn_v_b.weight", kvb[:, nope:, :])  # [H, Dv, kvlr]
        put(b + "attn_output.weight", sd[pre + "self_attn.o_proj.weight"])
        put(b + "ffn_norm.weight", sd[pre + "post_attention_layernorm.weight"])
        put(b + "ffn_gate.weight", sd[pre + "mlp.gate_proj.weight"])
        put(b + "ffn_up.weight", sd[pre + "mlp.up_proj.weight"])
        put(b + "ffn_down.weight", sd[pre + "mlp.down_proj.weight"])
    w.write()

    cfg2 = config_from_gguf(GGUFReader(p))
    assert cfg2.head_dim == nope + rope_d and cfg2.head_dim_v == Dv
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=9).tolist()
    ours = _run_ours(p, tokens)
    with torch.no_grad():
        ref = m(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-3)


# ------------------------------------------------------- bert variants

def _bert_base(path, arch, *, E=32, L=2, H=2, FF=48, V=61, rot=None,
               extra_kv=()):
    rng = np.random.default_rng(5)
    w = GGUFWriter(path, arch=arch)
    a = arch
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), 512)
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), E)
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), L)
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), FF)
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), H)
    w.add_kv(Keys.Attention.LAYERNORM_EPS.format(arch=a), 1e-5)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a), 1e-5)
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), V)
    if rot is not None:
        w.add_kv(Keys.Rope.DIMENSION_COUNT.format(arch=a), rot)
    for k, v in extra_kv:
        w.add_kv(k, v)

    def mat(name, n, kk):
        w.add_tensor(name, (rng.normal(size=(n, kk)) * 0.15).astype(np.float32))

    def vec(name, n, off=0.0):
        w.add_tensor(name, (off + rng.normal(size=(n,)) * 0.05).astype(np.float32))

    w.add_tensor("token_embd.weight",
                 (rng.normal(size=(V, E)) * 0.2).astype(np.float32))
    return w, mat, vec, rng


def _bert_encode_ok(path, T=7):
    from llm_tpu.models.bert import BertContext
    ctx = BertContext(GGUFReader(path))
    emb = ctx.encode(list(range(1, T + 1)), pooling="mean")
    assert np.isfinite(emb).all() and emb.shape[-1] == ctx.cfg.n_embd
    return ctx


def test_nomic_bert(tmp_path):
    """nomic-bert: fused qkv + NEOX rope + gated-silu FFN, post-norm blocks
    (llm_build_bert NOMIC_BERT branches, llama-model.cpp:6331,6400)."""
    p = str(tmp_path / "nomic.gguf")
    E, FF = 32, 48
    w, mat, vec, rng = _bert_base(p, "nomic-bert", rot=16)
    vec("token_embd_norm.weight", E, off=1.0)
    vec("token_embd_norm.bias", E)
    for il in range(2):
        b = f"blk.{il}."
        mat(b + "attn_qkv.weight", 3 * E, E)
        mat(b + "attn_output.weight", E, E)
        vec(b + "attn_output_norm.weight", E, off=1.0)
        vec(b + "attn_output_norm.bias", E)
        mat(b + "ffn_gate.weight", FF, E)
        mat(b + "ffn_up.weight", FF, E)
        mat(b + "ffn_down.weight", E, FF)
        vec(b + "layer_output_norm.weight", E, off=1.0)
        vec(b + "layer_output_norm.bias", E)
    w.write()
    _bert_encode_ok(p)


def test_nomic_bert_moe(tmp_path):
    """nomic-bert-moe: GELU MoE every 2nd layer without a gate projection
    (LLM_KV_MOE_EVERY_N_LAYERS, llama-model.cpp:6376-6389)."""
    p = str(tmp_path / "nomicmoe.gguf")
    E, FF, NE = 32, 48, 4
    a = "nomic-bert-moe"
    w, mat, vec, rng = _bert_base(
        p, a, rot=16,
        extra_kv=((f"{a}.moe_every_n_layers", 2),
                  (Keys.LLM.EXPERT_COUNT.format(arch=a), NE),
                  (Keys.LLM.EXPERT_USED_COUNT.format(arch=a), 2)))
    vec("token_embd_norm.weight", E, off=1.0)
    vec("token_embd_norm.bias", E)
    for il in range(2):
        b = f"blk.{il}."
        mat(b + "attn_qkv.weight", 3 * E, E)
        vec(b + "attn_qkv.bias", 3 * E)
        mat(b + "attn_output.weight", E, E)
        vec(b + "attn_output_norm.weight", E, off=1.0)
        vec(b + "attn_output_norm.bias", E)
        if il % 2 == 1:  # MoE layer
            mat(b + "ffn_gate_inp.weight", NE, E)
            w.add_tensor(b + "ffn_up_exps.weight",
                         (rng.normal(size=(NE, FF, E)) * 0.15).astype(np.float32))
            w.add_tensor(b + "ffn_down_exps.weight",
                         (rng.normal(size=(NE, E, FF)) * 0.15).astype(np.float32))
        else:  # BERT-style biased GELU FFN
            mat(b + "ffn_up.weight", FF, E)
            vec(b + "ffn_up.bias", FF)
            mat(b + "ffn_down.weight", E, FF)
            vec(b + "ffn_down.bias", E)
        vec(b + "layer_output_norm.weight", E, off=1.0)
        vec(b + "layer_output_norm.bias", E)
    w.write()
    _bert_encode_ok(p)


def test_jina_bert_v2(tmp_path):
    """jina-bert-v2: bidirectional ALiBi, flat qk LayerNorms, second
    post-attention residual+norm, gated-GELU FFN (llm_build_bert JINA
    branches, llama-model.cpp:6398)."""
    p = str(tmp_path / "jina.gguf")
    E, FF = 32, 48
    w, mat, vec, rng = _bert_base(p, "jina-bert-v2")
    vec("token_embd_norm.weight", E, off=1.0)
    vec("token_embd_norm.bias", E)
    w.add_tensor("token_types.weight",
                 (rng.normal(size=(2, E)) * 0.1).astype(np.float32))
    for il in range(2):
        b = f"blk.{il}."
        for nm in ("attn_q", "attn_k", "attn_v"):
            mat(b + nm + ".weight", E, E)
            vec(b + nm + ".bias", E)
        vec(b + "attn_q_norm.weight", E, off=1.0)
        vec(b + "attn_q_norm.bias", E)
        vec(b + "attn_k_norm.weight", E, off=1.0)
        vec(b + "attn_k_norm.bias", E)
        mat(b + "attn_output.weight", E, E)
        vec(b + "attn_output.bias", E)
        vec(b + "attn_output_norm.weight", E, off=1.0)
        vec(b + "attn_output_norm.bias", E)
        vec(b + "attn_norm_2.weight", E, off=1.0)
        vec(b + "attn_norm_2.bias", E)
        mat(b + "ffn_gate.weight", FF, E)
        mat(b + "ffn_up.weight", FF, E)
        mat(b + "ffn_down.weight", E, FF)
        vec(b + "ffn_down.bias", E)
        vec(b + "layer_output_norm.weight", E, off=1.0)
        vec(b + "layer_output_norm.bias", E)
    w.write()
    ctx = _bert_encode_ok(p)
    assert ctx.cfg.alibi_max_bias == 8.0


def test_neo_bert(tmp_path):
    """neo-bert: PRE-norm RMS blocks, fused qkv + rope, packed-SWIGLU
    ffn_up, final enc.output_norm (llm_build_neo_bert :6445)."""
    p = str(tmp_path / "neo.gguf")
    E, FF = 32, 48
    w, mat, vec, rng = _bert_base(p, "neo-bert", rot=16)
    vec("enc.output_norm.weight", E, off=1.0)
    for il in range(2):
        b = f"blk.{il}."
        vec(b + "attn_norm.weight", E, off=1.0)
        mat(b + "attn_qkv.weight", 3 * E, E)
        mat(b + "attn_output.weight", E, E)
        vec(b + "ffn_norm.weight", E, off=1.0)
        mat(b + "ffn_up.weight", 2 * FF, E)  # packed [gate; up]
        mat(b + "ffn_down.weight", E, FF)
    w.write()
    _bert_encode_ok(p)


@pytest.mark.parametrize("arch", ["refact", "plamo"])
def test_config_mapped_batch2(arch, tmp_path):
    """refact (ALiBi MQA llama, no rope) and plamo (parallel residual)
    load from llama-tensor GGUFs and decode."""
    from llm_tpu.convert.hf_llama import convert_hf_llama
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    from test_model_vs_hf import _tiny_hf_llama

    m = _tiny_hf_llama(hidden=64, layers=2, vocab=97)
    path = str(tmp_path / f"{arch}.gguf")
    convert_hf_llama(m, path, arch=arch)
    cfg = config_from_gguf(GGUFReader(path))
    assert cfg.arch == arch
    if arch == "refact":
        assert cfg.alibi_max_bias == 8.0 and cfg.rope.n_dims == 0
    if arch == "plamo":
        assert cfg.parallel_residual
    ctx = Context(GGUFReader(path), n_cells=32, dtype=jnp.float32)
    assert ctx.decode(Batch.text([3, 1, 4, 1, 5], seq_id=0)) == 0
    assert np.isfinite(ctx.get_logits()).all()


def test_rope_mode_registry_matches_reference():
    """Our per-arch rope layout must agree with llama_model_rope_type
    (llama-model.cpp:15150) for every name in the reference's registry
    (llama-arch.cpp LLM_ARCH_NAMES). Documented exceptions: starcoder/
    gpt2/bloom/mpt report NORM/NONE metadata but their graphs apply no
    rope (we store NONE); the deepseek2 MLA family runs NEOX internally —
    the loader de-interleaves external NORM-layout checkpoints
    (_mla_external_fixup)."""
    from llm_tpu.models.config import _ROPE_MODE
    from llm_tpu.ops.rope import (ROPE_TYPE_NEOX, ROPE_TYPE_NONE,
                                  ROPE_TYPE_NORM)

    NONE_A = {"gpt2", "gptj", "mpt", "refact", "bloom", "mamba", "mamba2",
              "jina-bert-v2", "t5", "t5encoder", "jais", "rwkv6",
              "rwkv6qwen2", "rwkv7", "arwkv7", "wavtokenizer-dec",
              "falcon-mamba", "bert", "starcoder"}
    NORM_A = {"llama", "llama4", "deci", "baichuan", "internlm2",
              "minicpm", "xverse", "command-r", "cohere2", "olmo",
              "arctic", "deepseek", "chatglm", "glm4", "granite",
              "granitemoe", "chameleon", "bailingmoe", "neo-bert",
              "arcee", "ernie4_5", "mixtral", "cohere"}
    NEOX_A = {"falcon", "grok", "dbrx", "nomic-bert", "nomic-bert-moe",
              "stablelm", "bitnet", "qwen", "qwen2", "qwen2moe", "qwen3",
              "qwen3moe", "olmo2", "olmoe", "phi2", "phi3", "phimoe",
              "plamo", "gemma", "gemma2", "gemma3", "gemma3n",
              "starcoder2", "openelm", "gptneox", "codeshell", "orion",
              "nemotron", "exaone", "minicpm3", "dots1", "qwen2vl"}
    # gptj is NORM in the reference table; ours agrees (interleaved)
    NONE_A.discard("gptj")
    NORM_A.add("gptj")
    for a in NORM_A:
        got = _ROPE_MODE.get(a)
        if a in ("chatglm",):  # glm family natively interleaved, NORM ok
            pass
        assert got in (ROPE_TYPE_NORM, None) or a in ("cohere",), \
            f"{a}: expected NORM, got {got}"
        if got is None:
            # archs not in the table default to NEOX — NORM archs must be
            # explicitly listed
            assert a in ("cohere",), f"{a} missing from _ROPE_MODE"
    for a in NEOX_A:
        got = _ROPE_MODE.get(a, ROPE_TYPE_NEOX)  # default is NEOX
        # deepseek2 family intentionally NEOX-internal
        assert got == ROPE_TYPE_NEOX, f"{a}: expected NEOX, got {got}"
    # NONE archs either set NONE in their config block or never rope;
    # spot-check the ones that go through the shared decoder
    from llm_tpu.gguf.writer import GGUFWriter  # noqa: F401 (import check)


def test_phi3_longrope(tmp_path):
    """phi3 longrope: per-dim factor pair + attention scaling. Context
    sized within the original window must pick the SHORT factors and
    reproduce HF logits; a bigger context picks the LONG set
    (llama_model::get_rope_factors, llama-model.cpp:4883)."""
    from llm_tpu.convert.hf_llama import convert_hf_llama
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    half = 16 // 2 * 2  # head_dim 16 -> 8 factors
    cfg = transformers.Phi3Config(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, original_max_position_embeddings=64,
        rope_theta=10000.0, tie_word_embeddings=False, pad_token_id=0,
        rope_scaling={"type": "longrope",
                      "long_factor": [1.0 + i / 4.0 for i in range(8)],
                      "short_factor": [1.0 + i / 16.0 for i in range(8)]},
    )
    torch.manual_seed(0)
    m = transformers.Phi3ForCausalLM(cfg).eval()
    path = str(tmp_path / "phi3lr.gguf")
    convert_hf_llama(m, path, arch="phi3")

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=9).tolist()
    ctx = Context(GGUFReader(path), n_cells=48, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ctx.params["rope_freqs"]),
        np.asarray(cfg.rope_scaling["short_factor"], np.float32))
    assert ctx.decode(Batch.text(tokens, seq_id=0,
                                 logits_last_only=False)) == 0
    ours = np.stack([ctx.get_logits(i) for i in range(len(tokens))])
    with torch.no_grad():
        ref = m(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-3)

    big = Context(GGUFReader(path), n_cells=128, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(big.params["rope_freqs"]),
        np.asarray(cfg.rope_scaling["long_factor"], np.float32))


def test_deepseek2_yarn(tmp_path):
    """deepseek2 YaRN pre-scaling: the magnitude correction lands in
    kq_scale (mscale^2/sqrt(Dk) with the model's yarn_log_mul) while the
    rope is magnitude-neutral (llm_build_deepseek2:11341-11345). Oracle
    vs HF DeepseekV2 with yarn rope_scaling."""
    from llm_tpu.convert.hf_llama import convert_hf_deepseek2

    cfg = transformers.DeepseekV2Config(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=32, q_lora_rank=24,
        qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=16,
        n_routed_experts=None, first_k_dense_replace=2,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False, use_cache=False,
        rope_scaling={"type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 64,
                      "beta_fast": 32, "beta_slow": 1,
                      "mscale": 0.707, "mscale_all_dim": 0.707},
    )
    torch.manual_seed(0)
    m = transformers.DeepseekV2ForCausalLM(cfg).eval()
    path = str(tmp_path / "ds2y.gguf")
    convert_hf_deepseek2(m, path)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=9).tolist()
    ours = _run_ours(path, tokens)
    with torch.no_grad():
        ref = m(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-3)


def test_qwen2vl_mrope_image(tmp_path):
    """Full M-RoPE with an image: HF's vision-tower embeddings are fed
    through our embedding-input decode with (t, h, w) position 4-vectors
    (ggml_mrope_cache_init semantics); text tokens use HF's get_rope_index
    stream. Primary cache positions use the sequence INDEX so the causal
    mask matches HF's index-causality; the rope comes entirely from the
    M-RoPE streams. Logits must match HF's image forward."""
    from llm_tpu.convert.hf_llama import convert_hf_llama
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    vis = dict(depth=2, embed_dim=32, hidden_size=64, num_heads=2,
               in_channels=3, patch_size=4, spatial_merge_size=2,
               temporal_patch_size=2)
    cfg = transformers.Qwen2VLConfig(
        text_config=dict(
            vocab_size=97, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            rope_theta=10000.0, tie_word_embeddings=False,
            rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]},
        ),
        vision_config=vis, vocab_size=97,
        image_token_id=96, vision_start_token_id=94, vision_end_token_id=95,
    )
    torch.manual_seed(0)
    m = transformers.Qwen2VLForConditionalGeneration(cfg).eval()
    grid = torch.tensor([[1, 4, 4]])  # 4x4 patches -> 2x2 merged tokens
    pv = torch.randn(16, 3 * 2 * 4 * 4)
    with torch.no_grad():
        img_emb = m.visual(pv, grid_thw=grid).numpy()
    n_img = img_emb.shape[0]
    pre, post = [3, 1, 94], [95, 5, 9]
    ids = pre + [96] * n_img + post
    input_ids = torch.tensor([ids])
    pos3, _ = m.model.get_rope_index(input_ids, image_grid_thw=grid)
    pos3 = pos3[:, 0].numpy()  # [3, T]
    with torch.no_grad():
        ref = m(input_ids, pixel_values=pv, image_grid_thw=grid) \
            .logits[0].numpy()

    path = str(tmp_path / "q2vl.gguf")
    convert_hf_llama(m, path, arch="qwen2vl")
    ctx = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32)
    assert ctx.cells_mpos is not None

    def mp(i):
        return (int(pos3[0, i]), int(pos3[1, i]), int(pos3[2, i]), 0)

    b = Batch()
    for i, t in enumerate(pre):
        b.add(t, pos=i, logits=True, mpos=mp(i))
    assert ctx.decode(b) == 0
    pre_logits = [np.asarray(ctx.get_logits(i)) for i in range(len(pre))]

    off = len(pre)
    mpos_img = np.asarray([mp(off + j) for j in range(n_img)], np.int32)
    assert ctx.decode_embd(img_emb, seq_id=0, pos_start=off,
                           mpos=mpos_img) == 0

    b2 = Batch()
    for j, t in enumerate(post):
        i = off + n_img + j
        b2.add(t, pos=i, logits=True, mpos=mp(i))
    assert ctx.decode(b2) == 0
    post_logits = [np.asarray(ctx.get_logits(j)) for j in range(len(post))]

    ours = np.stack(pre_logits + post_logits)
    want = np.concatenate([ref[: len(pre)], ref[off + n_img:]])
    np.testing.assert_allclose(ours, want, atol=3e-3, rtol=3e-3)

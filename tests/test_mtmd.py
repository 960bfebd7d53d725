"""Multimodal (mtmd) tests: CLIP encoder vs HF hidden states, chunk
tokenization, and end-to-end image+text decode into the LLM cache."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_tpu.convert.hf_llama import convert_hf_clip_mmproj, convert_hf_llama
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.models.clip import (clip_config_from_gguf, clip_encode,
                                 load_clip_params, patchify, preprocess_image)
from llm_tpu.mtmd import MultimodalRuntime, tokenize_chunks
from llm_tpu.runtime.batch import Batch
from llm_tpu.runtime.engine import Context
from llm_tpu.tokenizers import tokenizer_from_gguf

from test_model_vs_hf import _tiny_hf_llama
from test_tools import _test_vocab

HIDDEN = 64  # LLM embedding size


def _tiny_hf_clip(image_size=32, patch=8, hidden=48, layers=2, heads=4):
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(3)
    cfg = CLIPVisionConfig(
        image_size=image_size, patch_size=patch, hidden_size=hidden,
        num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=hidden * 4, projection_dim=32,
    )
    return CLIPVisionModel(cfg).eval()


@pytest.fixture(scope="module")
def clip_pair(tmp_path_factory):
    model = _tiny_hf_clip()
    rng = np.random.default_rng(0)
    h = model.config.hidden_size
    proj = dict(
        proj_w0=rng.normal(size=(HIDDEN, h)).astype(np.float32) * 0.05,
        proj_b0=np.zeros(HIDDEN, np.float32),
        proj_w2=rng.normal(size=(HIDDEN, HIDDEN)).astype(np.float32) * 0.05,
        proj_b2=np.zeros(HIDDEN, np.float32),
    )
    path = str(tmp_path_factory.mktemp("mtmd") / "mmproj.gguf")
    convert_hf_clip_mmproj(model, path, **proj)
    return model, proj, path


def test_clip_encoder_matches_hf(clip_pair):
    model, proj, path = clip_pair
    reader = GGUFReader(path)
    cfg = clip_config_from_gguf(reader)
    params = load_clip_params(reader)

    rng = np.random.default_rng(1)
    img = rng.random((3, cfg.image_size, cfg.image_size)).astype(np.float32)

    with torch.no_grad():
        h = model(torch.tensor(img[None])).last_hidden_state
        # clip.cpp applies post_ln before the projector; HF's
        # last_hidden_state leaves it to the pooler
        want_h = model.vision_model.post_layernorm(h)[0].numpy()

    got = np.asarray(
        clip_encode(params, cfg, jnp.asarray(patchify(img, cfg.patch_size))))
    # reproduce the llava projector on HF's (patch-only) hidden states
    ref = want_h[1:] @ proj["proj_w0"].T + proj["proj_b0"]
    ref = np.asarray(jax.nn.gelu(jnp.asarray(ref), approximate=False))
    ref = ref @ proj["proj_w2"].T + proj["proj_b2"]

    assert got.shape == ref.shape
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9999, f"corr {corr}"
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_tokenize_chunks():
    class FakeTok:
        def encode(self, text, add_special=True, parse_special=True):
            return [1] if add_special else [] + [ord(c) for c in text]

    # marker splitting with interleaved text
    chunks = tokenize_chunks(FakeTok(), "look <__media__> here", ["img"])
    kinds = [c.kind for c in chunks]
    assert kinds == ["text", "image", "text"]
    with pytest.raises(ValueError):
        tokenize_chunks(FakeTok(), "no marker", ["img"])


def test_mtmd_end_to_end(clip_pair, tmp_path):
    """Image chunk -> vision tower -> decode_embd -> text continues with
    finite logits and correct cache positions."""
    _, _, mmproj_path = clip_pair
    lm = _tiny_hf_llama(hidden=HIDDEN, layers=2, vocab=97)
    lm_path = str(tmp_path / "lm.gguf")
    convert_hf_llama(lm, lm_path, vocab=_test_vocab(97))
    reader = GGUFReader(lm_path)
    tok = tokenizer_from_gguf(reader)
    ctx = Context(reader, n_cells=128, n_ubatch=64, dtype=jnp.float32)

    rt = MultimodalRuntime(ctx, tok, GGUFReader(mmproj_path))
    img = (np.random.default_rng(2).random((48, 48, 3)) * 255).astype(np.uint8)

    emb = rt.encode_image(img)
    assert emb.shape == (16, HIDDEN)  # (32/8)^2 patches

    chunks = tokenize_chunks(tok, "describe <__media__> briefly", [img])
    assert rt.eval_chunks(chunks) == 0
    logits = ctx.get_logits()
    assert np.all(np.isfinite(logits))
    # cache holds text + image + text positions contiguously
    n_text = sum(len(c.tokens) for c in chunks if c.kind == "text")
    assert ctx.seq_pos_max(0) == n_text + 16 - 1

    # image changes the continuation vs text-only
    ctx2 = Context(reader, n_cells=128, n_ubatch=64, dtype=jnp.float32,
                   params_cfg=(ctx.params, ctx.cfg))
    toks = [t for c in chunks if c.kind == "text" for t in c.tokens]
    assert ctx2.decode(Batch.text(toks)) == 0
    assert not np.allclose(ctx2.get_logits(), logits)


def test_preprocess_image(clip_pair):
    _, _, path = clip_pair
    cfg = clip_config_from_gguf(GGUFReader(path))
    img = (np.random.default_rng(0).random((77, 55, 3)) * 255).astype(np.uint8)
    out = preprocess_image(img, cfg)
    assert out.shape == (3, cfg.image_size, cfg.image_size)
    assert out.dtype == np.float32


def _tiny_qwen2vl(n_img_tokens=4):
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
    return transformers.Qwen2VLForConditionalGeneration(cfg).eval()


def test_qwen2vl_vision_tower_matches_hf(tmp_path):
    """Our qwen2vl vision tower (dual-slice patch conv, 2-D rotary in
    merge-block order, quick-gelu MLP, 2x2 merger) reproduces HF's
    m.visual embeddings from the same flattened patches."""
    from llm_tpu.convert.hf_llama import convert_hf_qwen2vl_mmproj
    from llm_tpu.models.qwen2vl_vision import (load_qwen2vl_vision,
                                               qwen2vl_vision_encode)

    m = _tiny_qwen2vl()
    grid = torch.tensor([[1, 4, 4]])
    pv = torch.randn(16, 3 * 2 * 4 * 4)
    with torch.no_grad():
        want = m.visual(pv, grid_thw=grid).numpy()
    path = str(tmp_path / "q2vl_mmproj.gguf")
    convert_hf_qwen2vl_mmproj(m.visual, path)
    params, cfg = load_qwen2vl_vision(GGUFReader(path))
    got = np.asarray(qwen2vl_vision_encode(
        params, cfg, jnp.asarray(pv.numpy()), 1, 4, 4))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_qwen2vl_image_end_to_end(tmp_path):
    """Full pipeline with NO HF at inference time: our vision tower + our
    get_rope_index-equivalent position streams + the M-RoPE engine must
    reproduce HF's image-conditioned logits."""
    from llm_tpu.convert.hf_llama import (convert_hf_llama,
                                          convert_hf_qwen2vl_mmproj)
    from llm_tpu.models.qwen2vl_vision import (load_qwen2vl_vision,
                                               qwen2vl_mrope_positions,
                                               qwen2vl_vision_encode)
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    m = _tiny_qwen2vl()
    grid = torch.tensor([[1, 4, 4]])
    pv = torch.randn(16, 3 * 2 * 4 * 4)
    pre, post = [3, 1, 94], [95, 5, 9]
    with torch.no_grad():
        n_img = m.visual(pv, grid_thw=grid).shape[0]
        ids = pre + [96] * n_img + post
        ref = m(torch.tensor([ids]), pixel_values=pv,
                image_grid_thw=grid).logits[0].numpy()

    lm = str(tmp_path / "lm.gguf")
    mp = str(tmp_path / "mmproj.gguf")
    convert_hf_llama(m, lm, arch="qwen2vl")
    convert_hf_qwen2vl_mmproj(m.visual, mp)

    vp, vcfg = load_qwen2vl_vision(GGUFReader(mp))
    img = np.asarray(qwen2vl_vision_encode(
        vp, vcfg, jnp.asarray(pv.numpy()), 1, 4, 4))
    assert img.shape[0] == n_img

    mpos, _ = qwen2vl_mrope_positions(len(pre), 1, 4, 4, len(post))
    ctx = Context(GGUFReader(lm), n_cells=64, dtype=jnp.float32)
    b = Batch()
    for i, t in enumerate(pre):
        b.add(t, pos=i, logits=True, mpos=mpos[i])
    assert ctx.decode(b) == 0
    pre_lg = [np.asarray(ctx.get_logits(i)) for i in range(len(pre))]
    off = len(pre)
    assert ctx.decode_embd(img, seq_id=0, pos_start=off,
                           mpos=np.asarray(mpos[off:off + n_img])) == 0
    b2 = Batch()
    for j, t in enumerate(post):
        b2.add(t, pos=off + n_img + j, logits=True,
               mpos=mpos[off + n_img + j])
    assert ctx.decode(b2) == 0
    post_lg = [np.asarray(ctx.get_logits(j)) for j in range(len(post))]
    ours = np.stack(pre_lg + post_lg)
    want = np.concatenate([ref[: len(pre)], ref[off + n_img:]])
    np.testing.assert_allclose(ours, want, atol=3e-3, rtol=3e-3)


def test_qwen2vl_generation_after_image(tmp_path):
    """Greedy continuation AFTER an image: HF tracks a rope-delta so text
    resumes at max(streams)+1 while cache indices keep counting; the
    engine's per-seq mrope_delta must reproduce HF's generate() tokens —
    through both the per-token decode and the on-device loop."""
    from llm_tpu.convert.hf_llama import (convert_hf_llama,
                                          convert_hf_qwen2vl_mmproj)
    from llm_tpu.mtmd import Chunk, MultimodalRuntime
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    m = _tiny_qwen2vl()
    grid = torch.tensor([[1, 4, 4]])
    pv = torch.randn(16, 3 * 2 * 4 * 4)
    pre, post = [3, 1, 94], [95, 5, 9]
    with torch.no_grad():
        n_img = m.visual(pv, grid_thw=grid).shape[0]
        ids = pre + [96] * n_img + post
        gen = m.generate(torch.tensor([ids]), pixel_values=pv,
                         image_grid_thw=grid, max_new_tokens=6,
                         do_sample=False)
    want = gen[0, len(ids):].tolist()

    lm = str(tmp_path / "lm.gguf")
    mp = str(tmp_path / "mmproj.gguf")
    convert_hf_llama(m, lm, arch="qwen2vl")
    convert_hf_qwen2vl_mmproj(m.visual, mp)
    ctx = Context(GGUFReader(lm), n_cells=64, dtype=jnp.float32)
    rt = MultimodalRuntime(ctx, None, GGUFReader(mp))
    # build the image patches exactly as HF received them (bypass the
    # resize: feed the flattened patch rows through the runtime's encoder)
    import llm_tpu.models.qwen2vl_vision as qv
    emb = np.asarray(qv.qwen2vl_vision_encode(
        rt.clip_params, rt.clip_cfg, jnp.asarray(pv.numpy()), 1, 4, 4))
    mpos, _ = qv.qwen2vl_mrope_positions(len(pre), 1, 4, 4, len(post))
    b = Batch()
    for i, t in enumerate(pre):
        b.add(t, pos=i, mpos=mpos[i])
    assert ctx.decode(b) == 0
    off = len(pre)
    assert ctx.decode_embd(emb, seq_id=0, pos_start=off,
                           mpos=np.asarray(mpos[off:off + n_img])) == 0
    b2 = Batch()
    for j, t in enumerate(post):
        i = off + n_img + j
        b2.add(t, pos=i, logits=j == len(post) - 1, mpos=mpos[i])
    assert ctx.decode(b2) == 0

    # per-token continuation with DEFAULTED mpos (engine delta fills them)
    toks = []
    pos = len(ids)
    tid = int(np.argmax(ctx.get_logits()))
    for _ in range(6):
        toks.append(tid)
        assert ctx.decode(Batch.one(tid, pos=pos, seq_id=0)) == 0
        tid = int(np.argmax(ctx.get_logits()))
        pos += 1
    assert toks == want

    # same through the on-device loop (delta applied in-jit)
    ctx2 = Context(GGUFReader(lm), n_cells=64, dtype=jnp.float32)
    b = Batch()
    for i, t in enumerate(pre):
        b.add(t, pos=i, mpos=mpos[i])
    assert ctx2.decode(b) == 0
    assert ctx2.decode_embd(emb, seq_id=0, pos_start=off,
                            mpos=np.asarray(mpos[off:off + n_img])) == 0
    b2 = Batch()
    for j, t in enumerate(post):
        i = off + n_img + j
        b2.add(t, pos=i, logits=j == len(post) - 1, mpos=mpos[i])
    assert ctx2.decode(b2) == 0
    first = int(np.argmax(ctx2.get_logits()))
    out = ctx2.generate_loop(first, 5, seq_id=0)
    assert [first] + out == want


def test_qwen25vl_vision_tower_matches_hf(tmp_path):
    """Qwen2.5-VL tower: RMS norms, gated-silu MLP, WINDOW attention with
    the merge-unit reorder + full-attention pattern blocks, RMS merger
    ln_q; output back in merged-token order (clip.cpp use_window_attn)."""
    from llm_tpu.convert.hf_llama import convert_hf_qwen2vl_mmproj
    from llm_tpu.models.qwen2vl_vision import (load_qwen2vl_vision,
                                               qwen2vl_vision_encode)

    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import \
        Qwen2_5_VLVisionConfig
    vcfg = Qwen2_5_VLVisionConfig(
        depth=4, hidden_size=32, intermediate_size=48, num_heads=2,
        in_channels=3, patch_size=4, spatial_merge_size=2,
        temporal_patch_size=2, window_size=16,  # 16/2/4 = 2 merged tokens
        fullatt_block_indexes=[1, 3], out_hidden_size=64,
    )
    torch.manual_seed(0)
    vis = transformers.models.qwen2_5_vl.modeling_qwen2_5_vl \
        .Qwen2_5_VisionTransformerPretrainedModel(vcfg).eval()
    grid = torch.tensor([[1, 8, 8]])  # 8x8 patches -> 4x4 merged
    pv = torch.randn(64, 3 * 2 * 4 * 4)
    with torch.no_grad():
        want = vis(pv, grid_thw=grid).numpy()
    path = str(tmp_path / "q25_mmproj.gguf")
    convert_hf_qwen2vl_mmproj(vis, path)
    params, cfg = load_qwen2vl_vision(GGUFReader(path))
    assert cfg.projector == "qwen2.5vl_merger" and cfg.n_wa_pattern == 2
    got = np.asarray(qwen2vl_vision_encode(
        params, cfg, jnp.asarray(pv.numpy()), 1, 8, 8))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_idefics3_projector_matches_hf(tmp_path):
    """idefics3: SigLIP tower + pixel-shuffle connector + single fc
    projection (Idefics3Connector; clip.cpp build_siglip IDEFICS3 branch +
    clip.vision.projector.scale_factor)."""
    from transformers.models.idefics3.modeling_idefics3 import (
        Idefics3Connector, Idefics3VisionTransformer)

    from llm_tpu.convert.hf_llama import convert_hf_idefics3_mmproj
    from llm_tpu.models.clip import (clip_config_from_gguf, clip_encode,
                                     load_clip_params, patchify)

    vcfg = transformers.Idefics3VisionConfig(
        hidden_size=32, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=4,
        hidden_act="gelu_pytorch_tanh")
    full = transformers.Idefics3Config(
        vision_config=vcfg, scale_factor=2,
        text_config=dict(vocab_size=64, hidden_size=48,
                         intermediate_size=64, num_hidden_layers=1,
                         num_attention_heads=2))
    torch.manual_seed(0)
    vis = Idefics3VisionTransformer(vcfg).eval()
    conn = Idefics3Connector(full).eval()
    px = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        h = vis(px).last_hidden_state
        want = conn(h)[0].numpy()
    path = str(tmp_path / "idefics3.gguf")
    convert_hf_idefics3_mmproj(vis, conn, path, scale_factor=2)
    r = GGUFReader(path)
    cfg = clip_config_from_gguf(r)
    assert cfg.proj_scale_factor == 2
    params = load_clip_params(r)
    patches = patchify(px[0].numpy(), 4)
    got = np.asarray(clip_encode(params, cfg, jnp.asarray(patches)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_smolvlm_projector_matches_hf(tmp_path):
    """SmolVLM: same Idefics3 family (HF SmolVLMVisionTransformer +
    SmolVLMConnector are structural copies); exercises the NaViT bucketized
    position ids (bucket 0 reused, last pos-embd row unused) at a different
    geometry + scale_factor=3 (clip.cpp build_siglip IDEFICS3 branch)."""
    from transformers.models.smolvlm.modeling_smolvlm import (
        SmolVLMConnector, SmolVLMVisionTransformer)

    from llm_tpu.convert.hf_llama import convert_hf_idefics3_mmproj
    from llm_tpu.models.clip import (clip_config_from_gguf, clip_encode,
                                     load_clip_params, patchify)

    vcfg = transformers.models.smolvlm.SmolVLMVisionConfig(
        hidden_size=36, intermediate_size=56, num_hidden_layers=2,
        num_attention_heads=3, image_size=24, patch_size=2,
        hidden_act="gelu_pytorch_tanh")
    full = transformers.SmolVLMConfig(
        vision_config=vcfg, scale_factor=3,
        text_config=dict(vocab_size=64, hidden_size=48,
                         intermediate_size=64, num_hidden_layers=1,
                         num_attention_heads=2))
    torch.manual_seed(1)
    vis = SmolVLMVisionTransformer(vcfg).eval()
    conn = SmolVLMConnector(full).eval()
    px = torch.randn(1, 3, 24, 24)  # 12x12 patches -> 4x4 after shuffle
    with torch.no_grad():
        h = vis(px).last_hidden_state
        want = conn(h)[0].numpy()
    path = str(tmp_path / "smolvlm.gguf")
    convert_hf_idefics3_mmproj(vis, conn, path, scale_factor=3)
    r = GGUFReader(path)
    cfg = clip_config_from_gguf(r)
    assert cfg.proj_scale_factor == 3
    params = load_clip_params(r)
    patches = patchify(px[0].numpy(), 2)
    got = np.asarray(clip_encode(params, cfg, jnp.asarray(patches)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_internvl_projector_matches_hf(tmp_path):
    """InternVL: ViT with layer-scale (lambda_1/2) + CLS token, pixel
    shuffle at downsample_ratio=0.5, LN->fc->GELU->fc projector
    (HF InternVLVisionModel/InternVLMultiModalProjector; reference
    InternVisionModel converter + clip.cpp build_internvl)."""
    from transformers import InternVLConfig, InternVLVisionConfig
    from transformers.models.internvl.modeling_internvl import (
        InternVLModel, InternVLMultiModalProjector, InternVLVisionModel)

    from llm_tpu.convert.hf_llama import convert_hf_internvl_mmproj
    from llm_tpu.models.clip import (clip_config_from_gguf, clip_encode,
                                     load_clip_params, patchify)

    vcfg = InternVLVisionConfig(
        hidden_size=32, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=2, image_size=[32, 32], patch_size=[4, 4],
        hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6)
    full = InternVLConfig(
        vision_config=vcfg, downsample_ratio=0.5,
        text_config=dict(model_type="qwen2", vocab_size=64, hidden_size=48,
                         intermediate_size=64, num_hidden_layers=1,
                         num_attention_heads=2))
    torch.manual_seed(0)
    vis = InternVLVisionModel(vcfg).eval()
    proj = InternVLMultiModalProjector(full).eval()
    px = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        h = vis(px).last_hidden_state[:, 1:, :]  # drop CLS (default select)
        fs = int(h.shape[1] ** 0.5)
        v4 = h.reshape(1, fs, fs, -1)
        v4 = InternVLModel.pixel_shuffle(None, v4, scale_factor=0.5)
        want = proj(v4.reshape(1, -1, v4.shape[-1]))[0].numpy()
    path = str(tmp_path / "internvl.gguf")
    convert_hf_internvl_mmproj(vis, proj, path, downsample_ratio=0.5)
    r = GGUFReader(path)
    cfg = clip_config_from_gguf(r)
    assert cfg.projector == "internvl" and cfg.proj_scale_factor == 2
    params = load_clip_params(r)
    assert "ls1" in params["layers"][0]  # layer-scale survived conversion
    patches = patchify(px[0].numpy(), 4)
    got = np.asarray(clip_encode(params, cfg, jnp.asarray(patches)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def _tiny_omni_thinker():
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import \
        Qwen2_5OmniThinkerConfig
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import \
        Qwen2_5OmniThinkerForConditionalGeneration

    cfg = Qwen2_5OmniThinkerConfig(
        audio_config=dict(d_model=32, encoder_layers=2,
                          encoder_attention_heads=2, encoder_ffn_dim=48,
                          num_mel_bins=16, output_dim=64),
        vision_config=dict(depth=2, hidden_size=32, intermediate_size=48,
                           num_heads=2, patch_size=4, spatial_merge_size=2,
                           temporal_patch_size=2, window_size=16,
                           fullatt_block_indexes=[1], out_hidden_size=64),
        text_config=dict(vocab_size=97, hidden_size=64, intermediate_size=112,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, max_position_embeddings=128,
                         tie_word_embeddings=False,
                         # transformers 4.57 rejects type "mrope" here; with
                         # text-only input all three position streams are
                         # equal, so M-RoPE == standard NEOX rope and a
                         # "default"-rope HF oracle is exact
                         rope_scaling={"type": "default"}),
    )
    torch.manual_seed(0)
    return Qwen2_5OmniThinkerForConditionalGeneration(cfg).eval()


def test_qwen25omni_text_tower(tmp_path):
    """Qwen2.5-Omni thinker text tower -> qwen2vl arch (reference registers
    Qwen2_5OmniModel under Qwen2VLModel with thinker. prefix strip and
    visual/audio/talker tower drop, convert_hf_to_gguf.py:2792-2826)."""
    from test_model_vs_hf import _run_ours

    from llm_tpu.convert.hf_llama import convert_hf_auto

    m = _tiny_omni_thinker()
    # mrope sections for head_dim 16 -> half-width 8 (converter fallback
    # [16,24,24] is for the real checkpoints)
    m.config.text_config.rope_scaling["mrope_section"] = [4, 2, 2]
    p = str(tmp_path / "omni.gguf")
    convert_hf_auto(m, p)
    r = GGUFReader(p)
    assert r.architecture == "qwen2vl"
    assert list(r.get("qwen2vl.rope.dimension_sections")) == [4, 2, 2, 0]
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=9).tolist()
    ours = _run_ours(p, tokens)
    with torch.no_grad():
        h = m.model(input_ids=torch.tensor([tokens])).last_hidden_state
        ref = m.lm_head(h)[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-3)


def test_qwen25omni_combined_mmproj(tmp_path):
    """Qwen2.5-Omni combined mmproj: ONE GGUF holding the 2.5-VL-style
    vision tower (split q/k/v) AND the audio tower with the generated
    sinusoid position table (reference Qwen25OmniModel converter,
    convert_hf_to_gguf.py:2906-2963)."""
    from llm_tpu.convert.hf_llama import convert_hf_qwen25omni_mmproj
    from llm_tpu.models.qwen2vl_vision import (load_qwen2vl_vision,
                                               qwen2vl_vision_encode)

    m = _tiny_omni_thinker()
    p = str(tmp_path / "omni_mmproj.gguf")
    convert_hf_qwen25omni_mmproj(m, p)
    r = GGUFReader(p)
    assert bool(r.get("clip.has_vision_encoder"))
    assert bool(r.get("clip.has_audio_encoder"))
    assert str(r.get("clip.projector_type")) == "qwen2.5o"

    # vision side: numeric parity with HF thinker.visual
    grid = torch.tensor([[1, 8, 8]])
    pv = torch.randn(64, 3 * 2 * 4 * 4)
    with torch.no_grad():
        want = m.visual(pv, grid_thw=grid).numpy()
    params, cfg = load_qwen2vl_vision(r)
    got = np.asarray(qwen2vl_vision_encode(
        params, cfg, jnp.asarray(pv.numpy()), 1, 8, 8))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)

    # audio side: all tower tensors present + sinusoid table matches HF's
    names = set(r.tensors)
    for t in ("a.conv1d.1.weight", "a.conv1d.2.weight", "a.post_ln.weight",
              "a.blk.0.attn_q.weight", "a.blk.1.ffn_down.weight",
              "mm.a.fc.weight", "a.position_embd.weight"):
        assert t in names, t
    from llm_tpu.quant.codecs import dequantize_tensor
    ti = r.tensors["a.position_embd.weight"]
    pos = dequantize_tensor(r.data("a.position_embd.weight"),
                            ti.ggml_type, ti.shape)
    pe = getattr(m.audio_tower, "positional_embedding", None)
    hfpos = getattr(pe, "positional_embedding", None)
    if hfpos is not None:  # HF stores the sinusoid table as a buffer
        np.testing.assert_allclose(  # f32(HF) vs f64(ours) sinusoid rounding
            np.asarray(pos), hfpos.detach().numpy()[:1500], atol=1e-4)
    assert np.asarray(pos).shape == (1500, 32)

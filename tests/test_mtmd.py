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

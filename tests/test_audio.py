"""Audio (mtmd) tests: whisper log-mel frontend vs HF's feature extractor,
encoder vs HF WhisperEncoder, and projector output shapes."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_tpu.convert.hf_llama import convert_hf_whisper_mmproj
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.models.audio import (audio_config_from_gguf, load_audio_params,
                                  log_mel_spectrogram, whisper_encode)


def test_log_mel_matches_whisper_feature_extractor():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=80)
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=16000) * 0.1).astype(np.float32)  # 1s

    want = fe(audio, sampling_rate=16000, return_tensors="np",
              padding="max_length").input_features[0]  # [80, 3000]
    got = log_mel_spectrogram(audio, n_mels=80, pad_to_chunk=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.fixture(scope="module")
def whisper_pair(tmp_path_factory):
    from transformers import WhisperConfig, WhisperModel

    torch.manual_seed(0)
    cfg = WhisperConfig(
        num_mel_bins=80, d_model=64, encoder_layers=2,
        encoder_attention_heads=4, encoder_ffn_dim=128,
        decoder_layers=1, decoder_attention_heads=4, decoder_ffn_dim=128,
        max_source_positions=1500, vocab_size=97, pad_token_id=0,
        bos_token_id=1, eos_token_id=2, decoder_start_token_id=1,
    )
    enc = WhisperModel(cfg).eval().encoder
    rng = np.random.default_rng(2)
    fc_w = rng.normal(size=(48, 64)).astype(np.float32) * 0.05
    fc_b = np.zeros(48, np.float32)
    path = str(tmp_path_factory.mktemp("audio") / "mmproj_audio.gguf")
    convert_hf_whisper_mmproj(enc, path, fc_w=fc_w, fc_b=fc_b)
    return enc, (fc_w, fc_b), path


def test_whisper_encoder_matches_hf(whisper_pair):
    enc, (fc_w, fc_b), path = whisper_pair
    reader = GGUFReader(path)
    cfg = audio_config_from_gguf(reader)
    params = load_audio_params(reader)

    rng = np.random.default_rng(1)
    mel = rng.normal(size=(80, 3000)).astype(np.float32)
    with torch.no_grad():
        want = enc(torch.tensor(mel[None])).last_hidden_state[0].numpy()
    want = want @ fc_w.T + fc_b

    got = np.asarray(whisper_encode(params, cfg, jnp.asarray(mel)))
    assert got.shape == want.shape
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.9999, f"corr {corr}"
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


def test_audio_pipeline_shapes(whisper_pair):
    _, _, path = whisper_pair
    reader = GGUFReader(path)
    cfg = audio_config_from_gguf(reader)
    params = load_audio_params(reader)
    audio = np.zeros(8000, np.float32)  # 0.5s
    mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
    out = np.asarray(whisper_encode(params, cfg, jnp.asarray(mel)))
    assert out.shape == (mel.shape[1] // 2, 48)
    assert np.isfinite(out).all()


def test_audio_chunks_end_to_end(whisper_pair, tmp_path):
    """Audio chunk -> whisper tower -> decode_embd -> finite logits."""
    from llm_tpu.convert.hf_llama import convert_hf_llama, convert_hf_whisper_mmproj
    from llm_tpu.mtmd import MultimodalRuntime, tokenize_chunks
    from llm_tpu.runtime.engine import Context
    from llm_tpu.tokenizers import tokenizer_from_gguf

    import sys
    sys.path.insert(0, "tests")
    from test_model_vs_hf import _tiny_hf_llama
    from test_tools import _test_vocab

    enc, _, _ = whisper_pair
    # projector into the tiny LLM's 64-dim embedding space
    rng = np.random.default_rng(3)
    path = str(tmp_path / "mmproj_a64.gguf")
    convert_hf_whisper_mmproj(enc, path,
                              fc_w=rng.normal(size=(64, 64)).astype(np.float32) * 0.05,
                              fc_b=np.zeros(64, np.float32))

    lm = _tiny_hf_llama(hidden=64, layers=2, vocab=97)
    lm_path = str(tmp_path / "lm.gguf")
    convert_hf_llama(lm, lm_path, vocab=_test_vocab(97))
    reader = GGUFReader(lm_path)
    tok = tokenizer_from_gguf(reader)
    ctx = Context(reader, n_cells=256, n_ubatch=128, dtype=jnp.float32)

    rt = MultimodalRuntime(ctx, tok, GGUFReader(path))
    pcm = (np.random.default_rng(4).normal(size=4000) * 0.1).astype(np.float32)
    chunks = tokenize_chunks(tok, "transcribe <__media__> now", [pcm])
    assert [c.kind for c in chunks] == ["text", "audio", "text"]
    assert rt.eval_chunks(chunks) == 0
    assert np.isfinite(ctx.get_logits()).all()

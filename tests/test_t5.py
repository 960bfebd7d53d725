"""T5 encoder-decoder vs the HF oracle: cross-attention, relative-position
buckets, fixed 1.0 attention scale, tied-head logit scaling."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_tpu.convert.hf_llama import convert_hf_t5
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.runtime.t5 import T5Session


def _tiny_t5(gated=False):
    cfg = transformers.T5Config(
        vocab_size=97, d_model=64, d_kv=16, d_ff=112, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="gated-gelu" if gated else "relu",
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    return transformers.T5ForConditionalGeneration(cfg).eval()


@pytest.mark.parametrize("gated", [False, True], ids=["relu", "gated-gelu"])
def test_t5_matches_hf(tmp_path, gated):
    m = _tiny_t5(gated)
    path = str(tmp_path / "t5.gguf")
    convert_hf_t5(m, path)

    rng = np.random.default_rng(0)
    enc_toks = rng.integers(2, 97, size=7).tolist()
    dec_toks = [0] + rng.integers(2, 97, size=4).tolist()

    sess = T5Session(GGUFReader(path), n_cells=32, dtype=jnp.float32)
    sess.encode(enc_toks)
    ours = []
    for i, t in enumerate(dec_toks):
        ours.append(sess.decode([t]))
    ours = np.stack(ours)

    with torch.no_grad():
        out = m(input_ids=torch.tensor([enc_toks]),
                decoder_input_ids=torch.tensor([dec_toks]))
        ref = out.logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-3)


def test_t5_multi_token_decode_matches_stepwise(tmp_path):
    m = _tiny_t5()
    path = str(tmp_path / "t5b.gguf")
    convert_hf_t5(m, path)
    enc = [5, 6, 7, 8]
    dec = [0, 9, 10, 11]

    s1 = T5Session(GGUFReader(path), n_cells=32, dtype=jnp.float32)
    s1.encode(enc)
    last = None
    for t in dec:
        last = s1.decode([t])

    s2 = T5Session(GGUFReader(path), n_cells=32, dtype=jnp.float32)
    s2.encode(enc)
    batch_last = s2.decode(dec)
    np.testing.assert_allclose(batch_last, last, atol=1e-5, rtol=1e-5)


def test_t5_generate_runs(tmp_path):
    m = _tiny_t5()
    path = str(tmp_path / "t5c.gguf")
    convert_hf_t5(m, path)
    sess = T5Session(GGUFReader(path), n_cells=32, dtype=jnp.float32)
    out = sess.generate([4, 5, 6], n_predict=5, eos_id=1)
    assert len(out) <= 5
    with torch.no_grad():
        ref = m.generate(torch.tensor([[4, 5, 6]]), max_new_tokens=5,
                         do_sample=False)
    # HF generate output starts with decoder_start (0); compare the rest
    want = [int(t) for t in ref[0][1:]]
    want = [t for t in want if t != 1][: len(out)]
    assert out[: len(want)] == want

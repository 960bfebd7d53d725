"""Legacy GGML/GGMF/GGJT -> GGUF converter (tools/ggml_to_gguf.py).

Parity target: /root/reference/convert_llama_ggml_to_gguf.py — format
detection, version gates, tensor-name mapping, vocab re-emission, and
raw tensor passthrough. The test writes a real GGJTv3 file byte-by-byte
(per the legacy struct layout), converts it, and checks the resulting
GGUF loads through the real reader/engine with identical tensor bytes.
"""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llm_tpu.gguf.constants import GGMLType, Keys  # noqa: E402
from llm_tpu.gguf.reader import GGUFReader  # noqa: E402
from llm_tpu.tools.ggml_to_gguf import convert, map_name  # noqa: E402

E, L, FF, V, H = 64, 2, 128, 270, 4


def _legacy_tensor_names():
    names = ["tok_embeddings.weight", "norm.weight", "output.weight"]
    for il in range(L):
        p = f"layers.{il}."
        names += [p + "attention.wq.weight", p + "attention.wk.weight",
                  p + "attention.wv.weight", p + "attention.wo.weight",
                  p + "attention_norm.weight",
                  p + "feed_forward.w1.weight", p + "feed_forward.w2.weight",
                  p + "feed_forward.w3.weight", p + "ffn_norm.weight"]
    return names


def _shape_of(name):
    # legacy dims are ne order: (row length, rows)
    if "tok_embeddings" in name or "output.weight" == name:
        return (E, V)
    if name in ("norm.weight",) or "attention_norm" in name \
            or "ffn_norm" in name:
        return (E,)
    if "feed_forward.w1" in name or "feed_forward.w3" in name:
        return (E, FF)
    if "feed_forward.w2" in name:
        return (FF, E)
    return (E, E)  # attention projections


def _write_ggjt_v3(path):
    rng = np.random.default_rng(0)
    tensors = {}
    with open(path, "wb") as fh:
        fh.write(b"tjgg")
        fh.write(struct.pack("<I", 3))
        # hparams: n_vocab n_embd n_mult n_head n_layer n_rot ftype
        fh.write(struct.pack("<7I", V, E, 256, H, L, E // H, 1))
        # spm-style vocab: ids 0-2 special, 3..258 single bytes, rest text
        for tid in range(V):
            if tid < 3:
                text = [b"<unk>", b"<s>", b"</s>"][tid]
            elif tid <= 258:
                text = bytes([tid - 3])
            else:
                text = f"tok {tid}".encode()
            fh.write(struct.pack("<I", len(text)))
            fh.write(text)
            fh.write(struct.pack("<f", -float(tid)))
        for name in _legacy_tensor_names():
            shape = _shape_of(name)
            arr = rng.standard_normal(tuple(reversed(shape))).astype(
                np.float16)
            nb = name.encode()
            fh.write(struct.pack("<3I", len(shape), len(nb), 1))  # F16
            fh.write(struct.pack(f"<{len(shape)}I", *shape))
            fh.write(nb)
            pos = fh.tell()
            fh.write(b"\0" * (((pos + 31) & ~31) - pos))  # 32B align
            fh.write(arr.tobytes())
            tensors[name] = arr
    return tensors


def test_name_mapping():
    assert map_name("tok_embeddings.weight") == "token_embd.weight"
    assert map_name("norm.weight") == "output_norm.weight"
    assert map_name("layers.3.attention.wq.weight") == "blk.3.attn_q.weight"
    assert map_name("layers.0.feed_forward.w1.weight") == \
        "blk.0.ffn_gate.weight"
    assert map_name("layers.0.feed_forward.w2.weight") == \
        "blk.0.ffn_down.weight"
    assert map_name("layers.0.feed_forward.w3.weight") == \
        "blk.0.ffn_up.weight"
    with pytest.raises(ValueError):
        map_name("layers.0.unknown.weight")


def test_ggjt_v3_roundtrip(tmp_path):
    src = str(tmp_path / "legacy.bin")
    out = str(tmp_path / "converted.gguf")
    tensors = _write_ggjt_v3(src)
    info = convert(src, out, eps=1e-5)
    assert info["format"] == "GGJTv3"
    assert info["n_tensors"] == len(tensors)

    r = GGUFReader(out)
    assert r.architecture == "llama"
    a = "llama"
    assert r.metadata[Keys.LLM.EMBEDDING_LENGTH.format(arch=a)] == E
    assert r.metadata[Keys.LLM.BLOCK_COUNT.format(arch=a)] == L
    assert r.metadata[Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a)] == FF
    assert r.metadata[Keys.Attention.HEAD_COUNT.format(arch=a)] == H

    # raw tensor passthrough: bytes identical, names mapped
    for lname, arr in tensors.items():
        gname = map_name(lname)
        ti = r.tensors[gname]
        assert ti.ggml_type == GGMLType.F16
        np.testing.assert_array_equal(
            np.asarray(r.data(gname)).view(np.float16).reshape(arr.shape),
            arr)

    # vocab: byte tokens rewritten, spm specials typed
    toks = r.metadata[Keys.Tokenizer.LIST]
    assert toks[0] == "<unk>" and toks[1] == "<s>" and toks[2] == "</s>"
    assert toks[3 + 0x41] == "<0x41>"
    types = np.asarray(r.metadata[Keys.Tokenizer.TOKEN_TYPE])
    assert types[0] == 2 and types[1] == 3 and types[3 + 0x41] == 6

    # and the converted file runs through the real engine
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    ctx = Context(r, n_cells=16)
    assert ctx.decode(Batch.text([1, 5, 9], seq_id=0)) == 0
    assert np.isfinite(ctx.get_logits()).all()


def test_old_quantized_rejected(tmp_path):
    """Pre-GGJTv3 quantized files must be refused (bit layouts changed)."""
    src = str(tmp_path / "old.bin")
    with open(src, "wb") as fh:
        fh.write(b"tjgg")
        fh.write(struct.pack("<I", 2))  # GGJTv2
        fh.write(struct.pack("<7I", V, E, 256, H, L, E // H, 2))  # Q4_0
    with pytest.raises(ValueError, match="GGJTv3"):
        convert(src, str(tmp_path / "x.gguf"))

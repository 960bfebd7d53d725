"""GGUF reader/writer round-trip and corrupt-file tests (model:
reference tests/test-gguf.cpp)."""

import os

import numpy as np
import pytest

from llm_tpu.gguf.constants import GGMLType, Keys
from llm_tpu.gguf.reader import GGUFError, GGUFReader
from llm_tpu.gguf.writer import GGUFWriter
from llm_tpu.quant import codecs

from conftest import REFERENCE_DIR, reference_available


def _write_sample(path, alignment=32):
    w = GGUFWriter(path, arch="llama", alignment=alignment)
    w.add_kv("general.name", "test-model")
    w.add_kv("llama.block_count", 2)
    w.add_kv("llama.embedding_length", 64)
    w.add_kv("test.float", 1.5)
    w.add_kv("test.bool", True)
    w.add_kv("test.neg", -7)
    w.add_kv("test.arr_i32", np.array([1, 2, 3], np.int32))
    w.add_kv("test.arr_f32", np.array([0.5, 1.5], np.float32))
    w.add_kv("test.arr_str", ["a", "bc", "def"])

    rng = np.random.default_rng(0)
    a = rng.normal(size=(8, 64)).astype(np.float32)
    b = rng.normal(size=(4, 256)).astype(np.float32)
    w.add_tensor("tensor_f32", a)
    w.add_tensor("tensor_f16", a, ggml_type=GGMLType.F16)
    raw = codecs.quantize(b, GGMLType.Q4_K)
    w.add_tensor("tensor_q4k", None, ggml_type=GGMLType.Q4_K, raw=raw, shape=(256, 4))
    w.write()
    return a, b


def test_round_trip(tmp_path):
    p = str(tmp_path / "m.gguf")
    a, b = _write_sample(p)
    r = GGUFReader(p)
    assert r.architecture == "llama"
    assert r.metadata["general.name"] == "test-model"
    assert r.metadata["llama.block_count"] == 2
    assert r.metadata["test.bool"] is True
    assert r.metadata["test.neg"] == -7
    assert r.metadata["test.float"] == pytest.approx(1.5)
    np.testing.assert_array_equal(r.metadata["test.arr_i32"], [1, 2, 3])
    assert list(r.metadata["test.arr_str"]) == ["a", "bc", "def"]

    ti = r.tensors["tensor_f32"]
    assert ti.shape == (64, 8)  # ne order (row dim first)
    got = codecs.dequantize_tensor(r.data("tensor_f32"), ti.ggml_type, ti.shape)
    np.testing.assert_array_equal(got, a)

    tq = r.tensors["tensor_q4k"]
    assert tq.ggml_type == GGMLType.Q4_K
    got_q = codecs.dequantize_tensor(r.data("tensor_q4k"), GGMLType.Q4_K, tq.shape)
    ref_q = codecs.dequantize(codecs.quantize(b, GGMLType.Q4_K), GGMLType.Q4_K, 256)
    np.testing.assert_array_equal(got_q, ref_q.reshape(4, 256))


def test_alignment_honored(tmp_path):
    p = str(tmp_path / "m64.gguf")
    _write_sample(p, alignment=64)
    r = GGUFReader(p)
    assert r.alignment == 64
    for name in r.tensors:
        assert r.tensors[name].offset % 64 == 0


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b"XXXX" + b[4:],                      # bad magic
        lambda b: b[:4] + b"\x63\0\0\0" + b[8:],        # bad version
        lambda b: b[: len(b) // 2],                      # truncated
        lambda b: b[:16] + b"\xff\xff\xff\xff" + b[20:],  # huge kv count
    ],
)
def test_corrupt_files_rejected(tmp_path, mutate):
    p = str(tmp_path / "m.gguf")
    _write_sample(p)
    blob = open(p, "rb").read()
    bad = str(tmp_path / "bad.gguf")
    with open(bad, "wb") as f:
        f.write(mutate(blob))
    with pytest.raises(GGUFError):
        GGUFReader(bad)


def test_duplicate_tensor_rejected(tmp_path):
    p = str(tmp_path / "d.gguf")
    w = GGUFWriter(p, arch="llama")
    w.add_tensor("t", np.zeros((2, 2), np.float32))
    with pytest.raises(ValueError):
        w.add_tensor("t", np.zeros((2, 2), np.float32))


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_reference_gguf_py_reads_our_file(tmp_path):
    """Interop: a file written by our writer parses with the reference's
    pure-Python reader and yields identical tensor bytes."""
    import sys

    p = str(tmp_path / "interop.gguf")
    a, b = _write_sample(p)
    sys.path.insert(0, os.path.join(REFERENCE_DIR, "gguf-py"))
    try:
        from gguf.gguf_reader import GGUFReader as RefReader  # type: ignore
    finally:
        sys.path.pop(0)
    rr = RefReader(p)
    fields = {f.name: f for f in rr.fields.values()}
    assert "general.architecture" in fields
    t = {t.name: t for t in rr.tensors}
    assert set(t) == {"tensor_f32", "tensor_f16", "tensor_q4k"}
    ours = GGUFReader(p)
    np.testing.assert_array_equal(
        np.asarray(t["tensor_q4k"].data).view(np.uint8).reshape(-1),
        np.asarray(ours.data("tensor_q4k")).reshape(-1),
    )


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_read_reference_vocab_gguf():
    """Parse a real GGUF file produced by the reference tooling."""
    path = os.path.join(REFERENCE_DIR, "models", "ggml-vocab-llama-spm.gguf")
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    r = GGUFReader(path)
    assert r.architecture == "llama"
    toks = r.metadata[Keys.Tokenizer.LIST]
    assert len(toks) == 32000
    assert r.metadata[Keys.Tokenizer.MODEL] == "llama"


def test_split_and_merge(tmp_path):
    from llm_tpu.tools.gguf_split import merge_gguf, split_gguf

    p = str(tmp_path / "m.gguf")
    _write_sample(p)
    paths = split_gguf(p, str(tmp_path / "shard"), max_tensors=2)
    assert len(paths) == 2
    # split set opens transparently via the first shard
    r = GGUFReader(paths[0])
    orig = GGUFReader(p)
    assert set(r.tensors) == set(orig.tensors)
    np.testing.assert_array_equal(
        np.asarray(r.data("tensor_q4k")), np.asarray(orig.data("tensor_q4k"))
    )
    merged = merge_gguf(paths[0], str(tmp_path / "merged.gguf"))
    r2 = GGUFReader(merged)
    assert set(r2.tensors) == set(orig.tensors)
    assert r2.metadata["general.name"] == "test-model"


def test_corrupt_file_fuzz_matrix(tmp_path):
    """Byte-level fuzz over every header/metadata region (the reference's
    test-gguf.cpp corrupt-file matrix, HANDCRAFTED_KV/TENSOR cases): each
    mutated file must either raise GGUFError/ValueError or parse into a
    self-consistent reader — never crash or return out-of-bounds views."""
    p = str(tmp_path / "m.gguf")
    _write_sample(p)
    blob = bytearray(open(p, "rb").read())
    rng = np.random.default_rng(0)

    header_end = min(len(blob), 512)
    offsets = list(range(0, 24))  # magic/version/counts
    offsets += list(rng.integers(24, header_end, size=120))  # kv/tensor meta
    offsets += list(rng.integers(header_end, len(blob), size=40))

    n_bad = 0
    for off in offsets:
        for val in (0x00, 0xFF, 0x7F):
            bad = bytearray(blob)
            bad[off] = val
            bp = str(tmp_path / "fz.gguf")
            with open(bp, "wb") as f:
                f.write(bad)
            try:
                r = GGUFReader(bp)
                # parsed: every tensor view must stay in bounds
                for name, ti in r.tensors.items():
                    data = r.data(name)
                    assert data.nbytes >= 0
                _ = r.metadata
                r.close()
            except (GGUFError, ValueError, UnicodeDecodeError, OverflowError,
                    KeyError):
                n_bad += 1
    # a healthy validator rejects a large share of the mutations
    assert n_bad > len(offsets) // 2, n_bad


def test_truncation_sweep_never_crashes(tmp_path):
    """Every truncation point either raises cleanly or yields a consistent
    reader (test-gguf.cpp truncation cases)."""
    p = str(tmp_path / "m.gguf")
    _write_sample(p)
    blob = open(p, "rb").read()
    for cut in range(0, len(blob), max(1, len(blob) // 200)):
        bp = str(tmp_path / "tr.gguf")
        with open(bp, "wb") as f:
            f.write(blob[:cut])
        try:
            r = GGUFReader(bp)
            for name in r.tensors:
                _ = r.data(name)
            r.close()
        except (GGUFError, ValueError, UnicodeDecodeError, OverflowError):
            pass

"""Tokenizer golden tests against the reference's committed fixtures
(models/ggml-vocab-*.gguf{,.inp,.out}) — the same data test-tokenizer-0
uses (/root/reference/tests/test-tokenizer-0.cpp)."""

import os

import pytest

from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.tokenizers import tokenizer_from_gguf

from conftest import REFERENCE_DIR, reference_available

FIXTURES = os.path.join(REFERENCE_DIR, "models")


def load_cases(name):
    base = os.path.join(FIXTURES, f"ggml-vocab-{name}.gguf")
    with open(base + ".inp", encoding="utf-8") as f:
        inputs = f.read().split("\n__ggml_vocab_test__\n")
    if inputs and inputs[-1] in ("", "\n"):  # file ends with the separator
        inputs = inputs[:-1]
    with open(base + ".out", encoding="utf-8") as f:
        outputs = [
            [int(x) for x in line.split()] for line in f.read().splitlines()
        ]
    assert len(inputs) == len(outputs)
    return base, list(zip(inputs, outputs))


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
@pytest.mark.parametrize("name", ["llama-spm", "phi-3"])
def test_spm_golden(name):
    path, cases = load_cases(name)
    tok = tokenizer_from_gguf(GGUFReader(path))
    bad = []
    for text, want in cases:
        got = tok.encode(text, add_special=False, parse_special=False)
        if got != want:
            bad.append((text, got, want))
    assert not bad, f"{len(bad)}/{len(cases)} mismatches; first: {bad[0]!r}"


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
@pytest.mark.parametrize(
    "name",
    ["gpt-2", "mpt", "deepseek-llm", "deepseek-coder", "falcon", "starcoder", "refact"],
)
def test_bpe_golden(name):
    path, cases = load_cases(name)
    tok = tokenizer_from_gguf(GGUFReader(path))
    bad = []
    for text, want in cases:
        got = tok.encode(text, add_special=False, parse_special=False)
        if got != want:
            bad.append((text, got, want))
    assert not bad, f"{len(bad)}/{len(cases)} mismatches; first: {bad[0]!r}"


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_spm_round_trip_decode():
    path, _ = load_cases("llama-spm")
    tok = tokenizer_from_gguf(GGUFReader(path))
    text = "Hello world, this is a test! 123"
    ids = tok.encode(text, add_special=False)
    assert tok.decode(ids) == text


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_bpe_round_trip_decode():
    path, _ = load_cases("gpt-2")
    tok = tokenizer_from_gguf(GGUFReader(path))
    text = "Hello world, this is a test! 123 \n tabs\tand ünïcödé"
    ids = tok.encode(text, add_special=False)
    assert tok.decode(ids) == text


# ---------------------------------------------------------------------------
# WPM (BERT) — golden fixture
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_wpm_golden():
    path, cases = load_cases("bert-bge")
    tok = tokenizer_from_gguf(GGUFReader(path))
    bad = []
    for text, want in cases:
        got = tok.encode(text, add_special=False, parse_special=False)
        if got != want:
            bad.append((text, got, want))
    assert not bad, f"{len(bad)}/{len(cases)} mismatches; first: {bad[0]!r}"


# ---------------------------------------------------------------------------
# UGM (T5/unigram) — synthetic Viterbi + XCDA charsmap units
# ---------------------------------------------------------------------------


def _ugm_vocab(tokens_scores, charsmap=b"", **kw):
    import numpy as np
    from llm_tpu.tokenizers.vocab import TokenType, Vocab

    toks = ["<unk>"] + [t for t, _ in tokens_scores]
    scores = np.asarray([0.0] + [s for _, s in tokens_scores], np.float32)
    types = np.asarray(
        [TokenType.UNKNOWN] + [TokenType.NORMAL] * len(tokens_scores), np.int32
    )
    return Vocab(
        model="t5", pre="default", tokens=toks, scores=scores, types=types,
        unk_id=0, add_space_prefix=kw.get("add_space_prefix", True),
        remove_extra_whitespaces=kw.get("remove_extra_whitespaces", True),
        precompiled_charsmap=charsmap,
    )


def test_ugm_viterbi_prefers_high_score():
    from llm_tpu.tokenizers import UgmTokenizer

    # "▁ab" as one token scores better than "▁a"+"b"
    v = _ugm_vocab([("▁ab", -1.0), ("▁a", -2.0), ("b", -2.0), ("▁", -3.0)])
    tok = UgmTokenizer(v)
    assert tok.encode("ab", add_special=False) == [v.token_to_id["▁ab"]]
    # and the split wins when the joint token is penalized
    v2 = _ugm_vocab([("▁ab", -10.0), ("▁a", -2.0), ("b", -2.0)])
    tok2 = UgmTokenizer(v2)
    assert tok2.encode("ab", add_special=False) == [
        v2.token_to_id["▁a"], v2.token_to_id["b"]]


def test_ugm_unknowns_merge():
    from llm_tpu.tokenizers import UgmTokenizer

    v = _ugm_vocab([("▁a", -1.0)])
    tok = UgmTokenizer(v)
    # 'a' matches; 'xyz' has no tokens -> single merged UNK
    assert tok.encode("a xyz", add_special=False) == [
        v.token_to_id["▁a"], v.unk_id]


def test_ugm_space_handling():
    from llm_tpu.tokenizers import UgmTokenizer

    v = _ugm_vocab([("▁a", -1.0), ("▁b", -1.0), ("▁", -1.0)])
    tok = UgmTokenizer(v)
    # remove_extra_whitespaces merges the double space
    assert tok.encode("a  b", add_special=False) == [
        v.token_to_id["▁a"], v.token_to_id["▁b"]]


def _tiny_xcda(prefix: bytes, replacement: bytes) -> bytes:
    """Hand-assemble a 1-rule XCDA charsmap: prefix (1 byte) -> replacement."""
    import struct

    assert len(prefix) == 1
    c = prefix[0]
    nodes = [0] * 128
    root_base = 8
    nodes[0] = root_base << 10
    child = root_base ^ c
    value_node = 100
    child_base = child ^ value_node
    nodes[child] = (child_base << 10) | (1 << 8) | c
    nodes[value_node] = (1 << 31) | 0  # replacement offset 0
    blob = struct.pack("<I", len(nodes) * 4)
    blob += struct.pack(f"<{len(nodes)}I", *nodes)
    blob += replacement + b"\0"
    return blob


def test_ugm_xcda_charsmap_replacement():
    from llm_tpu.tokenizers import UgmTokenizer

    # charsmap rule: 'A' -> 'b'; vocab can only match '▁b'
    v = _ugm_vocab([("▁b", -1.0)], charsmap=_tiny_xcda(b"A", b"b"))
    tok = UgmTokenizer(v)
    assert tok.encode("A", add_special=False) == [v.token_to_id["▁b"]]


# ---------------------------------------------------------------------------
# RWKV — byte-trie greedy longest match
# ---------------------------------------------------------------------------


def test_rwkv_unescape():
    from llm_tpu.tokenizers.rwkv import unescape_rwkv_token

    assert unescape_rwkv_token("ab") == b"ab"
    assert unescape_rwkv_token("\\n\\t\\r\\\\") == b"\n\t\r\\"
    assert unescape_rwkv_token("\\xc3\\xa9") == "é".encode()


def test_rwkv_greedy_longest():
    import numpy as np
    from llm_tpu.tokenizers import RwkvTokenizer
    from llm_tpu.tokenizers.vocab import TokenType, Vocab

    toks = ["<unk>", "a", "ab", "abc", "b", "c", " ", "\\n"]
    v = Vocab(
        model="rwkv", pre="default", tokens=toks,
        scores=np.zeros(len(toks), np.float32),
        types=np.full(len(toks), TokenType.NORMAL, np.int32), unk_id=0,
    )
    tok = RwkvTokenizer(v)
    assert tok.encode("abc") == [toks.index("abc")]
    assert tok.encode("abab c\n") == [
        toks.index("ab"), toks.index("ab"), toks.index(" "),
        toks.index("c"), toks.index("\\n")]
    assert tok.decode(tok.encode("abc b")) == "abc b"

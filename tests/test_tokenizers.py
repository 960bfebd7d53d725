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

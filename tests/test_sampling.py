"""Sampler unit/distributional tests (model: reference tests/test-sampling.cpp)."""

import numpy as np
import pytest

from llm_tpu.samplers import (
    XTC,
    Candidates,
    Chain,
    Dist,
    Dry,
    Greedy,
    MinP,
    MirostatV2,
    Penalties,
    SamplingParams,
    Temp,
    TopK,
    TopNSigma,
    TopP,
    Typical,
    build_chain,
)


def probs_to_logits(p):
    return np.log(np.asarray(p, np.float32))


def apply_and_get(sampler, probs):
    cur = Candidates.from_logits(probs_to_logits(probs))
    sampler.apply(cur)
    p = np.exp(cur.logits - cur.logits.max())
    p /= p.sum()
    return cur.ids, p


def test_greedy():
    c = Chain([Greedy()])
    assert c.sample(probs_to_logits([0.1, 0.6, 0.3])) == 1


def test_top_k():
    ids, p = apply_and_get(TopK(2), [0.1, 0.2, 0.3, 0.4])
    assert list(ids) == [3, 2]
    np.testing.assert_allclose(p, [4 / 7, 3 / 7], atol=1e-6)


def test_top_p():
    # p=0.7: keep 0.4+0.3 (cum 0.7 >= 0.7)
    ids, p = apply_and_get(TopP(0.7), [0.1, 0.2, 0.3, 0.4])
    assert list(ids) == [3, 2]


def test_min_p():
    ids, _ = apply_and_get(MinP(0.5), [0.05, 0.1, 0.25, 0.6])
    assert list(ids) == [3]  # only >= 0.5*0.6


def test_typical():
    ids, _ = apply_and_get(Typical(0.5), [0.97, 0.01, 0.01, 0.01])
    assert list(ids) == [0]


def test_temp_scales_entropy():
    cur = Candidates.from_logits(probs_to_logits([0.1, 0.9]))
    Temp(2.0).apply(cur)
    p = np.exp(cur.logits - cur.logits.max())
    p /= p.sum()
    assert p[1] < 0.9  # flatter


def test_temp_zero_is_greedy():
    c = Chain([Temp(0.0), Dist(seed=1)])
    assert c.sample(probs_to_logits([0.2, 0.5, 0.3])) == 1


def test_top_n_sigma():
    logits = np.array([10.0, 9.9, 0.0, -5.0], np.float32)
    cur = Candidates.from_logits(logits)
    TopNSigma(1.0).apply(cur)
    assert 0 in cur.ids and 1 in cur.ids and 3 not in cur.ids


def test_xtc_removes_top():
    x = XTC(p=1.0, t=0.2, seed=42)
    ids, _ = apply_and_get(x, [0.5, 0.3, 0.15, 0.05])
    # tokens >= 0.2: {0, 1}; all but least probable removed -> 0 gone
    assert 0 not in ids and 1 in ids


def test_penalties_repeat():
    pen = Penalties(last_n=8, repeat=2.0)
    for t in (1, 1, 2):
        pen.accept(t)
    cur = Candidates.from_logits(np.array([1.0, 1.0, -1.0], np.float32))
    pen.apply(cur)
    assert cur.logits[1] == pytest.approx(0.5)  # positive: divided
    assert cur.logits[2] == pytest.approx(-2.0)  # negative: multiplied
    assert cur.logits[0] == pytest.approx(1.0)


def test_dist_seeded_deterministic_and_distributional():
    logits = probs_to_logits([0.2, 0.8])
    c1 = Chain([Dist(seed=7)])
    c2 = Chain([Dist(seed=7)])
    seq1 = [c1.sample(logits) for _ in range(20)]
    seq2 = [c2.sample(logits) for _ in range(20)]
    assert seq1 == seq2
    draws = [Chain([Dist(seed=3)]).sample(logits) for _ in range(1)]
    c = Chain([Dist(seed=3)])
    draws = [c.sample(logits) for _ in range(2000)]
    frac1 = np.mean(np.asarray(draws) == 1)
    assert 0.75 < frac1 < 0.85


def test_mirostat_v2_converges():
    rng = np.random.default_rng(0)
    m = MirostatV2(tau=3.0, eta=0.2, seed=5)
    logits = rng.normal(size=200).astype(np.float32) * 3
    c = Chain([m])
    for _ in range(50):
        c.sample(logits)
    assert np.isfinite(m.mu)


def test_dry_penalizes_repeat_extension():
    d = Dry(multiplier=1.0, base=2.0, allowed_length=2, penalty_last_n=32)
    for t in (5, 6, 7, 1, 2, 5, 6):  # suffix "5 6" seen before, followed by 7
        d.accept(t)
    cur = Candidates.from_logits(np.zeros(10, np.float32))
    d.apply(cur)
    assert cur.logits[7] < 0  # extending the repeat is penalized
    assert cur.logits[3] == 0


def test_build_chain_greedy_and_sampling():
    p = SamplingParams(temp=0.0)
    c = build_chain(p, n_vocab=10)
    logits = probs_to_logits(np.full(10, 0.1))
    logits[4] += 1.0
    assert c.sample(logits) == 4

    p2 = SamplingParams(temp=0.8, top_k=5, seed=11)
    c2 = build_chain(p2, n_vocab=10)
    toks = {c2.sample(logits) for _ in range(50)}
    assert toks.issubset(set(range(10)))
    assert 4 in toks


def test_infill_sampler():
    """Infill sampler parity cases (llama.h:1357-1377 doc examples)."""
    from llm_tpu.samplers.chain import Candidates, Infill

    class _V:
        eos_id, eot_id = 90, 91

        def is_eog(self, t):
            return t in (90, 91)

    class _T:
        vocab = _V()
        pieces = {0: "hel", 1: "hell", 2: "hello", 3: "dummy", 90: "", 91: ""}

        def piece(self, t):
            return self.pieces.get(t, f"<{t}>")

    tok = _T()
    s = Infill(tok)

    # prefix merging: hel/hell/hello combine into the strongest
    logits = np.log(np.asarray([0.5, 0.2, 0.1, 0.2], np.float64))
    cur = Candidates(ids=np.asarray([0, 1, 2, 3], np.int32),
                     logits=logits.astype(np.float32))
    s.apply(cur)
    p = cur.probs()
    m = {int(i): float(x) for i, x in zip(cur.ids, p)}
    # 0.5+0.2+0.1 merge into "hel" (0.8); the final 1/(n+1) floor then
    # drops "dummy" (0.2 < 1/2), leaving the merged token at p=1
    assert set(m) == {0} and abs(m[0] - 1.0) < 1e-3

    # EOG dominance: strong eos prob -> only EOG kept
    cur = Candidates(ids=np.asarray([3, 90], np.int32),
                     logits=np.asarray([0.0, 2.0], np.float32))
    s.apply(cur)
    assert list(cur.ids) == [90]

    # nothing textual above threshold -> single EOT
    ids = np.arange(20, dtype=np.int32)
    cur = Candidates(ids=ids, logits=np.zeros(20, np.float32))
    s.apply(cur)
    assert list(cur.ids) == [91]

"""Batched on-device generation loop (Context.generate_loop_batch) and the
in-jit per-row sampler it uses (samplers/device.py).

Parity targets: the reference server batches every generating slot into one
llama_decode per token (tools/server/server.cpp:2961 update_slots) with
per-slot samplers (common/sampling.cpp); here the whole chunk runs device-
side, so the tests pin (a) the in-jit sampler's masked distribution against
the host chain samplers it mirrors, and (b) the batched loop's token
streams / cache bookkeeping against the single-sequence device loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_tpu.convert.hf_llama import convert_hf_llama
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.runtime.batch import Batch
from llm_tpu.runtime.engine import Context
from llm_tpu.samplers import SamplingParams
from llm_tpu.samplers.chain import Candidates, MinP, Temp, TopK, TopP
from llm_tpu.samplers.device import device_eligible, process_rows

from test_model_vs_hf import _tiny_hf_llama


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    model = _tiny_hf_llama()
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    convert_hf_llama(model, path)
    return path, model


# -- in-jit sampler vs host chain --------------------------------------------


def _host_masked_probs(logits, temp, top_k, top_p, min_p):
    cur = Candidates.from_logits(logits)
    TopK(top_k).apply(cur)
    TopP(top_p, 1).apply(cur)
    MinP(min_p, 1).apply(cur)
    Temp(temp).apply(cur)
    p = cur.probs()
    return {int(i): float(v) for i, v in zip(cur.ids, p)}


@pytest.mark.parametrize("temp,top_k,top_p,min_p", [
    (0.8, 40, 0.95, 0.05),   # llama.cpp defaults
    (1.0, 1, 1.0, 0.0),      # top-k=1 == greedy
    (0.5, 200, 0.5, 0.0),    # aggressive nucleus
    (1.3, 16, 1.0, 0.2),     # min-p dominant
    (0.7, 256, 0.9, 0.0),    # k at the K_CAP prefilter edge
])
def test_process_rows_matches_host_chain(temp, top_k, top_p, min_p):
    rng = np.random.default_rng(0)
    V = 997
    logits = (rng.normal(size=(4, V)) * 3).astype(np.float32)
    vals, idx = jax.jit(process_rows)(
        jnp.asarray(logits),
        jnp.full(4, temp, jnp.float32), jnp.full(4, top_k, jnp.int32),
        jnp.full(4, top_p, jnp.float32), jnp.full(4, min_p, jnp.float32))
    vals, idx = np.asarray(vals), np.asarray(idx)
    for b in range(4):
        want = _host_masked_probs(logits[b], temp, top_k, top_p, min_p)
        alive = vals[b] > -np.inf
        got_ids = idx[b][alive]
        z = np.exp(vals[b][alive] - vals[b][alive].max())
        got_p = z / z.sum()
        assert set(got_ids.tolist()) == set(want.keys())
        for i, p in zip(got_ids, got_p):
            assert abs(p - want[int(i)]) < 1e-5


def test_process_rows_per_row_params_differ():
    """One call, four different per-row configs — each row must match its
    own host chain (the whole point of traced per-slot parameters)."""
    rng = np.random.default_rng(1)
    V = 512
    logits = (rng.normal(size=(4, V)) * 2).astype(np.float32)
    cfgs = [(0.8, 40, 0.95, 0.05), (1.0, 1, 1.0, 0.0),
            (0.5, 100, 0.7, 0.0), (2.0, 8, 1.0, 0.3)]
    vals, idx = process_rows(
        jnp.asarray(logits),
        jnp.asarray([c[0] for c in cfgs], jnp.float32),
        jnp.asarray([c[1] for c in cfgs], jnp.int32),
        jnp.asarray([c[2] for c in cfgs], jnp.float32),
        jnp.asarray([c[3] for c in cfgs], jnp.float32))
    vals, idx = np.asarray(vals), np.asarray(idx)
    for b, (t, k, p_, m) in enumerate(cfgs):
        want = _host_masked_probs(logits[b], t, k, p_, m)
        alive = vals[b] > -np.inf
        assert set(idx[b][alive].tolist()) == set(want.keys())


def test_device_eligible_gate():
    assert device_eligible(SamplingParams())  # defaults qualify
    assert device_eligible(SamplingParams(temp=0.0, top_k=0))  # greedy
    bad = [
        SamplingParams(grammar="root ::= \"a\""),
        SamplingParams(logit_bias={3: 1.0}),
        SamplingParams(penalty_repeat=1.2),
        SamplingParams(mirostat=2),
        SamplingParams(dry_multiplier=0.5),
        SamplingParams(xtc_probability=0.3),
        SamplingParams(typical_p=0.9),
        SamplingParams(dynatemp_range=0.4),
        SamplingParams(top_n_sigma=2.0),
        SamplingParams(top_k=0),          # sampled + unbounded candidates
        SamplingParams(top_k=5000),       # beyond the K_CAP prefilter
        SamplingParams(min_keep=4),
    ]
    for p in bad:
        assert not device_eligible(p), p


# -- batched loop vs single-sequence loop -------------------------------------


def _prefill(ctx, prompt, seq_id):
    assert ctx.decode(Batch.text(list(prompt), seq_id=seq_id)) == 0
    return int(np.argmax(ctx.get_logits()))


PROMPTS = [[3, 1, 4, 1, 5], [9, 2, 6], [5, 3, 5, 8, 9, 7]]


def test_generate_loop_batch_greedy_matches_single(tiny_gguf):
    path, _ = tiny_gguf
    n = 8
    # reference streams: each sequence alone through the single-seq loop
    want = []
    for prompt in PROMPTS:
        ctx = Context(GGUFReader(path), n_cells=96, dtype=jnp.float32)
        first = _prefill(ctx, prompt, 0)
        want.append([first] + ctx.generate_loop(first, n - 1, seq_id=0))

    ctx = Context(GGUFReader(path), n_cells=96, dtype=jnp.float32)
    firsts = [_prefill(ctx, p, i) for i, p in enumerate(PROMPTS)]
    assert firsts == [w[0] for w in want]
    rows = ctx.generate_loop_batch(firsts, n - 1,
                                   seq_ids=list(range(len(PROMPTS))))
    for row, w in zip(rows, want):
        assert row == w[1:]
    # host cell table reconciled per sequence; the batch loop's cells are
    # continuable — follow-up chunks stay exact
    for i, (prompt, w) in enumerate(zip(PROMPTS, want)):
        assert ctx.cells.seq_pos_max(i) == len(prompt) + n - 2
    ctx2 = Context(GGUFReader(path), n_cells=96, dtype=jnp.float32)
    f2 = _prefill(ctx2, PROMPTS[0], 0)
    cont_want = ctx2.generate_loop(f2, 2 * n, seq_id=0)
    rows2 = ctx.generate_loop_batch(
        [w[-1] for w in want], n, seq_ids=list(range(len(PROMPTS))))
    assert rows2[0] == cont_want[n - 1:2 * n - 1]


def test_generate_loop_batch_eog_and_limits(tiny_gguf):
    path, _ = tiny_gguf
    ctx = Context(GGUFReader(path), n_cells=96, dtype=jnp.float32)
    firsts = [_prefill(ctx, p, i) for i, p in enumerate(PROMPTS)]
    full = ctx.generate_loop_batch(firsts, 8, seq_ids=[0, 1, 2])
    # row 1 stops at its 3rd token via EOG; row 2 capped at 2 by n_limits
    ctx2 = Context(GGUFReader(path), n_cells=96, dtype=jnp.float32)
    f2 = [_prefill(ctx2, p, i) for i, p in enumerate(PROMPTS)]
    rows = ctx2.generate_loop_batch(
        f2, 8, seq_ids=[0, 1, 2], n_limits=[8, 8, 2],
        eog_ids=(full[1][2],))
    assert rows[1] == full[1][:3]
    assert rows[2] == full[2][:2]
    # finished rows coast without corrupting the others
    stopped_early = full[0][2] == full[1][2]  # row 0 may share the EOG id
    if not stopped_early:
        assert rows[0] == full[0]
    # only emitted tokens occupy cells
    assert ctx2.cells.seq_pos_max(1) == len(PROMPTS[1]) + 3 - 1
    assert ctx2.cells.seq_pos_max(2) == len(PROMPTS[2]) + 2 - 1


def test_generate_loop_batch_sampled_reproducible(tiny_gguf):
    path, _ = tiny_gguf

    def run():
        ctx = Context(GGUFReader(path), n_cells=96, dtype=jnp.float32)
        firsts = [_prefill(ctx, p, i) for i, p in enumerate(PROMPTS[:2])]
        return ctx.generate_loop_batch(
            firsts, 6, seq_ids=[0, 1], temps=[0.8, 1.2],
            top_ks=[20, 40], top_ps=[0.95, 0.8], min_ps=[0.05, 0.0],
            seeds=[7, 11])

    a, b = run(), run()
    assert a == b
    assert all(len(r) == 6 for r in a)


def test_generate_loop_batch_mixed_greedy_sampled(tiny_gguf):
    """Greedy rows inside a sampled batch stay bit-exact vs the single-seq
    greedy loop."""
    path, _ = tiny_gguf
    ctx = Context(GGUFReader(path), n_cells=96, dtype=jnp.float32)
    want = None
    fresh = Context(GGUFReader(path), n_cells=96, dtype=jnp.float32)
    f0 = _prefill(fresh, PROMPTS[0], 0)
    want = fresh.generate_loop(f0, 6, seq_id=0)

    firsts = [_prefill(ctx, p, i) for i, p in enumerate(PROMPTS[:2])]
    rows = ctx.generate_loop_batch(
        firsts, 6, seq_ids=[0, 1], temps=[0.0, 0.9],
        top_ks=[0, 30], top_ps=[1.0, 0.9], min_ps=[0.0, 0.05],
        seeds=[0, 3])
    assert rows[0] == want


def test_generate_loop_batch_pow2_bucketing(tiny_gguf):
    """Odd batch sizes ride the next power-of-two program (pad rows decode
    under the scratch seq): a slot count that fluctuates per chunk must not
    compile one program per B."""
    path, _ = tiny_gguf
    ctx = Context(GGUFReader(path), n_cells=96, dtype=jnp.float32)
    firsts = [_prefill(ctx, p, i) for i, p in enumerate(PROMPTS)]
    ctx.generate_loop_batch(firsts, 4, seq_ids=[0, 1, 2])  # B=3 -> pad 4
    keys = [k for k in ctx._steps if k[0] == "gloopb"]
    assert ("gloopb", 4, 4) in keys and ("gloopb", 3, 4) not in keys
    # scratch-seq garbage is invisible: no cell is occupied by seq 255
    assert ctx.cells.n_seq_cells(255) == 0


def test_generate_loop_batch_rejects_unsupported(tiny_gguf):
    path, _ = tiny_gguf
    ctx = Context(GGUFReader(path), n_cells=32, dtype=jnp.float32)
    with pytest.raises(RuntimeError):
        # 2 seqs x 32 tokens > 32 cells -> allocation failure surfaces
        ctx.generate_loop_batch([1, 2], 32, seq_ids=[0, 1])

"""Engine tests: decode loop, cache consistency, seq ops, cache-full code."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_tpu.convert.hf_llama import convert_hf_llama
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.runtime.batch import Batch
from llm_tpu.runtime.engine import Context

from test_model_vs_hf import _tiny_hf_llama


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    model = _tiny_hf_llama()
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    convert_hf_llama(model, path)
    return path, model


def test_prefill_then_decode_matches_hf_greedy(tiny_gguf):
    path, model = tiny_gguf
    ctx = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, model.config.vocab_size, size=6).tolist()

    assert ctx.decode(Batch.text(prompt)) == 0
    ours = [int(np.argmax(ctx.get_logits()))]
    for _ in range(4):
        assert ctx.decode(Batch.one(ours[-1])) == 0
        ours.append(int(np.argmax(ctx.get_logits())))

    with torch.no_grad():
        toks = list(prompt)
        ref = []
        for _ in range(5):
            logits = model(torch.tensor([toks])).logits[0, -1].numpy()
            nxt = int(np.argmax(logits))
            ref.append(nxt)
            toks.append(nxt)
    assert ours == ref


def test_parallel_sequences_are_isolated(tiny_gguf):
    path, model = tiny_gguf
    ctx = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    p0 = rng.integers(0, model.config.vocab_size, size=5).tolist()
    p1 = rng.integers(0, model.config.vocab_size, size=3).tolist()

    # decode both sequences interleaved in one batch
    b = Batch()
    for i, t in enumerate(p0):
        b.add(t, i, (0,), logits=(i == len(p0) - 1))
    for i, t in enumerate(p1):
        b.add(t, i, (1,), logits=(i == len(p1) - 1))
    assert ctx.decode(b) == 0
    l0 = ctx.get_logits(len(p0) - 1)
    l1 = ctx.get_logits(len(p0) + len(p1) - 1)

    # same prompts decoded in isolated contexts must match
    ctx0 = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32)
    ctx0.decode(Batch.text(p0))
    np.testing.assert_allclose(l0, ctx0.get_logits(), atol=1e-4, rtol=1e-4)
    ctx1 = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32)
    ctx1.decode(Batch.text(p1))
    np.testing.assert_allclose(l1, ctx1.get_logits(), atol=1e-4, rtol=1e-4)


def test_seq_rm_and_reuse(tiny_gguf):
    path, model = tiny_gguf
    ctx = Context(GGUFReader(path), n_cells=16, dtype=jnp.float32)
    p = [1, 2, 3, 4, 5]
    assert ctx.decode(Batch.text(p)) == 0
    base = ctx.get_logits().copy()
    # pollute seq 1 then remove it; seq 0 logits must be reproducible
    ctx.decode(Batch.text([7, 8, 9], seq_id=1))
    ctx.seq_rm(1)
    assert ctx.cells.n_seq_cells(1) == 0
    # re-decode last token of seq 0 after removing it first
    ctx.seq_rm(0, len(p) - 1, len(p))
    assert ctx.decode(Batch.one(p[-1], pos=len(p) - 1, seq_id=0)) == 0
    np.testing.assert_allclose(ctx.get_logits(), base, atol=1e-4, rtol=1e-4)


def test_cache_full_returns_1(tiny_gguf):
    path, _ = tiny_gguf
    ctx = Context(GGUFReader(path), n_cells=4, dtype=jnp.float32)
    assert ctx.decode(Batch.text([1, 2, 3, 4, 5, 6])) == 1


def test_invalid_seq_id_returns_neg1(tiny_gguf):
    path, _ = tiny_gguf
    ctx = Context(GGUFReader(path), n_cells=8, dtype=jnp.float32)
    b = Batch()
    b.add(1, 0, (999,), True)
    assert ctx.decode(b) == -1


def test_context_shift_seq_add_is_shift_invariant(tiny_gguf):
    """seq_add is the reference's context-shift primitive (main.cpp:372-400).
    Because K is cached unroped and rotated on read, a global position shift
    must leave continuation logits EXACTLY unchanged (RoPE attention depends
    only on relative positions) — the shift is pure metadata, with no K
    rewrite graph."""
    path, model = tiny_gguf
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]

    ctx = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32)
    ctx.decode(Batch.text(prompt))
    nxt = int(np.argmax(ctx.get_logits()))
    ctx.decode(Batch.one(nxt, pos=len(prompt)))
    want = ctx.get_logits().copy()

    ctx2 = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32)
    ctx2.decode(Batch.text(prompt))
    ctx2.seq_add(0, 0, -1, +10)
    assert ctx2.seq_pos_max(0) == len(prompt) - 1 + 10
    ctx2.decode(Batch.one(nxt, pos=len(prompt) + 10))
    np.testing.assert_allclose(ctx2.get_logits(), want, atol=1e-5, rtol=1e-5)


def test_self_extend_seq_div_runs(tiny_gguf):
    """seq_div compresses position groups (self-extend, main.cpp:481-489)."""
    path, _ = tiny_gguf
    ctx = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32)
    ctx.decode(Batch.text([1, 2, 3, 4, 5, 6, 7, 8]))
    ctx.seq_div(0, 0, 8, 2)
    assert ctx.seq_pos_max(0) == 3
    assert ctx.decode(Batch.one(9, pos=4)) == 0
    assert np.isfinite(ctx.get_logits()).all()


def test_quantized_kv_cache_close_to_bf16(tiny_gguf):
    """ctx_k/type_v q8_0 cache (llama.cpp --cache-type-k q8_0 parity)."""
    path, model = tiny_gguf
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    ref = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32)
    ref.decode(Batch.text(prompt))
    want = ref.get_logits()

    qctx = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32,
                   kv_dtype="q8_0")
    assert qctx.decode(Batch.text(prompt)) == 0
    got = qctx.get_logits()
    # q8 KV error is tiny; top-1 must match and logits stay close
    assert int(np.argmax(got)) == int(np.argmax(want))
    assert np.max(np.abs(got - want)) < 0.05

    # greedy continuation works
    nxt = int(np.argmax(got))
    assert qctx.decode(Batch.one(nxt)) == 0


def test_passkey_style_long_context(tiny_gguf):
    """Functional analogue of examples/passkey (passkey.cpp:46-105): feed a
    stream several times the cache size using context shifting (n_keep +
    discard-half), then keep decoding — the cells stay bounded and logits
    finite through every shift."""
    path, _ = tiny_gguf
    n_ctx = 32
    ctx = Context(GGUFReader(path), n_cells=n_ctx, dtype=jnp.float32, n_ubatch=16)
    n_keep = 4
    n_past = 0
    shifts = 0
    for tok in range(1, 100):  # ~3x the cache size
        if ctx.cells.n_seq_cells(0) + 1 > n_ctx - 1:
            n_left = n_past - n_keep
            n_discard = n_left // 2
            ctx.seq_rm(0, n_keep, n_keep + n_discard)
            ctx.seq_add(0, n_keep + n_discard, n_past, -n_discard)
            n_past -= n_discard
            shifts += 1
        assert ctx.decode(Batch.one(tok % 90, pos=n_past)) == 0
        n_past += 1
    assert shifts >= 3
    assert ctx.cells.n_seq_cells(0) <= n_ctx
    assert np.isfinite(ctx.get_logits()).all()
    # position metadata stays contiguous-ish: max pos == n_past - 1
    assert ctx.cells.seq_pos_max(0) == n_past - 1


def _swa_cfg(cfg):
    """Give a synthetic llama config gemma2-style interleaved SWA."""
    from dataclasses import replace

    return replace(cfg, swa_window=8, swa_pattern=2)


def test_iswa_dual_cache_matches_swa_full():
    """ISWA ring (SWA layers on a small cache with pruning) must produce
    the same logits as the full-size swa_full cache, including once the
    ring has wrapped past its capacity (reference parity:
    llama-kv-cache-unified-iswa.*)."""
    from llm_tpu.models.synthetic import make_synthetic_model

    params, cfg = make_synthetic_model(
        n_embd=64, n_layers=2, n_heads=4, n_kv_heads=4, n_ff=128,
        vocab=64, qtype=None, dtype=jnp.float32, fuse=False)
    cfg = _swa_cfg(cfg)
    full = Context(None, n_cells=128, dtype=jnp.float32,
                   params_cfg=(params, cfg), swa_full=True, n_ubatch=16)
    dual = Context(None, n_cells=128, dtype=jnp.float32,
                   params_cfg=(params, cfg), n_ubatch=16, n_seq_hint=1)
    assert dual.cells_swa is not None
    assert dual.n_swa_rows < dual.n_kv_rows
    # SWA layers (0) small, global layers (1) full-size
    # head-major caches [Hkv, S, D]: cells on axis 1
    assert dual.kv.k[0].shape[1] == dual.n_swa_rows
    assert dual.kv.k[1].shape[1] == dual.n_kv_rows

    rng = np.random.default_rng(3)
    toks = [int(t) for t in rng.integers(0, 64, size=60)]
    for ctx in (full, dual):
        assert ctx.decode(Batch.text(toks, seq_id=0)) == 0
    np.testing.assert_allclose(dual.get_logits(), full.get_logits(),
                               atol=1e-5, rtol=1e-5)

    # keep decoding one-by-one well past the ring capacity (24 cells)
    for i in range(40):
        t = int(rng.integers(0, 64))
        for ctx in (full, dual):
            assert ctx.decode(Batch.one(t, pos=len(toks) + i, seq_id=0)) == 0
        np.testing.assert_allclose(dual.get_logits(), full.get_logits(),
                                   atol=1e-5, rtol=1e-5)


def test_iswa_state_roundtrip():
    from llm_tpu.models.synthetic import make_synthetic_model
    from llm_tpu.runtime.state import state_load, state_save

    params, cfg = make_synthetic_model(
        n_embd=64, n_layers=2, n_heads=4, n_kv_heads=4, n_ff=128,
        vocab=64, qtype=None, dtype=jnp.float32, fuse=False)
    cfg = _swa_cfg(cfg)
    ctx = Context(None, n_cells=128, dtype=jnp.float32,
                  params_cfg=(params, cfg), n_ubatch=16)
    toks = list(range(1, 20))
    assert ctx.decode(Batch.text(toks, seq_id=0)) == 0
    ref = ctx.get_logits()
    import tempfile, os
    p = os.path.join(tempfile.mkdtemp(), "s.npz")
    state_save(ctx, p, tokens=toks)

    ctx2 = Context(None, n_cells=128, dtype=jnp.float32,
                   params_cfg=(params, cfg), n_ubatch=16)
    got_toks = state_load(ctx2, p)
    assert got_toks == toks
    for c in (ctx, ctx2):
        assert c.decode(Batch.one(5, pos=len(toks), seq_id=0)) == 0
    np.testing.assert_allclose(ctx2.get_logits(), ctx.get_logits(),
                               atol=1e-5, rtol=1e-5)


def test_seq_ids_above_32():
    """MAX_SEQS=256 (the reference server's parallel-slot ceiling,
    llama-server default --parallel cap): high sequence ids work and are
    isolated (multi-word [S, W] uint32 bit-planes)."""
    from llm_tpu.runtime.kv_cache import MAX_SEQS

    assert MAX_SEQS >= 256
    from llm_tpu.models.synthetic import make_synthetic_model

    params, cfg = make_synthetic_model(
        n_embd=64, n_layers=2, n_heads=4, n_kv_heads=4, n_ff=128,
        vocab=64, qtype=None, dtype=jnp.float32, fuse=False)
    ctx = Context(None, n_cells=64, dtype=jnp.float32,
                  params_cfg=(params, cfg))
    toks = [3, 1, 4, 1, 5]
    assert ctx.decode(Batch.text(toks, seq_id=2)) == 0
    ref = ctx.get_logits()
    assert ctx.decode(Batch.text(toks, seq_id=40)) == 0
    np.testing.assert_allclose(ctx.get_logits(), ref, atol=1e-6)
    assert ctx.decode(Batch.text([9, 9, 9], seq_id=63)) == 0
    # high-seq decode did not disturb seq 40's state
    assert ctx.decode(Batch.one(7, pos=len(toks), seq_id=40)) == 0
    got40 = ctx.get_logits()
    assert ctx.decode(Batch.one(7, pos=len(toks), seq_id=2)) == 0
    np.testing.assert_allclose(ctx.get_logits(), got40, atol=1e-6)
    assert ctx.seq_pos_max(63) == 2
    ctx.seq_rm(63)
    assert ctx.seq_pos_max(63) == -1
    # word-3 bitset lane: seq 255 isolated from seq 40, seq_cp across words
    assert ctx.decode(Batch.text(toks, seq_id=255)) == 0
    np.testing.assert_allclose(ctx.get_logits(), ref, atol=1e-6)
    ctx.seq_cp(255, 130)
    assert ctx.decode(Batch.one(7, pos=len(toks), seq_id=130)) == 0
    np.testing.assert_allclose(ctx.get_logits(), got40, atol=1e-6)
    assert ctx.seq_pos_max(255) == len(toks) - 1
    ctx.seq_keep(130)
    assert ctx.seq_pos_max(255) == -1
    assert ctx.seq_pos_max(40) == -1
    assert ctx.seq_pos_max(130) == len(toks)


def test_scan_layers_matches_loop():
    """The lax.scan decoder path (stacked layer params + stacked KV) must
    match the per-layer python loop exactly — same weights, same inputs."""
    from llm_tpu.gguf.constants import GGMLType
    from llm_tpu.models.loader import stack_layers
    from llm_tpu.models.synthetic import make_synthetic_model
    from llm_tpu.models.transformer import forward

    params, cfg = make_synthetic_model(
        n_embd=64, n_layers=3, n_heads=4, n_kv_heads=2, n_ff=128,
        vocab=64, qtype=GGMLType.Q8_0, dtype=jnp.float32, fuse=True)
    T, S = 5, 16
    tok = jnp.asarray(np.arange(T) % 64, jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)
    seq = jnp.zeros(T, jnp.int32)
    cpos = jnp.concatenate([pos, jnp.zeros(S - T, jnp.int32)])
    cbits = jnp.asarray((np.arange(S) < T).astype(np.uint32))
    oidx = jnp.arange(T, dtype=jnp.int32)
    kv_k = [jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim), jnp.float32)
            for _ in range(cfg.n_layers)]
    kv_v = [jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim_v), jnp.float32)
            for _ in range(cfg.n_layers)]
    ref, ref_k, _, _ = forward(params, cfg, kv_k, kv_v, tok, pos, seq, pos,
                               cpos, cbits, oidx, dtype=jnp.float32)

    stacked = stack_layers(params["layers"])
    assert stacked is not None
    p2 = dict(params)
    p2["layers_stacked"] = stacked
    p2["layers"] = []
    kk = jnp.stack(kv_k)
    vv = jnp.stack(kv_v)
    got, got_k, _, _ = forward(p2, cfg, kk, vv, tok, pos, seq, pos,
                               cpos, cbits, oidx, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_k[1]), np.asarray(ref_k[1]),
                               atol=1e-6, rtol=1e-6)


def test_context_scan_layers_decode():
    """Context(scan_layers=True) produces the same logits as the loop
    engine across prefill + incremental decode."""
    from llm_tpu.models.synthetic import make_synthetic_model

    params, cfg = make_synthetic_model(
        n_embd=64, n_layers=3, n_heads=4, n_kv_heads=2, n_ff=128,
        vocab=64, qtype=None, dtype=jnp.float32, fuse=False)
    ref = Context(None, n_cells=32, dtype=jnp.float32,
                  params_cfg=(params, cfg))
    scan = Context(None, n_cells=32, dtype=jnp.float32,
                   params_cfg=(params, cfg), scan_layers=True)
    assert "layers_stacked" in scan.params
    toks = [3, 1, 4, 1, 5]
    for c in (ref, scan):
        assert c.decode(Batch.text(toks, seq_id=0)) == 0
    np.testing.assert_allclose(scan.get_logits(), ref.get_logits(),
                               atol=2e-5, rtol=2e-5)
    for c in (ref, scan):
        assert c.decode(Batch.one(9, pos=len(toks), seq_id=0)) == 0
    np.testing.assert_allclose(scan.get_logits(), ref.get_logits(),
                               atol=2e-5, rtol=2e-5)


def test_model_load_progress_and_cancel(tiny_gguf):
    """Load progress callback + cancellation (llama.h:314-317,
    test-model-load-cancel parity)."""
    from llm_tpu.models.loader import load_params

    path, _ = tiny_gguf
    seen = []
    load_params(GGUFReader(path), dense_dtype=jnp.float32,
                progress_callback=lambda f: seen.append(f) or True)
    assert seen and seen[-1] == 1.0 and seen == sorted(seen)

    with pytest.raises(InterruptedError):
        load_params(GGUFReader(path), dense_dtype=jnp.float32,
                    progress_callback=lambda f: f < 0.5)


def test_split_equal_and_split_seq():
    """split_equal keeps per-seq token counts equal per ubatch; split_seq
    isolates sequences (llama-batch.h:69-77 semantics)."""
    from llm_tpu.runtime.batch import Batch, split_equal, split_seq

    b = Batch()
    for i in range(5):
        b.add(10 + i, i, (0,))
    for i in range(3):
        b.add(20 + i, i, (1,))
    for i in range(5):
        b.add(30 + i, i, (2,))

    ubs = split_equal(b, 64)
    for ub in ubs:
        seqs, counts = np.unique(ub.seq_primary, return_counts=True)
        assert len(set(counts)) == 1  # equal tokens per participating seq
    # order preserved within each sequence
    got0 = [t for ub in ubs for t, s in zip(ub.tokens, ub.seq_primary) if s == 0]
    assert got0 == [10, 11, 12, 13, 14]
    total = sum(len(ub.tokens) for ub in ubs)
    assert total == len(b)

    ubs = split_seq(b, 4)
    for ub in ubs:
        assert len(set(ub.seq_primary.tolist())) == 1
        assert len(ub.tokens) <= 4
    assert sum(len(ub.tokens) for ub in ubs) == len(b)


def test_generate_loop_matches_serial_decode(tiny_gguf):
    """On-device while-loop generation (greedy) must reproduce the serial
    decode()+argmax token stream exactly, including cache metadata
    reconciliation and a follow-up decode continuing from the loop's
    cells."""
    path, _ = tiny_gguf
    prompt = [3, 1, 4, 1, 5]

    serial = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32)
    assert serial.decode(Batch.text(prompt, seq_id=0)) == 0
    toks = [int(np.argmax(serial.get_logits()))]
    for i in range(11):
        assert serial.decode(Batch.one(toks[-1], pos=len(prompt) + i,
                                       seq_id=0)) == 0
        toks.append(int(np.argmax(serial.get_logits())))

    ctx = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32)
    assert ctx.decode(Batch.text(prompt, seq_id=0)) == 0
    first = int(np.argmax(ctx.get_logits()))
    assert first == toks[0]
    out = ctx.generate_loop(first, 8, seq_id=0)
    assert out == toks[1:9]
    # host cell table reconciled: continue OFF the loop's cells
    assert ctx.cells.seq_pos_max(0) == len(prompt) + 8 - 1
    out2 = ctx.generate_loop(out[-1], 3, seq_id=0)
    assert out2 == toks[9:12]


def test_generate_loop_eog_stop(tiny_gguf):
    """The loop stops after emitting an EOG id."""
    path, _ = tiny_gguf
    prompt = [3, 1, 4]
    ctx = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32)
    assert ctx.decode(Batch.text(prompt, seq_id=0)) == 0
    first = int(np.argmax(ctx.get_logits()))
    full = ctx.generate_loop(first, 8, seq_id=0)
    # pick the 3rd generated token as a fake EOG: the loop must stop there
    ctx2 = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32)
    assert ctx2.decode(Batch.text(prompt, seq_id=0)) == 0
    out = ctx2.generate_loop(first, 8, seq_id=0, eog_ids=(full[2],))
    assert out == full[:3]
    # freed cells stay free: only the emitted tokens occupy cells
    assert ctx2.cells.seq_pos_max(0) == len(prompt) + 3 - 1


def test_generate_loop_sampled(tiny_gguf):
    """Temperature/top-k sampling path runs and is reproducible per seed."""
    path, _ = tiny_gguf
    ctx = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32)
    assert ctx.decode(Batch.text([3, 1, 4], seq_id=0)) == 0
    first = int(np.argmax(ctx.get_logits()))
    a = ctx.generate_loop(first, 6, seq_id=0, temp=0.8, top_k=20, seed=7)
    ctx2 = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32)
    assert ctx2.decode(Batch.text([3, 1, 4], seq_id=0)) == 0
    b = ctx2.generate_loop(first, 6, seq_id=0, temp=0.8, top_k=20, seed=7)
    assert a == b and len(a) == 6


def test_generate_loop_q8_cache(tiny_gguf):
    """On-device loop over the int8-quantized KV cache matches serial
    decode with the same cache type (identical quantization both paths)."""
    path, _ = tiny_gguf
    prompt = [3, 1, 4, 1, 5]
    serial = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32,
                     kv_dtype="q8_0")
    assert serial.decode(Batch.text(prompt, seq_id=0)) == 0
    toks = [int(np.argmax(serial.get_logits()))]
    for i in range(7):
        assert serial.decode(Batch.one(toks[-1], pos=len(prompt) + i,
                                       seq_id=0)) == 0
        toks.append(int(np.argmax(serial.get_logits())))
    ctx = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32,
                  kv_dtype="q8_0")
    assert ctx.decode(Batch.text(prompt, seq_id=0)) == 0
    out = ctx.generate_loop(toks[0], 7, seq_id=0)
    assert out == toks[1:8]


def test_generate_loop_iswa_ring():
    """generate_loop over the ISWA dual ring: the host-planned ring-slot
    schedule + in-loop relabeling must emit exactly the tokens the
    swa_full cache's loop emits, INCLUDING once the ring has wrapped and
    slots are being reused mid-loop; afterwards the host SWACellTable is
    reconciled so plain decode() continues correctly."""
    from llm_tpu.models.synthetic import make_synthetic_model

    params, cfg = make_synthetic_model(
        n_embd=64, n_layers=2, n_heads=4, n_kv_heads=4, n_ff=128,
        vocab=64, qtype=None, dtype=jnp.float32, fuse=False)
    from dataclasses import replace

    cfg = replace(cfg, swa_window=8, swa_pattern=2)
    full = Context(None, n_cells=128, dtype=jnp.float32,
                   params_cfg=(params, cfg), swa_full=True, n_ubatch=16)
    dual = Context(None, n_cells=128, dtype=jnp.float32,
                   params_cfg=(params, cfg), n_ubatch=16, n_seq_hint=1)
    ring = dual.cells_swa.n_cells
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    for ctx in (full, dual):
        assert ctx.decode(Batch.text(prompt, seq_id=0)) == 0
    first = int(np.argmax(full.get_logits()))
    n = ring + 8  # force mid-loop ring reuse
    want = full.generate_loop(first, n, seq_id=0)
    got = dual.generate_loop(first, n, seq_id=0)
    assert got == want
    # host ring metadata reconciled: follow-up decode matches too
    t = want[-1]
    p0 = len(prompt) + n
    for i in range(4):
        for ctx in (full, dual):
            assert ctx.decode(Batch.one(t, pos=p0 + i, seq_id=0)) == 0
        np.testing.assert_allclose(dual.get_logits(), full.get_logits(),
                                   atol=1e-5, rtol=1e-5)
        t = int(np.argmax(full.get_logits()))


def test_generate_loop_iswa_sharded():
    """gemma-style interleaved-SWA geometry, TP-sharded: generate_loop over
    the ISWA ring on an 8-device mesh matches the unsharded swa_full loop."""
    from dataclasses import replace

    from llm_tpu.models.synthetic import make_synthetic_model
    from llm_tpu.parallel.sharding import make_mesh

    params, cfg = make_synthetic_model(
        n_embd=256, n_layers=2, n_heads=8, n_kv_heads=8, n_ff=512,
        vocab=256, qtype=None, dtype=jnp.float32, fuse=False)
    cfg = replace(cfg, swa_window=8, swa_pattern=2)
    full = Context(None, n_cells=64, dtype=jnp.float32,
                   params_cfg=(params, cfg), swa_full=True, n_ubatch=16)
    mesh = make_mesh(n_tp=8)
    dual = Context(None, n_cells=64, dtype=jnp.float32,
                   params_cfg=(params, cfg), n_ubatch=16, n_seq_hint=1,
                   mesh=mesh)
    assert dual.cells_swa is not None
    prompt = [3, 1, 4, 1, 5]
    for ctx in (full, dual):
        assert ctx.decode(Batch.text(prompt, seq_id=0)) == 0
    first = int(np.argmax(full.get_logits()))
    want = full.generate_loop(first, 12, seq_id=0)
    got = dual.generate_loop(first, 12, seq_id=0)
    assert got == want


def test_parallel_contexts_thread_safety(tiny_gguf):
    """Two Contexts sharing ONE params dict, driven from concurrent
    threads, must each reproduce the serial single-context greedy stream
    (reference test-thread-safety.cpp: n_ctx contexts over one shared
    llama_model, concurrent generation, outputs must match)."""
    import threading

    from llm_tpu.models.loader import load_params

    path, model = tiny_gguf
    params, cfg = load_params(GGUFReader(path), dense_dtype=jnp.float32)
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, model.config.vocab_size, size=5).tolist()
               for _ in range(2)]

    def run(prompt):
        ctx = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32,
                      params_cfg=(params, cfg))
        assert ctx.decode(Batch.text(prompt)) == 0
        out = [int(np.argmax(ctx.get_logits()))]
        for _ in range(6):
            assert ctx.decode(Batch.one(out[-1])) == 0
            out.append(int(np.argmax(ctx.get_logits())))
        return out

    # serial ground truth
    want = [run(p) for p in prompts]

    got = [None, None]
    errs = []

    def worker(i):
        try:
            got[i] = run(prompts[i])
        except Exception as e:  # propagate to the main thread
            errs.append(e)

    for _ in range(3):  # a few rounds to shake out races
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errs, errs
        assert got == want

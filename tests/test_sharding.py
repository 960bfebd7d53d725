"""TP sharding over a virtual 8-device CPU mesh: the sharded forward must
equal the single-device forward exactly (GSPMD inserts the collectives)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from llm_tpu.gguf.constants import GGMLType
from llm_tpu.models.synthetic import make_synthetic_model
from llm_tpu.models.transformer import forward
from llm_tpu.parallel.sharding import kv_shardings, make_mesh, param_shardings, shard_params


def _inputs(cfg, T=5, S=16):
    tok = jnp.asarray(np.arange(T) % cfg.vocab_size, jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)
    seq = jnp.zeros(T, jnp.int32)
    widx = jnp.arange(T, dtype=jnp.int32)
    cpos = jnp.concatenate([pos, jnp.zeros(S - T, jnp.int32)])
    cbits = jnp.concatenate([jnp.ones(T, jnp.uint32), jnp.zeros(S - T, jnp.uint32)])
    oidx = jnp.arange(T, dtype=jnp.int32)
    return tok, pos, seq, widx, cpos, cbits, oidx


def _fresh_kv(cfg, S=16, dtype=jnp.float32):
    kv_k = [jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim), dtype) for _ in range(cfg.n_layers)]
    kv_v = [jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim_v), dtype) for _ in range(cfg.n_layers)]
    return kv_k, kv_v


@pytest.mark.parametrize("qtype", [None, GGMLType.Q4_K])
def test_tp8_matches_single_device(qtype):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    params, cfg = make_synthetic_model(
        n_embd=256, n_layers=2, n_heads=8, n_kv_heads=8, n_ff=512,
        vocab=256, qtype=qtype, dtype=jnp.float32, fuse=False,
    )
    inputs = _inputs(cfg)

    kv_k, kv_v = _fresh_kv(cfg)
    ref_logits, _, _, _ = forward(params, cfg, kv_k, kv_v, *inputs, dtype=jnp.float32)
    ref = np.asarray(ref_logits)

    mesh = make_mesh(n_tp=8)
    sparams, _ = shard_params(params, mesh)
    kss_k, kss_v = kv_shardings(cfg.n_layers, mesh)
    kv_k2, kv_v2 = _fresh_kv(cfg)
    kv_k2 = [jax.device_put(a, s) for a, s in zip(kv_k2, kss_k)]
    kv_v2 = [jax.device_put(a, s) for a, s in zip(kv_v2, kss_v)]

    def step(p, kk, vv, *ins):
        return forward(p, cfg, kk, vv, *ins, dtype=jnp.float32)

    with mesh:
        out = jax.jit(step)(sparams, kv_k2, kv_v2, *inputs)
    got = np.asarray(out[0])
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)
    # head-major KV came back head-sharded on axis 0
    assert tuple(out[1][0].sharding.spec)[:1] == ("tp",)


def test_param_shardings_structure():
    params, cfg = make_synthetic_model(
        n_embd=256, n_ff=512, n_heads=8, n_kv_heads=8, vocab=256,
        qtype=GGMLType.Q4_K, fuse=False,
    )
    mesh = make_mesh(n_tp=8)
    sh = param_shardings(params, mesh)
    l0 = sh["layers"][0]
    # K-major planes: output-feature shard is on the lane (last) dim
    assert l0["attn_q"].qs.spec == P(None, "tp")
    assert l0["attn_output"].qs.spec == P("tp", None)
    assert l0["ffn_down"].qs.spec == P("tp", None)
    assert sh["output_norm"].spec == P()


def test_dp_axis_mesh():
    mesh = make_mesh(n_tp=4, n_dp=2)
    assert dict(mesh.shape) == {"dp": 2, "sp": 1, "tp": 4}


def test_sequence_parallel_kv_matches_single_device():
    """KV cells sharded over the sp axis: attention reduces across shards
    (context parallelism) and must match the unsharded forward exactly."""
    params, cfg = make_synthetic_model(
        n_embd=256, n_layers=2, n_heads=8, n_kv_heads=8, n_ff=512,
        vocab=256, qtype=None, dtype=jnp.float32, fuse=False,
    )
    inputs = _inputs(cfg)
    kv_k, kv_v = _fresh_kv(cfg)
    ref = np.asarray(
        forward(params, cfg, kv_k, kv_v, *inputs, dtype=jnp.float32)[0])

    mesh = make_mesh(n_tp=2, n_sp=4)
    sparams, _ = shard_params(params, mesh)
    kss_k, kss_v = kv_shardings(cfg.n_layers, mesh)
    kv_k2, kv_v2 = _fresh_kv(cfg)
    kv_k2 = [jax.device_put(a, s) for a, s in zip(kv_k2, kss_k)]
    kv_v2 = [jax.device_put(a, s) for a, s in zip(kv_v2, kss_v)]

    def step(p, kk, vv, *ins):
        return forward(p, cfg, kk, vv, *ins, dtype=jnp.float32)

    with mesh:
        out = jax.jit(step)(sparams, kv_k2, kv_v2, *inputs)
    np.testing.assert_allclose(np.asarray(out[0]), ref, atol=2e-4, rtol=2e-4)
    assert tuple(out[1][0].sharding.spec)[:2] == ("tp", "sp")


def test_expert_parallel_moe_matches_dense():
    """shard_map EP dispatch == the single-device dense top-k MoE path."""
    from llm_tpu.parallel.moe import set_ep_mesh

    params, cfg = make_synthetic_model(
        n_embd=256, n_layers=2, n_heads=8, n_kv_heads=8, n_ff=512,
        vocab=256, qtype=None, dtype=jnp.float32, fuse=False,
        n_expert=8, n_expert_used=2,
    )
    inputs = _inputs(cfg)
    kv_k, kv_v = _fresh_kv(cfg)
    ref = np.asarray(
        forward(params, cfg, kv_k, kv_v, *inputs, dtype=jnp.float32)[0])

    mesh = make_mesh(n_tp=8)
    sparams, _ = shard_params(params, mesh)
    kss_k, kss_v = kv_shardings(cfg.n_layers, mesh)
    kv_k2, kv_v2 = _fresh_kv(cfg)
    kv_k2 = [jax.device_put(a, s) for a, s in zip(kv_k2, kss_k)]
    kv_v2 = [jax.device_put(a, s) for a, s in zip(kv_v2, kss_v)]

    def step(p, kk, vv, *ins):
        return forward(p, cfg, kk, vv, *ins, dtype=jnp.float32)

    set_ep_mesh(mesh)
    try:
        with mesh:
            out = jax.jit(step)(sparams, kv_k2, kv_v2, *inputs)
        np.testing.assert_allclose(np.asarray(out[0]), ref, atol=2e-4, rtol=2e-4)
    finally:
        set_ep_mesh(None)


def test_context_tp_exact_match():
    """Engine-level TP: Context(mesh=...) shards weights + KV and its
    decode() output must match the single-device Context exactly — the
    integration the reference exposes as --split-mode row."""
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    params, cfg = make_synthetic_model(
        n_embd=256, n_layers=2, n_heads=8, n_kv_heads=8, n_ff=512,
        vocab=256, qtype=GGMLType.Q4_K, dtype=jnp.float32, fuse=False,
    )
    ref_ctx = Context(None, n_cells=32, dtype=jnp.float32,
                      params_cfg=(params, cfg))
    mesh = make_mesh(n_tp=4, n_sp=2)
    tp_ctx = Context(None, n_cells=32, dtype=jnp.float32,
                     params_cfg=(params, cfg), mesh=mesh)
    assert tp_ctx.n_kv_rows % 2 == 0  # cells padded to the sp axis

    toks = [3, 1, 4, 1, 5, 9, 2, 6]
    for ctx in (ref_ctx, tp_ctx):
        rc = ctx.decode(Batch.text(toks, seq_id=0))
        assert rc == 0
    np.testing.assert_allclose(
        tp_ctx.get_logits(), ref_ctx.get_logits(), atol=2e-4, rtol=2e-4)

    # a follow-up single-token decode reads the sharded cache
    for ctx in (ref_ctx, tp_ctx):
        rc = ctx.decode(Batch.one(7, pos=len(toks), seq_id=0))
        assert rc == 0
    np.testing.assert_allclose(
        tp_ctx.get_logits(), ref_ctx.get_logits(), atol=2e-4, rtol=2e-4)
    spec = tuple(tp_ctx.kv.k[0].sharding.spec)
    assert spec[:2] == ("tp", "sp")


def test_context_tp_moe_ep():
    """Context(mesh) on a MoE model routes through the shard_map EP path."""
    from llm_tpu.parallel.moe import ep_mesh, set_ep_mesh
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    params, cfg = make_synthetic_model(
        n_embd=256, n_layers=2, n_heads=8, n_kv_heads=8, n_ff=512,
        vocab=256, qtype=None, dtype=jnp.float32, fuse=False,
        n_expert=8, n_expert_used=2,
    )
    ref_ctx = Context(None, n_cells=32, dtype=jnp.float32,
                      params_cfg=(params, cfg))
    toks = [3, 1, 4, 1, 5]
    assert ref_ctx.decode(Batch.text(toks, seq_id=0)) == 0
    ref = ref_ctx.get_logits()

    mesh = make_mesh(n_tp=8)
    try:
        tp_ctx = Context(None, n_cells=32, dtype=jnp.float32,
                         params_cfg=(params, cfg), mesh=mesh)
        assert ep_mesh()[0] is mesh  # engine enabled expert parallelism
        assert tp_ctx.decode(Batch.text(toks, seq_id=0)) == 0
        np.testing.assert_allclose(tp_ctx.get_logits(), ref,
                                   atol=2e-4, rtol=2e-4)
    finally:
        set_ep_mesh(None)


def test_ep_quantized_expert_stacks_match_dense():
    """Expert-parallel MoE with QUANTIZED stacked-expert planes: the
    shard_map EP path must match the dense single-device computation
    (BASELINE config 4, Mixtral-style quantized MoE)."""
    import jax.nn
    from llm_tpu.parallel.moe import moe_ffn_ep
    from llm_tpu.quant.qtensor import QTensor, dequantize_qtensor
    from llm_tpu.models.synthetic import synthetic_qtensor

    rng = np.random.default_rng(5)
    E, N, K, T, k = 8, 64, 64, 5, 2

    def stack_qt(n, kk):
        qts = [synthetic_qtensor(rng, n, kk, GGMLType.Q8_0, kmajor=False)
               for _ in range(E)]
        dense = np.stack([dequantize_qtensor(q) for q in qts])  # [E, n, kk]
        qt = QTensor(
            qs=jnp.stack([q.qs for q in qts]),
            scales=jnp.stack([q.scales for q in qts]),
            mins=None, group_size=qts[0].group_size,
            ggml_type=qts[0].ggml_type, layout=qts[0].layout,
            zp=qts[0].zp, pack_tk=qts[0].pack_tk, kmajor=False)
        return qt, jnp.asarray(dense, jnp.float32)

    up_qt, up_d = stack_qt(N, K)
    gate_qt, gate_d = stack_qt(N, K)
    down_qt, down_d = stack_qt(K, N)
    h = jnp.asarray(rng.normal(size=(T, K)), jnp.float32)
    topi = jnp.asarray(rng.integers(0, E, size=(T, k)), jnp.int32)
    topw = jnp.asarray(rng.random((T, k)), jnp.float32)
    act = jax.nn.silu

    # dense single-device reference
    def ref():
        upw = up_d[topi]
        up = jnp.einsum("td,tknd->tkn", h, upw)
        g = act(jnp.einsum("td,tknd->tkn", h, gate_d[topi]))
        cur = g * up
        out = jnp.einsum("tkn,tkdn->tkd", cur, down_d[topi])
        return jnp.sum(out * topw[..., None], axis=1)

    want = np.asarray(ref())
    mesh = make_mesh(n_tp=8)
    got = np.asarray(moe_ffn_ep(h, up_qt, gate_qt, down_qt, topi, topw,
                                act, mesh, "tp"))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_moe_grouped_prefill_matches_gather():
    """Token-routed grouped dispatch (prefill T>8 path) == the
    per-assignment gather reference, dense and quantized stacks, at a
    prefill batch — exact with the default capacity C=T (an expert can
    receive at most T tokens, so no assignment is ever dropped)."""
    import jax.nn
    from llm_tpu.parallel.moe import moe_ffn_grouped
    from llm_tpu.models.synthetic import synthetic_qtensor
    from llm_tpu.quant.qtensor import QTensor, dequantize_qtensor

    rng = np.random.default_rng(7)
    E, N, K, T, k = 8, 64, 64, 32, 2

    def stack_qt(n, kk):
        qts = [synthetic_qtensor(rng, n, kk, GGMLType.Q8_0, kmajor=False)
               for _ in range(E)]
        dense = np.stack([dequantize_qtensor(q) for q in qts])
        qt = QTensor(
            qs=jnp.stack([q.qs for q in qts]),
            scales=jnp.stack([q.scales for q in qts]),
            mins=None, group_size=qts[0].group_size,
            ggml_type=qts[0].ggml_type, layout=qts[0].layout,
            zp=qts[0].zp, pack_tk=qts[0].pack_tk, kmajor=False)
        return qt, jnp.asarray(dense, jnp.float32)

    up_qt, up_d = stack_qt(N, K)
    gate_qt, gate_d = stack_qt(N, K)
    down_qt, down_d = stack_qt(K, N)
    h = jnp.asarray(rng.normal(size=(T, K)), jnp.float32)
    topi = jnp.asarray(rng.integers(0, E, size=(T, k)), jnp.int32)
    topw = jnp.asarray(rng.random((T, k)), jnp.float32)
    act = jax.nn.silu

    upw = up_d[topi]
    up = jnp.einsum("td,tknd->tkn", h, upw)
    g = act(jnp.einsum("td,tknd->tkn", h, gate_d[topi]))
    out = jnp.einsum("tkn,tkdn->tkd", g * up, down_d[topi])
    want = np.asarray(jnp.sum(out * topw[..., None], axis=1))

    got_d = np.asarray(moe_ffn_grouped(h, up_d, gate_d, down_d, topi, topw, act))
    np.testing.assert_allclose(got_d, want, atol=2e-4, rtol=2e-4)
    got_q = np.asarray(moe_ffn_grouped(h, up_qt, gate_qt, down_qt, topi, topw, act))
    np.testing.assert_allclose(got_q, want, atol=2e-4, rtol=2e-4)


def test_moe_ep_prefill_grouped_matches_dense():
    """EP at a prefill batch (T=32 > 8 -> grouped block): shard_map output
    == dense reference; compute per shard is e_local buckets, not T*k full
    FFN rows (the round-2 replicated-compute psum design)."""
    import jax.nn
    from llm_tpu.parallel.moe import moe_ffn_ep

    rng = np.random.default_rng(11)
    E, N, K, T, k = 8, 64, 64, 32, 2
    up_d = jnp.asarray(rng.normal(size=(E, N, K)), jnp.float32) * 0.1
    gate_d = jnp.asarray(rng.normal(size=(E, N, K)), jnp.float32) * 0.1
    down_d = jnp.asarray(rng.normal(size=(E, K, N)), jnp.float32) * 0.1
    h = jnp.asarray(rng.normal(size=(T, K)), jnp.float32)
    topi = jnp.asarray(rng.integers(0, E, size=(T, k)), jnp.int32)
    topw = jnp.asarray(rng.random((T, k)), jnp.float32)
    act = jax.nn.silu

    up = jnp.einsum("td,tknd->tkn", h, up_d[topi])
    g = act(jnp.einsum("td,tknd->tkn", h, gate_d[topi]))
    out = jnp.einsum("tkn,tkdn->tkd", g * up, down_d[topi])
    want = np.asarray(jnp.sum(out * topw[..., None], axis=1))

    mesh = make_mesh(n_tp=8)
    got = np.asarray(moe_ffn_ep(h, up_d, gate_d, down_d, topi, topw,
                                act, mesh, "tp"))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_moe_capacity_factor_drops_are_ragged_safe(monkeypatch):
    """With a tiny capacity factor, overflow assignments are dropped
    (contribute zero) — outputs stay finite, no OOB writes, and
    dispatch_tables reports the drop count."""
    import jax.nn
    from llm_tpu.parallel.moe import dispatch_tables, moe_ffn_grouped

    rng = np.random.default_rng(13)
    E, N, K, T, k = 4, 32, 32, 16, 2
    up_d = jnp.asarray(rng.normal(size=(E, N, K)), jnp.float32) * 0.1
    down_d = jnp.asarray(rng.normal(size=(E, K, N)), jnp.float32) * 0.1
    h = jnp.asarray(rng.normal(size=(T, K)), jnp.float32)
    # adversarial routing: ALL tokens to expert 0 -> guaranteed overflow
    topi = jnp.zeros((T, k), jnp.int32)
    topw = jnp.ones((T, k), jnp.float32)

    tok_table, w_table, dropped = dispatch_tables(topi, topw, 0, E, cap=4)
    assert int(dropped) == T * k - 4
    assert int(jnp.sum(tok_table >= 0)) == 4

    monkeypatch.setenv("LLM_TPU_EP_CF", "0.25")
    got = np.asarray(moe_ffn_grouped(h, up_d, None, down_d, topi, topw,
                                     jax.nn.silu))
    assert np.all(np.isfinite(got))
    # exact mode (default, C=T): with top_k routing (distinct experts per
    # token) every assignment fits — here all tokens pick experts {0, 1}
    monkeypatch.delenv("LLM_TPU_EP_CF")
    topi2 = jnp.tile(jnp.asarray([[0, 1]], jnp.int32), (T, 1))
    exact = np.asarray(moe_ffn_grouped(h, up_d, None, down_d, topi2, topw,
                                       jax.nn.silu))
    up = jnp.einsum("td,tknd->tkn", h, up_d[topi2])
    out = jnp.einsum("tkn,tkdn->tkd", jax.nn.silu(up), down_d[topi2])
    want = np.asarray(jnp.sum(out * topw[..., None], axis=1))
    np.testing.assert_allclose(exact, want, atol=2e-4, rtol=2e-4)


def test_moe_ep_grouped_compute_traffic_win():
    """XLA's own cost model confirms the grouped EP prefill path does less
    work than the round-2 replicated-compute design: FLOPs of the grouped
    shard_map program must undercut T*k full-FFN rows per shard times
    n_shards (which is what computing every assignment on every shard and
    psum-ing costs)."""
    import jax.nn
    from llm_tpu.parallel.moe import moe_ffn_ep

    rng = np.random.default_rng(17)
    E, N, K, T, k = 8, 256, 256, 64, 2
    up_d = jnp.asarray(rng.normal(size=(E, N, K)), jnp.float32)
    down_d = jnp.asarray(rng.normal(size=(E, K, N)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(T, K)), jnp.float32)
    topi = jnp.asarray(rng.integers(0, E, size=(T, k)), jnp.int32)
    topw = jnp.asarray(rng.random((T, k)), jnp.float32)
    mesh = make_mesh(n_tp=8)

    fn = jax.jit(lambda *a: moe_ffn_ep(*a, jax.nn.silu, mesh, "tp"))
    cost = fn.lower(h, up_d, None, down_d, topi, topw).compile().cost_analysis()
    flops = cost.get("flops", 0.0)
    # replicated-compute design: every shard computes all T*k assignments
    replicated_flops = 8 * (T * k) * (2 * N * K * 2)  # up+down matmuls
    assert flops > 0
    assert flops < replicated_flops * 0.5, (flops, replicated_flops)


def test_fused_tp_interleave_matches_unfused():
    """Fused QKV / gate-up planes compose with TP: shard_params interleaves
    the fused lane axis shard-major (parallel/sharding.interleave_fused) so
    P(..., "tp") gives each shard its own heads, and the forward's
    _split_fused reshape recovers exact segments. Engine-level decode must
    match an unfused, unsharded Context bit-for-bit within f32 tolerance."""
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    params, cfg = make_synthetic_model(
        n_embd=256, n_layers=2, n_heads=8, n_kv_heads=8, n_ff=512,
        vocab=256, qtype=GGMLType.Q4_K, dtype=jnp.float32, fuse=True,
    )
    assert "attn_qkv_fused" in params["layers"][0]
    ref_ctx = Context(None, n_cells=31, params_cfg=(params, cfg),
                      dtype=jnp.float32)
    mesh = make_mesh(n_tp=8)
    tp_ctx = Context(None, n_cells=31, params_cfg=(params, cfg),
                     dtype=jnp.float32, mesh=mesh)
    assert tp_ctx.cfg.fused_tp == 8
    toks = list(range(8))
    for ctx in (ref_ctx, tp_ctx):
        assert ctx.decode(Batch.text(toks, seq_id=0)) == 0
    np.testing.assert_allclose(tp_ctx.get_logits(), ref_ctx.get_logits(),
                               atol=2e-4, rtol=2e-4)
    # fused planes actually sharded, not replicated
    qt = tp_ctx.params["layers"][0]["attn_qkv_fused"]
    assert "tp" in jax.tree.leaves(tuple(qt.qs.sharding.spec))


def test_scan_layers_under_mesh_matches_loop():
    """lax.scan decoder + TP mesh: stacked [L, ...] planes shard with a
    leading replicated dim, stacked KV rides scan xs, and decode matches
    the unsharded per-layer loop."""
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    params, cfg = make_synthetic_model(
        n_embd=256, n_layers=3, n_heads=8, n_kv_heads=8, n_ff=512,
        vocab=256, qtype=GGMLType.Q4_K, dtype=jnp.float32, fuse=True,
    )
    ref_ctx = Context(None, n_cells=31, params_cfg=(params, cfg),
                      dtype=jnp.float32)
    mesh = make_mesh(n_tp=8)
    tp_ctx = Context(None, n_cells=31, params_cfg=(params, cfg),
                     dtype=jnp.float32, mesh=mesh, scan_layers=True)
    assert "layers_stacked" in tp_ctx.params
    assert tp_ctx.cfg.fused_tp == 8
    toks = [3, 1, 4, 1, 5, 9, 2, 6]
    for ctx in (ref_ctx, tp_ctx):
        assert ctx.decode(Batch.text(toks, seq_id=0)) == 0
    # scan + GSPMD reduce per-shard in a different summation order than the
    # unsharded loop; the drift through 3 layers of residual stream is
    # absolute (~2e-3 observed across jax versions), so bound it absolutely
    # and pin the argmax — the same policy as the flagship TP test below
    np.testing.assert_allclose(tp_ctx.get_logits(), ref_ctx.get_logits(),
                               atol=5e-3, rtol=0)
    assert int(np.argmax(tp_ctx.get_logits())) == \
        int(np.argmax(ref_ctx.get_logits()))
    for ctx in (ref_ctx, tp_ctx):
        assert ctx.decode(Batch.one(7, pos=len(toks), seq_id=0)) == 0
    np.testing.assert_allclose(tp_ctx.get_logits(), ref_ctx.get_logits(),
                               atol=5e-3, rtol=0)
    assert int(np.argmax(tp_ctx.get_logits())) == \
        int(np.argmax(ref_ctx.get_logits()))


def test_tp8_flagship_geometry_exact_match():
    """TP exact-match at FLAGSHIP width (Llama-3-8B layer geometry:
    n_embd 4096, 32 q / 8 kv heads, n_ff 14336, GQA 4:1, fused Q4_K
    planes). TWO layers so cross-layer interaction (residual stream
    re-entering sharded QKV, per-layer KV rings) is exercised at the real
    serving shape — this is the geometry the engine ships at, not a toy
    multiple of the mesh size."""
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    params, cfg = make_synthetic_model(
        n_embd=4096, n_layers=2, n_heads=32, n_kv_heads=8, n_ff=14336,
        vocab=8192, qtype=GGMLType.Q4_K, dtype=jnp.float32, fuse=True,
    )
    ref_ctx = Context(None, n_cells=15, params_cfg=(params, cfg),
                      dtype=jnp.float32)
    mesh = make_mesh(n_tp=8)
    tp_ctx = Context(None, n_cells=15, params_cfg=(params, cfg),
                     dtype=jnp.float32, mesh=mesh)
    assert tp_ctx.cfg.fused_tp == 8
    toks = [3, 1, 4, 1]
    for ctx in (ref_ctx, tp_ctx):
        assert ctx.decode(Batch.text(toks, seq_id=0)) == 0
    ref = ref_ctx.get_logits()
    # two 4096-wide layers accumulate reduction-order drift through the
    # residual stream (GSPMD reduces per-shard, different summation order);
    # bound the logit error absolutely and require identical argmax
    np.testing.assert_allclose(tp_ctx.get_logits(), ref, atol=1e-2,
                               rtol=1e-2)
    assert int(np.argmax(tp_ctx.get_logits())) == int(np.argmax(ref))
    # per-shard KV: 8 kv heads over tp=8 -> one head per device
    assert "tp" in jax.tree.leaves(tuple(tp_ctx.kv.k[0].sharding.spec))


def test_generate_loop_under_tp_mesh_exact_tokens():
    """The on-device while-loop decode path (Context.generate_loop — the
    production serving path, one dispatch per chunk) must emit the SAME
    token sequence under a TP mesh as unsharded: in-jit greedy argmax over
    sharded logits, KV updates riding the sharded cache through the loop
    carry."""
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    params, cfg = make_synthetic_model(
        n_embd=256, n_layers=2, n_heads=8, n_kv_heads=8, n_ff=512,
        vocab=256, qtype=GGMLType.Q4_K, dtype=jnp.float32, fuse=True,
    )
    mesh = make_mesh(n_tp=8)
    ref_ctx = Context(None, n_cells=47, params_cfg=(params, cfg),
                      dtype=jnp.float32)
    tp_ctx = Context(None, n_cells=47, params_cfg=(params, cfg),
                     dtype=jnp.float32, mesh=mesh)
    toks = [3, 1, 4, 1, 5, 9]
    outs = []
    for ctx in (ref_ctx, tp_ctx):
        assert ctx.decode(Batch.text(toks, seq_id=0)) == 0
        first = int(np.argmax(ctx.get_logits()))
        outs.append([first] + ctx.generate_loop(first, 12, seq_id=0))
    assert outs[0] == outs[1], (outs[0], outs[1])
    # and the host cell metadata reconciled identically
    assert ref_ctx.cells.seq_pos_max(0) == tp_ctx.cells.seq_pos_max(0)

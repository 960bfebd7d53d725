"""Synthetic model construction — random-weight models at any scale
without materializing f32 tensors (for benchmarks, compile checks, and the
multi-chip dry run). Quantized weights are generated directly as packed
planes, the way an 8B Q4_K_M checkpoint would land after load."""

from __future__ import annotations

from dataclasses import replace

import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..ops.pallas_qmm import pack_p4, pack_p4_kmajor
from ..ops.rope import ROPE_TYPE_NORM, RopeParams
from ..quant.qtensor import QTensor
from .config import ModelConfig


def synthetic_qtensor(
    rng: np.random.Generator,
    n: int,
    k: int,
    qtype: GGMLType = GGMLType.Q4_K,
    pack4: bool = True,
    pack_tk: int = 256,
    kmajor: bool = True,
) -> QTensor:
    """Random quantized planes shaped like a loaded weight (K-major)."""
    gs = 16 if qtype in (GGMLType.Q6_K, GGMLType.Q2_K, GGMLType.Q3_K) else 32
    scale_mag = 0.02 / np.sqrt(k) * 8

    def orient(a):  # scales/mins: [K//gs, N] kmajor else [N, K//gs]
        return a if kmajor else np.ascontiguousarray(a.T)

    scales = orient((rng.random((k // gs, n), dtype=np.float32) * scale_mag))
    if qtype in (GGMLType.Q4_K, GGMLType.Q4_0, GGMLType.Q4_1):
        q = rng.integers(0, 16, size=(k, n), dtype=np.int16).astype(np.int8)
        zp = 8
        mins = None
        if qtype in (GGMLType.Q4_K, GGMLType.Q4_1):
            mins = orient((rng.random((k // gs, n), dtype=np.float32) * scale_mag * 8))
            zp = 0
        if pack4 and k % pack_tk == 0:
            qsub = (q - zp).astype(np.int8)
            if kmajor:
                packed = pack_p4_kmajor(qsub, zp, tile_k=pack_tk)
            else:
                packed = pack_p4(np.ascontiguousarray(qsub.T), zp, tile_k=pack_tk)
            return QTensor(
                qs=jnp.asarray(packed), scales=jnp.asarray(scales),
                mins=jnp.asarray(mins) if mins is not None else None,
                group_size=gs, ggml_type=qtype, layout="p4", zp=zp,
                pack_tk=pack_tk, kmajor=kmajor,
            )
        qi = (q - zp).astype(np.int8)
        if not kmajor:
            qi = np.ascontiguousarray(qi.T)
        return QTensor(
            qs=jnp.asarray(qi), scales=jnp.asarray(scales),
            mins=jnp.asarray(mins) if mins is not None else None,
            group_size=gs, ggml_type=qtype, layout="i8", zp=0, kmajor=kmajor,
        )
    # int8-plane types (Q8_0, Q6_K, Q5_K, ...)
    q = rng.integers(-32, 32, size=(k, n), dtype=np.int16).astype(np.int8)
    if not kmajor:
        q = np.ascontiguousarray(q.T)
    mins = None
    if qtype == GGMLType.Q5_K:
        mins = orient((rng.random((k // gs, n), dtype=np.float32) * scale_mag * 8))
    return QTensor(
        qs=jnp.asarray(q), scales=jnp.asarray(scales),
        mins=jnp.asarray(mins) if mins is not None else None,
        group_size=gs, ggml_type=qtype, layout="i8", zp=0, kmajor=kmajor,
    )


def device_synthetic_qtensor(
    key,
    n: int,
    k: int,
    qtype: GGMLType = GGMLType.Q4_K,
    scales_dtype=jnp.float32,
    pack_tk: int = 256,
) -> QTensor:
    """Random quantized planes generated ON DEVICE (no host->device upload
    of multi-GiB planes — essential when the device link is slow)."""
    import jax

    gs = 16 if qtype in (GGMLType.Q6_K, GGMLType.Q2_K, GGMLType.Q3_K) else 32
    k1, k2, k3 = jax.random.split(key, 3)
    scale_mag = 0.02 / np.sqrt(k) * 8
    scales = jax.random.uniform(k2, (k // gs, n), jnp.float32, 0.2, 1.0) * scale_mag
    scales = scales.astype(scales_dtype)
    if qtype == GGMLType.Q4_K:
        qs = jax.random.randint(k1, (k // 2, n), 0, 256, jnp.int32).astype(jnp.uint8)
        mins = (
            jax.random.uniform(k3, (k // gs, n), jnp.float32, 0.0, 1.0)
            * scale_mag * 8
        ).astype(scales_dtype)
        return QTensor(qs=qs, scales=scales, mins=mins, group_size=gs,
                       ggml_type=qtype, layout="p4", zp=0, pack_tk=pack_tk)
    qs = jax.random.randint(k1, (k, n), -32, 32, jnp.int32).astype(jnp.int8)
    return QTensor(qs=qs, scales=scales, mins=None, group_size=gs,
                   ggml_type=qtype, layout="i8", zp=0)


def device_synthetic_qtensor_rows(
    key,
    n: int,
    k: int,
    qtype: GGMLType = GGMLType.Q4_K,
    scales_dtype=jnp.float32,
    pack_tk: int = 256,
) -> QTensor:
    """Rows-layout ([N, K]) variant for embedding tables, generated on
    device — avoids the multi-hundred-MB host upload of a 128k vocab."""
    import jax

    gs = 16 if qtype in (GGMLType.Q6_K, GGMLType.Q2_K, GGMLType.Q3_K) else 32
    k1, k2, k3 = jax.random.split(key, 3)
    scale_mag = 0.02 / np.sqrt(k) * 8
    scales = (jax.random.uniform(k2, (n, k // gs), jnp.float32, 0.2, 1.0)
              * scale_mag).astype(scales_dtype)
    if qtype == GGMLType.Q4_K:
        qs = jax.random.randint(k1, (n, k // 2), 0, 256, jnp.int32).astype(jnp.uint8)
        mins = (jax.random.uniform(k3, (n, k // gs), jnp.float32, 0.0, 1.0)
                * scale_mag * 8).astype(scales_dtype)
        return QTensor(qs=qs, scales=scales, mins=mins, group_size=gs,
                       ggml_type=qtype, layout="p4", zp=0, pack_tk=pack_tk,
                       kmajor=False)
    qs = jax.random.randint(k1, (n, k), -32, 32, jnp.int32).astype(jnp.int8)
    return QTensor(qs=qs, scales=scales, mins=None, group_size=gs,
                   ggml_type=qtype, layout="i8", zp=0, kmajor=False)


def make_synthetic_model(
    n_embd: int = 64,
    n_layers: int = 2,
    n_heads: int = 8,
    n_kv_heads: int = 8,
    n_ff: int = 256,
    vocab: int = 256,
    head_dim: int | None = None,
    qtype: GGMLType | None = None,  # None -> dense bf16
    seed: int = 0,
    dtype=jnp.bfloat16,
    on_device: bool = False,
    scales_dtype=jnp.float32,
    fuse: bool = True,
    n_expert: int = 0,
    n_expert_used: int = 0,
    scan: bool = False,
) -> tuple[dict, ModelConfig]:
    """Build (params, cfg) for a llama-shaped model with random weights."""
    import jax

    rng = np.random.default_rng(seed)
    dev_key = jax.random.PRNGKey(seed)
    head_dim = head_dim or n_embd // n_heads
    cfg = ModelConfig(
        arch="llama",
        vocab_size=vocab,
        n_embd=n_embd,
        n_layers=n_layers,
        n_heads=n_heads,
        n_kv_heads=n_kv_heads,
        head_dim=head_dim,
        head_dim_v=head_dim,
        n_ff=n_ff,
        rms_eps=1e-5,
        rope=RopeParams(n_dims=head_dim, mode=ROPE_TYPE_NORM),
        tie_embeddings=True,
        context_length=4096,
        n_expert=n_expert,
        n_expert_used=n_expert_used,
        expert_weights_norm=n_expert > 0,
    )

    def mat(n, k):
        nonlocal dev_key
        if on_device:
            dev_key, sub = jax.random.split(dev_key)
            if qtype is None:
                return (jax.random.normal(sub, (n, k), jnp.float32) * 0.02).astype(dtype)
            return device_synthetic_qtensor(sub, n, k, qtype, scales_dtype)
        if qtype is None:
            return jnp.asarray(
                rng.normal(size=(n, k)).astype(np.float32) * 0.02, dtype
            )
        return synthetic_qtensor(rng, n, k, qtype)


    def vec(n):
        return jnp.asarray(np.ones(n, np.float32))

    if on_device and n_expert == 0:
        # ONE jitted generator per repeated structure (a layer; the embd /
        # lm_head), re-dispatched with fresh keys: ~3 small compiles + ~35
        # sub-ms dispatches. (One giant all-tensors program compiles
        # pathologically slowly; fully eager generation pays ~8 device
        # round-trips per tensor — both were minutes at 8B scale.)
        def _gen_layer(key):
            nonlocal dev_key  # noqa: F841 — uses mat() via a local key
            ks = iter(jax.random.split(key, 16))

            def m(n, k):
                if qtype is None:
                    return (jax.random.normal(next(ks), (n, k), jnp.float32)
                            * 0.02).astype(dtype)
                return device_synthetic_qtensor(next(ks), n, k, qtype,
                                                scales_dtype)

            lay = {
                "attn_norm": vec(n_embd),
                "attn_q": m(n_heads * head_dim, n_embd),
                "attn_k": m(n_kv_heads * head_dim, n_embd),
                "attn_v": m(n_kv_heads * head_dim, n_embd),
                "attn_output": m(n_embd, n_heads * head_dim),
                "ffn_norm": vec(n_embd),
                "ffn_gate": m(n_ff, n_embd),
                "ffn_up": m(n_ff, n_embd),
                "ffn_down": m(n_embd, n_ff),
            }
            if fuse and qtype is not None:
                from .loader import _fuse_projections

                _fuse_projections([lay])
            return lay

        def _gen_top(key):
            k1, k2 = jax.random.split(key)
            if qtype is None:
                embd = (jax.random.normal(k1, (vocab, n_embd), jnp.float32)
                        * 0.02).astype(dtype)
                out = (jax.random.normal(k2, (vocab, n_embd), jnp.float32)
                       * 0.02).astype(dtype)
            else:
                embd = device_synthetic_qtensor_rows(
                    k1, vocab, n_embd, qtype, scales_dtype)
                out = device_synthetic_qtensor(k2, vocab, n_embd, qtype,
                                               scales_dtype)
            return {"tok_embd": embd, "output": out,
                    "output_norm": vec(n_embd)}

        gl = jax.jit(_gen_layer)
        layers = []
        for _ in range(n_layers):
            dev_key, sub = jax.random.split(dev_key)
            layers.append(gl(sub))
        dev_key, sub = jax.random.split(dev_key)
        params = jax.jit(_gen_top)(sub)
        params["layers"] = layers
        if scan:
            from .loader import stack_layers

            stacked = stack_layers(layers)
            assert stacked is not None
            params["layers_stacked"] = stacked
            params["layers"] = []
        return params, cfg


    layers = []
    for _ in range(n_layers):
        layers.append(
            {
                "attn_norm": vec(n_embd),
                "attn_q": mat(n_heads * head_dim, n_embd),
                "attn_k": mat(n_kv_heads * head_dim, n_embd),
                "attn_v": mat(n_kv_heads * head_dim, n_embd),
                "attn_output": mat(n_embd, n_heads * head_dim),
                "ffn_norm": vec(n_embd),
            }
        )
        if n_expert > 0:
            # dense expert stacks [E, N, K] (mixtral-style MoE)
            layers[-1]["ffn_gate_inp"] = jnp.asarray(
                rng.normal(size=(n_expert, n_embd)).astype(np.float32) * 0.02)
            def stack(n, k):
                # expert stacks are dense [E, N, K] (the loader dequantizes
                # quantized stacks to dense for the XLA/EP path)
                return jnp.asarray(
                    rng.normal(size=(n_expert, n, k)).astype(np.float32) * 0.02,
                    dtype if qtype is None else jnp.float32)
            layers[-1]["ffn_gate_exps"] = stack(n_ff, n_embd)
            layers[-1]["ffn_up_exps"] = stack(n_ff, n_embd)
            layers[-1]["ffn_down_exps"] = stack(n_embd, n_ff)
        else:
            layers[-1]["ffn_gate"] = mat(n_ff, n_embd)
            layers[-1]["ffn_up"] = mat(n_ff, n_embd)
            layers[-1]["ffn_down"] = mat(n_embd, n_ff)
    def embd_mat():
        if on_device or qtype is None:
            # dense path / on-device: qembed accepts dense rows; for the
            # quantized on-device case generate rows-layout planes
            if qtype is None:
                return mat(vocab, n_embd)
            return synthetic_qtensor(rng, vocab, n_embd, qtype, kmajor=False)
        return synthetic_qtensor(rng, vocab, n_embd, qtype, kmajor=False)

    params = {
        "layers": layers,
        "tok_embd": embd_mat(),
        "output": mat(vocab, n_embd),
        "output_norm": vec(n_embd),
    }
    if fuse and qtype is not None:
        from .loader import _fuse_projections

        _fuse_projections(layers)
    if scan:
        from .loader import stack_layers

        stacked = stack_layers(layers)
        assert stacked is not None
        params["layers_stacked"] = stacked
        params["layers"] = []
    return params, cfg


# Llama-3-8B geometry (the flagship bench config, BASELINE.md config 2)
LLAMA3_8B = dict(
    n_embd=4096, n_layers=32, n_heads=32, n_kv_heads=8,
    n_ff=14336, vocab=128256, head_dim=128,
)

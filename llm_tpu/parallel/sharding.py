"""Device-mesh sharding rules (GSPMD / pjit).

This layer replaces the reference's multi-device machinery entirely
(SURVEY.md §2.5): the row-split buffer type + scheduler pipeline
(ggml_backend_split_buffer_type_t, ggml-backend.h:188; LLAMA_SPLIT_MODE_*)
and the RPC multi-host backend (/root/reference/tools/rpc) become weight /
KV-cache shardings over a jax Mesh, with XLA inserting and overlapping the
collectives (Megatron-style TP emerges from the weight shardings alone):

  * attn q/k/v + ffn gate/up: output-feature (head) sharded  -> P("tp", ·)
  * attn output + ffn down:   input-feature sharded          -> P(·, "tp")
    (XLA inserts the psum of partial sums after these)
  * KV cache: sharded over KV heads                          -> P(·, "tp", ·)
  * embeddings / lm_head: vocab-sharded
  * norms / biases: replicated

Data-parallel replicas batch over the "dp" axis; expert parallelism for
MoE stacks shards the expert dim.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant.qtensor import QTensor


def make_mesh(n_tp: int | None = None, n_dp: int = 1, n_sp: int = 1,
              devices=None) -> Mesh:
    """Mesh over (dp, sp, tp): data replicas x sequence (KV cells) x tensor.

    The sp axis is the sequence/context-parallel dimension — KV cache cells
    shard over it and attention reduces across shards (the TPU answer to
    the long-context scaling the reference reaches with SWA/ctx-shift;
    SURVEY.md §5.7)."""
    devices = devices if devices is not None else jax.devices()
    if n_tp is None:
        n_tp = len(devices) // (n_dp * n_sp)
    devs = np.asarray(devices[: n_dp * n_sp * n_tp]).reshape(n_dp, n_sp, n_tp)
    return Mesh(devs, axis_names=("dp", "sp", "tp"))


# param key -> logical [N, K] partition spec
_RULES = {
    "attn_q": P("tp", None),
    "attn_k": P("tp", None),
    "attn_v": P("tp", None),
    "attn_output": P(None, "tp"),
    "ffn_gate": P("tp", None),
    "ffn_up": P("tp", None),
    "ffn_down": P(None, "tp"),
    "tok_embd": P("tp", None),
    "output": P("tp", None),
    # MoE expert stacks [n_expert, n_out, K]: expert-sharded (EP)
    "ffn_gate_exps": P("tp", None, None),
    "ffn_up_exps": P("tp", None, None),
    "ffn_down_exps": P("tp", None, None),
    # per-head biases follow the head shard
    "attn_q_b": P("tp"),
    "attn_k_b": P("tp"),
    "attn_v_b": P("tp"),
}

# fused QKV / gate-up projections: only shardable AFTER the shard-major
# interleave re-layout (interleave_fused below) — enabled separately.
_FUSED_RULES = {
    "attn_qkv_fused": P("tp", None),
    "ffn_gateup_fused": P("tp", None),
    "attn_qkv_fused_b": P("tp"),
    "ffn_gateup_fused_b": P("tp"),
}


def _fits(mesh: Mesh, shape, spec) -> bool:
    for dim, ax in zip(shape, tuple(spec) + (None,) * len(shape)):
        if ax is not None and dim % mesh.shape[ax] != 0:
            return False
    return True


def _spec_for(key: str, leaf, mesh: Mesh, lead=(), rules=None):
    """lead: leading partition axes prepended to the rule spec — (None,)
    for depth-stacked [L, ...] leaves on the lax.scan path."""
    if isinstance(leaf, tuple):
        return tuple(_spec_for(key, x, mesh, lead, rules) for x in leaf)
    spec = (rules or _RULES).get(key)
    if spec is None:
        return _replicated(leaf, mesh)
    lead = tuple(lead)
    if isinstance(leaf, QTensor):
        n_ax, k_ax = spec[0], spec[1]
        p_q = P(*lead, k_ax, n_ax) if leaf.kmajor else P(*lead, n_ax, k_ax)
        p_s = p_q
        ok = (
            _fits(mesh, leaf.qs.shape, p_q)
            and _fits(mesh, leaf.scales.shape, p_s)
            and (leaf.mins is None or _fits(mesh, leaf.mins.shape, p_s))
        )
        if not ok:
            return _replicated(leaf, mesh)
        return QTensor(
            qs=NamedSharding(mesh, p_q),
            scales=NamedSharding(mesh, p_s),
            mins=NamedSharding(mesh, p_s) if leaf.mins is not None else None,
            group_size=leaf.group_size, ggml_type=leaf.ggml_type,
            layout=leaf.layout, zp=leaf.zp, pack_tk=leaf.pack_tk,
            kmajor=leaf.kmajor,
        )
    nd = getattr(leaf, "ndim", 0)
    spec_t = lead + tuple(spec)[: max(0, nd - len(lead))] if nd else ()
    spec_t = spec_t + (None,) * (nd - len(spec_t))
    if nd and _fits(mesh, leaf.shape, P(*spec_t)):
        return NamedSharding(mesh, P(*spec_t))
    return _replicated(leaf, mesh)


def _replicated(leaf, mesh: Mesh):
    if isinstance(leaf, QTensor):
        r = NamedSharding(mesh, P())
        return QTensor(
            qs=r, scales=r, mins=r if leaf.mins is not None else None,
            group_size=leaf.group_size, ggml_type=leaf.ggml_type,
            layout=leaf.layout, zp=leaf.zp, pack_tk=leaf.pack_tk,
            kmajor=leaf.kmajor,
        )
    return NamedSharding(mesh, P())


def param_shardings(params: dict, mesh: Mesh,
                    include_fused: bool = False) -> dict:
    """Same structure as params, with NamedSharding leaves.

    include_fused: shard fused QKV / gate-up planes too — only valid after
    interleave_fused() re-laid them out shard-major."""
    rules = dict(_RULES, **_FUSED_RULES) if include_fused else _RULES
    out: dict = {}
    for key, val in params.items():
        if key in ("layers", "enc_layers", "dec_layers"):
            out[key] = [
                {k: _spec_for(k, v, mesh, rules=rules) for k, v in layer.items()}
                for layer in val
            ]
        elif key == "layers_stacked":
            out[key] = {
                k: _spec_for(k, v, mesh, lead=(None,), rules=rules)
                for k, v in val.items()
            }
        elif val is None:
            out[key] = None
        else:
            out[key] = _spec_for(key, val, mesh, rules=rules)
    return out


def _interleave_last(a, splits, tp: int):
    """Re-lay the last (lane/output-feature) axis of a fused projection
    from segment-major [q | k | v] to shard-major
    [q_0 k_0 v_0 | q_1 k_1 v_1 | ...] so a plain P(..., "tp") sharding
    gives every shard its own slice of EACH segment. The forward graph
    recovers segments with a [T, tp, N/tp] reshape-slice (zero-comm under
    GSPMD: the reshape factors the sharded axis)."""
    offs = np.cumsum([0] + list(splits))
    segs = [a[..., offs[i]: offs[i + 1]] for i in range(len(splits))]
    parts = []
    for t in range(tp):
        for seg, n in zip(segs, splits):
            c = n // tp
            parts.append(seg[..., t * c: (t + 1) * c])
    return jnp.concatenate(parts, axis=-1)


def _interleave_leaf(v, splits, tp: int):
    if isinstance(v, QTensor):
        f = lambda a: _interleave_last(a, splits, tp)
        return QTensor(
            qs=f(v.qs), scales=f(v.scales),
            mins=f(v.mins) if v.mins is not None else None,
            group_size=v.group_size, ggml_type=v.ggml_type, layout=v.layout,
            zp=v.zp, pack_tk=v.pack_tk, kmajor=v.kmajor,
        )
    return _interleave_last(v, splits, tp)


def _fused_jobs(container, cfg, tp: int, il: int):
    """(key, splits) interleave jobs for one layer dict (or the stacked
    dict, il=0 — the scan path requires uniform layers anyway). Returns
    None when any fused tensor present cannot be interleaved (indivisible
    segments / non-K-major planes): then ALL fused planes stay replicated
    and cfg.fused_tp stays 1, keeping the un-interleave reshape global."""
    jobs = []
    seg = {
        "attn_qkv_fused": (
            cfg.heads_at(il) * cfg.head_dim,
            cfg.kv_heads_at(il) * cfg.head_dim,
            cfg.kv_heads_at(il) * cfg.head_dim_v,
        ),
        "ffn_gateup_fused": (cfg.n_ff, cfg.n_ff),
    }
    for key, splits in seg.items():
        if key not in container:
            continue
        v = container[key]
        lane = (v.qs.shape[-1] if isinstance(v, QTensor)
                else getattr(v, "shape", (0,))[-1])
        if isinstance(v, QTensor) and not v.kmajor:
            return None
        if lane != sum(splits) or any(s % tp for s in splits):
            return None
        jobs.append((key, splits))
        if key + "_b" in container:
            jobs.append((key + "_b", splits))
    return jobs


def interleave_fused(params: dict, cfg, tp: int) -> tuple[dict, int]:
    """Re-lay every fused QKV / gate-up plane shard-major for a tp-way
    mesh. Returns (params', tp) on success — params' has fresh layer dicts
    (the caller may share the originals with an unsharded context) — or
    (params, 1) when nothing is fused / something doesn't divide."""
    all_jobs = []  # (container_kind, index, key, splits)
    layers = params.get("layers") or []
    for il, L in enumerate(layers):
        jobs = _fused_jobs(L, cfg, tp, il)
        if jobs is None:
            return params, 1
        all_jobs += [("layers", il, k, s) for k, s in jobs]
    stacked = params.get("layers_stacked")
    if stacked:
        jobs = _fused_jobs(stacked, cfg, tp, 0)
        if jobs is None:
            return params, 1
        all_jobs += [("layers_stacked", 0, k, s) for k, s in jobs]
    if not all_jobs:
        return params, 1
    params = dict(params)
    params["layers"] = [dict(L) for L in layers]
    if stacked:
        params["layers_stacked"] = dict(stacked)
    for kind, il, key, splits in all_jobs:
        cont = params[kind][il] if kind == "layers" else params[kind]
        cont[key] = _interleave_leaf(cont[key], splits, tp)
    return params, tp


def kv_shardings(n_layers: int, mesh: Mesh, seq_shard: bool = None,
                 n_kv_heads: int | None = None, n_rows: int | None = None,
                 stacked: bool = False):
    """HEAD-MAJOR KV lists [Hkv, S, D]: heads sharded over tp, cells over
    sp (when the mesh has one). Attention over the cell-sharded cache is
    blockwise-exact: the softmax statistics and the V-weighted sum reduce
    across sp shards via XLA collectives (ring/sequence parallelism by
    sharding alone).

    When n_kv_heads / n_rows are given, axes that do not divide evenly are
    dropped to replicated (e.g. MQA models with one KV head under TP)."""
    sp = "sp" if ("sp" in mesh.axis_names and mesh.shape.get("sp", 1) > 1) else None
    if seq_shard is False:
        sp = None
    if sp is not None and n_rows is not None and n_rows % mesh.shape["sp"] != 0:
        sp = None
    tp = "tp"
    if n_kv_heads is not None and n_kv_heads % mesh.shape.get("tp", 1) != 0:
        tp = None
    lead = (None,) if stacked else ()  # scan path: [L, Hkv, S, D]
    s = NamedSharding(mesh, P(*lead, tp, sp, None))
    return [s] * n_layers, [s] * n_layers


def shard_params(params: dict, mesh: Mesh, cfg=None) -> tuple[dict, int]:
    """device_put the params pytree with the TP sharding rules. Returns
    (sharded_params, fused_tp): fused_tp > 1 when fused QKV / gate-up
    planes were interleaved shard-major (cfg required) — the caller must
    record it in cfg.fused_tp so the forward graph un-interleaves."""
    fused_tp = 1
    if cfg is not None and mesh.shape.get("tp", 1) > 1:
        params, fused_tp = interleave_fused(params, cfg, mesh.shape["tp"])
    shardings = param_shardings(params, mesh, include_fused=fused_tp > 1)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s) if x is not None else None,
        params,
        shardings,
        is_leaf=lambda x: x is None,
    ), fused_tp

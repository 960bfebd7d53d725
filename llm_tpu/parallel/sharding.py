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


def _fits(mesh: Mesh, shape, spec) -> bool:
    for dim, ax in zip(shape, tuple(spec) + (None,) * len(shape)):
        if ax is not None and dim % mesh.shape[ax] != 0:
            return False
    return True


def _spec_for(key: str, leaf, mesh: Mesh):
    spec = _RULES.get(key)
    if spec is None:
        return _replicated(leaf, mesh)
    if isinstance(leaf, QTensor):
        n_ax, k_ax = spec[0], spec[1]
        p_q = P(k_ax, n_ax) if leaf.kmajor else P(n_ax, k_ax)
        p_s = P(k_ax, n_ax) if leaf.kmajor else P(n_ax, k_ax)
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
    spec_t = tuple(spec)[:nd] if nd else ()
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


def param_shardings(params: dict, mesh: Mesh) -> dict:
    """Same structure as params, with NamedSharding leaves."""
    out: dict = {}
    for key, val in params.items():
        if key == "layers":
            out["layers"] = [
                {k: _spec_for(k, v, mesh) for k, v in layer.items()}
                for layer in val
            ]
        elif val is None:
            out[key] = None
        else:
            out[key] = _spec_for(key, val, mesh)
    return out


def kv_shardings(n_layers: int, mesh: Mesh, seq_shard: bool = None,
                 n_kv_heads: int | None = None, n_rows: int | None = None):
    """KV lists [S, Hkv, D]: cells sharded over sp (when the mesh has one),
    heads over tp. Attention over the cell-sharded cache is blockwise-exact:
    the softmax statistics and the V-weighted sum reduce across sp shards
    via XLA collectives (ring/sequence parallelism by sharding alone).

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
    s = NamedSharding(mesh, P(sp, tp, None))
    return [s] * n_layers, [s] * n_layers


def shard_params(params: dict, mesh: Mesh) -> dict:
    """device_put the params pytree with the TP sharding rules."""
    shardings = param_shardings(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s) if x is not None else None,
        params,
        shardings,
        is_leaf=lambda x: x is None,
    )

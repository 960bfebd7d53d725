"""Training: LoRA finetuning of a (frozen, possibly quantized) base model.

Parity target: the reference's training stack — ggml-opt
(/root/reference/ggml/src/ggml-opt.cpp: AdamW step, CE loss, dataset
batching, ggml_opt_fit epoch loop) surfaced through llama as
llama_opt_init / llama_opt_epoch (/root/reference/include/llama.h:1469-1471,
impl src/llama-context.cpp:1963-2158).

TPU-first redesign: instead of graph-level autodiff over a mutable cgraph,
the decoder forward is a pure function, jax.grad differentiates it, and
optax provides AdamW. The frozen base stays in quantized planes; only the
LoRA factors train (the practical finetune path for a quantized model —
full-weight training would first dequantize to bf16 params).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.transformer import forward

DEFAULT_TARGETS = ("attn_q", "attn_v")


def init_lora_params(cfg, rank: int = 8, targets=DEFAULT_TARGETS, seed: int = 0,
                     dtype=jnp.float32):
    """Trainable pytree: per layer {key: {"a": [r, K], "b": [N, r]}}.
    B starts at zero so training starts from the base model exactly."""
    key = jax.random.PRNGKey(seed)
    dims = {
        "attn_q": (cfg.n_heads * cfg.head_dim, cfg.n_embd),
        "attn_k": (cfg.n_kv_heads * cfg.head_dim, cfg.n_embd),
        "attn_v": (cfg.n_kv_heads * cfg.head_dim_v, cfg.n_embd),
        "attn_output": (cfg.n_embd, cfg.n_heads * cfg.head_dim_v),
        "ffn_gate": (cfg.n_ff, cfg.n_embd),
        "ffn_up": (cfg.n_ff, cfg.n_embd),
        "ffn_down": (cfg.n_embd, cfg.n_ff),
    }
    layers = []
    for _ in range(cfg.n_layers):
        lp = {}
        for t in targets:
            n, k = dims[t]
            key, sub = jax.random.split(key)
            lp[t] = {
                "a": (jax.random.normal(sub, (rank, k), dtype) / np.sqrt(k)),
                "b": jnp.zeros((n, rank), dtype),
            }
        layers.append(lp)
    return layers


def _with_lora(params: dict, lora_layers, scale: float) -> dict:
    out = dict(params)
    out["layers"] = []
    for layer, lp in zip(params["layers"], lora_layers):
        nl = dict(layer)
        for key, ab in lp.items():
            nl[key + ".lora"] = (ab["a"], ab["b"], scale)
        out["layers"].append(nl)
    return out


def causal_lm_loss(lora_layers, params, cfg, tokens, scale: float = 2.0,
                   dtype=jnp.float32):
    """Mean cross-entropy of next-token prediction over one sequence
    (GGML_OPT_LOSS_TYPE_MEAN + CE, ggml-opt.h:30-34)."""
    T = tokens.shape[0]
    S = T
    p = _with_lora(params, lora_layers, scale)
    kv_k = [jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim), dtype) for _ in range(cfg.n_layers)]
    kv_v = [jnp.zeros((cfg.n_kv_heads, S, cfg.head_dim_v), dtype) for _ in range(cfg.n_layers)]
    pos = jnp.arange(T, dtype=jnp.int32)
    logits, _, _, _ = forward(
        p, cfg, kv_k, kv_v, tokens, pos, jnp.zeros(T, jnp.int32), pos,
        pos, jnp.ones(T, jnp.uint32), pos, dtype=dtype,
    )
    logp = jax.nn.log_softmax(logits[:-1].astype(jnp.float32))
    tgt = tokens[1:]
    nll = -jnp.take_along_axis(logp, tgt[:, None], axis=1).mean()
    return nll


class LoraTrainer:
    """llama_opt_init / llama_opt_epoch analogue."""

    def __init__(self, params, cfg, rank: int = 8, lr: float = 1e-4,
                 targets=DEFAULT_TARGETS, scale: float = 2.0, seed: int = 0,
                 dtype=jnp.float32):
        self.params = params
        self.cfg = cfg
        self.scale = scale
        self.dtype = dtype
        self.lora = init_lora_params(cfg, rank, targets, seed, dtype)
        self.opt = optax.adamw(lr)
        self.opt_state = self.opt.init(self.lora)

        def step(lora, opt_state, tokens):
            loss, grads = jax.value_and_grad(causal_lm_loss)(
                lora, self.params, cfg, tokens, scale, dtype
            )
            updates, opt_state = self.opt.update(grads, opt_state, lora)
            lora = optax.apply_updates(lora, updates)
            return lora, opt_state, loss

        self._step = jax.jit(step, donate_argnums=(0, 1))

    def train_step(self, tokens) -> float:
        tokens = jnp.asarray(tokens, jnp.int32)
        self.lora, self.opt_state, loss = self._step(self.lora, self.opt_state, tokens)
        return float(loss)

    def epoch(self, token_stream: list[int], n_ctx: int, progress=None) -> float:
        """One pass over the stream in n_ctx chunks (ggml_opt_fit loop)."""
        total, n = 0.0, 0
        for i in range(0, len(token_stream) - n_ctx, n_ctx):
            loss = self.train_step(token_stream[i : i + n_ctx])
            total += loss
            n += 1
            if progress:
                progress(n, loss)
        return total / max(1, n)

    def eval_loss(self, tokens) -> float:
        return float(
            causal_lm_loss(self.lora, self.params, self.cfg,
                           jnp.asarray(tokens, jnp.int32), self.scale, self.dtype)
        )

    def export_adapter(self, path: str, alpha: float | None = None):
        """Write the trained LoRA as an adapter GGUF (convert_lora_to_gguf
        compatible layout)."""
        from ..gguf.writer import GGUFWriter

        rank = next(iter(self.lora[0].values()))["a"].shape[0]
        w = GGUFWriter(path, arch=self.cfg.arch)
        w.add_kv("adapter.type", "lora")
        w.add_kv("adapter.lora.alpha", float(alpha if alpha is not None else rank * self.scale))
        for il, lp in enumerate(self.lora):
            for key, ab in lp.items():
                w.add_tensor(f"blk.{il}.{key}.weight.lora_a",
                             np.asarray(ab["a"], np.float32))
                w.add_tensor(f"blk.{il}.{key}.weight.lora_b",
                             np.asarray(ab["b"], np.float32))
        w.write()


# ---------------------------------------------------------------------------
# Full-weight training (ggml-opt parity: GGML_OPT_OPTIMIZER_ADAMW/SGD,
# ggml_opt_fit epoch loop — /root/reference/ggml/src/ggml-opt.cpp,
# ggml/include/ggml-opt.h:222)
# ---------------------------------------------------------------------------


def batched_lm_loss(params, cfg, tokens, dtype=jnp.float32):
    """Mean next-token CE over a [B, T] batch, vmapped per sequence.

    Sequences are independent, so each gets its own T-cell KV and T x T
    causal mask. (Flattening the batch into one B*T-cell sequence with
    seq-id masking computes the identical loss but materializes
    (B*T)^2-scale attention scores — 64x the attention traffic at B=8.)"""
    B, T = tokens.shape
    pos = jnp.arange(T, dtype=jnp.int32)
    widx = pos
    cbits = jnp.ones(T, jnp.uint32)

    def one(seq_toks):
        kv_k = [jnp.zeros((cfg.n_kv_heads, T, cfg.head_dim), dtype)
                for _ in range(cfg.n_layers)]
        kv_v = [jnp.zeros((cfg.n_kv_heads, T, cfg.head_dim_v), dtype)
                for _ in range(cfg.n_layers)]
        logits, _, _, _ = forward(
            params, cfg, kv_k, kv_v, seq_toks, pos,
            jnp.zeros(T, jnp.int32), widx, pos, cbits, widx, dtype=dtype,
        )
        return logits

    logits = jax.vmap(one)(tokens)  # [B, T, V]
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1).mean()
    return nll


class FullTrainer:
    """Full-weight training of a dense model (load with use_planes=False).

    optimizer: "adamw" or "sgd" (the reference's two ggml-opt optimizers,
    ggml-opt.h). The whole params pytree trains; float leaves only."""

    def __init__(self, params, cfg, lr: float = 1e-4, optimizer: str = "adamw",
                 weight_decay: float = 0.0, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        # copy=True: the step donates its params, which must not alias the
        # caller's arrays (jnp.asarray would no-op on f32 leaves)
        self.params = jax.tree.map(
            lambda x: jnp.array(x, jnp.float32, copy=True), params,
            is_leaf=lambda x: x is None)
        if optimizer == "adamw":
            self.opt = optax.adamw(lr, weight_decay=weight_decay)
        elif optimizer == "sgd":
            self.opt = optax.sgd(lr)
        else:
            raise ValueError(f"unknown optimizer {optimizer!r}")
        self.opt_state = self.opt.init(self.params)

        def step(params, opt_state, tokens):
            loss, grads = jax.value_and_grad(batched_lm_loss)(
                params, cfg, tokens, dtype)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = jax.jit(step, donate_argnums=(0, 1))

    def train_step(self, tokens) -> float:
        """tokens: [B, T] int32 batch."""
        tokens = jnp.asarray(tokens, jnp.int32)
        if tokens.ndim == 1:
            tokens = tokens[None]
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, tokens)
        return float(loss)

    def epoch(self, token_stream, n_ctx: int, batch_size: int = 1,
              progress=None) -> float:
        """One pass over the stream in [batch_size, n_ctx] chunks
        (ggml_opt_fit epoch loop)."""
        stream = np.asarray(token_stream, np.int32)
        span = n_ctx * batch_size
        total, n = 0.0, 0
        for i in range(0, len(stream) - span + 1, span):
            chunk = stream[i : i + span].reshape(batch_size, n_ctx)
            loss = self.train_step(chunk)
            total += loss
            n += 1
            if progress:
                progress(n, loss)
        return total / max(1, n)

    def eval_loss(self, tokens) -> float:
        tokens = jnp.asarray(tokens, jnp.int32)
        if tokens.ndim == 1:
            tokens = tokens[None]
        return float(batched_lm_loss(self.params, self.cfg, tokens,
                                     self.dtype))

    def save(self, reader, path: str) -> int:
        """Checkpoint to GGUF (llama_model_save_to_file parity)."""
        from ..models.saver import save_model_gguf

        return save_model_gguf(reader, self.params, path)

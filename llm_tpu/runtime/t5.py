"""T5 encoder-decoder session runtime.

Parity target: the reference's llama_encode + cross-attention decode flow
for T5 (/root/reference/src/llama-context.cpp encode(); llm_build_t5_dec
cross-attention inputs): encode() runs the bidirectional encoder and keeps
the cross K/V resident; decode() steps the causal decoder over the usual
cell cache with logits per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.loader import load_params
from ..models.t5 import t5_cross_kv, t5_decode_step, t5_encode


class T5Session:
    """Single-sequence encoder-decoder session (the llama-cli T5 flow:
    encode the prompt once, then autoregressively decode)."""

    def __init__(self, reader, n_cells: int = 512, dtype=jnp.bfloat16,
                 params_cfg=None):
        if params_cfg is not None:
            self.params, self.cfg = params_cfg
        else:
            self.params, self.cfg = load_params(reader, dense_dtype=dtype)
        assert self.cfg.is_enc_dec, "T5Session requires a t5-family model"
        self.dtype = dtype
        self.n_cells = n_cells
        cfg = self.cfg
        self.kv_k = [jnp.zeros((n_cells + 1, cfg.n_heads, cfg.head_dim), dtype)
                     for _ in range(cfg.n_layers)]
        self.kv_v = [jnp.zeros((n_cells + 1, cfg.n_heads, cfg.head_dim), dtype)
                     for _ in range(cfg.n_layers)]
        self.cross_k = None
        self.cross_v = None
        self.enc_valid = None
        self.n_past = 0
        self._steps: dict = {}

    def encode(self, tokens: list[int]) -> np.ndarray:
        """Run the encoder; project and keep cross K/V. Returns the encoder
        hidden states [S_enc, E] f32 (llama_encode semantics)."""
        toks = jnp.asarray(tokens, jnp.int32)
        enc_h = jax.jit(
            lambda t: t5_encode(self.params, self.cfg, t, dtype=self.dtype)
        )(toks)
        self.cross_k, self.cross_v = jax.jit(
            lambda h: t5_cross_kv(self.params, self.cfg, h, dtype=self.dtype)
        )(enc_h)
        self.enc_valid = jnp.ones(len(tokens), jnp.int32)
        self.n_past = 0
        cfg = self.cfg
        self.kv_k = [jnp.zeros_like(k) for k in self.kv_k]
        self.kv_v = [jnp.zeros_like(v) for v in self.kv_v]
        return np.asarray(enc_h)

    def _get_step(self, T: int):
        fn = self._steps.get(T)
        if fn is None:
            cfg, dtype = self.cfg, self.dtype

            def _step(params, kv_k, kv_v, ck, cv, ev, toks, pos, widx,
                      cpos, cused, oidx):
                return t5_decode_step(params, cfg, kv_k, kv_v, ck, cv, ev,
                                      toks, pos, widx, cpos, cused, oidx,
                                      dtype=dtype)

            fn = jax.jit(_step, donate_argnums=(1, 2))
            self._steps[T] = fn
        return fn

    def decode(self, tokens: list[int]) -> np.ndarray:
        """Feed decoder tokens at positions n_past..; returns logits of the
        last token."""
        assert self.cross_k is not None, "encode() first"
        n = len(tokens)
        T = 1 if n == 1 else 1 << (n - 1).bit_length()
        toks = np.zeros(T, np.int32)
        pos = np.zeros(T, np.int32)
        widx = np.full(T, self.n_cells, np.int32)  # pad -> trash cell
        toks[:n] = tokens
        pos[:n] = np.arange(self.n_past, self.n_past + n)
        widx[:n] = pos[:n]
        cpos = np.arange(self.n_cells + 1, dtype=np.int32)
        cused = np.zeros(self.n_cells + 1, np.int32)
        cused[: self.n_past + n] = 1
        step = self._get_step(T)
        logits, self.kv_k, self.kv_v, _ = step(
            self.params, self.kv_k, self.kv_v, self.cross_k, self.cross_v,
            self.enc_valid, jnp.asarray(toks), jnp.asarray(pos),
            jnp.asarray(widx), jnp.asarray(cpos), jnp.asarray(cused),
            jnp.asarray([n - 1], jnp.int32))
        self.n_past += n
        return np.asarray(logits[0])

    def generate(self, prompt_tokens: list[int], n_predict: int = 64,
                 eos_id: int = 1) -> list[int]:
        """encode + greedy decode from decoder_start_token_id
        (T5 generation flow)."""
        self.encode(prompt_tokens)
        cur = self.cfg.dec_start_token
        out: list[int] = []
        logits = self.decode([cur])
        for _ in range(n_predict):
            nxt = int(np.argmax(logits))
            if nxt == eos_id:
                break
            out.append(nxt)
            logits = self.decode([nxt])
        return out

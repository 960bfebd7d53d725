"""In-jit (on-device) sampling for the batched generation loop.

Mirrors the host chain's standard-dist subset — TopK -> TopP -> MinP ->
Temp -> Dist (build_chain order, itself the reference's common_sampler_init
order, /root/reference/common/sampling.cpp) — vectorized over a batch of
logit rows with PER-ROW parameters, so a single compiled while_loop serves
every mix of per-slot sampling settings without recompiling.

The candidate set is prefiltered to the top K_CAP logits per row. The
result is EXACTLY the host chain whenever top_k is in [1, K_CAP] (the
device-eligibility rule; llama.cpp's default top_k=40 qualifies): TopK
runs first, so no later sampler can resurrect a candidate outside the
top-k prefix. Greedy rows (temp <= 0) take a full-row argmax.

Determinism note: categorical draws use JAX's counter-based PRNG, while
the host Dist sampler uses numpy Generator streams — same distribution
family, different stream, so host and device sampled SEQUENCES differ at
temp > 0 (each is reproducible under its own seed). Greedy rows are
bit-identical to the host path. tests/test_gloop_batch.py pins the
masked-distribution equality between process_rows and the host chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# top-logit prefilter width; device eligibility requires top_k <= K_CAP
K_CAP = 256


def device_eligible(p) -> bool:
    """True when `SamplingParams` p reduces to the in-jit subset: the
    standard dist chain with every stateful/host-only modifier at its
    no-op default, and a top_k that makes the K_CAP prefilter exact.
    (Greedy — temp <= 0 — is always eligible modulo the same modifiers.)"""
    clean = (
        p.mirostat == 0
        and not p.grammar
        and not p.logit_bias
        and p.penalty_repeat == 1.0
        and p.penalty_freq == 0.0
        and p.penalty_present == 0.0
        and p.dry_multiplier == 0.0
        and p.xtc_probability == 0.0
        and p.typical_p >= 1.0
        and p.dynatemp_range <= 0.0
        and p.top_n_sigma < 0
        and p.min_keep <= 1
    )
    if not clean:
        return False
    if p.temp <= 0.0:
        return True
    return 1 <= p.top_k <= K_CAP


def process_rows(lg, temp, top_k, top_p, min_p):
    """Apply TopK -> TopP -> MinP -> Temp to (B, V) logits with per-row
    parameters. Returns (vals, idx): vals (B, K) processed logits in
    descending pre-mask order (-inf = removed), idx (B, K) token ids.

    Per-sampler semantics mirror samplers/chain.py exactly (min_keep=1):
      TopK:  k <= 0 or k >= V is a no-op, else keep the k largest.
      TopP:  renormalize over survivors, keep the smallest prefix whose
             cumulative probability reaches p (inclusive); p >= 1 no-op.
      MinP:  drop logits below max_logit + log(p); p <= 0 no-op. The top
             candidate always survives (min_keep=1 is automatic).
      Temp:  divide by temp (caller guarantees temp > 0 for sampled rows).
    """
    B, V = lg.shape
    K = min(K_CAP, V)
    lg = lg.astype(jnp.float32)
    vals, idx = jax.lax.top_k(lg, K)
    ar = jnp.arange(K)[None, :]

    k_eff = jnp.where((top_k > 0) & (top_k < V), jnp.minimum(top_k, K), K)
    vals = jnp.where(ar < k_eff[:, None], vals, -jnp.inf)

    probs = jax.nn.softmax(vals, axis=-1)  # -inf rows -> 0
    cum = jnp.cumsum(probs, axis=-1)
    keep_p = jnp.concatenate(
        [jnp.ones((B, 1), bool), cum[:, :-1] < top_p[:, None]], axis=1)
    keep_p |= top_p[:, None] >= 1.0
    vals = jnp.where(keep_p, vals, -jnp.inf)

    thresh = vals[:, :1] + jnp.log(jnp.maximum(min_p, 1e-30))[:, None]
    keep_m = (min_p[:, None] <= 0.0) | (vals >= thresh)
    vals = jnp.where(keep_m, vals, -jnp.inf)

    vals = vals / jnp.maximum(temp, 1e-6)[:, None]
    return vals, idx


def sample_rows(lg, temp, top_k, top_p, min_p, keys):
    """Sample one token per row of lg (B, V). Rows with temp <= 0 take the
    full-row argmax (host Greedy); others draw categorically from the
    processed candidate set using the per-row PRNG key (B-array)."""
    greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)
    vals, idx = process_rows(lg, temp, top_k, top_p, min_p)
    choice = jax.vmap(jax.random.categorical)(keys, vals)
    sampled = jnp.take_along_axis(
        idx, choice[:, None], axis=1)[:, 0].astype(jnp.int32)
    return jnp.where(temp <= 0.0, greedy, sampled)

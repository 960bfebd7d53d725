"""Direct YaRN rope parity: our rope_angles vs a numpy transcription of
the reference's math (rope_yarn/rope_yarn_ramp/ggml_rope_cache_init,
ggml-cpu/ops.cpp:5855-5893; corr dims ggml.c:4002-4012) across a grid of
scaling params, including per-dim freq factors (llama3 rope_freqs)."""

import numpy as np
import pytest

import jax.numpy as jnp

from llm_tpu.ops.rope import RopeParams, rope_angles


def _ref_cache(pos, p, freq_factors=None):
    """cos/sin per (pos, dim-pair) exactly as the reference computes them."""
    half = p.n_dims // 2

    def corr_dim(n_rot):
        return (p.n_dims * np.log(p.n_ctx_orig / (n_rot * 2 * np.pi))
                / (2 * np.log(p.freq_base)))

    lo = max(0.0, np.floor(corr_dim(p.beta_fast)))
    hi = min(p.n_dims - 1.0, np.ceil(corr_dim(p.beta_slow)))
    theta_scale = p.freq_base ** (-2.0 / p.n_dims)
    cos = np.zeros((len(pos), half))
    sin = np.zeros((len(pos), half))
    for pi, pp in enumerate(pos):
        theta_base = float(pp)
        for i in range(half):
            ff = freq_factors[i] if freq_factors is not None else 1.0
            theta_extrap = theta_base / ff
            theta_interp = p.freq_scale * theta_extrap
            theta = theta_interp
            mscale = p.attn_factor
            if p.ext_factor != 0.0:
                y = (i - lo) / max(0.001, hi - lo)
                ramp = (1.0 - min(1.0, max(0.0, y))) * p.ext_factor
                theta = theta_interp * (1 - ramp) + theta_extrap * ramp
                mscale *= 1.0 + 0.1 * np.log(1.0 / p.freq_scale)
            cos[pi, i] = np.cos(theta) * mscale
            sin[pi, i] = np.sin(theta) * mscale
            theta_base *= theta_scale
    return cos, sin


@pytest.mark.parametrize("params", [
    dict(),                                        # plain rope
    dict(freq_scale=0.25),                         # linear scaling
    dict(freq_scale=0.25, ext_factor=1.0),         # yarn
    dict(freq_scale=0.125, ext_factor=1.0,
         attn_factor=1.2, beta_fast=24.0, beta_slow=2.0),
    dict(freq_base=500000.0, freq_scale=0.5, ext_factor=0.7),
], ids=["plain", "linear", "yarn", "yarn-full", "yarn-hi-base"])
@pytest.mark.parametrize("with_ff", [False, True], ids=["noff", "ff"])
def test_rope_angles_match_reference(params, with_ff):
    p = RopeParams(n_dims=64, freq_base=params.pop("freq_base", 10000.0),
                   n_ctx_orig=4096, **params)
    pos = np.asarray([0, 1, 17, 999, 7777], np.int32)
    ff = (1.0 + np.arange(32, dtype=np.float32) / 8.0) if with_ff else None
    want_cos, want_sin = _ref_cache(pos, p, ff)
    got_cos, got_sin = rope_angles(jnp.asarray(pos), p, ff)
    # tolerance: theta reaches ~8e3 at pos 7777/dim 0, where f32 angle
    # rounding alone moves cos/sin by ~1e-3; structural errors (wrong
    # ramp/mscale/ff indexing) are orders of magnitude larger
    np.testing.assert_allclose(np.asarray(got_cos), want_cos,
                               atol=4e-3, rtol=4e-3)
    np.testing.assert_allclose(np.asarray(got_sin), want_sin,
                               atol=4e-3, rtol=4e-3)

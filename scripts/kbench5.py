"""Glue-component microbenchmark: flash decode attention, rope, norms,
KV write — the ~64us/layer of non-matmul decode time (kbench4 slope minus
kbench3 matmul marginals). Marginal methodology with KV-cache rotation
(caches are 4MB each; XLA parks sub-VMEM constants, so rotate >128MB)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "unsafe_rbg")

sys.path.insert(0, "/root/repo")

from llm_tpu.ops.pallas_attn import (expand_tables, flash_decode,  # noqa: E402
                                     rope_companion)
from llm_tpu.ops.rope import RopeParams, apply_rope, rope_angles  # noqa: E402
from llm_tpu.ops.norms import rms_norm  # noqa: E402

S, H, HKV, D = 1024, 32, 8, 128
T = 1


def marginal(loop_fn, reps, inners=(2, 10)):
    lj = jax.jit(loop_fn, static_argnums=(0, 1))
    ts = {}
    for inner in inners:
        jax.block_until_ready(lj(reps, inner))
        t0 = time.perf_counter()
        jax.block_until_ready(lj(reps, inner))
        ts[inner] = (time.perf_counter() - t0) / reps
    return (ts[inners[1]] - ts[inners[0]]) / (inners[1] - inners[0])


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    NB = 36  # 36 * (2+2)MB = 144MB of caches > VMEM
    kcaches = jnp.asarray(
        jax.random.normal(ks[0], (NB, S, HKV, D), jnp.bfloat16) * 0.05)
    vcaches = jnp.asarray(
        jax.random.normal(ks[1], (NB, S, HKV, D), jnp.bfloat16) * 0.05)
    q0 = jax.random.normal(ks[2], (T, H, D), jnp.bfloat16) * 0.1
    ch, sh = rope_angles(jnp.arange(S, dtype=jnp.int32),
                         RopeParams(n_dims=D, mode=0, freq_base=500000.0))
    cos_c, sin_c = expand_tables(ch, sh, 0, D)
    cos_c = cos_c.astype(jnp.bfloat16)
    sin_c = sin_c.astype(jnp.bfloat16)
    bias = jnp.zeros((T, S), jnp.bfloat16)  # causal mask precomputed
    scale = 1.0 / np.sqrt(D)

    # --- flash decode attention ---------------------------------------
    def loop_flash(n, inner, kc=kcaches, vc=vcaches):
        def body(it, q):
            for i in range(inner):
                b = (it * inner + i) % NB
                att = flash_decode(
                    q, rope_companion(q, 0, n_dims=D), kc[b], vc[b],
                    cos_c, sin_c, bias, scale)
                q = (q0 + att.reshape(T, H, D).astype(jnp.bfloat16) * 1e-3)
            return q
        return jax.lax.fori_loop(0, n, body, q0)

    if "--skip-flash" not in sys.argv:
        m = marginal(loop_flash, 40)
        print(f"flash_decode S={S}: marginal {m*1e6:8.1f} us "
              f"({(2*S*HKV*D*2)/1e9/m:.1f} GB/s on KV)")

    # --- rope on q (XLA) ----------------------------------------------
    cos_t = ch[:T].astype(jnp.bfloat16)  # apply_rope takes half-width
    sin_t = sh[:T].astype(jnp.bfloat16)

    def loop_rope(n, inner):
        def body(it, q):
            for i in range(inner):
                q = apply_rope(q, cos_t, sin_t, 0, D) * (1 - 1e-6)
                q = q.astype(jnp.bfloat16)
            return q
        return jax.lax.fori_loop(0, n, body, q0)

    m = marginal(loop_rope, 200)
    print(f"rope(q):         marginal {m*1e6:8.1f} us")

    # --- rms_norm on (1, 4096) (XLA) ----------------------------------
    x0 = jax.random.normal(ks[3], (T, 4096), jnp.bfloat16)
    gamma = jnp.ones((4096,), jnp.float32)

    def loop_norm(n, inner):
        def body(it, x):
            for i in range(inner):
                x = rms_norm(x, gamma, 1e-5).astype(jnp.bfloat16) * 1.0001
            return x
        return jax.lax.fori_loop(0, n, body, x0)

    m = marginal(loop_norm, 200)
    print(f"rms_norm(4096):  marginal {m*1e6:8.1f} us")

    # --- kv write (dynamic_update_slice via .at.set) -------------------
    kv0 = jnp.zeros((S, HKV, D), jnp.bfloat16)
    newk = jax.random.normal(ks[4], (T, HKV, D), jnp.bfloat16)

    def loop_kvw(n, inner):
        def body(it, kv):
            for i in range(inner):
                idx = (it * inner + i) % S
                kv = kv.at[jnp.asarray([idx])].set(
                    newk * (1.0 + kv[0, 0, 0] * 1e-9))
            return kv
        return jax.lax.fori_loop(0, n, body, kv0)

    m = marginal(loop_kvw, 200)
    print(f"kv_write:        marginal {m*1e6:8.1f} us")


if __name__ == "__main__":
    main()

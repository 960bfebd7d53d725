"""Round-5: isolate the q8 flash-decode slowdown (990us vs 26us dense).

Variants at S=4096, Hkv=8, D=128, T=1:
  a) dense bf16 (control)
  b) q8 full (int8 k/v + per-head-row scales [Hkv,S,1])
  c) q8 no-scale (int8 k/v, skip the scale multiply)
  d) q8 scales but convert int8->bf16 (not f32) before multiply
  e) q8 with scales pre-broadcast in-kernel via (sblk,1) f32
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

sys.path.insert(0, "/root/repo")

from llm_tpu.ops.pallas_attn import NEG, _decode_body  # noqa: E402

S, H, HKV, D = 4096, 32, 8, 128
T, G = 1, 4
TG = T * G
SBLK = 1024


def _mk_kernel(mode):
    def kern(q_ref, qr_ref, b_ref, k_ref, ks_ref, v_ref, vs_ref,
             cos_ref, sin_ref, o_ref, acc_ref, m_ref, l_ref):
        if mode == "noscale":
            kh = k_ref[0].astype(jnp.float32)
            vh = v_ref[0].astype(jnp.float32)
        elif mode == "bf16":
            kh = (k_ref[0].astype(jnp.bfloat16)
                  * ks_ref[0].astype(jnp.bfloat16)).astype(jnp.float32)
            vh = (v_ref[0].astype(jnp.bfloat16)
                  * vs_ref[0].astype(jnp.bfloat16)).astype(jnp.float32)
        else:  # full
            kh = k_ref[0].astype(jnp.float32) * ks_ref[0].astype(jnp.float32)
            vh = v_ref[0].astype(jnp.float32) * vs_ref[0].astype(jnp.float32)
        _decode_body(q_ref, qr_ref, b_ref, kh, vh, cos_ref, sin_ref,
                     o_ref, acc_ref, m_ref, l_ref, scale=D ** -0.5,
                     softcap=0.0, s_real=S, sblk=SBLK)
    return kern


def run(mode, reps=50):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(HKV, TG, D)), jnp.float32)
    qr = jnp.asarray(rng.normal(size=(HKV, TG, D)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 127, size=(HKV, S, D)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 127, size=(HKV, S, D)), jnp.int8)
    ks = jnp.asarray(rng.normal(size=(HKV, S, 1)) * 0.01 + 0.02, jnp.bfloat16)
    vs = jnp.asarray(rng.normal(size=(HKV, S, 1)) * 0.01 + 0.02, jnp.bfloat16)
    cos = jnp.ones((S, D), jnp.bfloat16)
    sin = jnp.zeros((S, D), jnp.bfloat16)
    bias = jnp.zeros((T, S), jnp.float32)

    grid = (HKV, S // SBLK)
    qspec = pl.BlockSpec((1, TG, D), lambda h, j: (h, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, SBLK, D), lambda h, j: (h, j, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, SBLK, 1), lambda h, j: (h, j, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((SBLK, D), lambda h, j: (j, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((T, SBLK), lambda h, j: (0, j),
                         memory_space=pltpu.VMEM)

    fn = pl.pallas_call(
        _mk_kernel(mode),
        grid=grid,
        in_specs=[qspec, qspec, bspec, kspec, sspec, kspec, sspec,
                  tspec, tspec],
        out_specs=pl.BlockSpec((1, TG, D), lambda h, j: (h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((HKV, TG, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TG, D), jnp.float32),
                        pltpu.VMEM((TG, 1), jnp.float32),
                        pltpu.VMEM((TG, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )
    fj = jax.jit(lambda *a: fn(*a))
    out = fj(q, qr, bias, kq, ks, vq, vs, cos, sin)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fj(q, qr, bias, kq, ks, vq, vs, cos, sin)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    nbytes = kq.size + vq.size + (ks.size + vs.size) * 2 + (cos.size + sin.size) * 2
    print(f"{mode:8s}: {dt*1e6:7.1f} us, {nbytes/dt/1e9:6.1f} GB/s")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    for mode in ("noscale", "full", "bf16"):
        run(mode)

"""Pallas TPU kernel: CHAINED fused quantized matmuls — one launch for a
whole decoder-layer tail.

Motivation (docs/PERF.md "Where the time goes"): at decode shapes (B=8) the
per-kernel fixed cost (launch + pipeline ramp on 6-16-step grids) caps the
individual fused matmuls at ~140-200 GB/s of the v5e's 819 GB/s HBM
roofline. The reference's CUDA backend amortizes launches by capturing the
whole decode graph (CUDA-graph replay, /root/reference/ggml/src/ggml-cuda/
ggml-cuda.cu:2581-2701). The TPU-native equivalent is to make each launch
BIGGER: this kernel runs a *sequence of quantized matmuls with elementwise
glue between them* in ONE pallas_call over one long sequential grid:

    layer tail :  y1 = att @ Wo          (phase 0)
                  h  = x_res + y1;  hn = rmsnorm(h) * gamma      (boundary)
                  gu = hn @ Wgu          (phase 1)
                  cur = silu(g) * u                              (boundary)
                  y3 = cur @ Wd          (phase 2)
                  out = h + y3                                   (epilogue)

    norm+mm    :  out = (rmsnorm(x) * gamma) @ W                 (1 phase)

mechanics:
  * ONE 1-D "arbitrary" grid walks phase 0's tiles, then phase 1's, ...
    Every weight operand's index map CLAMPS outside its own phase, so the
    Pallas pipeline (which skips the copy when the block index is
    unchanged) fetches each block exactly once; out-of-phase operands cost
    nothing. The upcoming phase's first block is effectively prefetched
    while the previous phase still computes.
  * Phase boundaries (residual add, RMSNorm, SwiGLU) run in-kernel at the
    FIRST grid step of the next phase, reading the previous phase's output
    from VMEM scratch — the intermediate activations never touch HBM.
  * All per-phase x chunks live in scratch shaped (k_steps, B, tile_k):
    leading-dim dynamic indexing is sublane-friendly; lane-dim slices stay
    static.
  * The group zero-point correction (Q4_K mins) is computed fully
    in-kernel: group-sums of x come from a tiny 0/1 pooling matmul per
    chunk (no host-precomputed operand), mirroring the reference's Q8
    bsums trick (block_q8_K.bsums, ggml-common.h:329-334).

Weight planes are the same K-major QTensor planes as ops/pallas_qmm.py;
the dequant helpers are shared. Phases may mix layouts/group sizes (e.g.
Q4_K attn_output with a Q6_K ffn_down, the Q4_K_M recipe of
/root/reference/src/llama-quant.cpp:246-352).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_qmm import PACK_TK, _make_w_i8, _make_w_p4, _sq

_VMEM_BUDGET = 13 << 20


class PhaseSpec:
    """Static description of one matmul phase (hashable: jit static arg)."""

    __slots__ = ("layout", "gs", "zp", "has_mins", "k", "n",
                 "tile_k", "tile_n", "pre")

    def __init__(self, layout, gs, zp, has_mins, k, n, tile_k, tile_n, pre):
        self.layout = layout
        self.gs = gs
        self.zp = zp
        self.has_mins = has_mins
        self.k = k
        self.n = n
        self.tile_k = tile_k
        self.tile_n = tile_n
        self.pre = pre  # "cast" | "norm" | "res_norm" | "swiglu" | "geglu"

    def _key(self):
        return (self.layout, self.gs, self.zp, self.has_mins, self.k,
                self.n, self.tile_k, self.tile_n, self.pre)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, PhaseSpec) and self._key() == other._key()

    def __repr__(self):
        return f"PhaseSpec{self._key()}"


def _rms(xf32, gamma_f32, eps):
    """ops/norms.py rms_norm semantics (f32 math, eps inside sqrt)."""
    var = jnp.mean(xf32 * xf32, axis=-1, keepdims=True)
    out = xf32 * jnp.reciprocal(jnp.sqrt(var + eps))
    if gamma_f32 is not None:
        out = out * gamma_f32
    return out


def _act_f32(name, g):
    if name == "silu":
        return jax.nn.silu(g)
    return jax.nn.gelu(g, approximate=True)


def _chain_kernel(*refs, phases, eps, act, cdtype, out_dtype, final,
                  has_xres, n_gammas, ptk):
    """refs order: x, [xres], gammas..., per-phase (qs, s, [m]),
    out, then scratch: acc, outs[0..P-2], xs[0..P-1], [hres]."""
    P = len(phases)
    it = iter(range(len(refs)))
    x_ref = refs[next(it)]
    xres_ref = refs[next(it)] if has_xres else None
    gamma_refs = [refs[next(it)] for _ in range(n_gammas)]
    w_refs = []
    for ph in phases:
        q = refs[next(it)]
        sc = refs[next(it)]
        m = refs[next(it)] if ph.has_mins else None
        w_refs.append((q, sc, m))
    out_ref = refs[next(it)]
    acc_ref = refs[next(it)]
    outs = [refs[next(it)] for _ in range(P - 1)]
    xs = [refs[next(it)] for _ in range(P)]
    hres_ref = refs[next(it)] if final == "add_res" else None

    s = pl.program_id(0)
    ksteps = [ph.k // ph.tile_k for ph in phases]
    ntiles = [ph.n // ph.tile_n for ph in phases]
    cum = [0]
    for p in range(P):
        cum.append(cum[-1] + ksteps[p] * ntiles[p])

    gamma_of = {}
    gi = 0
    for p, ph in enumerate(phases):
        if ph.pre in ("norm", "res_norm"):
            gamma_of[p] = gamma_refs[gi]
            gi += 1

    def boundary(p):
        ph = phases[p]
        if p == 0:
            prev = x_ref[...].astype(jnp.float32)
        else:
            prev = jnp.concatenate(
                [outs[p - 1][c] for c in range(ntiles[p - 1])], axis=-1)
        if ph.pre == "cast":
            x = prev.astype(cdtype)
        elif ph.pre == "norm":
            g32 = gamma_of[p][...].astype(jnp.float32)
            x = _rms(prev, g32, eps).astype(cdtype)
        elif ph.pre == "res_norm":
            # prev is f32 matmul output; replicate the unfused dtype walk:
            # attn_out=cast(y1); h = x_res + attn_out; hn = rmsnorm(h)*gamma
            h = xres_ref[...] + prev.astype(cdtype)
            if hres_ref is not None:
                tn_last = phases[-1].tile_n
                for c in range(phases[-1].n // tn_last):
                    hres_ref[c] = h[:, c * tn_last:(c + 1) * tn_last]
            g32 = gamma_of[p][...].astype(jnp.float32)
            x = _rms(h.astype(jnp.float32), g32, eps).astype(cdtype)
        elif ph.pre in ("swiglu", "geglu"):
            half = prev.shape[-1] // 2
            g, u = prev[:, :half], prev[:, half:]
            x = (_act_f32(act, g) * u).astype(cdtype)
        else:  # pragma: no cover
            raise ValueError(ph.pre)
        tk = ph.tile_k
        for c in range(ksteps[p]):
            xs[p][c] = x[:, c * tk:(c + 1) * tk]

    # boundaries run at the FIRST step of their phase (previous phase's
    # outs are complete after step cum[p]-1), BEFORE this step's compute
    for p in range(P):
        @pl.when(s == cum[p])
        def _(p=p):
            boundary(p)

    def phase_compute(p, ph, i, j):
        q_ref, s_ref, m_ref = w_refs[p]

        @pl.when(j == 0)
        def _():
            acc_ref[:, :ph.tile_n] = jnp.zeros_like(acc_ref[:, :ph.tile_n])

        mk = _make_w_p4 if ph.layout == "p4" else _make_w_i8
        make_w = mk(q_ref, s_ref, ph.gs, ph.zp, cdtype, ptk)
        nchunks = ph.tile_k // ptk
        gpc = ptk // ph.gs
        acc = None
        for c in range(nchunks):
            xc = xs[p][j][:, c * ptk:(c + 1) * ptk]
            w = make_w(c)
            part = jax.lax.dot_general(
                xc, w, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if ph.has_mins:
                # in-kernel group-sums: xg = xc @ pool, pool[k,g]=(k//gs==g)
                rows = jax.lax.broadcasted_iota(jnp.int32, (ptk, gpc), 0)
                cols = jax.lax.broadcasted_iota(jnp.int32, (ptk, gpc), 1)
                pool = (rows // ph.gs == cols).astype(cdtype)
                xg = jax.lax.dot_general(
                    xc, pool, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(cdtype)
                mc = _sq(m_ref)[c * gpc:(c + 1) * gpc, :].astype(cdtype)
                part = part - jax.lax.dot_general(
                    xg, mc, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            acc = part if acc is None else acc + part
        acc_ref[:, :ph.tile_n] += acc

        @pl.when(j == ksteps[p] - 1)
        def _():
            val = acc_ref[:, :ph.tile_n]
            if p == P - 1:
                if final == "add_res":
                    out_ref[...] = hres_ref[i] + val.astype(cdtype)
                else:
                    out_ref[...] = val.astype(out_dtype)
            else:
                outs[p][i] = val

    for p, ph in enumerate(phases):
        @pl.when((s >= cum[p]) & (s < cum[p + 1]))
        def _(p=p, ph=ph):
            ls = s - cum[p]
            phase_compute(p, ph, ls // ksteps[p], ls % ksteps[p])


def _pad8(a):
    b = a.shape[0]
    pad = (-b) % 8
    return (jnp.pad(a, ((0, pad), (0, 0))) if pad else a), b


@functools.partial(
    jax.jit,
    static_argnames=("phases", "eps", "act", "final", "compute_dtype",
                     "out_dtype", "interpret", "ptk"),
)
def qmm_chain(
    x: jnp.ndarray,                 # [B, K0]
    planes: tuple,                  # per phase: (qs, scales, mins|None)
    gammas: tuple = (),             # norm weights, one per norm phase, [Kp]
    x_res: jnp.ndarray | None = None,  # [B, N0] residual for res_norm/add_res
    *,
    phases: tuple,                  # tuple[PhaseSpec]
    eps: float = 1e-5,
    act: str = "silu",
    final: str = "cast",            # "cast" | "add_res"
    compute_dtype=jnp.bfloat16,
    out_dtype=None,
    interpret: bool = False,
    ptk: int = PACK_TK,
) -> jnp.ndarray:
    """Run the phase chain in one pallas_call. Returns [B, N_last]."""
    P = len(phases)
    cdtype = jnp.dtype(compute_dtype)
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else cdtype
    B = x.shape[0]
    assert B % 8 == 0, "caller pads rows to a multiple of 8"

    ksteps = [ph.k // ph.tile_k for ph in phases]
    ntiles = [ph.n // ph.tile_n for ph in phases]
    steps = [ks * nt for ks, nt in zip(ksteps, ntiles)]
    cum = [0]
    for st in steps:
        cum.append(cum[-1] + st)
    total = cum[-1]
    n_last = phases[-1].n
    tn_last = phases[-1].tile_n

    def clamp(v, lo, hi):
        return jnp.minimum(jnp.maximum(v, lo), hi)

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]  # x full
    args = [x.astype(cdtype)]
    has_xres = x_res is not None
    if has_xres:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(x_res.astype(cdtype))
    for g in gammas:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(g.reshape(1, -1))

    nbytes = 0
    for p, (ph, (qs, scales, mins)) in enumerate(zip(phases, planes)):
        kfac = 2 if ph.layout == "p4" else 1

        def wmap(p=p, ph=ph, kfac=kfac):
            def index_map(si):
                ls = clamp(si - cum[p], 0, steps[p] - 1)
                return (ls % ksteps[p], ls // ksteps[p])
            return index_map

        in_specs.append(pl.BlockSpec(
            (ph.tile_k // kfac, ph.tile_n), wmap(),
            memory_space=pltpu.VMEM))
        args.append(qs)
        in_specs.append(pl.BlockSpec(
            (ph.tile_k // ph.gs, ph.tile_n), wmap(),
            memory_space=pltpu.VMEM))
        args.append(scales)
        nbytes += qs.size * qs.dtype.itemsize
        nbytes += scales.size * scales.dtype.itemsize
        if ph.has_mins:
            in_specs.append(pl.BlockSpec(
                (ph.tile_k // ph.gs, ph.tile_n), wmap(),
                memory_space=pltpu.VMEM))
            args.append(mins)
            nbytes += mins.size * mins.dtype.itemsize

    def out_map(si):
        ls = clamp(si - cum[P - 1], 0, steps[P - 1] - 1)
        return (0, ls // ksteps[P - 1])

    out_spec = pl.BlockSpec((B, tn_last), out_map, memory_space=pltpu.VMEM)

    max_tn = max(ph.tile_n for ph in phases)
    scratch = [pltpu.VMEM((B, max_tn), jnp.float32)]  # acc
    for p in range(P - 1):
        scratch.append(pltpu.VMEM((ntiles[p], B, phases[p].tile_n),
                                  jnp.float32))
    for p in range(P):
        scratch.append(pltpu.VMEM((ksteps[p], B, phases[p].tile_k), cdtype))
    if final == "add_res":
        scratch.append(pltpu.VMEM((n_last // tn_last, B, tn_last), cdtype))

    n_gammas = sum(1 for ph in phases if ph.pre in ("norm", "res_norm"))
    kernel = functools.partial(
        _chain_kernel, phases=phases, eps=eps, act=act, cdtype=cdtype,
        out_dtype=out_dtype, final=final, has_xres=has_xres,
        n_gammas=n_gammas, ptk=ptk)

    flops = sum(2 * B * ph.n * ph.k for ph in phases)
    return pl.pallas_call(
        kernel,
        grid=(total,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=nbytes + x.size * 2 + B * n_last * 4,
            transcendentals=0,
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_last), out_dtype),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# tile selection + QTensor-level wrappers


_TILE_N_CHAIN = tuple(int(t) for t in os.environ.get(
    "LLM_TPU_CHAIN_TILE_N", "1024,512,256,128").split(","))
_TILE_K_CHAIN = tuple(int(t) for t in os.environ.get(
    "LLM_TPU_CHAIN_TILE_K", "4096,3584,2048,1792,1024,512,256").split(","))


def _phase_bytes(ph: PhaseSpec, B: int) -> int:
    """Double-buffered VMEM for one phase's weight blocks + x scratch."""
    kfac = 2 if ph.layout == "p4" else 1
    qs = (ph.tile_k // kfac) * ph.tile_n
    sm = (2 if ph.has_mins else 1) * (ph.tile_k // ph.gs) * ph.tile_n * 2
    xsb = (ph.k // ph.tile_k) * B * ph.tile_k * 2
    return 2 * (qs + sm) + xsb


def _chain_vmem(phases, B: int, ptk: int) -> int:
    tot = sum(_phase_bytes(ph, B) for ph in phases)
    for p in range(len(phases) - 1):
        tot += (phases[p].n // phases[p].tile_n) * B * phases[p].tile_n * 4
    tot += B * max(ph.tile_n for ph in phases) * 4        # acc
    tot += phases[-1].n * B * 2                            # hres worst case
    tot += ptk * max(ph.tile_n for ph in phases) * 6       # dequant temps
    tot += max(ph.n for ph in phases) * B * 4              # boundary concat
    return tot


def plan_phases(qts, pres, ptk: int = PACK_TK):
    """Pick a shared tile_n + per-phase tile_k for a chain over QTensors.
    Returns tuple[PhaseSpec] or None when the geometry doesn't fit the
    kernel's constraints (caller falls back to the unfused path)."""
    dims = [(qt.in_features, qt.out_features) for qt in qts]
    tile_n = next((t for t in _TILE_N_CHAIN
                   if all(n % t == 0 for _, n in dims)), None)
    if tile_n is None:
        return None
    specs = []
    for (k, n), qt, pre in zip(dims, qts, pres):
        if qt.layout == "p4" and qt.pack_tk != ptk:
            return None
        tk = next((t for t in _TILE_K_CHAIN
                   if k % t == 0 and t % ptk == 0 and t % qt.group_size == 0),
                  None)
        if tk is None:
            return None
        specs.append(PhaseSpec(qt.layout, qt.group_size, qt.zp,
                               qt.mins is not None, k, n, tk, tile_n, pre))
    # shrink K-tiles largest-first until the footprint fits scoped VMEM
    B = 8
    while _chain_vmem(specs, B, ptk) > _VMEM_BUDGET:
        big = max(range(len(specs)), key=lambda i: _phase_bytes(specs[i], B))
        ph = specs[big]
        cand = next((t for t in _TILE_K_CHAIN
                     if t < ph.tile_k and ph.k % t == 0 and t % ptk == 0
                     and t % ph.gs == 0), None)
        if cand is None:
            if tile_n > 128:
                tile_n //= 2
                specs = [PhaseSpec(s.layout, s.gs, s.zp, s.has_mins, s.k,
                                   s.n, s.tile_k, tile_n, s.pre)
                         for s in specs]
                if any(s.n % tile_n for s in specs):
                    return None
                continue
            return None
        specs[big] = PhaseSpec(ph.layout, ph.gs, ph.zp, ph.has_mins, ph.k,
                               ph.n, cand, tile_n, ph.pre)
    return tuple(specs)


_TAIL_BANNED = (
    "attn_sub_norm", "attn_post_norm", "ffn_post_norm", "ffn_sub_norm",
    "ffn_norm_exps", "ffn_gate_inp", "attn_output_b", "ffn_down_b",
    "ffn_norm_b", "attn_output.lora", "ffn_down.lora",
    "ffn_gateup_fused.lora", "ffn_up_b", "ffn_gate_b", "cross_attn_norm",
)

_HEAD_BANNED = (
    "attn_qkv_fused_b", "attn_q_b", "attn_k_b", "attn_v_b", "attn_norm_b",
    "attn_qkv_fused.lora",
)


def _is_kmajor_qt(w) -> bool:
    from ..quant.qtensor import QTensor

    return isinstance(w, QTensor) and w.kmajor


def tail_eligible(layer: dict) -> bool:
    """True when the layer's tail is exactly the llama recipe the fused
    chain implements (no biases/post-norms/LoRA/MoE, kmajor planes).
    Model-wide gates (rms norm, act, residual_scale, fused_tp) are checked
    by the caller."""
    if any(k not in layer for k in
           ("attn_output", "ffn_gateup_fused", "ffn_down", "ffn_norm")):
        return False
    if any(k in layer for k in _TAIL_BANNED):
        return False
    return all(_is_kmajor_qt(layer[k])
               for k in ("attn_output", "ffn_gateup_fused", "ffn_down"))


def head_eligible(layer: dict) -> bool:
    """True when the layer head is rmsnorm -> fused QKV with no biases."""
    if "attn_qkv_fused" not in layer or "attn_norm" not in layer:
        return False
    if any(k in layer for k in _HEAD_BANNED):
        return False
    return _is_kmajor_qt(layer["attn_qkv_fused"])


def layer_tail(att, x_res, ffn_gamma, wo, wgu, wd, *, eps, act="silu",
               compute_dtype=jnp.bfloat16, interpret=False):
    """One-launch decoder-layer tail:
    out = h + swiglu(rmsnorm(h := x_res + att@Wo) @ Wgu) @ Wd.

    Parity: the o_proj -> residual -> ffn_norm -> build_ffn tail of
    llm_build_llama (/root/reference/src/llama-model.cpp:4980-5030), with
    identical dtype walk to models/transformer._layer_body's unfused path.
    """
    specs = plan_phases((wo, wgu, wd), ("cast", "res_norm", "swiglu"))
    if specs is None:
        return None
    a, b = _pad8(att)
    r, _ = _pad8(x_res)
    out = qmm_chain(
        a,
        tuple((w.qs, w.scales, w.mins) for w in (wo, wgu, wd)),
        (ffn_gamma,),
        r,
        phases=specs,
        eps=eps,
        act=act,
        final="add_res",
        compute_dtype=compute_dtype,
        interpret=interpret,
    )
    return out[:b]


def norm_mm(x, gamma, w, *, eps, compute_dtype=jnp.bfloat16,
            out_dtype=None, interpret=False):
    """One-launch rmsnorm + quantized matmul: (rmsnorm(x)*gamma) @ W.
    Covers the attn_norm->QKV head of the layer and final_norm->lm_head."""
    specs = plan_phases((w,), ("norm",))
    if specs is None:
        return None
    a, b = _pad8(x)
    out = qmm_chain(
        a,
        ((w.qs, w.scales, w.mins),),
        (gamma,),
        None,
        phases=specs,
        eps=eps,
        final="cast",
        compute_dtype=compute_dtype,
        out_dtype=out_dtype,
        interpret=interpret,
    )
    return out[:b]

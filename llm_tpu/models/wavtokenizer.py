"""WavTokenizer decoder (audio codes -> waveform spectral frames).

Parity target: llm_build_wavtokenizer_dec
(/root/reference/src/llama-model.cpp:13780-13930) — code embeddings ->
conv1d -> posnet (resnet blocks + one self-attention block + group norms)
-> LayerNorm -> ConvNeXt blocks -> head; plus the ISTFT synthesis from
tools/tts/tts.cpp:201-281 (embd_to_audio: exp-magnitude + phase -> irfft,
Hann overlap-add with envelope normalization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import Keys
from ..quant.codecs import dequantize_tensor


def _conv1d_same(x, w, b, groups: int = 1):
    """x [T, Cin], w [Cout, Cin/groups, K] -> [T, Cout] with same padding
    (ggml_conv_1d_ph stride 1)."""
    k = w.shape[-1]
    pad = k // 2
    lhs = x.T[None]  # [1, Cin, T]
    out = jax.lax.conv_general_dilated(
        lhs.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )[0].T  # [T, Cout]
    return out + b.astype(jnp.float32)


def _group_norm(x, w, b, n_groups: int, eps: float):
    """x [T, C]: GroupNorm over channel groups (stats over time x group
    channels — ggml_group_norm semantics)."""
    T, C = x.shape
    g = x.reshape(T, n_groups, C // n_groups)
    mu = g.mean(axis=(0, 2), keepdims=True)
    var = ((g - mu) ** 2).mean(axis=(0, 2), keepdims=True)
    g = (g - mu) / jnp.sqrt(var + eps)
    x = g.reshape(T, C)
    return x * w.astype(jnp.float32) + b.astype(jnp.float32)


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w.astype(jnp.float32) + b.astype(jnp.float32)


def load_wavtokenizer(reader):
    """Load the decoder's tensors/hparams into a plain dict (all f32)."""
    a = reader.architecture

    def t(name):
        ti = reader.tensors[name]
        arr = np.asarray(dequantize_tensor(reader.data(name), ti.ggml_type,
                                           ti.shape), np.float32)
        return jnp.asarray(arr.reshape(tuple(reversed(ti.shape))))

    def key(k, d=None):
        return reader.akey(k, d)

    cfg = {
        "n_embd_features": int(key("{arch}.features_length", 512)),
        "n_posnet": int(key("{arch}.posnet.block_count", 6)),
        "posnet_embd": int(key("{arch}.posnet.embedding_length", 768)),
        "n_convnext": int(key("{arch}.convnext.block_count", 12)),
        "convnext_embd": int(key("{arch}.convnext.embedding_length", 768)),
        "ln_eps": float(key(Keys.Attention.LAYERNORM_EPS, 1e-6) or 1e-6),
        "gn_eps": float(key("{arch}.attention.group_norm_epsilon", 1e-6) or 1e-6),
        "gn_groups": int(key("{arch}.attention.group_norm_groups", 32) or 32),
    }
    p = {"cfg": cfg, "tok_embd": t("token_embd.weight"),
         "conv1d": t("conv1d.weight"), "conv1d_b": t("conv1d.bias"),
         "tok_norm": t("token_embd_norm.weight"),
         "tok_norm_b": t("token_embd_norm.bias"),
         "output_norm": t("output_norm.weight"),
         "output_norm_b": t("output_norm.bias"),
         "output": t("output.weight"), "output_b": t("output.bias")}
    p["posnet"] = []
    for il in range(cfg["n_posnet"]):
        lay = {}
        for base in ("norm1", "norm2", "conv1", "conv2", "norm", "attn_norm",
                     "attn_q", "attn_k", "attn_v", "attn_output"):
            nm = f"posnet.{il}.{base}"
            if nm + ".weight" in reader.tensors:
                lay[base] = t(nm + ".weight")
                lay[base + "_b"] = t(nm + ".bias")
        p["posnet"].append(lay)
    p["convnext"] = []
    for il in range(cfg["n_convnext"]):
        lay = {}
        for base in ("dw", "norm", "pw1", "pw2"):
            nm = f"convnext.{il}.{base}"
            lay[base] = t(nm + ".weight")
            lay[base + "_b"] = t(nm + ".bias")
        lay["gamma"] = t(f"convnext.{il}.gamma.weight")
        p["convnext"].append(lay)
    return p


def wavtok_decode(p: dict, codes: jnp.ndarray) -> jnp.ndarray:
    """codes [T] int32 -> spectral frames [T, n_out] f32 (the decoder
    forward; n_out = n_fft + 2 packed [log-mag | phase])."""
    cfg = p["cfg"]
    eps, geps, groups = cfg["ln_eps"], cfg["gn_eps"], cfg["gn_groups"]
    x = jnp.take(p["tok_embd"], codes, axis=0)  # [T, feat]
    x = _conv1d_same(x, p["conv1d"], p["conv1d_b"])

    for il, lay in enumerate(p["posnet"]):
        inp = x
        if "attn_q" in lay:  # attention block
            h = _group_norm(x, lay["attn_norm"], lay["attn_norm_b"], groups, geps)
            q = _conv1d_same(h, lay["attn_q"], lay["attn_q_b"])
            k = _conv1d_same(h, lay["attn_k"], lay["attn_k_b"])
            v = _conv1d_same(h, lay["attn_v"], lay["attn_v_b"])
            scores = (q @ k.T) / jnp.sqrt(float(x.shape[-1]))
            att = jax.nn.softmax(scores, axis=-1) @ v
            x = inp + _conv1d_same(att, lay["attn_output"],
                                   lay["attn_output_b"])
        elif "conv1" in lay:  # resnet block
            h = _group_norm(x, lay["norm1"], lay["norm1_b"], groups, geps)
            h = h * jax.nn.sigmoid(h)
            h = _conv1d_same(h, lay["conv1"], lay["conv1_b"])
            h = _group_norm(h, lay["norm2"], lay["norm2_b"], groups, geps)
            h = h * jax.nn.sigmoid(h)
            x = inp + _conv1d_same(h, lay["conv2"], lay["conv2_b"])
        else:  # final group norm
            x = _group_norm(x, lay["norm"], lay["norm_b"], groups, geps)

    x = _ln(x, p["tok_norm"], p["tok_norm_b"], eps)
    for lay in p["convnext"]:
        h = _conv1d_same(x, lay["dw"], lay["dw_b"], groups=x.shape[-1])
        h = _ln(h, lay["norm"], lay["norm_b"], eps)
        h = jax.nn.gelu(h @ lay["pw1"].T.astype(jnp.float32)
                        + lay["pw1_b"], approximate=False)
        h = h @ lay["pw2"].T.astype(jnp.float32) + lay["pw2_b"]
        x = x + h * lay["gamma"].astype(jnp.float32)

    x = _ln(x, p["output_norm"], p["output_norm_b"], eps)
    return x @ p["output"].T.astype(jnp.float32) + p["output_b"]


def embd_to_audio(embd: np.ndarray, n_fft: int = 1280,
                  n_hop: int = 320) -> np.ndarray:
    """Spectral frames [T, n_fft+2] -> waveform (tts.cpp embd_to_audio:
    exp-magnitude (clipped 1e2) + phase -> irfft per frame, Hann window
    overlap-add, envelope normalization)."""
    embd = np.asarray(embd, np.float64)
    n_codes, n_embd = embd.shape
    half = n_embd // 2
    mag = np.minimum(np.exp(embd[:, :half]), 1e2)
    phi = embd[:, half:]
    spec = mag * (np.cos(phi) + 1j * np.sin(phi))  # [T, n_fft/2 + 1]
    frames = np.fft.irfft(spec, n=n_fft, axis=1)  # [T, n_fft]

    hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    frames = frames * hann
    env_frame = hann * hann

    n_win = n_fft
    n_pad = (n_win - n_hop) // 2
    n_out = (n_codes - 1) * n_hop + n_win
    audio = np.zeros(n_out)
    env = np.zeros(n_out)
    for l in range(n_codes):
        o = l * n_hop
        audio[o:o + n_win] += frames[l]
        env[o:o + n_win] += env_frame
    audio = audio[n_pad:-n_pad] / np.maximum(env[n_pad:-n_pad], 1e-8)
    return audio.astype(np.float32)

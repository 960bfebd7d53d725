"""Whisper-style audio encoder + mel frontend (mtmd audio path).

Parity target: the reference's audio pipeline
(/root/reference/tools/mtmd/mtmd-audio.cpp — whisper log-mel frontend —
and clip.cpp build_whisper_enc:1431-1530): two GELU conv1d layers (second
stride 2), learned/sinusoidal position embeddings, pre-LN transformer
blocks (k-projection without bias), post-LN, then the qwen2a fc projector
or the ultravox stacked-SwiGLU projector.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.codecs import dequantize_tensor

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160


def mel_filterbank(n_mels: int, n_fft: int = N_FFT, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-scale mel filterbank (librosa defaults — what whisper ships)."""

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = 3.0 * f / 200.0
        log_region = f >= 1000.0
        mel = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0)
                       / (np.log(6.4) / 27.0), mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = 200.0 * m / 3.0
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
        return f

    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2))
    fb = np.zeros((n_mels, len(fft_freqs)))
    for i in range(n_mels):
        lo, ctr, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        # slaney normalization: constant energy per band
        fb[i] *= 2.0 / (hi - lo)
    return fb.astype(np.float32)


def log_mel_spectrogram(audio: np.ndarray, n_mels: int = 80,
                        pad_to_chunk: bool = False) -> np.ndarray:
    """PCM f32 (16 kHz mono) -> whisper log-mel [n_mels, n_frames]
    (mtmd-audio.cpp / WhisperFeatureExtractor semantics: hann window,
    reflect padding, log10, max-8dB floor, (x+4)/4)."""
    audio = np.asarray(audio, np.float32).reshape(-1)
    if pad_to_chunk:
        chunk = 30 * SAMPLE_RATE
        audio = np.pad(audio, (0, (-len(audio)) % chunk))
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float64)
    padded = np.pad(audio.astype(np.float64), N_FFT // 2, mode="reflect")
    n_frames = 1 + (len(padded) - N_FFT) // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = padded[idx] * window
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2  # [n_frames, n_fft/2+1]
    spec = spec[:-1] if n_frames > 1 else spec  # whisper drops the last frame
    mel = mel_filterbank(n_mels) @ spec.T  # [n_mels, n_frames]
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


@dataclass(frozen=True)
class AudioConfig:
    n_mels: int
    n_embd: int
    n_layers: int
    n_heads: int
    n_ff: int
    eps: float = 1e-5
    projector: str = "qwen2a"  # or "ultravox"
    stack_factor: int = 8


def audio_config_from_gguf(reader) -> AudioConfig:
    def g(key, default=None):
        v = reader.get(key, default)
        return v.item() if hasattr(v, "item") else v

    return AudioConfig(
        n_mels=int(g("clip.audio.num_mel_bins", 80)),
        n_embd=int(g("clip.audio.embedding_length", 768)),
        n_layers=int(g("clip.audio.block_count", 12)),
        n_heads=int(g("clip.audio.attention.head_count", 12)),
        n_ff=int(g("clip.audio.feed_forward_length", 3072)),
        eps=float(g("clip.audio.attention.layer_norm_epsilon", 1e-5)),
        projector=str(g("clip.projector_type", "qwen2a")),
        stack_factor=int(g("clip.audio.projector.stack_factor", 8)),
    )


def load_audio_params(reader) -> dict:
    cfg = audio_config_from_gguf(reader)
    names = set(reader.tensors)

    def d(name, dtype=jnp.float32):
        ti = reader.tensors[name]
        return jnp.asarray(
            dequantize_tensor(reader.data(name), ti.ggml_type, ti.shape), dtype)

    p: dict = {"layers": [{} for _ in range(cfg.n_layers)]}

    def opt(dst, key, name):
        if name in names:
            dst[key] = d(name)

    for i in (1, 2):
        opt(p, f"conv{i}", f"a.conv1d.{i}.weight")  # ne (k, in, out)->np [out,in,k]
        opt(p, f"conv{i}_b", f"a.conv1d.{i}.bias")
    p["pos_embd"] = d("a.position_embd.weight")
    opt(p, "post_ln", "a.post_ln.weight")
    opt(p, "post_ln_b", "a.post_ln.bias")
    for il in range(cfg.n_layers):
        L = p["layers"][il]
        for key, base in (
            ("attn_q", "attn_q"), ("attn_k", "attn_k"), ("attn_v", "attn_v"),
            ("attn_out", "attn_out"), ("ffn_up", "ffn_up"),
            ("ffn_down", "ffn_down"), ("ln1", "ln1"), ("ln2", "ln2"),
        ):
            opt(L, key, f"a.blk.{il}.{base}.weight")
            opt(L, key + "_b", f"a.blk.{il}.{base}.bias")
    # projectors
    opt(p, "mm_fc", "mm.a.fc.weight")
    opt(p, "mm_fc_b", "mm.a.fc.bias")
    opt(p, "mm_1", "mm.a.mlp.1.weight")
    opt(p, "mm_2", "mm.a.mlp.2.weight")
    opt(p, "mm_norm_pre", "mm.a.norm_pre.weight")
    opt(p, "mm_norm_mid", "mm.a.norm_mid.weight")
    return p


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    out = (xf - mu) / jnp.sqrt(var + eps)
    return out * w + b


def _conv1d(x, w, b, stride):
    """x [T, Cin]; w [Cout, Cin, k] (k=3, pad 1) -> [T//stride, Cout]."""
    k = w.shape[-1]
    xp = jnp.pad(x, ((k // 2, k // 2), (0, 0)))
    T = x.shape[0]
    outs = []
    for t0 in range(k):
        outs.append(xp[t0:t0 + T:stride] @ w[:, :, t0].T)
    n = min(o.shape[0] for o in outs)
    return sum(o[:n] for o in outs) + b


def _rms(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps) * w


def whisper_encode(params: dict, cfg: AudioConfig, mel: jnp.ndarray):
    """mel [n_mels, n_frames] -> projected audio embeddings [n_tokens, E_llm]."""
    x = mel.T.astype(jnp.float32)  # [T, n_mels]
    gelu = lambda v: jax.nn.gelu(v, approximate=False)
    x = gelu(_conv1d(x, params["conv1"], params["conv1_b"], 1))
    x = gelu(_conv1d(x, params["conv2"], params["conv2_b"], 2))
    n_pos = x.shape[0]
    x = x + params["pos_embd"][:n_pos]

    H = cfg.n_heads
    D = cfg.n_embd // H
    scale = D ** -0.5
    for L in params["layers"]:
        h = _ln(x, L["ln1"], L["ln1_b"], cfg.eps)
        q = (h @ L["attn_q"].T + L["attn_q_b"]).reshape(-1, H, D)
        k = (h @ L["attn_k"].T).reshape(-1, H, D)  # whisper: k has no bias
        v = (h @ L["attn_v"].T + L["attn_v_b"]).reshape(-1, H, D)
        att = jax.nn.softmax(jnp.einsum("qhd,khd->hqk", q * scale, k), axis=-1)
        o = jnp.einsum("hqk,khd->qhd", att, v).reshape(-1, H * D)
        x = x + (o @ L["attn_out"].T + L["attn_out_b"])
        h2 = _ln(x, L["ln2"], L["ln2_b"], cfg.eps)
        x = x + (gelu(h2 @ L["ffn_up"].T + L["ffn_up_b"]) @ L["ffn_down"].T
                 + L["ffn_down_b"])

    x = _ln(x, params["post_ln"], params["post_ln_b"], cfg.eps)

    if "mm_fc" in params:  # qwen2a: single fc
        return x @ params["mm_fc"].T + params.get("mm_fc_b", 0.0)
    if "mm_1" in params:  # ultravox: stack frames + SwiGLU MLP
        sf = cfg.stack_factor
        n = x.shape[0]
        pad = (-n) % sf
        x = jnp.pad(x, ((0, pad), (0, 0)))
        x = x.reshape(-1, cfg.n_embd * sf)
        x = _rms(x, params["mm_norm_pre"])
        x = x @ params["mm_1"].T
        half = x.shape[-1] // 2
        x = jax.nn.silu(x[:, half:]) * x[:, :half]  # swiglu_swapped
        x = _rms(x, params["mm_norm_mid"])
        return x @ params["mm_2"].T
    return x

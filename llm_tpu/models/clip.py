"""CLIP/SigLIP vision encoder + multimodal projector (mmproj GGUF).

Parity target: the reference's clip.cpp ViT graph builder
(/root/reference/tools/mtmd/clip.cpp; tensor/key names clip-impl.h:19-96):
patch conv embedding (+ optional class token), learned position embeddings,
pre-LN, N transformer blocks (LN1 -> MHA with biases -> residual; LN2 ->
MLP GELU -> residual, optional layer-scale), post-LN, then a projector into
the language model's embedding space (llava-style "mm" 2-layer MLP, or the
single-matrix idefics3/gemma3 projections).

The encoder is a pure jittable function over [n_patches, ...] — no KV
cache, full bidirectional attention.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..quant.codecs import dequantize_tensor


@dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int
    patch_size: int
    n_embd: int
    n_layers: int
    n_heads: int
    n_ff: int
    proj_dim: int
    eps: float = 1e-5
    use_gelu: bool = True  # False -> quick-gelu (original CLIP)
    use_silu: bool = False
    projector: str = "mlp"  # llava mm.0/mm.2
    window_size: int = 0  # qwen2.5vl window attention
    n_wa_pattern: int = 0  # every n-th block is full-attention
    proj_scale_factor: int = 0  # idefics3/internvl pixel-shuffle factor
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)
    has_class_embd: bool = True

    @property
    def n_patches_per_side(self) -> int:
        return self.image_size // self.patch_size


def _g(reader, key, default=None):
    v = reader.get(key, default)
    if isinstance(v, np.generic):
        v = v.item()
    return v


def clip_config_from_gguf(reader) -> ClipVisionConfig:
    mean = _g(reader, "clip.vision.image_mean")
    std = _g(reader, "clip.vision.image_std")
    return ClipVisionConfig(
        image_size=int(_g(reader, "clip.vision.image_size", 224)),
        patch_size=int(_g(reader, "clip.vision.patch_size", 14)),
        n_embd=int(_g(reader, "clip.vision.embedding_length", 1024)),
        n_layers=int(_g(reader, "clip.vision.block_count", 24)),
        n_heads=int(_g(reader, "clip.vision.attention.head_count", 16)),
        n_ff=int(_g(reader, "clip.vision.feed_forward_length", 4096)),
        proj_dim=int(_g(reader, "clip.vision.projection_dim", 768)),
        eps=float(_g(reader, "clip.vision.attention.layer_norm_epsilon", 1e-5)),
        use_gelu=bool(_g(reader, "clip.use_gelu", True)),
        use_silu=bool(_g(reader, "clip.use_silu", False)),
        projector=str(_g(reader, "clip.projector_type", "mlp")),
        window_size=int(_g(reader, "clip.vision.window_size", 0) or 0),
        n_wa_pattern=int(_g(reader, "clip.vision.n_wa_pattern", 0) or 0),
        proj_scale_factor=int(
            _g(reader, "clip.vision.projector.scale_factor", 0) or 0),
        image_mean=tuple(np.asarray(mean, np.float32)) if mean is not None
        else ClipVisionConfig.image_mean,
        image_std=tuple(np.asarray(std, np.float32)) if std is not None
        else ClipVisionConfig.image_std,
        has_class_embd="v.class_embd" in reader.tensors,
    )


def _dense(reader, name, dtype=jnp.float32):
    ti = reader.tensors[name]
    arr = dequantize_tensor(reader.data(name), ti.ggml_type, ti.shape)
    return jnp.asarray(arr, dtype)


def load_clip_params(reader) -> dict:
    """mmproj GGUF -> params dict (dense f32; vision towers are small)."""
    cfg = clip_config_from_gguf(reader)
    p: dict = {"layers": [{} for _ in range(cfg.n_layers)]}
    names = set(reader.tensors)

    def opt(dst, key, name):
        if name in names:
            dst[key] = _dense(reader, name)

    # patch conv kernel ne=(ps, ps, 3, n_embd) -> numpy [n_embd, 3, ps, ps]
    p["patch_embd"] = _dense(reader, "v.patch_embd.weight")
    opt(p, "patch_bias", "v.patch_embd.bias")
    opt(p, "class_embd", "v.class_embd")
    opt(p, "pos_embd", "v.position_embd.weight")
    opt(p, "pre_ln", "v.pre_ln.weight")
    opt(p, "pre_ln_b", "v.pre_ln.bias")
    opt(p, "post_ln", "v.post_ln.weight")
    opt(p, "post_ln_b", "v.post_ln.bias")
    for il in range(cfg.n_layers):
        L = p["layers"][il]
        for key, base in (
            ("attn_q", "attn_q"), ("attn_k", "attn_k"), ("attn_v", "attn_v"),
            ("attn_out", "attn_out"), ("ffn_up", "ffn_up"),
            ("ffn_down", "ffn_down"), ("ffn_gate", "ffn_gate"),
        ):
            opt(L, key, f"v.blk.{il}.{base}.weight")
            opt(L, key + "_b", f"v.blk.{il}.{base}.bias")
        for key, base in (
            ("ln1", "ln1"), ("ln2", "ln2"), ("ls1", "ls1"), ("ls2", "ls2"),
            ("attn_q_norm", "attn_q_norm"), ("attn_k_norm", "attn_k_norm"),
        ):
            opt(L, key, f"v.blk.{il}.{base}.weight")
            opt(L, key + "_b", f"v.blk.{il}.{base}.bias")
    # llava projector mm.0 / mm.2 (TN_LLAVA_PROJ)
    for i in (0, 1, 2, 3):
        opt(p, f"mm_{i}", f"mm.{i}.weight")
        opt(p, f"mm_{i}_b", f"mm.{i}.bias")
    opt(p, "mm_input_projection", "mm.input_projection.weight")  # gemma3
    opt(p, "mm_soft_emb_norm", "mm.soft_emb_norm.weight")
    opt(p, "mm_projection", "mm.model.fc.weight")  # idefics3
    return p


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    out = (xf - mu) / jnp.sqrt(var + eps)
    if w is not None:
        out = out * w
    if b is not None:
        out = out + b
    return out


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + eps) * w


def _act(cfg: ClipVisionConfig, x):
    if cfg.use_silu:
        return jax.nn.silu(x)
    if cfg.use_gelu:
        return jax.nn.gelu(x, approximate=True)
    return x * jax.nn.sigmoid(1.702 * x)  # quick-gelu (original CLIP)


def patchify(image: np.ndarray, patch_size: int) -> np.ndarray:
    """image [3, H, W] f32 -> [n_patches, 3*ps*ps] rows matching the conv2d
    kernel layout [n_embd, 3, ps, ps]."""
    c, h, w = image.shape
    ph, pw = h // patch_size, w // patch_size
    x = image.reshape(c, ph, patch_size, pw, patch_size)
    x = x.transpose(1, 3, 0, 2, 4).reshape(ph * pw, c * patch_size * patch_size)
    return x


def clip_encode(params: dict, cfg: ClipVisionConfig, patches: jnp.ndarray):
    """patches [n_patches, 3*ps*ps] -> projected image embeddings
    [n_tokens, n_embd_llm]."""
    kernel = params["patch_embd"].reshape(params["patch_embd"].shape[0], -1)
    x = patches @ kernel.T  # [P, n_embd]
    if "patch_bias" in params:
        x = x + params["patch_bias"]
    if "class_embd" in params:
        x = jnp.concatenate([params["class_embd"][None, :], x], axis=0)
    if cfg.projector == "idefics3":
        # idefics3/SmolVLM NaViT-style embeddings bucketize fractional patch
        # coords into n_patches_per_side bins (HF Idefics3VisionEmbeddings):
        # bucket(i, n) = floor(i/n * (1-1e-6) * nps) — for a full-size image
        # this yields [0, 0, 1, ..., nps-2] per axis (bucket 0 reused, last
        # row of the table unused), NOT arange. Trained checkpoints expect
        # exactly this mapping.
        side = int(round(np.sqrt(x.shape[0])))
        nps = cfg.n_patches_per_side
        idx = np.floor(np.arange(side) / side * (1 - 1e-6) * nps).astype(np.int32)
        pos_ids = (idx[:, None] * nps + idx[None, :]).reshape(-1)
        x = x + params["pos_embd"][pos_ids]
    else:
        x = x + params["pos_embd"][: x.shape[0]]
    if "pre_ln" in params:
        x = _ln(x, params["pre_ln"], params.get("pre_ln_b"), cfg.eps)

    H = cfg.n_heads
    D = cfg.n_embd // H
    scale = D ** -0.5
    for L in params["layers"]:
        h = _ln(x, L.get("ln1"), L.get("ln1_b"), cfg.eps)
        q = h @ L["attn_q"].T + L.get("attn_q_b", 0.0)
        k = h @ L["attn_k"].T + L.get("attn_k_b", 0.0)
        if "attn_q_norm" in L:
            # InternVL 6B-ViT qk RMS norm over the FULL hidden width,
            # applied before the head split (HF InternVLVisionAttention)
            q = _rms(q, L["attn_q_norm"], cfg.eps)
            k = _rms(k, L["attn_k_norm"], cfg.eps)
        q = q.reshape(-1, H, D)
        k = k.reshape(-1, H, D)
        v = (h @ L["attn_v"].T + L.get("attn_v_b", 0.0)).reshape(-1, H, D)
        att = jnp.einsum("qhd,khd->hqk", q * scale, k)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", att, v).reshape(-1, H * D)
        o = o @ L["attn_out"].T + L.get("attn_out_b", 0.0)
        if "ls1" in L:
            o = o * L["ls1"]
        x = x + o

        h2 = _ln(x, L.get("ln2"), L.get("ln2_b"), cfg.eps)
        up = h2 @ L["ffn_up"].T + L.get("ffn_up_b", 0.0)
        if "ffn_gate" in L:
            up = _act(cfg, h2 @ L["ffn_gate"].T + L.get("ffn_gate_b", 0.0)) * up
        else:
            up = _act(cfg, up)
        dn = up @ L["ffn_down"].T + L.get("ffn_down_b", 0.0)
        if "ls2" in L:
            dn = dn * L["ls2"]
        x = x + dn

    if "post_ln" in params:
        x = _ln(x, params["post_ln"], params.get("post_ln_b"), cfg.eps)

    if "class_embd" in params:
        x = x[1:]  # llava projects patch tokens only

    # projector
    if cfg.projector == "internvl":
        # InternVL: pixel-shuffle downsample then LN -> fc -> GELU -> fc
        # (HF InternVLModel.pixel_shuffle + InternVLMultiModalProjector;
        # clip.cpp build_internvl — mm.0 is a LayerNorm here, not a linear)
        s = cfg.proj_scale_factor
        seq, E = x.shape
        fs = int(np.sqrt(seq))
        x = x.reshape(fs, fs // s, E * s)
        x = jnp.swapaxes(x, 0, 1)
        x = x.reshape(fs // s, fs // s, E * s * s)
        x = jnp.swapaxes(x, 0, 1).reshape(seq // (s * s), E * s * s)
        x = _ln(x, params["mm_0"], params.get("mm_0_b"), 1e-5)
        x = x @ params["mm_1"].T + params.get("mm_1_b", 0.0)
        x = jax.nn.gelu(x, approximate=False)
        x = x @ params["mm_3"].T + params.get("mm_3_b", 0.0)
    elif "mm_0" in params:  # llava 2-layer MLP: mm.0 -> GELU -> mm.2
        x = x @ params["mm_0"].T + params.get("mm_0_b", 0.0)
        if "mm_2" in params:
            x = jax.nn.gelu(x, approximate=False)
            x = x @ params["mm_2"].T + params.get("mm_2_b", 0.0)
    elif "mm_input_projection" in params:  # gemma3-style single projection
        x = x @ params["mm_input_projection"]
    elif "mm_projection" in params:
        # idefics3: pixel shuffle then a single projection
        # (Idefics3Connector; clip.cpp build_siglip IDEFICS3 branch)
        s = cfg.proj_scale_factor
        seq, E = x.shape
        side = int(np.sqrt(seq))
        x = x.reshape(side, side // s, E * s)
        x = jnp.swapaxes(x, 0, 1)
        x = x.reshape(side // s, side // s, E * s * s)
        x = jnp.swapaxes(x, 0, 1).reshape(seq // (s * s), E * s * s)
        x = x @ params["mm_projection"].T
    return x


def preprocess_image(img, cfg: ClipVisionConfig) -> np.ndarray:
    """PIL image / [H, W, 3] uint8 -> normalized [3, S, S] f32 (bicubic
    resize to the encoder's native size; clip.cpp image_preprocess)."""
    from PIL import Image

    if not isinstance(img, Image.Image):
        img = Image.fromarray(np.asarray(img, np.uint8))
    img = img.convert("RGB").resize((cfg.image_size, cfg.image_size),
                                    Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0  # [H, W, 3]
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    arr = (arr - mean) / std
    return arr.transpose(2, 0, 1)

"""Qwen2-VL vision tower (ViT with 2-D rotary + 2x2 patch merger).

Parity target: the reference's qwen2vl mmproj graph
(/root/reference/tools/mtmd/clip.cpp:625-790 build_qwen2vl): dual-slice
patch conv (v.patch_embd.weight + .weight.1), pre-norm blocks with
rotate-half rope whose angle streams are the per-patch (h, w) grid
coordinates in 2x2-merge-block order, full attention, and the merger
projector (v.post_ln -> mm.0 -> GELU -> mm.1) collapsing each 2x2 block
of patches into one LM token. Semantics follow HF
Qwen2VisionTransformerPretrainedModel exactly (oracle-tested).

Input convention matches HF/llama.cpp: pixel patches are flattened
[N, C * temporal * P * P] rows already ordered in 2x2 blocks (the
processor's layout); grid_thw gives (t, h, w) in PATCH units.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .clip import ClipVisionConfig, _ln, load_clip_params


def _block_order_pos(h: int, w: int, merge: int = 2):
    """(h_idx, w_idx) per patch in 2x2-merge-block order
    (Qwen2VisionTransformer.rot_pos_emb permute trick)."""
    hh = np.arange(h)[:, None].repeat(w, 1)
    ww = np.arange(w)[None, :].repeat(h, 0)

    def blk(a):
        return (a.reshape(h // merge, merge, w // merge, merge)
                .transpose(0, 2, 1, 3).reshape(-1))

    return blk(hh), blk(ww)


def qwen2vl_vision_encode(params: dict, cfg: ClipVisionConfig,
                          patches: jnp.ndarray, grid_t: int, grid_h: int,
                          grid_w: int, temporal: int = 2,
                          merge: int = 2) -> jnp.ndarray:
    """patches [N, C*temporal*P*P] -> merged embeddings [N/merge^2, proj]."""
    f32 = jnp.float32
    E = cfg.n_embd
    H = cfg.n_heads
    D = E // H
    eps = cfg.eps
    P = cfg.patch_size
    N = patches.shape[0]

    # dual-slice patch conv == one matmul over the flattened kernel
    w0 = params["patch_embd"].astype(f32).reshape(E, -1)  # [E, C*P*P] (t=0)
    w1 = params["patch_embd_1"].astype(f32).reshape(E, -1)
    px = patches.astype(f32).reshape(N, -1, temporal, P * P)
    x0 = px[:, :, 0, :].reshape(N, -1)
    x1 = px[:, :, 1, :].reshape(N, -1)
    x = x0 @ w0.T + x1 @ w1.T  # [N, E]

    # 2-D rotary streams: angles from (h, w) grid coordinates
    hpos, wpos = _block_order_pos(grid_h, grid_w, merge)
    hpos = np.tile(hpos, grid_t)
    wpos = np.tile(wpos, grid_t)
    d2 = D // 2
    inv = 1.0 / (10000.0 ** (np.arange(0, d2, 2, dtype=np.float32) / d2))
    rot = np.concatenate([hpos[:, None] * inv, wpos[:, None] * inv], axis=1)
    emb = np.concatenate([rot, rot], axis=1)  # [N, D]
    cos = jnp.asarray(np.cos(emb), f32)[:, None, :]
    sin = jnp.asarray(np.sin(emb), f32)[:, None, :]

    def rope(t):  # rotate-half over the full head dim
        th = jnp.concatenate([-t[..., D // 2:], t[..., : D // 2]], axis=-1)
        return t * cos + th * sin

    scale = D ** -0.5
    for L in params["layers"]:
        h1 = _ln(x, L["ln1"], L.get("ln1_b"), eps)
        q = (h1 @ L["attn_q"].T.astype(f32) + L["attn_q_b"]).reshape(N, H, D)
        k = (h1 @ L["attn_k"].T.astype(f32) + L["attn_k_b"]).reshape(N, H, D)
        v = (h1 @ L["attn_v"].T.astype(f32) + L["attn_v_b"]).reshape(N, H, D)
        q, k = rope(q), rope(k)
        att = jax.nn.softmax(
            jnp.einsum("qhd,khd->hqk", q * scale, k), axis=-1)
        o = jnp.einsum("hqk,khd->qhd", att, v).reshape(N, E)
        x = x + (o @ L["attn_out"].T.astype(f32) + L["attn_out_b"])
        h2 = _ln(x, L["ln2"], L.get("ln2_b"), eps)
        up = h2 @ L["ffn_up"].T.astype(f32) + L["ffn_up_b"]
        if cfg.use_silu:
            up = jax.nn.silu(up)
        elif cfg.use_gelu:
            up = jax.nn.gelu(up, approximate=False)
        else:  # quick-gelu (Qwen2VL vision default)
            up = up * jax.nn.sigmoid(1.702 * up)
        x = x + (up @ L["ffn_down"].T.astype(f32) + L["ffn_down_b"])

    # merger: ln_q (stored as v.post_ln) -> [N/4, 4E] -> mm.0 -> GELU -> mm.1
    x = _ln(x, params["post_ln"], params.get("post_ln_b"), 1e-6)
    x = x.reshape(N // (merge * merge), -1)
    x = x @ params["mm_0"].T.astype(f32) + params["mm_0_b"]
    x = jax.nn.gelu(x, approximate=False)
    x = x @ params["mm_1"].T.astype(f32) + params["mm_1_b"]
    return x


def load_qwen2vl_vision(reader):
    """mmproj GGUF -> (params, cfg); reuses the clip tensor map plus the
    second patch-conv slice."""
    from .clip import _dense, clip_config_from_gguf

    cfg = clip_config_from_gguf(reader)
    p = load_clip_params(reader)
    p["patch_embd_1"] = _dense(reader, "v.patch_embd.weight.1")
    return p, cfg


def qwen2vl_mrope_positions(n_pre: int, grid_t: int, grid_h: int,
                            grid_w: int, n_post: int, merge: int = 2,
                            pos_start: int = 0):
    """(t, h, w, e) position 4-vectors for a text+image+text sequence —
    the Qwen2VLModel.get_rope_index algorithm: text advances all streams
    together; an image block holds t constant while h/w walk the MERGED
    grid; the following text resumes at max(all streams) + 1.

    Returns (mpos list over pre+image+post tokens, next_pos)."""
    out = []
    p = pos_start
    for i in range(n_pre):
        out.append((p + i, p + i, p + i, 0))
    t0 = p + n_pre
    mh, mw = grid_h // merge, grid_w // merge
    for tt in range(grid_t):
        for hh in range(mh):
            for ww in range(mw):
                out.append((t0 + tt, t0 + hh, t0 + ww, 0))
    nxt = t0 + max(grid_t, mh, mw)
    for i in range(n_post):
        out.append((nxt + i, nxt + i, nxt + i, 0))
    return out, nxt + n_post

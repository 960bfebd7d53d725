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


def _window_index(grid_t, gh_llm, gw_llm, win):
    """Window-partition order over the MERGED grid + per-token window ids
    (Qwen2_5_VisionTransformer.get_window_index)."""
    idx = np.arange(grid_t * gh_llm * gw_llm).reshape(grid_t, gh_llm, gw_llm)
    pad_h = (-gh_llm) % win
    pad_w = (-gw_llm) % win
    padded = np.full((grid_t, gh_llm + pad_h, gw_llm + pad_w), -100)
    padded[:, :gh_llm, :gw_llm] = idx
    nh, nw = (gh_llm + pad_h) // win, (gw_llm + pad_w) // win
    padded = padded.reshape(grid_t, nh, win, nw, win)         .transpose(0, 1, 3, 2, 4).reshape(grid_t, nh * nw, win, win)
    wids = np.repeat(np.arange(grid_t * nh * nw),
                     (padded != -100).reshape(grid_t * nh * nw, -1).sum(1))
    flat = padded.reshape(-1)
    return flat[flat != -100], wids


def qwen2vl_vision_encode(params: dict, cfg: ClipVisionConfig,
                          patches: jnp.ndarray, grid_t: int, grid_h: int,
                          grid_w: int, temporal: int = 2,
                          merge: int = 2) -> jnp.ndarray:
    """patches [N, C*temporal*P*P] -> merged embeddings [N/merge^2, proj].

    Handles both towers: qwen2vl_merger (LayerNorm, quick-gelu MLP, full
    attention) and qwen2.5vl_merger (RMSNorm, gated-silu MLP, window
    attention except full_attn_block_indexes — clip.cpp build_qwen2vl
    use_window_attn branches)."""
    f32 = jnp.float32
    E = cfg.n_embd
    H = cfg.n_heads
    D = E // H
    eps = cfg.eps
    P = cfg.patch_size
    N = patches.shape[0]
    # "qwen2.5o" is the Qwen2.5-Omni combined mmproj: its vision tower is
    # the 2.5-VL one (clip.cpp:2088 resolves QWEN25O -> QWEN25VL for images)
    q25 = cfg.projector in ("qwen2.5vl_merger", "qwen2.5o")

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

    # qwen2.5: window-attention reorder (merge-unit groups) + masks
    attn_bias_win = None
    fullatt = ()
    if q25:
        win = max(1, cfg.window_size // merge // P)
        mh, mw = grid_h // merge, grid_w // merge
        widx, wids = _window_index(grid_t, mh, mw, win)
        unit = merge * merge
        order = (widx[:, None] * unit + np.arange(unit)[None, :]).reshape(-1)
        x = x[jnp.asarray(order)]
        cos = cos[jnp.asarray(order)]
        sin = sin[jnp.asarray(order)]
        tok_wid = np.repeat(wids, unit)
        attn_bias_win = jnp.asarray(
            np.where(tok_wid[:, None] == tok_wid[None, :], 0.0, -np.inf),
            f32)
        # every n_wa_pattern-th block runs full attention (KEY_WIN_ATTN_PATTERN)
        pat = cfg.n_wa_pattern
        fullatt = {i for i in range(cfg.n_layers)
                   if pat > 0 and (i + 1) % pat == 0}

    def rope(t):  # rotate-half over the full head dim
        th = jnp.concatenate([-t[..., D // 2:], t[..., : D // 2]], axis=-1)
        return t * cos + th * sin

    def norm(t, w, b):
        if q25:  # RMSNorm
            tf = t.astype(f32)
            return tf / jnp.sqrt((tf ** 2).mean(-1, keepdims=True) + eps) \
                * w.astype(f32)
        return _ln(t, w, b, eps)

    scale = D ** -0.5
    for il, L in enumerate(params["layers"]):
        h1 = norm(x, L["ln1"], L.get("ln1_b"))
        q = (h1 @ L["attn_q"].T.astype(f32) + L["attn_q_b"]).reshape(N, H, D)
        k = (h1 @ L["attn_k"].T.astype(f32) + L["attn_k_b"]).reshape(N, H, D)
        v = (h1 @ L["attn_v"].T.astype(f32) + L["attn_v_b"]).reshape(N, H, D)
        q, k = rope(q), rope(k)
        scores = jnp.einsum("qhd,khd->hqk", q * scale, k)
        if attn_bias_win is not None and il not in fullatt:
            scores = scores + attn_bias_win
        att = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", att, v).reshape(N, E)
        x = x + (o @ L["attn_out"].T.astype(f32) + L["attn_out_b"])
        h2 = norm(x, L["ln2"], L.get("ln2_b"))
        if "ffn_gate" in L:  # qwen2.5: gated silu
            up = (jax.nn.silu(h2 @ L["ffn_gate"].T.astype(f32)
                              + L["ffn_gate_b"])
                  * (h2 @ L["ffn_up"].T.astype(f32) + L["ffn_up_b"]))
        else:
            up = h2 @ L["ffn_up"].T.astype(f32) + L["ffn_up_b"]
            if cfg.use_silu:
                up = jax.nn.silu(up)
            elif cfg.use_gelu:
                up = jax.nn.gelu(up, approximate=False)
            else:  # quick-gelu (Qwen2VL vision default)
                up = up * jax.nn.sigmoid(1.702 * up)
        x = x + (up @ L["ffn_down"].T.astype(f32) + L["ffn_down_b"])

    # merger: ln_q (stored as v.post_ln) -> [N/4, 4E] -> mm.0 -> GELU -> mm.1
    if q25:
        xf = x.astype(f32)
        x = xf / jnp.sqrt((xf ** 2).mean(-1, keepdims=True) + 1e-6) \
            * params["post_ln"].astype(f32)
    else:
        x = _ln(x, params["post_ln"], params.get("post_ln_b"), 1e-6)
    x = x.reshape(N // (merge * merge), -1)
    x = x @ params["mm_0"].T.astype(f32) + params["mm_0_b"]
    x = jax.nn.gelu(x, approximate=False)
    x = x @ params["mm_1"].T.astype(f32) + params["mm_1_b"]
    if q25:  # undo the window-partition reorder (merged-token order)
        x = x[jnp.asarray(np.argsort(widx))]
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

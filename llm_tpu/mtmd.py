"""Multimodal runtime: text+image chunking and evaluation.

Parity target: the reference's mtmd API
(/root/reference/tools/mtmd/mtmd.h:193-205 — mtmd_tokenize splits input
text on the image marker into text/image chunks, mtmd_encode runs the
vision tower, helper eval loops feed chunks into the LLM) and
llama-mtmd-cli. The default marker matches the reference's
mtmd_default_marker() "<__media__>" (plus the legacy "<image>")."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

MARKERS = ("<__media__>", "<__image__>", "<image>")


@dataclass
class Chunk:
    kind: str  # "text" | "image" | "audio"
    tokens: list[int] | None = None
    image: object | None = None  # PIL image / array
    audio: object | None = None  # PCM f32 @ 16 kHz


def tokenize_chunks(tok, text: str, media: list, add_special: bool = True,
                    marker: str | None = None) -> list[Chunk]:
    """Split prompt text on media markers into interleaved chunks
    (mtmd_tokenize semantics). `media` entries are PIL images / arrays
    (image) or 1-D float PCM arrays (audio)."""
    import numpy as np

    mk = marker or next((m for m in MARKERS if m in text), MARKERS[0])
    parts = text.split(mk)
    if len(parts) - 1 != len(media):
        raise ValueError(
            f"prompt has {len(parts) - 1} media markers but {len(media)} items")
    chunks: list[Chunk] = []
    for i, part in enumerate(parts):
        toks = tok.encode(part, add_special=add_special and i == 0,
                          parse_special=True)
        if toks:
            chunks.append(Chunk("text", tokens=toks))
        if i < len(media):
            m = media[i]
            arr = np.asarray(m) if not hasattr(m, "convert") else None
            if arr is not None and arr.ndim == 1:
                chunks.append(Chunk("audio", audio=m))
            else:
                chunks.append(Chunk("image", image=m))
    return chunks


class MultimodalRuntime:
    """Vision/audio tower + LLM context glue (mtmd helper eval loop)."""

    def __init__(self, ctx, tok, mmproj_reader):
        import jax

        from .models.clip import (clip_config_from_gguf, clip_encode,
                                  load_clip_params)

        self.ctx = ctx
        self.tok = tok
        self.clip_cfg = self.clip_params = self._encode = None
        self.audio_cfg = self.audio_params = self._encode_audio = None
        has_vision = bool(mmproj_reader.get("clip.has_vision_encoder", False)) \
            or "v.patch_embd.weight" in mmproj_reader.tensors
        self.is_qwen2vl = (str(mmproj_reader.get("clip.projector_type", ""))
                           == "qwen2vl_merger")
        if self.is_qwen2vl:
            from .models.qwen2vl_vision import load_qwen2vl_vision

            self.clip_params, self.clip_cfg = load_qwen2vl_vision(mmproj_reader)
        elif has_vision:
            self.clip_cfg = clip_config_from_gguf(mmproj_reader)
            self.clip_params = load_clip_params(mmproj_reader)
            self._encode = jax.jit(
                lambda patches: clip_encode(self.clip_params, self.clip_cfg, patches)
            )
        if bool(mmproj_reader.get("clip.has_audio_encoder", False)):
            from .models.audio import audio_config_from_gguf, load_audio_params, whisper_encode

            self.audio_cfg = audio_config_from_gguf(mmproj_reader)
            self.audio_params = load_audio_params(mmproj_reader)
            self._encode_audio = jax.jit(
                lambda mel: whisper_encode(self.audio_params, self.audio_cfg, mel)
            )

    def encode_image(self, img) -> np.ndarray:
        """image -> [n_tokens, n_embd_llm] projected embeddings."""
        from .models.clip import patchify, preprocess_image

        if self.is_qwen2vl:
            emb, _ = self.encode_image_qwen2vl(img)
            return emb
        arr = preprocess_image(img, self.clip_cfg)
        patches = patchify(arr, self.clip_cfg.patch_size)
        return np.asarray(self._encode(patches))

    def encode_image_qwen2vl(self, img):
        """image -> (embeddings [n_tokens, n_embd_llm], (t, h, w) PATCH
        grid). Dynamic resolution: the image is resized to multiples of
        patch*merge on both sides (Qwen2VLImageProcessor smart-resize
        semantics, simplified), patches ordered in 2x2 merge blocks with
        the temporal dim duplicated."""
        import jax.numpy as jnp

        from .models.qwen2vl_vision import qwen2vl_vision_encode

        cfg = self.clip_cfg
        P, merge, temporal = cfg.patch_size, 2, 2
        arr = np.asarray(img, np.float32)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        if arr.max() > 1.5:
            arr = arr / 255.0
        unit = P * merge
        H = max(unit, int(round(arr.shape[0] / unit)) * unit)
        W = max(unit, int(round(arr.shape[1] / unit)) * unit)
        # nearest-neighbor resize (tiny towers; parity covered by the
        # direct-patch oracle — preprocessing is bilinear in the reference)
        yi = np.clip((np.arange(H) + 0.5) * arr.shape[0] / H, 0,
                     arr.shape[0] - 1).astype(int)
        xi = np.clip((np.arange(W) + 0.5) * arr.shape[1] / W, 0,
                     arr.shape[1] - 1).astype(int)
        arr = arr[yi][:, xi]
        mean = np.asarray(cfg.image_mean, np.float32)
        std = np.asarray(cfg.image_std, np.float32)
        arr = (arr - mean) / std
        gh, gw = H // P, W // P
        # [H, W, C] -> patches in merge-block order, temporal duplicated
        x = arr.transpose(2, 0, 1).reshape(3, gh // merge, merge, P,
                                           gw // merge, merge, P)
        x = x.transpose(1, 4, 2, 5, 0, 3, 6)  # [bh, bw, my, mx, C, P, P]
        x = x.reshape(gh * gw, 3, 1, P, P)
        x = np.repeat(x, temporal, axis=2)  # duplicate temporal slice
        patches = x.reshape(gh * gw, -1)
        emb = np.asarray(qwen2vl_vision_encode(
            self.clip_params, cfg, jnp.asarray(patches), 1, gh, gw))
        return emb, (1, gh, gw)

    def encode_audio(self, pcm) -> np.ndarray:
        """16 kHz PCM -> [n_tokens, n_embd_llm] projected embeddings."""
        from .models.audio import log_mel_spectrogram

        mel = log_mel_spectrogram(np.asarray(pcm, np.float32),
                                  n_mels=self.audio_cfg.n_mels)
        return np.asarray(self._encode_audio(jnp.asarray(mel)))

    def eval_chunks(self, chunks: list[Chunk], seq_id: int = 0) -> int:
        """Feed chunks into the LLM cache in order; returns the rc of the
        last decode (logits available for the final text chunk)."""
        from .runtime.batch import Batch

        rc = 0
        if self.is_qwen2vl:
            return self._eval_chunks_mrope(chunks, seq_id)
        for ch in chunks:
            if ch.kind == "text":
                pos0 = self.ctx.seq_pos_max(seq_id) + 1
                rc = self.ctx.decode(
                    Batch.text(ch.tokens, seq_id=seq_id, pos_start=pos0))
            elif ch.kind == "audio":
                emb = self.encode_audio(ch.audio)
                rc = self.ctx.decode_embd(emb, seq_id=seq_id)
            else:
                emb = self.encode_image(ch.image)
                rc = self.ctx.decode_embd(emb, seq_id=seq_id)
            if rc != 0:
                return rc
        return rc

    def _eval_chunks_mrope(self, chunks: list, seq_id: int = 0) -> int:
        """qwen2vl: primary cache positions are the running sequence index
        (index-causality); rope rides the (t, h, w) M-RoPE streams
        (Qwen2VLModel.get_rope_index semantics via
        qwen2vl_mrope_positions)."""
        from .models.qwen2vl_vision import qwen2vl_mrope_positions
        from .runtime.batch import Batch

        rc = 0
        idx = self.ctx.seq_pos_max(seq_id) + 1  # running sequence index
        tpos = idx  # next text-stream position
        for ch in chunks:
            if ch.kind == "text":
                b = Batch()
                n = len(ch.tokens)
                for i, t in enumerate(ch.tokens):
                    p = tpos + i
                    b.add(t, pos=idx + i, seq_ids=(seq_id,),
                          logits=i == n - 1, mpos=(p, p, p, 0))
                rc = self.ctx.decode(b)
                idx += n
                tpos += n
            elif ch.kind == "image":
                emb, (gt, gh, gw) = self.encode_image_qwen2vl(ch.image)
                mpos, nxt = qwen2vl_mrope_positions(
                    0, gt, gh, gw, 0, pos_start=tpos)
                rc = self.ctx.decode_embd(
                    emb, seq_id=seq_id, pos_start=idx,
                    mpos=np.asarray(mpos, np.int32))
                idx += emb.shape[0]
                tpos = nxt
            else:
                raise ValueError("qwen2vl mtmd supports text+image chunks")
            if rc != 0:
                return rc
        return rc

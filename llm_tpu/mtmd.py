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
        if has_vision:
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

        arr = preprocess_image(img, self.clip_cfg)
        patches = patchify(arr, self.clip_cfg.patch_size)
        return np.asarray(self._encode(patches))

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

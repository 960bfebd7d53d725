"""llm-tpu-tts: text -> speech via OuteTTS-style LM + WavTokenizer vocoder.

Parity target: llama-tts (/root/reference/tools/tts/tts.cpp): an OuteTTS
language model turns the prompt into audio-codebook tokens
(<|code_N|> ids offset by 151672), the WavTokenizer decoder turns codes
into spectral frames, and Hann-windowed ISTFT overlap-add produces the
waveform (24 kHz mono WAV).
"""

from __future__ import annotations

import struct
import sys

CODE_TOKEN_OFFSET = 151672  # tts.cpp: first <|code_0|> id
SAMPLE_RATE = 24000


def write_wav(path: str, audio, sample_rate: int = SAMPLE_RATE) -> None:
    import numpy as np

    pcm = np.clip(np.asarray(audio) * 32767.0, -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                      sample_rate * 2, 2, 16))
        f.write(b"data" + struct.pack("<I", len(data)) + data)


def main(argv=None):
    import argparse

    import numpy as np

    from ..gguf.reader import GGUFReader
    from ..models.wavtokenizer import (embd_to_audio, load_wavtokenizer,
                                       wavtok_decode)

    ap = argparse.ArgumentParser(description="text to speech")
    ap.add_argument("-mv", "--model-vocoder", required=True,
                    help="WavTokenizer decoder GGUF")
    ap.add_argument("-m", "--model", default=None,
                    help="OuteTTS LM GGUF (omit with --codes)")
    ap.add_argument("-p", "--prompt", default="hello world")
    ap.add_argument("--codes", default=None,
                    help="comma-separated audio codes (skip the LM)")
    ap.add_argument("-o", "--output", default="output.wav")
    ap.add_argument("-n", "--n-predict", type=int, default=768)
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    from .args import add_device, apply_device

    add_device(ap)
    args = ap.parse_args(argv)
    apply_device(args.device)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.codes:
        codes = [int(c) for c in args.codes.split(",")]
    else:
        if not args.model:
            ap.error("need --model or --codes")
        import jax.numpy as jnp

        from ..runtime.batch import Batch
        from ..runtime.engine import Context
        from ..samplers import SamplingParams, build_chain
        from ..tokenizers import tokenizer_from_gguf

        reader = GGUFReader(args.model)
        tok = tokenizer_from_gguf(reader)
        ctx = Context(reader, n_cells=max(2048, args.n_predict + 512))
        # tts.cpp prompt format (process_prompt)
        text = args.prompt.lower().strip()
        prompt = ("<|im_start|>\n<|text_start|>"
                  + text.replace(" ", "<|text_sep|>")
                  + "<|text_end|>\n<|audio_start|>\n")
        ptoks = tok.encode(prompt, add_special=True, parse_special=True)
        rc = ctx.decode(Batch.text(ptoks, seq_id=0))
        if rc != 0:
            raise RuntimeError(f"prompt decode rc={rc}")
        chain = build_chain(SamplingParams(temp=0.7, top_k=40),
                            ctx.cfg.vocab_size)
        codes = []
        n_past = len(ptoks)
        for _ in range(args.n_predict):
            tid = chain.sample(ctx.get_logits())
            chain.accept(tid)
            if tok.vocab.is_eog(tid) or tid < CODE_TOKEN_OFFSET:
                piece = tok.piece(tid, special=True)
                if "audio_end" in piece or tok.vocab.is_eog(tid):
                    break
            else:
                codes.append(tid - CODE_TOKEN_OFFSET)
            if ctx.decode(Batch.one(tid, pos=n_past, seq_id=0)) != 0:
                break
            n_past += 1
        print(f"generated {len(codes)} audio codes", file=sys.stderr)

    voc = load_wavtokenizer(GGUFReader(args.model_vocoder))
    import jax.numpy as jnp

    embd = np.asarray(wavtok_decode(voc, jnp.asarray(codes, jnp.int32)))
    audio = embd_to_audio(embd)
    write_wav(args.output, audio)
    print(f"wrote {args.output}: {len(audio)} samples "
          f"({len(audio)/SAMPLE_RATE:.2f}s @ {SAMPLE_RATE} Hz)",
          file=sys.stderr)


if __name__ == "__main__":
    main()

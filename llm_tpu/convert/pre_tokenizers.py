"""BPE pre-tokenizer detection for HF -> GGUF conversion.

Parity target: convert_hf_to_gguf.py get_vocab_base_pre / get_vocab_base
(/root/reference/convert_hf_to_gguf.py:~780) and the companion
convert_hf_to_gguf_update.py registry refresher.  The reference encodes a
fixed probe string with the model's tokenizer, hashes the token ids, and
looks the hash up in a table to pick the `tokenizer.ggml.pre` value that
selects the runtime split regexes (src/llama-vocab.cpp:1517-1660, mirrored
by llm_tpu.tokenizers.bpe.PRE_PATTERNS).

PRE_REGISTRY below is interop data transcribed from the reference's hash
table (the values are published tokenizer fingerprints — like the GGUF
format enums, they must match bit-for-bit to identify the same
tokenizers).  scripts/update_pre_tokenizer_hashes.py recomputes entries
from local model checkouts (this environment has no network egress).
"""

from __future__ import annotations

from hashlib import sha256

from ..gguf.constants import Keys
from ..tokenizers.vocab import TokenType

# the probe text exercises whitespace runs, emoji/ZWJ, CJK/Khmer, digit
# grouping and apostrophe casing — every axis the split regexes differ on
# (convert_hf_to_gguf.py chktxt; an interop constant: hashing any other
# string would produce fingerprints that match nothing)
CHK_TXT = (
    "\n \n\n \n\n\n \t \t\t \t\n  \n   \n    \n     \n"
    "\U0001f680 (normal) \U0001f636‍\U0001f32b️ (multiple emojis "
    "concatenated) ✅ \U0001f999\U0001f999 3 33 333 3333 33333 333333 "
    "3333333 33333333 3.3 3..3 3...3 "
    "កាន់តែពិសេស"
    "អាច\U0001f601 "
    "?我想在apple工作1314151天～ "
    "------======= нещо на "
    "Български ''''''```````"
    "\"\"\"\"......!!!!!!?????? I've been 'told he's there, 'RE you sure? "
    "'M not sure I'll make it, 'D you like some tea? We'Ve a'lL"
)

# sha256(str(tokenizer.encode(CHK_TXT))) -> tokenizer.ggml.pre
# (first match wins in the reference's if-chain; later duplicates of the
# same hash are unreachable there and omitted here)
PRE_REGISTRY: dict[str, str] = {
    "0ef9807a4087ebef797fc749390439009c3b9eda9ad1a097abbe738f486c01e5": "llama-bpe",
    "049ecf7629871e3041641907f3de7c733e4dbfdc736f57d882ba0b0845599754": "deepseek-llm",
    "347715f544604f9118bb75ed199f68779f423cabb20db6de6f31b908d04d7821": "deepseek-coder",
    "8aeee3860c56296a157a1fe2fad249ec40aa59b1bb5709f4ade11c4e6fe652ed": "falcon",
    "0876d13b50744004aa9aeae05e7b0647eac9d801b5ba4668afc01e709c15e19f": "bert-bge",
    "9d032fcbd5501f4a38150912590928bfb36091efb5df11b8e2124b0390e3fb1e": "falcon3",
    "8e62295832751ca1e8f92f2226f403dea30dc5165e448b5bfa05af5340c64ec7": "bert-bge-large",
    "b6dc8df998e1cfbdc4eac8243701a65afe638679230920b50d6f17d81c098166": "mpt",
    "35d91631860c815f952d711435f48d356ebac988362536bed955d43bfa436e34": "starcoder",
    "3ce83efda5659b07b1ad37ca97ca5797ea4285d9b9ab0dc679e4a720c9da7454": "gpt-2",
    "32d85c31273f8019248f2559fed492d929ea28b17e51d81d3bb36fff23ca72b3": "stablelm2",
    "6221ad2852e85ce96f791f476e0b390cf9b474c9e3d1362f53a24a06dc8220ff": "refact",
    "9c2227e4dd922002fb81bde4fc02b0483ca4f12911410dee2255e4987644e3f8": "command-r",
    "e636dc30a262dcc0d8c323492e32ae2b70728f4df7dfe9737d9f920a282b8aea": "qwen2",
    "a8594e3edff7c29c003940395316294b2c623e09894deebbc65f33f1515df79e": "dbrx",
    "c7699093ba4255a91e702aa38a596aa81669f3525dae06c2953267dde580f448": "jina-v1-en",
    "171aeeedd6fb548d418a7461d053f11b6f1f1fc9b387bd66640d28a4b9f5c643": "jina-v2-es",
    "27949a2493fc4a9f53f5b9b029c82689cfbe5d3a1929bb25e043089e28466de6": "jina-v2-de",
    "c136ed14d01c2745d4f60a9596ae66800e2b61fa45643e72436041855ad4089d": "smaug-bpe",
    "c7ea5862a53e4272c035c8238367063e2b270d51faa48c0f09e9d5b54746c360": "poro-chat",
    "7967bfa498ade6b757b064f31e964dddbb80f8f9a4d68d4ba7998fcf281c531a": "jina-v2-code",
    "7fc505bd3104ca1083b150b17d088b59534ede9bde81f0dd2090967d7fe52cee": "viking",
    "b53802fb28e26d645c3a310b34bfe07da813026ec7c7716883404d5e0f8b1901": "jais",
    "7b3e7548e4308f52a76e8229e4e6cc831195d0d1df43aed21ac6c93da05fec5f": "codeshell",
    "63b97e4253352e6f357cc59ea5b583e3a680eaeaf2632188c2b952de2588485e": "tekken",
    "855059429035d75a914d1eda9f10a876752e281a054a7a3d421ef0533e5b6249": "smollm",
    "3c30d3ad1d6b64202cd222813e7736c2db6e1bd6d67197090fc1211fbc612ae7": "bloom",
    "bc01ce58980e1db43859146dc51b1758b3b88729b217a74792e9f8d43e479d21": "gpt3-finnish",
    "4e2b24cc4770243d65a2c9ec19770a72f08cffc161adbb73fcbb6b7dd45a0aae": "exaone",
    "fcace8b9cac38ce847670c970cd5892031a753a1ef381abd1d9af00f713da085": "phi-2",
    "60824e3c0d9401f89943cbb2fff727f0e2d4c545ba4df2d6e4f09a6db0f5b450": "chameleon",
    "8b5a93ed704057481f240da0be7e7dca721d7f8f4755263b6807227a2cbeae65": "roberta-bpe",
    "ad851be1dba641f2e3711822f816db2c265f788b37c63b4e1aeacb9ee92de8eb": "gigachat",
    "d4c8f286ea6b520b3d495c4455483cfa2302c0cfcd4be05d781b6a8a0a7cdaf1": "megrez",
    "877081d19cf6996e2c4ff0e1236341e9b7bde288f5311a56a937f0afbbb3aeb5": "deepseek-v3",
    "b3f499bb4255f8ca19fccd664443283318f2fd2414d5e0b040fbdd0cc195d6c5": "deepseek-r1-qwen",
    "ccc2ef013c104be7bae2965776d611e1d7a8a2a9c547dd93a682c9a9fc80352e": "gpt-4o",
    "7dec86086fcc38b66b7bc1575a160ae21cf705be7718b9d5598190d7c12db76f": "superbpe",
    "1994ffd01900cfb37395608534236ecd63f2bd5995d6cb1004dda1af50240f15": "trillion",
    "96a5f08be6259352137b512d4157e333e21df7edd3fcd152990608735a65b224": "bailingmoe",
    "d353350c764d8c3b39c763113960e4fb4919bea5fbf208a0e3b22e8469dc7406": "llama4",
    "0e9433cbbb161f89e264eb32e8e64bfe69e834973ffca5d41d3948a604a3e2a3": "pixtral",
    "d5f1dd6f980fec569fb218a81a7658ac45fc56b38c5a0adeb1c232fbe04ef5ec": "seed-coder",
    "b6e8e1518dc4305be2fe39c313ed643381c4da5db34a98f6a04c093f8afbe99b": "chatglm-bpe",
    "81d72c7348a9f0ebe86f23298d37debe0a5e71149e29bd283904c02262b27516": "chatglm-bpe",
    "a1336059768a55c99a734006ffb02203cd450fed003e9a71886c88acf24fdbc2": "glm4",
    "1431a23e583c97432bc230bff598d103ddb5a1f89960c8f1d1051aaa944d0b35": "minerva-7b",
}


def chkhsh(tokenizer) -> str:
    """Fingerprint a HF tokenizer the way the reference converter does."""
    return sha256(str(tokenizer.encode(CHK_TXT)).encode()).hexdigest()


def detect_pre(tokenizer, default: str | None = None) -> str:
    """tokenizer.ggml.pre for a HF tokenizer, via the hash registry.

    Unknown fingerprints raise (matching the reference's refusal to guess a
    split regex — a wrong one silently mis-tokenizes) unless `default` is
    given.
    """
    h = chkhsh(tokenizer)
    pre = PRE_REGISTRY.get(h)
    if pre is None:
        if default is not None:
            return default
        raise NotImplementedError(
            f"unknown BPE pre-tokenizer (chkhsh {h}); add it to "
            "PRE_REGISTRY via scripts/update_pre_tokenizer_hashes.py or "
            "pass default=..."
        )
    return pre


def vocab_from_hf(tokenizer, model: str = "gpt2",
                  pre: str | None = None) -> dict:
    """Build the GGUF tokenizer KV dict from a HF (fast) tokenizer.

    Mirrors the reference's get_vocab_base: tokens indexed 0..n-1 with
    [PAD{i}] filler for holes, token types from added_tokens (CONTROL for
    special, USER_DEFINED otherwise), merges from the fast tokenizer model.
    Pass the result as the `vocab=` argument of any converter.
    """
    K = Keys.Tokenizer
    sp = getattr(tokenizer, "sp_model", None)
    if model == "llama" and sp is not None:
        # sentencepiece path (reference SentencePieceVocab): pieces with
        # scores; CONTROL/UNKNOWN/BYTE types from the proto flags
        tokens, scores, types = [], [], []
        for i in range(sp.vocab_size()):
            tokens.append(sp.IdToPiece(i))
            scores.append(float(sp.GetScore(i)))
            if sp.IsUnknown(i):
                types.append(TokenType.UNKNOWN)
            elif sp.IsControl(i):
                types.append(TokenType.CONTROL)
            elif sp.IsByte(i):
                types.append(TokenType.BYTE)
            else:
                types.append(TokenType.NORMAL)
        out = {K.MODEL: "llama", K.LIST: tokens, K.SCORES: scores,
               K.TOKEN_TYPE: types}
        for attr, key in (("bos_token_id", K.BOS_ID),
                          ("eos_token_id", K.EOS_ID),
                          ("unk_token_id", K.UNK_ID),
                          ("pad_token_id", K.PAD_ID)):
            v = getattr(tokenizer, attr, None)
            if v is not None:
                out[key] = int(v)
        return out

    vocab_size = getattr(tokenizer, "vocab_size", None)
    rev = {int(i): t for t, i in tokenizer.get_vocab().items()}
    n = max(vocab_size or 0, (max(rev) + 1) if rev else 0)

    added = {}
    for tid, tok in getattr(tokenizer, "added_tokens_decoder", {}).items():
        added[int(tid)] = bool(getattr(tok, "special", False))

    tokens, types = [], []
    for i in range(n):
        t = rev.get(i)
        if t is None:
            tokens.append(f"[PAD{i}]")
            types.append(TokenType.UNUSED)
        elif i in added:
            tokens.append(t)
            types.append(TokenType.CONTROL if added[i]
                         else TokenType.USER_DEFINED)
        else:
            tokens.append(t)
            types.append(TokenType.NORMAL)

    merges = []
    backend = getattr(tokenizer, "backend_tokenizer", None)
    if backend is not None:
        import json

        state = json.loads(backend.to_str())
        raw = state.get("model", {}).get("merges", [])
        merges = [m if isinstance(m, str) else " ".join(m) for m in raw]

    out = {
        K.MODEL: model,
        K.LIST: tokens,
        K.TOKEN_TYPE: types,
    }
    if merges:
        out[K.MERGES] = merges
    if model == "gpt2":
        out[K.PRE] = pre if pre is not None else detect_pre(tokenizer)
    for attr, key in (("bos_token_id", K.BOS_ID), ("eos_token_id", K.EOS_ID),
                      ("unk_token_id", K.UNK_ID), ("sep_token_id", K.SEP_ID),
                      ("pad_token_id", K.PAD_ID)):
        v = getattr(tokenizer, attr, None)
        if v is not None:
            out[key] = int(v)
    return out

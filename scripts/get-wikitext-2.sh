#!/usr/bin/env bash
# Fetch wikitext-2 raw (the reference perplexity corpus —
# /root/reference/scripts/get-wikitext-2.sh parity). Then:
#   python -m llm_tpu.tools.perplexity -m model.gguf \
#       -f wikitext-2-raw/wiki.test.raw -c 512
set -e
wget https://huggingface.co/datasets/ggml-org/ci/resolve/main/wikitext-2-raw-v1.zip
unzip wikitext-2-raw-v1.zip
echo "Usage:"
echo "  python -m llm_tpu.tools.perplexity -m model.gguf -f wikitext-2-raw/wiki.test.raw -c 512"

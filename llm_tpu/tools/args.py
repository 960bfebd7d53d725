"""Environment-variable fallbacks for CLI flags.

Parity target: the reference's arg system binds most flags to LLAMA_ARG_*
environment variables (common/arg.cpp:1307-1451, .set_env entries). Here
every tool passes its argparse defaults through env_default(), so e.g.

    LLM_TPU_ARG_MODEL=weights.gguf LLM_TPU_ARG_CTX_SIZE=8192 python -m ...

supplies -m / -c without flags. Explicit flags always win over env vars.
"""

from __future__ import annotations

import os

PREFIX = "LLM_TPU_ARG_"


def env_default(name: str, default, cast=None):
    """Default for argparse: LLM_TPU_ARG_<NAME> when set, else `default`.

    name: the long flag name ("ctx-size" -> LLM_TPU_ARG_CTX_SIZE)."""
    key = PREFIX + name.replace("-", "_").upper()
    raw = os.environ.get(key)
    if raw is None:
        return default
    if cast is bool:
        return raw.strip().lower() in ("1", "true", "yes", "on")
    if cast is not None:
        return cast(raw)
    if isinstance(default, bool):
        return raw.strip().lower() in ("1", "true", "yes", "on")
    if isinstance(default, int):
        return int(raw)
    if isinstance(default, float):
        return float(raw)
    return raw


def required_unless_env(name: str):
    """For required args: not required when the env var supplies a value."""
    return env_default(name, None) is None

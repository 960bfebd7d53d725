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


def add_device(ap) -> None:
    """--device PLATFORM — pin the JAX platform (cpu / tpu / axon …), the
    analogue of the reference's --device dev list (common/arg.cpp
    --device). Needed because env-var platform overrides are unreliable
    when a plugin platform (tunneled TPU) is registered; jax.config is
    authoritative."""
    ap.add_argument("--device", default=env_default("device", None),
                    metavar="PLATFORM",
                    help="JAX platform to run on (cpu|tpu|...); default: "
                         "auto. Env: LLM_TPU_ARG_DEVICE")


def apply_device(device: str | None) -> None:
    """Apply a --device choice. Must run before the first JAX computation
    (the backend is chosen lazily at first use)."""
    if device:
        import jax

        jax.config.update("jax_platforms", device)


def add_ep_cf(ap) -> None:
    """--ep-capacity-factor F — MoE expert-capacity factor. 0 (default)
    computes every routed assignment exactly (capacity C = T); F > 0 caps
    each expert's bucket at ceil(F * T * k / E) tokens and DROPS overflow
    assignments — the standard capacity/throughput trade for EP serving
    (see parallel/moe.py and tests/test_moe_cf.py for the measured
    drop-rate and logit-delta curves)."""
    ap.add_argument("--ep-capacity-factor", type=float,
                    default=env_default("ep-capacity-factor", 0.0),
                    metavar="F",
                    help="MoE expert capacity factor (0 = exact, no drops;"
                         " typical serving values 1.0-2.0). Env: "
                         "LLM_TPU_ARG_EP_CAPACITY_FACTOR")


def apply_ep_cf(value: float | None) -> None:
    """Apply --ep-capacity-factor (parallel/moe.py reads LLM_TPU_EP_CF at
    trace time)."""
    if value:
        os.environ["LLM_TPU_EP_CF"] = str(value)


def add_override_kv(ap) -> None:
    """--override-kv KEY=TYPE:VALUE (repeatable) — the analogue of the
    reference's llama_model_kv_override (llama.h:280-291, common arg
    --override-kv): patch GGUF metadata at load, e.g.
    `--override-kv qwen2.rope.freq_base=float:1000000`."""
    ap.add_argument("--override-kv", action="append", default=[],
                    metavar="KEY=TYPE:VALUE",
                    help="override a GGUF metadata value (TYPE: "
                         "int|float|bool|str); repeatable")


def apply_kv_overrides(reader, specs) -> None:
    """Patch reader.metadata in place from KEY=TYPE:VALUE specs."""
    casts = {"int": int, "float": float, "str": str,
             "bool": lambda v: v.strip().lower() in ("1", "true", "yes", "on")}
    for spec in specs or ():
        key, _, tv = spec.partition("=")
        typ, _, val = tv.partition(":")
        if not key or typ not in casts or not _:
            raise SystemExit(
                f"bad --override-kv {spec!r} (want KEY=TYPE:VALUE, "
                f"TYPE in {sorted(casts)})")
        reader.metadata[key] = casts[typ](val)

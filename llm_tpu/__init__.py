"""llm_tpu: TPU-native LLM inference/serving framework.

LLM_TPU_PLATFORM (env): force the JAX platform ("cpu"/"tpu") via
jax.config at import — the in-process equivalent of JAX_PLATFORMS for
environments where the env var is unreliable (PJRT plugin sitecustomize
hooks process env-named platforms during discovery)."""

import os as _os

if _os.environ.get("LLM_TPU_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["LLM_TPU_PLATFORM"])

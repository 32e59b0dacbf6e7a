"""The ONE default engine factory shared by the serve app and the warmup
CLI.

The warmup's whole value is that the programs it compiles are exactly the
ones serving will dispatch — which is only guaranteed if both build their
engine through the same function. Keep every default (env handling,
dev-mode branch, model dir) here; serve/app.py and serve/warmup.py must
not grow their own copies."""

from __future__ import annotations

import os


def default_engine_factory():
    """Build the production TranscriptionEngine from the environment —
    or the dev-backend engine when CC_TPU_FAKE_MODELS=1 (signal-processing
    model stand-ins; the full pipeline runs without trained checkpoints)."""
    from clearconverse_tpu.config import Config, load_environment
    from clearconverse_tpu.pipeline.engine import TranscriptionEngine

    env = load_environment()
    if os.environ.get("CC_TPU_FAKE_MODELS") == "1":
        from clearconverse_tpu.pipeline.dev_backend import DevModels
        return TranscriptionEngine(
            Config(auth_token=env["hf_auth_token"],
                   noise_reduction_amount=0.0),
            models=DevModels())
    from clearconverse_tpu.config import tpu_config_from_env
    return TranscriptionEngine(
        Config(auth_token=env["hf_auth_token"]),
        tpu_config=tpu_config_from_env(),
        model_dir=env["model_cache_dir"])

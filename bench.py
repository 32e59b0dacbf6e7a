"""End-to-end RTFx benchmark on the flagship path.

Measures waveform→tokens throughput of the TPU pipeline's hot path: batched
log-mel frontend + Whisper small.en encoder + KV-cached greedy decode of a
fixed token budget (early-exit disabled so the measurement is
weight-independent — random weights decode the same FLOPs as real ones).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference publishes no numbers (BASELINE.md); the north-star
target is ≥50× real-time per chip, so vs_baseline = RTFx / 50.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32,
                    help="30 s segments per device program")
    ap.add_argument("--decode-tokens", type=int, default=96,
                    help="tokens decoded per segment (~3.2 tok/s of speech)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--kv-bits", type=int, default=8, choices=(16, 8, 4),
                    help="cross-attention KV width (the decode loop is "
                    "cross-KV-streaming-bound; 8-bit = 2.3x decode at B=32)")
    args = ap.parse_args()

    import jax

    # Persistent compilation cache: first-ever compile of the small.en
    # pipeline takes minutes over the device tunnel; subsequent runs hit
    # the cache.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/cc_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from clearconverse_tpu.audio.mel import log_mel_auto
    from clearconverse_tpu.models.decoding import (
        DecodeOptions, build_prompt_batch, greedy_decode)
    from clearconverse_tpu.models.whisper import init_whisper_params, model_dims

    dims = model_dims("small.en")
    params = init_whisper_params(jax.random.PRNGKey(0), dims)
    params = jax.device_put(params)

    B, seg_sec, sr = args.batch, 30.0, 16000
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, int(seg_sec * sr))).astype(np.float32) * 0.1)

    opts = DecodeOptions(max_tokens=args.decode_tokens, temperature=0.0,
                         eot=-1,  # never matches → fixed decode length
                         suppress_blank=False, compute_dtype=jnp.bfloat16,
                         cross_kv_bits=args.kv_bits)
    prompts, lens = build_prompt_batch([[50257]] * B, 1, pad_id=50256)
    prompts, lens = jnp.asarray(prompts), jnp.asarray(lens)

    @jax.jit
    def pipeline(params, audio):
        mel = log_mel_auto(audio)
        return greedy_decode(params, mel, prompts, lens, dims, opts, 1)

    def sync(result):
        # block_until_ready is a NO-OP on the axon tunnel platform (verified);
        # a tiny host transfer is the only reliable execution barrier.
        np.asarray(result["lengths"][:1])

    sync(pipeline(params, audio))  # compile + warmup

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = pipeline(params, audio)
        sync(out)
    dt = time.perf_counter() - t0

    audio_seconds = B * seg_sec * args.iters
    rtfx = audio_seconds / dt
    print(json.dumps({
        "metric": "whisper_small_en_rtfx",
        "value": round(rtfx, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtfx / 50.0, 3),
    }))


if __name__ == "__main__":
    main()

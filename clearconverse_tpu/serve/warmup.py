"""Compile-cache warmup for serving deployments.

Every (program, shape) pair XLA compiles is a one-time cost per
persistent-cache lifetime (utils/jaxcache) — but over the tunnel-attached
TPU that one time is 30 s - 18 min PER SHAPE, and without warmup it lands
in the middle of the first user request of each new shape: file-count ×
duration bucket × wire width × denoise for the gate, duration bucket ×
row bucket for decode, and so on. This CLI drives the REAL engine (the
exact factory the serve app uses) over synthetic conversations in the
deployment's expected workload shapes, so every standard program is in
the cache before the server takes traffic:

    python -m clearconverse_tpu.serve.warmup --durations 30,60 --files 1,8

The reference has no equivalent: its torch/CUDA stack compiles nothing at
this granularity (back/api.py loads eager models). This is operational
tooling for the XLA compilation model, the way the wire formats
(audio/pack.py, audio/wire.py) are for the tunnel topology.

Two drive kinds:
  * engine passes — one ``process_files`` per (file-count, duration):
    compiles gate (raw-int16 — the tonal synthetic falls back), VAD,
    segmentation, diarization, embedding, profile, separation, and the
    decode programs for every segment bucket the conversation produces
    (short exchanges, 10 s / 25 s stretches, and the >30 s seek window
    when the duration allows).
  * packed-wire gate variants — the default lossless wire compiles one
    gate program per width bucket (audio/pack.WIDTH_BUCKETS); triangle
    waves with a chosen per-sample step hit each width deterministically.
"""

from __future__ import annotations

import argparse
import os
import tempfile
import time
from typing import Callable, List, Optional

import numpy as np


def _default_engine():
    """The serve app's engine factory — the SAME function create_app
    defaults to (serve/factory.py), so the warmed programs are exactly
    the ones serving will dispatch — including the CC_TPU_FAKE_MODELS
    dev branch (where warmup is a no-op smoke: the dev backend compiles
    nothing)."""
    from clearconverse_tpu.serve.factory import default_engine_factory

    return default_engine_factory()


def warmup_conversation(duration_s: int, sr: int) -> np.ndarray:
    """Two-band synthetic conversation covering the decode duration
    buckets: the dev two-speaker layout (short exchanges + an overlap
    region, pipeline/dev_backend.synth_conversation) tiled to length,
    with a continuous mid-file low-band stretch long enough to hit the
    largest decode bucket — and the >30 s timestamp-seek path when
    ``duration_s`` allows (stretch capped at 35 s)."""
    from clearconverse_tpu.pipeline.dev_backend import synth_conversation

    base = synth_conversation()
    n = duration_s * sr
    reps = -(-n // len(base))
    x = np.tile(base, reps)[:n].copy()
    if duration_s >= 24:
        a = 12 * sr
        b = min((duration_s - 2) * sr, a + 35 * sr)
        t = np.arange(b - a) / sr
        x[a:b] = (0.5 * np.sin(2 * np.pi * 300.0 * t)).astype(np.float32)
    return x


def triangle_for_width(width: int, duration_s: int, sr: int) -> np.ndarray:
    """float32 waveform whose 16-bit PCM round-trip delta-packs at exactly
    ``width`` bits: a triangle wave stepping 2^(width-2) per sample
    (|order-1 delta| constant = the step, order-2 needs one more bit at
    the folds, so the packer picks order 1 at signed width
    bit_length(step)+1 = width)."""
    step = 1 << (width - 2)
    peak = 1 << 14
    ramp = (np.arange(duration_s * sr, dtype=np.int64) * step) % (4 * peak)
    tri = (peak - np.abs(ramp - 2 * peak)).astype(np.int16)
    # /32767 so write_wav's round(x * 32767) reproduces tri EXACTLY — an
    # off-by-one anywhere would bump the delta width a bucket.
    return tri.astype(np.float32) / 32767.0


def warm_decode_shapes(engine, drive: Callable[[str, Callable], None],
                       durations=(5.0, 10.0, 30.0)) -> None:
    """Deterministically compile the decode programs for EVERY row bucket,
    in the VARIANTS production dispatches.

    The engine pads decode batches to power-of-two row buckets
    (pipeline/bundle._row_bucket), and which buckets a request hits is
    DATA-DEPENDENT on the >30 s path: successor-window spawn counts follow
    the decoded timestamps, which vary per request at temperature > 0
    (sampling). An engine pass therefore warms only the buckets its
    particular decode happened to produce — a live server can still hit a
    minutes-long tunnel compile on an unlucky request shape (measured: the
    engine bench's t=0.1 mode kept finding fresh row buckets two runs
    after its cold pass).

    Variant coverage matters as much as bucket coverage: a real bundle has
    ``supports_store=True``, so live requests decode through STORE-backed
    batches (greedy_decode_from_store — a different jitted program per
    (row bucket, window bucket, prompt bucket) than the from-audio one).
    This stage therefore drives store-backed batches for the long >30 s
    path (every row bucket × prompt bucket, 30 s windows — the engine's
    ``store_groups(..., fixed_bucket=win)``) and the short path (every row
    bucket × duration bucket); the host-array short variant — production's
    separated-overlap-clip path (those units carry no store ref) — is
    driven at every row bucket × duration too. All through the
    deployment's own config (so replicas/rungs match production). Short
    drives use empty prompts (p4) plus p64 at the row extremes; other
    short × prompt-bucket combinations stay cold until first hit — add
    them here if a deployment's logs show them."""
    from clearconverse_tpu.pipeline.bundle import (ModelBundle, StoreBatch,
                                                   _row_bucket)
    from clearconverse_tpu.pipeline.dev_backend import SR

    bundle = getattr(engine, "models", None)
    if not isinstance(bundle, ModelBundle):
        return
    import jax.numpy as jnp

    temp = engine.config.temperature
    cap = _row_bucket(max(int(engine.config.transcription_batch_size), 1))
    row_buckets = []
    r = 1
    while r <= cap:
        row_buckets.append(r)
        r *= 2
    cfg_durs = getattr(getattr(engine, "tpu", None), "duration_buckets",
                       None)
    durations = tuple(cfg_durs) if cfg_durs else tuple(durations)
    rng = np.random.default_rng(0)

    def store_rows(n: int, dur_samples: int) -> StoreBatch:
        """n full-window rows into a fresh device store — the layout the
        engine's iter_store_batches produces for gated original audio."""
        audio = rng.standard_normal((n, dur_samples)).astype(np.float32) * 0.1
        store = bundle.make_store(jnp.asarray(audio), SR)
        return StoreBatch(store, np.arange(n), np.zeros(n, np.int32),
                          np.full(n, dur_samples, np.int32), dur_samples)

    # Prompt lengths land in EVERY prompt bucket (bundle._prompt_batch
    # buckets max_prompt_len into 4/16/64/256): empty → 4, then texts
    # sized so both the real GPT-2 BPE (~2 tokens/word) and the
    # byte-fallback tokenizer (1 token/byte) land in 16 / 64 / 256 —
    # window 2+ of a long file typically carries one-to-few windows of
    # rolling text (16/64) and converges to the trimmed ctx//2-1 top
    # bucket.
    prompts = {"p4": "", "p16": "ctx " * 3, "p64": "ctx " * 9,
               "p256": "ctx " * 100}
    for n in row_buckets:
        sb = store_rows(n, 30 * SR)
        lens = np.full(n, 30 * SR)
        for pname, prompt in prompts.items():
            drive(f"decode long-window rows={n} prompt={pname}",
                  lambda sb=sb, p=prompt, ln=lens, k=n:
                  bundle.transcribe_long_batch(sb, [p] * k, ln,
                                               temperature=temp))
    for n in row_buckets:
        for dur in durations:
            sb = store_rows(n, int(dur) * SR)
            drive(f"decode short store rows={n} duration={dur}s",
                  lambda sb=sb, k=n:
                  bundle.transcribe_batch(sb, [""] * k, temperature=temp))
            audio = rng.standard_normal((n, int(dur) * SR)) \
                .astype(np.float32) * 0.1
            drive(f"decode short host rows={n} duration={dur}s",
                  lambda a=audio, k=n:
                  bundle.transcribe_batch(a, [""] * k, temperature=temp))
    for n in (row_buckets[0], row_buckets[-1]):
        sb = store_rows(n, int(durations[-1]) * SR)
        drive(f"decode short store rows={n} prompt=p64",
              lambda sb=sb, k=n:
              bundle.transcribe_batch(sb, [prompts["p64"]] * k,
                                      temperature=temp))


def run_warmup(durations=(30, 60), file_counts=(1, 8), widths: bool = True,
               decode_shapes: bool = True,
               engine_factory: Optional[Callable] = None,
               log: Callable[[str], None] = print) -> List[dict]:
    """Drive every standard program shape; returns one entry per drive
    with its wall-clock seconds (first run of a shape = compile time;
    re-runs on a warm cache finish in seconds, which is how you verify
    the cache took)."""
    from clearconverse_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    engine = (engine_factory or _default_engine)()
    from clearconverse_tpu.audio.wav import write_wav
    from clearconverse_tpu.pipeline.dev_backend import SR

    tmp = tempfile.mkdtemp(prefix="cc_warm_")
    entries: List[dict] = []

    def drive(label: str, fn) -> None:
        t0 = time.perf_counter()
        ret = fn()
        # Only engine passes return a status STRING; decode/width drives
        # return their (large) transcription results — never log those.
        extra = ret if isinstance(ret, str) else ""
        dt = time.perf_counter() - t0
        entries.append({"drive": label, "seconds": round(dt, 1)})
        log(f"  {label}: {dt:.1f}s{extra}")

    def engine_pass(paths):
        results = engine.process_files(paths)
        segs = sum(len(r["segments"]) for r in results if r)
        if segs == 0:
            # Without segments the decode programs never dispatch, so this
            # drive warmed only the load/segmentation front half. Real
            # checkpoints produce segments from the synthetic conversation;
            # zero usually means the models are random-init (no checkpoints
            # in --model-dir) or the diarization thresholds are off.
            return ("  WARNING: 0 segments — decode programs NOT warmed "
                    "(random-init models?)")
        return f"  ({segs} segments)"

    for k in file_counts:
        for dur in durations:
            paths = []
            for i in range(k):
                p = os.path.join(tmp, f"conv_{k}_{dur}_{i}.wav")
                write_wav(p, warmup_conversation(int(dur), SR), SR)
                paths.append(p)
            drive(f"engine files={k} duration={dur}s",
                  lambda paths=paths: engine_pass(paths))

    if decode_shapes:
        warm_decode_shapes(engine, drive)

    tpu = getattr(engine, "tpu", None)
    if widths and tpu is not None and tpu.wire_bits == 0:
        from clearconverse_tpu.audio.decode import load_audio_many
        from clearconverse_tpu.audio.pack import WIDTH_BUCKETS

        amount = engine.config.noise_reduction_amount
        for k in file_counts:
            for dur in durations:
                for w in WIDTH_BUCKETS:
                    paths = []
                    for i in range(k):
                        p = os.path.join(tmp, f"tri_{k}_{dur}_{w}_{i}.wav")
                        write_wav(p, triangle_for_width(w, int(dur), SR), SR)
                        paths.append(p)
                    drive(f"packed-wire gate files={k} duration={dur}s "
                          f"width={w}",
                          lambda paths=paths: load_audio_many(
                              paths, SR, noise_reduction_amount=amount,
                              denoise=amount > 0, wire_bits=0))
    return entries


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Pre-compile the serving program set into the "
                    "persistent XLA cache (run once per deployment; "
                    "re-run after changing models or CC_TPU_* knobs).")
    ap.add_argument("--durations", default="30,60",
                    help="comma-separated file durations in seconds "
                    "(match your workload's length buckets)")
    ap.add_argument("--files", default="1,8",
                    help="comma-separated per-request file counts "
                    "(gate/upload programs are shape-specific in K)")
    ap.add_argument("--no-widths", action="store_true",
                    help="skip the packed-wire width-bucket gate variants")
    ap.add_argument("--no-decode-shapes", action="store_true",
                    help="skip the per-row-bucket decode program warms "
                    "(the stage that prevents data-dependent compiles on "
                    "the >30 s path)")
    args = ap.parse_args(argv)
    durations = tuple(int(s) for s in args.durations.split(",") if s)
    files = tuple(int(s) for s in args.files.split(",") if s)
    t0 = time.perf_counter()
    print(f"warming {len(durations) * len(files)} engine shapes "
          f"(durations={durations}, files={files}) ...")
    entries = run_warmup(durations, files, widths=not args.no_widths,
                         decode_shapes=not args.no_decode_shapes)
    print(f"warmup done: {len(entries)} drives in "
          f"{time.perf_counter() - t0:.0f}s; re-run to verify warm "
          f"timings (seconds, not minutes).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

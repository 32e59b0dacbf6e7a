"""End-to-end RTFx benchmark.

Default run measures BOTH paths and prints TWO JSON lines (each a complete
record; the driver may keep either the first or the last):

  line 1 — the moment the hot path is measured, flushed immediately, with
    ``engine: {"status": "pending"}``. This makes the bench un-killable-by-
    timeout: round 3's driver run (BENCH_r03.json rc=124, parsed null) died
    with ZERO output because the single line was withheld until after the
    engine bench's compile ladder (VERDICT r3 weak #1).
  line 2 — the merged record with the real engine block, printed last.

  1. Hot path: batched log-mel + Whisper small.en encoder + KV-cached greedy
     decode of a fixed token budget (early-exit disabled so the measurement
     is weight-independent — random weights decode the same FLOPs as real
     ones).
  2. Full engine (``engine`` key, VERDICT r1 #4): process_files over
     synthetic multi-segment conversations through the REAL ModelBundle —
     load/denoise, segmentation, diarization+clustering, profiles, overlap
     separation, and the decode wavefront, end to end. Binarization
     thresholds are lowered so segments emerge from random-init weights;
     the compute per stage is the same as with trained ones. The synthetic
     is SPEECH-SHAPED (harmonic tilt + soft onsets, dev_backend.
     synth_conversation_speech) so the default lossless packed wire
     engages exactly as it does on real speech (VERDICT r3 next #5); the
     ``engine.wire`` block records what actually crossed the tunnel.

  3. (budget permitting, same merged line) ``engine_ref_default``: the
     engine at the REFERENCE's default decode config (temperature 0.1 =>
     best_of=5, back/api.py:128) and ``latency``: warm single-request
     wall clock for one 60 s file — both reusing the warm engine, so the
     round's honest parity-config and user-felt numbers are
     driver-captured, not builder-attested (VERDICT r4 #2b).

All engine stage telemetry is per-pass MEDIANS plus raw ``per_pass_s``
lists (VERDICT r4 #2a/weak #3: summed stages made one executable-install-
skewed pass read as a stage regression — exactly the false "segmentation
5x" signal in BENCH_r04).

The engine bench runs under a wall-clock budget (CC_BENCH_BUDGET_S /
--budget, default 2400 s from process start): warm repeats degrade to fit
the remaining budget and the engine block reports ``budget_truncated``
instead of the whole process dying in a driver timeout.

Headline schema: {"metric", "value", "unit", "vs_baseline", "engine"}.
Baseline: the reference publishes no numbers (BASELINE.md); the north-star
target is ≥50x real-time per chip, so vs_baseline = RTFx / 50.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_T0 = time.perf_counter()

# Leave this much headroom before the budget for the final print + teardown.
_MIN_ENGINE_S = 300.0


def _remaining(budget_s: float) -> float:
    return budget_s - (time.perf_counter() - _T0)


def _emit(line: dict) -> None:
    print(json.dumps(line), flush=True)


_MODELS_ENSURED = False


def _ensure_models(budget_s: float = float("inf")) -> None:
    """Regenerate the dress-rehearsal checkpoint set when ./models is gone.

    The engine numbers should measure the checkpoint-loaded path (VERDICT
    r4 #3: converter → device at production scale), but the model dir is
    gitignored and does not survive a workspace reset — round 5 measured
    exactly that: a populated ./models vanished between sessions, which
    would silently flip the driver's BENCH json back to random_weights.
    If no whisper checkpoint is discoverable, rebuild the full-scale set
    (eval/dress_rehearsal — real dims/format/layout, seeded values) in a
    SUBPROCESS: it pins itself to jax_platforms=cpu, so this process's
    TPU backend is never touched. Best-effort with a budget guard — any
    failure just lands on the random-init fallback the bundle already
    logs. CC_BENCH_AUTOGEN_MODELS=0 opts out."""
    global _MODELS_ENSURED
    if _MODELS_ENSURED or os.environ.get("CC_BENCH_AUTOGEN_MODELS") == "0":
        return
    _MODELS_ENSURED = True
    try:
        from clearconverse_tpu.config import Config
        # The bench engines construct TranscriptionEngine without a
        # model_dir, so they resolve the same "./models" default
        # (pipeline/engine.py:69) — mirror that, not serve's
        # MODEL_CACHE_DIR, which bench never reads.
        mdir, size = "./models", Config().whisper_model_size
        if (os.path.exists(os.path.join(mdir, f"{size}.pt"))
                or os.path.exists(os.path.join(mdir, "whisper",
                                               f"{size}.pt"))):
            return
        # Generation measured ~2 min on this 1-core host; don't start it
        # when the remaining budget couldn't also fit the engine bench.
        if _remaining(budget_s) < _MIN_ENGINE_S + 600.0:
            print(f"bench: {mdir} has no {size}.pt and the budget is too "
                  "deep to regenerate; engine numbers will be random-init",
                  file=sys.stderr, flush=True)
            return
        print(f"bench: no {size}.pt under {mdir}; regenerating the "
              "dress-rehearsal checkpoint set (subprocess, CPU-pinned)",
              file=sys.stderr, flush=True)
        import subprocess
        subprocess.run(
            [sys.executable, "-m", "clearconverse_tpu.eval.dress_rehearsal",
             "--model-dir", mdir, "--size", size],
            timeout=min(900.0, max(_remaining(budget_s) - _MIN_ENGINE_S,
                                   60.0)),
            stdout=sys.stderr, check=False)
    except Exception as exc:  # noqa: BLE001 — random-init fallback covers us
        print(f"bench: model regeneration skipped ({exc!r})",
              file=sys.stderr, flush=True)


def _run_passes(engine, paths, repeats: int, budget_s: float,
                est0: float = 60.0):
    """Timed warm passes with per-pass stage capture.

    Returns (per_pass_s, pass_stages, truncated, last_results). Each
    pass_stages entry is that pass's OWN stage dict plus its own
    ``untracked`` residual — per-pass capture is what lets the report
    use medians, so one install-skewed pass (a per-process executable
    install can cost seconds even on compile-cache hits) no longer
    poisons the telemetry (VERDICT r4 weak #3)."""
    per_pass, pass_stages, truncated, results = [], [], False, None
    for _ in range(repeats):
        # Deadline check BEFORE each warm pass: a pass costs about what the
        # previous one did; if that estimate overruns the budget, stop with
        # the passes already banked instead of dying rc=124 with nothing.
        est = max(per_pass) if per_pass else est0
        if per_pass and _remaining(budget_s) < est * 1.5:
            truncated = True
            break
        t0 = time.perf_counter()
        results = engine.process_files(paths)
        dt = time.perf_counter() - t0
        per_pass.append(dt)
        st = dict(getattr(engine, "last_run_stage_times", {}))
        # Dotted keys (e.g. load_gate.upload_gate) decompose a parent span —
        # exclude them from the untracked residual or they double-count.
        top_level = sum(v for k, v in st.items() if "." not in k)
        st["untracked"] = max(dt - top_level, 0.0)
        pass_stages.append(st)
    return per_pass, pass_stages, truncated, results


def _stage_medians(pass_stages) -> tuple:
    """Per-pass MEDIAN of each stage across warm passes (VERDICT r4 #2a:
    the old pass-summed stage_seconds could not distinguish a stage
    regression from one pass's executable-install skew). Returns
    (medians, counts) where counts lists only stages absent from >=1
    pass."""
    import statistics
    keys = set()
    for st in pass_stages:
        keys.update(st)
    # Median over the passes where the stage actually RAN: zero-filling
    # absent passes made any stage firing in <half the passes median to
    # exactly 0.0 and vanish — hiding real intermittent costs (a 2 s
    # fallback in 1 of 3 passes) instead of damping install skew.
    # ``stage_counts`` flags the intermittent ones so a reader knows the
    # median covers fewer passes than per_pass_s.
    med, counts = {}, {}
    for k in keys:
        vals = [st[k] for st in pass_stages if k in st]
        med[k] = statistics.median(vals)
        if len(vals) < len(pass_stages):
            counts[k] = len(vals)
    out = {k: round(v, 3)
           for k, v in sorted(med.items(), key=lambda kv: -kv[1])}
    return out, counts


def bench_engine(n_files: int, repeats: int,
                 temperature: float = 0.0,
                 budget_s: float = float("inf"),
                 _share: dict | None = None) -> dict:
    """Full-pipeline RTFx: process_files over synthetic conversations.

    Returns {"rtfx_warm_best": ..., "rtfx_warm_mean": ...,
    "audio_seconds": ..., "files": ..., "segments_per_pass": ..., "wire":
    ...}. Cold run (compiles) excluded from the timing; the warm numbers
    are what a loaded server delivers. ``budget_s`` is a wall-clock
    deadline measured from process start: warm passes stop early (and the
    result says ``budget_truncated``) rather than letting a driver timeout
    zero out the whole bench (VERDICT r3 #1)."""
    import numpy as np

    from clearconverse_tpu.audio.wav import write_wav
    from clearconverse_tpu.config import Config
    from clearconverse_tpu.pipeline.dev_backend import (
        SR, synth_conversation_speech)
    from clearconverse_tpu.pipeline.engine import TranscriptionEngine

    import tempfile
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="cc_bench_")
    paths = []
    # 60 s conversations (5x the 12 s synthetic two-speaker layout) so each
    # file yields a realistic multi-segment workload. Speech-shaped source
    # + BAND-LIMITED per-file noise (box-8-filtered white, sigma 0.01):
    # white noise alone forces 14-bit deltas, which made every previous
    # bench silently fall back to the raw int16 wire; this content packs
    # at width 12 like real speech, so the bench exercises the default
    # lossless packed wire (VERDICT r3 next #5). Distinct noise per file
    # so nothing is trivially cached.
    base = np.tile(synth_conversation_speech(), 5)

    def bl_noise(n: int) -> np.ndarray:
        w = rng.standard_normal(n + 8).astype(np.float32)
        c = np.cumsum(w, dtype=np.float64)
        b = ((c[8:] - c[:-8]) / 8.0)[:n]
        return (b * (0.01 / b.std())).astype(np.float32)

    for i in range(n_files):
        wav = base + bl_noise(base.shape[0])
        p = os.path.join(tmp, f"conv_{i}.wav")
        write_wav(p, wav, SR)
        paths.append(p)

    # max_decode_tokens=64: random-init weights never emit EOT, so an
    # uncapped decode always burns the full 224-token budget — real speech
    # at whisper's ~3.2 tokens/s yields well under 64 for these <=12 s
    # segments, so 64 matches trained-checkpoint decode cost.
    # max_fallback_attempts=1: random weights fail whisper's quality gates
    # on every row, so the fallback ladder would retry every batch at every
    # rung; trained checkpoints retry rarely, so a single rung measures the
    # trained-like cost.
    import dataclasses

    from clearconverse_tpu.config import tpu_config_from_env

    # temperature=0.0 (default): one greedy replica per row — decode cost
    # comparable across rounds. --engine-temperature 0.1 measures the
    # REFERENCE-default config instead (whisper scalar temp => best_of=5
    # sampled replicas on every first decode — 5x decode rows).
    cfg = Config(noise_reduction_amount=0.2, temperature=temperature)
    _ensure_models(budget_s)
    # CC_TPU_* env overrides apply (e.g. CC_TPU_PAD_FULL_WINDOW=0 measures
    # the bucketed-encoder-context lever); bench-specific knobs win.
    tpu = dataclasses.replace(tpu_config_from_env(),
                              diarization_onset=0.35,
                              diarization_offset=0.25,
                              max_decode_tokens=64, max_fallback_attempts=1)
    engine = TranscriptionEngine(cfg, tpu, load_models_immediately=True)

    results = engine.process_files(paths)            # cold: compiles
    cold_extra = 0
    for _ in range(2 if temperature > 0 else 0):
        # Sampling rungs make the long-path decode SHAPES data-dependent
        # (successor-window spawn counts follow sampled timestamps →
        # varying row/prompt buckets), and each first-per-process dispatch
        # pays executable install — minutes under congestion even on cache
        # hits. One cold pass cannot cover a stochastic shape set; two
        # more make the timed passes measure the converged steady state a
        # long-lived server reaches (measured: pass 0/1 compiled fresh
        # shapes, passes 2+ ran 0.6 s decode vs 30-40 s). Budget guard:
        # skip the extra cold passes when the clock is already deep.
        if _remaining(budget_s) < _MIN_ENGINE_S:
            break
        engine.process_files(paths)
        cold_extra += 1
    # Per-pass timing, report the BEST pass as the headline: the engine
    # path is host<->device-transfer-bound and the tunnel's throughput
    # swings ~3x between congestion windows (measured 35-90x for identical
    # code within an hour), so a single-pass sample mostly measures the
    # tunnel's mood. Best-of-N is the machine's capability; the mean is
    # kept alongside.
    per_pass, pass_stages, truncated, results = _run_passes(
        engine, paths, repeats, budget_s)

    # Explicit keys (no ambiguous "rtfx_warm"): _best is the headline —
    # the machine's capability — _mean includes whatever congestion the
    # measurement window had.
    pass_audio = sum(len(base) / SR for _ in paths)
    segs = sum(len(r["segments"]) for r in results if r)
    load_source = dict(getattr(engine.models, "load_source", {}))
    if _share is not None:
        _share["engine"] = engine
        _share["paths"] = paths
        _share["pass_audio"] = pass_audio
    out = _warm_report(per_pass, pass_stages, truncated, pass_audio)
    out.update(
        {"audio_seconds": round(pass_audio * len(per_pass), 1),
         "files": n_files, "segments_per_pass": segs,
         # What actually crossed the tunnel for the audio upload —
         # format/width/bytes — so BENCH_r*.json proves the default
         # packed wire engaged (VERDICT r3 next #5).
         "wire": dict(getattr(engine, "last_run_wire", {})),
         # The exact knob set this number was measured with — engine
         # bench config deliberately diverges from the parity defaults
         # (random weights; see module docstring) and the JSON must say
         # so (VERDICT r2 weak #6).
         "knobs": {"temperature": cfg.temperature,
                   "max_decode_tokens": tpu.max_decode_tokens,
                   "max_fallback_attempts": tpu.max_fallback_attempts,
                   "best_of": tpu.best_of,
                   "diarization_onset": tpu.diarization_onset,
                   "diarization_offset": tpu.diarization_offset,
                   "pad_to_full_window": tpu.pad_to_full_window,
                   "cross_kv_bits": tpu.cross_kv_bits,
                   "self_kv_bits": tpu.self_kv_bits,
                   "wire_bits": tpu.wire_bits,
                   "transcription_batch_size": cfg.transcription_batch_size,
                   # Derived, not asserted: the bundle records where each
                   # family's weights came from, so a populated ./models
                   # (eval/dress_rehearsal or real downloads) flips this
                   # and BENCH_r*.json proves the converter path ran
                   # (VERDICT r4 #3). ALL four families must be converted
                   # weights ("checkpoint" from model_dir or "payload"
                   # from a hot-swap) — a whisper-only ./models would
                   # otherwise mislabel a mixed run.
                   "random_weights": any(
                       load_source.get(f) not in ("checkpoint", "payload")
                       for f in ("whisper", "ecapa", "pyannet",
                                 "sepformer")),
                   "load_source": load_source}})
    if temperature > 0:
        out["knobs"]["extra_cold_passes"] = cold_extra
    return out


def _warm_report(per_pass, pass_stages, truncated, pass_audio: float) -> dict:
    """Shared warm-pass report block (engine + ref-default benches must
    not drift in schema — review r5): explicit best/mean RTFx keys (best
    is the machine's capability; the mean includes whatever congestion
    the window had), raw per-pass wall clocks (makes install skew on any
    single pass visible — VERDICT r4 weak #3), and per-pass MEDIAN
    stage_seconds (VERDICT r4 #2a — pass-summed stages made one
    install-skewed pass read as a stage regression)."""
    stage_med, stage_counts = _stage_medians(pass_stages)
    out = {"rtfx_warm_best": round(pass_audio / min(per_pass), 2),
           "rtfx_warm_mean": round(
               pass_audio * len(per_pass) / sum(per_pass), 2),
           "warm_passes": len(per_pass),
           "per_pass_s": [round(t, 3) for t in per_pass],
           "stage_seconds": stage_med}
    if stage_counts:
        # Stages that did NOT run in every warm pass — their median covers
        # only the passes listed here (see _stage_medians).
        out["stage_counts"] = stage_counts
    if truncated:
        out["budget_truncated"] = True
    return out


def bench_ref_default(engine, paths, pass_audio: float,
                      budget_s: float) -> dict:
    """Engine RTFx at the REFERENCE's default decode config — whisper
    scalar temperature 0.1 => best_of=5 sampled replicas on every first
    decode (/root/reference/back/api.py:128) — through the SAME warm
    engine (config is read per call, so only the decode programs change).

    Runs as part of the default bench so the honest "matching the
    reference at ITS defaults" figure is driver-captured instead of
    builder-attested (VERDICT r4 #2b). Sampling makes the long-path
    decode shapes data-dependent, so up to 3 cold passes absorb the
    per-process installs before the 2 timed ones."""
    prev = engine.config.temperature
    engine.config.temperature = 0.1
    try:
        cold = 0
        for _ in range(3):
            if cold and _remaining(budget_s) < _MIN_ENGINE_S / 2:
                break
            engine.process_files(paths)
            cold += 1
        per_pass, pass_stages, truncated, _ = _run_passes(
            engine, paths, 2, budget_s)
        out = _warm_report(per_pass, pass_stages, truncated, pass_audio)
        out["knobs"] = {"temperature": 0.1, "best_of": 5,
                        "cold_passes": cold}
        return out
    finally:
        engine.config.temperature = prev


def bench_latency(repeats: int = 4, engine=None) -> dict:
    """Single-request latency: wall clock from file path to finished
    transcript for ONE 60 s conversation through a WARM engine — the
    user-felt number (the engine modes measure batch throughput). Runs in
    the default bench too (VERDICT r4 #2b) by reusing the engine-bench
    engine; the B=1 program shapes pay one-time (persistent-cached)
    compiles."""
    import tempfile

    import numpy as np

    from clearconverse_tpu.audio.wav import write_wav
    from clearconverse_tpu.pipeline.dev_backend import (
        SR, synth_conversation_speech)

    tmp = tempfile.mkdtemp(prefix="cc_lat_")
    wav = np.tile(synth_conversation_speech(), 5)
    p = os.path.join(tmp, "one.wav")
    write_wav(p, wav, SR)
    if engine is None:
        import dataclasses

        from clearconverse_tpu.config import Config, tpu_config_from_env
        from clearconverse_tpu.pipeline.engine import TranscriptionEngine
        cfg = Config(noise_reduction_amount=0.2, temperature=0.0)
        _ensure_models()
        tpu = dataclasses.replace(tpu_config_from_env(),
                                  diarization_onset=0.35,
                                  diarization_offset=0.25,
                                  max_decode_tokens=64,
                                  max_fallback_attempts=1)
        engine = TranscriptionEngine(cfg, tpu, load_models_immediately=True)
    engine.process_files([p])                      # cold: compiles
    laps = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        engine.process_files([p])
        laps.append(time.perf_counter() - t0)
    return {"latency_best_s": round(min(laps), 3),
            "latency_mean_s": round(sum(laps) / len(laps), 3),
            "audio_seconds": round(len(wav) / SR, 1),
            "wire": dict(getattr(engine, "last_run_wire", {})),
            "stage_seconds": {k: round(v, 3) for k, v in sorted(
                getattr(engine, "last_run_stage_times", {}).items(),
                key=lambda kv: -kv[1])}}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="small.en",
                    help="whisper size for the hot path (full registry: "
                    "tiny..large-v3-turbo, .en variants)")
    ap.add_argument("--batch", type=int, default=128,
                    help="30 s segments per device program (B=128 is the "
                    "measured throughput sweet spot with head-major KV; "
                    "B=256 regresses)")
    ap.add_argument("--decode-tokens", type=int, default=96,
                    help="tokens decoded per segment (~3.2 tok/s of speech)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--kv-bits", type=int, default=8, choices=(16, 8, 4),
                    help="cross-attention KV width (the decode loop is "
                    "cross-KV-streaming-bound; 8-bit = 2.3x decode at B=32)")
    ap.add_argument("--self-kv-bits", type=int, default=16, choices=(16, 8),
                    help="self-attention cache width (int8 halves the "
                    "per-step cache stream, exact per-position scales)")
    ap.add_argument("--engine-files", type=int, default=8,
                    help="synthetic conversations per engine pass")
    ap.add_argument("--engine-repeats", type=int, default=3)
    ap.add_argument("--engine-temperature", type=float, default=0.0,
                    help="0.1 = the reference's default config (best_of=5 "
                    "sampled replicas per first decode; 5x decode rows)")
    def _env_budget() -> float:
        # Defensive: a malformed CC_BENCH_BUDGET_S must not crash the
        # bench before the hot-path line prints (the exact zero-output
        # failure the flushed-first-line design exists to prevent).
        try:
            return float(os.environ.get("CC_BENCH_BUDGET_S", "2400"))
        except ValueError:
            print("bench: ignoring malformed CC_BENCH_BUDGET_S="
                  f"{os.environ['CC_BENCH_BUDGET_S']!r}; using 2400",
                  file=sys.stderr)
            return 2400.0

    ap.add_argument("--budget", type=float, default=_env_budget(),
                    help="wall-clock budget in seconds from process start "
                    "(CC_BENCH_BUDGET_S); the engine bench degrades to "
                    "fewer warm passes and finally to a skipped block "
                    "rather than outliving it")
    ap.add_argument("--skip-engine", action="store_true",
                    help="hot path only (also CC_BENCH_SKIP_ENGINE=1)")
    ap.add_argument("--engine-only", action="store_true",
                    help="skip the hot path (fast iteration on the engine "
                    "stage breakdown)")
    ap.add_argument("--latency", action="store_true",
                    help="single-file request latency through a warm "
                    "engine (opt-in: B=1 shapes pay one-time compiles)")
    args = ap.parse_args()

    import jax

    # Persistent compilation cache: first-ever compile of the small.en
    # pipeline takes minutes over the device tunnel; subsequent runs hit
    # the cache.
    from clearconverse_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()

    if args.latency:
        _emit({"metric": "engine_latency", "unit": "seconds",
               "latency": bench_latency()})
        return
    if args.engine_only:
        # Same zero-output insurance as the default path: flush a pending
        # line before any compile work so a driver timeout mid-ladder
        # still leaves parseable stdout (VERDICT r3 weak #1).
        _emit({"metric": "engine_only", "unit": "x_realtime_per_chip",
               "engine": {"status": "pending"}})
        _emit({"metric": "engine_only", "unit": "x_realtime_per_chip",
               "engine": bench_engine(args.engine_files,
                                      args.engine_repeats,
                                      args.engine_temperature,
                                      budget_s=args.budget)})
        return

    import jax.numpy as jnp

    from clearconverse_tpu.audio.mel import log_mel_auto
    from clearconverse_tpu.models.decoding import (
        DecodeOptions, build_prompt_batch, greedy_decode)
    from clearconverse_tpu.models.whisper import init_whisper_params, model_dims

    dims = model_dims(args.model)
    params = init_whisper_params(jax.random.PRNGKey(0), dims)
    params = jax.device_put(params)

    B, seg_sec, sr = args.batch, 30.0, 16000
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, int(seg_sec * sr))).astype(np.float32) * 0.1)

    opts = DecodeOptions(max_tokens=args.decode_tokens, temperature=0.0,
                         eot=-1,  # never matches → fixed decode length
                         suppress_blank=False, compute_dtype=jnp.bfloat16,
                         cross_kv_bits=args.kv_bits,
                         self_kv_bits=args.self_kv_bits)
    prompts, lens = build_prompt_batch([[50257]] * B, 1, pad_id=50256)
    prompts, lens = jnp.asarray(prompts), jnp.asarray(lens)

    @jax.jit
    def pipeline(params, audio):
        mel = log_mel_auto(audio, n_mels=dims.n_mels)
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

    line = {
        # NOTE: the default (--model small.en) must keep producing the
        # historical key "whisper_small_en_rtfx" — longitudinal tooling
        # (BENCH_r*.json) is keyed on it (ADVICE r2).
        "metric": f"whisper_{args.model.replace('.', '_').replace('-', '_')}_rtfx",
        "value": round(rtfx, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtfx / 50.0, 3),
    }
    run_engine = (not args.skip_engine
                  and os.environ.get("CC_BENCH_SKIP_ENGINE") != "1")
    if run_engine:
        # Flush the hot-path record NOW, before any engine compile work:
        # if the engine bench outlives the driver's timeout, this line is
        # already on stdout and the round still lands a parsed number
        # (round 3 landed none — VERDICT r3 weak #1). The final merged
        # line is printed LAST so a last-line parser gets the full record.
        _emit({**line, "engine": {"status": "pending"}})
        remaining = _remaining(args.budget)
        share: dict = {}
        if remaining < _MIN_ENGINE_S:
            line["engine"] = {"skipped": "budget",
                              "remaining_s": round(remaining, 1)}
        else:
            try:
                line["engine"] = bench_engine(args.engine_files,
                                              args.engine_repeats,
                                              args.engine_temperature,
                                              budget_s=args.budget,
                                              _share=share)
            except Exception as exc:  # noqa: BLE001 — keep the headline
                line["engine"] = {"error": f"{type(exc).__name__}: {exc}"}
        # Bank the measured engine numbers NOW: the ref-default and latency
        # stages below can pay multi-minute per-process installs, and a
        # driver kill there must not lose an already-measured engine block
        # (the flushed-line un-killable design, VERDICT r3 #1 — a last-line
        # parser sees this record until the final merged line replaces it).
        _emit(line)
        # VERDICT r4 #2b: the reference-default decode config and the warm
        # single-request latency ride in the SAME driver-captured line,
        # reusing the already-warm engine. Each block is budget-guarded
        # and failure-isolated — the merged line always prints.
        if share.get("engine") is not None and args.engine_temperature == 0.0:
            if _remaining(args.budget) > _MIN_ENGINE_S:
                try:
                    line["engine_ref_default"] = bench_ref_default(
                        share["engine"], share["paths"],
                        share["pass_audio"], args.budget)
                except Exception as exc:  # noqa: BLE001
                    line["engine_ref_default"] = {
                        "error": f"{type(exc).__name__}: {exc}"}
            else:
                line["engine_ref_default"] = {"skipped": "budget"}
            if _remaining(args.budget) > _MIN_ENGINE_S / 2:
                try:
                    line["latency"] = bench_latency(engine=share["engine"])
                except Exception as exc:  # noqa: BLE001
                    line["latency"] = {"error": f"{type(exc).__name__}: {exc}"}
            else:
                line["latency"] = {"skipped": "budget"}
    _emit(line)


if __name__ == "__main__":
    main()

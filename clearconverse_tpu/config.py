"""Pipeline configuration and environment loading.

Mirrors the reference's ``Config`` dataclass (back/api.py:113-135) and
``load_environment`` (back/api.py:77-92) so that sweep configs written for the
reference eval harness (back/test.py:1256-1263) map 1:1 onto this framework.

Differences from the reference, recorded explicitly:
  * ``transcription_batch_size`` is declared-but-dead in the reference
    (grep-verified, SURVEY.md §2.1). Here it is REAL: the batch planner pads
    segments into length buckets of at most this many items per device program.
  * New TPU-specific knobs live in their own dataclass (``TPUConfig``) instead
    of being mixed into pipeline hyperparameters.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


@dataclasses.dataclass
class Config:
    """Pipeline hyperparameters (reference back/api.py:113-135, same defaults)."""

    auth_token: Optional[str] = None
    target_sample_rate: int = 16000
    min_segment_duration: float = 0.45
    overlap_threshold: float = 0.50          # minimum overlap duration (api.py:888)
    condition_on_previous_text: bool = True
    merge_gap_threshold: float = 0.50
    max_embedding_segments: int = 100
    use_vad_refinement: bool = True
    noise_reduction_amount: float = 0.50
    use_speaker_embeddings: bool = True
    temperature: float = 0.1
    max_speakers: int = 2
    min_speakers: int = 1
    whisper_model_size: str = "small.en"
    sliding_window_size: float = 0.80
    sliding_window_step: float = 0.40
    secondary_diarization_threshold: float = 0.30
    # Declared in the reference but never read there (SURVEY.md §2.1).
    # transcription_batch_size is live here (pipeline/batching.py).
    min_overlap_duration_for_separation: float = 0.50
    enhance_separated_audio: bool = True
    speaker_embedding_threshold: float = 0.40
    # 32 measured on v5e: a 32-file pass runs 64x -> 167x RTFx vs cap 8
    # (the cap split rows into sequential decode batches); single-file
    # requests are unaffected (batches only grow when the ready set does).
    transcription_batch_size: int = 32
    transcribe_overlaps_individually: bool = True

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass
class TPUConfig:
    """TPU execution knobs (new; no reference counterpart — SURVEY.md §2.5)."""

    # Duration buckets (seconds) that segments are padded into before batching.
    # Whisper's own window is 30 s; shorter buckets avoid wasted encoder FLOPs.
    duration_buckets: tuple = (5.0, 10.0, 30.0)
    # Mesh axis sizes; data axis shards the segment batch, model axis shards
    # attention heads / MLP (tensor parallel) when > 1.
    data_axis: int = 1
    model_axis: int = 1
    # Max decoded tokens per segment program (Whisper small.en ctx is 448).
    max_decode_tokens: int = 224
    # Cap on the temperature schedule length when the transcribe caller
    # passes a TUPLE temperature (whisper's fallback ladder; 1 disables
    # fallback). A SCALAR temperature is one rung by whisper semantics —
    # the reference's default (scalar 0.1, back/api.py:128) never ladders.
    max_fallback_attempts: int = 3
    # Independent samples drawn per row on ANY sampling rung (temperature
    # > 0), best kept by sum_logprob/length — whisper's ``best_of``
    # (DecodingOptions default 5) + MaximumLikelihoodRanker. With the
    # reference's scalar temperature=0.1 this fires on the first (only)
    # decode of every batch, replicating each row 5x (VERDICT r2 #1);
    # greedy rungs (t == 0) always decode one sample per row.
    best_of: int = 5
    # Beam width for GREEDY rungs (temperature == 0) — whisper
    # DecodingOptions(beam_size), which openai-whisper transcribe applies
    # on t=0 rungs exactly as best_of applies on t>0 rungs. 0/1 = plain
    # greedy (the reference's default scalar temperature=0.1 never decodes
    # at t=0, so this ships off). Beams share the encoder forward and the
    # cross-KV stream per source row (models/decoding.beam_decode).
    beam_size: int = 0
    # Whisper's silence skip rule (transcribe defaults): a row is emitted
    # empty when no_speech_prob > no_speech_threshold AND its avg logprob
    # fails logprob_threshold (back/api.py:1286-1296 inherits this via
    # whisper_model.transcribe).
    no_speech_threshold: float = 0.6
    logprob_threshold: float = -1.0
    # Pad every segment to whisper's full 30 s window (reference-exact
    # numerics). False = pad only to the duration bucket: 3-6x less encoder
    # compute + cross-KV streaming for short segments, at a small quality
    # risk (whisper is trained on 30 s windows).
    pad_to_full_window: bool = True
    # Cross-attention KV storage width for the decode loop (16/8/4).
    cross_kv_bits: int = 8
    # Self-attention cache width (16/8): int8 halves the per-step cache
    # stream with exact per-position scale folding (+1-2% RTFx measured;
    # default stays full precision for parity purity).
    self_kv_bits: int = 16
    # Host->device audio wire format. 0 (default) = LOSSLESS delta
    # bit-packing (audio/pack.py): 25-45% fewer upload bytes with a
    # bit-identical device-side batch, so it needs no quality sign-off
    # (falls back to raw int16 when no delta order fits 13 bits —
    # pack.AUTO_MAX_WIDTH — or the native packer is unavailable).
    # 16 = raw int16. 8 = opt-in mu-law (audio/wire.py): HALF the bytes
    # on BOTH tunnel legs at ~38 dB companding SNR — flip via
    # CC_TPU_WIRE_BITS=8 after a WER check on real checkpoints.
    wire_bits: int = 0
    # First-party Pallas encoder-attention kernel in its winning regime
    # (TPU, B<=48; models/whisper._use_pallas_attn). False pins the einsum
    # attention everywhere so encoder numerics never depend on batch
    # composition — set for parity-sensitive eval runs (ADVICE r2).
    pallas_encoder_attn: bool = True
    # Download the gated-audio batch on a worker thread, overlapped with
    # the engine's device-side analysis phases (True, default) vs
    # synchronously inside the load stage (False). The overlap contends
    # with the analysis phases' tunnel RPCs (segmentation measured
    # 0.09 -> 0.47 s/pass under it) but hides the download's own
    # 0.2-0.6 s/pass; A/B via CC_TPU_HOST_ASYNC per deployment.
    host_async_download: bool = True
    # Compute dtype for matmuls (MXU-native).
    compute_dtype: str = "bfloat16"
    # Run all Pallas kernels in interpreter mode (CPU testing).
    pallas_interpret: bool = False
    # Segmentation binarization hysteresis (pyannote pipeline hyperparams;
    # None = the 0.5 defaults). Lowered values make segments emerge from
    # random-init weights — used by bench.py --engine and validation runs.
    diarization_onset: Optional[float] = None
    diarization_offset: Optional[float] = None
    # AHC cosine-distance merge threshold for speaker clustering (pyannote
    # diarization-3.1 exposes the same pipeline hyperparameter, ~0.7 in its
    # published config; None = our 0.7 default). The multichip dryrun
    # lowers it so random-init embeddings still split two speakers.
    diarization_cluster_threshold: Optional[float] = None
    # Transcription language for MULTILINGUAL whisper models (prompt becomes
    # [sot, <|lang|>, <|transcribe|>, ...]); ignored by .en models. The
    # reference pins small.en, so "en" is the faithful default. ``None``
    # auto-detects per row (whisper detect_language: one [sot] forward,
    # argmax over the language-token logits — models/decoding.
    # detect_language_from_audio).
    language: Optional[str] = "en"


def tpu_config_from_env(env: Optional[dict] = None) -> "TPUConfig":
    """TPUConfig with ``CC_TPU_*`` environment overrides — the serving
    entry point's way to select mesh axes and decode knobs without code
    changes (no reference counterpart; these knobs are TPU-new)."""
    src = env if env is not None else os.environ
    kw = {}
    for var, field, cast in (
        ("CC_TPU_DATA_AXIS", "data_axis", int),
        ("CC_TPU_MODEL_AXIS", "model_axis", int),
        ("CC_TPU_CROSS_KV_BITS", "cross_kv_bits", int),
        ("CC_TPU_SELF_KV_BITS", "self_kv_bits", int),
        ("CC_TPU_WIRE_BITS", "wire_bits", int),
        ("CC_TPU_MAX_FALLBACK", "max_fallback_attempts", int),
        ("CC_TPU_BEST_OF", "best_of", int),
        ("CC_TPU_BEAM_SIZE", "beam_size", int),
        ("CC_TPU_COMPUTE_DTYPE", "compute_dtype", str),
        ("CC_TPU_PALLAS_ENC", "pallas_encoder_attn",
         lambda v: v not in ("0", "false", "False")),
        ("CC_TPU_PAD_FULL_WINDOW", "pad_to_full_window",
         lambda v: v not in ("0", "false", "False")),
        ("CC_TPU_HOST_ASYNC", "host_async_download",
         lambda v: v not in ("0", "false", "False")),
        # "auto" => None => per-row language detection (multilingual only).
        ("CC_TPU_LANGUAGE", "language",
         lambda v: None if v == "auto" else v),
    ):
        raw = src.get(var)
        if raw not in (None, ""):
            kw[field] = cast(raw)
    return TPUConfig(**kw)


def parse_env_file(path: str) -> dict:
    """Tiny .env parser (python-dotenv is not vendored; reference used it at
    back/api.py:77-92). Supports comments, blank lines, ``KEY=VALUE`` and
    optional surrounding quotes."""
    out = {}
    if not os.path.exists(path):
        return out
    with open(path, "r", encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, _, val = line.partition("=")
            key, val = key.strip(), val.strip()
            if len(val) >= 2 and val[0] == val[-1] and val[0] in "\"'":
                val = val[1:-1]
            out[key] = val
    return out


def load_environment() -> dict:
    """Reference back/api.py:77-92: read ``ENV_FILE`` (default ``.env``),
    overlay onto os.environ-derived settings, return the serving config."""
    env_file = os.environ.get("ENV_FILE", ".env")
    file_vars = parse_env_file(env_file)

    def get(key: str, default: str = "") -> str:
        return os.environ.get(key, file_vars.get(key, default))

    return {
        "api_host": get("API_HOST", "0.0.0.0"),
        "api_port": int(get("API_PORT", "8000")),
        "cors_origins": get("CORS_ORIGINS", "*"),
        "model_cache_dir": get("MODEL_CACHE_DIR", "./models"),
        "hf_auth_token": get("HF_AUTH_TOKEN", "") or None,
    }

"""Whisper transcribe() control-flow equality against a sequential
mini-reference (VERDICT r3 next #3).

tests/test_whisper.py proves encoder/decoder/greedy numerics vs HF torch;
the remaining correctness risk lives a level UP — the temperature ladder,
best_of ranking, no-speech gate, timestamp-seek, and rolling-prompt reset
that openai-whisper's ``transcribe()`` implements and the reference
consumes at back/api.py:1282-1296. This file reimplements that decision
flow as a ~150-line SEQUENTIAL oracle (MiniTranscribe) and asserts the
production path — TranscriptionEngine._transcribe_wavefront →
ModelBundle.transcribe_long_batch → _decode_with_fallback — makes
byte-identical decisions: every decode call (window start, rung
temperature, replica index, exact left-trimmed prompt token ids) and the
final transcript.

Both sides share ONE deterministic scripted decoder (the black-box
"model"), injected under models.decoding.greedy_decode_from_audio for the
production side and called directly by the oracle — so any divergence is
control flow, not model numerics. The script exercises: a failed greedy
rung retried up the ladder, best_of ranking (MaximumLikelihoodRanker
sum_logprob/length), the no-speech skip that also CLEARS fallback, the
<1 s-advance progress guard, consecutive-timestamp-pair seek slicing, the
single-trailing-timestamp keep-all rule, the >0.5-temperature prompt
reset, and token-level rolling prompts with the n_text_ctx//2-1 tail trim.

Documented deviations from openai-whisper reproduced in the oracle (all
also documented at their implementation sites):
  * advance < 1 s keeps ALL text and advances the full window
    (transcribe_long_batch: progress guarantee);
  * a window is spawned only while > 0.1 s of audio remains
    (engine.spawn_next_window);
  * windows ending [text, <ts>] keep all text and advance the full
    window even when earlier consecutive pairs exist.
"""

import zlib

import numpy as np
import pytest

import jax

from clearconverse_tpu.config import Config, TPUConfig
from clearconverse_tpu.models.tokenizer import ByteFallbackTokenizer
from clearconverse_tpu.models.whisper import WhisperDims, init_whisper_params
from clearconverse_tpu.pipeline.bundle import ModelBundle
from clearconverse_tpu.pipeline.engine import TranscriptionEngine

SR = 16000
WIN = 30 * SR
PRECISION = 0.02

TOK = ByteFallbackTokenizer(english=True)
SP = TOK.specials
TSB = SP.timestamp_begin


def ts(sec: float) -> int:
    return TSB + int(round(sec / PRECISION))


def enc(text: str):
    return list(TOK.encode(text))


# ----------------------------------------------------------------- script
# The shared black-box "model": (window_start_s, temperature, replica) ->
# (token ids, sum_logprob, no_speech_prob). Deterministic; replica index
# stands in for the sampling rng. Window starts are read from the audio
# itself (the test audio is a t/SR ramp, so sample 0 of a window IS its
# start time in seconds).

GOOD0 = [ts(0.0)] + enc(" hello alpha") + [ts(0.4), ts(0.4)] + enc(" beta")
KEPT1_FULL = [ts(0.0)] + enc(" bravo charlie") + [ts(26.0), ts(26.0)]
GOOD3 = [ts(0.0)] + enc(" delta") + [ts(6.0), ts(6.0)]
GOOD4 = ([ts(0.0)] + enc(" echo") + [ts(2.0), ts(2.0)]
         + enc(" foxtrot") + [ts(8.0)])

SCRIPT = {
    # window @0 s: greedy rung fails the logprob gate; t=0.2 best_of=2
    # replicas — replica 0 wins the rank. Its last complete pair ends at
    # 0.4 s -> the <1 s progress guard keeps everything, advances 30 s.
    (0, 0.0): {0: (enc(" zz"), -80.0, 0.1)},
    (0, 0.2): {0: (GOOD0, -2.0, 0.1), 1: (enc(" wrong"), -30.0, 0.1)},
    # window @30 s: clean greedy; ends with a consecutive pair -> slice,
    # advance 26 s.
    (30, 0.0): {0: (KEPT1_FULL, -3.0, 0.1)},
    # window @56 s: no-speech (nsp 0.9 > 0.6, avg logprob fails) -> the
    # segment is SKIPPED and, critically, never retried up the ladder.
    (56, 0.0): {0: (enc(" noise"), -70.0, 0.9)},
    # window @86 s: fails rungs 0.0/0.2/0.4, succeeds at 0.6 (> 0.5 ->
    # prompt reset after this window). Advance 6 s.
    (86, 0.0): {0: (enc(" gg"), -60.0, 0.1)},
    (86, 0.2): {0: (enc(" g2"), -50.0, 0.1), 1: (enc(" g2b"), -55.0, 0.1)},
    (86, 0.4): {0: (enc(" g4"), -40.0, 0.1), 1: (enc(" g4b"), -45.0, 0.1)},
    (86, 0.6): {0: (GOOD3, -1.5, 0.1), 1: (enc(" g6b"), -20.0, 0.1)},
    # window @92 s: greedy success ending [text, <ts>] -> single-trailing-
    # timestamp rule keeps all, advances the remaining 16 s. Its prompt
    # must be BARE [sot] (the 0.6-rung window reset the rolling context).
    (92, 0.0): {0: (GOOD4, -2.0, 0.1)},
}
TOTAL_S = 108


def decode_one(start: int, temp: float, k: int):
    spec = SCRIPT[(start, round(float(temp), 2))]
    return spec[k if k in spec else 0]


def make_fake_decode(log):
    """Adapter shaped like models.decoding.greedy_decode_from_audio: maps
    each output row through decode_one and records (start, temp, replica,
    prompt ids) — the prompt exactly as the device program would see it
    (left-padded rows; ids at toks[r, max_p-len:])."""

    def fake(params, audio, toks, lens, dims, opts, max_p, rng=None,
             target_len=None):
        audio = np.asarray(audio)
        toks = np.asarray(toks)
        lens = np.asarray(lens)
        rep = max(int(opts.replicas), 1)
        R = toks.shape[0]
        assert R == audio.shape[0] * rep, (R, audio.shape[0], rep)
        mt = int(opts.max_tokens)
        tokens = np.full((R, mt), opts.eot, np.int32)
        lengths = np.zeros((R,), np.int32)
        slp = np.zeros((R,), np.float32)
        nsp = np.zeros((R,), np.float32)
        for r in range(R):
            u, k = r // rep, r % rep
            start = int(round(float(audio[u, 0])))
            ids, s, n = decode_one(start, float(opts.temperature), k)
            prompt = toks[r, toks.shape[1] - int(lens[r]):].tolist()
            log.append((start, round(float(opts.temperature), 2), k, prompt))
            tokens[r, : len(ids)] = ids
            lengths[r] = len(ids)
            slp[r] = s
            nsp[r] = n
        return {"tokens": tokens, "lengths": lengths, "sum_logprob": slp,
                "no_speech_prob": nsp}

    return fake


# ----------------------------------------------------------- mini-oracle

class MiniTranscribe:
    """Sequential openai-whisper transcribe() decision flow (with the
    module-docstring deviations), written independently of the production
    code: one window at a time, explicit all_tokens/prompt_reset_since."""

    def __init__(self, tpu: TPUConfig, ladder, cond_prev: bool, log,
                 ctx_keep: int, start_offset: int = 0):
        self.tpu = tpu
        self.ladder = list(ladder)[: max(1, tpu.max_fallback_attempts)]
        self.cond_prev = cond_prev
        self.log = log
        self.ctx_keep = ctx_keep
        self.off = start_offset

    def _prompt_rows(self, prompt_ids):
        if prompt_ids:
            return [SP.sot_prev] + list(prompt_ids)[-self.ctx_keep:] + [SP.sot]
        return [SP.sot]

    def _decode_with_fallback(self, start_s: int, prompt_rows):
        first_nsp = None
        kept = None
        for ti, temp in enumerate(self.ladder):
            rep = (max(1, self.tpu.best_of) if temp > 0
                   else max(1, self.tpu.beam_size))
            cands = []
            for k in range(rep):
                ids, s, n = decode_one(self.off + start_s, temp, k)
                self.log.append((self.off + start_s, round(temp, 2), k,
                                 list(prompt_rows)))
                cands.append((ids, s, n))
            ids, s, n = max(cands, key=lambda c: c[1] / max(len(c[0]), 1))
            if first_nsp is None:
                first_nsp = n          # whisper keeps the first-rung
            #                            no-speech estimate across retries
            avg = s / max(len(ids) + 1, 1)
            kept = (ids, avg, temp)
            if first_nsp > self.tpu.no_speech_threshold:
                break                  # silence clears fallback outright
            text = TOK.decode([t for t in ids if t < SP.eot])
            data = text.encode("utf-8")
            ratio = (len(data) / len(zlib.compress(data))) if data else 0.0
            if ratio <= 2.4 and avg >= self.tpu.logprob_threshold:
                break
        return kept[0], kept[1], first_nsp, kept[2]

    def run(self, total_samples: int):
        all_tokens = []
        reset_since = 0
        texts = []
        seek = 0
        while total_samples - seek > int(0.1 * SR):
            wlen = min(WIN, total_samples - seek)
            win_s = min(wlen / SR, 30.0)
            prompt_rows = (self._prompt_rows(all_tokens[reset_since:])
                           if self.cond_prev else self._prompt_rows([]))
            ids, avg, nsp, temp = self._decode_with_fallback(
                seek // SR, prompt_rows)
            if (nsp > self.tpu.no_speech_threshold
                    and avg <= self.tpu.logprob_threshold):
                seek += int(win_s * SR)     # skip; no tokens, no reset
                continue
            is_ts = [t >= TSB for t in ids]
            single_ending = (len(ids) >= 2 and not is_ts[-2] and is_ts[-1]
                             or len(ids) == 1 and is_ts[-1])
            pairs = [j + 1 for j in range(len(ids) - 1)
                     if is_ts[j] and is_ts[j + 1]]
            if pairs and not single_ending:
                last = pairs[-1]
                kept, advance = ids[:last], (ids[last - 1] - TSB) * PRECISION
                if advance < 1.0:
                    kept, advance = ids, win_s
            else:
                kept, advance = ids, win_s
            texts.append(TOK.decode([t for t in kept if t < SP.eot]))
            all_tokens.extend(kept)
            if not self.cond_prev or temp > 0.5:
                reset_since = len(all_tokens)
            seek += int(min(advance, win_s) * SR)
        return " ".join(t.strip() for t in texts).strip()


# ------------------------------------------------------------- fixtures

DIMS = WhisperDims(n_mels=80, n_vocab=51864, n_audio_ctx=1500,
                   n_audio_state=64, n_audio_head=2, n_audio_layer=1,
                   n_text_ctx=32, n_text_state=64, n_text_head=2,
                   n_text_layer=1)
LADDER = (0.0, 0.2, 0.4, 0.6)


def make_engine(log):
    tpu = TPUConfig(max_decode_tokens=48, max_fallback_attempts=4,
                    best_of=2, beam_size=0, compute_dtype="float32")
    cfg = Config(temperature=LADDER, condition_on_previous_text=True)
    b = ModelBundle(cfg, tpu)
    b._whisper = (init_whisper_params(jax.random.PRNGKey(0), DIMS), DIMS,
                  TOK)
    b._loaded = True
    eng = TranscriptionEngine(cfg, tpu, models=b)
    return eng, tpu


def ramp_audio(total_s: int, offset_s: int = 0) -> np.ndarray:
    return (np.arange(total_s * SR, dtype=np.float64) / SR
            + offset_s).astype(np.float32)


def run_production(items, monkeypatch):
    log = []
    eng, _ = make_engine(log)
    from clearconverse_tpu.models import decoding
    monkeypatch.setattr(decoding, "greedy_decode_from_audio",
                        make_fake_decode(log))
    eng._transcribe_wavefront(items, SR)
    return log, [it["text"] for it in items]


def test_control_flow_matches_mini_reference(monkeypatch):
    items = [dict(audio=ramp_audio(TOTAL_S), prompt="", depends_on=None,
                  store_ref=None)]
    prod_log, prod_texts = run_production(items, monkeypatch)

    mini_log = []
    tpu = TPUConfig(max_decode_tokens=48, max_fallback_attempts=4,
                    best_of=2, beam_size=0)
    mini = MiniTranscribe(tpu, LADDER, cond_prev=True, log=mini_log,
                          ctx_keep=DIMS.n_text_ctx // 2 - 1)
    mini_text = mini.run(TOTAL_S * SR)

    # Byte-identical decision trail: every decode call in order, with the
    # window start, rung temperature, replica index, and the EXACT prompt
    # token ids the decoder saw.
    assert prod_log == mini_log
    assert prod_texts == [mini_text]
    # And the scenario actually exercised what it claims.
    starts = [e[0] for e in prod_log]
    assert starts[0] == 0 and 86 in starts and 92 in starts
    temps = {(e[0], e[1]) for e in prod_log}
    assert (86, 0.6) in temps                      # full ladder climbed
    assert (56, 0.2) not in temps                  # no-speech cleared retry
    w92 = [e for e in prod_log if e[0] == 92]
    assert w92 and w92[0][3] == [SP.sot]           # post-reset fresh prompt
    w86 = [e for e in prod_log if e[0] == 86]
    # [sot_prev] + ctx_keep(15)-trimmed rolling tokens + [sot]
    assert len(w86[0][3]) == 1 + 15 + 1
    assert w86[0][3][0] == SP.sot_prev             # rolling prompt trimmed


def test_two_files_batched_decisions_are_per_file(monkeypatch):
    """Cross-file wavefront batching must not perturb per-file chaining:
    two files running the same script (one time-shifted) produce the same
    per-file decision trail the sequential oracle produces alone."""
    off = 1000
    for key in list(SCRIPT):
        SCRIPT[(key[0] + off, key[1])] = SCRIPT[key]
    try:
        items = [dict(audio=ramp_audio(TOTAL_S), prompt="",
                      depends_on=None, store_ref=None),
                 dict(audio=ramp_audio(TOTAL_S, off), prompt="",
                      depends_on=None, store_ref=None)]
        prod_log, prod_texts = run_production(items, monkeypatch)

        tpu = TPUConfig(max_decode_tokens=48, max_fallback_attempts=4,
                        best_of=2, beam_size=0)
        expected = []
        for o in (0, off):
            mini_log = []
            mini = MiniTranscribe(tpu, LADDER, cond_prev=True,
                                  log=mini_log,
                                  ctx_keep=DIMS.n_text_ctx // 2 - 1,
                                  start_offset=o)
            text = mini.run(TOTAL_S * SR)
            expected.append((mini_log, text))

        for fi, o in enumerate((0, off)):
            flog = [e for e in prod_log if o <= e[0] < o + TOTAL_S]
            assert flog == expected[fi][0]
            assert prod_texts[fi] == expected[fi][1]
    finally:
        for key in list(SCRIPT):
            if key[0] >= off:
                del SCRIPT[key]


def test_condition_on_previous_text_false_resets_every_window(monkeypatch):
    """config.condition_on_previous_text=False (the reference threads it at
    back/api.py:1478): every window's prompt is bare [sot]."""
    log = []
    tpu = TPUConfig(max_decode_tokens=48, max_fallback_attempts=4,
                    best_of=2, beam_size=0, compute_dtype="float32")
    cfg = Config(temperature=LADDER, condition_on_previous_text=False)
    b = ModelBundle(cfg, tpu)
    b._whisper = (init_whisper_params(jax.random.PRNGKey(0), DIMS), DIMS,
                  TOK)
    b._loaded = True
    eng = TranscriptionEngine(cfg, tpu, models=b)
    from clearconverse_tpu.models import decoding
    monkeypatch.setattr(decoding, "greedy_decode_from_audio",
                        make_fake_decode(log))
    items = [dict(audio=ramp_audio(TOTAL_S), prompt="", depends_on=None,
                  store_ref=None)]
    eng._transcribe_wavefront(items, SR)
    assert all(e[3] == [SP.sot] for e in log)

    mini_log = []
    mini = MiniTranscribe(tpu, LADDER, cond_prev=False, log=mini_log,
                          ctx_keep=DIMS.n_text_ctx // 2 - 1)
    mini_text = mini.run(TOTAL_S * SR)
    assert log == mini_log and items[0]["text"] == mini_text

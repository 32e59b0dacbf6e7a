"""End-to-end engine tests on the fake backend: diarization plumbing,
profiles, overlap handling, wavefront prompt chaining, run() contract
(transcript format parity with back/api.py:1253-1265)."""

import re

import numpy as np
import pytest

from clearconverse_tpu.config import Config, TPUConfig
from clearconverse_tpu.pipeline.batching import batch_audio, pick_bucket, split_long
from clearconverse_tpu.pipeline.diarize import diarize, vad_intervals
from clearconverse_tpu.pipeline.engine import TranscriptionEngine
from clearconverse_tpu.audio.wav import write_wav

from fakes import SR, FakeModels, synth_conversation


@pytest.fixture
def engine():
    cfg = Config(noise_reduction_amount=0.0, temperature=0.0)
    return TranscriptionEngine(cfg, TPUConfig(), models=FakeModels())


# ------------------------------------------------------------ cancellation

def test_cancel_mid_transcription_aborts_within_one_batch(tmp_path):
    """VERDICT r1 #9: cancel latency is one device batch — the wavefront
    checks should_cancel between bucket batches and aborts."""
    from clearconverse_tpu.pipeline.cancel import ProcessingCancelled

    # batch size 1 → every segment is its own device batch.
    engine = TranscriptionEngine(
        Config(noise_reduction_amount=0.0, temperature=0.0,
               transcription_batch_size=1),
        TPUConfig(), models=FakeModels())
    calls = {"n": 0}
    orig = engine.models.transcribe_batch

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    engine.models.transcribe_batch = counting
    cancelled = {"flag": False}

    def should_cancel():
        if calls["n"] >= 1:          # cancel lands after the first batch
            cancelled["flag"] = True
        return cancelled["flag"]

    wav = tmp_path / "conv.wav"
    write_wav(str(wav), synth_conversation(), SR)
    with pytest.raises(ProcessingCancelled):
        engine.process_file(str(wav), should_cancel=should_cancel)
    assert calls["n"] == 1           # no further batches ran after cancel


def test_task_runner_cancel_propagates_between_batches(tmp_path):
    """The TaskRunner threads cancel.is_set into the engine; markers match
    the cancel protocol (cancelled.txt written by cancel(), no error.txt)."""
    import threading
    import time
    from clearconverse_tpu.pipeline.cancel import check_cancel
    from clearconverse_tpu.serve.tasks import TaskRunner

    batch_started = threading.Event()
    proceed = threading.Event()

    class BatchLoopEngine:
        def run(self, f, output_dir=".", debug_mode=False,
                progress_callback=None, should_cancel=None):
            for _ in range(50):              # "batches"
                batch_started.set()
                proceed.wait(5)
                check_cancel(should_cancel)
                time.sleep(0.01)
            return f, "text", "p"

    runner = TaskRunner(str(tmp_path), BatchLoopEngine)
    runner.start("t9", "x.wav")
    assert batch_started.wait(5)
    runner.cancel("t9")
    proceed.set()
    info_done = runner.active_tasks.get("t9")  # popped by cancel()
    assert info_done is None
    assert (tmp_path / "t9" / "cancelled.txt").exists()
    # Dispatcher finishes quickly (one batch), not after all 50 batches.
    deadline = time.time() + 5
    while runner._dispatcher and runner._dispatcher.is_alive() and \
            runner._queue and time.time() < deadline:
        time.sleep(0.05)
    assert not (tmp_path / "t9" / "error.txt").exists()


# ----------------------------------------------------- timestamp-seek path

def test_wavefront_timestamp_seek_no_boundary_loss():
    """VERDICT r1 #8: a 75 s item decodes through cursor-driven windows —
    each window's kept text ends at a real segment boundary and the next
    window starts exactly there, so the joined transcript covers the input
    once with no seam loss or duplication."""
    sr = 16000
    total = 75 * sr

    class SeekModels(FakeModels):
        def __init__(self):
            super().__init__()
            self.windows = []            # (cursor_s, window_s) per call row

        def transcribe_long_batch(self, audio, prompts, lengths=None,
                                  temperature=0.0):
            out = []
            for row in range(len(prompts)):
                n = int(lengths[row]) if lengths is not None else audio.shape[1]
                # The item waveform is arange/total: first sample recovers
                # the window's absolute cursor.
                cursor_s = round(float(audio[row][0]) * total / sr, 3)
                win_s = n / sr
                self.windows.append((cursor_s, win_s))
                # Complete segments cover 20 s; the tail is re-decoded next
                # window (unless this window reaches the end of the input).
                advance = 20.0 if cursor_s + win_s < total / sr else win_s
                out.append((f"[{cursor_s:g}+{advance:g}]", advance))
            return out

    models = SeekModels()
    eng = TranscriptionEngine(Config(noise_reduction_amount=0.0,
                                     temperature=0.0),
                              TPUConfig(), models=models)
    audio = (np.arange(total, dtype=np.float32) / total)
    items = [dict(audio=audio, prompt="", depends_on=None,
                  start=0.0, end=75.0, speaker="SPEAKER_A")]
    eng._transcribe_wavefront(items, sr)

    # Windows: 0→20, 20→40, 40→60, 60→75 (last reaches the end).
    assert models.windows == [(0.0, 30.0), (20.0, 30.0), (40.0, 30.0),
                              (60.0, 15.0)]
    assert items[0]["text"] == "[0+20] [20+20] [40+20] [60+15]"


def _rolling_prompt_models(total, sr, reset_at=None, with_tokens=False):
    """transcribe_long_batch fake recording each window's prompt; window
    texts are w1..wN, 20 s complete-segment advance, and the ``reset_at``-th
    window reports reset_context=True (whisper's temp>0.5 signal).
    ``with_tokens`` adds the bundle's 4th element (kept token ids
    [100+k, 200+k]) so the engine chains at the token level."""

    class PromptModels(FakeModels):
        def __init__(self):
            super().__init__()
            self.prompts = []

        def transcribe_long_batch(self, audio, prompts, lengths=None,
                                  temperature=0.0):
            out = []
            for row in range(len(prompts)):
                self.prompts.append(prompts[row])
                n = int(lengths[row]) if lengths is not None \
                    else audio.shape[1]
                cursor_s = round(float(audio[row][0]) * total / sr, 3)
                advance = 20.0 if cursor_s + n / sr < total / sr else n / sr
                k = len(self.prompts)
                res = (f"w{k}", advance, k == reset_at)
                if with_tokens:
                    res += ([100 + k, 200 + k],)
                out.append(res)
            return out

    return PromptModels()


def test_wavefront_rolling_prompt_accumulates_and_resets():
    """whisper transcribe's rolling prompt (prompt =
    all_tokens[prompt_reset_since:]): each window's prompt carries the
    initial context plus ALL text decoded since the last reset — not just
    the previous window — and a window whose result reports reset_context
    (final rung > 0.5) makes the NEXT window start from an empty prompt."""
    sr = 16000
    total = 75 * sr
    models = _rolling_prompt_models(total, sr, reset_at=2)
    eng = TranscriptionEngine(Config(noise_reduction_amount=0.0,
                                     temperature=0.0),
                              TPUConfig(), models=models)
    audio = (np.arange(total, dtype=np.float32) / total)
    items = [dict(audio=audio, prompt="init ", depends_on=None,
                  start=0.0, end=75.0, speaker="SPEAKER_A")]
    eng._transcribe_wavefront(items, sr)
    # w2 sees init+w1; w2 resets → w3 starts empty; w4 sees only w3.
    assert models.prompts == ["init ", "init w1 ", "", "w3 "]
    assert items[0]["text"] == "w1 w2 w3 w4"


def test_wavefront_token_level_rolling_prompt():
    """When the backend reports kept token ids (the real bundle's 4th
    result element), successor windows chain at the TOKEN level — prompt
    = (init_text, accumulated ids) exactly as whisper extends all_tokens
    — instead of re-tokenizing decoded text; resets drop both the ids
    and the initial context."""
    sr = 16000
    total = 75 * sr
    models = _rolling_prompt_models(total, sr, reset_at=2, with_tokens=True)
    eng = TranscriptionEngine(Config(noise_reduction_amount=0.0,
                                     temperature=0.0),
                              TPUConfig(), models=models)
    audio = (np.arange(total, dtype=np.float32) / total)
    items = [dict(audio=audio, prompt="init ", depends_on=None,
                  start=0.0, end=75.0, speaker="SPEAKER_A")]
    eng._transcribe_wavefront(items, sr)
    assert models.prompts == [
        "init ",
        ("init ", [101, 201]),          # init context + window-1 ids
        "",                             # window 2 reset → fresh prompt
        ("", [103, 203]),               # only window-3 ids since reset
    ]
    assert items[0]["text"] == "w1 w2 w3 w4"


def test_wavefront_condition_on_previous_text_false_resets_every_window():
    """The reference threads config.condition_on_previous_text into
    whisper.transcribe (back/api.py:1478); False makes whisper reset the
    prompt after EVERY window (prompt_reset_since = len(all_tokens)), so
    successor windows decode with no context at all — including the
    initial prompt, which the reset point moves past."""
    sr = 16000
    total = 75 * sr
    models = _rolling_prompt_models(total, sr)
    eng = TranscriptionEngine(Config(noise_reduction_amount=0.0,
                                     temperature=0.0,
                                     condition_on_previous_text=False),
                              TPUConfig(), models=models)
    audio = (np.arange(total, dtype=np.float32) / total)
    items = [dict(audio=audio, prompt="init ", depends_on=None,
                  start=0.0, end=75.0, speaker="SPEAKER_A")]
    eng._transcribe_wavefront(items, sr)
    assert models.prompts == ["init ", "", "", ""]


def test_wavefront_long_fallback_without_timestamp_backend():
    """Backends without transcribe_long_batch (e.g. plain fakes) keep the
    fixed 30 s chunk-chaining path."""
    sr = 16000
    models = FakeModels()
    assert not hasattr(models, "transcribe_long_batch")
    eng = TranscriptionEngine(Config(noise_reduction_amount=0.0,
                                     temperature=0.0),
                              TPUConfig(), models=models)
    audio = np.random.default_rng(0).standard_normal(70 * sr).astype(np.float32) * 0.1
    items = [dict(audio=audio, prompt="", depends_on=None,
                  start=0.0, end=70.0, speaker="SPEAKER_A")]
    eng._transcribe_wavefront(items, sr)
    assert isinstance(items[0]["text"], str) and items[0]["text"]


# ---------------------------------------------------------------- batching

def test_pick_bucket():
    assert pick_bucket(3.0, (5, 10, 30)) == 5
    assert pick_bucket(7.0, (5, 10, 30)) == 10
    assert pick_bucket(99.0, (5, 10, 30)) == 30


def test_batch_audio_groups_and_pads(rng):
    clips = [rng.standard_normal(int(d * SR)).astype(np.float32)
             for d in (1.0, 2.0, 8.0, 9.0, 2.5)]
    batches = list(batch_audio(clips, SR, (5.0, 10.0), batch_size=2))
    seen = set()
    for idx, padded, lens in batches:
        assert padded.shape[0] <= 2
        assert padded.shape[1] in (5 * SR, 10 * SR)
        for row, j in enumerate(idx):
            assert lens[row] == len(clips[j])
            np.testing.assert_array_equal(padded[row, : lens[row]], clips[j])
            assert (padded[row, lens[row]:] == 0).all()
            seen.add(j)
    assert seen == {0, 1, 2, 3, 4}


def test_split_long():
    clip = np.zeros(int(70 * SR), np.float32)
    parts = split_long(clip, SR, 30.0)
    assert [len(p) / SR for p in parts] == [30.0, 30.0, 10.0]


# ---------------------------------------------------------------- diarize

def test_vad_and_diarize_on_synthetic():
    audio = synth_conversation()
    fake = FakeModels()
    vad = vad_intervals(fake, audio, SR)
    assert vad, "VAD found no speech"
    covered = sum(e - s for s, e in vad)
    assert 6.0 < covered < 12.0

    segs = diarize(fake, audio, SR, 1, 2)
    assert segs
    speakers = {spk for _, _, spk in segs}
    assert len(speakers) == 2
    # The low-band speaker's first segment and its 6.2-9 s segment agree.
    def label_at(t):
        for s, e, spk in segs:
            if s <= t < e:
                return spk
        return None
    assert label_at(1.0) is not None
    assert label_at(1.0) == label_at(7.0)
    assert label_at(4.5) is not None
    assert label_at(4.5) != label_at(1.0)


def test_diarize_many_matches_per_file():
    """One cross-file embedding batch (diarize_many, the process_files
    path) == per-file diarize, including an empty file."""
    from clearconverse_tpu.pipeline.diarize import diarize_many

    fake = FakeModels()
    a = synth_conversation()
    b = np.concatenate([a[SR:], a[:SR]])        # shifted variant
    silent = np.zeros(SR * 2, np.float32)
    many = diarize_many(fake, [a, silent, b], SR, 1, 2)
    per = [diarize(fake, x, SR, 1, 2) for x in (a, silent, b)]
    assert many == per
    assert many[1] == []


# ---------------------------------------------------------------- engine

def test_process_file_end_to_end(engine, tmp_path):
    audio = synth_conversation()
    wav = tmp_path / "conv.wav"
    write_wav(str(wav), audio, SR)

    result = engine.process_file(str(wav))
    assert result is not None
    segs = result["segments"]
    assert segs
    md = result["metadata"]
    assert set(md["speakers"]) == {"SPEAKER_A", "SPEAKER_B"}
    assert md["total_segments"] == len(segs)
    assert abs(md["duration"] - 12.0) < 0.1

    # Same-band segments share a label.
    def seg_at(t):
        hits = [s for s in segs if s.start <= t < s.end and not s.is_overlap]
        return hits[0] if hits else None
    a, b, c = seg_at(1.0), seg_at(4.5), seg_at(7.0)
    assert a and b and c
    assert a.speaker_id == c.speaker_id != b.speaker_id
    # Every segment got transcribed.
    assert all(s.transcription for s in segs)
    # Overlap region produced overlap-typed segments.
    assert any(s.is_overlap for s in segs)


def test_run_contract_and_transcript_format(engine, tmp_path):
    audio = synth_conversation()
    wav = tmp_path / "conv.wav"
    write_wav(str(wav), audio, SR)
    out = tmp_path / "out"

    progress = []
    got = engine.run(str(wav), str(out), debug_mode=True,
                     progress_callback=lambda p, m: progress.append((p, m)))
    input_file, transcript, tpath = got
    assert input_file == str(wav)
    assert (out / "transcript.txt").exists()
    # Reference format: "[SPK] 1.23s - 4.56s\ntext\n\n" (back/api.py:1253-1265)
    pat = re.compile(r"^\[(SPEAKER_[AB]|UNKNOWN)\] \d+\.\d{2}s - \d+\.\d{2}s$")
    lines = transcript.strip().split("\n")
    assert pat.match(lines[0]), lines[0]
    blocks = transcript.strip().split("\n\n")
    for blk in blocks:
        first = blk.split("\n")[0]
        assert pat.match(first), first
    # Progress milestones 5/30/60/80/100 in order.
    pcts = [p for p, _ in progress]
    # (Model-loading interleaves its own 10-100 before processing's 30,
    # exactly like the reference's run(), so monotonicity doesn't hold.)
    for expect in (5, 30, 60, 80, 100):
        assert expect in pcts
    # Debug dump exists with metadata.
    assert (out / "debug_segments" / "segments_metadata.json").exists()
    assert (out / "regular_segments").exists()


def test_wavefront_prompt_chaining(engine):
    """Chained items receive the previous item's transcript as prompt;
    independent items decode with their static prompts — batched."""
    fake = engine.models
    fake.echo_prompt = True
    sr = SR
    tone = (0.5 * np.sin(2 * np.pi * 300 * np.arange(sr) / sr)).astype(np.float32)
    items = [
        dict(audio=tone, prompt="P0", depends_on=None),
        dict(audio=tone, prompt=None, depends_on=0),
        dict(audio=tone, prompt=None, depends_on=1),
        dict(audio=tone, prompt="P3", depends_on=None),
    ]
    engine._transcribe_wavefront(items, sr)
    assert items[0]["text"].startswith("[P0]")
    assert items[1]["text"].startswith(f"[{items[0]['text']}")
    assert items[2]["text"].startswith(f"[{items[1]['text']}")
    assert items[3]["text"].startswith("[P3]")
    # Generation 0 batched items 0 and 3 together.
    assert sorted(fake.transcribe_calls[0]) == ["P0", "P3"]


def test_process_file_returns_none_on_error(engine):
    assert engine.process_file("/nonexistent/file.wav") is None


def test_load_models_progress_parity(engine):
    stages = []
    ok = engine.load_models_with_progress(lambda p, m: stages.append(p))
    assert ok and engine.models_are_loaded()
    assert stages[-1] == 100


def test_wavefront_splits_long_segments(engine):
    """>30 s clips chunk into 30 s units chained on the ROLLING transcript
    (whisper's prompt = all_tokens[prompt_reset_since:]): each later
    chunk's prompt is the initial context plus every prior chunk's text."""
    fake = engine.models
    fake.echo_prompt = True
    fake.transcribe_calls.clear()
    sr = SR
    tone = (0.4 * np.sin(2 * np.pi * 300 * np.arange(70 * sr) / sr)).astype(np.float32)
    items = [dict(audio=tone, prompt="P0", depends_on=None)]
    engine._transcribe_wavefront(items, sr)
    # Three chunks (30+30+10): the echo fake nests each chunk's prompt in
    # brackets, so chaining is visible in the joined text.
    text = items[0]["text"]
    assert text.startswith("[P0]low296")     # chunk 1: static prompt
    assert text.endswith("low98")            # chunk 3: final 10 s
    assert len(fake.transcribe_calls) == 3
    chunk1_text = "[P0]low296"
    assert fake.transcribe_calls[1][0].strip() == f"P0 {chunk1_text}"
    chunk2_text = f"[P0 {chunk1_text} ]low296"   # echo keeps the raw prompt
    assert fake.transcribe_calls[2][0].strip() == \
        f"P0 {chunk1_text} {chunk2_text}"


def test_rapid_exchange_and_secondary_paths(tmp_path):
    """Rapid exchange flag set on a <0.5 s turnaround; secondary diarization
    triggers when a segment's embedding mismatches its profile."""
    from clearconverse_tpu.audio.wav import write_wav
    from clearconverse_tpu.config import Config, TPUConfig
    from clearconverse_tpu.pipeline.engine import TranscriptionEngine

    sr = SR
    t = np.arange(10 * sr) / sr
    low = 0.5 * np.sin(2 * np.pi * 300 * t)
    high = 0.5 * np.sin(2 * np.pi * 2000 * t)

    def g(a, b):
        return ((t >= a) & (t < b)).astype(np.float32)

    # L(0-3), H starts 0.3 s after L ends → rapid exchange.
    x = (low * g(0, 3) + high * g(3.3, 6)).astype(np.float32)
    wav = tmp_path / "rapid.wav"
    write_wav(str(wav), x, sr)

    eng = TranscriptionEngine(Config(noise_reduction_amount=0.0),
                              TPUConfig(), models=FakeModels())
    res = eng.process_file(str(wav))
    assert res is not None
    assert res["metadata"]["rapid_exchanges"] >= 1
    assert "stage_times" in res["metadata"]
    assert res["metadata"]["stage_times"].get("transcription", 0) >= 0


def test_process_files_merges_transcription_batches(tmp_path):
    """Multi-file requests share transcription device batches: transcribe
    calls shrink vs. sequential per-file processing, results match."""
    from clearconverse_tpu.audio.wav import write_wav
    from clearconverse_tpu.config import Config, TPUConfig
    from clearconverse_tpu.pipeline.engine import TranscriptionEngine
    audio = synth_conversation()
    paths = []
    for i in range(2):
        p = tmp_path / f"conv{i}.wav"
        write_wav(str(p), audio, SR)
        paths.append(str(p))

    # Wide batches so sharing is visible in call counts.
    wide = TranscriptionEngine(Config(noise_reduction_amount=0.0,
                                      transcription_batch_size=32),
                               TPUConfig(), models=FakeModels())
    fake = wide.models
    results = wide.process_files(paths)
    merged_calls = len(fake.transcribe_calls)
    assert all(r is not None for r in results)
    texts = [[s.transcription for s in r["segments"]] for r in results]
    assert texts[0] == texts[1]  # identical files → identical transcripts
    # Both files' generation-0 items decoded in ONE shared batch call.
    assert merged_calls == 1
    assert len(fake.transcribe_calls[0]) == 2 * len(texts[0])

    fake.transcribe_calls.clear()
    seq = [wide.process_file(p) for p in paths]
    seq_calls = len(fake.transcribe_calls)
    assert merged_calls < seq_calls  # shared batches
    assert [[s.transcription for s in r["segments"]] for r in seq] == texts


def test_process_files_batches_segment_embeddings(tmp_path):
    """All files' non-overlap segment embeddings share device batches:
    process_files dispatches fewer embed calls than sequential per-file
    processing (the per-file _embed_many loop was ~0.35 s/pass on the
    8-file bench) while producing identical speaker labels."""
    from clearconverse_tpu.audio.wav import write_wav
    from clearconverse_tpu.config import Config, TPUConfig
    from clearconverse_tpu.pipeline.engine import TranscriptionEngine
    audio = synth_conversation()
    paths = []
    for i in range(3):
        p = tmp_path / f"conv{i}.wav"
        write_wav(str(p), audio, SR)
        paths.append(str(p))

    eng = TranscriptionEngine(Config(noise_reduction_amount=0.0,
                                     transcription_batch_size=32),
                              TPUConfig(), models=FakeModels())
    results = eng.process_files(paths)
    batched_calls = eng.models.embed_calls
    assert all(r is not None for r in results)
    assert "segment_embeds" in eng.last_run_stage_times

    eng.models.embed_calls = 0
    seq = [eng.process_file(p) for p in paths]
    assert batched_calls < eng.models.embed_calls
    key = lambda r: [(s.speaker_id, s.transcription) for s in r["segments"]]
    assert [key(r) for r in results] == [key(r) for r in seq]


def test_profiles_disabled_triggers_secondary(tmp_path):
    """use_speaker_embeddings=False → no profiles → every embeddable
    non-overlap segment takes the secondary-diarization path (reference
    api.py:1412-1414 treats a missing profile as similarity 0)."""
    from clearconverse_tpu.audio.wav import write_wav
    from clearconverse_tpu.config import Config, TPUConfig
    from clearconverse_tpu.pipeline.engine import TranscriptionEngine

    wav = tmp_path / "c.wav"
    write_wav(str(wav), synth_conversation(), SR)
    eng = TranscriptionEngine(
        Config(noise_reduction_amount=0.0, use_speaker_embeddings=False),
        TPUConfig(), models=FakeModels())
    res = eng.process_file(str(wav))
    assert res is not None and res["segments"]
    # Secondary diarization relabels with its own clustering; segments exist
    # and carry transcriptions regardless.
    assert all(s.transcription for s in res["segments"])


def test_diarize_many_isolates_clustering_failure(monkeypatch):
    """One file whose clustering throws yields None; the other files'
    results survive (per-file isolation in the batched path)."""
    from clearconverse_tpu.pipeline import diarize as dmod

    fake = FakeModels()
    a = synth_conversation()
    calls = {"n": 0}
    real = dmod.cluster_speakers

    def flaky(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 2:       # second file's clustering
            raise RuntimeError("degenerate embeddings")
        return real(*args, **kwargs)

    monkeypatch.setattr(dmod, "cluster_speakers", flaky)
    many = dmod.diarize_many(fake, [a, a, a], SR, 1, 2)
    assert many[0] and many[2] and many[1] is None


def test_process_files_stage_decomposition(tmp_path):
    """process_files exposes last_run_stage_times covering the shared
    batched phases (bench.py's engine breakdown, VERDICT r2 weak #2):
    every top-level span is present, non-negative, and dotted sub-spans
    only ever decompose an existing parent."""
    audio = synth_conversation()
    p = tmp_path / "conv.wav"
    write_wav(str(p), audio, SR)

    eng = TranscriptionEngine(Config(noise_reduction_amount=0.0),
                              TPUConfig(), models=FakeModels())
    results = eng.process_files([str(p), str(p)])
    assert all(r is not None for r in results)
    stages = eng.last_run_stage_times
    for key in ("load_gate", "segmentation", "diarize_cluster", "profiles",
                "prepare_files", "decode_wavefront"):
        assert key in stages, key
        assert stages[key] >= 0.0
    for key in stages:
        if "." in key:
            assert key.split(".", 1)[0] in stages
    # Plan-phase per-file spans (vad/diarization run inside plan_files)
    # must report as plan_files.* children — NOT as prepare_files.*,
    # which would double-count their wall clock under the wrong parent
    # (the per-file timer is shared between the two phases).
    assert "plan_files.vad" in stages
    assert "plan_files.diarization" in stages
    assert "prepare_files.vad" not in stages
    assert "prepare_files.diarization" not in stages


def test_process_files_wire8_plumbing_and_speakers(tmp_path):
    """The engine threads TPUConfig.wire_bits into load_audio_many, and the
    8-bit mu-law wire keeps the pipeline's macro decisions (speaker set,
    total speech within tolerance) on the fake backend. Exact
    segment-boundary equality is deliberately NOT asserted: the fake's
    hard energy thresholds can flip a frame under the ~-38 dB companding
    noise (observed: one 3.0 s boundary drifting to 3.1 s) — which is
    precisely why wire_bits=8 ships off-by-default pending a real-
    checkpoint WER check (docs/PARITY.md #9). The numeric transparency
    guarantee lives at audio level in test_audio (SNR > 25 dB)."""
    audio = synth_conversation()
    p = str(tmp_path / "w.wav")
    write_wav(p, audio, SR)

    seen_bits = []
    from clearconverse_tpu.audio import decode as dec_mod
    real = dec_mod.load_audio_many

    def spy(*a, **kw):
        seen_bits.append(kw.get("wire_bits"))
        return real(*a, **kw)

    outs = {}
    try:
        dec_mod.load_audio_many = spy
        for bits in (16, 8):
            eng = TranscriptionEngine(
                Config(noise_reduction_amount=0.2),
                TPUConfig(wire_bits=bits), models=FakeModels())
            outs[bits] = eng.process_files([p])
    finally:
        dec_mod.load_audio_many = real
    assert seen_bits == [16, 8]
    r16, r8 = outs[16][0], outs[8][0]
    assert r16 is not None and r8 is not None
    spk = lambda r: {s.speaker_id for s in r["segments"]}
    dur = lambda r: sum(s.end - s.start for s in r["segments"])
    assert spk(r16) == spk(r8)
    assert abs(dur(r16) - dur(r8)) <= 0.3 * dur(r16) + 0.5


def test_finalize_failure_isolates_per_file(tmp_path):
    """A _finalize failure (e.g. the deferred async-download error — the
    first host-byte access on clean store paths) degrades THAT file to
    None; other files' results survive (api.py:1546 semantics)."""
    audio = synth_conversation()
    paths = []
    for i in range(2):
        p = tmp_path / f"f{i}.wav"
        write_wav(str(p), audio, SR)
        paths.append(str(p))
    eng = TranscriptionEngine(Config(noise_reduction_amount=0.0),
                              TPUConfig(), models=FakeModels())
    orig = eng._finalize
    calls = {"n": 0}

    def flaky(prep):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("async gated-audio download failed: boom")
        return orig(prep)

    eng._finalize = flaky
    results = eng.process_files(paths)
    assert results[0] is None
    assert results[1] is not None and results[1]["segments"]


def test_inflight_download_joined_on_cancel(tmp_path):
    """The async gated-audio download joins even when the run aborts
    (cancel/error) — an orphaned transfer would contend with the next
    request's upload (2.3x-worse concurrent tunnel transfers)."""
    from clearconverse_tpu.pipeline.cancel import ProcessingCancelled

    p = tmp_path / "c.wav"
    write_wav(str(p), synth_conversation(), SR)
    eng = TranscriptionEngine(Config(noise_reduction_amount=0.0),
                              TPUConfig(), models=FakeModels())
    waited = {"n": 0}

    class FakeLazy:
        def wait(self):
            waited["n"] += 1

    def aborting_inner(file_paths, should_cancel=None):
        eng._inflight_hosts = [FakeLazy()]
        raise ProcessingCancelled()

    eng._process_files_inner = aborting_inner
    import pytest as _pytest
    with _pytest.raises(ProcessingCancelled):
        eng.process_files([str(p)])
    assert waited["n"] == 1
    assert eng._inflight_hosts == []


def test_engine_syncs_shared_bundle_config():
    """A shared ModelBundle reads config fields per call (e.g.
    condition_on_previous_text at bundle.py:876); the engine must re-point
    the bundle at ITS config or a bundle built under another Config keeps
    stale values (the eval sweep shares one bundle across the grid)."""
    from clearconverse_tpu.pipeline.bundle import ModelBundle

    cfg_a = Config(condition_on_previous_text=True)
    cfg_b = Config(condition_on_previous_text=False)
    bundle = ModelBundle(cfg_a, TPUConfig())
    eng = TranscriptionEngine(cfg_b, TPUConfig(), models=bundle)
    assert eng.models is bundle
    assert bundle.config is cfg_b


def test_engines_sharing_a_bundle_share_one_run_lock():
    """The run lock lives with the BUNDLE: two engines sharing one bundle
    serialize whole runs against each other (each re-points the shared
    bundle's config per run), while engines on distinct bundles stay
    independent."""
    from clearconverse_tpu.config import Config, TPUConfig
    from clearconverse_tpu.pipeline.engine import TranscriptionEngine

    shared = FakeModels()
    a = TranscriptionEngine(Config(), TPUConfig(), models=shared)
    b = TranscriptionEngine(Config(), TPUConfig(), models=shared)
    c = TranscriptionEngine(Config(), TPUConfig(), models=FakeModels())
    assert a._run_lock is b._run_lock
    assert a._run_lock is not c._run_lock


def test_crafted_pyannet_overlap_detection_and_cluster_threshold():
    """The multichip dryrun's overlapped-speech case (VERDICT r4 #4):
    dev_backend.craft_pyannet_freq_params drives the REAL pyannet forward
    to per-band speaker activity, and the lowered AHC cluster threshold
    (TPUConfig.diarization_cluster_threshold -> diarize kwargs) splits the
    two random-ECAPA clusters — together they make the synthetic
    conversation's 9.5-11.5 s two-speaker window a DETECTED overlap."""
    import jax

    from clearconverse_tpu.config import Config, TPUConfig
    from clearconverse_tpu.models.ecapa import EcapaDims, init_ecapa_params
    from clearconverse_tpu.pipeline import segments as S
    from clearconverse_tpu.pipeline.bundle import ModelBundle
    from clearconverse_tpu.pipeline.dev_backend import (
        SR, craft_pyannet_freq_params, synth_conversation)
    from clearconverse_tpu.pipeline.diarize import diarize
    from clearconverse_tpu.pipeline.engine import TranscriptionEngine

    cfg = Config()
    tpu = TPUConfig(compute_dtype="float32", diarization_onset=0.35,
                    diarization_offset=0.25,
                    diarization_cluster_threshold=0.30)
    eng = TranscriptionEngine(cfg, tpu, models=object())
    kw = eng._diar_kwargs()
    assert kw == {"onset": 0.35, "offset": 0.25, "cluster_threshold": 0.30}

    b = ModelBundle(cfg, tpu)
    edims = EcapaDims(n_mels=24, channels=32, mfa_channels=48,
                      attention_channels=16, embedding_dim=16,
                      res2net_scale=4)
    b._ecapa = init_ecapa_params(jax.random.PRNGKey(38), edims)
    b._ecapa_dims = edims
    b._pyannet, b._pyannet_dims = craft_pyannet_freq_params()
    b._loaded = True

    raw = diarize(b, synth_conversation(), SR, cfg.min_speakers,
                  cfg.max_speakers, **kw)
    speakers = sorted(set(s for _, _, s in raw))
    assert len(speakers) == 2, raw
    ov = S.detect_overlap_regions(raw, cfg.overlap_threshold)
    assert len(ov) == 1, (raw, ov)
    (os_, oe, spks) = ov[0]
    assert abs(os_ - 9.5) < 0.2 and abs(oe - 11.5) < 0.2
    assert sorted(spks) == speakers

"""Parity-recipe tests (eval/parity.py): transcript/RTTM parsing and the
per-file evaluation loop — the DevModels engine scored against its own
recorded output must be exactly WER 0 / DER 0."""

import pathlib

from clearconverse_tpu.audio.wav import write_wav
from clearconverse_tpu.config import Config, TPUConfig
from clearconverse_tpu.eval.parity import (
    evaluate_file, parse_rttm, parse_transcript)
from clearconverse_tpu.pipeline.dev_backend import (
    DevModels, SR, synth_conversation)
from clearconverse_tpu.pipeline.engine import TranscriptionEngine

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "devmodels_transcript.txt"


def test_parse_transcript_roundtrip():
    rows = parse_transcript(FIXTURE.read_text())
    assert rows and rows[0][:3] == (0.0, 3.0, "SPEAKER_A")
    assert all(text for *_, text in rows)


def test_parse_rttm(tmp_path):
    p = tmp_path / "r.rttm"
    p.write_text("SPEAKER f 1 0.50 2.25 <NA> <NA> spk_a <NA> <NA>\n"
                 "garbage line\n"
                 "SPEAKER f 1 3.00 1.00 <NA> <NA> spk_b <NA> <NA>\n")
    assert parse_rttm(str(p)) == [(0.5, 2.75, "spk_a"), (3.0, 4.0, "spk_b")]


def test_evaluate_file_self_parity(tmp_path):
    """Engine vs its own recorded reference output → WER 0, DER 0."""
    eng = TranscriptionEngine(
        Config(noise_reduction_amount=0.0, temperature=0.0),
        TPUConfig(), models=DevModels())
    wav = tmp_path / "conv.wav"
    write_wav(str(wav), synth_conversation(), SR)
    row = evaluate_file(eng, str(wav), str(FIXTURE), None)
    assert "error" not in row
    assert row["wer"] == 0.0
    assert row["der"] == 0.0
    assert row["segments"] == len(parse_transcript(FIXTURE.read_text()))
    assert row["rtfx"] > 0


def test_parity_main_with_levers(tmp_path, monkeypatch, capsys):
    """python -m clearconverse_tpu.eval.parity --levers end to end on the
    dev backend: baseline + one run per opt-in perf lever, zero deltas by
    construction (same stand-in models), full report artifacts."""
    import json

    from clearconverse_tpu.eval.parity import LEVERS, main

    wav = tmp_path / "conv.wav"
    write_wav(str(wav), synth_conversation(), SR)
    (tmp_path / "conv.ref.txt").write_text(FIXTURE.read_text())
    monkeypatch.setenv("CC_TPU_FAKE_MODELS", "1")
    out = tmp_path / "report"
    rc = main(["--eval-set", str(tmp_path), "--out", str(out), "--levers"])
    assert rc == 0
    brief = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert brief["mean_wer"] == 0.0 and brief["mean_der"] == 0.0
    assert set(brief["levers"]) == set(LEVERS)
    # Model-side levers can't move the dev stand-ins: exact zero deltas.
    for name in ("cross_kv_int4", "bucketed_window"):
        lv = brief["levers"][name]
        assert lv["delta_wer"] == 0.0 and lv["delta_der"] == 0.0
    # wire8 is LOSSY before the stand-ins' amplitude-threshold features —
    # the harness genuinely measures it (a float delta is recorded).
    assert isinstance(brief["levers"]["wire8"]["delta_wer"], float)
    md = (tmp_path / "report.md").read_text()
    assert "Opt-in perf levers" in md and "wire8" in md
    full = json.loads((tmp_path / "report.json").read_text())
    assert all("rows" in lv for lv in full["levers"].values())

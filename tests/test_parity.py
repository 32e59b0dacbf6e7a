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

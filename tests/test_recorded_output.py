"""Recorded end-to-end output fixture (VERDICT r1 #10): the full engine run
on the DevModels backend must reproduce the committed transcript
byte-for-byte. Any change to segment algebra, speaker mapping, wavefront
chaining, or transcript formatting that alters output fails here — the
regression net that exists TODAY, before trained checkpoints are available
(the parity/ recipe covers the with-weights case)."""

import os
import pathlib

from clearconverse_tpu.audio.wav import write_wav
from clearconverse_tpu.config import Config, TPUConfig
from clearconverse_tpu.pipeline.dev_backend import (
    DevModels, SR, synth_conversation)
from clearconverse_tpu.pipeline.engine import TranscriptionEngine

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "devmodels_transcript.txt"


def test_devmodels_pipeline_matches_recorded_transcript(tmp_path):
    eng = TranscriptionEngine(
        Config(noise_reduction_amount=0.0, temperature=0.0),
        TPUConfig(), models=DevModels())
    wav = tmp_path / "conv.wav"
    write_wav(str(wav), synth_conversation(), SR)
    _, transcript, path = eng.run(str(wav), str(tmp_path))
    assert transcript is not None
    recorded = FIXTURE.read_text()
    assert transcript == recorded, (
        "end-to-end transcript drifted from the recorded fixture; if the "
        "change is intentional, regenerate tests/fixtures/"
        "devmodels_transcript.txt and record why in the commit message")
    # The on-disk artifact matches what run() returned.
    assert open(path).read() == recorded

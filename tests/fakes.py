"""Test shim: the deterministic weight-free backend lives in the package
(clearconverse_tpu/pipeline/dev_backend.py) so the server's dev mode can use
it too; tests import it from here under its historical name."""

from clearconverse_tpu.pipeline.dev_backend import (  # noqa: F401
    SR, LOW, HIGH, DevModels as FakeModels, band_energy, synth_conversation)

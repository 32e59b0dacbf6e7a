"""Checkpoint round-trips: orbax save/restore; export to the reference's
whisper-ft overlay formats and re-import through models/convert.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clearconverse_tpu.models.convert import (
    convert_whisper_state_dict, load_torch_state_dict)
from clearconverse_tpu.models.whisper import WhisperDims, init_whisper_params
from clearconverse_tpu.train.checkpoint import (
    export_whisper_ft, export_whisper_pt, load_checkpoint, save_checkpoint,
    whisper_to_openai_state_dict)

TINY = WhisperDims(n_mels=8, n_vocab=32, n_audio_ctx=8, n_audio_state=16,
                   n_audio_head=2, n_audio_layer=1, n_text_ctx=8,
                   n_text_state=16, n_text_head=2, n_text_layer=1)


def _trees_equal(a, b, atol=0.0):
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    assert len(leaves_a) == len(leaves_b)
    for x, y in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def test_export_openai_roundtrip():
    params = init_whisper_params(jax.random.PRNGKey(0), TINY)
    sd = whisper_to_openai_state_dict(params)
    assert "encoder.blocks.0.attn.query.weight" in sd
    assert "decoder.blocks.0.cross_attn.key.weight" in sd
    assert "encoder.blocks.0.attn.key.bias" not in sd  # key has no bias
    back = convert_whisper_state_dict(sd)
    _trees_equal(params, back)


def test_export_safetensors_overlay(tmp_path):
    params = init_whisper_params(jax.random.PRNGKey(1), TINY)
    path = export_whisper_ft(params, str(tmp_path))
    assert path.endswith("whisper-ft/model.safetensors")
    back = convert_whisper_state_dict(load_torch_state_dict(path))
    _trees_equal(params, back, atol=1e-7)


def test_export_pt_roundtrip(tmp_path):
    params = init_whisper_params(jax.random.PRNGKey(2), TINY)
    path = export_whisper_pt(params, TINY, str(tmp_path / "tiny.pt"))
    obj = load_torch_state_dict(path)
    back = convert_whisper_state_dict(obj)
    _trees_equal(params, back, atol=1e-7)
    # load_whisper picks it up as a base checkpoint.
    import torch
    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert raw["dims"]["n_audio_state"] == 16


def test_orbax_save_restore(tmp_path):
    params = init_whisper_params(jax.random.PRNGKey(3), TINY)
    save_checkpoint(str(tmp_path / "ck"), params, step=7)
    restored = load_checkpoint(str(tmp_path / "ck"))
    assert int(restored["step"]) == 7
    _trees_equal(params, restored["params"])


def test_train_cli_end_to_end(tmp_path, capsys):
    """The fine-tune CLI (python -m clearconverse_tpu.train) runs whole:
    (wav, txt) pairs → train steps → reference-compatible whisper-ft
    overlay export. Tiny model, 2 steps, ~45 s on the CPU backend."""
    import numpy as np

    from clearconverse_tpu.audio.wav import write_wav
    from clearconverse_tpu.train.__main__ import main

    pairs = tmp_path / "pairs"
    pairs.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        write_wav(str(pairs / f"ex{i}.wav"),
                  (rng.standard_normal(3 * 16000) * 0.1).astype(np.float32),
                  16000)
        (pairs / f"ex{i}.txt").write_text("hello world")

    rc = main(["--data_dir", str(pairs), "--model", "tiny",
               "--steps", "2", "--batch", "2", "--max_tokens", "8",
               "--export", str(tmp_path / "ft"),
               "--model_dir", str(tmp_path / "nomodels")])
    assert rc == 0
    out = capsys.readouterr().out
    losses = [float(line.split("loss=")[1].split()[0])
              for line in out.splitlines() if "loss=" in line]
    assert len(losses) == 2 and losses[1] < losses[0]
    overlay = tmp_path / "ft" / "whisper-ft" / "model.safetensors"
    assert overlay.exists() and overlay.stat().st_size > 1000

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

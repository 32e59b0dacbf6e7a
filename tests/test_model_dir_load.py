"""Cold-start model_dir discovery — the exact day-one path with real assets.

Every other test injects params into ModelBundle directly; these populate a
model_dir with REAL-format checkpoints (openai-whisper ``.pt`` with its
``dims`` dict, HF ``vocab.json``+``merges.txt``, a safetensors ft overlay)
and drive ``load_with_progress()`` → ``transcribe_batch`` end to end, so a
wrong filename, a dims-table override of checkpoint dims, or a tokenizer
wiring bug fails HERE instead of on first contact with downloaded weights
(reference flow: back/api.py:617-703).
"""

import json

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from clearconverse_tpu.config import Config, TPUConfig
from clearconverse_tpu.models.convert import infer_whisper_dims, load_whisper
from clearconverse_tpu.models.tokenizer import BPETokenizer, load_tokenizer
from clearconverse_tpu.models.whisper import (WhisperDims,
                                              init_whisper_params,
                                              model_dims)
from clearconverse_tpu.pipeline.bundle import ModelBundle
from clearconverse_tpu.train.checkpoint import whisper_to_openai_state_dict

# Specials sit at fixed GPT-2 positions (tokenizer.SpecialTokens.for_model),
# so even a tiny checkpoint needs the full english vocab height for decode
# to index <|endoftext|>/SOT correctly.
TINY = WhisperDims(n_mels=80, n_vocab=51864, n_audio_ctx=1500,
                   n_audio_state=64, n_audio_head=2, n_audio_layer=1,
                   n_text_ctx=448, n_text_state=64, n_text_head=2,
                   n_text_layer=1)


def _dims_dict(d: WhisperDims) -> dict:
    import dataclasses
    return dataclasses.asdict(d)


def _save_openai_pt(path, params, dims: WhisperDims) -> None:
    sd = {k: torch.tensor(np.asarray(v))
          for k, v in whisper_to_openai_state_dict(params).items()}
    torch.save({"dims": _dims_dict(dims), "model_state_dict": sd}, str(path))


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    """A model_dir holding a tiny-but-real small.en.pt and trained synthetic
    BPE assets (reusing the crossval trainer so the tokenizer is a genuine
    byte-level BPE, not a stub)."""
    d = tmp_path_factory.mktemp("model_dir")
    params = init_whisper_params(jax.random.PRNGKey(7), TINY)
    _save_openai_pt(d / "small.en.pt", params, TINY)

    from test_tokenizer_crossval import CORPUS, train_bpe
    vocab, merges = train_bpe(CORPUS, n_merges=80)
    (d / "vocab.json").write_text(json.dumps(vocab, ensure_ascii=False),
                                  encoding="utf-8")
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n",
        encoding="utf-8")
    return d, params


def test_load_whisper_uses_checkpoint_dims(model_dir):
    """The .pt's dims dict is authoritative: small.en.pt holding a TINY
    model must come back with the tiny dims, not the 768-wide table entry
    (openai load_model semantics)."""
    d, params = model_dir
    loaded, dims = load_whisper(str(d), "small.en")
    assert loaded is not None
    assert dims == TINY != model_dims("small.en")
    np.testing.assert_allclose(
        np.asarray(loaded["decoder"]["tok"]),
        np.asarray(params["decoder"]["tok"]), atol=0)


def test_load_whisper_infers_dims_from_bare_state_dict(tmp_path):
    """A bare state dict (no dims entry) still loads: every
    shape-recoverable field is inferred from the weights; the
    non-recoverable head counts fall back to the name table."""
    params = init_whisper_params(jax.random.PRNGKey(3), TINY)
    sd = {k: torch.tensor(np.asarray(v))
          for k, v in whisper_to_openai_state_dict(params).items()}
    torch.save(sd, str(tmp_path / "small.en.pt"))
    loaded, dims = load_whisper(str(tmp_path), "small.en")
    assert loaded is not None
    assert dims.n_audio_state == 64 and dims.n_text_state == 64
    assert dims.n_audio_layer == 1 and dims.n_text_layer == 1
    assert dims.n_vocab == TINY.n_vocab
    assert dims.n_audio_head == model_dims("small.en").n_audio_head


def test_ft_overlay_shapes_win(model_dir, tmp_path, monkeypatch):
    """A fine-tuned overlay with a different (vocab-extended) shape
    overrides the base: final dims come from the FINAL loaded weights."""
    import dataclasses
    import shutil
    d, _ = model_dir
    work = tmp_path / "dir"
    work.mkdir()
    shutil.copy(str(d / "small.en.pt"), str(work / "small.en.pt"))
    grown = dataclasses.replace(TINY, n_vocab=TINY.n_vocab + 7)
    ft_params = init_whisper_params(jax.random.PRNGKey(9), grown)
    (work / "whisper-ft").mkdir()
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v) for k, v in
               whisper_to_openai_state_dict(ft_params).items()},
              str(work / "whisper-ft" / "model.safetensors"))
    loaded, dims = load_whisper(str(work), "small.en")
    assert dims.n_vocab == TINY.n_vocab + 7
    assert dims.n_audio_head == TINY.n_audio_head  # from the base dims dict
    np.testing.assert_allclose(
        np.asarray(loaded["decoder"]["tok"]),
        np.asarray(ft_params["decoder"]["tok"]), atol=0)


def test_infer_whisper_dims_roundtrip():
    import dataclasses
    params = init_whisper_params(jax.random.PRNGKey(1), TINY)
    # heads come from the fallback; every other field from the shapes
    got = infer_whisper_dims(params, model_dims("small.en"))
    assert got == dataclasses.replace(TINY, n_audio_head=12, n_text_head=12)
    assert infer_whisper_dims(params, TINY) == TINY


def test_bundle_cold_start_transcribes(model_dir):
    """load_with_progress() discovers whisper + tokenizer from disk (aux
    families fall back to random init — their disk paths are covered by
    the speaker-model tests) and the bundle transcribes through the REAL
    loaded assets."""
    d, params = model_dir
    stages = []
    b = ModelBundle(Config(),  # default size small.en → finds small.en.pt
                    TPUConfig(max_decode_tokens=8, max_fallback_attempts=1,
                              compute_dtype="float32"),
                    model_dir=str(d))
    assert b.load_with_progress(lambda pct, msg: stages.append((pct, msg)))
    assert b.models_are_loaded()
    assert [p for p, _ in stages] == [10, 40, 70, 100]  # back/api.py:617-655

    w_params, dims, tok = b._whisper
    assert dims == TINY
    assert isinstance(tok, BPETokenizer)
    np.testing.assert_allclose(np.asarray(w_params["decoder"]["tok"]),
                               np.asarray(params["decoder"]["tok"]))

    audio = (np.random.default_rng(0).standard_normal((1, 16000))
             .astype(np.float32) * 0.1)
    texts = b.transcribe_batch(audio, [""], temperature=0.0)
    assert len(texts) == 1 and isinstance(texts[0], str)
    # Random-weight output decodes through the REAL BPE vocab: every token
    # the model emitted must round-trip the tokenizer without error, which
    # it just did to produce the string.

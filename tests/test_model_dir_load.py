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


TINY_ECAPA = dict(n_mels=24, channels=32, mfa_channels=48,
                  attention_channels=16, embedding_dim=16, res2net_scale=4)
TINY_PN = dict(sinc_filters=8, conv_channels=8, lstm_hidden=8,
               lstm_layers=1, linear_dims=(8,))
TINY_SEP = dict(enc_channels=16, d_model=16, n_heads=2, chunk_size=20,
                n_repeats=1, n_intra_layers=1, n_inter_layers=1)


def _t(a):
    return torch.tensor(np.ascontiguousarray(np.asarray(a)))


def _ecapa_state_dict(params) -> dict:
    """Promoted to models/ecapa.ecapa_to_state_dict (numpy); tensorized
    here because real checkpoints hold torch tensors."""
    from clearconverse_tpu.models.ecapa import ecapa_to_state_dict
    return {k: _t(v) for k, v in ecapa_to_state_dict(params).items()}


def _pyannet_state_dict(params) -> dict:
    """Promoted to models/pyannet.pyannet_to_state_dict (numpy);
    tensorized here because real checkpoints hold torch tensors."""
    from clearconverse_tpu.models.pyannet import pyannet_to_state_dict
    return {k: _t(v) for k, v in pyannet_to_state_dict(params).items()}


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    """A model_dir holding ALL FOUR families in their real on-disk formats:
    a tiny-but-real small.en.pt, trained synthetic BPE assets (reusing the
    crossval trainer so the tokenizer is a genuine byte-level BPE), a
    speechbrain-layout ecapa ckpt, a lightning-layout pyannote bin, and the
    resepformer ckpt triplet (reference layout, back/api.py:617-797)."""
    from clearconverse_tpu.models.ecapa import EcapaDims, init_ecapa_params
    from clearconverse_tpu.models.pyannet import (PyannetDims,
                                                  init_pyannet_params)
    from clearconverse_tpu.models.resepformer import (SepformerDims,
                                                      init_sepformer_params,
                                                      sepformer_to_state_dicts)

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

    aux = {}
    aux["ecapa"] = init_ecapa_params(jax.random.PRNGKey(11),
                                     EcapaDims(**TINY_ECAPA))
    (d / "embedding").mkdir()
    torch.save(_ecapa_state_dict(aux["ecapa"]),
               str(d / "embedding" / "embedding_model.ckpt"))

    aux["pyannet"] = init_pyannet_params(jax.random.PRNGKey(12),
                                         PyannetDims(**TINY_PN))
    (d / "segmentation").mkdir()
    # real pyannote bins are lightning checkpoints: state_dict wrapper
    torch.save({"state_dict": _pyannet_state_dict(aux["pyannet"])},
               str(d / "segmentation" / "pytorch_model.bin"))

    aux["sepformer"] = init_sepformer_params(jax.random.PRNGKey(13),
                                             SepformerDims(**TINY_SEP))
    enc_sd, mask_sd, dec_sd = sepformer_to_state_dicts(aux["sepformer"])
    (d / "resepformer-ft").mkdir()
    for name, sd in (("encoder.ckpt", enc_sd), ("masknet.ckpt", mask_sd),
                     ("decoder.ckpt", dec_sd)):
        torch.save({k: _t(v) for k, v in sd.items()},
                   str(d / "resepformer-ft" / name))
    return d, params, aux


def test_load_whisper_uses_checkpoint_dims(model_dir):
    """The .pt's dims dict is authoritative: small.en.pt holding a TINY
    model must come back with the tiny dims, not the 768-wide table entry
    (openai load_model semantics)."""
    d, params, _ = model_dir
    loaded, dims = load_whisper(str(d), "small.en")
    assert loaded is not None
    assert dims == TINY != model_dims("small.en")
    np.testing.assert_allclose(
        np.asarray(loaded["decoder"]["tok"]),
        np.asarray(params["decoder"]["tok"]), atol=0)


def test_load_whisper_accepts_reference_cache_layout(tmp_path):
    """whisper.load_model(download_root=cache/'whisper') stores
    cache/whisper/small.en.pt (back/api.py:660-668); a reference user's
    existing model dir must drop in without moving files."""
    params = init_whisper_params(jax.random.PRNGKey(4), TINY)
    (tmp_path / "whisper").mkdir()
    _save_openai_pt(tmp_path / "whisper" / "small.en.pt", params, TINY)
    loaded, dims = load_whisper(str(tmp_path), "small.en")
    assert loaded is not None and dims == TINY
    np.testing.assert_allclose(np.asarray(loaded["decoder"]["tok"]),
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
    d, _, _ = model_dir
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


def test_bundle_cold_start_all_families(model_dir):
    """load_with_progress() discovers all four families from disk and every
    compute path runs through the REAL loaded assets: checkpoint shapes
    govern each forward (aux dims inferred from the weights, not assumed
    from the production defaults)."""
    d, params, aux = model_dir
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

    # Aux families loaded from disk bit-exactly + dims inferred from shapes.
    for name, got in (("ecapa", b._ecapa), ("pyannet", b._pyannet),
                      ("sepformer", b._sepformer)):
        want_leaves = jax.tree.leaves(aux[name])
        got_leaves = jax.tree.leaves(got)
        assert len(want_leaves) == len(got_leaves), name
        for w, g in zip(want_leaves, got_leaves):
            np.testing.assert_allclose(np.asarray(w), np.asarray(g),
                                       atol=1e-7, err_msg=name)
    assert b._ecapa_dims.embedding_dim == TINY_ECAPA["embedding_dim"]
    assert b._ecapa_dims.res2net_scale == TINY_ECAPA["res2net_scale"]
    assert b._pyannet_dims.lstm_hidden == TINY_PN["lstm_hidden"]
    assert b._pyannet_dims.linear_dims == TINY_PN["linear_dims"]
    assert b._sepformer_dims.d_model == TINY_SEP["d_model"]
    assert b._sepformer_dims.n_repeats == TINY_SEP["n_repeats"]

    audio = (np.random.default_rng(0).standard_normal((1, 16000))
             .astype(np.float32) * 0.1)
    texts = b.transcribe_batch(audio, [""], temperature=0.0)
    assert len(texts) == 1 and isinstance(texts[0], str)

    # The other three compute paths on the cold-loaded, shape-inferred dims.
    two = (np.random.default_rng(1).standard_normal((2, 8000))
           .astype(np.float32) * 0.1)
    embs = b.embed_batch(two, np.asarray([8000, 4000]))
    assert embs.shape == (2, TINY_ECAPA["embedding_dim"])
    frames = b.segment_frames(two)
    assert frames.shape[0] == 2 and frames.shape[2] == 3
    sep = b.separate_batch(two)
    assert sep.shape == (2, 8000, 2)


def test_pyannote_lightning_metadata_does_not_block_tensors(tmp_path):
    """Real pyannote pytorch_model.bin files carry pyannote.audio objects
    (Specifications, Problem enums) in their lightning metadata; without
    pyannote installed, plain torch.load raises ModuleNotFoundError before
    the tensors are reachable. load_torch_state_dict must still deliver the
    state_dict (convert.py _load_torch_tolerant) instead of letting the
    bundle silently fall back to random init on day one."""
    import sys

    from clearconverse_tpu.models.convert import load_torch_state_dict
    from clearconverse_tpu.models.pyannet import (PyannetDims,
                                                  convert_pyannote_pyannet,
                                                  init_pyannet_params)

    mod_dir = tmp_path / "mods"
    mod_dir.mkdir()
    (mod_dir / "cc_fake_pyannote_meta.py").write_text(
        "import enum\n"
        "class Problem(enum.Enum):\n    MULTI_LABEL = 2\n"
        "class Specifications:\n"
        "    def __init__(self, problem, duration):\n"
        "        self.problem, self.duration = problem, duration\n")
    sys.path.insert(0, str(mod_dir))
    try:
        import cc_fake_pyannote_meta as meta
        params = init_pyannet_params(jax.random.PRNGKey(5),
                                     PyannetDims(**TINY_PN))
        ckpt = {
            "pytorch-lightning_version": "2.0.0",
            "hyper_parameters": {"sincnet": {"stride": 10}},
            "pyannote.audio": {
                "architecture": {"module": "pyannote.audio.models.segmentation",
                                 "class": "PyanNet"},
                "specifications": meta.Specifications(
                    meta.Problem.MULTI_LABEL, 10.0),
            },
            "state_dict": _pyannet_state_dict(params),
        }
        path = tmp_path / "pytorch_model.bin"
        torch.save(ckpt, str(path))
    finally:
        sys.path.remove(str(mod_dir))
        sys.modules.pop("cc_fake_pyannote_meta", None)

    # Precondition: the scenario is real — plain torch.load cannot reach
    # the tensors once the metadata's classes are unimportable.
    with pytest.raises((ModuleNotFoundError, AttributeError, ImportError)):
        torch.load(str(path), map_location="cpu", weights_only=False)

    sd = load_torch_state_dict(str(path))
    converted = convert_pyannote_pyannet(sd)
    for want, got in zip(jax.tree.leaves(params), jax.tree.leaves(converted)):
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=1e-7)

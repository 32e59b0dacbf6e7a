"""eval/dress_rehearsal — real-format synthetic checkpoints (VERDICT r4 #3).

The full-scale run happens on the real chip (populate into ./models, then
bench.py); these tests prove the same code path end-to-end at tiny dims:
populate() writes every family in its REAL on-disk format and a cold
ModelBundle discovers and converts all of them (load_source records it),
including the fp16 upcast real openai ``.pt`` files require.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from clearconverse_tpu.config import Config, TPUConfig
from clearconverse_tpu.eval.dress_rehearsal import populate, write_tokenizer
from clearconverse_tpu.models.tokenizer import BPETokenizer, load_tokenizer
from clearconverse_tpu.pipeline.bundle import ModelBundle


@pytest.fixture(scope="module")
def rehearsal_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rehearsal")
    populate(str(d), tiny=True, seed=42)
    return d


def test_layout_matches_reference_discovery(rehearsal_dir):
    d = rehearsal_dir
    for rel in ("small.en.pt", "vocab.json", "merges.txt",
                "embedding/embedding_model.ckpt",
                "segmentation/pytorch_model.bin",
                "resepformer-ft/encoder.ckpt",
                "resepformer-ft/masknet.ckpt",
                "resepformer-ft/decoder.ckpt"):
        assert (d / rel).exists(), rel


def test_whisper_pt_is_fp16_openai_format(rehearsal_dir):
    """Real openai checkpoints are fp16 with a dims dict; the synthetic one
    must match so the rehearsal actually exercises the upcast."""
    obj = torch.load(str(rehearsal_dir / "small.en.pt"),
                     map_location="cpu", weights_only=False)
    assert set(obj) == {"dims", "model_state_dict"}
    assert obj["dims"]["n_audio_state"] == 64
    t = obj["model_state_dict"]["decoder.token_embedding.weight"]
    assert t.dtype == torch.float16


def test_bundle_cold_start_loads_every_family_as_checkpoint(rehearsal_dir):
    b = ModelBundle(Config(),
                    TPUConfig(max_decode_tokens=8, max_fallback_attempts=1,
                              compute_dtype="float32"),
                    model_dir=str(rehearsal_dir))
    assert b.load_with_progress()
    assert b.load_source == {"whisper": "checkpoint",
                             "tokenizer": "BPETokenizer",
                             "ecapa": "checkpoint",
                             "pyannet": "checkpoint",
                             "sepformer": "checkpoint"}
    params, dims, tok = b._whisper
    # fp16 ckpt → f32 params on device: anything else would miss every
    # cached (f32-param) program shape on first real-weights contact.
    assert np.asarray(params["decoder"]["tok"]).dtype == np.float32
    assert dims.n_audio_state == 64 and dims.n_vocab == 51864
    assert isinstance(tok, BPETokenizer)
    leaf = np.asarray(b._ecapa["conv1"]["w"])
    assert leaf.dtype == np.float32


def test_aux_checkpoint_params_are_placed_on_device(rehearsal_dir):
    """Converted checkpoints arrive as HOST numpy pytrees; _place_aux must
    move them to device once, or every embed/segment/separate call
    re-uploads the full weights through the tunnel (measured round 5:
    engine 430x random-init vs 165x checkpoint before the fix — numpy
    ECAPA leaves cost ~25 MB of re-upload per embed batch)."""
    import jax

    b = ModelBundle(Config(),
                    TPUConfig(max_decode_tokens=8, max_fallback_attempts=1,
                              compute_dtype="float32"),
                    model_dir=str(rehearsal_dir))
    assert b.load_with_progress()
    b._place_aux()
    for name in ("_ecapa", "_pyannet", "_sepformer"):
        leaves = jax.tree.leaves(getattr(b, name))
        assert leaves and all(isinstance(x, jax.Array) for x in leaves), name


def test_fp16_aux_checkpoint_upcasts(tmp_path):
    """speechbrain/pyannote fp16 exports go through bare np.asarray in the
    aux converters — load_torch_state_dict must upcast first."""
    from clearconverse_tpu.models.convert import load_torch_state_dict
    torch.save({"x.weight": torch.zeros(3, dtype=torch.float16),
                "n": torch.arange(3)}, str(tmp_path / "m.ckpt"))
    sd = load_torch_state_dict(str(tmp_path / "m.ckpt"))
    assert sd["x.weight"].dtype == torch.float32
    assert sd["n"].dtype == torch.int64  # integers untouched


def test_tokenizer_assets_are_structurally_valid_bpe(tmp_path):
    write_tokenizer(str(tmp_path), n_merges=500)
    vocab = json.loads((tmp_path / "vocab.json").read_text(encoding="utf-8"))
    assert len(vocab) == 256 + 500 + 1
    assert vocab["<|endoftext|>"] == 756
    seen = set(tok for tok, i in vocab.items() if i < 256)
    merged = 0
    for line in (tmp_path / "merges.txt").read_text(
            encoding="utf-8").splitlines():
        if line.startswith("#version"):
            continue
        a, b = line.split(" ")
        # structural BPE validity: both parents exist before the child
        assert a in seen or len(a) == 1
        assert b in seen or len(b) == 1
        seen.add(a + b)
        merged += 1
    assert merged == 500
    tok = load_tokenizer(str(tmp_path))
    assert isinstance(tok, BPETokenizer)
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"


def test_full_scale_vocab_height():
    """The real-scale assets must hit GPT-2's exact 50 257 height (256
    bytes + 50 000 merges + endoftext) — run on a tmpdir at full height
    but without the models (fast)."""
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        write_tokenizer(d, n_merges=50000)
        vocab = json.loads(open(os.path.join(d, "vocab.json"),
                                encoding="utf-8").read())
        assert len(vocab) == 50257
        assert vocab["<|endoftext|>"] == 50256


def test_bench_autogen_regenerates_missing_models(tmp_path, monkeypatch):
    """bench._ensure_models rebuilds a wiped ./models (round-5 incident:
    the gitignored dir vanished in a workspace reset, which would flip the
    driver's engine numbers back to random_weights). Trigger matrix:
    present -> no-op, missing -> one CPU-pinned subprocess, deep budget ->
    skip, CC_BENCH_AUTOGEN_MODELS=0 -> skip."""
    import subprocess
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    try:
        import bench
    finally:
        _sys.path.pop(0)

    calls = []
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: calls.append((a, k)))
    monkeypatch.chdir(tmp_path)

    # present: the discovery path accepts both flat and whisper/ layouts
    os.makedirs("models/whisper")
    open("models/whisper/small.en.pt", "wb").close()
    monkeypatch.setattr(bench, "_MODELS_ENSURED", False)
    bench._ensure_models(1e9)
    assert calls == []

    os.remove("models/whisper/small.en.pt")
    monkeypatch.setattr(bench, "_MODELS_ENSURED", False)
    bench._ensure_models(1e9)
    assert len(calls) == 1
    argv = calls[0][0][0]
    assert argv[1:4] == ["-m", "clearconverse_tpu.eval.dress_rehearsal",
                         "--model-dir"]

    monkeypatch.setattr(bench, "_MODELS_ENSURED", False)
    bench._ensure_models(5.0)          # too deep to start a 2-min regen
    assert len(calls) == 1

    monkeypatch.setenv("CC_BENCH_AUTOGEN_MODELS", "0")
    monkeypatch.setattr(bench, "_MODELS_ENSURED", False)
    bench._ensure_models(1e9)
    assert len(calls) == 1

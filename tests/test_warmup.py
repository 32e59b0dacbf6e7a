"""serve/warmup — compile-cache warmup CLI.

The warmup's value is only realizable on the tunnel-attached TPU (where a
first compile per shape costs minutes); these tests pin the parts that
must be exactly right for the warmed programs to BE the serving programs:
the width-targeted triangle files must pack at their intended width (a
one-bit miss warms the wrong gate program), and the drive plan must cover
every (files, duration, width) combination through the real engine/loader
code paths.
"""

import numpy as np

from clearconverse_tpu.audio.pack import WIDTH_BUCKETS, pack_i16_batch
from clearconverse_tpu.pipeline.dev_backend import SR
from clearconverse_tpu.serve.warmup import (
    main, run_warmup, triangle_for_width, warmup_conversation)


def test_triangle_targets_each_width_bucket():
    """Each width bucket's triangle file delta-packs at EXACTLY that width
    after the write_wav(round(x*32767)) round-trip."""
    for w in WIDTH_BUCKETS:
        x = triangle_for_width(w, 1, SR)
        q = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
        pb = pack_i16_batch(q[None], np.array([len(q)]), allow_numpy=True)
        assert pb is not None and (pb.width, pb.order) == (w, 1), \
            (w, pb and (pb.width, pb.order))


def test_warmup_conversation_shapes():
    """Short durations tile the dev layout; >=24 s gains the continuous
    low stretch that exercises the larger decode buckets."""
    short = warmup_conversation(5, SR)
    assert short.shape == (5 * SR,) and short.dtype == np.float32
    long = warmup_conversation(60, SR)
    assert long.shape == (60 * SR,)
    # the mid-file stretch is continuous low-band energy (no gaps)
    mid = long[15 * SR: 40 * SR]
    assert float(np.min(np.abs(mid).reshape(25, SR).max(axis=1))) > 0.1


def test_run_warmup_drives_every_combination():
    """Dev-mode end-to-end: one engine pass per (files, duration) plus one
    packed-wire gate drive per (files, duration, width bucket), all
    through the real process_files / load_audio_many code paths."""
    from clearconverse_tpu.config import Config
    from clearconverse_tpu.pipeline.dev_backend import DevModels
    from clearconverse_tpu.pipeline.engine import TranscriptionEngine

    def factory():
        return TranscriptionEngine(Config(noise_reduction_amount=0.0),
                                   models=DevModels())

    lines = []
    entries = run_warmup(durations=(5,), file_counts=(1,), widths=True,
                         engine_factory=factory, log=lines.append)
    labels = [e["drive"] for e in entries]
    assert labels[0] == "engine files=1 duration=5s"
    assert len(entries) == 1 + len(WIDTH_BUCKETS)
    for w in WIDTH_BUCKETS:
        assert f"packed-wire gate files=1 duration=5s width={w}" in labels
    assert len(lines) == len(entries)


def test_warm_decode_shapes_covers_every_row_bucket():
    """The decode-shape stage drives transcribe_long_batch at every
    power-of-two row bucket (× prompt buckets) STORE-BACKED — the variant
    production dispatches (supports_store engines group windows into
    StoreBatches; greedy_decode_from_store is a different jitted program
    than from-audio) — and transcribe_batch at every row bucket × duration
    in BOTH variants (store = diarized original-audio segments, host =
    separated overlap clips) — through a real ModelBundle with the
    deployment config, so the warmed programs ARE the serving programs."""
    import jax
    from clearconverse_tpu.config import Config, TPUConfig
    from clearconverse_tpu.models.tokenizer import ByteFallbackTokenizer
    from clearconverse_tpu.models.whisper import (WhisperDims,
                                                  init_whisper_params)
    from clearconverse_tpu.pipeline.bundle import ModelBundle
    from clearconverse_tpu.serve.warmup import warm_decode_shapes

    dims = WhisperDims(n_mels=80, n_vocab=51864, n_audio_ctx=1500,
                       n_audio_state=64, n_audio_head=2, n_audio_layer=1,
                       n_text_ctx=448, n_text_state=64, n_text_head=2,
                       n_text_layer=1)
    bundle = ModelBundle(Config(transcription_batch_size=2),
                         TPUConfig(max_decode_tokens=4,
                                   compute_dtype="float32"))
    bundle._whisper = (init_whisper_params(jax.random.PRNGKey(0), dims),
                      dims, ByteFallbackTokenizer(english=True))
    bundle._loaded = True

    class _Eng:
        models = bundle
        config = bundle.config

    from clearconverse_tpu.pipeline.bundle import StoreBatch

    drives = []
    store_drives = []

    def drive(label, fn):
        res = fn()
        drives.append(label)
        return res

    real_long = bundle.transcribe_long_batch
    real_short = bundle.transcribe_batch

    def spy_long(audio, *a, **kw):
        store_drives.append(("long", isinstance(audio, StoreBatch)))
        return real_long(audio, *a, **kw)

    def spy_short(audio, *a, **kw):
        store_drives.append(("short", isinstance(audio, StoreBatch)))
        return real_short(audio, *a, **kw)

    bundle.transcribe_long_batch = spy_long
    bundle.transcribe_batch = spy_short
    warm_decode_shapes(_Eng(), drive, durations=(5,))
    buckets = ["p4", "p16", "p64", "p256"]
    assert drives == (
        [f"decode long-window rows={n} prompt={p}"
         for n in (1, 2) for p in buckets]
        + ["decode short store rows=1 duration=5s",
           "decode short host rows=1 duration=5s",
           "decode short store rows=2 duration=5s",
           "decode short host rows=2 duration=5s",
           "decode short store rows=1 prompt=p64",
           "decode short store rows=2 prompt=p64"])
    # Long drives are ALL store-backed (production's store_groups path);
    # short drives alternate store/host per the labels.
    assert all(is_store for kind, is_store in store_drives
               if kind == "long")
    short_flags = [s for k, s in store_drives if k == "short"]
    assert short_flags == [True, False, True, False, True, True]

    # The prompt ladder must actually LAND in every prompt-length bucket
    # (4/16/64/256) — under the byte-fallback tokenizer here, and sized so
    # the real GPT-2 BPE lands the same (a missed bucket = a first-request
    # compile the warm claimed to prevent).
    tok = bundle._whisper[2]
    got = []
    for p in ["", "ctx " * 3, "ctx " * 9, "ctx " * 100]:
        _, _, max_p, _ = bundle._prompt_batch([p], tok, dims,
                                              timestamps=True)
        got.append(max_p)
    assert got == [4, 16, 64, 256]


def test_warm_decode_shapes_noop_without_real_bundle():
    """Dev backends (no jit programs) skip the stage cleanly."""
    from clearconverse_tpu.config import Config
    from clearconverse_tpu.pipeline.dev_backend import DevModels
    from clearconverse_tpu.pipeline.engine import TranscriptionEngine
    from clearconverse_tpu.serve.warmup import warm_decode_shapes

    eng = TranscriptionEngine(Config(noise_reduction_amount=0.0),
                              models=DevModels())
    calls = []
    warm_decode_shapes(eng, lambda label, fn: calls.append(label))
    assert calls == []


def test_main_smoke(monkeypatch, capsys):
    """CLI arg parsing end to end (dev backend; --no-widths)."""
    monkeypatch.setenv("CC_TPU_FAKE_MODELS", "1")
    assert main(["--durations", "5", "--files", "1", "--no-widths"]) == 0
    out = capsys.readouterr().out
    assert "warmup done: 1 drives" in out

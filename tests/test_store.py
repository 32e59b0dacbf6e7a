"""Device-resident AudioStore paths == host-upload paths, bit-for-bit where
expected: window gathers (models/decoding.gather_windows), store-backed
transcribe/segmentation, and the engine end-to-end with the store on vs off.

The store exists to kill bulk audio re-uploads (measured ~26 MB/s through
the device tunnel); correctness contract: a (row, start, len) gather equals
the host-extracted, zero-padded window exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clearconverse_tpu.config import Config, TPUConfig
from clearconverse_tpu.pipeline.bundle import StoreBatch

from test_multichip_serving import _tiny_bundle


@pytest.fixture(scope="module")
def bundle():
    return _tiny_bundle(TPUConfig(max_decode_tokens=8,
                                  compute_dtype="float32"))


def _make_store(bundle, files, sr=16000):
    T = max(len(f) for f in files)
    batch = np.zeros((len(files), T), np.float32)
    for i, f in enumerate(files):
        batch[i, : len(f)] = f
    return bundle.make_store(jnp.asarray(batch), sr)


def test_gather_windows_equals_host_slices(rng):
    from clearconverse_tpu.models.decoding import gather_windows

    files = [rng.standard_normal(50000).astype(np.float32),
             rng.standard_normal(30000).astype(np.float32)]
    T = 50000
    batch = np.zeros((2, T), np.float32)
    for i, f in enumerate(files):
        batch[i, : len(f)] = f
    dev = jnp.pad(jnp.asarray(batch), ((0, 0), (0, 16000)))

    rows = np.asarray([0, 1, 1, 0], np.int32)
    starts = np.asarray([0, 10000, 25000, 45000], np.int32)
    lens = np.asarray([16000, 16000, 4000, 5000], np.int32)
    got = np.asarray(gather_windows(dev, jnp.asarray(rows),
                                    jnp.asarray(starts), jnp.asarray(lens),
                                    16000))
    for k in range(4):
        want = np.zeros(16000, np.float32)
        src = batch[rows[k], starts[k]: starts[k] + lens[k]]
        want[: len(src)] = src
        np.testing.assert_array_equal(got[k], want)


def test_store_transcribe_equals_host(bundle, rng):
    files = [rng.standard_normal(60000).astype(np.float32) * 0.1,
             rng.standard_normal(40000).astype(np.float32) * 0.1]
    store = _make_store(bundle, files)
    # Three segments: (file, start, len)
    refs = [(0, 0, 16000), (1, 8000, 16000), (0, 30000, 12000)]
    sb = StoreBatch(store, [r[0] for r in refs], [r[1] for r in refs],
                    [r[2] for r in refs], 16000)
    host = np.zeros((3, 16000), np.float32)
    for k, (f, s, n) in enumerate(refs):
        host[k, :n] = files[f][s: s + n]

    prompts = ["", "ctx", ""]
    t_store = bundle.transcribe_batch(sb, prompts, temperature=0.0)
    t_host = bundle.transcribe_batch(host, prompts, temperature=0.0)
    assert t_store == t_host


def test_store_transcribe_long_equals_host(bundle, rng):
    files = [rng.standard_normal(16 * 16000).astype(np.float32) * 0.1]
    store = _make_store(bundle, files)
    sb = StoreBatch(store, [0], [0], [12 * 16000], 30 * 16000)
    host = np.zeros((1, 30 * 16000), np.float32)
    host[0, : 12 * 16000] = files[0][: 12 * 16000]
    r_store = bundle.transcribe_long_batch(sb, [""])
    r_host = bundle.transcribe_long_batch(host, [""],
                                          np.asarray([12 * 16000]))
    assert r_store == r_host


def test_store_segment_frames_equals_host(bundle, rng):
    files = [rng.standard_normal(40000).astype(np.float32) * 0.1]
    store = _make_store(bundle, files)
    win = 32000
    host = np.zeros((2, win), np.float32)
    host[0] = files[0][:win]
    host[1, : 40000 - win] = files[0][win:]
    got = bundle.segment_frames_store(store, [0, 0], [0, win], win)
    want = bundle.segment_frames(host)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_file_activities_store_equals_host(bundle, rng):
    from clearconverse_tpu.pipeline.diarize import file_activities

    files = [rng.standard_normal(20 * 16000).astype(np.float32) * 0.1,
             rng.standard_normal(14 * 16000).astype(np.float32) * 0.1]
    store = _make_store(bundle, files)
    with_store = file_activities(bundle, files, 16000, store=store,
                                 store_rows=[0, 1])
    without = file_activities(bundle, files, 16000)
    for (a, ha), (b, hb) in zip(with_store, without):
        assert ha == hb
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_embed_frames_store_equals_host(bundle, rng):
    """Non-contiguous frame-gather embeds (diarization's exclusive-frame
    clips) == embedding the host-assembled concatenation: scattered frames,
    an over-budget clip truncated at pad, and zero-padding past totals."""
    sr = 16000
    files = [rng.standard_normal(8 * sr).astype(np.float32) * 0.1,
             rng.standard_normal(6 * sr).astype(np.float32) * 0.1]
    store = _make_store(bundle, files, sr)
    fr, pad = 270, 3 * sr
    F = -(-pad // fr)
    starts0 = np.asarray([k * fr for k in range(0, 40, 4)])   # 10 scattered
    starts1 = np.asarray([k * fr for k in range(200)])        # > pad budget
    fstarts = np.zeros((2, F), np.int32)
    fstarts[0, : len(starts0)] = starts0
    fstarts[1, :] = starts1[:F]
    totals = np.asarray([len(starts0) * fr, pad], np.int32)
    got = bundle.embed_frames_store(store, [0, 1], fstarts, totals, fr, pad)

    host = np.zeros((2, pad), np.float32)
    clip0 = np.concatenate([files[0][s: s + fr] for s in starts0])
    host[0, : len(clip0)] = clip0
    host[1] = np.concatenate([files[1][s: s + fr] for s in starts1])[:pad]
    want = bundle.embed_batch(host, np.asarray([len(clip0), pad]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_diarize_many_store_equals_host(bundle):
    """diarize_many with a device store (clips assembled on device via
    embed_frames_store/embed_store) == the host-upload path, driven by a
    hand-built activity matrix so carving covers both descriptor kinds:
    exclusive-frame clips AND a mixed-overlap contiguous fallback."""
    from clearconverse_tpu.models.pyannet import PyannetDims
    from clearconverse_tpu.pipeline.diarize import diarize_many

    sr = 16000
    rng = np.random.default_rng(7)
    files = [rng.standard_normal(12 * sr).astype(np.float32) * 0.1,
             rng.standard_normal(9 * sr).astype(np.float32) * 0.1]
    store = _make_store(bundle, files, sr)
    fhop = PyannetDims().frame_hop_seconds

    def act_for(n_samples):
        F = int(n_samples / sr / fhop)
        act = np.zeros((F, 3), np.float32)
        a, b = int(3.0 / fhop), int(6.0 / fhop)
        act[:b, 0] = 0.9              # slot 0 active 0-6 s
        act[a:, 1] = 0.9              # slot 1 active 3 s-end → 3-6 s mixed
        return act, fhop

    activities = [act_for(len(f)) for f in files]
    kw = dict(min_speakers=1, max_speakers=2, activities=activities,
              cluster_threshold=0.7)
    with_store = diarize_many(bundle, files, sr, store=store,
                              store_rows=[0, 1], **kw)
    without = diarize_many(bundle, files, sr, **kw)
    assert with_store == without
    assert all(segs for segs in without)      # non-vacuous


def test_engine_store_on_equals_off(bundle, rng, tmp_path):
    """Full engine: device-store path produces the same transcript items as
    the host-upload path."""
    from clearconverse_tpu.audio.wav import write_wav
    from clearconverse_tpu.pipeline.engine import TranscriptionEngine

    wavs = []
    for i in range(2):
        x = np.clip(rng.standard_normal(6 * 16000) * 0.2, -0.9, 0.9)
        p = str(tmp_path / f"s{i}.wav")
        write_wav(p, x.astype(np.float32), 16000)
        wavs.append(p)

    cfg = Config(noise_reduction_amount=0.2, temperature=0.0)
    tpu = TPUConfig(max_decode_tokens=8, compute_dtype="float32",
                    diarization_onset=0.35, diarization_offset=0.25)

    def run(use_store):
        eng = TranscriptionEngine(cfg, tpu, models=bundle)
        old = type(bundle).supports_store
        type(bundle).supports_store = use_store
        try:
            res = eng.process_files(wavs)
        finally:
            type(bundle).supports_store = old
        return [[(s.start, s.end, s.speaker_id, s.transcription)
                 for s in r["segments"]] if r else None for r in res]

    assert run(True) == run(False)


def test_embed_descs_store_ragged_frames_fall_back_per_clip(bundle, rng):
    """A clip whose frame lengths vary WITHIN the clip (float hop × sr
    rounding, e.g. sr=22050) is reported in ``missing`` for per-clip host
    fallback; uniform clips still ride the device gather (ADVICE r3: one
    ragged clip must not abort the whole store-gathered batch)."""
    from clearconverse_tpu.pipeline.diarize import (_clips_from_descs,
                                                    _embed_descs_store,
                                                    _pad_clips)

    sr = 16000
    files = [rng.standard_normal(8 * sr).astype(np.float32) * 0.1]
    store = _make_store(bundle, files, sr)
    fr = 270
    uniform = ("frames",
               np.asarray([0, 2 * fr, 4 * fr], np.int64),
               np.asarray([fr, 3 * fr, 5 * fr], np.int64))
    ragged = ("frames", np.asarray([0, 500], np.int64),
              np.asarray([270, 771], np.int64))       # lengths 270, 271
    res = _embed_descs_store(bundle, store, [0, 0], [uniform, ragged], sr)
    assert res is not None
    embs, missing = res
    assert missing == [1]
    batch, lengths = _pad_clips(_clips_from_descs(files[0], [uniform]), sr)
    want = bundle.embed_batch(batch, lengths)
    np.testing.assert_allclose(embs[0], want[0], rtol=1e-5, atol=1e-6)


def test_diarize_many_ragged_hop_store_equals_host(bundle):
    """diarize_many with a frame hop whose hop×sr is NON-integer (frame
    lengths alternate by one sample) still equals the host path: ragged
    clips fall back per clip instead of dropping the whole batch to
    per-clip uploads."""
    from clearconverse_tpu.pipeline.diarize import diarize_many

    sr = 16000
    rng = np.random.default_rng(11)
    files = [rng.standard_normal(12 * sr).astype(np.float32) * 0.1]
    store = _make_store(bundle, files, sr)
    fhop = 0.0168755                      # × 16000 = 270.008 samples/frame

    F = int(len(files[0]) / sr / fhop)
    act = np.zeros((F, 3), np.float32)
    act[: int(6.0 / fhop), 0] = 0.9       # one long exclusive run → one
    activities = [(act, fhop)]            # clip spanning a 271-length frame

    kw = dict(min_speakers=1, max_speakers=2, activities=activities,
              cluster_threshold=0.7)
    with_store = diarize_many(bundle, files, sr, store=store,
                              store_rows=[0], **kw)
    without = diarize_many(bundle, files, sr, **kw)
    assert with_store == without
    assert all(segs for segs in without)


def test_engine_store_results_audio_is_ndarray(bundle, rng, tmp_path):
    """AudioSegment.audio is a PUBLIC np.ndarray contract: the store path's
    lazy clips must materialize at the pipeline boundary (engine._finalize)
    so consumers can tobytes()/astype()/pickle the result."""
    from clearconverse_tpu.audio.wav import write_wav
    from clearconverse_tpu.pipeline.engine import TranscriptionEngine

    x = np.clip(rng.standard_normal(6 * 16000) * 0.2, -0.9, 0.9)
    p = str(tmp_path / "s.wav")
    write_wav(p, x.astype(np.float32), 16000)

    eng = TranscriptionEngine(
        Config(noise_reduction_amount=0.2, temperature=0.0),
        TPUConfig(max_decode_tokens=8, compute_dtype="float32",
                  diarization_onset=0.35, diarization_offset=0.25),
        models=bundle)
    res = eng.process_files([p])
    assert res[0] is not None and res[0]["segments"]
    for seg in res[0]["segments"]:
        assert type(seg.audio) is np.ndarray
        seg.audio.tobytes()               # ndarray-only surface

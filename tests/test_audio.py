"""Audio frontend tests: WAV codec round-trips, resampler math vs a
brute-force NumPy reference (the exact torchaudio formulation), Whisper
log-mel vs an independent FFT-based NumPy implementation, spectral gate
invariants."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from clearconverse_tpu.audio import wav as wavmod
from clearconverse_tpu.audio.resample import resample
from clearconverse_tpu.audio import mel as melmod
from clearconverse_tpu.audio.denoise import spectral_gate, peak_normalize


# ---------------------------------------------------------------- WAV codec

def test_wav_roundtrip_mono(tmp_path, rng):
    x = np.clip(rng.standard_normal(16000) * 0.3, -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "a.wav")
    wavmod.write_wav(p, x, 16000)
    y, sr = wavmod.read_wav(p)
    assert sr == 16000 and y.shape == (1, 16000)
    assert np.max(np.abs(y[0] - x)) < 2.0 / 32768


def test_wav_roundtrip_stereo(tmp_path, rng):
    x = np.clip(rng.standard_normal((2, 8000)) * 0.3, -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "s.wav")
    wavmod.write_wav(p, x, 44100)
    y, sr = wavmod.read_wav(p)
    assert sr == 44100 and y.shape == (2, 8000)
    assert np.max(np.abs(y - x)) < 2.0 / 32768


def test_wav_float32_and_24bit(tmp_path, rng):
    # Hand-build an IEEE-float WAV and a 24-bit PCM WAV, decode both.
    import struct
    x = np.clip(rng.standard_normal(1000) * 0.3, -0.99, 0.99).astype(np.float32)

    body = x.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 16000 * 4, 4, 32)
    hdr += b"data" + struct.pack("<I", len(body))
    p = tmp_path / "f32.wav"
    p.write_bytes(hdr + body)
    y, sr = wavmod.read_wav(str(p))
    np.testing.assert_allclose(y[0], x, atol=1e-7)

    ints = np.clip(np.round(x * 8388607), -8388608, 8388607).astype(np.int64)
    raw = bytearray()
    for v in ints:
        raw += int(v & 0xFFFFFF).to_bytes(3, "little")
    hdr = b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 16000 * 3, 3, 24)
    hdr += b"data" + struct.pack("<I", len(raw))
    p = tmp_path / "p24.wav"
    p.write_bytes(hdr + bytes(raw))
    y, _ = wavmod.read_wav(str(p))
    assert np.max(np.abs(y[0] - x)) < 2.0 / 8388608


def test_read_wav_i16_fast_path(tmp_path, rng):
    """Mono 16-bit PCM reads back bit-exact as raw int16; any other layout
    (stereo, float) declines so callers fall back to read_wav."""
    import struct
    q = rng.integers(-32768, 32768, 4000).astype("<i2")
    body = q.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
    hdr += b"data" + struct.pack("<I", len(body))
    p = tmp_path / "i16.wav"
    p.write_bytes(hdr + body)
    got = wavmod.read_wav_i16(str(p))
    assert got is not None
    raw, sr = got
    assert sr == 16000 and raw.dtype == np.int16
    np.testing.assert_array_equal(raw, q)

    x = np.clip(rng.standard_normal(1000) * 0.3, -0.99, 0.99).astype(np.float32)
    st = str(tmp_path / "st.wav")
    wavmod.write_wav(st, np.stack([x, x]), 16000)
    assert wavmod.read_wav_i16(st) is None


# ---------------------------------------------------------------- Resampler

def _numpy_sinc_resample(x, orig, new, width_f=6, rolloff=0.99):
    """Brute-force windowed-sinc resampler (torchaudio math, O(T·K))."""
    gcd = math.gcd(orig, new)
    orig, new = orig // gcd, new // gcd
    base = min(orig, new) * rolloff
    width = math.ceil(width_f * orig / base)
    idx = np.arange(-width, width + orig, dtype=np.float64) / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx[None, :]
    t *= base
    t = np.clip(t, -width_f, width_f)
    window = np.cos(t * np.pi / width_f / 2) ** 2
    t *= np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t)) * window
    kernel *= base / orig

    T = len(x)
    xp = np.concatenate([np.zeros(width), x, np.zeros(width + orig)])
    n_frames = (len(xp) - kernel.shape[1]) // orig + 1
    out = np.zeros((n_frames, new))
    for f in range(n_frames):
        seg = xp[f * orig : f * orig + kernel.shape[1]]
        out[f] = kernel @ seg
    target = int(math.ceil(new * T / orig))
    return out.reshape(-1)[:target]


@pytest.mark.parametrize("orig,new", [(44100, 16000), (8000, 16000), (22050, 16000)])
def test_resample_matches_reference(orig, new, rng):
    x = rng.standard_normal(orig // 4).astype(np.float32)
    ours = np.asarray(resample(jnp.asarray(x), orig, new))
    ref = _numpy_sinc_resample(x.astype(np.float64), orig, new)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_resample_preserves_tone_frequency():
    sr_in, sr_out, f0 = 48000, 16000, 440.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), sr_in, sr_out))
    spec = np.abs(np.fft.rfft(y[1000:-1000] * np.hanning(len(y) - 2000)))
    peak_hz = np.argmax(spec) * sr_out / (len(y) - 2000)
    assert abs(peak_hz - f0) < 2.0


def test_resample_identity():
    x = jnp.ones((3, 100))
    assert resample(x, 16000, 16000) is x


# ---------------------------------------------------------------- Log-mel

def _numpy_whisper_logmel(audio):
    """Independent NumPy reimplementation of whisper's log_mel_spectrogram."""
    N_FFT, HOP = 400, 160
    window = 0.5 * (1 - np.cos(2 * np.pi * np.arange(N_FFT) / N_FFT))
    pad = N_FFT // 2
    x = np.pad(audio, pad, mode="reflect")
    n_frames = 1 + len(audio) // HOP
    frames = np.stack([x[i * HOP : i * HOP + N_FFT] for i in range(n_frames)])
    spec = np.fft.rfft(frames * window, axis=-1)
    power = np.abs(spec[:-1]) ** 2  # drop last frame
    fb = melmod.mel_filterbank()
    m = power @ fb
    log_spec = np.log10(np.maximum(m, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).T  # [n_mels, frames]


def test_logmel_matches_numpy_reference(rng):
    audio = rng.standard_normal(16000).astype(np.float32) * 0.1
    ours = np.asarray(melmod.log_mel_spectrogram(jnp.asarray(audio)))[0]
    ref = _numpy_whisper_logmel(audio)
    assert ours.shape == ref.shape == (80, 100)
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_logmel_fft_and_matmul_paths_agree(rng):
    audio = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32) * 0.1)
    a = np.asarray(melmod.log_mel_spectrogram(audio, use_fft=False))
    b = np.asarray(melmod.log_mel_spectrogram(audio, use_fft=True))
    np.testing.assert_allclose(a, b, atol=5e-4)


def test_mel_filterbank_properties():
    fb = melmod.mel_filterbank()  # [201, 80]
    assert fb.shape == (201, 80)
    assert (fb >= 0).all()
    # Slaney mel scale: linear region filter peaks are evenly spaced in Hz.
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks.astype(int)) >= 0).all()


def test_pure_tone_hits_expected_mel_bin():
    sr, f0 = 16000, 1000.0
    t = np.arange(sr) / sr
    audio = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    m = np.asarray(melmod.log_mel_spectrogram(jnp.asarray(audio)))[0]
    hot = m.mean(axis=1).argmax()
    fb = melmod.mel_filterbank()
    freqs = np.linspace(0, sr / 2, 201)
    center = freqs[fb[:, hot].argmax()]
    assert abs(center - f0) < 100


# ---------------------------------------------------------------- Denoise

def test_spectral_gate_reduces_noise_keeps_burst(rng):
    # Stationary gating thresholds each frequency at its own long-run
    # statistics, so a transient burst (speech-like) survives while the
    # steady noise floor is suppressed.
    sr = 16000
    t = np.arange(2 * sr) / sr
    burst_sig = 0.6 * rng.standard_normal(2 * sr)  # broadband, speech-like
    gate_on = ((t > 0.8) & (t < 1.2)).astype(np.float64)
    noise = 0.03 * rng.standard_normal(2 * sr)
    x = (burst_sig * gate_on + noise).astype(np.float32)
    y = np.asarray(spectral_gate(jnp.asarray(x), sr, prop_decrease=1.0))
    assert y.shape == x.shape

    burst = slice(int(0.85 * sr), int(1.15 * sr))
    quiet = slice(int(1.5 * sr), int(1.95 * sr))
    # Burst energy survives; the noise-only region is strongly attenuated.
    assert np.square(y[burst]).sum() > 0.5 * np.square(x[burst]).sum()
    assert np.square(y[quiet]).sum() < 0.3 * np.square(x[quiet]).sum()


def test_spectral_gate_batched_with_mask(rng):
    x = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    mask = np.ones((2, 8000), np.float32)
    mask[1, 4000:] = 0
    y = np.asarray(spectral_gate(jnp.asarray(x), 16000, 0.5, jnp.asarray(mask)))
    assert y.shape == (2, 8000)
    assert np.all(y[1, 4000:] == 0)


def test_peak_normalize():
    x = jnp.asarray([0.0, 0.25, -0.5])
    y = np.asarray(peak_normalize(x))
    assert abs(y[2] + 1.0) < 1e-6


def test_load_audio_bucketing_preserves_output(tmp_path, rng):
    """Length-bucketed load_audio (shape discipline) slices back to the
    exact content length and matches an unbucketed reference computation."""
    from clearconverse_tpu.audio.decode import load_audio, _next_bucket
    from clearconverse_tpu.audio.resample import resample as _resample
    from clearconverse_tpu.audio.denoise import peak_normalize

    assert _next_bucket(15999, 16000) == 16000
    assert _next_bucket(16001, 16000) == 2 * 16000
    assert _next_bucket(1501 * 16000, 16000) == 1800 * 16000

    sr_in = 22050
    x = np.clip(rng.standard_normal(int(1.3 * sr_in)) * 0.3, -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "odd.wav")
    wavmod.write_wav(p, x, sr_in)

    wave, sr = load_audio(p, denoise=False)
    assert sr == 16000
    import math
    expect_len = math.ceil(16000 * len(x) / sr_in)
    assert wave.shape[-1] == expect_len

    # Matches the unbucketed computation (zero tail padding is equivalent).
    y, _ = wavmod.read_wav(p)
    ref = _resample(jnp.asarray(y.mean(axis=0)), sr_in, 16000)
    ref = peak_normalize(ref)
    np.testing.assert_allclose(np.asarray(wave), np.asarray(ref), atol=1e-5)


def test_load_audio_with_denoise_runs(tmp_path, rng):
    from clearconverse_tpu.audio.decode import load_audio
    x = np.clip(rng.standard_normal(20000) * 0.2, -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "d.wav")
    wavmod.write_wav(p, x, 16000)
    wave, _ = load_audio(p, noise_reduction_amount=0.5)
    assert wave.shape[-1] == 20000
    assert np.isfinite(np.asarray(wave)).all()


def test_load_audio_many_matches_per_file(tmp_path, rng):
    """Batched multi-file load == per-file load_audio, with None for
    unreadable paths."""
    from clearconverse_tpu.audio.decode import load_audio, load_audio_many

    paths = []
    for i, n in enumerate((20000, 8000)):
        x = np.clip(rng.standard_normal(n) * 0.2, -0.99, 0.99).astype(np.float32)
        p = str(tmp_path / f"m{i}.wav")
        wavmod.write_wav(p, x, 16000)
        paths.append(p)
    out = load_audio_many([paths[0], str(tmp_path / "missing.wav"), paths[1]],
                          noise_reduction_amount=0.5)
    assert out[1] is None
    for got, p in ((out[0], paths[0]), (out[2], paths[1])):
        want, _ = load_audio(p, noise_reduction_amount=0.5)
        # The batched path moves audio over the device link as int16
        # (peak-scaled per row); the <=0.5-LSB transport noise propagates
        # through the spectral gate to a few LSB on the normalized output
        # - the contract is "within 16-bit source precision" (1e-4 ~ 3
        # LSB), not bit-equality with the f32 per-file path.
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)


def test_host_gate_matches_device(rng):
    """spectral_gate_np (the host copy in load_audio_many — nothing is
    downloaded over the tunnel) == the XLA gate+normalize program, within
    f32 FFT noise, including masked padded rows."""
    from clearconverse_tpu.audio.denoise import (
        spectral_gate_np, spectral_gate_normalized_jit)

    T = 16000
    x = np.zeros((3, T), np.float32)
    n_valid = [T, 12000, 5000]
    for b, n in enumerate(n_valid):
        x[b, :n] = np.clip(rng.standard_normal(n) * 0.2, -0.99, 0.99)
    mask = (np.arange(T)[None, :] < np.asarray(n_valid)[:, None]).astype(np.float32)

    host = spectral_gate_np(x, 16000, 0.5, mask)
    dev = np.asarray(spectral_gate_normalized_jit(
        jnp.asarray(x), 0.5, jnp.asarray(n_valid, jnp.int32), sr=16000))
    np.testing.assert_allclose(host, dev, atol=2e-5)


def test_gate_matmul_dft_matches_fft(rng):
    """The MXU matmul-DFT gate path (default) == the jnp.fft path."""
    x = np.zeros((2, 8000), np.float32)
    x[0] = np.clip(rng.standard_normal(8000) * 0.2, -0.99, 0.99)
    x[1, :5000] = np.clip(rng.standard_normal(5000) * 0.3, -0.99, 0.99)
    mask = (np.arange(8000)[None, :] < np.asarray([8000, 5000])[:, None]
            ).astype(np.float32)
    a = np.asarray(spectral_gate(jnp.asarray(x), 16000, 0.5,
                                 jnp.asarray(mask)))
    b = np.asarray(spectral_gate(jnp.asarray(x), 16000, 0.5,
                                 jnp.asarray(mask), use_fft=True))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_load_audio_many_async_lazy_start(tmp_path, rng):
    """host_async=True: the download thread starts LAZILY. Until someone
    asks for bytes (or prefetches), no transfer happens — wait() is a
    no-op, stats stay empty. prefetch() starts it without blocking; the
    thread's span is folded into stage_times by the main thread only
    (via join() on first byte access, or stats_flush() once the thread
    has finished)."""
    import time
    from clearconverse_tpu.audio.decode import LazyAudio, load_audio_many

    x = np.clip(rng.standard_normal(16000) * 0.2, -0.99, 0.99)
    p = str(tmp_path / "a.wav")
    wavmod.write_wav(p, x.astype(np.float32), 16000)

    stage_times = {}
    out, batch, row_map = load_audio_many(
        [p], noise_reduction_amount=0.2, return_device=True,
        stage_times=stage_times, host_async=True)
    assert isinstance(out[0], LazyAudio)
    # Nothing read bytes: no transfer may have started; draining an
    # unstarted download must not force it.
    out[0].wait()
    out[0].stats_flush()
    assert "download_async" not in stage_times
    assert "download_wait" not in stage_times
    # prefetch starts the thread without blocking; flush folds its span
    # once it finishes.
    out[0].prefetch()
    deadline = time.time() + 10.0
    while "download_async" not in stage_times and time.time() < deadline:
        out[0].stats_flush()
        time.sleep(0.01)
    assert "download_async" in stage_times
    assert "download_wait" not in stage_times      # nobody joined
    before = stage_times["download_async"]
    out[0].stats_flush()                           # idempotent
    assert stage_times["download_async"] == before
    np.asarray(out[0])                             # join works after flush
    assert "download_wait" in stage_times


def test_load_audio_many_async_first_byte_starts(tmp_path, rng):
    """First byte access on a never-prefetched LazyAudio starts AND joins
    the download — bytes match the synchronous path."""
    from clearconverse_tpu.audio.decode import load_audio_many

    x = np.clip(rng.standard_normal(16000) * 0.2, -0.99, 0.99)
    p = str(tmp_path / "a.wav")
    wavmod.write_wav(p, x.astype(np.float32), 16000)

    out_sync = load_audio_many([p], noise_reduction_amount=0.2)
    out_lazy, _, _ = load_audio_many(
        [p], noise_reduction_amount=0.2, return_device=True,
        host_async=True)
    np.testing.assert_allclose(np.asarray(out_lazy[0]),
                               np.asarray(out_sync[0]), atol=1e-6)


def test_read_wav_scanned_param_equivalence(tmp_path, rng):
    """read_wav/read_wav_i16 with a pre-scanned (fmt, payload) equal the
    path-only calls — load_audio_many scans each file once and feeds both
    probes (the fast-path probe used to re-read + re-parse every
    non-conforming file)."""
    from clearconverse_tpu.audio.wav import (_scan_chunks, read_wav,
                                             read_wav_i16)

    # stereo file: fast path declines, read_wav must decode from the scan
    x = np.clip(rng.standard_normal((2, 5000)) * 0.3, -0.99, 0.99)
    p = str(tmp_path / "st.wav")
    wavmod.write_wav(p, x.astype(np.float32), 22050)
    scanned = _scan_chunks(p)
    assert read_wav_i16(p, scanned=scanned) is None
    got, sr_got = read_wav(p, scanned=scanned)
    want, sr_want = read_wav(p)
    assert sr_got == sr_want
    np.testing.assert_array_equal(got, want)

    # mono 16-bit file: fast path accepts from the scan
    y = np.clip(rng.standard_normal(4000) * 0.3, -0.99, 0.99)
    q = str(tmp_path / "mo.wav")
    wavmod.write_wav(q, y.astype(np.float32), 16000)
    fast = read_wav_i16(q, scanned=_scan_chunks(q))
    ref = read_wav_i16(q)
    assert fast is not None and ref is not None
    np.testing.assert_array_equal(fast[0], ref[0])
    assert fast[1] == ref[1]


def test_mulaw_roundtrip_snr(rng):
    """mu-law encode->decode keeps >=30 dB SNR on speech-like signals and
    maps silence to (near-)zero — the 8-bit wire contract (audio/wire.py)."""
    from clearconverse_tpu.audio.wire import (mulaw_decode_np,
                                              mulaw_encode_np,
                                              mulaw_expand_jnp)

    t = np.arange(16000) / 16000.0
    x = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.2 * np.sin(2 * np.pi * 1330 * t)
         + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
    x /= np.max(np.abs(x))
    y = mulaw_decode_np(mulaw_encode_np(x))
    snr = 10 * np.log10(np.sum(x**2) / np.sum((x - y) ** 2))
    assert snr > 30.0
    # device expand == host decode, elementwise over all 256 codes
    codes = np.arange(256, dtype=np.uint8)
    np.testing.assert_allclose(np.asarray(mulaw_expand_jnp(jnp.asarray(codes))),
                               mulaw_decode_np(codes), atol=1e-6)
    # silence encodes to the mid code and decodes below one 16-bit LSB * 3
    z = mulaw_decode_np(mulaw_encode_np(np.zeros(4, np.float32)))
    assert np.max(np.abs(z)) < 1e-4


def test_mulaw_i16_lut_encoder_bitwise_equals_float_path(rng):
    """mulaw_encode_i16_np (the one-core host's LUT fast path for native
    int16 rows) must be BITWISE equal to the float formula it replaces:
    mulaw_encode_np((w/32768) / (max|w|/32768)). Covers the int16 extremes
    (-32768 overflows a naive int16 abs), a quiet row (peak prescale), and
    all-zero silence."""
    from clearconverse_tpu.audio.wire import (mulaw_encode_i16_np,
                                              mulaw_encode_np)

    cases = [
        rng.integers(-32768, 32768, 48000).astype(np.int16),
        np.array([-32768, 32767, 0, 1, -1], np.int16),
        (rng.integers(-40, 41, 1000)).astype(np.int16),   # quiet row
        np.zeros(16, np.int16),
        np.zeros(0, np.int16),
    ]
    for w in cases:
        # The float path exactly as audio/decode.load_audio_many wrote it
        # before the LUT landed (zero rows: 0/1e-12 == 0/(1/32768) == 0,
        # so the LUT's max(|w|, 1) clamp encodes identically).
        x = w.astype(np.float32) / 32768.0
        peak = max(float(np.max(np.abs(x))), 1e-12) if len(x) else 1e-12
        ref = mulaw_encode_np(x / peak) if len(x) else np.zeros(0, np.uint8)
        np.testing.assert_array_equal(mulaw_encode_i16_np(w), ref)


def test_gate_u8_wire_matches_i16(rng):
    """gate_normalize_u8_jit (mu-law wire) tracks the int16-wire gate
    program within companding noise on the normalized output."""
    from clearconverse_tpu.audio.denoise import (gate_normalize_i16_jit,
                                                 gate_normalize_u8_jit)
    from clearconverse_tpu.audio.wire import mulaw_encode_np

    B, T, sr = 2, 16000, 16000
    x = np.clip(rng.standard_normal((B, T)) * 0.2, -0.99, 0.99).astype(np.float32)
    x[:, 12000:] = 0.0                      # padded tail
    n_valid = np.full(B, 12000, np.int32)
    q16 = np.clip(np.round(x * 32767), -32768, 32767).astype(np.int16)
    peaks = np.max(np.abs(x), axis=1, keepdims=True)
    q8 = mulaw_encode_np(x / np.maximum(peaks, 1e-12))
    y16, _ = gate_normalize_i16_jit(jnp.asarray(q16), 0.5,
                                    jnp.asarray(n_valid), sr=sr)
    y8, q8_down = gate_normalize_u8_jit(jnp.asarray(q8), 0.5,
                                        jnp.asarray(n_valid), sr=sr)
    y16, y8 = np.asarray(y16), np.asarray(y8)
    # the u8 DOWNLINK round-trips the gated waveform within companding noise
    from clearconverse_tpu.audio.wire import mulaw_decode_np
    host8 = mulaw_decode_np(np.asarray(q8_down))
    derr = y8 - host8
    dsnr = 10 * np.log10(max(np.sum(y8**2), 1e-20)
                         / max(np.sum(derr**2), 1e-20))
    assert dsnr > 30.0
    # both peak-normalized; agreement is SNR-grade, not bit-exact
    err = y16 - y8
    snr = 10 * np.log10(np.sum(y16**2) / max(np.sum(err**2), 1e-20))
    assert snr > 25.0
    # padding stays silent on the wire path too
    assert np.max(np.abs(y8[:, 12000:])) < 1e-3


def test_load_audio_many_wire8_close_to_wire16(tmp_path, rng):
    """load_audio_many(wire_bits=8) returns audio within companding noise
    of the default int16 wire, same row map / device batch shape."""
    from clearconverse_tpu.audio.decode import load_audio_many

    paths = []
    for i in range(2):
        x = np.clip(rng.standard_normal(20000) * 0.2, -0.99, 0.99).astype(np.float32)
        p = str(tmp_path / f"w{i}.wav")
        wavmod.write_wav(p, x, 16000)
        paths.append(p)
    h16, b16, m16 = load_audio_many(paths, return_device=True,
                                    noise_reduction_amount=0.4)
    h8, b8, m8 = load_audio_many(paths, return_device=True,
                                 noise_reduction_amount=0.4, wire_bits=8)
    assert m16 == m8 and b16.shape == b8.shape
    for a, b in zip(h16, h8):
        a, b = np.asarray(a), np.asarray(b)
        snr = 10 * np.log10(np.sum(a**2) / max(np.sum((a - b) ** 2), 1e-20))
        assert snr > 25.0


def test_load_audio_many_wire8_async_lazy(tmp_path, rng):
    """host_async + wire_bits=8 — the exact configuration the engine store
    path runs in production: the mu-law downlink decodes on the worker
    thread, LazyAudio joins on first byte access, and the result matches
    the synchronous wire8 path exactly."""
    from clearconverse_tpu.audio.decode import LazyAudio, load_audio_many

    paths = []
    for i in range(2):
        x = np.clip(rng.standard_normal(20000) * 0.2, -0.99, 0.99).astype(np.float32)
        p = str(tmp_path / f"wa{i}.wav")
        wavmod.write_wav(p, x, 16000)
        paths.append(p)
    sync_h, _, _ = load_audio_many(paths, return_device=True,
                                   noise_reduction_amount=0.4, wire_bits=8)
    lazy_h, batch, row_map = load_audio_many(
        paths, return_device=True, noise_reduction_amount=0.4,
        wire_bits=8, host_async=True)
    assert all(isinstance(h, LazyAudio) for h in lazy_h)
    assert row_map == [0, 1] and batch is not None
    for a, b in zip(sync_h, lazy_h):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_wire8_silent_file_stays_silent(tmp_path):
    """A digitally-silent file under the 8-bit wire must come back silent:
    the midtread codec maps 0.0 to code 128 EXACTLY (a midrise mapping
    decoded silence to a +8.6e-5 DC plateau which peak_normalize amplified
    to near-full-scale garbage → hallucinated segments)."""
    from clearconverse_tpu.audio.decode import load_audio_many
    from clearconverse_tpu.audio.wire import mulaw_decode_np, mulaw_encode_np

    z = np.zeros(4, np.float32)
    np.testing.assert_array_equal(mulaw_encode_np(z), np.full(4, 128))
    np.testing.assert_array_equal(mulaw_decode_np(np.full(4, 128, np.uint8)),
                                  z)
    p = str(tmp_path / "silent.wav")
    wavmod.write_wav(p, np.zeros(16000, np.float32), 16000)
    hosts, batch, _ = load_audio_many([p], return_device=True,
                                      noise_reduction_amount=0.4, wire_bits=8)
    assert np.max(np.abs(np.asarray(hosts[0]))) == 0.0
    assert float(jnp.max(jnp.abs(batch))) == 0.0


# ------------------------------------------------- lossless packed wire

def test_pack_bits_roundtrip_all_widths(rng):
    """pack_bits_np/unpack_bits_np are exact inverses for every width the
    wire supports, including the extremes of each width's value range."""
    from clearconverse_tpu.audio import pack as packmod

    for w in range(packmod.MIN_WIDTH, packmod.MAX_WIDTH + 1):
        u = rng.integers(0, 1 << w, size=(3, 64), dtype=np.int64)
        u[0, :2] = [0, (1 << w) - 1]          # range extremes
        u = u.astype(np.uint16)
        data = packmod.pack_bits_np(u, w)
        assert data.shape == (3, 64 * w // 8) and data.dtype == np.uint8
        np.testing.assert_array_equal(packmod.unpack_bits_np(data, w),
                                      u.astype(np.int32))


def test_pack_i16_batch_bit_exact_roundtrip(rng):
    """Host pack → device unpack reproduces the int16 batch bit-for-bit in
    the valid region — the property that lets the packed wire ship as the
    default with no quality sign-off. Covers both delta orders, padded
    rows (taper region), and a loud final sample."""
    from clearconverse_tpu.audio import pack as packmod

    sr, T = 16000, 16000
    t = np.arange(T) / sr
    K = 3
    q = np.zeros((K, T), np.int16)
    # row 0: tone + noise (speech-like), full length
    q[0] = np.round(12000 * np.sin(2 * np.pi * 220 * t)
                    + rng.standard_normal(T) * 120).astype(np.int16)
    # row 1: LOUD tone cut off at a PEAK, padded — without the packer's
    # taper the valid→pad step would need a 16-bit delta (raw fallback)
    tone = np.round(28000 * np.sin(2 * np.pi * 130 * t)).astype(np.int16)
    n1 = int(np.argmax(tone[11000:12500])) + 11000 + 1
    q[1, :n1] = tone[:n1]
    # row 2: silence
    n_valid = np.array([T, n1, T], np.int64)
    pb = packmod.pack_i16_batch(q.copy(), n_valid)
    assert pb is not None and pb.width <= packmod.MAX_WIDTH
    # the taper kept the pad transition from dictating the width
    assert pb.width < packmod._signed_width(int(abs(q[1, n1 - 1])))
    # fewer wire bytes than raw int16
    assert pb.data.nbytes < q.nbytes

    host = packmod.unpack_batch_np(pb)
    dev = np.asarray(packmod.unpack_delta_jnp(
        jnp.asarray(pb.data), jnp.asarray(pb.x0), jnp.asarray(pb.e1),
        pb.order == 2, pb.width))
    np.testing.assert_array_equal(host, dev)
    for r in range(K):
        np.testing.assert_array_equal(dev[r, : n_valid[r]],
                                      q[r, : n_valid[r]].astype(np.int32))


def test_pack_order_selection_and_fallback(rng):
    """Tonal content picks order 2; white noise picks order 1; near-full-
    scale white noise (deltas need 16+ bits) returns None → the caller
    falls back to the raw int16 wire."""
    from clearconverse_tpu.audio import pack as packmod

    T = 16000
    t = np.arange(T) / 16000
    tone = np.round(16000 * np.sin(2 * np.pi * 200 * t)).astype(np.int16)
    pb = packmod.pack_i16_batch(tone[None], np.array([T]))
    assert pb is not None and pb.order == 2

    noise = np.clip(rng.standard_normal(T) * 900, -32768,
                    32767).astype(np.int16)
    pb = packmod.pack_i16_batch(noise[None], np.array([T]),
                                max_width=packmod.MAX_WIDTH)
    assert pb is not None and pb.order == 1
    if pb.width > packmod.AUTO_MAX_WIDTH:
        # same content under the AUTO threshold → raw int16 fallback
        assert packmod.pack_i16_batch(noise[None], np.array([T])) is None

    loud = np.clip(rng.standard_normal(T) * 20000, -32768,
                   32767).astype(np.int16)
    assert packmod.pack_i16_batch(loud[None], np.array([T]),
                                  max_width=packmod.MAX_WIDTH) is None

    silent = np.zeros((1, T), np.int16)
    pb = packmod.pack_i16_batch(silent, np.array([T]))
    # widths round UP to the bucket set (one cached device program per
    # width; see pack.WIDTH_BUCKETS) — silence lands on the smallest.
    assert pb is not None and pb.width == packmod.WIDTH_BUCKETS[0]
    np.testing.assert_array_equal(packmod.unpack_batch_np(pb), 0)


def test_pack_width_bucketing_and_native_gate(rng, monkeypatch):
    """Auto-packed widths come from WIDTH_BUCKETS (bounded compile
    surface), and without the native packer pack_i16_batch returns None
    (raw int16 wire) unless allow_numpy — the numpy path costs 0.3-0.9 s
    per batch on the 1-core host, more than the wire saves."""
    from clearconverse_tpu.audio import native
    from clearconverse_tpu.audio import pack as packmod

    T = 16000
    t = np.arange(T) / 16000
    q = np.round(12000 * np.sin(2 * np.pi * 220 * t)
                 + rng.standard_normal(T) * 120).astype(np.int16)[None]
    pb = packmod.pack_i16_batch(q.copy(), np.array([T]))
    assert pb is not None and pb.width in packmod.WIDTH_BUCKETS
    np.testing.assert_array_equal(packmod.unpack_batch_np(pb)[0], q[0])

    monkeypatch.setattr(native, "get_lib", lambda: None)
    assert packmod.pack_i16_batch(q.copy(), np.array([T])) is None
    pb2 = packmod.pack_i16_batch(q.copy(), np.array([T]), allow_numpy=True)
    assert pb2 is not None and pb2.width == pb.width
    np.testing.assert_array_equal(pb2.data, pb.data)


def test_gate_packed_wire_bit_equals_i16(rng):
    """gate_normalize_packed_jit output is BIT-IDENTICAL to
    gate_normalize_i16_jit on the same int16 batch — including rows whose
    padding the packer tapered (the device re-masks before the gate)."""
    from clearconverse_tpu.audio import pack as packmod
    from clearconverse_tpu.audio.denoise import (gate_normalize_i16_jit,
                                                 gate_normalize_packed_jit)

    B, T, sr = 2, 16000, 16000
    t = np.arange(T) / sr
    q = np.zeros((B, T), np.int16)
    q[0] = np.round(9000 * np.sin(2 * np.pi * 300 * t)
                    + rng.standard_normal(T) * 150).astype(np.int16)
    tone = np.round(25000 * np.sin(2 * np.pi * 150 * t)).astype(np.int16)
    n1 = int(np.argmax(tone[10500:12000])) + 10500 + 1   # cut at a peak:
    q[1, :n1] = tone[:n1]                                # forces a real taper
    n_valid = np.array([T, n1], np.int32)

    pb = packmod.pack_i16_batch(q.copy(), n_valid)
    assert pb is not None
    for dn in (True, False):
        y16, q16 = gate_normalize_i16_jit(jnp.asarray(q), 0.5,
                                          jnp.asarray(n_valid), sr=sr,
                                          denoise=dn)
        yp, qp = gate_normalize_packed_jit(
            jnp.asarray(pb.data), jnp.asarray(pb.x0), jnp.asarray(pb.e1),
            pb.order == 2, 0.5, jnp.asarray(n_valid), sr=sr, denoise=dn,
            width=pb.width)
        np.testing.assert_array_equal(np.asarray(y16), np.asarray(yp))
        np.testing.assert_array_equal(np.asarray(q16), np.asarray(qp))


def test_load_audio_many_packed_wire_equals_i16(tmp_path, rng):
    """load_audio_many(wire_bits=0) — the default engine wire — returns
    results IDENTICAL to wire_bits=16 (lossless round-trip end to end),
    for both packable audio and the raw-int16 fallback."""
    from clearconverse_tpu.audio.decode import load_audio_many

    t = np.arange(20000) / 16000
    paths = []
    # packable: tone + mild noise; fallback: near-full-scale white noise
    for i, x in enumerate([
            (0.4 * np.sin(2 * np.pi * 220 * t)
             + rng.standard_normal(20000) * 0.01).astype(np.float32),
            np.clip(rng.standard_normal(20000) * 0.6, -0.99,
                    0.99).astype(np.float32)]):
        p = str(tmp_path / f"pk{i}.wav")
        wavmod.write_wav(p, x, 16000)
        paths.append(p)
    h16, b16, m16 = load_audio_many(paths, return_device=True,
                                    noise_reduction_amount=0.4,
                                    wire_bits=16)
    h0, b0, m0 = load_audio_many(paths, return_device=True,
                                 noise_reduction_amount=0.4, wire_bits=0)
    assert m16 == m0 and b16.shape == b0.shape
    np.testing.assert_array_equal(np.asarray(b16), np.asarray(b0))
    for a, b in zip(h16, h0):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_audio_many_wire_info_and_speech_synth(tmp_path):
    """The bench's speech-shaped synthetic (dev_backend.
    synth_conversation_speech) must actually engage the default packed
    wire (VERDICT r3 next #5), and load_audio_many must report what
    crossed the tunnel via wire_info."""
    import pytest

    from clearconverse_tpu.audio import native
    from clearconverse_tpu.audio.decode import load_audio_many
    from clearconverse_tpu.pipeline.dev_backend import (
        SR, synth_conversation_speech)

    if native.get_lib() is None:
        pytest.skip("native wavcodec unavailable; auto wire stays int16")
    wav = synth_conversation_speech()
    p = str(tmp_path / "speech.wav")
    wavmod.write_wav(p, wav, SR)
    info: dict = {}
    load_audio_many([p], wire_bits=0, wire_info=info)
    assert info["format"] == "packed_delta"
    assert info["width"] <= 12          # real-speech delta range (9-12)
    assert 0 < info["bytes_wire"] < info["bytes_raw_int16"]

    # The raw int16 wire reports itself too (A/B evidence in bench JSON).
    info16: dict = {}
    load_audio_many([p], wire_bits=16, wire_info=info16)
    assert info16["format"] == "int16"
    assert info16["bytes_wire"] == info16["bytes_raw_int16"]


def test_taper_short_padding_keeps_batch_packed():
    """A loud file ending within a few ms of its bucket must not knock the
    whole batch off the packed wire: the taper's slope is |last|/_TAPER
    regardless of how short the pad region is (it may stop short of zero —
    the region is masked don't-care)."""
    from clearconverse_tpu.audio.pack import pack_i16_batch, unpack_batch_np

    K, T = 2, 16000
    n0 = T - 8                       # pad region of just 8 samples
    t = np.arange(T) / 16000.0
    # Smooth 120 Hz content whose PEAK lands exactly on the last valid
    # sample — valid-region deltas stay ~1.4k (width 12), but the old
    # taper's |last|/L step with L=8 was ~3.9k (width 13+).
    phase = np.pi / 2 - 2 * np.pi * 120 * t[n0 - 1]
    row = (0.95 * 32767 * np.sin(2 * np.pi * 120 * t + phase)).astype(
        np.int16)
    q = np.zeros((K, T), np.int16)
    q[0] = row
    q[1, :n0] = row[:n0]
    pb = pack_i16_batch(q, [T, n0], allow_numpy=True)
    assert pb is not None, "short-pad loud ending forced raw-int16 fallback"
    assert pb.width <= 12, pb.width  # gentle slope: pad step can't inflate
    # Valid samples reconstruct bit-exactly (padding is don't-care).
    out = unpack_batch_np(pb)
    np.testing.assert_array_equal(out[0, :T], q[0].astype(np.int32))
    np.testing.assert_array_equal(out[1, :n0], q[1, :n0].astype(np.int32))


def test_lazy_audio_materializes_owned_copy(tmp_path, rng):
    """Published audio arrays must not alias the whole [K, T] gated batch
    (one retained segment would pin every file's audio; mutating one
    segment would corrupt overlapping siblings)."""
    from clearconverse_tpu.audio.decode import load_audio_many

    paths = []
    for i in range(2):
        x = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        p = str(tmp_path / f"own{i}.wav")
        wavmod.write_wav(p, x, 16000)
        paths.append(p)
    hosts, batch, _ = load_audio_many(paths, return_device=True,
                                      host_async=True, wire_bits=16)
    a0 = np.asarray(hosts[0])
    a1 = np.asarray(hosts[1])
    assert a0.base is None and a1.base is None      # owned, not a view
    before = a1[0]
    a0[:] = 123.0                                    # mutate one file
    assert a1[0] == before                           # sibling untouched


def test_ensure_wav_format_no_stem_collision(tmp_path):
    """'talk.mp3' and 'talk.m4a' must not convert onto each other, and a
    user's own pre-existing 'talk.wav' must never be overwritten."""
    import pytest

    from clearconverse_tpu.audio.decode import (ensure_wav_format,
                                                ffmpeg_available)

    if not ffmpeg_available():
        pytest.skip("no ffmpeg in environment")
    x = (0.1 * np.sin(2 * np.pi * 220 * np.arange(8000) / 16000)).astype(
        np.float32)
    pre = tmp_path / "talk.wav"
    wavmod.write_wav(str(pre), x, 16000)
    sentinel = pre.read_bytes()
    src = tmp_path / "talk.mp3"
    # Make a real mp3 via ffmpeg so conversion succeeds.
    import subprocess
    tmp_wav = tmp_path / "src.wav"
    wavmod.write_wav(str(tmp_wav), x, 16000)
    subprocess.run(["ffmpeg", "-y", "-i", str(tmp_wav), str(src)],
                   check=True, capture_output=True)
    out = ensure_wav_format(str(src))
    assert out != str(pre)                          # distinct output path
    assert pre.read_bytes() == sentinel             # user file untouched
    assert out.endswith(".mp3.wav")

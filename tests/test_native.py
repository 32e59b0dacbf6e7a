"""Native C++ codec tests: build, parity with the NumPy reference path,
and wiring through audio/wav.py."""

import numpy as np
import pytest

from clearconverse_tpu.audio import native
from clearconverse_tpu.audio import wav as wavmod


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("g++ build unavailable")
    return lib


def test_decode_s16_parity(lib, rng):
    x = np.clip(rng.standard_normal((2, 500)) * 0.4, -1, 1).astype(np.float32)
    pcm = np.clip(np.round(x.T.reshape(-1) * 32767), -32768, 32767).astype("<i2")
    out = native.decode_payload(pcm.tobytes(), 1, 16, 2)
    assert out.shape == (2, 500)
    ref = pcm.astype(np.float32).reshape(-1, 2).T / 32768.0
    np.testing.assert_allclose(out, ref, atol=1e-7)


def test_decode_s24_parity(lib, rng):
    vals = rng.integers(-(1 << 23), (1 << 23) - 1, 300)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    out = native.decode_payload(raw, 1, 24, 1)
    np.testing.assert_allclose(out[0], vals / 8388608.0, atol=1e-7)


def test_decode_f32_and_f64(lib, rng):
    x = rng.standard_normal(256).astype(np.float32)
    out = native.decode_payload(x.tobytes(), 3, 32, 1)
    np.testing.assert_allclose(out[0], x, atol=0)
    xd = x.astype(np.float64)
    out = native.decode_payload(xd.tobytes(), 3, 64, 1)
    np.testing.assert_allclose(out[0], x, atol=1e-7)


def test_encode_s16_roundtrip(lib, rng):
    x = np.clip(rng.standard_normal((2, 400)) * 0.4, -0.99, 0.99).astype(np.float32)
    body = native.encode_s16(x)
    back = native.decode_payload(body, 1, 16, 2)
    assert np.max(np.abs(back - x)) < 2.0 / 32768


def test_wav_read_uses_native_and_matches(tmp_path, rng):
    # Byte-identical result whether or not the native path is used.
    x = np.clip(rng.standard_normal((2, 2000)) * 0.4, -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "n.wav")
    wavmod.write_wav(p, x, 16000)
    with_native, _ = wavmod.read_wav(p)

    saved = native._lib, native._tried
    try:
        native._lib, native._tried = None, True  # force NumPy fallback
        without_native, _ = wavmod.read_wav(p)
    finally:
        native._lib, native._tried = saved
    np.testing.assert_array_equal(with_native, without_native)


def test_peak_normalize_native(lib):
    import ctypes
    x = np.array([0.1, -0.5, 0.25], np.float32)
    peak = lib.peak_normalize(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                              3, np.float32(1e-8))
    assert peak == pytest.approx(0.5)
    assert x[1] == pytest.approx(-1.0, abs=1e-5)


def test_mono_mix_native(lib):
    import ctypes
    x = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    out = np.empty(2, np.float32)
    lib.mono_mix(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 2, 2,
                 out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    np.testing.assert_allclose(out, [0.5, 0.5])


def test_native_delta_pack_matches_numpy(rng):
    """The C delta_scan/delta_pack (single-pass, ~20x faster on the
    one-core host) must produce the EXACT numpy-path bitstream — the
    device unpack program is compiled against that layout."""
    from clearconverse_tpu.audio import native
    from clearconverse_tpu.audio import pack as packmod

    if native.get_lib() is None:
        import pytest
        pytest.skip("native wavcodec unavailable")

    t = np.arange(32000) / 16000.0
    q = np.zeros((3, 32000), np.int16)
    q[0] = np.round(15000 * np.sin(2 * np.pi * 220 * t)).astype(np.int16)
    q[1] = np.clip(rng.standard_normal(32000) * 700, -32768,
                   32767).astype(np.int16)
    x32 = q.astype(np.int32)
    d1 = np.diff(x32, axis=1)
    m1 = int(np.max(np.abs(d1[:, 1:])))
    m2 = int(np.max(np.abs(np.diff(d1, axis=1))))
    assert native.delta_scan(q) == (m1, m2)

    for order in (1, 2):
        width = packmod._signed_width(m1 if order == 1 else m2)
        data, x0, e1 = native.delta_pack(q, order, width)
        p = np.zeros(q.shape, np.int32)
        p[:, 2:] = d1[:, 1:] if order == 1 else np.diff(d1, axis=1)
        ref = packmod.pack_bits_np((p + (1 << (width - 1))).astype(np.uint16),
                                   width)
        np.testing.assert_array_equal(data, ref)
        np.testing.assert_array_equal(x0, x32[:, 0])
        np.testing.assert_array_equal(e1, d1[:, 0])

"""Stationary spectral-gating noise reduction, batched on device.

Reimplements the noisereduce algorithm the reference applies on CPU inside
both ``load_audio`` (back/api.py:832, stationary=True, prop_decrease=cfg) and
``enhance_audio`` (back/api.py:345-352): per-frequency noise statistics over
the whole clip, a dB threshold at mean + 1.5·std, triangular smoothing of the
binary gate over (freq, time), linear blend by ``prop_decrease``, ISTFT.

The reference runs this once per profile-segment *inside a Python loop*
(back/api.py:928); here the whole segment batch goes through one ``[B, T]``
jit program.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

N_FFT = 1024
HOP = 256
_N_STD_THRESH = 1.5
_FREQ_SMOOTH_HZ = 500
_TIME_SMOOTH_MS = 50


@lru_cache(maxsize=2)
def _smoothing_filter(sr: int) -> np.ndarray:
    """noisereduce's triangular (freq × time) smoothing kernel, sum-normalized."""
    n_grad_freq = int(_FREQ_SMOOTH_HZ / (sr / (N_FFT / 2)))
    n_grad_time = int(_TIME_SMOOTH_MS / ((HOP / sr) * 1000))

    def ramp(n):
        v = np.concatenate([np.linspace(0, 1, n + 1, endpoint=False),
                            np.linspace(1, 0, n + 2)])
        return v[1:-1]

    filt = np.outer(ramp(n_grad_freq), ramp(n_grad_time))
    return (filt / filt.sum()).astype(np.float32)


def _hann(n: int) -> np.ndarray:
    i = np.arange(n)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n))).astype(np.float32)


@lru_cache(maxsize=2)
def _gate_dft_matrices():
    """Windowed real-DFT/IDFT projection matrices for the gate's STFT and
    ISTFT as MXU matmuls: XLA's TPU FFT runs the whole [8, 3751, 1024]
    gate batch in ~1.04 s; the same transform as four f32 einsums runs in
    ~10 ms. Forward matrices fold the analysis window; inverse matrices
    fold the irfft conjugate-symmetry weights AND the synthesis window."""
    N = N_FFT
    n = np.arange(N, dtype=np.float64)
    k = np.arange(N // 2 + 1, dtype=np.float64)
    ang = 2.0 * np.pi * n[:, None] * k[None, :] / N
    window = _hann(N).astype(np.float64)
    cos_m = (np.cos(ang) * window[:, None]).astype(np.float32)    # [N, K]
    sin_m = (-np.sin(ang) * window[:, None]).astype(np.float32)
    wk = np.where((k == 0) | (k == N // 2), 1.0, 2.0) / N
    icos = (np.cos(ang) * wk[None, :] * window[:, None]).astype(np.float32)
    isin = (-np.sin(ang) * wk[None, :] * window[:, None]).astype(np.float32)
    return cos_m, sin_m, icos, isin


def _stft(x: jnp.ndarray) -> jnp.ndarray:
    """librosa-style STFT: center=True constant padding, periodic Hann.
    [B, T] → complex [B, freq, frames]."""
    pad = N_FFT // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    n_frames = 1 + x.shape[-1] // HOP
    idx = (jnp.arange(n_frames) * HOP)[:, None] + jnp.arange(N_FFT)[None, :]
    frames = xp[:, idx] * jnp.asarray(_hann(N_FFT))[None, None, :]
    return jnp.transpose(jnp.fft.rfft(frames, axis=-1), (0, 2, 1))


def _ola(frames_windowed: jnp.ndarray, length: int) -> jnp.ndarray:
    """Overlap-add of synthesis-windowed frames ``[B, n_frames, N_FFT]``
    with window-square normalization → ``[B, length]``.

    Vectorized as N_FFT//HOP shifted block adds over static slices — the
    index-based scatter-add serializes on TPU (it was most of the gate
    program's ~1 s)."""
    B, n_frames, _ = frames_windowed.shape
    window = jnp.asarray(_hann(N_FFT))
    kb = N_FFT // HOP                       # 4 overlapping blocks per sample
    fb = frames_windowed.reshape(B, n_frames, kb, HOP)
    wb = (window * window).reshape(kb, HOP)
    out_b = sum(
        jnp.pad(fb[:, :, k, :], ((0, 0), (k, kb - 1 - k), (0, 0)))
        for k in range(kb))                 # [B, n_frames+kb-1, HOP]
    env_b = sum(
        jnp.pad(jnp.broadcast_to(wb[k], (n_frames, HOP)),
                ((k, kb - 1 - k), (0, 0)))
        for k in range(kb))
    out = out_b.reshape(B, -1) / jnp.maximum(env_b.reshape(-1), 1e-8)[None, :]
    pad = N_FFT // 2
    return out[:, pad : pad + length]


def _istft(spec: jnp.ndarray, length: int) -> jnp.ndarray:
    """Overlap-add inverse with window-square normalization. [B,freq,frames]→[B,T]."""
    frames = jnp.fft.irfft(jnp.transpose(spec, (0, 2, 1)), n=N_FFT, axis=-1)
    frames = frames * jnp.asarray(_hann(N_FFT))[None, None, :]
    return _ola(frames, length)


def spectral_gate(audio: jnp.ndarray, sr: int = 16000,
                  prop_decrease: float = 0.5,
                  mask: jnp.ndarray | None = None,
                  use_fft: bool = False) -> jnp.ndarray:
    """Stationary spectral gating over ``[B, T]`` (or ``[T]``) waveforms.

    ``mask`` (optional ``[B, T]`` 0/1) marks valid samples of padded batch
    entries so padding doesn't contaminate the noise statistics.

    The default path runs the STFT/ISTFT as windowed real-DFT matmuls
    (``_gate_dft_matrices``): XLA's TPU FFT takes ~1.04 s for an 8×60 s
    batch where the einsums take ~10 ms on the MXU. ``use_fft=True`` keeps
    the jnp.fft path (equality-tested against the matmul path)."""
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None, :]
    length = audio.shape[-1]

    if use_fft:
        spec = _stft(audio)                              # [B, K, F]
        mag_db = 20.0 * jnp.log10(jnp.maximum(jnp.abs(spec), 1e-20))
        t_axis, f_axis = -1, -2                          # stats over frames
    else:
        pad = N_FFT // 2
        xp = jnp.pad(audio, ((0, 0), (pad, pad)))
        n_frames = 1 + length // HOP
        # Frame via shifted static slices of HOP-blocks (N_FFT = 4·HOP) —
        # the index-gather framing serializes on TPU like the OLA scatter.
        kb = N_FFT // HOP
        n_blocks = n_frames - 1 + kb
        xb = xp[:, : n_blocks * HOP].reshape(audio.shape[0], n_blocks, HOP)
        frames = jnp.concatenate(
            [xb[:, k: k + n_frames] for k in range(kb)], axis=-1)  # [B,F,N]
        cos_m, sin_m, icos, isin = _gate_dft_matrices()
        P = jax.lax.Precision.HIGHEST                    # f32 parity matters
        re = jnp.einsum("bfn,nk->bfk", frames, jnp.asarray(cos_m),
                        precision=P, preferred_element_type=jnp.float32)
        im = jnp.einsum("bfn,nk->bfk", frames, jnp.asarray(sin_m),
                        precision=P, preferred_element_type=jnp.float32)
        # NOT 10·log10(max(power, 1e-40)): 1e-40 is subnormal in f32 and
        # flushes to zero → log10(0) = -inf → NaN through the masked stats.
        mag_db = 20.0 * jnp.log10(
            jnp.maximum(jnp.sqrt(re * re + im * im), 1e-20))
        t_axis, f_axis = -2, -1                          # [B, F, K] layout

    if mask is not None:
        nf = mag_db.shape[t_axis]
        # '<=': librosa's center=True STFT has 1 + n_valid//HOP frames —
        # the frame CENTERED at n_valid still covers valid samples. '<'
        # dropped that boundary frame exactly when HOP divides n_valid,
        # which is every whole-second bucket length (60 s = 3750·256),
        # structurally shifting the noise stats vs the reference.
        valid = ((jnp.arange(nf) * HOP)[None, :]
                 <= jnp.sum(mask, -1, keepdims=True))
        w = jnp.expand_dims(valid, f_axis).astype(mag_db.dtype)
        denom = jnp.maximum(jnp.sum(w, t_axis, keepdims=True), 1.0)
        mean_db = jnp.sum(mag_db * w, t_axis, keepdims=True) / denom
        var_db = jnp.sum((mag_db - mean_db) ** 2 * w, t_axis,
                         keepdims=True) / denom
    else:
        mean_db = jnp.mean(mag_db, t_axis, keepdims=True)
        var_db = jnp.var(mag_db, t_axis, keepdims=True)
    noise_thresh = mean_db + jnp.sqrt(var_db) * _N_STD_THRESH

    gate = (mag_db > noise_thresh).astype(jnp.float32)
    if use_fft:
        filt = _smoothing_filter(sr)                     # [freq, time]
        filt_j = jnp.asarray(filt)[None, None, :, :]
        gate = jax.lax.conv_general_dilated(
            gate[:, None, :, :], filt_j,
            window_strides=(1, 1),
            padding=[(filt.shape[0] // 2, (filt.shape[0] - 1) // 2),
                     (filt.shape[1] // 2, (filt.shape[1] - 1) // 2)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[:, 0]
    else:
        # The triangular kernel is rank-1 (outer(freq_ramp, time_ramp)), so
        # smooth as two passes of shifted static-slice adds — a C=1 2-D
        # conv over [B, 3751, 513] maps poorly onto the TPU conv units.
        filt = _smoothing_filter(sr)
        rf, rt = filt[:, 0], filt[0, :]
        scale = filt.sum() / max(float(rf.sum() * rt.sum()), 1e-30)
        F, K = gate.shape[1], gate.shape[2]
        ct = len(rt) // 2
        gp = jnp.pad(gate, ((0, 0), (ct, len(rt) - 1 - ct), (0, 0)))
        gate = sum(float(w) * gp[:, i: i + F, :] for i, w in enumerate(rt))
        cf = len(rf) // 2
        gp = jnp.pad(gate, ((0, 0), (0, 0), (cf, len(rf) - 1 - cf)))
        gate = sum(float(w) * gp[:, :, i: i + K] for i, w in enumerate(rf))
        gate = gate * scale
    gate = gate * prop_decrease + (1.0 - prop_decrease)

    if use_fft:
        out = _istft(spec * gate.astype(spec.dtype), length)
    else:
        out_frames = (
            jnp.einsum("bfk,nk->bfn", re * gate, jnp.asarray(icos),
                       precision=P, preferred_element_type=jnp.float32)
            + jnp.einsum("bfk,nk->bfn", im * gate, jnp.asarray(isin),
                         precision=P, preferred_element_type=jnp.float32))
        out = _ola(out_frames, length)
    if mask is not None:
        out = out * mask
    return out[0] if squeeze else out


from functools import partial


def _valid_mask(T: int, n_valid: jnp.ndarray) -> jnp.ndarray:
    """[B] valid lengths → [B, T] 0/1 mask, built ON DEVICE inside the jit.
    A host-built f32 mask is 2× the bytes of the int16 audio it describes —
    uploading it dominated the engine's load stage (measured r3: 30.7 MB
    mask vs 15.4 MB audio per 8×60 s batch at ~23 MB/s tunnel)."""
    return (jnp.arange(T)[None, :] < n_valid[:, None]).astype(jnp.float32)


@partial(jax.jit, static_argnames=("sr",))
def spectral_gate_jit(audio: jnp.ndarray, prop_decrease: jnp.ndarray,
                      n_valid: jnp.ndarray, sr: int = 16000) -> jnp.ndarray:
    """Jitted batched gate (eager dispatch costs ~30-100 ms/op over the
    device tunnel; the gate is ~25 ops). prop_decrease is traced so one
    program serves every config value. ``n_valid`` [B] int32 marks each
    row's valid-sample count (mask materializes on device)."""
    return spectral_gate(audio, sr, prop_decrease,
                         _valid_mask(audio.shape[-1], n_valid))


def peak_normalize(audio: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Peak normalization with the reference's epsilon (back/api.py:835)."""
    peak = jnp.max(jnp.abs(audio), axis=-1, keepdims=True)
    return audio / (peak + eps)


peak_normalize_jit = jax.jit(peak_normalize)


@partial(jax.jit, static_argnames=("sr",))
def spectral_gate_normalized_jit(audio: jnp.ndarray,
                                 prop_decrease: jnp.ndarray,
                                 n_valid: jnp.ndarray,
                                 sr: int = 16000) -> jnp.ndarray:
    """Gate + peak-normalize as ONE device program: an eager
    peak_normalize after the jitted gate costs ~3 extra dispatches per
    batch over the device tunnel (engine profile-building hot path).
    ``n_valid`` [B] int32 per-row valid lengths (mask built on device)."""
    return peak_normalize(spectral_gate(
        audio, sr, prop_decrease, _valid_mask(audio.shape[-1], n_valid)))


def _gate_norm_f32(x: jnp.ndarray, prop_decrease, n_valid, sr: int,
                   denoise: bool) -> jnp.ndarray:
    """The ONE gate+normalize body every wire format shares (a fix here
    applies to the int16, packed, AND mu-law programs): f32 [K, T] (zeros
    past each row's n_valid) → f32 gated+normalized."""
    if denoise:
        return peak_normalize(spectral_gate(
            x, sr, prop_decrease, _valid_mask(x.shape[-1], n_valid)))
    return peak_normalize(x)


def _gate_norm_core(x: jnp.ndarray, prop_decrease, n_valid, sr: int,
                    denoise: bool):
    """_gate_norm_f32 + int16 downlink. Wire decoders feed EXACTLY the
    same x here, so raw-int16 and packed uploads produce bit-identical
    results."""
    y = _gate_norm_f32(x, prop_decrease, n_valid, sr, denoise)
    q_out = jnp.clip(jnp.round(y * 32767.0), -32768, 32767).astype(jnp.int16)
    return y, q_out


@partial(jax.jit, static_argnames=("sr", "denoise"))
def gate_normalize_i16_jit(q: jnp.ndarray, prop_decrease: jnp.ndarray,
                           n_valid: jnp.ndarray, sr: int = 16000,
                           denoise: bool = True):
    """int16 in → (f32 gated+normalized, int16 of it) — the multi-file load
    path (audio.decode.load_audio_many). The tunnel moves audio at
    ~10-50 MB/s, so both transfer legs ride int16. The caller pre-scales
    each row to its peak (the gate is scale-invariant and the output is
    peak-normalized, so the /32768 here is an arbitrary constant), giving
    every source — s16, 24/32-bit PCM, float — full 16-bit transfer
    precision; the int16 output leg adds ≤0.5 LSB (1.53e-5) on the
    normalized waveform. The f32 output never leaves the device — it
    becomes the AudioStore batch.
    (Measured alternatives: f32 both ways ~2.3 s per 8×60 s batch vs ~1.95 s
    int16; computing the host copy with spectral_gate_np instead of
    downloading takes 3.5-7 s in-process — CPU contention with the device
    client threads — so the download stays.)"""
    x = q.astype(jnp.float32) / 32768.0
    return _gate_norm_core(x, prop_decrease, n_valid, sr, denoise)


@partial(jax.jit, static_argnames=("sr", "denoise", "width"))
def gate_normalize_packed_jit(data: jnp.ndarray, x0: jnp.ndarray,
                              e1: jnp.ndarray, order2: jnp.ndarray,
                              prop_decrease: jnp.ndarray,
                              n_valid: jnp.ndarray, sr: int = 16000,
                              denoise: bool = True, width: int = 12):
    """Lossless delta-packed wire in → (f32 gated+normalized, int16 of it)
    — the default wire (TPUConfig.wire_bits=0): 25-45% fewer upload bytes
    than int16 with a BIT-IDENTICAL result, because the device
    reconstructs the exact int16 batch (audio/pack.py format: W-bit
    deltas, groups of 8 samples per W bytes, static-slice unpack) and
    then re-masks the valid region — the padding taper the packer wrote
    never reaches the gate, so the input equals the raw-int16 program's
    input exactly. ``width`` is static (one cached program per width);
    ``order2`` is traced so both delta orders share a program."""
    from clearconverse_tpu.audio.pack import unpack_delta_jnp
    xi = unpack_delta_jnp(data, x0, e1, order2, width)
    x = (xi.astype(jnp.float32) / 32768.0) * _valid_mask(xi.shape[-1],
                                                         n_valid)
    return _gate_norm_core(x, prop_decrease, n_valid, sr, denoise)


@partial(jax.jit, static_argnames=("sr", "denoise"))
def gate_normalize_u8_jit(q: jnp.ndarray, prop_decrease: jnp.ndarray,
                          n_valid: jnp.ndarray, sr: int = 16000,
                          denoise: bool = True):
    """mu-law uint8 in → (f32 gated+normalized, mu-law uint8 of it) — the
    8-bit wire variant of gate_normalize_i16_jit (TPUConfig.wire_bits=8 /
    CC_TPU_WIRE_BITS=8): HALF the bytes on BOTH tunnel legs at ~38 dB
    companding SNR per leg (see audio/wire.py for the opt-in rationale).
    The mu-law expand is elementwise and fuses into the gate's first STFT
    pass; the downlink re-encodes the gated waveform (it is peak-normalized,
    so the codec's full range is used). Rows must be peak-prescaled on host
    before encoding (the codec's dynamic range is per-sample, not
    per-row)."""
    from clearconverse_tpu.audio.wire import mulaw_encode_jnp, mulaw_expand_jnp
    x = mulaw_expand_jnp(q) * _valid_mask(q.shape[-1], n_valid)
    y = _gate_norm_f32(x, prop_decrease, n_valid, sr, denoise)
    return y, mulaw_encode_jnp(y)


def spectral_gate_np(audio: np.ndarray, sr: int = 16000,
                     prop_decrease: float = 0.5,
                     mask: np.ndarray | None = None) -> np.ndarray:
    """Independent host numpy mirror of ``spectral_gate`` +
    ``peak_normalize``, op for op (same STFT framing, masked stats,
    separable triangular smoothing, overlap-add ISTFT). Serves as the
    reference implementation the XLA program is verified against
    (test_audio.test_host_gate_matches_device, ~1e-6 relative agreement)
    and as a device-free fallback. Too slow for the load path in-process
    (3.5-7 s per 8×60 s batch under device-client CPU contention — see
    gate_normalize_i16_jit)."""
    from scipy import fft as sfft
    from scipy import ndimage

    length = audio.shape[-1]
    pad = N_FFT // 2
    xp = np.pad(audio.astype(np.float32), ((0, 0), (pad, pad)))
    n_frames = 1 + length // HOP
    idx = (np.arange(n_frames) * HOP)[:, None] + np.arange(N_FFT)[None, :]
    frames = xp[:, idx] * _hann(N_FFT)[None, None, :]
    spec = np.transpose(sfft.rfft(frames, axis=-1), (0, 2, 1))  # [B,F,T]

    mag_db = 20.0 * np.log10(np.maximum(np.abs(spec), 1e-20)).astype(np.float32)
    if mask is not None:
        # '<=' mirrors the device path: librosa's center=True framing has
        # 1 + n_valid//HOP valid frames (see spectral_gate's masked stats).
        frame_valid = ((np.arange(n_frames)[None, :] * HOP)
                       <= mask.sum(-1, keepdims=True))
        w = frame_valid[:, None, :].astype(np.float32)
        denom = np.maximum(w.sum(-1, keepdims=True), 1.0)
        mean_db = (mag_db * w).sum(-1, keepdims=True) / denom
        var_db = ((mag_db - mean_db) ** 2 * w).sum(-1, keepdims=True) / denom
    else:
        mean_db = mag_db.mean(-1, keepdims=True)
        var_db = mag_db.var(-1, keepdims=True)
    noise_thresh = mean_db + np.sqrt(var_db) * _N_STD_THRESH

    gate = (mag_db > noise_thresh).astype(np.float32)
    # The (freq × time) triangular kernel is an outer product → separable
    # 1-D convolutions (zero boundary = the XLA explicit zero padding; both
    # kernels are odd-length and symmetric, so correlation == convolution).
    filt = _smoothing_filter(sr)
    rf, rt = filt[:, 0], filt[0, :]
    scale = filt.sum() / max(rf.sum() * rt.sum(), 1e-30)  # filt pre-normalized
    gate = ndimage.convolve1d(gate, rf, axis=1, mode="constant")
    gate = ndimage.convolve1d(gate, rt, axis=2, mode="constant") * scale
    gate = gate * prop_decrease + (1.0 - prop_decrease)

    # ISTFT overlap-add with window-square normalization, vectorized as
    # N_FFT//HOP shifted block adds (scatter-add via np.add.at is ~100×
    # slower at these sizes).
    out_frames = sfft.irfft(np.transpose(spec * gate, (0, 2, 1)),
                            n=N_FFT, axis=-1).astype(np.float32)
    window = _hann(N_FFT)
    out_frames *= window[None, None, :]
    B = audio.shape[0]
    k_blocks = N_FFT // HOP
    total_blocks = n_frames - 1 + k_blocks
    out_b = np.zeros((B, total_blocks, HOP), np.float32)
    env_b = np.zeros((total_blocks, HOP), np.float32)
    fb = out_frames.reshape(B, n_frames, k_blocks, HOP)
    wb = (window * window).reshape(k_blocks, HOP)
    for k in range(k_blocks):
        out_b[:, k: k + n_frames] += fb[:, :, k, :]
        env_b[k: k + n_frames] += wb[k][None, :]
    out = out_b.reshape(B, -1)
    env = env_b.reshape(-1)
    out /= np.maximum(env, 1e-8)[None, :]
    out = out[:, pad: pad + length]
    if mask is not None:
        out = out * mask
    peak = np.max(np.abs(out), axis=-1, keepdims=True)
    return out / (peak + 1e-8)

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


def _stft(x: jnp.ndarray) -> jnp.ndarray:
    """librosa-style STFT: center=True constant padding, periodic Hann.
    [B, T] → complex [B, freq, frames]."""
    pad = N_FFT // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    n_frames = 1 + x.shape[-1] // HOP
    idx = (jnp.arange(n_frames) * HOP)[:, None] + jnp.arange(N_FFT)[None, :]
    frames = xp[:, idx] * jnp.asarray(_hann(N_FFT))[None, None, :]
    return jnp.transpose(jnp.fft.rfft(frames, axis=-1), (0, 2, 1))


def _istft(spec: jnp.ndarray, length: int) -> jnp.ndarray:
    """Overlap-add inverse with window-square normalization. [B,freq,frames]→[B,T]."""
    frames = jnp.fft.irfft(jnp.transpose(spec, (0, 2, 1)), n=N_FFT, axis=-1)
    window = jnp.asarray(_hann(N_FFT))
    frames = frames * window[None, None, :]
    n_frames = frames.shape[1]
    total = (n_frames - 1) * HOP + N_FFT
    idx = (jnp.arange(n_frames) * HOP)[:, None] + jnp.arange(N_FFT)[None, :]

    out = jnp.zeros((frames.shape[0], total), frames.dtype)
    out = out.at[:, idx.reshape(-1)].add(frames.reshape(frames.shape[0], -1))
    env = jnp.zeros((total,), frames.dtype)
    env = env.at[idx.reshape(-1)].add(jnp.tile(window * window, n_frames))
    out = out / jnp.maximum(env, 1e-8)[None, :]
    pad = N_FFT // 2
    return out[:, pad : pad + length]


def spectral_gate(audio: jnp.ndarray, sr: int = 16000,
                  prop_decrease: float = 0.5,
                  mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Stationary spectral gating over ``[B, T]`` (or ``[T]``) waveforms.

    ``mask`` (optional ``[B, T]`` 0/1) marks valid samples of padded batch
    entries so padding doesn't contaminate the noise statistics.
    """
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None, :]
    length = audio.shape[-1]

    spec = _stft(audio)
    mag_db = 20.0 * jnp.log10(jnp.maximum(jnp.abs(spec), 1e-20))

    if mask is not None:
        n_frames = spec.shape[-1]
        frame_valid = (jnp.arange(n_frames)[None, :] * HOP) < jnp.sum(mask, -1, keepdims=True)
        w = frame_valid[:, None, :].astype(mag_db.dtype)
        denom = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1.0)
        mean_db = jnp.sum(mag_db * w, -1, keepdims=True) / denom
        var_db = jnp.sum((mag_db - mean_db) ** 2 * w, -1, keepdims=True) / denom
    else:
        mean_db = jnp.mean(mag_db, -1, keepdims=True)
        var_db = jnp.var(mag_db, -1, keepdims=True)
    noise_thresh = mean_db + jnp.sqrt(var_db) * _N_STD_THRESH

    gate = (mag_db > noise_thresh).astype(jnp.float32)
    filt = jnp.asarray(_smoothing_filter(sr))[None, :, :]
    gate = jax.lax.conv_general_dilated(
        gate[:, None, :, :], filt[None, :, :, :],
        window_strides=(1, 1),
        padding=[(filt.shape[1] // 2, (filt.shape[1] - 1) // 2),
                 (filt.shape[2] // 2, (filt.shape[2] - 1) // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0]
    gate = gate * prop_decrease + (1.0 - prop_decrease)

    out = _istft(spec * gate.astype(spec.dtype), length)
    if mask is not None:
        out = out * mask
    return out[0] if squeeze else out


from functools import partial


@partial(jax.jit, static_argnames=("sr",))
def spectral_gate_jit(audio: jnp.ndarray, prop_decrease: jnp.ndarray,
                      mask: jnp.ndarray, sr: int = 16000) -> jnp.ndarray:
    """Jitted batched gate (eager dispatch costs ~30-100 ms/op over the
    device tunnel; the gate is ~25 ops). prop_decrease is traced so one
    program serves every config value."""
    return spectral_gate(audio, sr, prop_decrease, mask)


def peak_normalize(audio: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Peak normalization with the reference's epsilon (back/api.py:835)."""
    peak = jnp.max(jnp.abs(audio), axis=-1, keepdims=True)
    return audio / (peak + eps)


peak_normalize_jit = jax.jit(peak_normalize)


@partial(jax.jit, static_argnames=("sr",))
def spectral_gate_normalized_jit(audio: jnp.ndarray,
                                 prop_decrease: jnp.ndarray,
                                 mask: jnp.ndarray,
                                 sr: int = 16000) -> jnp.ndarray:
    """Gate + peak-normalize as ONE device program: an eager
    peak_normalize after the jitted gate costs ~3 extra dispatches per
    batch over the device tunnel (engine profile-building hot path)."""
    return peak_normalize(spectral_gate(audio, sr, prop_decrease, mask))


@partial(jax.jit, static_argnames=("sr", "denoise"))
def gate_normalize_i16_jit(q: jnp.ndarray, prop_decrease: jnp.ndarray,
                           mask: jnp.ndarray, sr: int = 16000,
                           denoise: bool = True):
    """int16 in → (f32 gated+normalized, int16 of it) — the multi-file load
    path (audio.decode.load_audio_many). The tunnel moves audio at
    ~10-50 MB/s, so both transfer legs ride source-precision int16: the
    /32768 input scale is bit-exact for s16-sourced WAVs, and the int16
    output leg adds ≤0.5 LSB (1.53e-5) on the normalized waveform. The f32
    output never leaves the device — it becomes the AudioStore batch.
    (Measured alternatives: f32 both ways ~2.3 s per 8×60 s batch vs ~1.95 s
    int16; computing the host copy with spectral_gate_np instead of
    downloading takes 3.5-7 s in-process — CPU contention with the device
    client threads — so the download stays.)"""
    x = q.astype(jnp.float32) / 32768.0
    if denoise:
        y = peak_normalize(spectral_gate(x, sr, prop_decrease, mask))
    else:
        y = peak_normalize(x)
    q_out = jnp.clip(jnp.round(y * 32767.0), -32768, 32767).astype(jnp.int16)
    return y, q_out


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
        frame_valid = ((np.arange(n_frames)[None, :] * HOP)
                       < mask.sum(-1, keepdims=True))
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

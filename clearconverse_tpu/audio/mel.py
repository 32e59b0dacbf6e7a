"""Whisper-exact log-mel spectrogram frontend.

Reimplements the reference's Whisper mel frontend (openai-whisper
``log_mel_spectrogram``, reached via back/api.py:1286 ``model.transcribe``)
without torch: N_FFT=400, hop 160, periodic Hann window, reflect padding,
power spectrum with the trailing frame dropped, slaney-normalized 80-band mel
filterbank, log10 with 8 dB dynamic-range clamp, (x+4)/4 scaling.

TPU-first formulation: instead of an FFT, frames are projected with dense
cos/sin DFT matrices — two [400, 201] matmuls that land on the MXU and fuse
with the [201, 80] mel projection. ``jnp.fft.rfft`` is kept as a
cross-checked alternate path. A fully fused Pallas kernel lives in
ops/pallas/logmel.py.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80
SAMPLE_RATE = 16000


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False): linear to 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, f / f_sp)


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f_sp * m)


@lru_cache(maxsize=4)
def mel_filterbank(sr: int = SAMPLE_RATE, n_fft: int = N_FFT, n_mels: int = N_MELS) -> np.ndarray:
    """[n_freq, n_mels] slaney-normalized triangular filterbank, equal to
    librosa.filters.mel(sr, n_fft, n_mels).T (whisper assets/mel_filters.npz)."""
    fftfreqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2.0), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2:] - mel_pts[:-2])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # [n_freq, n_mels]


@lru_cache(maxsize=2)
def _dft_matrices(n_fft: int = N_FFT):
    """Windowed real-DFT projection matrices [n_fft, n_freq] (f32)."""
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)
    ang = 2.0 * np.pi * n[:, None] * k[None, :] / n_fft
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))  # periodic Hann
    cos_m = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_m = (-np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_m, sin_m


def frame_signal(audio: jnp.ndarray, n_fft: int = N_FFT, hop: int = HOP_LENGTH) -> jnp.ndarray:
    """Reflect-pad and frame ``[B, T]`` → ``[B, 1 + T//hop, n_fft]``
    (torch.stft center=True framing)."""
    pad = n_fft // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + audio.shape[-1] // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return x[:, idx]


def log_mel_spectrogram(audio: jnp.ndarray, n_mels: int = N_MELS,
                        use_fft: bool = False) -> jnp.ndarray:
    """``[B, T]`` float32 waveform @16 kHz → ``[B, n_mels, n_frames]`` log-mel.

    Matches openai-whisper's output to float tolerance; golden-tested in
    tests/test_mel.py against an independent NumPy reference.
    """
    if audio.ndim == 1:
        audio = audio[None, :]
    frames = frame_signal(audio)  # [B, F+1, n_fft]
    frames = frames[:, :-1, :]    # whisper drops the final frame's column
    if use_fft:
        n = np.arange(N_FFT)
        window = jnp.asarray((0.5 * (1.0 - np.cos(2.0 * np.pi * n / N_FFT))).astype(np.float32))
        spec = jnp.fft.rfft(frames * window[None, None, :], axis=-1)
        power = jnp.abs(spec) ** 2
    else:
        # precision=HIGHEST: f32 parity matters (TPU matmuls default to
        # bf16 passes, which would break the whisper-exactness claim for
        # any TPU consumer of this XLA path — e.g. training features; the
        # serving path dispatches to the f32 Pallas kernel instead).
        P = jax.lax.Precision.HIGHEST
        cos_m, sin_m = _dft_matrices()
        re = jnp.einsum("bfn,nk->bfk", frames, jnp.asarray(cos_m),
                        precision=P, preferred_element_type=jnp.float32)
        im = jnp.einsum("bfn,nk->bfk", frames, jnp.asarray(sin_m),
                        precision=P, preferred_element_type=jnp.float32)
        power = re * re + im * im
    mel = jnp.einsum("bfk,km->bfm", power, jnp.asarray(mel_filterbank(n_mels=n_mels)),
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.transpose(log_spec, (0, 2, 1))  # [B, n_mels, n_frames]


def log_mel_auto(audio: jnp.ndarray, n_mels: int = N_MELS) -> jnp.ndarray:
    """Platform-dispatching log-mel: the fused Pallas kernel on TPU
    (measured 3.3× the XLA formulation, bit-identical), XLA elsewhere."""
    platform = jax.default_backend()
    if platform not in ("cpu",):
        from clearconverse_tpu.ops.pallas.logmel import log_mel_spectrogram_pallas
        return log_mel_spectrogram_pallas(audio, n_mels)
    return log_mel_spectrogram(audio, n_mels)


def pad_or_trim(audio: jnp.ndarray, length: int) -> jnp.ndarray:
    """Whisper's pad_or_trim on the last axis (fixed-shape batching helper)."""
    t = audio.shape[-1]
    if t >= length:
        return audio[..., :length]
    pad = [(0, 0)] * (audio.ndim - 1) + [(0, length - t)]
    return jnp.pad(audio, pad)

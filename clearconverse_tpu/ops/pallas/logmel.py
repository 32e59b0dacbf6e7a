"""Fused log-mel frontend as a Pallas TPU kernel.

Computes Whisper's mel power spectrogram (audio/mel.py semantics) with the
framing, windowed DFT and mel projection fused in VMEM so both matmuls hit
the MXU back-to-back per block.

Key trick — framing without gathers: with hop 160 and N_FFT 400, lay the
padded audio out as hop-rows C[r, b] = audio[r*160 + b]. Then
``frames[i, a*160 + b] = C[i + a, b]`` for a ∈ {0,1,2}: a block of frames is
three row-shifted views of C concatenated on the lane axis — [BLOCK, 480] —
with the DFT matrices zero-padded from 400 to 480 rows. Pallas blocks can't
overlap, so the three shifted views are passed as three inputs whose blocks
align; everything in-kernel is static slicing + two MXU matmuls.

The log10 + dynamic-range clamp stays outside (it needs a global max and
fuses trivially in XLA). Output matches audio/mel.py's power+mel to float
tolerance (tests/test_pallas.py) and the full log-mel matches end-to-end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clearconverse_tpu.audio import mel as melmod

N_FFT = 400
HOP = 160
BLOCK_FRAMES = 256
_A = 3  # each frame spans 3 hop-rows (400 < 3*160)


@functools.lru_cache(maxsize=2)
def _padded_mats(n_mels: int):
    cos_m, sin_m = melmod._dft_matrices(N_FFT)        # [400, 201]
    fb = melmod.mel_filterbank(n_mels=n_mels)          # [201, n_mels]
    pad = np.zeros((_A * HOP - N_FFT, cos_m.shape[1]), np.float32)
    cos_p = np.concatenate([cos_m, pad], axis=0)       # [480, 201]
    sin_p = np.concatenate([sin_m, pad], axis=0)
    return cos_p, sin_p, fb


def _kernel(r0_ref, r1_ref, r2_ref, cos_ref, sin_ref, fb_ref, out_ref):
    frames = jnp.concatenate(
        [r0_ref[0], r1_ref[0], r2_ref[0]], axis=1)     # [BLOCK, 480]
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    out_ref[0] = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)


def mel_power_pallas(audio: jnp.ndarray, n_mels: int = 80,
                     interpret: bool = False) -> jnp.ndarray:
    """[B, T] (T a hop multiple) → [B, T//HOP, n_mels] mel power."""
    if audio.ndim == 1:
        audio = audio[None]
    B, T = audio.shape
    assert T % HOP == 0, "pad audio to a hop multiple"
    n_frames = T // HOP
    n_blocks = pl.cdiv(n_frames, BLOCK_FRAMES)
    padded_frames = n_blocks * BLOCK_FRAMES

    pad = N_FFT // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    need = (padded_frames + _A) * HOP
    x = jnp.pad(x, ((0, 0), (0, max(0, need - x.shape[1]))))[:, :need]
    rows = x.reshape(B, padded_frames + _A, HOP)
    shifted = [rows[:, a : a + padded_frames, :] for a in range(_A)]

    cos_p, sin_p, fb = _padded_mats(n_mels)
    row_spec = pl.BlockSpec((1, BLOCK_FRAMES, HOP), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=(B, n_blocks),
        in_specs=[row_spec, row_spec, row_spec,
                  pl.BlockSpec((_A * HOP, cos_p.shape[1]), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_A * HOP, sin_p.shape[1]), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((fb.shape[0], n_mels), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BLOCK_FRAMES, n_mels),
                               lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, padded_frames, n_mels), jnp.float32),
        interpret=interpret,
    )(*shifted, jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(fb))
    return out[:, :n_frames, :]


def log_mel_spectrogram_pallas(audio: jnp.ndarray, n_mels: int = 80,
                               interpret: bool = False) -> jnp.ndarray:
    """Drop-in for audio/mel.log_mel_spectrogram: [B, T] → [B, n_mels, F]."""
    mel = mel_power_pallas(audio, n_mels, interpret)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec,
                           jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.transpose(log_spec, (0, 2, 1))

"""Windowed-sinc polyphase resampler.

Implements the identical math to torchaudio's ``Resample`` transform that the
reference caches per source rate (back/api.py:826-830): a bank of
``new_freq`` polyphase sinc filters (hann-windowed, rolloff 0.99, filter
width 6) applied as one strided convolution. On TPU the conv lowers onto the
MXU; the kernel bank is built once per (orig, new) pair on host in float64
and cached.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _kernel_bank(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6,
                 rolloff: float = 0.99) -> tuple:
    """Polyphase filter bank [new_freq, 1, K] plus pad width, as NumPy f32."""
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)

    idx = np.arange(-width, width + orig_freq, dtype=np.float64) / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None] / new_freq + idx[None, :]
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * math.pi / lowpass_filter_width / 2) ** 2
    t *= math.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel *= window * (base_freq / orig_freq)
    return kernel[:, None, :].astype(np.float32), width


def resample(waveform: jnp.ndarray, orig_freq: int, new_freq: int,
             lowpass_filter_width: int = 6, rolloff: float = 0.99) -> jnp.ndarray:
    """Resample ``[..., T]`` from orig_freq to new_freq.

    Output length is ``ceil(new_freq * T / orig_freq)`` — matching torchaudio,
    so waveforms resampled here can be compared sample-for-sample against the
    reference pipeline's tensors.
    """
    if orig_freq == new_freq:
        return waveform
    gcd = math.gcd(int(orig_freq), int(new_freq))
    orig, new = int(orig_freq) // gcd, int(new_freq) // gcd
    kernel_np, width = _kernel_bank(orig, new, lowpass_filter_width, rolloff)
    kernel = jnp.asarray(kernel_np)

    shape = waveform.shape
    length = shape[-1]
    x = waveform.reshape(-1, 1, length).astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (0, 0), (width, width + orig)))
    # [B, new, frames]: each output channel is one polyphase branch.
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(orig,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        # Full f32 MXU passes: the TPU default (bf16) costs ~3e-3 absolute
        # error on the filter output, which is audible parity loss.
        precision=jax.lax.Precision.HIGHEST,
    )
    frames = y.shape[-1]
    y = jnp.transpose(y, (0, 2, 1)).reshape(-1, frames * new)
    target_len = int(math.ceil(new * length / orig))
    y = y[:, :target_len]
    return y.reshape(shape[:-1] + (target_len,))

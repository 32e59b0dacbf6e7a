"""8-bit mu-law wire format for host->device audio uploads (opt-in).

The engine's load stage is wire-bound: the tunnel moves ~23 MB/s and the
audio batch upload is the single largest stage of a warm engine pass
(bench stage_seconds.load_gate.upload_gate). mu-law (G.711's companding
curve, mu=255) halves the bytes vs int16 at ~38 dB SNR on speech —
inaudible for ASR/diarization front-ends but NOT bit-identical, so it
ships off by default and is enabled per-deployment via CC_TPU_WIRE_BITS=8
once a WER check on real checkpoints clears it. (The DEFAULT wire is the
LOSSLESS delta bit-packing in audio/pack.py — TPUConfig.wire_bits=0 —
which needs no sign-off; mu-law remains the deeper, lossy lever and also
compresses the downlink leg.)

Host side encodes with numpy (vectorized, ~10 ms per 8x60 s batch on the
one-core host); the device side expands inside the gate program
(audio/denoise.gate_normalize_u8_jit) with the exact inverse formula —
elementwise, fuses into the gate's first pass.

The reference has no wire: its audio tensor moves over PCIe implicitly
(back/api.py:836 `.to(device)`); a lossy-but-configurable transfer format
is TPU-rebuild-specific engineering for the tunnel-attached topology.
"""

from __future__ import annotations

import numpy as np

MU = 255.0


# Midtread quantizer: code = round(y*127)+128, so y=0 maps to code 128
# EXACTLY and decodes back to exactly 0.0 (and ±1 to codes 255/1). A
# midrise mapping has no zero code — a digitally-silent row would decode
# to a +8.6e-5 DC plateau which peak_normalize then amplifies to
# near-full-scale garbage (hallucinated "speech" on a silent file).
_STEPS = 127.0


def mulaw_encode_np(x: np.ndarray) -> np.ndarray:
    """float in [-1, 1] -> uint8 mu-law code (vectorized host encoder)."""
    x = np.clip(x, -1.0, 1.0)
    y = np.sign(x) * np.log1p(MU * np.abs(x)) / np.log1p(MU)
    return np.clip(np.round(y * _STEPS) + 128.0, 0, 255).astype(np.uint8)


def mulaw_encode_i16_np(w: np.ndarray) -> np.ndarray:
    """int16 waveform → mu-law codes of the PEAK-PRESCALED signal
    (exactly ``mulaw_encode_np((w/32768) / (max|w|/32768))``), via a
    65536-entry LUT: one log per distinct sample VALUE instead of one per
    sample — ~3× cheaper on the one-core host for 60 s files, and bitwise
    identical because dividing both operands by 2^15 is exact in IEEE
    (the quotient w/max|w| is the same float either way)."""
    if len(w) == 0:
        return np.zeros(0, np.uint8)
    wi = w.astype(np.int32)
    m = float(max(int(np.max(np.abs(wi))), 1)) / 32768.0
    if len(w) <= 65536:
        # Building the 64k LUT costs 64k logs — more than encoding the row
        # directly for anything shorter than ~4 s at 16 kHz. Both paths are
        # bitwise identical (same per-value float computation).
        x = wi.astype(np.float32) / np.float32(32768.0)
        return mulaw_encode_np(x / m)
    grid = np.arange(-32768, 32768, dtype=np.float32) / np.float32(32768.0)
    lut = mulaw_encode_np(grid / m)
    return lut[wi + 32768]


def mulaw_decode_np(u: np.ndarray) -> np.ndarray:
    """uint8 mu-law code -> float32 in [-1, 1] (host mirror of the device
    expand; test_audio asserts the round-trip SNR and exact-zero code)."""
    y = np.clip((u.astype(np.float32) - 128.0) / _STEPS, -1.0, 1.0)
    return np.sign(y) * ((1.0 + MU) ** np.abs(y) - 1.0) / MU


def mulaw_expand_jnp(u):
    """uint8 [B, T] -> float32 in [-1, 1], on device (elementwise; XLA
    fuses it into whatever consumes the expanded waveform)."""
    import jax.numpy as jnp
    y = jnp.clip((u.astype(jnp.float32) - 128.0) / _STEPS, -1.0, 1.0)
    return jnp.sign(y) * ((1.0 + MU) ** jnp.abs(y) - 1.0) / MU


def mulaw_encode_jnp(x):
    """float32 [B, T] in [-1, 1] -> uint8 mu-law, on device — the DOWNLINK
    leg of the 8-bit wire (the gated batch returns to the host at half the
    int16 bytes; mulaw_decode_np reverses it there)."""
    import jax.numpy as jnp
    x = jnp.clip(x, -1.0, 1.0)
    y = jnp.sign(x) * jnp.log1p(MU * jnp.abs(x)) / np.log1p(MU)
    return jnp.clip(jnp.round(y * _STEPS) + 128.0, 0, 255).astype(jnp.uint8)

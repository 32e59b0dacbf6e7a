"""Lossless bit-packed delta wire for host->device audio uploads (default).

The engine's load stage is wire-bound: the tunnel moves ~23 MB/s and the
int16 batch upload is the single largest stage of a warm engine pass
(bench stage_seconds.load_gate.upload_gate). Speech waveforms are heavily
oversampled at 16 kHz/16-bit, so their sample-to-sample deltas need far
fewer bits than the samples themselves: first- or second-order deltas of
real speech fit 9-12 bits, cutting upload bytes 25-45% — and unlike the
opt-in mu-law wire (audio/wire.py) the packing is EXACTLY invertible, so
the device reconstructs the int16 batch bit-for-bit and every downstream
result is identical to the raw int16 wire. That is why this wire can be
the default (TPUConfig.wire_bits=0 = "auto") with no WER sign-off.

Format (per upload):
  * order ``k`` in {1, 2}: the stream carries k-th order deltas. Chosen
    per upload as whichever order needs the narrower width (white noise
    prefers order 1, tonal/voiced content order 2).
  * width ``W`` in [4, 15]: every delta is stored as an unsigned W-bit
    value (delta + 2^(W-1)). W is the smallest width covering the batch's
    max |delta|, rounded UP to the bucket set WIDTH_BUCKETS — each width
    is one cached device program, so a handful of buckets instead of ~10
    raw widths bounds the first-compile surface (30 s - 18 min per shape
    over the tunnel) at ≤1 extra bit (~8% stream bytes). Above
    AUTO_MAX_WIDTH (13 by default) the caller falls back to the raw int16
    wire (audio/decode.load_audio_many).
  * groups of 8 samples pack into exactly W bytes (8*W bits), so the
    byte stream is [K, T*W/8] uint8 with STATIC per-sample byte/shift
    offsets — the device unpack is 8 static slices + shifts/masks, no
    gathers (gathers serialize on TPU; see CLAUDE.md platform rules).
    T must be a multiple of 8 (every length bucket is, audio/decode.
    _LEN_BUCKETS_S are whole seconds at 16 kHz).
  * side channel: per-row ``x0`` (sample 0) and ``e1`` (the slot-1 delta,
    which can exceed W bits: x[1]-x[0] spans 17 bits worst-case). Slots
    0 and 1 of the delta stream are packed as zeros; the device splices
    ``e1`` back in before the cumulative sums.
  * rows shorter than T get a short linear taper to zero in the padding
    region (values there are DON'T-CARE — the device re-masks the valid
    region before the gate) so the valid->pad transition never inflates
    W the way a hard step to zero would.

Reconstruction on device: p = unpack (slot1 := e1); order 1:
x = x0 + cumsum(p); order 2: x = x0 + cumsum(cumsum(p)). Integer int32
cumulative sums are exact (intermediate magnitudes are bounded by 17
bits), so the round-trip is bit-identical to the packed int16 input.

The reference has no wire: its audio tensor moves over PCIe implicitly
(back/api.py:836 ``.to(device)``); a compressed transfer format is
TPU-rebuild-specific engineering for the tunnel-attached topology.
"""

from __future__ import annotations

import dataclasses

import numpy as np

MIN_WIDTH = 4
MAX_WIDTH = 15
# Auto-pack engagement threshold (pack_i16_batch default): measured on the
# v5e tunnel, the upload's MARGINAL rate is ~35 MB/s on top of a ~0.45 s
# fixed cost per 8x60 s batch, and the host pack pass costs ~40 ms — so
# widths 14-15 save less than they cost (width-14 A/B: -36 ms wire,
# +34 ms host per pass = a wash). Width <= 13 nets positive and real
# speech deltas fit 9-12 bits; near-full-scale wideband noise (the only
# content needing 14+) falls back to the raw int16 wire at zero cost.
AUTO_MAX_WIDTH = 13
# Every distinct width is a distinct gate_normalize_packed_jit program
# (width drives the static bit layout of the device unpack), and a first
# compile per shape costs 30 s - 18 min over the tunnel — so the auto
# packer rounds the measured width UP to this bucket set. Cost: ≤1 extra
# bit (~8% of the packed stream, still far below raw int16); gain: 4
# programs per (K, T) shape instead of ~10, all warmable ahead of time.
WIDTH_BUCKETS = (8, 10, 12, 13)
_TAPER = 256          # max taper samples from a row's last value to zero


@dataclasses.dataclass(frozen=True)
class PackedBatch:
    """One packed upload: ``data`` [K, T*width//8] uint8, side arrays
    ``x0``/``e1`` [K] int32, the delta ``order`` (1 or 2), the static
    ``width`` in bits, and the unpacked length ``t`` (= 8*data.shape[1]
    // width)."""

    data: np.ndarray
    x0: np.ndarray
    e1: np.ndarray
    order: int
    width: int
    t: int


def _taper_padding(q: np.ndarray, n_valid) -> np.ndarray:
    """Replace each row's zero padding with a gentle linear ramp away from
    the last valid sample (padding values are masked out downstream, so
    any content is legal — the ramp just keeps the valid->pad step from
    dictating the batch's packed width). The slope is ALWAYS |last|/_TAPER:
    when the pad region is shorter than _TAPER the ramp simply stops short
    of zero (fine — the region is don't-care), instead of steepening and
    re-inflating the width it exists to contain (a loud file ending within
    ~16 ms of its bucket would otherwise knock the whole batch off the
    packed wire). Returns a copy only if needed."""
    K, T = q.shape
    out = None
    for r in range(K):
        n = int(n_valid[r])
        if n <= 0 or n >= T:
            continue
        last = int(q[r, n - 1])
        if last == 0:
            continue
        if out is None:
            out = q.copy()
        L = min(T - n, _TAPER)
        ramp = np.round(last * (1.0 - np.arange(1, L + 1) / _TAPER))
        out[r, n: n + L] = ramp.astype(np.int16)
    return q if out is None else out


def _signed_width(max_abs: int) -> int:
    """Smallest signed two's-complement width holding ±max_abs."""
    return max(int(max_abs).bit_length() + 1, MIN_WIDTH)


def pack_bits_np(u: np.ndarray, width: int) -> np.ndarray:
    """[K, T] unsigned values < 2**width -> [K, T*width//8] uint8.

    Groups of 8 samples concatenate little-endian into 8*width bits =
    exactly ``width`` bytes. Vectorized over [K, T/8] uint64 lanes: each
    group builds a 128-bit accumulator as (lo, hi) uint64 words, then the
    first ``width`` bytes of each group's little-endian byte view are the
    stream. ~15 ms for an 8x60 s batch on the one-core host."""
    K, T = u.shape
    if T % 8:
        raise ValueError(f"T must be a multiple of 8, got {T}")
    g = u.reshape(K, T // 8, 8).astype(np.uint64)
    lo = np.zeros((K, T // 8), np.uint64)
    hi = np.zeros((K, T // 8), np.uint64)
    for i in range(8):
        s = i * width
        if s < 64:
            lo |= g[:, :, i] << np.uint64(s)
            if s + width > 64:
                hi |= g[:, :, i] >> np.uint64(64 - s)
        else:
            hi |= g[:, :, i] << np.uint64(s - 64)
    both = np.concatenate(
        [lo[..., None].view(np.uint8).reshape(K, T // 8, 8),
         hi[..., None].view(np.uint8).reshape(K, T // 8, 8)], axis=-1)
    return np.ascontiguousarray(both[:, :, :width]).reshape(K, T * width // 8)


def unpack_bits_np(data: np.ndarray, width: int) -> np.ndarray:
    """Host mirror of the device unpack: [K, T*width//8] uint8 ->
    [K, T] unsigned int32 values < 2**width (test oracle + CPU fallback)."""
    K, nbytes = data.shape
    T = nbytes * 8 // width
    gb = data.reshape(K, T // 8, width).astype(np.uint32)
    gb = np.concatenate([gb, np.zeros((K, T // 8, 2), np.uint32)], axis=-1)
    mask = np.uint32((1 << width) - 1)
    cols = []
    for i in range(8):
        bit = i * width
        j, s = bit >> 3, bit & 7
        v = (gb[:, :, j] | (gb[:, :, j + 1] << np.uint32(8))
             | (gb[:, :, j + 2] << np.uint32(16))) >> np.uint32(s)
        cols.append((v & mask).astype(np.int32))
    return np.stack(cols, axis=-1).reshape(K, T)


def unpack_delta_jnp(data, x0, e1, order2, width: int):
    """Device-side decode: packed bytes [K, T*width//8] uint8 + side
    arrays -> int32 waveform [K, T], bit-identical to the packed input.

    ``width`` is STATIC (one program per width; widths are few and the
    persistent compile cache holds them); ``order2`` is a traced bool so
    both delta orders share a program. All indexing is static slices —
    no gathers (gathers serialize on TPU)."""
    import jax.numpy as jnp

    K, nbytes = data.shape
    T = nbytes * 8 // width
    gb = jnp.concatenate(
        [data.reshape(K, T // 8, width),
         jnp.zeros((K, T // 8, 2), jnp.uint8)], axis=-1).astype(jnp.int32)
    mask = (1 << width) - 1
    cols = []
    for i in range(8):
        bit = i * width
        j, s = bit >> 3, bit & 7
        v = (gb[:, :, j] | (gb[:, :, j + 1] << 8)
             | (gb[:, :, j + 2] << 16)) >> s
        cols.append(v & mask)
    p = jnp.stack(cols, axis=-1).reshape(K, T) - (1 << (width - 1))
    # Slot 1 carries e1 (17-bit worst case, outside the packed width).
    p = jnp.concatenate([p[:, :1], e1[:, None].astype(jnp.int32), p[:, 2:]],
                        axis=1)
    c1 = jnp.cumsum(p, axis=1)                       # order-1 reconstruction
    x = x0[:, None].astype(jnp.int32) + jnp.where(order2,
                                                  jnp.cumsum(c1, axis=1), c1)
    return x


def pack_i16_batch(q: np.ndarray, n_valid,
                   max_width: int = AUTO_MAX_WIDTH,
                   allow_numpy: bool = False) -> "PackedBatch | None":
    """Pack an int16 batch [K, T] (zero-padded past ``n_valid``) for the
    wire, or None when no delta order fits within ``max_width`` bits
    (near-full-scale wideband noise; see AUTO_MAX_WIDTH for why the
    default stops at 13) — the caller then sends raw int16.

    The padding region is tapered first (values there are don't-care;
    the device re-masks), so a loud final sample cannot force the whole
    batch to fall back.

    Both passes (max-|delta| scan, delta+bit-pack) MUST run in the native
    wavcodec library — numpy needs ~0.3-0.9 s of temporaries/strided
    slicing for an 8×60 s batch on this image's ONE host core, which
    would eat the ~0.2-0.4 s wire saving and make the default wire a net
    regression exactly where the C build failed. When the native library
    is unavailable this returns None (raw int16 wire); ``allow_numpy``
    keeps the pure-numpy mirror reachable as the tests' oracle."""
    from clearconverse_tpu.audio import native

    K, T = q.shape
    if T % 8 or T < 2:
        return None
    if native.get_lib() is None and not allow_numpy:
        return None
    q = _taper_padding(q, n_valid)
    scanned = native.delta_scan(q)
    if scanned is None:                                # numpy test oracle
        x32 = q.astype(np.int32)
        d1 = np.diff(x32, axis=1)
        scanned = ((int(np.max(np.abs(d1[:, 1:]))) if T > 2 else 0),
                   (int(np.max(np.abs(np.diff(d1, axis=1)))) if T > 2 else 0))
    m1, m2 = scanned
    w1, w2 = _signed_width(m1), _signed_width(m2)
    order, width = (1, w1) if w1 <= w2 else (2, w2)
    # Round up to the bucket set: each width is a distinct cached device
    # program; see WIDTH_BUCKETS.
    width = next((b for b in WIDTH_BUCKETS if b >= width), width)
    if width > min(max_width, MAX_WIDTH):
        return None
    packed = native.delta_pack(q, order, width)
    if packed is not None:
        data, x0, e1 = packed
        return PackedBatch(data=data, x0=x0, e1=e1, order=order,
                           width=width, t=T)
    x = q.astype(np.int32)
    d1 = np.diff(x, axis=1)                           # [K, T-1]
    p = np.zeros((K, T), np.int32)
    p[:, 2:] = d1[:, 1:] if order == 1 else np.diff(d1, axis=1)
    data = pack_bits_np((p + (1 << (width - 1))).astype(np.uint16), width)
    return PackedBatch(data=data, x0=x[:, 0].copy(), e1=d1[:, 0].copy(),
                       order=order, width=width, t=T)


def unpack_batch_np(pb: PackedBatch) -> np.ndarray:
    """Host mirror of the full device reconstruction (test oracle)."""
    p = unpack_bits_np(pb.data, pb.width) - (1 << (pb.width - 1))
    p[:, 0] = 0
    p[:, 1] = pb.e1
    c1 = np.cumsum(p, axis=1)
    if pb.order == 2:
        c1 = np.cumsum(c1, axis=1)
    return pb.x0[:, None] + c1

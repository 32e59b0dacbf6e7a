"""Container decode + canonical loading.

Parity targets: ``ensure_wav_format`` (back/api.py:530-568) and ``load_audio``
(back/api.py:799-838). WAV is decoded natively (audio/wav.py); other
containers go through an ffmpeg subprocess when the binary exists — the same
contract as the reference, including "return the original path on failure"
(back/api.py:564-566).
"""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from clearconverse_tpu.audio import denoise as _denoise
from clearconverse_tpu.audio.resample import resample
from clearconverse_tpu.audio.wav import _scan_chunks, read_wav, read_wav_i16

logger = logging.getLogger(__name__)

TARGET_SR = 16000


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def ensure_wav_format(file_path: str) -> str:
    """Convert non-WAV audio to 16 kHz mono pcm_s16le WAV via ffmpeg
    (reference back/api.py:544-556 flags). Returns the original path when the
    input is already WAV or conversion is impossible."""
    if file_path.lower().endswith(".wav"):
        return file_path
    if not ffmpeg_available():
        logger.warning("ffmpeg unavailable; keeping %s as-is", file_path)
        return file_path
    # Full-name suffixing ("talk.mp3" -> "talk.mp3.wav"), NOT stem
    # replacement: the reference's stem swap (back/api.py:549) makes
    # same-stem inputs ("talk.mp3" + "talk.m4a") collide on one output and
    # destructively overwrites a user's own pre-existing "talk.wav" via
    # ffmpeg -y. Deterministic per input, so repeat conversions reuse only
    # their own product.
    wav_path = file_path + ".wav"
    cmd = ["ffmpeg", "-y", "-i", file_path,
           "-acodec", "pcm_s16le", "-ar", str(TARGET_SR), "-ac", "1", wav_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return wav_path
    except (subprocess.CalledProcessError, OSError) as exc:
        logger.error("ffmpeg conversion failed for %s: %s", file_path, exc)
        return file_path


# Length ladder (seconds): device programs compile per shape, so arbitrary
# upload lengths would each pay a fresh multi-minute compile of the
# resample/denoise programs. Audio pads to the next bucket (zeros are
# masked out of the denoise statistics) and slices back after.
_LEN_BUCKETS_S = (1, 2, 5, 10, 30, 60, 120, 300, 600, 1500)


def _next_bucket(n: int, sr: int) -> int:
    for s in _LEN_BUCKETS_S:
        if n <= s * sr:
            return s * sr
    return -(-n // (300 * sr)) * (300 * sr)  # beyond ladder: 5-min multiples


def load_audio(file_path: str, target_sr: int = TARGET_SR,
               noise_reduction_amount: float = 0.5,
               denoise: bool = True) -> Tuple[jnp.ndarray, int]:
    """WAV/convertible file → (float32 ``[T]`` waveform @ target_sr, sr).

    Reference semantics (back/api.py:799-838): stereo→mono mean, resample to
    16 kHz, stationary spectral-gate denoise, peak-normalize (+1e-8).
    Shapes are bucketed (see _LEN_BUCKETS_S); outputs match the unbucketed
    computation exactly for resample (zero tail padding both ways) and via
    masked statistics for the gate.
    """
    file_path = ensure_wav_format(file_path)
    samples, sr = read_wav(file_path)              # [C, T]
    mono = samples.mean(axis=0)                     # mono mean (api.py:823)
    n_in = len(mono)
    wave = jnp.asarray(np.pad(mono, (0, _next_bucket(n_in, sr) - n_in)))
    n_out = n_in
    if sr != target_sr:
        wave = resample(wave, sr, target_sr)
        import math
        n_out = int(math.ceil(target_sr * n_in / sr))
    if denoise and noise_reduction_amount > 0:
        # Gate + peak-normalize fused into one device program (the gate
        # zero-masks padding, so the peak over the padded buffer equals the
        # peak over the valid samples).
        wave = _denoise.spectral_gate_normalized_jit(
            wave[None], noise_reduction_amount,
            jnp.asarray([n_out], jnp.int32), sr=target_sr)[0]
    else:
        wave = _denoise.peak_normalize_jit(wave)  # pad is zeros: peak equal
    return wave[:n_out], target_sr


class _Lazy1D:
    """Shared facade for lazily-materialized float32 [T] audio: length is
    known immediately (free len/shape), bytes appear on first access via
    the subclass's ``_materialize``. Covers the engine's actual access
    patterns (len / slicing / np.asarray) — not a general ndarray
    stand-in; public results materialize to real ndarrays (engine
    _finalize) before leaving the pipeline."""

    _n: int

    def _materialize(self) -> np.ndarray:
        raise NotImplementedError

    def __len__(self) -> int:
        return self._n

    @property
    def size(self) -> int:
        return self._n

    @property
    def shape(self):
        return (self._n,)

    @property
    def ndim(self) -> int:
        return 1

    @property
    def dtype(self):
        return np.dtype(np.float32)

    def __getitem__(self, key):
        return self._materialize()[key]

    def __array__(self, dtype=None, copy=None):
        a = self._materialize()
        if dtype is not None and np.dtype(dtype) != a.dtype:
            return a.astype(dtype)
        return np.array(a) if copy else a


class LazyAudio(_Lazy1D):
    """Float32 [T] file audio whose bytes have NOT left the device yet
    (load_audio_many(host_async=True)): the gated-batch download thread
    starts lazily — on the first BYTE access, or when a caller that knows
    bytes will be needed later calls ``prefetch()`` at a transfer-quiet
    point (serve's save_segments path). A run whose consumers all ride
    the device AudioStore never downloads at all. ``stats_flush`` (when
    provided) folds the download thread's timing span into the caller's
    stage dict once the thread has finished — only the main thread ever
    mutates that dict."""

    def __init__(self, join, row: int, n: int, flush=None,
                 start=None, started=None):
        self._join = join
        self._row = row
        self._n = n
        self._arr = None
        self.stats_flush = flush
        self._start = start
        self._started = started

    def _materialize(self) -> np.ndarray:
        if self._arr is None:
            # COPY the row out of the joined [K, T] batch (.copy(), not
            # ascontiguousarray — a row slice is already contiguous, so
            # that would return the view): a view would make every
            # published AudioSegment.audio array share the whole batch as
            # its .base — one retained segment pinning all files' audio
            # (~123 MB for 32×60 s, cross-REQUEST under serve grouping),
            # and a caller mutating one segment corrupting its overlapping
            # siblings. One ~ms host memcpy per file.
            self._arr = self._join()[self._row, : self._n].copy()
        return self._arr

    def prefetch(self) -> None:
        """Start the download thread WITHOUT blocking. For callers that
        know bytes will be read later (serve's save_segments): fire the
        transfer while a long device-bound phase (the decode wavefront)
        runs, instead of paying it sequentially at read time."""
        if self._arr is None and self._start is not None:
            self._start()

    def wait(self) -> None:
        """Drain an IN-FLIGHT download thread. The engine calls this at
        end-of-run: a transfer still in flight when the next request
        starts uploading contends on the tunnel (concurrent transfers
        measured 2.3× WORSE than sequential, CLAUDE.md r3). A download
        that never started stays unstarted — draining would force the
        very transfer laziness exists to avoid. Transfer errors stay
        deferred to first byte access — the engine's per-file _finalize
        guard turns each affected file into a None result (the download
        is SHARED, so every store-path file in the run degrades, but the
        run itself and any host-path files survive)."""
        if self._started is not None and not self._started():
            return
        try:
            self._join()
        except Exception:  # noqa: BLE001 — surfaced at first byte access
            pass


class LazyClip(_Lazy1D):
    """Lazy float32 [T] sub-view over an audio source (LazyAudio or ndarray):
    bounds clamp eagerly — so len() is free — and bytes materialize on
    first access. Lets segment clips flow through the engine's store-backed
    phases (which pass (row, start, len) descriptors to the device) without
    joining an in-flight LazyAudio download."""

    def __init__(self, src, a: int, b: int):
        n = len(src)
        self._src = src
        self._a = min(max(int(a), 0), n)
        self._b = min(max(int(b), self._a), n)
        self._n = self._b - self._a
        self._arr = None

    def _materialize(self) -> np.ndarray:
        if self._arr is None:
            self._arr = np.asarray(self._src[self._a: self._b], np.float32)
        return self._arr


def lazy_slice(audio, a: int, b: int):
    """audio[a:b] without reading bytes when ``audio`` is lazy; plain
    ndarrays slice eagerly (cheap view) for type stability downstream."""
    if isinstance(audio, np.ndarray):
        return np.asarray(audio[a:b], np.float32)
    return LazyClip(audio, a, b)


def load_audio_many(paths, target_sr: int = TARGET_SR,
                    noise_reduction_amount: float = 0.5,
                    denoise: bool = True, return_device: bool = False,
                    stage_times=None, host_async: bool = False,
                    wire_bits: int = 16, wire_info=None):
    """Batched multi-file load (process_files): per-file decode/resample,
    then ONE fused gate+normalize device call over the padded batch and ONE
    device→host transfer — per-file load_audio pays both per file.

    Returns a list aligned with ``paths``: float32 [T] arrays, or None for
    files that failed to load. With ``return_device=True`` also returns the
    gated DEVICE batch [K, T] and a path→row map, so callers can keep the
    audio resident on device (pipeline/bundle.AudioStore) instead of
    re-uploading windows of it later.

    ``stage_times`` (optional dict) receives a wall-clock decomposition —
    host decode, device upload+gate, gated-batch download — so bench.py's
    engine breakdown can attribute load cost to host IO vs the tunnel."""
    import time as _time
    from clearconverse_tpu.utils.tracing import force_sync

    def _mark(key: str, t0: float) -> float:
        t1 = _time.perf_counter()
        if stage_times is not None:
            stage_times[key] = stage_times.get(key, 0.0) + (t1 - t0)
        return t1

    if wire_bits not in (0, 8, 16):
        # Fail loudly: silently falling back to int16 would make a
        # wire-format A/B "measure" the wrong wire (CC_TPU_WIRE_BITS typo,
        # or 4 by analogy with CC_TPU_CROSS_KV_BITS — no int4 wire exists).
        raise ValueError(f"wire_bits must be 0 (lossless packed), 8, or "
                         f"16, got {wire_bits}")
    t0 = _time.perf_counter()
    waves, n_outs, order = [], [], []
    results = [None] * len(paths)
    row_map = [None] * len(paths)

    # Sequential per-file decode: this image exposes ONE host core, so a
    # thread pool here is pure GIL thrash (measured r3: 8 threads made this
    # loop 8x SLOWER, 0.31 -> 2.6 s per 8-file pass).
    for i, p in enumerate(paths):
        try:
            p = ensure_wav_format(p)
            # Mono 16-bit PCM already at target_sr (the ffmpeg-normalized
            # common case, ensure_wav_format emits exactly this) rides its
            # native int16 grid straight to the device: no f32 round-trip,
            # no peak-prescale requantization (which costs ≤0.5 LSB), and
            # no [T]-sized float temporaries on this one-core host.
            scanned = _scan_chunks(p)   # one read+parse serves both paths
            fast = read_wav_i16(p, scanned=scanned)
            if fast is not None and fast[1] == target_sr:
                waves.append(fast[0])
                n_outs.append(len(fast[0]))
                order.append(i)
                continue
            samples, sr = read_wav(p, scanned=scanned)
            mono = samples.mean(axis=0).astype(np.float32)
            n_out = len(mono)
            if sr != target_sr:
                # Per-file resample (device) for the odd-rate file, pulled
                # back to host so the batch assembles host-side.
                padded = np.pad(mono, (0, _next_bucket(n_out, sr) - n_out))
                import math
                n_out = int(math.ceil(target_sr * n_out / sr))
                mono = np.asarray(resample(jnp.asarray(padded), sr,
                                           target_sr))[:n_out]
            waves.append(mono)
            n_outs.append(n_out)
            order.append(i)
        except Exception as exc:  # noqa: BLE001 — per-file failure → None
            logger.error("load_audio failed for %s: %s", p, exc)
    if not waves:
        return (results, None, row_map) if return_device else results
    # Assemble on HOST and move int16 BOTH WAYS (the tunnel moves audio at
    # ~10-50 MB/s — see gate_normalize_i16_jit for the precision +
    # measured-strategy notes). Native int16 rows keep their own grid;
    # float rows (odd rates/bit depths) pre-scale to their own peak before
    # quantizing: the gate is scale-invariant (dB stats shift with the
    # signal) and the output is peak-normalized anyway, so quiet 24-bit or
    # >1.0 float-PCM sources keep full 16-bit precision instead of being
    # crushed/clipped by a fixed /32768 grid. The f32 gated batch stays on
    # device as the AudioStore.
    T = _next_bucket(max(n_outs), target_sr)
    if wire_bits == 8:
        # Opt-in mu-law wire (CC_TPU_WIRE_BITS=8): half the upload bytes at
        # ~38 dB companding SNR — see audio/wire.py. Every row peak-prescales
        # (the codec's resolution is amplitude-relative; the gate is
        # scale-invariant and the output is peak-normalized anyway).
        from clearconverse_tpu.audio.wire import (mulaw_encode_i16_np,
                                                  mulaw_encode_np)
        q_up = np.full((len(waves), T), 128, np.uint8)  # code 128 ~ 0.0
        for row, w in enumerate(waves):
            if w.dtype == np.int16:
                # LUT encoder: bitwise-equal to the float path below but
                # one log per VALUE, not per sample (one-core host).
                q_up[row, : len(w)] = mulaw_encode_i16_np(w)
                continue
            x = np.asarray(w, np.float32)
            peak = max(float(np.max(np.abs(x))), 1e-12) if len(x) else 1e-12
            q_up[row, : len(x)] = mulaw_encode_np(x / peak)
    else:
        q_up = np.zeros((len(waves), T), np.int16)
        for row, w in enumerate(waves):
            if w.dtype == np.int16:      # native grid: straight copy
                q_up[row, : len(w)] = w
                continue
            peak = max(float(np.max(np.abs(w))), 1e-12) if len(w) else 1e-12
            scaled = w * (32767.0 / peak)
            q_up[row, : len(w)] = np.clip(np.round(scaled), -32768,
                                          32767).astype(np.int16)
    packed = None
    if wire_bits == 0:
        # Default lossless wire: delta+bit-pack the int16 batch (audio/
        # pack.py). The device reconstructs it bit-for-bit, so results are
        # IDENTICAL to the raw int16 wire at 25-45% fewer upload bytes
        # (speech deltas fit 9-13 bits). None = no delta order fits
        # AUTO_MAX_WIDTH (13) bits — near-full-scale wideband noise — or
        # the native packer is unavailable → raw int16 below.
        from clearconverse_tpu.audio.pack import pack_i16_batch
        packed = pack_i16_batch(q_up, n_outs)
    if wire_info is not None:
        # What actually crossed the wire this upload (bench.py reports it
        # so BENCH_r*.json proves the default packed wire engaged instead
        # of silently falling back to raw int16 — VERDICT r3 next #5).
        wire_info["bytes_raw_int16"] = int(q_up.size) * 2
        if packed is not None:
            wire_info.update(format="packed_delta", width=packed.width,
                             order=packed.order,
                             bytes_wire=int(packed.data.size
                                            + packed.x0.size * 8))
        elif wire_bits == 8:
            wire_info.update(format="mulaw8", width=8,
                             bytes_wire=int(q_up.size))
        else:
            wire_info.update(format="int16", width=16,
                             bytes_wire=int(q_up.size) * 2)
    t0 = _mark("host_decode", t0)
    # Validity crosses as a [K] int32 vector; the [K, T] f32 mask builds on
    # device (host-built it was 30.7 MB — 2× the audio's own bytes).
    dn = bool(denoise and noise_reduction_amount > 0)
    if packed is not None:
        batch, q_down = _denoise.gate_normalize_packed_jit(
            jnp.asarray(packed.data), jnp.asarray(packed.x0),
            jnp.asarray(packed.e1), packed.order == 2,
            noise_reduction_amount, jnp.asarray(n_outs, jnp.int32),
            sr=target_sr, denoise=dn, width=packed.width)
    else:
        gate = (_denoise.gate_normalize_u8_jit if wire_bits == 8
                else _denoise.gate_normalize_i16_jit)
        batch, q_down = gate(
            jnp.asarray(q_up), noise_reduction_amount,
            jnp.asarray(n_outs, jnp.int32), sr=target_sr, denoise=dn)
    force_sync(q_down)
    t0 = _mark("upload_gate", t0)
    if wire_bits == 8:
        # The downlink also rides mu-law u8 (gate_normalize_u8_jit returns
        # the gated batch re-encoded); decode back to f32 host-side.
        from clearconverse_tpu.audio.wire import mulaw_decode_np
        to_host = lambda q: mulaw_decode_np(np.asarray(q))  # noqa: E731
    else:
        to_host = lambda q: (np.asarray(q).astype(np.float32)  # noqa: E731
                             / 32767.0)
    if host_async and return_device:
        # Hand out LazyAudio views over a download thread that starts
        # LAZILY: the engine's device-side phases (segmentation, diarize,
        # store-gathered embeds, the decode wavefront) all run on the
        # AudioStore and never touch the bytes, so in the clean batch path
        # the 15+ MB download NEVER happens. (It used to start eagerly
        # "overlapped" — but this tunnel serializes concurrent transfers
        # ~2.3× worse, and the in-flight download was silently inflating
        # whichever device stage ran alongside it: segmentation read
        # 0.39 s/pass in BENCH_r04 vs 0.10 s isolated — the exact false
        # regression VERDICT r4 #1 flagged.) First byte access starts AND
        # joins the transfer; callers that know bytes will be needed later
        # (serve's save_segments) call prefetch() at a transfer-quiet
        # point. stage_times gains download_async (thread transfer span)
        # and download_wait (time a consumer actually blocked).
        import threading
        holder = {}

        def _download():
            # The thread writes ONLY distinct holder keys (never the shared
            # stage_times dict — a concurrent insert there races any main-
            # thread iteration over it, e.g. the engine's end-of-run span
            # aggregation, and can raise "dictionary changed size during
            # iteration", losing the whole run).
            td = _time.perf_counter()
            try:
                holder["host"] = to_host(q_down)
            except Exception as exc:  # noqa: BLE001 — surface at join time
                holder["error"] = exc
            holder["elapsed"] = _time.perf_counter() - td

        th = threading.Thread(target=_download, daemon=True)
        start_lock = threading.Lock()

        def _start():
            # Idempotent, thread-safe lazy start (first byte access can
            # come from the download-join path of several LazyAudio rows).
            with start_lock:
                if not holder.get("started"):
                    holder["started"] = True
                    th.start()

        def _flush_stats():
            """Fold the thread's overlapped-transfer span into stage_times
            — main thread only, and only once the thread has finished (so
            holder['elapsed'] is final)."""
            if (stage_times is None or th.is_alive()
                    or holder.get("folded") or "elapsed" not in holder):
                return
            holder["folded"] = True
            stage_times["download_async"] = (
                stage_times.get("download_async", 0.0) + holder["elapsed"])

        def _join():
            _start()
            tw = _time.perf_counter()
            th.join()
            if stage_times is not None:
                stage_times["download_wait"] = (
                    stage_times.get("download_wait", 0.0)
                    + (_time.perf_counter() - tw))
            _flush_stats()
            if "error" in holder:   # joiner sees the transfer's failure;
                # per-file isolation upstream turns it into file→None
                raise RuntimeError(
                    f"async gated-audio download failed: {holder['error']}")
            return holder["host"]

        for row, i in enumerate(order):
            results[i] = LazyAudio(_join, row, n_outs[row],
                                   flush=_flush_stats, start=_start,
                                   started=lambda: bool(holder.get("started")))
            row_map[i] = row
        return results, batch, row_map
    host = to_host(q_down)
    _mark("download", t0)
    for row, i in enumerate(order):
        results[i] = host[row, : n_outs[row]]
        row_map[i] = row
    return (results, batch, row_map) if return_device else results


def decode_pcm_bytes(data: bytes, channels: int = 1) -> np.ndarray:
    """s16le PCM bytes → float32 [C, T] (ffmpeg pipe output helper)."""
    pcm = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    if channels > 1:
        pcm = pcm[: (len(pcm) // channels) * channels].reshape(-1, channels).T
    else:
        pcm = pcm[None, :]
    return pcm

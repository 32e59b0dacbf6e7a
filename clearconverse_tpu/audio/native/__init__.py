"""Native (C++) host-side audio codec, built lazily with g++ and loaded via
ctypes (pybind11 is not vendored in this image). The pure-NumPy path in
audio/wav.py is the always-available fallback; this accelerates PCM
unpacking/interleaving for large uploads."""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "wavcodec.cc")
_CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "cc_tpu_native")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _lib_path() -> str:
    # Cache keyed on a content hash of the source: git does not preserve
    # mtimes, so an mtime comparison against a prebuilt binary is
    # checkout-order-dependent (ADVICE r1). A source edit changes the hash
    # and forces a rebuild; no binary is ever committed.
    with open(_SRC, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    return os.path.join(_CACHE_DIR, f"libwavcodec-{digest}.so")


def _build(lib_path: str) -> bool:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    tmp = lib_path + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, lib_path)  # atomic vs concurrent builders
        return True
    except (subprocess.SubprocessError, OSError) as exc:
        logger.warning("wavcodec build failed: %s", exc)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the codec library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        lib_path = _lib_path()
        if not os.path.exists(lib_path) and not _build(lib_path):
            return None
        try:
            lib = ctypes.CDLL(lib_path)
        except OSError as exc:
            logger.warning("wavcodec load failed: %s", exc)
            return None
        u8 = ctypes.POINTER(ctypes.c_uint8)
        f32 = ctypes.POINTER(ctypes.c_float)
        for name in ("decode_s16", "decode_s24", "decode_s32", "decode_u8",
                     "decode_f32", "decode_f64"):
            fn = getattr(lib, name)
            fn.argtypes = [u8, ctypes.c_int64, ctypes.c_int, f32, ctypes.c_int64]
            fn.restype = ctypes.c_int
        lib.encode_s16.argtypes = [f32, ctypes.c_int, ctypes.c_int64, u8]
        lib.encode_s16.restype = ctypes.c_int
        lib.mono_mix.argtypes = [f32, ctypes.c_int, ctypes.c_int64, f32]
        lib.mono_mix.restype = ctypes.c_int
        lib.peak_normalize.argtypes = [f32, ctypes.c_int64, ctypes.c_float]
        lib.peak_normalize.restype = ctypes.c_float
        i16 = ctypes.POINTER(ctypes.c_int16)
        i32 = ctypes.POINTER(ctypes.c_int32)
        lib.delta_scan.argtypes = [i16, ctypes.c_int64, ctypes.c_int64,
                                   i32, i32]
        lib.delta_scan.restype = ctypes.c_int
        lib.delta_pack.argtypes = [i16, ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_int, ctypes.c_int, u8, i32, i32]
        lib.delta_pack.restype = ctypes.c_int
        _lib = lib
        return _lib


_DECODERS = {(1, 16): "decode_s16", (1, 24): "decode_s24", (1, 32): "decode_s32",
             (1, 8): "decode_u8", (3, 32): "decode_f32", (3, 64): "decode_f64"}


def decode_payload(payload: bytes, fmt_tag: int, bits: int,
                   channels: int) -> Optional[np.ndarray]:
    """Native PCM decode → planar float32 [channels, frames]; None if the
    library or format is unavailable (callers fall back to NumPy)."""
    lib = get_lib()
    name = _DECODERS.get((fmt_tag, bits))
    if lib is None or name is None:
        return None
    bytes_per = {8: 1, 16: 2, 24: 3, 32: 4, 64: 8}[bits]
    frames = len(payload) // bytes_per // channels
    out = np.empty((channels, frames), np.float32)
    buf = np.frombuffer(payload, np.uint8)
    rc = getattr(lib, name)(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(payload),
        channels, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), frames)
    return out if rc == 0 else None


def encode_s16(planar: np.ndarray) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    planar = np.ascontiguousarray(planar, np.float32)
    channels, frames = planar.shape
    out = np.empty(channels * frames * 2, np.uint8)
    rc = lib.encode_s16(planar.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        channels, frames,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.tobytes() if rc == 0 else None


def delta_scan(q: np.ndarray):
    """Max |first delta| / |second delta| over an int16 batch [K, T]
    (slots >= 2, per row) in one C pass — the width probe for the packed
    wire (audio/pack.py). None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    q = np.ascontiguousarray(q, np.int16)
    m1 = ctypes.c_int32(0)
    m2 = ctypes.c_int32(0)
    rc = lib.delta_scan(q.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                        q.shape[0], q.shape[1], ctypes.byref(m1),
                        ctypes.byref(m2))
    return (int(m1.value), int(m2.value)) if rc == 0 else None


def delta_pack(q: np.ndarray, order: int, width: int):
    """Single-pass delta + bit-pack of an int16 batch [K, T] into the
    audio/pack.py wire layout → (data [K, T*width//8] uint8, x0 [K] int32,
    e1 [K] int32); None if the library is unavailable or the shape is
    unpackable."""
    lib = get_lib()
    if lib is None:
        return None
    q = np.ascontiguousarray(q, np.int16)
    k, t = q.shape
    data = np.empty((k, t * width // 8), np.uint8)
    x0 = np.empty((k,), np.int32)
    e1 = np.empty((k,), np.int32)
    rc = lib.delta_pack(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), k, t, order, width,
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        x0.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        e1.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return (data, x0, e1) if rc == 0 else None

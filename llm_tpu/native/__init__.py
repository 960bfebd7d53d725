"""Native (C) load-path acceleration, loaded via ctypes.

Builds llm_tpu/native/unpack.c on first use (plain `cc -O3 -shared`), falls
back to the numpy path silently when no compiler is available. See unpack.c
for the role this plays vs the reference's repack.cpp."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_native.so")
_SRC = os.path.join(_DIR, "unpack.c")

_lock = threading.Lock()
_lib = None
_tried = False

# ggml type ids handled natively
NATIVE_TYPES = {2: "Q4_0", 8: "Q8_0", 12: "Q4_K", 14: "Q6_K"}


def _build() -> bool:
    # -march=native is safe: the .so is always built on the machine that
    # runs it (first-use build, mtime-invalidated). Fall back to plain -O3
    # for compilers/platforms that reject it.
    for extra in (["-march=native", "-funroll-loops"], []):
        for cc in ("cc", "gcc", "clang"):
            try:
                r = subprocess.run(
                    [cc, "-O3", *extra, "-shared", "-fPIC", "-o", _SO, _SRC,
                     "-pthread"],
                    capture_output=True, timeout=120,
                )
                if r.returncode == 0:
                    return True
            except (FileNotFoundError, subprocess.TimeoutExpired):
                continue
    return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("LLM_TPU_NO_NATIVE"):
            return None
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                if not _build():
                    return None
            lib = ctypes.CDLL(_SO)
            lib.unpack_planes.restype = ctypes.c_int
            lib.unpack_planes.argtypes = [
                ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def unpack_planes(type_id: int, raw: np.ndarray, n_rows: int, n_per_row: int,
                  pack_tk: int = 256, n_threads: int | None = None):
    """K-major planes for a supported type, or None (caller falls back).

    Returns (qs, scales[f32 K/gs,N], mins[f32 K/gs,N]|None, gs, layout, zp).
    """
    lib = _load()
    if lib is None or type_id not in NATIVE_TYPES:
        return None
    K, N = n_per_row, n_rows
    raw = np.ascontiguousarray(raw).view(np.uint8).reshape(-1)
    row_bytes = raw.size // N
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)

    if type_id == 12:  # Q4_K
        gs, layout, zp = 32, "p4", 0
        # np.empty: the tiled C writer fully overwrites every output byte
        qs = np.empty((K // 2, N), np.uint8)
        scales = np.empty((K // gs, N), np.float32)
        mins = np.empty((K // gs, N), np.float32)
    elif type_id == 2:  # Q4_0: stored biased nibbles, zp=8
        gs, layout, zp = 32, "p4", 8
        qs = np.empty((K // 2, N), np.uint8)
        scales = np.empty((K // gs, N), np.float32)
        mins = None
    elif type_id == 8:  # Q8_0
        gs, layout, zp = 32, "i8", 0
        qs = np.empty((K, N), np.int8)
        scales = np.empty((K // gs, N), np.float32)
        mins = None
    else:  # 14 Q6_K
        gs, layout, zp = 16, "i8", 0
        qs = np.empty((K, N), np.int8)
        scales = np.empty((K // gs, N), np.float32)
        mins = None

    rc = lib.unpack_planes(
        type_id,
        raw.ctypes.data_as(ctypes.c_void_p), row_bytes, N, K,
        qs.ctypes.data_as(ctypes.c_void_p),
        scales.ctypes.data_as(ctypes.c_void_p),
        mins.ctypes.data_as(ctypes.c_void_p) if mins is not None else None,
        pack_tk, n_threads,
    )
    if rc != 0:
        return None
    return qs, scales, mins, gs, layout, zp

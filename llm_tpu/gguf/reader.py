"""GGUF v3 reader: zero-copy mmap views over tensor data.

Behavioral parity target: /root/reference/ggml/src/gguf.cpp (gguf_init_from_file_impl,
gguf.cpp:319) — header/KV/tensor-info parsing with the same bounds/overflow
validation, plus split-file ("*-00001-of-0000N.gguf") support analogous to
llama_model_load_from_splits (/root/reference/include/llama.h:454).
Implementation is numpy/mmap, independent of the reference's C++.
"""

from __future__ import annotations

import os
import re
import struct
from dataclasses import dataclass, field

import numpy as np

from .constants import (
    GGUF_DEFAULT_ALIGNMENT,
    GGUF_MAGIC,
    GGMLType,
    GGUFValueType,
    Keys,
    tensor_nbytes,
)


class GGUFError(ValueError):
    pass


_SCALAR_FMT = {
    GGUFValueType.UINT8: ("<B", 1),
    GGUFValueType.INT8: ("<b", 1),
    GGUFValueType.UINT16: ("<H", 2),
    GGUFValueType.INT16: ("<h", 2),
    GGUFValueType.UINT32: ("<I", 4),
    GGUFValueType.INT32: ("<i", 4),
    GGUFValueType.FLOAT32: ("<f", 4),
    GGUFValueType.BOOL: ("<B", 1),
    GGUFValueType.UINT64: ("<Q", 8),
    GGUFValueType.INT64: ("<q", 8),
    GGUFValueType.FLOAT64: ("<d", 8),
}

_SCALAR_NPDTYPE = {
    GGUFValueType.UINT8: np.uint8,
    GGUFValueType.INT8: np.int8,
    GGUFValueType.UINT16: np.uint16,
    GGUFValueType.INT16: np.int16,
    GGUFValueType.UINT32: np.uint32,
    GGUFValueType.INT32: np.int32,
    GGUFValueType.FLOAT32: np.float32,
    GGUFValueType.UINT64: np.uint64,
    GGUFValueType.INT64: np.int64,
    GGUFValueType.FLOAT64: np.float64,
    GGUFValueType.BOOL: np.bool_,  # bool arrays (sliding_window_pattern)
}

# practical sanity caps, mirroring the reference's overflow checks
_MAX_STRING = 1 << 31
_MAX_ARRAY = 1 << 34


@dataclass
class TensorInfo:
    name: str
    shape: tuple[int, ...]  # ne order: shape[0] is the row (fastest) dim
    ggml_type: GGMLType
    offset: int  # relative to the data section
    nbytes: int = 0
    file_idx: int = 0  # which split file the data lives in

    @property
    def n_elements(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n


class _Cursor:
    """Bounds-checked little-endian reader over a bytes-like buffer."""

    def __init__(self, buf, name: str):
        self.buf = buf
        self.pos = 0
        self.name = name

    def take(self, n: int) -> memoryview:
        if n < 0 or self.pos + n > len(self.buf):
            raise GGUFError(
                f"{self.name}: truncated file (need {n} bytes at {self.pos}, "
                f"have {len(self.buf) - self.pos})"
            )
        out = memoryview(self.buf)[self.pos : self.pos + n]
        self.pos += n
        return out

    def scalar(self, vtype: GGUFValueType):
        fmt, size = _SCALAR_FMT[vtype]
        (v,) = struct.unpack(fmt, self.take(size))
        if vtype == GGUFValueType.BOOL:
            if v not in (0, 1):
                raise GGUFError(f"{self.name}: invalid bool value {v}")
            return bool(v)
        return v

    def string(self) -> str:
        n = self.scalar(GGUFValueType.UINT64)
        if n > _MAX_STRING:
            raise GGUFError(f"{self.name}: string length {n} too large")
        return bytes(self.take(n)).decode("utf-8", errors="replace")

    def value(self, vtype: int):
        try:
            vtype = GGUFValueType(vtype)
        except ValueError:
            raise GGUFError(f"{self.name}: unknown value type {vtype}") from None
        if vtype == GGUFValueType.STRING:
            return self.string()
        if vtype == GGUFValueType.ARRAY:
            etype = GGUFValueType(self.scalar(GGUFValueType.UINT32))
            n = self.scalar(GGUFValueType.UINT64)
            if n > _MAX_ARRAY:
                raise GGUFError(f"{self.name}: array length {n} too large")
            if etype == GGUFValueType.STRING:
                return [self.string() for _ in range(n)]
            if etype == GGUFValueType.ARRAY:
                return [self.value(GGUFValueType.ARRAY) for _ in range(n)]
            dt = np.dtype(_SCALAR_NPDTYPE[etype]).newbyteorder("<")
            raw = self.take(n * dt.itemsize)
            arr = np.frombuffer(raw, dtype=dt)
            if etype == GGUFValueType.BOOL:
                arr = arr.astype(bool)
            return arr
        return self.scalar(vtype)


_SPLIT_RE = re.compile(r"^(.*)-(\d{5})-of-(\d{5})\.gguf$")


@dataclass
class GGUFReader:
    """Parsed GGUF file(s). `tensors` maps name -> TensorInfo; `data(name)`
    returns the raw on-disk bytes as a zero-copy numpy uint8 view."""

    path: str
    metadata: dict = field(default_factory=dict)
    tensors: dict[str, TensorInfo] = field(default_factory=dict)
    alignment: int = GGUF_DEFAULT_ALIGNMENT

    def __init__(self, path: str, load_splits: bool = True):
        self.path = path
        self.metadata = {}
        self.tensors = {}
        self.alignment = GGUF_DEFAULT_ALIGNMENT
        self._mmaps: list[np.memmap] = []
        self._data_starts: list[int] = []

        paths = [path]
        m = _SPLIT_RE.match(os.path.basename(path))
        if load_splits and m:
            base, first, total = m.group(1), int(m.group(2)), int(m.group(3))
            if first != 1:
                raise GGUFError(f"must open the first split, got {path}")
            d = os.path.dirname(path)
            paths = [
                os.path.join(d, f"{base}-{i:05d}-of-{total:05d}.gguf")
                for i in range(1, total + 1)
            ]
        for i, p in enumerate(paths):
            self._load_one(p, file_idx=i, is_first=(i == 0))

    # -- parsing ------------------------------------------------------------

    def _load_one(self, path: str, file_idx: int, is_first: bool) -> None:
        mm = np.memmap(path, dtype=np.uint8, mode="r")
        cur = _Cursor(mm, os.path.basename(path))

        if bytes(cur.take(4)) != GGUF_MAGIC:
            raise GGUFError(f"{path}: bad magic (not a GGUF file)")
        version = cur.scalar(GGUFValueType.UINT32)
        if version not in (2, 3):
            raise GGUFError(f"{path}: unsupported GGUF version {version}")
        n_tensors = cur.scalar(GGUFValueType.UINT64)
        n_kv = cur.scalar(GGUFValueType.UINT64)
        if n_tensors > 1 << 24 or n_kv > 1 << 24:
            raise GGUFError(f"{path}: implausible header counts")

        metadata = {}
        for _ in range(n_kv):
            key = cur.string()
            vtype = cur.scalar(GGUFValueType.UINT32)
            val = cur.value(vtype)
            if key in metadata:
                raise GGUFError(f"{path}: duplicate metadata key {key!r}")
            metadata[key] = val
        if is_first:
            self.metadata = metadata
            align = metadata.get(Keys.General.ALIGNMENT, GGUF_DEFAULT_ALIGNMENT)
            align = int(align)
            if align == 0 or (align & (align - 1)) != 0:
                raise GGUFError(f"{path}: alignment {align} is not a power of 2")
            self.alignment = align

        infos: list[TensorInfo] = []
        for _ in range(n_tensors):
            name = cur.string()
            if name in self.tensors or any(t.name == name for t in infos):
                raise GGUFError(f"{path}: duplicate tensor {name!r}")
            n_dims = cur.scalar(GGUFValueType.UINT32)
            if n_dims > 4:
                raise GGUFError(f"{path}: tensor {name!r} has {n_dims} dims (max 4)")
            shape = tuple(cur.scalar(GGUFValueType.UINT64) for _ in range(n_dims))
            ttype = cur.scalar(GGUFValueType.UINT32)
            try:
                ttype = GGMLType(ttype)
            except ValueError:
                raise GGUFError(f"{path}: tensor {name!r} has unknown type {ttype}") from None
            offset = cur.scalar(GGUFValueType.UINT64)
            if offset % self.alignment != 0:
                raise GGUFError(f"{path}: tensor {name!r} offset {offset} unaligned")
            infos.append(TensorInfo(name, shape, ttype, offset, file_idx=file_idx))

        data_start = (cur.pos + self.alignment - 1) // self.alignment * self.alignment
        self._mmaps.append(mm)
        self._data_starts.append(data_start)

        for ti in infos:
            ti.nbytes = tensor_nbytes(ti.ggml_type, ti.shape)
            if data_start + ti.offset + ti.nbytes > len(mm):
                raise GGUFError(
                    f"{path}: tensor {ti.name!r} data out of bounds "
                    f"(offset {ti.offset} + {ti.nbytes} bytes)"
                )
            self.tensors[ti.name] = ti

    # -- access -------------------------------------------------------------

    def data(self, name: str) -> np.ndarray:
        """Raw bytes of a tensor as a zero-copy uint8 view."""
        ti = self.tensors[name]
        start = self._data_starts[ti.file_idx] + ti.offset
        return self._mmaps[ti.file_idx][start : start + ti.nbytes]

    def get(self, key: str, default=None):
        return self.metadata.get(key, default)

    @property
    def architecture(self) -> str:
        arch = self.get(Keys.General.ARCHITECTURE)
        if arch is None:
            raise GGUFError("file has no general.architecture key")
        return str(arch)

    def akey(self, template: str, default=None):
        """Look up an architecture-templated key like '{arch}.block_count'."""
        v = self.get(template.format(arch=self.architecture), default)
        if isinstance(v, np.generic):
            v = v.item()
        return v

    def close(self) -> None:
        self._mmaps.clear()

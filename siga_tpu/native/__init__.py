"""Native (C++) runtime components, loaded via ctypes.

Built on first use with g++ (no external build deps); the shared object is
cached next to the sources.  Falls back cleanly when a compiler is missing —
callers check `available()`.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsiga_native.so")
_SRC = [os.path.join(_DIR, "extractor.cpp")]

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    newest_src = max(os.path.getmtime(s) for s in _SRC)
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < newest_src:
        cmd = [
            "g++",
            "-O3",
            "-march=native",
            "-fopenmp",
            "-shared",
            "-fPIC",
            "-o",
            _SO,
        ] + _SRC
        subprocess.run(cmd, check=True, capture_output=True)
    return ctypes.CDLL(_SO)


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is None and not _tried:
            _tried = True
            try:
                lib = _build()
                lib.siga_extract_irreducible.restype = ctypes.c_int64
                _lib = lib
            except Exception:
                _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def _i64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


class NativeExtractor:
    """ctypes facade over siga_extract_irreducible."""

    def __init__(self, fmi, rfmi, threads: int = 0):
        self.lib = get_lib()
        assert self.lib is not None
        self.threads = threads

        def pack(index):
            off = np.zeros(6, dtype=np.int64)
            for c in range(5):
                off[c + 1] = off[c] + index.positions[c].size
            pos = np.concatenate(
                [p.astype(np.int64) for p in index.positions]
            ) if off[5] else np.zeros(1, dtype=np.int64)
            pred = index.pred.astype(np.int64)
            return np.ascontiguousarray(pos), off, np.ascontiguousarray(pred)

        self.fwd = pack(fmi)
        self.rev = pack(rfmi)

    def run(
        self, tasks: List[np.ndarray]
    ) -> Tuple[List[np.ndarray], np.ndarray]:
        """tasks: list of (n_blocks_i, 10) int64 arrays.

        Returns (per-task emitted (k_i, 10) arrays, failed flags)."""
        n_tasks = len(tasks)
        offsets = np.zeros(n_tasks + 1, dtype=np.int64)
        for i, t in enumerate(tasks):
            offsets[i + 1] = offsets[i] + len(t)
        total_in = int(offsets[-1])
        blocks = (
            np.concatenate(tasks).astype(np.int64)
            if total_in
            else np.zeros((0, 10), dtype=np.int64)
        )
        blocks = np.ascontiguousarray(blocks.reshape(-1))

        out_counts = np.zeros(n_tasks, dtype=np.int64)
        out_failed = np.zeros(n_tasks, dtype=np.uint8)
        cap = max(4 * total_in * 10, 1024)
        while True:
            out_blocks = np.empty(cap, dtype=np.int64)
            total = self.lib.siga_extract_irreducible(
                ctypes.c_int64(n_tasks),
                _i64(offsets),
                _i64(blocks),
                _i64(self.fwd[0]),
                _i64(self.fwd[1]),
                _i64(self.fwd[2]),
                _i64(self.rev[0]),
                _i64(self.rev[1]),
                _i64(self.rev[2]),
                ctypes.c_int64(cap),
                _i64(out_blocks),
                _i64(out_counts),
                out_failed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.c_int64(self.threads),
            )
            if total >= 0:
                break
            cap *= 4
        out = []
        off = 0
        for i in range(n_tasks):
            k = int(out_counts[i])
            out.append(out_blocks[off : off + k * 10].reshape(k, 10).copy())
            off += k * 10
        return out, out_failed

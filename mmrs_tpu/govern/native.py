"""ctypes bindings for the native governance core (native/govern_core.cpp).

Auto-builds the shared library on first use (g++; ~1s) and caches it next to
the source. Every entry point has a pure-Python/numpy fallback, so the
package works without a toolchain — the native path is the performance tier
for million-file galleries.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

from mmrs_tpu.utils.logging import get_logger

log = get_logger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    d = _native_dir()
    so = os.path.join(d, "libmmrs_govern.so")
    src = os.path.join(d, "govern_core.cpp")
    stale = (os.path.exists(so) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(so))
    if not os.path.exists(so) or stale:
        # rebuild on source edits too — a lingering .so would silently
        # keep running old native code
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(["sh", os.path.join(d, "build.sh")], check=True,
                           capture_output=True)
        except Exception as e:  # noqa: BLE001
            log.warning("native build failed, using numpy fallback: %r", e)
            if not os.path.exists(so):
                return None
    try:
        lib = ctypes.CDLL(so)
    except OSError as e:
        log.warning("native load failed: %r", e)
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.md5_buffer.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                               ctypes.c_char_p]
    lib.md5_files.argtypes = [ctypes.c_char_p, i64p, ctypes.c_int64,
                              u8p, u8p, ctypes.c_int]
    lib.md5_files.restype = ctypes.c_int64
    lib.hamming_first_match.argtypes = [u64p, ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int, i64p, ctypes.c_int]
    lib.hamming_first_match.restype = None
    lib.hamming_cross_any.argtypes = [u64p, u64p, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int, i64p, ctypes.c_int]
    lib.hamming_cross_any.restype = None
    _LIB = lib
    return lib


def md5_buffer(data: bytes) -> str:
    lib = load_library()
    if lib is None:
        import hashlib

        return hashlib.md5(data).hexdigest()
    out = ctypes.create_string_buffer(16)
    lib.md5_buffer(data, len(data), out)
    return out.raw.hex()


def md5_files(paths: Sequence[str], threads: int = 0
              ) -> Tuple[List[str], np.ndarray]:
    """Thread-pool MD5 of file contents. Returns (hex digests, ok mask);
    failed reads get an empty string."""
    lib = load_library()
    if lib is None:
        import hashlib

        hexes, ok = [], np.zeros(len(paths), bool)
        for i, p in enumerate(paths):
            try:
                with open(p, "rb") as f:
                    hexes.append(hashlib.md5(f.read()).hexdigest())
                ok[i] = True
            except OSError:
                hexes.append("")
        return hexes, ok

    # os.fsencode, not str.encode: non-UTF8 filenames arrive from
    # os.listdir as surrogate-escaped str and must round-trip to the
    # original bytes (str.encode raises and would abort the whole batch)
    encoded = [os.fsencode(p) for p in paths]
    blob = b"".join(e + b"\0" for e in encoded)
    offsets = np.zeros(len(paths), np.int64)
    pos = 0
    for i, e in enumerate(encoded):
        offsets[i] = pos
        pos += len(e) + 1
    out = np.zeros((len(paths), 16), np.uint8)
    ok = np.zeros(len(paths), np.uint8)
    lib.md5_files(
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        threads,
    )
    hexes = [out[i].tobytes().hex() if ok[i] else "" for i in range(len(paths))]
    return hexes, ok.astype(bool)


def hamming_first_match(
    hashes: np.ndarray,       # [H, N] uint64 (kind-major)
    threshold: int = 5,
    threads: int = 0,
) -> np.ndarray:
    """Keep-first duplicate scan: out[i] = first j < i with ANY kind within
    `threshold`, else -1. Native threaded early-exit scan, or a numpy
    block fallback."""
    hashes = np.ascontiguousarray(hashes, np.uint64)
    h, n = hashes.shape
    lib = load_library()
    if lib is not None:
        out = np.empty(n, np.int64)
        lib.hamming_first_match(
            hashes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            h, n, threshold,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            threads,
        )
        return out

    from mmrs_tpu.govern.hashing import packed_hamming

    out = np.full(n, -1, np.int64)
    block = 1024
    for i0 in range(0, n, block):
        i1 = min(i0 + block, n)
        dup = np.zeros((i1 - i0, i1), bool)
        for k in range(h):
            dup |= packed_hamming(hashes[k, i0:i1], hashes[k, :i1]) <= threshold
        for r in range(i1 - i0):
            i = i0 + r
            cand = np.nonzero(dup[r, :i])[0]
            if cand.size:
                out[i] = cand[0]
    return out


def hamming_cross_any(
    a: np.ndarray,            # [H, NA] uint64
    b: np.ndarray,            # [H, NB] uint64
    threshold: int = 0,
    threads: int = 0,
) -> np.ndarray:
    """out[i] = first row of b with ANY kind within threshold, else -1."""
    a = np.ascontiguousarray(a, np.uint64)
    b = np.ascontiguousarray(b, np.uint64)
    h, na = a.shape
    _, nb = b.shape
    lib = load_library()
    if lib is not None:
        out = np.empty(na, np.int64)
        lib.hamming_cross_any(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            h, na, nb, threshold,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            threads,
        )
        return out

    from mmrs_tpu.govern.hashing import packed_hamming

    out = np.full(na, -1, np.int64)
    hit = np.zeros((na, nb), bool)
    for k in range(h):
        hit |= packed_hamming(a[k], b[k]) <= threshold
    for i in range(na):
        cand = np.nonzero(hit[i])[0]
        if cand.size:
            out[i] = cand[0]
    return out

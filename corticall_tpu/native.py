"""ctypes binding for the C++ native core (native/corticall_native.cpp).

Builds the shared library on first use (g++ -O3) and caches it next to the
source; every consumer falls back to the numpy implementation when the
toolchain or the library is unavailable, so the native path is an accelerator,
never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO, "native", "corticall_native.cpp")
_SO = os.path.join(_REPO, "native", "corticall_native.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (os.path.exists(_SRC) and
                                   os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.ct_count_kmers.restype = ctypes.c_int64
    lib.ct_count_kmers.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.ct_free.argtypes = [ctypes.c_void_p]
    _f64 = ctypes.POINTER(ctypes.c_double)
    _i8 = ctypes.POINTER(ctypes.c_int8)
    lib.ct_gotoh_fill.restype = ctypes.c_int32
    lib.ct_gotoh_fill.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_int32, _f64, _i8, _i8, _i8,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def gotoh_fill_native(q: str, s: str, local: bool):
    """Native twin of models/sw.py::_gotoh.  Returns (H, None, None, tbH, tbE,
    tbF) — E/F matrices are rolling buffers inside the C++ fill (the traceback
    never reads them) — or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n, m = len(q), len(s)
    H = np.empty((n + 1, m + 1), dtype=np.float64)
    tbH = np.empty((n + 1, m + 1), dtype=np.int8)
    tbE = np.empty_like(tbH)
    tbF = np.empty_like(tbH)
    f64 = ctypes.POINTER(ctypes.c_double)
    i8 = ctypes.POINTER(ctypes.c_int8)
    lib.ct_gotoh_fill(
        q.encode(), n, s.encode(), m, int(local), H.ctypes.data_as(f64),
        tbH.ctypes.data_as(i8), tbE.ctypes.data_as(i8), tbF.ctypes.data_as(i8))
    return H, None, None, tbH, tbE, tbF


def count_kmers_native(sequences, k: int):
    """Native twin of build.count_kmers: returns (kmers uint32[N, W],
    coverage uint32[N], in_mask uint8[N], out_mask uint8[N]) or None when the
    native library is unavailable."""
    lib = get_lib()
    if lib is None or k > 64:
        return None
    from . import kmer as km

    seqs = list(sequences)
    blob = "".join(seqs).encode()
    offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])

    hi = ctypes.POINTER(ctypes.c_uint64)()
    lo = ctypes.POINTER(ctypes.c_uint64)()
    cov = ctypes.POINTER(ctypes.c_uint32)()
    im = ctypes.POINTER(ctypes.c_uint8)()
    om = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.ct_count_kmers(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(seqs), k,
        ctypes.byref(hi), ctypes.byref(lo), ctypes.byref(cov),
        ctypes.byref(im), ctypes.byref(om))
    if n < 0:
        return None
    def grab(ptr, ctype, dtype):
        # np.frombuffer over a ctypes view copies at memcpy speed;
        # np.ctypeslib.as_array(...).copy() goes through a ~150 MB/s
        # element-wise path
        if not n:
            return np.zeros(0, dtype)
        buf = (ctype * n).from_address(
            ctypes.cast(ptr, ctypes.c_void_p).value)
        return np.frombuffer(buf, dtype=dtype).copy()

    try:
        hi_a = grab(hi, ctypes.c_uint64, np.uint64)
        lo_a = grab(lo, ctypes.c_uint64, np.uint64)
        cov_a = grab(cov, ctypes.c_uint32, np.uint32)
        im_a = grab(im, ctypes.c_uint8, np.uint8)
        om_a = grab(om, ctypes.c_uint8, np.uint8)
    finally:
        for p in (hi, lo, cov, im, om):
            lib.ct_free(p)

    # (hi, lo) right-aligned 128-bit value -> uint32 words [N, W], filled
    # directly at the target width (no 4-wide scratch + strided recopy)
    w = km.words_per_kmer(k)
    cols = [(hi_a >> np.uint64(32)).astype(np.uint32),
            (hi_a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (lo_a >> np.uint64(32)).astype(np.uint32),
            (lo_a & np.uint64(0xFFFFFFFF)).astype(np.uint32)][4 - w:]
    kmers = np.empty((n, w), dtype=np.uint32)
    for i, c in enumerate(cols):
        kmers[:, i] = c
    return kmers, cov_a, im_a, om_a

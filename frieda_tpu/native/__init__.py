"""ctypes bindings for the native host runtime (frieda_native.cpp).

Builds the shared library on first import (g++, cached next to the source);
every entry point has a pure-Python fallback elsewhere in the package, so a
missing toolchain only costs host-side speed, never correctness.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "src" / "frieda_native.cpp"
_LIB = _DIR / "libfrieda_native.so"

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-std=c++17", str(_SRC), "-o", str(_LIB),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """The loaded CDLL, building if needed; None when unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    lib.frieda_raw_compress_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p]
    lib.frieda_blake2s256.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p]
    lib.frieda_channel_mix.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p]
    lib.frieda_grind.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.frieda_grind.restype = ctypes.c_uint64
    lib.frieda_bytes_to_felts.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p]
    lib.frieda_bytes_to_felts.restype = ctypes.c_uint64
    lib.frieda_bitrev_u32.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32]
    lib.frieda_hash_pair.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.frieda_verify_openings.argtypes = [
        ctypes.c_uint32, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_void_p]
    lib.frieda_verify_openings.restype = ctypes.c_int
    lib.frieda_verify_openings_batch.argtypes = [
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p]
    lib.frieda_verify_openings_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


# -- convenience wrappers (numpy in/out) -------------------------------------

def raw_compress_batch(msgs: np.ndarray) -> np.ndarray:
    """msgs (n, 16) uint32 -> (n, 8) uint32 zero-state compressions."""
    lib = get_lib()
    msgs = np.ascontiguousarray(msgs, np.uint32)
    out = np.empty((msgs.shape[0], 8), np.uint32)
    lib.frieda_raw_compress_batch(
        msgs.ctypes.data, msgs.shape[0], out.ctypes.data)
    return out


def blake2s256(data: bytes) -> bytes:
    lib = get_lib()
    out = np.empty(32, np.uint8)
    lib.frieda_blake2s256(data, len(data), out.ctypes.data)
    return out.tobytes()


def channel_mix(digest: bytes, payload: bytes) -> bytes:
    lib = get_lib()
    out = np.empty(32, np.uint8)
    lib.frieda_channel_mix(digest, payload, len(payload), out.ctypes.data)
    return out.tobytes()


def grind(digest: bytes, pow_bits: int) -> int:
    return int(get_lib().frieda_grind(digest, pow_bits))


def bytes_to_felts(data: bytes) -> np.ndarray:
    lib = get_lib()
    n_felts = (8 * len(data) + 29) // 30
    out = np.empty(n_felts, np.uint32)
    if n_felts:
        lib.frieda_bytes_to_felts(data, len(data), out.ctypes.data)
    return out


def bitrev_u32(arr: np.ndarray, log_n: int) -> np.ndarray:
    lib = get_lib()
    arr = np.ascontiguousarray(arr, np.uint32)
    out = np.empty_like(arr)
    lib.frieda_bitrev_u32(arr.ctypes.data, out.ctypes.data, log_n)
    return out


def hash_pair(left: bytes, right: bytes) -> bytes:
    lib = get_lib()
    out = np.empty(8, np.uint32)
    lib.frieda_hash_pair(left, right, out.ctypes.data)
    return out.tobytes()


def verify_openings_batch(log_n: int, seg: np.ndarray, idxs: np.ndarray,
                          rows: np.ndarray, wseg: np.ndarray,
                          wit_rows: np.ndarray):
    """Multi-opening walks over len(seg)-1 independent equal-depth trees in
    ONE native call. seg/wseg: (P+1,) uint64 row offsets into idxs/rows and
    wit_rows; idxs tree-local. Returns (ok (P,) bool, roots (P, 8) uint32)."""
    import ctypes as ct

    lib = get_lib()
    p = seg.shape[0] - 1
    seg = np.ascontiguousarray(seg, np.uint64)
    wseg = np.ascontiguousarray(wseg, np.uint64)
    idxs = np.ascontiguousarray(idxs, np.int64)
    rows = np.ascontiguousarray(rows, np.uint32)
    wit_rows = np.ascontiguousarray(wit_rows, np.uint32)
    roots = np.empty((p, 8), np.uint32)
    ok = np.zeros(p, np.uint8)
    lib.frieda_verify_openings_batch(
        log_n, p, seg.ctypes.data, idxs.ctypes.data, rows.ctypes.data,
        wseg.ctypes.data, wit_rows.ctypes.data, roots.ctypes.data,
        ok.ctypes.data)
    return ok.astype(bool), roots


def verify_openings(log_n: int, idxs: np.ndarray, rows: np.ndarray,
                    wit_rows: np.ndarray):
    """Full multi-opening walk in C. idxs (n,) int64 sorted unique; rows
    (n, 8) uint32; wit_rows (n_wit, 8) uint32. Returns (ok, root32, consumed)
    — ok only means the walk completed to node 0; callers compare root32 and
    consumed themselves (mirrors merkle.verify_openings_rows semantics)."""
    import ctypes as ct

    lib = get_lib()
    idxs = np.ascontiguousarray(idxs, np.int64)
    rows = np.ascontiguousarray(rows, np.uint32)
    wit_rows = np.ascontiguousarray(wit_rows, np.uint32)
    out = np.empty(8, np.uint32)
    consumed = ct.c_uint64(0)
    ok = lib.frieda_verify_openings(
        log_n, idxs.shape[0], idxs.ctypes.data, rows.ctypes.data,
        wit_rows.ctypes.data, wit_rows.shape[0], out.ctypes.data,
        ct.byref(consumed))
    return bool(ok), out.tobytes(), int(consumed.value)

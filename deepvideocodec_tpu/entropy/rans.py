"""Python bindings for the native rANS coder (ctypes over the C ABI).

The hot codec loop hands device-computed int32 symbols + CDF-row indexes to
these functions; bytes come back for the bitstream container. This is the
host side of the device/host split the reference also uses (neural nets on
the accelerator, arithmetic coding on the CPU —
/root/reference/dmc/models/video_model.py:238-253).
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..coder import get_library_path
from .cdf import CdfTable

_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(get_library_path())
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.dvc_rans_encode_with_indexes.restype = ctypes.c_int64
        lib.dvc_rans_encode_with_indexes.argtypes = [
            i32p, i32p, ctypes.c_int64,
            i32p, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, u8p, ctypes.c_int64,
        ]
        lib.dvc_rans_decode_with_indexes.restype = ctypes.c_int64
        lib.dvc_rans_decode_with_indexes.argtypes = [
            u8p, ctypes.c_int64, i32p, ctypes.c_int64,
            i32p, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, i32p,
        ]
        lib.dvc_rans_encode_with_indexes_tab.restype = ctypes.c_int64
        lib.dvc_rans_encode_with_indexes_tab.argtypes = [
            i32p, i32p, ctypes.c_int64,
            i32p, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, u8p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.dvc_rans_decode_with_indexes_lut.restype = ctypes.c_int64
        lib.dvc_rans_decode_with_indexes_lut.argtypes = [
            u8p, ctypes.c_int64, i32p, ctypes.c_int64,
            i32p, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, i32p, ctypes.c_void_p,
        ]
        lib.dvc_rans_lut_build.restype = ctypes.c_void_p
        lib.dvc_rans_lut_build.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64, i32p,
        ]
        lib.dvc_rans_lut_free.restype = None
        lib.dvc_rans_lut_free.argtypes = [ctypes.c_void_p]
        lib.dvc_pmf_to_quantized_cdf.restype = ctypes.c_int64
        lib.dvc_pmf_to_quantized_cdf.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_double, i32p,
        ]
        _lib = lib
    return _lib


def _i32(a):
    return np.ascontiguousarray(a, np.int32)


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def encode_with_indexes(
    values: np.ndarray, indexes: np.ndarray, table: CdfTable
) -> bytes:
    """Encode int values (one CDF row per value via indexes) to bytes."""
    lib = _load()
    values = _i32(values).ravel()
    indexes = _i32(indexes).ravel()
    if values.shape != indexes.shape:
        raise ValueError("values/indexes shape mismatch")
    n = values.size
    # worst case: every symbol escapes + 32-bit bypass; 16 bytes/sym is safe
    cap = 16 * n + 64
    out = np.empty(cap, np.uint8)
    nb = lib.dvc_rans_encode_with_indexes_tab(
        _ptr(values, ctypes.c_int32), _ptr(indexes, ctypes.c_int32), n,
        _ptr(table.quantized_cdf, ctypes.c_int32),
        table.quantized_cdf.shape[0], table.quantized_cdf.shape[1],
        _ptr(table.cdf_length, ctypes.c_int32),
        _ptr(table.offset, ctypes.c_int32),
        _ptr(out, ctypes.c_uint8), cap,
        _coder_tables(table).handle,
    )
    if nb < 0:
        raise RuntimeError("rANS encode buffer overflow")
    return out[:nb].tobytes()


def encode_with_indexes_reference(
    values: np.ndarray, indexes: np.ndarray, table: CdfTable
) -> bytes:
    """Buffered/division encoder (no tables) — the equivalence oracle for
    the fast path; kept for tests."""
    lib = _load()
    values = _i32(values).ravel()
    indexes = _i32(indexes).ravel()
    n = values.size
    cap = 16 * n + 64
    out = np.empty(cap, np.uint8)
    nb = lib.dvc_rans_encode_with_indexes(
        _ptr(values, ctypes.c_int32), _ptr(indexes, ctypes.c_int32), n,
        _ptr(table.quantized_cdf, ctypes.c_int32),
        table.quantized_cdf.shape[0], table.quantized_cdf.shape[1],
        _ptr(table.cdf_length, ctypes.c_int32),
        _ptr(table.offset, ctypes.c_int32),
        _ptr(out, ctypes.c_uint8), cap,
    )
    if nb < 0:
        raise RuntimeError("rANS encode buffer overflow")
    return out[:nb].tobytes()


class _CoderTables:
    """Owns the native acceleration tables for one CdfTable: the coarse
    cum->symbol decode buckets (one load + short refine instead of a
    binary search) and the per-symbol reciprocal encoder entries
    (division-free single-pass encode). Built lazily on first use.
    """

    def __init__(self, table: CdfTable):
        lib = _load()
        self._free = lib.dvc_rans_lut_free  # bound before any raise
        self.handle = lib.dvc_rans_lut_build(
            _ptr(table.quantized_cdf, ctypes.c_int32),
            table.quantized_cdf.shape[0], table.quantized_cdf.shape[1],
            _ptr(table.cdf_length, ctypes.c_int32),
        )

    def __del__(self):  # pragma: no cover - interpreter teardown timing
        try:
            if self.handle:
                self._free(self.handle)
        except Exception:
            pass


def _coder_tables(table: CdfTable):
    t = getattr(table, "_coder_tables", None)
    if t is None:
        t = _CoderTables(table)
        object.__setattr__(table, "_coder_tables", t)
    return t


def decode_with_indexes(
    data: bytes, indexes: np.ndarray, table: CdfTable
) -> np.ndarray:
    """Decode len(indexes) int32 values from bytes."""
    lib = _load()
    indexes = _i32(indexes)
    shape = indexes.shape
    flat = indexes.ravel()
    n = flat.size
    buf = np.frombuffer(data, np.uint8)
    if buf.size == 0:
        buf = np.zeros(4, np.uint8)
    buf = np.ascontiguousarray(buf)
    out = np.empty(n, np.int32)
    rc = lib.dvc_rans_decode_with_indexes_lut(
        _ptr(buf, ctypes.c_uint8), buf.size,
        _ptr(flat, ctypes.c_int32), n,
        _ptr(table.quantized_cdf, ctypes.c_int32),
        table.quantized_cdf.shape[0], table.quantized_cdf.shape[1],
        _ptr(table.cdf_length, ctypes.c_int32),
        _ptr(table.offset, ctypes.c_int32),
        _ptr(out, ctypes.c_int32),
        _coder_tables(table).handle,
    )
    if rc != 0:
        raise RuntimeError("rANS decode failed")
    return out.reshape(shape)


def pmf_to_quantized_cdf_native(
    pmf: np.ndarray, tail_mass: float
) -> np.ndarray:
    """Native pmf -> quantized CDF (same contract as entropy.cdf version)."""
    lib = _load()
    pmf = np.ascontiguousarray(pmf, np.float64)
    out = np.empty(pmf.size + 2, np.int32)
    rc = lib.dvc_pmf_to_quantized_cdf(
        _ptr(pmf, ctypes.c_double), pmf.size, float(tail_mass),
        _ptr(out, ctypes.c_int32),
    )
    if rc != 0:
        raise RuntimeError("pmf_to_quantized_cdf failed")
    return out

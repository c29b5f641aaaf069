"""ctypes binding for the native indel-correction core
(native/annotate_core.cpp).  Drop-in accelerated equivalent of
resquiggle.annotate's mark_repeat_indels + group_indels + annotate_read;
tests/test_native.py asserts bit-identical outputs vs the Python
specification."""

from __future__ import annotations

import ctypes
from typing import Dict, Optional, Tuple

import numpy as np

from nanomod_tpu.native.build import load_native

_sig_set = False


def _lib():
    global _sig_set
    lib = load_native("annotate_core")
    if lib is not None and not _sig_set:
        lib.annotate_core.restype = ctypes.c_int
        lib.annotate_core.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ]
        _sig_set = True
    return lib


def native_annotate_bytes(ref_u8: np.ndarray, read_u8: np.ndarray,
                          ev_start: np.ndarray, ev_length: np.ndarray,
                          strand: str, raw: np.ndarray,
                          min_num_signal: int, resegment_signal_wind: int,
                          more_signal_perc: float):
    """Array-in/array-out native correction core (zero string building).

    ref_u8/read_u8 are ASCII uint8 column arrays; read_u8 is MUTATED in
    place ('~' repeat marking, ref myRefBaseSignalAnnotation.py:1207-1212)
    so it must be a writable contiguous array.  Returns
    (mean, std, start, length, valid, hist) arrays of length n_cols
    (hist: 32), or None when the native library is unavailable.
    """
    lib = _lib()
    if lib is None:
        return None
    n_cols = len(ref_u8)
    ref_c = np.ascontiguousarray(ref_u8, dtype=np.uint8)
    assert read_u8.flags["C_CONTIGUOUS"] and read_u8.flags["WRITEABLE"]
    ev_s = np.ascontiguousarray(ev_start, dtype=np.int64)
    ev_l = np.ascontiguousarray(ev_length, dtype=np.int64)
    raw_d = np.ascontiguousarray(raw, dtype=np.float64)

    out_mean = np.zeros(n_cols, np.float64)
    out_std = np.zeros(n_cols, np.float64)
    out_start = np.zeros(n_cols, np.int64)
    out_len = np.zeros(n_cols, np.int64)
    out_valid = np.zeros(n_cols, np.uint8)
    hist = np.zeros(32, np.int64)

    lib.annotate_core(
        ref_c.ctypes.data_as(ctypes.c_char_p),
        read_u8.ctypes.data_as(ctypes.c_char_p), n_cols,
        ev_s.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ev_l.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(ev_s), 0 if strand == "+" else 1,
        raw_d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(raw_d),
        min_num_signal, resegment_signal_wind, more_signal_perc,
        out_mean.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_std.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_start.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        hist.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out_mean, out_std, out_start, out_len, out_valid, hist


def native_annotate(refbase: np.ndarray, readbase: np.ndarray,
                    ev_start: np.ndarray, ev_length: np.ndarray,
                    strand: str, raw: np.ndarray,
                    min_num_signal: int, resegment_signal_wind: int,
                    more_signal_perc: float
                    ) -> Optional[Tuple[Dict[int, Tuple], Dict[int, int], np.ndarray]]:
    """Dict-API wrapper over native_annotate_bytes.

    Returns (annotate_info {col -> (None, mean, std, start, length)},
    signalnum histogram, mutated readbase array) or None when the native
    library is unavailable.  The event index slot of annotate_info is not
    produced natively (the writer does not use it).
    """
    read_u8 = np.ascontiguousarray(
        readbase.astype("S1").view(np.uint8))
    ref_u8 = refbase.astype("S1").view(np.uint8)
    res = native_annotate_bytes(
        ref_u8, read_u8, ev_start, ev_length, strand, raw,
        min_num_signal, resegment_signal_wind, more_signal_perc)
    if res is None:
        return None
    out_mean, out_std, out_start, out_len, out_valid, hist = res
    ann = {}
    for col in np.flatnonzero(out_valid):
        ann[int(col)] = (None, out_mean[col], out_std[col],
                         int(out_start[col]), int(out_len[col]))
    signalnum = {i: int(hist[i]) for i in range(32) if hist[i]}
    new_readbase = read_u8.view("S1").astype("<U1")
    return ann, signalnum, new_readbase

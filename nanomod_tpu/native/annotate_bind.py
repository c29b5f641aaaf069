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


def native_annotate(refbase: np.ndarray, readbase: np.ndarray,
                    ev_start: np.ndarray, ev_length: np.ndarray,
                    strand: str, raw: np.ndarray,
                    min_num_signal: int, resegment_signal_wind: int,
                    more_signal_perc: float
                    ) -> Optional[Tuple[Dict[int, Tuple], Dict[int, int], np.ndarray]]:
    """Run the full correction core natively.

    Returns (annotate_info {col -> (None, mean, std, start, length)},
    signalnum histogram, mutated readbase array) or None when the native
    library is unavailable.  The event index slot of annotate_info is not
    produced natively (the writer does not use it).
    """
    lib = _lib()
    if lib is None:
        return None
    n_cols = len(refbase)
    ref_b = "".join(refbase).encode()
    read_b = bytearray("".join(readbase).encode())
    ev_s = np.ascontiguousarray(ev_start, dtype=np.int64)
    ev_l = np.ascontiguousarray(ev_length, dtype=np.int64)
    raw_d = np.ascontiguousarray(raw, dtype=np.float64)

    out_mean = np.zeros(n_cols, np.float64)
    out_std = np.zeros(n_cols, np.float64)
    out_start = np.zeros(n_cols, np.int64)
    out_len = np.zeros(n_cols, np.int64)
    out_valid = np.zeros(n_cols, np.uint8)
    hist = np.zeros(32, np.int64)

    read_buf = (ctypes.c_char * len(read_b)).from_buffer(read_b)
    lib.annotate_core(
        ref_b, ctypes.cast(read_buf, ctypes.c_char_p), n_cols,
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

    ann = {}
    for col in np.flatnonzero(out_valid):
        ann[int(col)] = (None, out_mean[col], out_std[col],
                         int(out_start[col]), int(out_len[col]))
    signalnum = {i: int(hist[i]) for i in range(32) if hist[i]}
    new_readbase = np.frombuffer(bytes(read_b), dtype="S1").astype("<U1")
    return ann, signalnum, new_readbase

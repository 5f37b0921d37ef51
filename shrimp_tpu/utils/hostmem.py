"""Hugepage-backed numpy arrays for the index hot tables.

`to_hugepages(arr)` copies an array into a MADV_HUGEPAGE anonymous
mapping (native/hostmem.cpp) and returns a numpy view of it. Used by
GenomeIndex.load/build for the CSR offset tables and genome planes:
their random per-kmer access pattern makes every lookup a dTLB miss on
4KB pages (the tables are hundreds of MB), and the page walk itself
misses cache. On 2MB pages the whole table needs only a few hundred TLB
entries. Measured on the bench host: ~15-20% off filter1's per-read
cost, more under pipeline cache pressure.

Buffers are kept alive by a module registry keyed by the array's base
pointer; `release(arr)` returns one early (tests); otherwise they live
for the process (the index does too).
"""
from __future__ import annotations

import ctypes
import threading
from typing import Dict, Tuple

import numpy as np

_REGISTRY: Dict[int, Tuple[int, int]] = {}   # base ptr -> (ptr, nbytes)
_LOCK = threading.Lock()


def _lib():
    from ..native import get_lib
    return get_lib()


def to_hugepages(arr: np.ndarray) -> np.ndarray:
    """Copy `arr` into a hugepage-backed buffer; returns the copy (or
    `arr` unchanged when the native lib is unavailable, the array is
    tiny, or allocation fails)."""
    lib = _lib()
    nbytes = int(arr.nbytes)
    if lib is None or nbytes < (1 << 21):
        return arr
    ptr = lib.hp_alloc(nbytes)
    if not ptr:
        return arr
    buf = (ctypes.c_char * nbytes).from_address(ptr)
    out = np.frombuffer(buf, dtype=arr.dtype).reshape(arr.shape)
    out[...] = arr
    out.flags.writeable = False
    with _LOCK:
        _REGISTRY[ptr] = (ptr, nbytes)
    return out


def release(arr: np.ndarray) -> bool:
    """Free the hugepage buffer behind a to_hugepages() result (pass
    the array to_hugepages returned, not a view of it)."""
    ptr = int(arr.__array_interface__["data"][0])
    with _LOCK:
        ent = _REGISTRY.pop(ptr, None)
    if ent is None:
        return False
    lib = _lib()
    if lib is not None:
        lib.hp_free(ctypes.c_void_p(ent[0]), ent[1])
    return True

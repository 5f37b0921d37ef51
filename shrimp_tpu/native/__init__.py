"""Native host components, compiled on first use and cached.

The C++ sources implement the host-side hot loops (filter 1 candidate
generation); Python remains the orchestration layer and numpy the
readable fallback. Build uses plain g++ into a per-user cache directory;
interfaces are C ABI via ctypes (no pybind11 dependency).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE_DIR = os.environ.get(
    "SHRIMP_TPU_NATIVE_CACHE",
    os.path.expanduser("~/.cache/shrimp_tpu_native"))


def _build() -> Optional[str]:
    srcs = [os.path.join(_SRC_DIR, "filter1.cpp"),
            os.path.join(_SRC_DIR, "hostpipe.cpp"),
            os.path.join(_SRC_DIR, "pairedpipe.cpp"),
            os.path.join(_SRC_DIR, "cspost.cpp"),
            os.path.join(_SRC_DIR, "cspipe.cpp"),
            os.path.join(_SRC_DIR, "csrsort.cpp"),
            os.path.join(_SRC_DIR, "hostmem.cpp")]
    h = hashlib.sha256()
    h.update(b"g++ -O3 -march=native -ffp-contract=off")  # flags
    for src in srcs:
        with open(src, "rb") as f:
            h.update(f.read())
    digest = h.hexdigest()[:16]
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so = os.path.join(_CACHE_DIR, f"native_{digest}.so")
    if os.path.exists(so):
        return so
    tmp = so + f".tmp{os.getpid()}"
    # -ffp-contract=off: no FMA contraction, so double arithmetic
    # rounds exactly like Python/numpy (the MQV math compares
    # posterior ratios against 1.0 at ulp precision)
    cmd = ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
           "-fPIC", "-std=c++17"] + srcs + ["-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(tmp, so)
        return so
    except Exception as e:  # pragma: no cover
        print(f"shrimp_tpu: native build failed ({e}); "
              "falling back to numpy host path", file=sys.stderr)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        if os.environ.get("SHRIMP_TPU_NO_NATIVE"):
            _FAILED = True
            return None
        so = _build()
        if so is None:
            _FAILED = True
            return None
        _LIB = ctypes.CDLL(so)
        _LIB.filter1_batch.restype = ctypes.c_int64
        _LIB.pass1_select.restype = ctypes.c_int64
        _LIB.finalize_render.restype = ctypes.c_int64
        _LIB.sw_full_tb_host.restype = ctypes.c_int64
        _LIB.paired_finalize_render.restype = ctypes.c_int64
        _LIB.cs_post_fb_batch.restype = ctypes.c_int64
        _LIB.cs_finalize_render.restype = ctypes.c_int64
        _LIB.csr_counting_sort.restype = ctypes.c_int64
        _LIB.spaced_keys.restype = ctypes.c_int64
        _LIB.hp_alloc.restype = ctypes.c_void_p
        _LIB.hp_alloc.argtypes = [ctypes.c_int64]
        _LIB.hp_free.restype = ctypes.c_int32
        _LIB.hp_free.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    return _LIB

"""Native (C++) fused sampler for the host input pipeline.

Compiles ``sampler.cc`` on first import (g++ -O3, ~1s, cached by source
hash under ``~/.cache/odtpu-native``) and exposes it through ctypes —
no pybind11 in this environment. The kernel fuses virtual-canvas
compose + x-flip + cv2-compatible u8 INTER_LINEAR resize into a single
O(out_h*out_w) pass (see sampler.cc for the exact OpenCV fixed-point
contract), replacing the expand-canvas paste, crop-window copy, mirror
and cv2.resize of the reference pipeline
(/root/reference/lib/utils/augmentations.py:94,160-294,325-335).

The kernel is pure and reentrant; ctypes releases the GIL for the call,
so threaded loader workers scale on multi-core hosts. Degrades
gracefully: ``available`` stays False when no compiler is present, the
build fails, or ``ODTPU_NO_NATIVE_SAMPLER=1`` — callers keep the pure
numpy/cv2 path (bit-compatible, tests/test_native_sampler.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sampler.cc")

_lib = None
available = False


def _load():
    global _lib, available
    if os.environ.get("ODTPU_NO_NATIVE_SAMPLER", "").strip().lower() in (
            "1", "true", "yes"):
        return
    try:
        with open(_SRC, "rb") as f:
            src_hash = hashlib.sha256(f.read()).hexdigest()
        cache = os.environ.get(
            "ODTPU_NATIVE_CACHE",
            os.path.expanduser("~/.cache/odtpu-native"))
        os.makedirs(cache, exist_ok=True)
        # -march=native codegen is host-CPU-specific: key the cache on
        # (source, flags, cpu identity) so a shared cache dir across
        # heterogeneous hosts (the multihost setup) can't serve an .so
        # with unsupported ISA extensions (SIGILL in a loader worker)
        cpu_id = os.uname().machine
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(("flags", "Features")):
                        cpu_id += hashlib.sha256(
                            line.encode()).hexdigest()[:8]
                        break
        except OSError:
            pass
        so = None
        for flags in (["-O3", "-march=native"], ["-O2"]):
            tag = hashlib.sha256("|".join(
                [src_hash, " ".join(flags), cpu_id]).encode()
            ).hexdigest()[:16]
            cand = os.path.join(cache, "sampler-{}.so".format(tag))
            if os.path.exists(cand):
                so = cand
                break
            tmp = "{}.tmp.{}".format(cand, os.getpid())
            try:
                subprocess.run(
                    ["g++", *flags, "-shared", "-fPIC", "-o", tmp, _SRC],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp, cand)  # atomic vs concurrent builders
                so = cand
                break
            except (subprocess.CalledProcessError,
                    subprocess.TimeoutExpired):
                continue
        if so is None:
            return
        lib = ctypes.CDLL(so)
        fn = lib.odtpu_fused_sample_u8
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,   # src, h, w
            ctypes.c_int, ctypes.c_int,                    # top, left
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,  # rect
            ctypes.c_int,                                  # flip
            ctypes.c_void_p,                               # fill[3]
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,   # out, oh, ow
        ]
        _lib = lib
        available = True
    except Exception:
        _lib = None
        available = False


_load()


def fused_sample_u8(src, top, left, rect, flip, fill, out_hw):
    """Sample the virtual canvas: ``src`` (HxWx3 contiguous uint8 BGR)
    pasted at (top, left) on an infinite ``fill``-colored canvas; take
    window ``rect`` = (x1, y1, x2, y2) in canvas coords, x-flip when
    ``flip``, and bilinear-resize to ``out_hw`` = (out_h, out_w).
    Returns a fresh (out_h, out_w, 3) uint8 array."""
    if _lib is None:
        raise RuntimeError("native sampler unavailable")
    assert src.dtype == np.uint8 and src.ndim == 3 and src.shape[2] == 3
    assert src.flags.c_contiguous
    h, w, _ = src.shape
    out = np.empty((int(out_hw[0]), int(out_hw[1]), 3), np.uint8)
    fill = np.ascontiguousarray(np.asarray(fill, np.uint8))
    assert fill.size == 3
    rc = _lib.odtpu_fused_sample_u8(
        src.ctypes.data, h, w, int(top), int(left),
        int(rect[0]), int(rect[1]), int(rect[2]), int(rect[3]),
        int(bool(flip)), fill.ctypes.data,
        out.ctypes.data, out.shape[0], out.shape[1])
    if rc != 0:
        raise ValueError(
            "fused_sample_u8: degenerate window {} or output {}".format(
                rect, out_hw))
    return out

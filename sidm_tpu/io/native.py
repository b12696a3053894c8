"""ctypes bindings for the native Gadget I/O library (native/gadget_native.cc).

The native path reads/writes format-1 snapshots at memcpy speed for large N;
:mod:`sidm_tpu.io.gadget` transparently uses it when the shared library has
been built (``make -C native``) and falls back to pure Python otherwise.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for cand in (os.path.join(here, "native", "libgadget_native.so"),
                 os.path.join(here, "libgadget_native.so")):
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
            except OSError:
                continue
            lib.gadget_read_header.argtypes = [ctypes.c_char_p,
                                               ctypes.c_void_p]
            lib.gadget_read_header.restype = ctypes.c_int
            lib.gadget_read_body.argtypes = [ctypes.c_char_p] + \
                [ctypes.c_void_p] * 5
            lib.gadget_read_body.restype = ctypes.c_int
            lib.gadget_write.argtypes = [ctypes.c_char_p] + \
                [ctypes.c_void_p] * 8
            lib.gadget_write.restype = ctypes.c_int
            lib.morton_keys.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                        ctypes.c_void_p, ctypes.c_float,
                                        ctypes.c_void_p]
            lib.morton_keys.restype = None
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _find_lib() is not None


def build(quiet: bool = True) -> bool:
    """Compile the library in-tree (g++). Returns availability."""
    global _TRIED
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    rc = os.system(f"make -C {os.path.join(here, 'native')} "
                   f"{'> /dev/null 2>&1' if quiet else ''}")
    _TRIED = False
    return rc == 0 and available()


def read_snapshot_native(path: str):
    """Read one format-1 file. Returns (header_bytes, pos, vel, pid, mass, u)
    or None when the native library is unavailable or the read fails."""
    lib = _find_lib()
    if lib is None or not os.path.exists(path):
        return None
    hdr = np.zeros(256, np.uint8)
    if lib.gadget_read_header(path.encode(), hdr.ctypes.data):
        return None
    npart = np.frombuffer(hdr.tobytes()[:24], np.int32)
    n = int(npart.sum())
    ngas = int(npart[0])
    pos = np.empty((n, 3), np.float32)
    vel = np.empty((n, 3), np.float32)
    pid = np.empty(n, np.uint32)
    mass = np.empty(n, np.float32)
    u = np.zeros(max(ngas, 1), np.float32)
    rc = lib.gadget_read_body(path.encode(), pos.ctypes.data,
                              vel.ctypes.data, pid.ctypes.data,
                              mass.ctypes.data, u.ctypes.data)
    if rc:
        return None
    return hdr.tobytes(), pos, vel, pid, mass, (u[:ngas] if ngas else None)


def write_snapshot_native(path: str, header_bytes: bytes, pos, vel, pid,
                          mass, u=None, rho=None, hsml=None) -> bool:
    lib = _find_lib()
    if lib is None:
        return False
    hdr = np.frombuffer(header_bytes, np.uint8).copy()
    pos = np.ascontiguousarray(pos, np.float32)
    vel = np.ascontiguousarray(vel, np.float32)
    pid = np.ascontiguousarray(pid, np.uint32)
    mass = np.ascontiguousarray(mass, np.float32)

    def ptr(a):
        if a is None:
            return None
        a = np.ascontiguousarray(a, np.float32)
        return a.ctypes.data

    rc = lib.gadget_write(path.encode(), hdr.ctypes.data, pos.ctypes.data,
                          vel.ctypes.data, pid.ctypes.data, mass.ctypes.data,
                          ptr(u), ptr(rho), ptr(hsml))
    return rc == 0


def morton_keys_native(pos, origin, extent):
    lib = _find_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, np.float32)
    origin = np.ascontiguousarray(origin, np.float32)
    keys = np.empty(len(pos), np.uint32)
    lib.morton_keys(pos.ctypes.data, len(pos), origin.ctypes.data,
                    ctypes.c_float(float(extent)), keys.ctypes.data)
    return keys

"""ctypes loader for the C++ host-I/O accelerator (csrc/skanative.cpp).

Builds on demand with g++ if the shared object is missing; import fails
cleanly (callers fall back to pure Python) when no toolchain exists.
"""

import ctypes
import os
import subprocess

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "_skanative.so")
_SRC = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "csrc", "skanative.cpp")


def _build():
    subprocess.run(
        ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", "-o", _SO, _SRC],
        check=True,
        capture_output=True,
    )


if not os.path.exists(_SO):
    if not os.path.exists(_SRC):
        raise ImportError("skanative source not found")
    _build()

_lib = ctypes.CDLL(_SO)
_lib.ska_crc32c.restype = ctypes.c_uint32
_lib.ska_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
_lib.ska_snappy_uncompressed_length.restype = ctypes.c_longlong
_lib.ska_snappy_uncompressed_length.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
_lib.ska_snappy_uncompress.restype = ctypes.c_longlong
_lib.ska_snappy_uncompress.argtypes = [
    ctypes.c_char_p,
    ctypes.c_size_t,
    ctypes.c_char_p,
    ctypes.c_size_t,
]
_lib.ska_snappy_compress.restype = ctypes.c_longlong
_lib.ska_snappy_compress.argtypes = [
    ctypes.c_char_p,
    ctypes.c_size_t,
    ctypes.c_char_p,
    ctypes.c_size_t,
]


def crc32c(data: bytes) -> int:
    return _lib.ska_crc32c(bytes(data), len(data))


def snappy_uncompress(data: bytes) -> bytes:
    n = _lib.ska_snappy_uncompressed_length(data, len(data))
    if n < 0:
        raise ValueError("snappy: bad varint header")
    out = ctypes.create_string_buffer(n)
    got = _lib.ska_snappy_uncompress(data, len(data), out, n)
    if got != n:
        raise ValueError(f"snappy: corrupt block (got {got}, want {n})")
    return out.raw


def snappy_compress(data: bytes) -> bytes:
    cap = 32 + len(data) + len(data) // 6
    out = ctypes.create_string_buffer(cap)
    got = _lib.ska_snappy_compress(data, len(data), out, cap)
    if got < 0:
        raise ValueError("snappy: compress failed")
    return out.raw[:got]

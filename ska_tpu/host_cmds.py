"""Native host-mode command routing for `ska align` / `ska distance`.

These commands never dispatch device work; on the host path their wall
time was dominated by CPython + numpy startup (~0.3 s — more than the
whole single-core reference command, generic_modes.rs:22-50,136-189).
This module is imported by the CLI BEFORE any numpy-importing module and
calls the one-pass C++ engines in csrc/host_modes.cpp via ctypes; any
failure (odd .skf encoding, allocation, unknown flag) returns False and
the CLI falls through to the canonical python pipeline. Byte-identity of
both routes is pinned by tests/test_host_cmds.py.

Deliberately imports NOTHING beyond the stdlib: pulling ska_tpu.io.native
here would import numpy and give the startup time back.
"""

import ctypes
import os

_FILTER_MODE = {"no-filter": 0, "no-const": 1, "no-ambig": 2,
                "no-ambig-or-const": 3}

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    so = os.environ.get("SKA_NATIVE_SO") or os.path.join(
        os.path.dirname(__file__), "io", "_skanative.so"
    )
    lib = ctypes.CDLL(so)
    lib.ska_host_align.restype = ctypes.c_longlong
    lib.ska_host_align.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.ska_host_distance.restype = ctypes.c_longlong
    lib.ska_host_distance.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double, ctypes.c_int,
    ]
    _lib = lib
    return lib


def _eligible(args):
    """Native route only on the pinned host backend, single-process,
    unless disabled; device runs keep the accelerator pipeline."""
    if os.environ.get("SKA_PLATFORM") != "cpu":
        return False
    if os.environ.get("SKA_NATIVE_CMDS", "1") == "0":
        return False
    if os.environ.get("SKA_COORDINATOR"):
        return False  # pod-slice runs: only host 0 writes (cli._ostream)
    return True


def try_run(cmd, args) -> bool:
    """Returns True when the native engine fully handled the command."""
    if not _eligible(args):
        return False
    try:
        lib = _load()
    except OSError:
        return False
    out = (args.output or "-").encode()
    try:
        if cmd == "align":
            if len(args.input) != 1:
                return False  # implicit build from FASTA: python path
            mode = _FILTER_MODE.get(args.filter)
            if mode is None:
                return False
            rc = lib.ska_host_align(
                args.input[0].encode(), out, float(args.min_freq), mode,
                int(bool(args.filter_ambig_as_missing)),
                int(bool(args.ambig_mask)),
                int(bool(args.no_gap_only_sites)),
            )
            return rc == 0
        if cmd == "distance":
            rc = lib.ska_host_distance(
                args.skf_file.encode(), out, float(args.min_freq),
                int(not args.allow_ambiguous),
            )
            return rc == 0
    except Exception:  # noqa: BLE001 - any native hiccup: python route
        return False
    return False

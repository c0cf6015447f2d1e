"""Usage: python scripts/fuzz_skf_load.py [seed] [n_iters]

Corruption fuzz for the .skf load path (snappy framing + CBOR + array
assembly): random bit flips, truncations, splices and pure-random files
must raise clean python exceptions, never crash the native codecs.

Each corrupted file is ALSO fed to the all-native command loaders
(csrc/host_modes.cpp ska_host_align / ska_host_distance): they must
return nonzero (fall back) or succeed, never crash — and whenever the
python loader accepts the file, the native align output must byte-match
the python route on it (silent divergence on a luckily-valid mutation
is the dangerous case)."""
import ctypes, io, os, random, sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from ska_tpu.io import skf
from ska_tpu import api

_native = ctypes.CDLL(os.path.join(
    os.path.dirname(skf.__file__), "_skanative.so"))
_native.ska_host_align.restype = ctypes.c_longlong
_native.ska_host_align.argtypes = [
    ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double, ctypes.c_int,
    ctypes.c_int, ctypes.c_int, ctypes.c_int]
_native.ska_host_distance.restype = ctypes.c_longlong
_native.ska_host_distance.argtypes = [
    ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double, ctypes.c_int]
_native.ska_host_map.restype = ctypes.c_longlong
_native.ska_host_map.argtypes = [
    ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
    ctypes.c_int, ctypes.c_int, ctypes.c_int]
_REF_FA = b"/root/reference/tests/test_files_in/test_skalo_reference.fas"

src = "/root/reference/tests/test_files_in/test_skalo.skf"
raw = open(src, "rb").read()
rng = random.Random(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
n_ok = n_err = 0
for it in range(int(sys.argv[2]) if len(sys.argv) > 2 else 300):
    mode = rng.randrange(4)
    b = bytearray(raw)
    if mode == 0:  # bit flips
        for _ in range(rng.randrange(1, 8)):
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
    elif mode == 1:  # truncate
        b = b[: rng.randrange(len(b))]
    elif mode == 2:  # splice a random block
        i = rng.randrange(len(b))
        b[i : i + rng.randrange(64)] = os.urandom(rng.randrange(64))
    else:  # pure random with valid-ish header
        b = bytearray(raw[: rng.randrange(16)]) + bytearray(os.urandom(rng.randrange(4096)))
    p = f"/tmp/fuzz_corrupt_{os.getpid()}.skf"  # seed-reproducible under parallel runs
    open(p, "wb").write(bytes(b))
    arr = None
    try:
        arr = skf.load(p)
        n_ok += 1  # corruption happened to stay valid (e.g. flip in a name)
    except Exception:
        n_err += 1
    # native command loaders: crash-free always; on python-valid files
    # the native align must agree byte-for-byte with the python route
    out_n = p + ".out"
    rc_a = _native.ska_host_align(p.encode(), out_n.encode(), 0.9, 1, 0, 0, 0)
    _native.ska_host_distance(p.encode(), (p + ".d").encode(), 0.0, 1)
    # map additionally exercises the native split_kmers (uint/bignum)
    # decoder and the whole ref-scan/lookup/aln pipeline downstream of a
    # mutated-but-decodable file — crash-free is the contract
    _native.ska_host_map(_REF_FA, p.encode(), (p + ".m").encode(), 0, 0, 0)
    if arr is not None and rc_a == 0:
        fh = io.BytesIO()
        try:
            api.align(arr, fh)
        except Exception:
            pass  # python pipeline rejected post-load; nothing to compare
        else:
            assert open(out_n, "rb").read() == fh.getvalue(), \
                f"native align diverged on mutated-but-valid file (iter {it})"
print(f"DONE ok={n_ok} err={n_err} (no native crash)")

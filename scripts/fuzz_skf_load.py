"""Usage: python scripts/fuzz_skf_load.py [seed] [n_iters]

Corruption fuzz for the .skf load path (snappy framing + CBOR + array
assembly): random bit flips, truncations, splices and pure-random files
must raise clean python exceptions, never crash the native codecs."""
import os, random, sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from ska_tpu.io import skf

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
    try:
        skf.load(p)
        n_ok += 1  # corruption happened to stay valid (e.g. flip in a name)
    except Exception:
        n_err += 1
print(f"DONE ok={n_ok} err={n_err} (no native crash)")

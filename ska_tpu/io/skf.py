"""`.skf` persistence: CBOR + snappy framing, byte-compatible with the
reference's serde/ciborium/snap stack (merge_ska_array.rs:108-126,191-204).

Field order and inner ndarray layout ({"v":1,"dim":[r,c],"data":[...]})
match serde's output so files interoperate both ways. u128 keys (k > 31)
round-trip via CBOR positive bignums, as ciborium encodes them.
"""

import numpy as np

from ..array import SkaArray
from ..ops import npkeys as K
from . import cbor, snappy


def save(arr: SkaArray, path: str, add_suffix: bool = True):
    """add_suffix mirrors save_skf/delete (generic_modes.rs:270-283,200-204);
    `ska weed` saves to the exact path (generic_modes.rs:263-266)."""
    if add_suffix and not path.endswith(".skf"):
        path = path + ".skf"
    keys = np.asarray(arr.keys, dtype=np.uint64)
    if keys.ndim == 1:
        keys = keys[:, None]
    try:
        from . import native
    except Exception:  # noqa: BLE001 - no toolchain: python encoder below
        native = None
    if native is not None:
        # one-pass C encode+frame (csrc/host_modes.cpp), byte-identical
        # to the python path below — the 4x4Mb save measured 0.72 s in
        # python (CBOR walk + per-chunk compress calls), ~0.25 s native
        if native.skf_save(path, keys, arr.variants, arr.counts, arr.names,
                           arr.k, arr.rc, arr.ska_version):
            return path
    if keys.shape[1] == 1:
        kmers = cbor.UInts64(keys[:, 0])
    else:
        kmers = cbor.U128s(keys[:, 0], keys[:, 1])
    obj = {
        "k": arr.k,
        "rc": bool(arr.rc),
        "names": list(arr.names),
        "split_kmers": kmers,
        "variants": {
            "v": 1,
            "dim": [int(arr.ksize), int(arr.nsamples)],
            "data": cbor.UInts64(arr.variants.ravel()),
        },
        "variant_count": cbor.UInts64(np.asarray(arr.counts, dtype=np.uint64)),
        "ska_version": arr.ska_version,
        "k_bits": arr.kbits,
    }
    payload = cbor.dumps(obj)
    with open(path, "wb") as f:
        f.write(snappy.frame_compress(payload))
    return path


def load(path: str) -> SkaArray:
    with open(path, "rb") as f:
        raw = f.read()
    obj = cbor.loads(snappy.frame_decompress(raw))
    if not isinstance(obj, dict) or "split_kmers" not in obj:
        raise ValueError(f"Could not read input file: {path}")
    k = obj["k"]
    k_bits = obj.get("k_bits", 64)
    W = max(1, k_bits // 64)
    sk = obj["split_kmers"]
    if isinstance(sk, cbor.UIntArray):
        # .lo may be uint8 (byte-narrow bulk decode); keys are u64 limbs.
        # The decoder owns the buffer, so a dtype-matching view needs no copy.
        lo = sk.lo if sk.lo.dtype == np.uint64 else sk.lo.astype(np.uint64)
        if W == 1:
            keys = lo[:, None]
        else:
            hi = sk.hi if sk.hi.dtype == np.uint64 else sk.hi.astype(np.uint64)
            keys = np.stack([hi, lo], axis=-1)
    else:
        keys = K.from_python_ints(sk, W)
    v = obj["variants"]
    vdata = v["data"]
    if isinstance(vdata, cbor.UIntArray):
        vlo = vdata.lo
        if vlo.dtype != np.uint8:
            vlo = vlo.astype(np.uint8)
        variants = vlo.reshape(v["dim"][0], v["dim"][1])
    else:
        variants = np.array(vdata, dtype=np.uint8).reshape(v["dim"][0], v["dim"][1])
    vc = obj["variant_count"]
    if isinstance(vc, cbor.UIntArray):
        # counts are bounded by n_samples, so a u64 buffer reinterprets
        # as int64 zero-copy, and a byte-narrow (uint8) buffer is kept
        # as-is rather than 8x-widened — the widening astype measured
        # 0.5 s of fresh-page faults on a 4.4M-row load (every consumer
        # only compares/indexes/re-derives counts; SkaArray documents
        # the relaxed dtype)
        counts = (vc.lo.view(np.int64) if vc.lo.dtype == np.uint64
                  else vc.lo)
    else:
        counts = np.array(vc, dtype=np.int64)
    # Row order is preserved exactly as stored: the reference's alignment
    # output follows it (tests compare `ska align` after weed byte-exactly),
    # and lookups use a lazy sorted view instead (SkaArray.sorted_view).
    arr = SkaArray(
        k=k,
        rc=bool(obj["rc"]),
        names=[str(n) for n in obj["names"]],
        keys=keys,
        variants=variants,
        counts=counts,
        ska_version=str(obj.get("ska_version", "")),
    )
    return arr

"""`.skf` persistence: CBOR + snappy framing, byte-compatible with the
reference's serde/ciborium/snap stack (merge_ska_array.rs:108-126,191-204).

Field order and inner ndarray layout ({"v":1,"dim":[r,c],"data":[...]})
match serde's output so files interoperate both ways. u128 keys (k > 31)
round-trip via CBOR positive bignums, as ciborium encodes them.
"""

import numpy as np

from ..array import SkaArray
from ..ops import keys as K
from . import cbor, snappy


def save(arr: SkaArray, path: str, add_suffix: bool = True):
    """add_suffix mirrors save_skf/delete (generic_modes.rs:270-283,200-204);
    `ska weed` saves to the exact path (generic_modes.rs:263-266)."""
    if add_suffix and not path.endswith(".skf"):
        path = path + ".skf"
    obj = {
        "k": arr.k,
        "rc": bool(arr.rc),
        "names": list(arr.names),
        "split_kmers": K.to_python_ints(arr.keys),
        "variants": {
            "v": 1,
            "dim": [int(arr.ksize), int(arr.nsamples)],
            "data": [int(x) for x in arr.variants.ravel()],
        },
        "variant_count": [int(c) for c in arr.counts],
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
    keys = K.from_python_ints(obj["split_kmers"], W)
    v = obj["variants"]
    variants = np.array(v["data"], dtype=np.uint8).reshape(v["dim"][0], v["dim"][1])
    counts = np.array(obj["variant_count"], dtype=np.int64)
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

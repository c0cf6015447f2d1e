"""Minimal CBOR (RFC 8949) codec.

Only the subset needed for `.skf` files is implemented — the reference
serializes its array struct with ciborium (merge_ska_array.rs:191-204):
definite-length maps/arrays, text keys, unsigned integers (minimal-length),
booleans, and positive bignums (tag 2) which ciborium uses for u128 split
k-mer keys that exceed u64.

Encoding follows ciborium's conventions so files we write are readable by
the reference binary (and byte-compatible for identical content).
"""

import struct

import numpy as np

try:
    from . import native as _native
except Exception:  # no toolchain: pure-python paths below
    _native = None

_FAST_DECODE_MIN = 64  # bulk-decode arrays at least this long


class UInts64:
    """Marker for encoding: a numpy array serialized as a CBOR array of
    unsigned ints (bulk C++ path). uint8 input is kept narrow — the
    encoder emits identical bytes from it without an 8x staging copy."""

    __slots__ = ("v",)

    def __init__(self, v):
        v = np.asarray(v)
        if v.dtype == np.uint8:
            self.v = np.ascontiguousarray(v)
        else:
            self.v = np.ascontiguousarray(v, dtype=np.uint64)


class U128s:
    """Marker for encoding: (hi, lo) uint64 limb arrays serialized as a
    CBOR array of uints / tag-2 bignums (ciborium's u128 convention)."""

    __slots__ = ("hi", "lo")

    def __init__(self, hi, lo):
        self.hi = np.ascontiguousarray(hi, dtype=np.uint64)
        self.lo = np.ascontiguousarray(lo, dtype=np.uint64)


class UIntArray:
    """Bulk-decoded CBOR array of unsigned ints, as (hi, lo) uint64 limbs.

    hi is materialized lazily: the bulk decoder returns None for it when
    every value fit u64 (halving the pages touched), and the zeros appear
    only if a consumer actually asks for the high limbs."""

    __slots__ = ("_hi", "lo")

    def __init__(self, hi, lo):
        self._hi = hi
        self.lo = lo

    @property
    def hi(self):
        if self._hi is None:
            self._hi = np.zeros_like(self.lo)
        return self._hi

    def __len__(self):
        return len(self.lo)

    def tolist(self):
        if self._hi is None or not self._hi.any():
            return self.lo.tolist()
        return [(int(h) << 64) | int(l) for h, l in zip(self._hi, self.lo)]


# ---- decoding ----------------------------------------------------------------


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf):
        self.buf = buf
        self.pos = 0

    def take(self, n):
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("CBOR: truncated input")
        self.pos += n
        return b

    def byte(self):
        b = self.buf[self.pos]
        self.pos += 1
        return b


class Tagged:
    """A CBOR tagged value (tag 2 = positive bignum is decoded inline)."""

    __slots__ = ("tag", "value")

    def __init__(self, tag, value):
        self.tag = tag
        self.value = value


def _read_uint(r, info):
    if info < 24:
        return info
    if info == 24:
        return r.byte()
    if info == 25:
        return struct.unpack(">H", r.take(2))[0]
    if info == 26:
        return struct.unpack(">I", r.take(4))[0]
    if info == 27:
        return struct.unpack(">Q", r.take(8))[0]
    raise ValueError(f"CBOR: unsupported additional info {info}")


def _decode(r):
    ib = r.byte()
    major, info = ib >> 5, ib & 0x1F
    if major == 0:
        return _read_uint(r, info)
    if major == 1:
        return -1 - _read_uint(r, info)
    if major == 2:
        return bytes(r.take(_read_uint(r, info)))
    if major == 3:
        return bytes(r.take(_read_uint(r, info))).decode("utf-8")
    if major == 4:
        n = _read_uint(r, info)
        if _native is not None and n >= _FAST_DECODE_MIN:
            # byte-narrow first: arrays whose values all fit u8 (the big
            # variant matrix) decode straight to uint8 — 1/8th the output
            # pages. A failed attempt stops at the first wide value and we
            # redo via the u64 path; peeking the first head byte skips the
            # attempt (and its n-byte allocation) for key-sized arrays.
            if r.buf[r.pos] <= 0x18:
                cnt8, consumed8, out8 = _native.cbor_decode_u8(r.buf, r.pos, n)
                if cnt8 == n:
                    r.pos += consumed8
                    return UIntArray(None, out8)
            cnt, consumed, hi, lo = _native.cbor_decode_uints(r.buf, r.pos, n)
            if cnt == n:
                r.pos += consumed
                return UIntArray(hi, lo)
            if cnt:  # mixed content: bulk prefix + element-wise tail
                r.pos += consumed
                head = UIntArray(hi, lo).tolist()
                return head + [_decode(r) for _ in range(n - cnt)]
        return [_decode(r) for _ in range(n)]
    if major == 5:
        n = _read_uint(r, info)
        return {_decode(r): _decode(r) for _ in range(n)}
    if major == 6:
        tag = _read_uint(r, info)
        val = _decode(r)
        if tag == 2:  # positive bignum
            return int.from_bytes(val, "big")
        if tag == 3:  # negative bignum
            return -1 - int.from_bytes(val, "big")
        return Tagged(tag, val)
    if major == 7:
        if info == 20:
            return False
        if info == 21:
            return True
        if info == 22:
            return None
        if info == 26:
            return struct.unpack(">f", r.take(4))[0]
        if info == 27:
            return struct.unpack(">d", r.take(8))[0]
        raise ValueError(f"CBOR: unsupported simple value {info}")
    raise ValueError("CBOR: unreachable")


def loads(buf):
    r = _Reader(memoryview(buf))
    val = _decode(r)
    return val


# ---- encoding ----------------------------------------------------------------


def _head(out, major, n):
    if n < 24:
        out.append((major << 5) | n)
    elif n < 0x100:
        out.append((major << 5) | 24)
        out.append(n)
    elif n < 0x10000:
        out.append((major << 5) | 25)
        out += struct.pack(">H", n)
    elif n < 0x100000000:
        out.append((major << 5) | 26)
        out += struct.pack(">I", n)
    else:
        out.append((major << 5) | 27)
        out += struct.pack(">Q", n)


def _encode(out, val):
    if val is True:
        out.append(0xF5)
    elif val is False:
        out.append(0xF4)
    elif val is None:
        out.append(0xF6)
    elif isinstance(val, int):
        if val >= 0:
            if val > 0xFFFFFFFFFFFFFFFF:
                # positive bignum, tag 2 (ciborium's u128 encoding)
                out.append(0xC2)
                b = val.to_bytes((val.bit_length() + 7) // 8, "big")
                _head(out, 2, len(b))
                out += b
            else:
                _head(out, 0, val)
        else:
            _head(out, 1, -1 - val)
    elif isinstance(val, str):
        b = val.encode("utf-8")
        _head(out, 3, len(b))
        out += b
    elif isinstance(val, (bytes, bytearray, memoryview)):
        _head(out, 2, len(val))
        out += val
    elif isinstance(val, UInts64):
        _head(out, 4, len(val.v))
        if _native is not None:
            out += _native.cbor_encode_uints(val.v)
        else:
            for v in val.v.tolist():
                _encode(out, v)
    elif isinstance(val, U128s):
        _head(out, 4, len(val.lo))
        if _native is not None:
            out += _native.cbor_encode_u128(val.hi, val.lo)
        else:
            for h, l in zip(val.hi.tolist(), val.lo.tolist()):
                _encode(out, (h << 64) | l)
    elif isinstance(val, (list, tuple)):
        _head(out, 4, len(val))
        for v in val:
            _encode(out, v)
    elif isinstance(val, dict):
        _head(out, 5, len(val))
        for k, v in val.items():
            _encode(out, k)
            _encode(out, v)
    elif isinstance(val, float):
        out.append(0xFB)
        out += struct.pack(">d", val)
    else:
        raise TypeError(f"CBOR: cannot encode {type(val)}")


def dumps(val):
    out = bytearray()
    _encode(out, val)
    return bytes(out)

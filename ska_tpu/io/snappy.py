"""Snappy framing-format codec (pure Python, C++-accelerated when built).

The reference persists `.skf` with snap's FrameEncoder
(merge_ska_array.rs:191-204), so we implement the snappy framing format
(https://github.com/google/snappy/blob/main/framing_format.txt) and the
snappy block format for decompression. Compression emits compressed
chunks via a greedy hash-table matcher (C++ extension `_skanative` when
available) or uncompressed chunks (still valid framing) in pure Python.
"""

import struct

_MAGIC = b"\xff\x06\x00\x00sNaPpY"
_MAX_CHUNK = 65536

try:
    from . import native as _native
except Exception:  # pragma: no cover - native build optional
    _native = None

# ---- CRC-32C (Castagnoli), masked per framing spec ----------------------------

_CRC_TABLE = None


def _crc_table():
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            tbl.append(c)
        _CRC_TABLE = tbl
    return _CRC_TABLE


def crc32c(data):
    if _native is not None:
        return _native.crc32c(data)
    tbl = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data):
    c = crc32c(data)
    return ((c >> 15) | (c << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# ---- snappy block format -------------------------------------------------------


def _read_varint(buf, pos):
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _write_varint(n):
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def decompress_block(buf):
    """Decompress a raw snappy block."""
    if _native is not None:
        return _native.snappy_uncompress(bytes(buf))
    n, pos = _read_varint(buf, 0)
    out = bytearray(n)
    opos = 0
    blen = len(buf)
    while pos < blen:
        tag = buf[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                ln = int.from_bytes(buf[pos : pos + nb], "little")
                pos += nb
            ln += 1
            out[opos : opos + ln] = buf[pos : pos + ln]
            pos += ln
            opos += ln
        else:
            if kind == 1:
                ln = ((tag >> 2) & 0x7) + 4
                off = ((tag >> 5) << 8) | buf[pos]
                pos += 1
            elif kind == 2:
                ln = (tag >> 2) + 1
                off = int.from_bytes(buf[pos : pos + 2], "little")
                pos += 2
            else:
                ln = (tag >> 2) + 1
                off = int.from_bytes(buf[pos : pos + 4], "little")
                pos += 4
            src = opos - off
            if off >= ln:  # non-overlapping fast path
                out[opos : opos + ln] = out[src : src + ln]
                opos += ln
            else:
                for _ in range(ln):
                    out[opos] = out[src]
                    opos += 1
                    src += 1
    return bytes(out[:opos])


def compress_block(data):
    """Compress a raw snappy block (greedy match in C++, literal-only in Python)."""
    if _native is not None:
        return _native.snappy_compress(bytes(data))
    out = bytearray(_write_varint(len(data)))
    pos = 0
    while pos < len(data):
        ln = min(len(data) - pos, 0x10000)
        lm1 = ln - 1
        if lm1 < 60:
            out.append(lm1 << 2)
        elif lm1 < 0x100:
            out.append(60 << 2)
            out.append(lm1)
        else:
            out.append(61 << 2)
            out += struct.pack("<H", lm1)
        out += data[pos : pos + ln]
        pos += ln
    return bytes(out)


# ---- framing format -------------------------------------------------------------


def _check_crc(stored, data):
    """Verify a chunk's masked CRC-32C over its uncompressed bytes
    (framing_format.txt §3; the reference's snap crate checks this and
    fails the .skf load on mismatch)."""
    want = int.from_bytes(bytes(stored), "little")
    got = _masked_crc(bytes(data))
    if want != got:
        raise ValueError(
            "snappy: corrupt chunk (stored checksum mismatch) - "
            "could not parse skf file"
        )


def frame_decompress(buf):
    buf = memoryview(bytes(buf))
    if bytes(buf[:10]) != _MAGIC:
        raise ValueError("not a snappy framed stream")
    if _native is not None:
        # whole-frame native decode: one sizing pass + one CRC-checked
        # decompress pass into a single buffer (the python loop below
        # paid ~0.3-0.5 s of per-chunk interpreter overhead on a dense
        # 4-sample .skf). None = malformed somewhere: fall through so
        # the python loop raises its precise error for that chunk.
        out = _native.snappy_frame_decompress(bytes(buf))
        if out is not None:
            return out
    pos = 10
    out = bytearray()
    n = len(buf)
    while pos < n:
        ctype = buf[pos]
        clen = int.from_bytes(buf[pos + 1 : pos + 4], "little")
        chunk = buf[pos + 4 : pos + 4 + clen]
        pos += 4 + clen
        if ctype == 0x00:  # compressed data
            data = decompress_block(chunk[4:])
            _check_crc(chunk[:4], data)
            out += data
        elif ctype == 0x01:  # uncompressed data
            data = chunk[4:]
            _check_crc(chunk[:4], data)
            out += data
        elif ctype == 0xFF:  # stream identifier (repeat)
            continue
        elif 0x80 <= ctype <= 0xFD:  # skippable
            continue
        else:
            raise ValueError(f"snappy: unskippable chunk type {ctype:#x}")
    return bytes(out)


def frame_compress(data):
    data = memoryview(bytes(data))
    out = bytearray(_MAGIC)
    for pos in range(0, len(data), _MAX_CHUNK):
        chunk = bytes(data[pos : pos + _MAX_CHUNK])
        crc = struct.pack("<I", _masked_crc(chunk))
        comp = compress_block(chunk)
        if len(comp) < len(chunk):
            body = crc + comp
            out.append(0x00)
        else:
            body = crc + chunk
            out.append(0x01)
        out += len(body).to_bytes(3, "little")
        out += body
    return bytes(out)

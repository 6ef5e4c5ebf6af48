"""Pure-Python snappy and LZ4 block codecs for the Kafka wire client
(r10) — stdlib-only, from the PUBLIC format specifications:

- snappy: google/snappy format_description.txt (varint preamble +
  literal/copy tag stream), plus the xerial stream framing
  (``\\x82SNAPPY\\x00`` header + length-prefixed raw blocks) that
  java producers wrap around older message formats.
- LZ4: lz4_Frame_format.md + lz4_Block_format.md (frame magic/FLG/BD +
  xxHash32 header checksum; token/literals/offset/matchlen sequences).
- xxHash32: the public xxHash specification (needed for the LZ4 frame
  header checksum byte).

The encoders exist so MiniKafkaBroker can SERVE snappy/lz4 topics in
tests; they do real greedy matching (hash table over 4-byte prefixes),
so round-trips exercise the copy/match paths, not just literals.
Decode throughput is not the point — a real cluster consumes such
topics through the Spark Kafka connector (librdkafka-equivalent,
parity /root/reference/extensions/kafka/ConsumeKafka.cpp:370); this
removes the named-error gap for in-container wire consumption.

zstd lives in its own module (zstd_codec.py, r13): a pure-Python
RFC 8878 codec — FSE and Huffman entropy stages included — since this
container has no zstd lib and Python 3.11 predates stdlib
``compression.zstd``.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# xxHash32 (public spec) — LZ4 frame header checksum
# ---------------------------------------------------------------------------

_P1, _P2, _P3, _P4, _P5 = 2654435761, 2246822519, 3266489917, 668265263, 374761393
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed
        v4 = (seed - _P1) & _M32
        while pos + 16 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                (lane,) = struct.unpack_from("<I", data, pos + 4 * i)
                v = (v + lane * _P2) & _M32
                v = (_rotl32(v, 13) * _P1) & _M32
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            pos += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        h = (h + lane * _P3) & _M32
        h = (_rotl32(h, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        h = (h + data[pos] * _P5) & _M32
        h = (_rotl32(h, 11) * _P1) & _M32
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# ---------------------------------------------------------------------------
# snappy (raw block format + xerial stream framing)
# ---------------------------------------------------------------------------


def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    n = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("snappy: truncated length varint")
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: length varint too long")


def _write_uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | 0x80 if n else b)
        if not n:
            return bytes(out)


_XERIAL_HEADER = b"\x82SNAPPY\x00"


def snappy_decompress(buf: bytes) -> bytes:
    """Raw snappy block, auto-detecting the xerial stream framing
    (``\\x82SNAPPY\\x00`` + version/compat words + [4-byte BE block
    length, raw block]*) that java Kafka producers historically used."""
    if buf.startswith(_XERIAL_HEADER):
        out = bytearray()
        pos = len(_XERIAL_HEADER) + 8  # skip version + compat words
        while pos < len(buf):
            if pos + 4 > len(buf):
                raise ValueError("snappy: truncated xerial block length")
            (blen,) = struct.unpack_from(">I", buf, pos)
            pos += 4
            out += _snappy_raw_decompress(buf[pos : pos + blen])
            pos += blen
        return bytes(out)
    return _snappy_raw_decompress(buf)


def _snappy_raw_decompress(buf: bytes) -> bytes:
    # IndexError/struct.error from truncated tag tails must surface as
    # the typed decode error, matching every other malformed-input path
    # (hypothesis-locked in tests/test_fuzz_codecs.py)
    try:
        return _snappy_raw_decompress_inner(buf)
    except (IndexError, struct.error) as e:
        raise ValueError(f"snappy: truncated tag stream: {e}") from e


def _snappy_raw_decompress_inner(buf: bytes) -> bytes:
    total, pos = _uvarint(buf, 0)
    out = bytearray()
    while pos < len(buf):
        tag = buf[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nbytes = ln - 59
                ln = int.from_bytes(buf[pos : pos + nbytes], "little")
                pos += nbytes
            ln += 1
            if pos + ln > len(buf):
                raise ValueError("snappy: literal overruns input")
            out += buf[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset tail: len 4-11, offset 11 bits
            ln = ((tag >> 2) & 0x07) + 4
            off = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte little-endian offset
            ln = (tag >> 2) + 1
            (off,) = struct.unpack_from("<H", buf, pos)
            pos += 2
        else:  # copy, 4-byte little-endian offset
            ln = (tag >> 2) + 1
            (off,) = struct.unpack_from("<I", buf, pos)
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: copy offset out of range")
        start = len(out) - off
        if off >= ln:
            out += out[start : start + ln]  # non-overlap: one slice copy
        else:
            # overlapping copies are the RLE idiom: byte-wise when the
            # match length exceeds the back-reference distance
            for i in range(ln):
                out.append(out[start + i])
    if len(out) != total:
        raise ValueError(f"snappy: expected {total} bytes, produced {len(out)}")
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Greedy raw-block compressor: hash table over 4-byte prefixes,
    2-byte-offset copies (the common emitted form), literal runs for
    everything else. Valid per format_description.txt; optimal ratio is
    a non-goal (fixture/broker path)."""
    out = bytearray(_write_uvarint(len(data)))
    n = len(data)
    table: dict[bytes, int] = {}
    lit_start = 0
    pos = 0

    def flush_literals(upto: int) -> None:
        nonlocal lit_start
        while lit_start < upto:
            run = min(upto - lit_start, 0x10000)
            if run <= 60:
                out.append((run - 1) << 2)
            elif run <= 0x100:
                out.append(60 << 2)
                out.append(run - 1)
            else:
                out.append(61 << 2)
                out.extend(struct.pack("<H", run - 1))
            out.extend(data[lit_start : lit_start + run])
            lit_start += run

    while pos + 4 <= n:
        key = data[pos : pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is not None and pos - cand <= 0xFFFF:
            # extend the match forward
            ln = 4
            while pos + ln < n and ln < 64 and data[cand + ln] == data[pos + ln]:
                ln += 1
            flush_literals(pos)
            out.append(((ln - 1) << 2) | 0x02)
            out += struct.pack("<H", pos - cand)
            pos += ln
            lit_start = pos
        else:
            pos += 1
    flush_literals(n)
    return bytes(out)


# ---------------------------------------------------------------------------
# LZ4 (block format inside the frame format)
# ---------------------------------------------------------------------------

_LZ4_MAGIC = 0x184D2204


def _lz4_block_decompress(buf: bytes, out: bytearray) -> None:
    try:
        _lz4_block_decompress_inner(buf, out)
    except (IndexError, struct.error) as e:
        raise ValueError(f"lz4: truncated block: {e}") from e


def _lz4_block_decompress_inner(buf: bytes, out: bytearray) -> None:
    pos = 0
    n = len(buf)
    while pos < n:
        token = buf[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = buf[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise ValueError("lz4: literal run overruns block")
        out += buf[pos : pos + lit]
        pos += lit
        if pos >= n:
            return  # last sequence: literals only, no offset/matchlen
        (off,) = struct.unpack_from("<H", buf, pos)
        pos += 2
        if off == 0 or off > len(out):
            raise ValueError("lz4: match offset out of range")
        mlen = token & 0x0F
        if mlen == 15:
            while True:
                b = buf[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        start = len(out) - off
        if off >= mlen:
            out += out[start : start + mlen]  # non-overlap: one slice copy
        else:
            for i in range(mlen):  # overlap (RLE): byte-wise
                out.append(out[start + i])


def _lz4_block_compress(data: bytes) -> bytes:
    """Greedy matcher per lz4_Block_format.md: min match 4, offsets up
    to 65535, and the end-of-block rules (last 5 bytes literal, last
    match must start >= 12 bytes before the end)."""
    n = len(data)
    out = bytearray()
    table: dict[bytes, int] = {}
    lit_start = 0
    pos = 0

    def emit(lit_run: bytes, off: int | None, mlen: int) -> None:
        lit = len(lit_run)
        token_lit = 15 if lit >= 15 else lit
        token_m = 0
        if off is not None:
            m = mlen - 4
            token_m = 15 if m >= 15 else m
        out.append((token_lit << 4) | token_m)
        if lit >= 15:
            rem = lit - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(lit_run)
        if off is not None:
            out.extend(struct.pack("<H", off))
            if mlen - 4 >= 15:
                rem = mlen - 4 - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    # matches may not start within the last 12 bytes (mflimit)
    while pos + 12 <= n:
        key = data[pos : pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is not None and pos - cand <= 0xFFFF and data[cand : cand + 4] == key:
            ln = 4
            limit = n - 5  # matches must end >= 5 bytes before the end
            while pos + ln < limit and data[cand + ln] == data[pos + ln]:
                ln += 1
            emit(data[lit_start:pos], pos - cand, ln)
            pos += ln
            lit_start = pos
        else:
            pos += 1
    emit(data[lit_start:], None, 0)  # final literals-only sequence
    return bytes(out)


def lz4_frame_compress(data: bytes, block_compress: bool = True) -> bytes:
    """LZ4 frame: magic + FLG(version 01, block-independent, no
    checksums/size) + BD(64 KiB max block) + xxh32 header-checksum
    byte, then size-prefixed blocks (high bit set = stored
    uncompressed) and the 0 end mark. This is the framing java Kafka's
    KafkaLZ4BlockOutputStream writes for message-format v2."""
    flg, bd = 0x60, 0x40
    desc = bytes([flg, bd])
    header = struct.pack("<I", _LZ4_MAGIC) + desc + bytes([(xxh32(desc) >> 8) & 0xFF])
    out = bytearray(header)
    for i in range(0, len(data), 0x10000):
        chunk = data[i : i + 0x10000]
        comp = _lz4_block_compress(chunk) if block_compress else None
        if comp is not None and len(comp) < len(chunk):
            out += struct.pack("<I", len(comp)) + comp
        else:
            out += struct.pack("<I", len(chunk) | 0x80000000) + chunk
    out += struct.pack("<I", 0)  # EndMark
    return bytes(out)


def lz4_frame_decompress(buf: bytes) -> bytes:
    try:
        return _lz4_frame_decompress_inner(buf)
    except (IndexError, struct.error) as e:
        raise ValueError(f"lz4: truncated frame: {e}") from e


def _lz4_frame_decompress_inner(buf: bytes) -> bytes:
    (magic,) = struct.unpack_from("<I", buf, 0)
    if magic != _LZ4_MAGIC:
        raise ValueError(f"lz4: bad frame magic 0x{magic:08x}")
    flg = buf[4]
    if (flg >> 6) != 0b01:
        raise ValueError("lz4: unsupported frame version")
    block_checksum = bool(flg & 0x10)
    content_size = bool(flg & 0x08)
    content_checksum = bool(flg & 0x04)
    pos = 6  # magic + FLG + BD
    if content_size:
        pos += 8
    hc = buf[pos]
    pos += 1
    if hc != (xxh32(buf[4 : pos - 1]) >> 8) & 0xFF:
        raise ValueError("lz4: frame header checksum mismatch")
    out = bytearray()
    while True:
        (bsize,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        if bsize == 0:
            break  # EndMark
        stored = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        block = buf[pos : pos + bsize]
        pos += bsize
        if block_checksum:
            pos += 4  # skip (decode-only client)
        if stored:
            out += block
        else:
            _lz4_block_decompress(block, out)
    if content_checksum and xxh32(bytes(out)) != struct.unpack_from("<I", buf, pos)[0]:
        raise ValueError("lz4: content checksum mismatch")
    return bytes(out)

"""Pure-Python snappy/LZ4/xxHash32 codec tests (r10) — the stdlib
block codecs behind the Kafka wire client's compressed-fetch path
(sources/block_codecs.py). Vectors come from the public format specs;
round-trips exercise the greedy compressors' copy/match emission."""

from __future__ import annotations

import os
import random
import struct

import pytest

from nifi_minifi_cpp_spark.sources import block_codecs as bc
from nifi_minifi_cpp_spark.sources.block_codecs import (
    lz4_frame_compress,
    lz4_frame_decompress,
    snappy_compress,
    snappy_decompress,
    xxh32,
)


def test_xxh32_public_vectors():
    # published xxHash32 reference vectors (seed 0)
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F


def test_snappy_tag_stream_hand_vectors():
    """Each tag kind decoded from hand-built streams: literal, copy-1
    (11-bit offset), copy-2, copy-4, and the overlapping-copy RLE
    idiom — format_description.txt sections 2.1/2.2."""
    raw = bc._snappy_raw_decompress
    assert raw(bytes([5, 4 << 2]) + b"hello") == b"hello"
    # copy-1: tag (len-4)<<2 | 01 | (off>>8)<<5, then offset low byte
    assert raw(bytes([8, 3 << 2]) + b"abcd" + bytes([0x01, 4])) == b"abcdabcd"
    # copy-2: tag (len-1)<<2 | 10, then 2-byte LE offset
    assert raw(bytes([8, 3 << 2]) + b"abcd" + bytes([(3 << 2) | 2]) + struct.pack("<H", 4)) == b"abcdabcd"
    # copy-4: tag (len-1)<<2 | 11, then 4-byte LE offset
    assert raw(bytes([8, 3 << 2]) + b"abcd" + bytes([(3 << 2) | 3]) + struct.pack("<I", 4)) == b"abcdabcd"
    # overlap (offset < length): 'a' then copy len 5 off 1 -> RLE
    assert raw(bytes([6, 0]) + b"a" + bytes([(4 << 2) | 2]) + struct.pack("<H", 1)) == b"aaaaaa"
    # corrupt: offset beyond output
    with pytest.raises(ValueError, match="offset"):
        raw(bytes([8, 3 << 2]) + b"abcd" + bytes([(3 << 2) | 2]) + struct.pack("<H", 99))
    # corrupt: declared length mismatch
    with pytest.raises(ValueError, match="expected"):
        raw(bytes([9, 4 << 2]) + b"hello")


def test_snappy_xerial_stream_framing():
    """The java-producer stream framing: \\x82SNAPPY\\x00 header +
    version/compat words + 4-byte-BE-length raw blocks."""
    b1 = snappy_compress(b"hello world " * 10)
    b2 = snappy_compress(b"second block")
    framed = (
        b"\x82SNAPPY\x00"
        + struct.pack(">II", 1, 1)
        + struct.pack(">I", len(b1))
        + b1
        + struct.pack(">I", len(b2))
        + b2
    )
    assert snappy_decompress(framed) == b"hello world " * 10 + b"second block"


@pytest.mark.parametrize("codec", ["snappy", "lz4"])
def test_roundtrips_all_shapes(codec):
    comp = snappy_compress if codec == "snappy" else lz4_frame_compress
    decomp = snappy_decompress if codec == "snappy" else lz4_frame_decompress
    rng = random.Random(7)
    cases = [
        b"",
        b"a",
        b"abc",
        b"abcd" * 1000,  # highly repetitive: copies dominate
        os.urandom(100_000),  # incompressible: literal runs dominate
        bytes(rng.choices(b"abcde", k=200_000)),  # mixed
        b"x" * 70_000,  # RLE across block boundaries (lz4 64K blocks)
    ]
    for d in cases:
        assert decomp(comp(d)) == d
    # repetitive data genuinely compresses (real matching, not literals)
    rep = b"the quick brown fox " * 2000
    assert len(comp(rep)) < len(rep) // 2


def test_lz4_frame_header_checksum_guard():
    f = bytearray(lz4_frame_compress(b"payload payload payload"))
    f[6] ^= 0xFF  # corrupt the HC byte
    with pytest.raises(ValueError, match="header checksum"):
        lz4_frame_decompress(bytes(f))
    with pytest.raises(ValueError, match="magic"):
        lz4_frame_decompress(b"\x00\x00\x00\x00rest")


def test_lz4_stored_block_path():
    """Incompressible chunks are stored with the high bit set on the
    block size (frame spec) and decode verbatim."""
    d = os.urandom(1000)
    f = lz4_frame_compress(d)
    (bsize,) = struct.unpack_from("<I", f, 7)
    assert bsize & 0x80000000  # stored, not compressed
    assert lz4_frame_decompress(f) == d


def test_lz4_truncated_literal_run_is_typed_error():
    """r10 review finding: a block token declaring more literals than
    the block supplies must raise, not silently return a prefix."""
    desc = bytes([0x60, 0x40])
    hdr = struct.pack("<I", 0x184D2204) + desc + bytes([(xxh32(desc) >> 8) & 0xFF])
    block = bytes([10 << 4]) + b"abcd"  # token claims 10 literals, ships 4
    frame = hdr + struct.pack("<I", len(block)) + block + struct.pack("<I", 0)
    with pytest.raises(ValueError, match="literal run"):
        lz4_frame_decompress(frame)


# ---------------------------------------------------------------------------
# REAL lz4 interop (the CLI was discovered on PATH in r13 alongside
# zstd — closes the self-referential gap for the LZ4 frame codec)
# ---------------------------------------------------------------------------

_LZ4_BIN = __import__("shutil").which("lz4")


@pytest.mark.skipif(_LZ4_BIN is None, reason="no lz4 binary on PATH")
def test_real_lz4_frames_decode():
    import random
    import subprocess

    from nifi_minifi_cpp_spark.sources.block_codecs import lz4_frame_decompress

    rng = random.Random(5)
    payloads = [
        b"",
        b"hello lz4",
        bytes(rng.randrange(256) for _ in range(5000)),
        b"the quick brown fox " * 3000,
        bytes(rng.choice(b"aab") for _ in range(60000)),
    ]
    for lvl in ("-1", "-9"):
        for i, p in enumerate(payloads):
            frame = subprocess.run(
                [_LZ4_BIN, lvl, "-c"], input=p, capture_output=True, check=True
            ).stdout
            assert lz4_frame_decompress(frame) == p, (lvl, i)


@pytest.mark.skipif(_LZ4_BIN is None, reason="no lz4 binary on PATH")
def test_real_lz4_accepts_our_frames():
    import random
    import subprocess

    from nifi_minifi_cpp_spark.sources.block_codecs import lz4_frame_compress

    rng = random.Random(5)
    for p in (b"", b"x" * 40000, bytes(rng.randrange(256) for _ in range(3000))):
        frame = lz4_frame_compress(p)
        got = subprocess.run(
            [_LZ4_BIN, "-d", "-c"], input=frame, capture_output=True, check=True
        ).stdout
        assert got == p

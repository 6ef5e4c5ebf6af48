"""Pure-Python zstd codec suite (RFC 8878; sources/zstd_codec.py).

Anchors, in order of independence:
1. Spec vectors — the canonical 13-byte empty frame `zstd` emits, a
   hand-built raw-block frame (byte-identical to what real zstd emits
   for tiny inputs), xxHash64's published test values, and
   hand-executed FSE spread / canonical-Huffman constructions.
2. Decoder-path fixtures hand-assembled per the spec layouts (FSE
   distribution headers, FSE-compressed Huffman weights, treeless
   literals, RLE/FSE/repeat sequence-table modes, repeat offsets).
3. Encoder round-trips (shared table builder — catches stream bugs,
   not systematic table-order bugs; that is what 1 and 2 are for).
"""

from __future__ import annotations

import struct
import sys
from pathlib import Path

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nifi_minifi_cpp_spark.sources import zstd_codec as z

# ---------------------------------------------------------------------------
# anchors: xxh64 + frame goldens
# ---------------------------------------------------------------------------


def test_xxh64_known_vectors():
    assert z.xxh64(b"") == 0xEF46DB3751D8E999
    assert z.xxh64(b"a") == 0xD24EC4F1A98C6E5B
    # >32-byte lane path cross-checked against Spark's JVM xxhash64
    # (seed 42 over raw bytes) during development; pin the result
    assert z.xxh64(b"abcdefghijklmnopqrstuvwxyz0123456789" * 4, seed=42) == 0xF975BA9FFAA9D535


def test_empty_frame_golden():
    """The canonical 13-byte frame `zstd` produces for empty input."""
    frame = bytes.fromhex("28b52ffd240001000099e9d851")
    assert z.zstd_decompress(frame) == b""


def test_tiny_input_encoder_matches_real_zstd_layout():
    """For sub-minimum-match inputs real zstd stores a raw block; the
    encoder's raw path emits the byte-identical frame: single-segment
    FHD + 1-byte FCS + raw last block + xxh64 checksum."""
    data = b"hello\n"
    expected = (
        struct.pack("<I", z.ZSTD_MAGIC)
        + bytes([0x24, len(data)])
        + bytes([(len(data) << 3) | 1, 0, 0])
        + data
        + struct.pack("<I", z.xxh64(data) & 0xFFFFFFFF)
    )
    assert z.zstd_compress(data) == expected
    assert z.zstd_decompress(expected) == data


def test_skippable_frame_and_multi_frame():
    body = z.zstd_compress(b"abc") + struct.pack("<II", 0x184D2A53, 4) + b"SKIP" + z.zstd_compress(b"def")
    assert z.zstd_decompress(body) == b"abcdef"


def test_checksum_mismatch_and_bad_magic():
    frame = bytearray(z.zstd_compress(b"payload-x"))
    frame[-1] ^= 0xFF
    with pytest.raises(z.ZstdError, match="checksum"):
        z.zstd_decompress(bytes(frame))
    with pytest.raises(z.ZstdError, match="magic"):
        z.zstd_decompress(b"\x00\x01\x02\x03rest")


# ---------------------------------------------------------------------------
# FSE primitives (hand-executed spec algorithm as the golden)
# ---------------------------------------------------------------------------


def test_fse_spread_and_table_hand_computed():
    """probs [2,1,1] at accuracy 2: step 5 walks 0,1,2,3; spread is
    [0,0,1,2]; decode entries follow the count-up rule."""
    t = z.FseTable([2, 1, 1], 2)
    assert t.symbol == [0, 0, 1, 2]
    assert t.nb_bits == [1, 1, 2, 2]
    assert t.baseline == [0, 2, 0, 0]


def test_fse_less_than_one_placed_at_top():
    """-1 probabilities take the highest states with full-accuracy
    reads (baseline 0) — the RFC's low-probability corner."""
    t = z.FseTable([3, -1], 2)
    assert t.symbol[3] == 1
    assert t.nb_bits[3] == 2 and t.baseline[3] == 0


def _write_fse_distribution(probs: list[int], accuracy_log: int) -> bytes:
    """Test-local forward-bit distribution writer (inverse of
    fse_read_distribution, used to fabricate decoder fixtures)."""
    bits: list[tuple[int, int]] = [(accuracy_log - 5, 4)]
    remaining = (1 << accuracy_log) + 1
    i = 0
    while remaining > 1:
        p = probs[i]
        val = p + 1
        nbits = remaining.bit_length()
        lower_mask = (1 << (nbits - 1)) - 1
        threshold = (1 << nbits) - 1 - remaining
        if val < threshold:
            bits.append((val, nbits - 1))
        elif val <= lower_mask:
            bits.append((val, nbits))
        else:
            bits.append((val + threshold, nbits))
        remaining -= p if p >= 0 else 1
        i += 1
        if p == 0:
            # encode zero-runs: count following zeros in groups of <=3
            run = 0
            while i < len(probs) and probs[i] == 0:
                run += 1
                i += 1
            while run >= 3:
                bits.append((3, 2))
                run -= 3
            bits.append((run, 2))
            # the reader consumes those zeros from the flags, so no
            # probability fields for them
    acc = 0
    pos = 0
    for v, n in bits:
        acc |= v << pos
        pos += n
    return acc.to_bytes((pos + 7) // 8, "little")


def test_fse_distribution_header_roundtrip():
    for probs, al in [
        ([16, 8, 4, 2, 1, 1], 5),
        ([10, 0, 0, 0, 0, 10, 8, 2, -1, -1], 5),
        (z.LL_DEFAULT_DIST, z.LL_DEFAULT_LOG),
        (z.OF_DEFAULT_DIST, z.OF_DEFAULT_LOG),
    ]:
        blob = _write_fse_distribution(probs, al)
        got, got_al, _ = z.fse_read_distribution(blob, 0, 255, 9)
        assert got_al == al
        # trailing zero probs are representation detail
        canon = list(probs)
        while canon and canon[-1] == 0:
            canon.pop()
        while got and got[-1] == 0:
            got.pop()
        assert got == canon, (probs, got)


# ---------------------------------------------------------------------------
# Huffman primitives
# ---------------------------------------------------------------------------


def test_huffman_canonical_table_hand_computed():
    """Explicit weights [2, 1]: implied last weight completes 3 to 4,
    so symbol 2 gets weight 1; max_bits 2; lengths [1, 2, 2]; the
    longest codes occupy the lowest table cells in symbol order."""
    t = z.HufTable([2, 1])
    assert t.max_bits == 2
    assert t.symbol == [1, 2, 0, 0]
    assert t.length == [2, 2, 1, 1]
    assert t.codes() == {1: (0, 2), 2: (1, 2), 0: (1, 1)}


def test_huffman_power_of_two_explicit_sum():
    """Explicit sum already a power of two still implies a LAST
    weight (completing to the NEXT power): [1, 1, 1, 1] -> total 4,
    implied weight 3, max_bits 3."""
    t = z.HufTable([1, 1, 1, 1])
    assert t.max_bits == 3
    assert t.length[:1] == [3]  # longest codes first
    assert t.codes()[4] == (1, 1)  # implied symbol carries the short code


def test_huffman_stream_roundtrip_via_codes():
    t = z.HufTable([2, 1])
    codes = t.codes()
    msg = [0, 1, 2, 0, 0, 1]
    w = z._BackwardWriter()
    for s in msg:
        c, nb = codes[s]
        w.write(c, nb)
    out = t.decode_stream(z.BackwardBits(w.render()), len(msg))
    assert list(out) == msg


def test_fse_compressed_huffman_weights_decode():
    """Fabricate an FSE-compressed weight description (header byte <
    128) with the test-local writers and check huf_read_weights
    reproduces the weights through the two-state interleave."""
    weights = [1, 2, 1, 3, 1, 2, 1, 1]  # explicit weights to transmit
    probs = [0, 20, 8, 4]  # weight-alphabet distribution, AL 5
    al = 5
    table = z.FseTable(probs, al)
    desc = _write_fse_distribution(probs, al)
    # interleaved 2-state FSE: states s1, s2 emit weights alternately;
    # chain per state over ITS OWN symbols, interleave the writes
    sym1, sym2 = weights[0::2], weights[1::2]
    x1, up1 = z._fse_state_chain(table, sym1)
    x2, up2 = z._fse_state_chain(table, sym2)
    w = z._BackwardWriter()
    w.write(x1, al)
    w.write(x2, al)
    # reader: emit s1, update s1; emit s2, update s2; ... stop on
    # overflow — write exactly the updates it will consume, then let
    # the stream run out
    for i in range(len(sym1) - 1):
        w.write(*up1[i])
        if i < len(sym2) - 1:
            w.write(*up2[i])
    blob = bytes([len(desc) + len(w.render())]) + desc + w.render()
    got, used = z.huf_read_weights(blob, 0)
    assert used == len(blob)
    assert got[: len(weights)] == weights


# ---------------------------------------------------------------------------
# decoder-path fixtures: literals + sequence table modes
# ---------------------------------------------------------------------------


def _frame_of_blocks(blocks: list[bytes], content_size: int) -> bytes:
    out = bytearray(struct.pack("<I", z.ZSTD_MAGIC))
    out.append(0x80 | 0x20)  # single segment, 4-byte FCS
    out += struct.pack("<I", content_size)
    for i, b in enumerate(blocks):
        header = (1 if i == len(blocks) - 1 else 0) | (2 << 1) | (len(b) << 3)
        out += bytes([header & 0xFF, (header >> 8) & 0xFF, (header >> 16) & 0xFF])
        out += b
    return bytes(out)


def test_treeless_literals_reuse_previous_table():
    lits = (b"abracadabra-alakazam" * 8)[:128]
    sec1 = z._encode_huffman_literals(lits)
    assert sec1 is not None and sec1[0] & 3 == 2
    # block 2: same literals, type 3 (treeless), reusing block 1 table
    table = z.HufTable(
        z.huf_read_weights(sec1[3:], 0)[0]
    )
    codes = table.codes()
    w = z._BackwardWriter()
    for b in lits:
        c, nb = codes[b]
        w.write(c, nb)
    payload = w.render()
    h = 3 | (0 << 2) | (len(lits) << 4) | (len(payload) << 14)
    sec2 = bytes([h & 0xFF, (h >> 8) & 0xFF, (h >> 16) & 0xFF]) + payload
    frame = _frame_of_blocks([sec1 + b"\x00", sec2 + b"\x00"], 2 * len(lits))
    assert z.zstd_decompress(frame) == lits + lits


def test_treeless_without_table_is_an_error():
    lits = b"q" * 40 + b"r"  # not RLE
    w_fake = bytes([3 | (0 << 2) | (len(lits) << 4) & 0xFF])  # type 3 header
    h = 3 | (0 << 2) | (len(lits) << 4) | (1 << 14)
    sec = bytes([h & 0xFF, (h >> 8) & 0xFF, (h >> 16) & 0xFF]) + b"\x01"
    frame = _frame_of_blocks([sec + b"\x00"], len(lits))
    with pytest.raises(z.ZstdError, match="treeless"):
        z.zstd_decompress(frame)


def _seq_section_rle_mode(seqs, ll_sym, of_sym, ml_sym) -> bytes:
    """Sequences section with all three tables in RLE mode: every
    sequence shares one (ll, of, ml) code triple; only extra bits are
    in the stream."""
    head = bytes([len(seqs)])
    modes = (1 << 6) | (1 << 4) | (1 << 2)
    w = z._BackwardWriter()
    # RLE tables have accuracy_log 0: the three init reads are 0 bits
    for ll, ml, offset in seqs:
        value = offset + 3
        code = value.bit_length() - 1
        assert code == of_sym
        w.write(value - (1 << code), code)
        mlc, mlv, mlb = z._ml_code(ml)
        assert mlc == ml_sym
        w.write(mlv, mlb)
        llc, llv, llb = z._ll_code(ll)
        assert llc == ll_sym
        w.write(llv, llb)
        # zero-bit state updates: nothing to write
    return head + bytes([modes]) + bytes([ll_sym, of_sym, ml_sym]) + w.render()


def test_sequences_rle_table_mode():
    # two sequences, identical codes: ll=4 (code 4), offset=4 (value 7,
    # code 2), ml=6 (code 3)
    lits = b"abcdWXYZ"
    seqs = [(4, 6, 4), (4, 6, 4)]
    lit_sec = z._encode_literals_section(lits)
    seq_sec = _seq_section_rle_mode(seqs, 4, 2, 3)
    frame = _frame_of_blocks([lit_sec + seq_sec], 4 + 6 + 4 + 6)
    got = z.zstd_decompress(frame)
    # abcd | match 6 back 4 -> abcdab | WXYZ | match again
    assert got == b"abcd" + b"abcdab" + b"WXYZ" + b"WXYZWX"


def test_sequences_fse_compressed_tables_and_repeat_mode():
    """Block 1 carries explicit FSE table descriptions (mode 2) for
    all three; block 2 uses repeat mode (3) and must reuse them."""
    ll_probs = [0, 16, 16]       # ll codes 1, 2
    of_probs = [0, 0, 16, 16]    # of codes 2, 3
    ml_probs = [0, 0, 0, 16, 16] # ml codes 3, 4 -> lengths 6, 7
    al = 5
    ll_t, of_t, ml_t = (z.FseTable(p, al) for p in (ll_probs, of_probs, ml_probs))
    seqs = [(1, 6, 1), (2, 7, 5)]  # (ll, ml, offset)
    lits = b"XYZ"

    def build_seq_sec(mode: int) -> bytes:
        head = bytes([len(seqs)])
        modes = (mode << 6) | (mode << 4) | (mode << 2)
        body = b""
        if mode == 2:
            body = (
                _write_fse_distribution(ll_probs, al)
                + _write_fse_distribution(of_probs, al)
                + _write_fse_distribution(ml_probs, al)
            )
        ll_chain = z._fse_state_chain(ll_t, [z._ll_code(s[0])[0] for s in seqs])
        of_chain = z._fse_state_chain(of_t, [(s[2] + 3).bit_length() - 1 for s in seqs])
        ml_chain = z._fse_state_chain(ml_t, [z._ml_code(s[1])[0] for s in seqs])
        w = z._BackwardWriter()
        w.write(ll_chain[0], al)
        w.write(of_chain[0], al)
        w.write(ml_chain[0], al)
        for i, (ll, ml, offset) in enumerate(seqs):
            value = offset + 3
            code = value.bit_length() - 1
            w.write(value - (1 << code), code)
            _, mlv, mlb = z._ml_code(ml)
            w.write(mlv, mlb)
            _, llv, llb = z._ll_code(ll)
            w.write(llv, llb)
            if i + 1 < len(seqs):
                w.write(*ll_chain[1][i])
                w.write(*ml_chain[1][i])
                w.write(*of_chain[1][i])
        return head + bytes([modes]) + body + w.render()

    lit_sec = z._encode_literals_section(lits)
    block1 = lit_sec + build_seq_sec(2)
    block2 = lit_sec + build_seq_sec(3)

    def run(seq_list, prior: bytes) -> bytes:
        out = bytearray(prior)
        lpos = 0
        for ll, ml, offset in seq_list:
            out += lits[lpos : lpos + ll]
            lpos += ll
            for _ in range(ml):
                out.append(out[-offset])
        out += lits[lpos:]
        return bytes(out)

    expected1 = run(seqs, b"")
    expected = run(seqs, expected1)
    frame = _frame_of_blocks([block1, block2], len(expected))
    assert z.zstd_decompress(frame) == expected


def test_repeat_offsets_paths():
    """offset_value 1-3 exercise the repeat-offset history, including
    the ll == 0 shift and the repeat1-1 corner."""
    reps = [1, 4, 8]
    # fresh history: value 1 with ll>0 -> rep1 (1), history unchanged
    assert z._apply_offset(1, reps, ll=5) == 1 and reps == [1, 4, 8]
    # value 2 with ll>0 -> rep2 (4), swap
    assert z._apply_offset(2, reps, ll=5) == 4 and reps == [4, 1, 8]
    # value 3 with ll>0 -> rep3 (8), rotate
    assert z._apply_offset(3, reps, ll=5) == 8 and reps == [8, 4, 1]
    # ll == 0 shifts: value 1 -> rep2
    assert z._apply_offset(1, reps, ll=0) == 4 and reps == [4, 8, 1]
    # ll == 0, value 3 -> rep1 - 1
    assert z._apply_offset(3, reps, ll=0) == 3 and reps == [3, 4, 8]
    # normal offset pushes history
    assert z._apply_offset(40 + 3, reps, ll=2) == 40 and reps == [40, 3, 4]
    reps2 = [1, 4, 8]
    with pytest.raises(z.ZstdError, match="underflow"):
        z._apply_offset(3, reps2, ll=0)  # 1 - 1 == 0


# ---------------------------------------------------------------------------
# encoder round-trips
# ---------------------------------------------------------------------------


def test_roundtrip_corpus():
    import random

    rng = random.Random(20260816)
    cases = [
        b"",
        b"a",
        b"ab",
        b"x" * 100000,
        bytes(rng.randrange(256) for _ in range(5000)),
        (b"the quick brown fox jumps over the lazy dog. " * 3000),
        b"ab" * 70000,
        bytes(rng.choice(b"aab") for _ in range(50000)),
        ("json-ish " * 10 + '{"key": 1, "key": 2}' * 500).encode(),
    ]
    for i, c in enumerate(cases):
        frame = z.zstd_compress(c)
        assert z.zstd_decompress(frame) == c, f"case {i}"
        # no-checksum flavor too
        frame2 = z.zstd_compress(c, checksum=False)
        assert z.zstd_decompress(frame2) == c, f"case {i} (no checksum)"


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.binary(max_size=4000),
    mode=st.sampled_from(["random", "repetitive", "texty"]),
)
def test_roundtrip_property(data, mode):
    if mode == "repetitive":
        data = data * 7
    elif mode == "texty":
        data = bytes(b % 64 + 32 for b in data) * 3
    assert z.zstd_decompress(z.zstd_compress(data)) == data


def test_kafka_batch_zstd_roundtrip():
    from nifi_minifi_cpp_spark.sources.kafka_wire import (
        decode_record_batches,
        encode_record_batch,
    )

    items = [
        (1700000000000 + i, b"k%d" % i, b"zstd-payload-%d" % i * 40, [("h", b"v")])
        for i in range(8)
    ]
    plain = encode_record_batch(3, items)
    comp = encode_record_batch(3, items, compression="zstd")
    assert len(comp) < len(plain)
    assert decode_record_batches(comp) == decode_record_batches(plain)


def test_dictionary_frames_are_refused():
    """A frame referencing a dictionary must refuse loudly — decoding
    without the dictionary would produce silently wrong output. A
    dictionary id of 0 (explicitly written) means no dictionary."""
    data = b"hi"
    base = struct.pack("<I", z.ZSTD_MAGIC)
    # FHD: single-segment + 1-byte FCS + did_flag 1; dict id 7
    frame = base + bytes([0x21, 7, len(data)]) + bytes([(len(data) << 3) | 1, 0, 0]) + data
    with pytest.raises(z.ZstdError, match="dictionary 7"):
        z.zstd_decompress(frame)
    # same layout, dict id 0: decodes
    frame0 = base + bytes([0x21, 0, len(data)]) + bytes([(len(data) << 3) | 1, 0, 0]) + data
    assert z.zstd_decompress(frame0) == data


def test_predefined_tables_match_rfc_expanded_appendix():
    """RFC 8878 publishes the fully-expanded default decoding tables
    for the three sequence alphabets. Pin the leading rows of each —
    an independent, spec-published anchor for the FSE table builder
    (the one construction both encoder and decoder share, so a
    systematic spread/count-up bug lands here, not just in
    round-trips). (state, symbol, nb_bits, baseline) per the RFC's
    Literals_Length / Match_Length / Offset default tables."""
    ll = z.FseTable(z.LL_DEFAULT_DIST, z.LL_DEFAULT_LOG)
    expect_ll = [
        (0, 0, 4, 0), (1, 0, 4, 16), (2, 1, 5, 32), (3, 3, 5, 0),
        (4, 4, 5, 0), (5, 6, 5, 0), (6, 7, 5, 0), (7, 9, 5, 0),
        (8, 10, 5, 0), (9, 12, 5, 0), (10, 14, 6, 0), (11, 16, 5, 0),
        (12, 18, 5, 0), (13, 19, 5, 0), (14, 21, 5, 0), (15, 22, 5, 0),
    ]
    for st, sym, nb, base in expect_ll:
        assert (ll.symbol[st], ll.nb_bits[st], ll.baseline[st]) == (sym, nb, base), st

    ml = z.FseTable(z.ML_DEFAULT_DIST, z.ML_DEFAULT_LOG)
    expect_ml = [
        (0, 0, 6, 0), (1, 1, 4, 0), (2, 2, 5, 32), (3, 3, 5, 0),
        (4, 5, 5, 0), (5, 6, 5, 0), (6, 8, 5, 0), (7, 10, 6, 0),
    ]
    for st, sym, nb, base in expect_ml:
        assert (ml.symbol[st], ml.nb_bits[st], ml.baseline[st]) == (sym, nb, base), st

    of = z.FseTable(z.OF_DEFAULT_DIST, z.OF_DEFAULT_LOG)
    expect_of = [
        (0, 0, 5, 0), (1, 6, 4, 0), (2, 9, 5, 0), (3, 15, 5, 0),
        (4, 21, 5, 0), (5, 3, 5, 0), (6, 7, 4, 0), (7, 12, 5, 0),
    ]
    for st, sym, nb, base in expect_of:
        assert (of.symbol[st], of.nb_bits[st], of.baseline[st]) == (sym, nb, base), st


def test_four_stream_huffman_literals_roundtrip():
    """Force the 4-stream Huffman literals path (regenerated size >
    1023 after the LZ parse): many distinct low-entropy words give few
    matches and large compressible literals."""
    import random

    rng = random.Random(3)
    words = [
        "".join(rng.choice("abcdefghijklmnop") for _ in range(rng.randrange(3, 10)))
        for _ in range(4000)
    ]
    data = (" ".join(words)).encode()
    lits_sections = []
    orig = z._encode_huffman_literals

    def spy(lits):
        out = orig(lits)
        if out is not None:
            lits_sections.append((len(lits), out[0] & 3, (out[0] >> 2) & 3))
        return out

    z._encode_huffman_literals = spy
    try:
        frame = z.zstd_compress(data)
    finally:
        z._encode_huffman_literals = orig
    assert z.zstd_decompress(frame) == data
    assert len(frame) < 0.75 * len(data)
    # at least one compressed-literals section used the 4-stream form
    assert any(t == 2 and sf in (1, 2, 3) and n > 1023 for n, t, sf in lits_sections)


def test_match_offset_cannot_cross_frame_boundary():
    """The window resets per frame: a sequence in frame 2 whose offset
    reaches into frame 1's output must raise, not silently copy."""
    lit_sec = z._encode_literals_section(b"abcd")
    # one sequence: ll=4, ml=4, offset=8 — only 4 bytes exist in THIS frame
    seq_sec = _seq_section_rle_mode([(4, 4, 8)], 4, 3, 1)
    bad = _frame_of_blocks([lit_sec + seq_sec], 8)
    good_prefix = z.zstd_compress(b"12345678")
    with pytest.raises(z.ZstdError, match="frame window"):
        z.zstd_decompress(good_prefix + bad)


# ---------------------------------------------------------------------------
# REAL zstd interop (the binary was discovered on PATH in r13 — the
# caveat the module docstring carried is closed by running it here)
# ---------------------------------------------------------------------------

_ZSTD_BIN = __import__("shutil").which("zstd")


@pytest.mark.skipif(_ZSTD_BIN is None, reason="no zstd binary on PATH")
def test_real_zstd_output_decodes():
    """Frames produced by the reference implementation (all levels,
    with/without checksum, long mode) must decode byte-identically —
    the anchor that kills the shared-table-builder circularity."""
    import random
    import subprocess

    rng = random.Random(99)
    payloads = [
        b"",
        b"a",
        b"hello zstd interop\n",
        bytes(rng.randrange(256) for _ in range(40000)),
        (b"the quick brown fox jumps over the lazy dog. " * 2000),
        b"ab" * 60000,
        bytes(rng.choice(b"aabbbc") for _ in range(120000)),
    ]
    for level in (1, 3, 19):
        for extra in ([], ["--no-check"], ["--long"]):
            for i, p in enumerate(payloads):
                frame = subprocess.run(
                    [_ZSTD_BIN, f"-{level}", *extra, "-c"],
                    input=p, capture_output=True, check=True,
                ).stdout
                assert z.zstd_decompress(frame) == p, (level, extra, i)


@pytest.mark.skipif(_ZSTD_BIN is None, reason="no zstd binary on PATH")
def test_real_zstd_decodes_our_frames():
    """The encoder subset's frames must be accepted by the reference
    implementation — conformance in the PublishKafka direction."""
    import random
    import subprocess

    rng = random.Random(7)
    payloads = [
        b"",
        b"x" * 50000,
        bytes(rng.randrange(256) for _ in range(3000)),
        (b"json-ish {\"key\": 1} " * 4000),
        bytes(rng.choice(b"aab") for _ in range(90000)),
    ]
    for p in payloads:
        for checksum in (True, False):
            frame = z.zstd_compress(p, checksum=checksum)
            got = subprocess.run(
                [_ZSTD_BIN, "-d", "-c"], input=frame, capture_output=True, check=True
            ).stdout
            assert got == p


@pytest.mark.skipif(_ZSTD_BIN is None, reason="no zstd binary on PATH")
def test_real_zstd_kafka_batch_interop():
    """A RecordBatch whose records section was compressed by REAL zstd
    decodes through decode_record_batches — what a librdkafka
    compression.type=zstd producer actually ships."""
    import struct as _struct
    import subprocess

    from nifi_minifi_cpp_spark.sources.kafka_wire import (
        _CODEC_ZSTD,
        crc32c,
        decode_record_batches,
        encode_record_batch,
    )

    items = [
        (1700000000000 + i, b"k%d" % i, b"real-zstd-%d" % i * 30, [("h", b"v")])
        for i in range(6)
    ]
    plain = encode_record_batch(5, items)
    # splice: re-compress the records section with the real binary and
    # flip the codec bits, exactly as a real producer would have
    n_records_off = 12 + 4 + 1 + 4 + 2 + 4 + 8 + 8 + 8 + 2 + 4  # through baseSequence
    records_off = n_records_off + 4
    recs_plain = plain[records_off:]
    comp = subprocess.run(
        [_ZSTD_BIN, "-3", "-c"], input=recs_plain, capture_output=True, check=True
    ).stdout
    body = bytearray(plain[:records_off] + comp)
    body[21:23] = _struct.pack(">h", _CODEC_ZSTD)
    body[17:21] = _struct.pack(">I", crc32c(bytes(body[21:])))
    # batch_length covers everything after the length field
    body[8:12] = _struct.pack(">i", len(body) - 12)
    assert decode_record_batches(bytes(body)) == decode_record_batches(plain)

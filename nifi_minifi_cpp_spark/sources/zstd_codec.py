"""Pure-Python Zstandard (RFC 8878) frame codec for the Kafka wire
client — closes the last RecordBatch codec gap (reference consumes
zstd topics transparently via librdkafka,
/root/reference/extensions/kafka/ConsumeKafka.cpp:370; this container
has no zstd lib and Python 3.11 predates stdlib ``compression.zstd``).

DECODER: the full RFC 8878 frame format — frame header (single-segment
and windowed), raw/RLE/compressed blocks, all four literals block
types (raw, RLE, Huffman-compressed with direct or FSE-compressed
weight descriptions, treeless repeat), 1- and 4-stream Huffman,
sequences under predefined/RLE/FSE-compressed/repeat table modes,
repeat-offset history, skippable frames, multi-frame input, and the
xxHash64 content checksum.

ENCODER: a conformant subset used by PublishKafka-side tests and the
round-trip suites — raw/RLE blocks plus compressed blocks with
raw-or-Huffman literals (direct weights) and greedy-LZ sequences
encoded against the PREDEFINED FSE distributions. Encoding inverts the
decoder's own tables (for an FSE decode table, each symbol's states
partition the state space by their (baseline, nbBits) ranges, so the
predecessor state for any target is unique — encoding is a backward
walk over the decode table; Huffman codes fall out of the canonical
table ranges the same way). That keeps one normative table-building
path for both directions.

Validation: spec-vector unit tests (the canonical 13-byte empty
frame, the RFC's expanded predefined-table rows, canonical-Huffman
ranking, hand-assembled decoder-path fixtures), encoder round-trips
over randomized and adversarial inputs, corruption fuzz (typed errors
only) — and REAL interop: the reference `zstd` binary turned out to
live on this box's PATH (discovered r13, /root/miniconda/bin/zstd
v1.5.7; the earlier env probes only checked Python wheels), so the
suite decodes reference-produced frames across levels 1/3/19 with and
without checksums and long mode, feeds our frames back through
`zstd -d`, and decodes a RecordBatch whose records section was
compressed by the real binary. The librdkafka-broker end-to-end run
remains cluster-side, but codec conformance is no longer
self-referential in either direction.
"""

from __future__ import annotations

import struct

ZSTD_MAGIC = 0xFD2FB528
SKIPPABLE_MAGIC_MIN = 0x184D2A50
SKIPPABLE_MAGIC_MAX = 0x184D2A5F

MAX_BLOCK_SIZE = 128 * 1024


class ZstdError(ValueError):
    pass


# ---------------------------------------------------------------------------
# xxHash64 (for the optional content checksum)
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            lane = struct.unpack_from("<4Q", data, i)
            v1 = (_rotl64((v1 + lane[0] * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl64((v2 + lane[1] * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl64((v3 + lane[2] * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl64((v4 + lane[3] * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= (_rotl64((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl64(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _M64
        h = (_rotl64(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl64(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# bit streams
# ---------------------------------------------------------------------------


class ForwardBits:
    """LSB-first forward bit reader (FSE table descriptions)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        got = 0
        while got < n:
            if self.byte >= len(self.data):
                # a header's final small-field read may peek one bit
                # past its own bytes (the caller rewinds it); zero-fill
                # like a buffered reader would
                return out
            take = min(8 - self.bit, n - got)
            chunk = (self.data[self.byte] >> self.bit) & ((1 << take) - 1)
            out |= chunk << got
            got += take
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return out

    def rewind(self, n: int) -> None:
        total = self.byte * 8 + self.bit - n
        self.byte, self.bit = divmod(total, 8)

    def consumed_bytes(self) -> int:
        return self.byte + (1 if self.bit else 0)


class BackwardBits:
    """MSB-justified backward bit reader: zstd entropy payloads are
    written back-to-front, with a single sentinel 1-bit above the
    first (i.e. last-written) bit of the stream. Reads past the start
    return zero bits (the spec's defined exhaustion behavior); the
    ``overflowed`` flag records it for the interleaved-weights stop
    rule."""

    def __init__(self, data: bytes):
        if not data:
            raise ZstdError("empty backward bitstream")
        last = data[-1]
        if last == 0:
            raise ZstdError("backward bitstream missing sentinel bit")
        self.value = int.from_bytes(data, "little")
        self.bits = (len(data) - 1) * 8 + last.bit_length() - 1  # below sentinel
        self.overflowed = False

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if n <= self.bits:
            self.bits -= n
            return (self.value >> self.bits) & ((1 << n) - 1)
        # zero-fill past the start
        self.overflowed = True
        have = self.bits
        out = (self.value & ((1 << have) - 1)) << (n - have) if have else 0
        self.bits = 0
        return out

    def peek(self, n: int) -> int:
        if n <= self.bits:
            return (self.value >> (self.bits - n)) & ((1 << n) - 1)
        have = self.bits
        return ((self.value & ((1 << have) - 1)) << (n - have)) if have else 0

    def skip(self, n: int) -> None:
        if n > self.bits:
            self.overflowed = True
            self.bits = 0
        else:
            self.bits -= n

    def exhausted(self) -> bool:
        return self.bits == 0


# ---------------------------------------------------------------------------
# FSE
# ---------------------------------------------------------------------------


def fse_read_distribution(
    data: bytes, pos: int, max_symbol: int, max_accuracy: int
) -> tuple[list[int], int, int]:
    """Read an FSE distribution header (RFC 8878 4.1.1) starting at
    ``pos``. -> (probabilities with -1 for less-than-one, accuracy_log,
    bytes consumed)."""
    br = ForwardBits(data, pos)
    accuracy_log = br.read(4) + 5
    if accuracy_log > max_accuracy:
        raise ZstdError(f"FSE accuracy {accuracy_log} > max {max_accuracy}")
    remaining = (1 << accuracy_log) + 1
    probs: list[int] = []
    while remaining > 1:
        if len(probs) > max_symbol:
            raise ZstdError("FSE distribution has too many symbols")
        nbits = remaining.bit_length()
        lower_mask = (1 << (nbits - 1)) - 1
        threshold = (1 << nbits) - 1 - remaining
        val = br.read(nbits)
        if (val & lower_mask) < threshold:
            br.rewind(1)
            val &= lower_mask
        elif val > lower_mask:
            val -= threshold
        prob = val - 1
        probs.append(prob)
        remaining -= prob if prob >= 0 else 1
        if prob == 0:
            while True:
                rep = br.read(2)
                probs.extend([0] * rep)
                if len(probs) > max_symbol + 1:
                    raise ZstdError("FSE zero-repeat overruns the alphabet")
                if rep != 3:
                    break
    if remaining != 1:
        raise ZstdError("FSE distribution does not sum to table size")
    return probs, accuracy_log, br.consumed_bytes() - pos


def fse_spread(probs: list[int], accuracy_log: int) -> list[int]:
    """Symbol spread over the state table (the normative placement)."""
    size = 1 << accuracy_log
    table = [-1] * size
    high = size - 1
    for sym, p in enumerate(probs):
        if p == -1:
            table[high] = sym
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for sym, p in enumerate(probs):
        for _ in range(max(p, 0)):
            table[pos] = sym
            while True:
                pos = (pos + step) & mask
                if pos <= high:
                    break
    if pos != 0:
        raise ZstdError("FSE spread did not close its cycle")
    return table


class FseTable:
    """Decode table: per state (symbol, nb_bits, baseline)."""

    __slots__ = ("accuracy_log", "symbol", "nb_bits", "baseline")

    def __init__(self, probs: list[int], accuracy_log: int):
        size = 1 << accuracy_log
        spread = fse_spread(probs, accuracy_log)
        counters = [max(p, 0) if p != -1 else 1 for p in probs]
        # state_desc starts at the symbol's count and increments per cell
        next_desc = list(counters)
        self.accuracy_log = accuracy_log
        self.symbol = spread
        self.nb_bits = [0] * size
        self.baseline = [0] * size
        # cells hosting less-than-one symbols sit at the top and were
        # placed first; iterate positions ascending with per-symbol
        # counters starting at count (RFC table-building order)
        for state in range(size):
            sym = spread[state]
            desc = next_desc[sym]
            next_desc[sym] += 1
            nb = accuracy_log - (desc.bit_length() - 1)
            self.nb_bits[state] = nb
            self.baseline[state] = (desc << nb) - size


class FseState:
    __slots__ = ("table", "state")

    def __init__(self, table: FseTable, stream: BackwardBits):
        self.table = table
        self.state = stream.read(table.accuracy_log)

    def symbol(self) -> int:
        return self.table.symbol[self.state]

    def update(self, stream: BackwardBits) -> None:
        t = self.table
        bits = stream.read(t.nb_bits[self.state])
        self.state = t.baseline[self.state] + bits


# predefined distributions (RFC 8878 3.1.1.3.2.2)
LL_DEFAULT_DIST = [
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
    -1, -1, -1, -1,
]
ML_DEFAULT_DIST = [
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    -1, -1, -1, -1, -1,
]
OF_DEFAULT_DIST = [
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1,
]
LL_DEFAULT_LOG, ML_DEFAULT_LOG, OF_DEFAULT_LOG = 6, 6, 5
LL_MAX_SYMBOL, ML_MAX_SYMBOL, OF_MAX_SYMBOL = 35, 52, 31
LL_MAX_LOG, ML_MAX_LOG, OF_MAX_LOG = 9, 9, 8

# literals-length codes: (baseline, extra bits) for codes 16..35;
# codes 0-15 are the value itself with 0 extra bits
LL_CODE_TABLE = [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3), (40, 3),
    (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10), (2048, 11),
    (4096, 12), (8192, 13), (16384, 14), (32768, 15), (65536, 16),
]
# match-length codes: codes 0-31 -> value code+3, 0 extra bits
ML_CODE_TABLE = [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3), (59, 3),
    (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9), (1027, 10),
    (2051, 11), (4099, 12), (8195, 13), (16387, 14), (32771, 15),
    (65539, 16),
]


def ll_decode(code: int, stream: BackwardBits) -> int:
    if code < 16:
        return code
    if code > 35:
        raise ZstdError(f"bad literals-length code {code}")
    base, bits = LL_CODE_TABLE[code - 16]
    return base + stream.read(bits)


def ml_decode(code: int, stream: BackwardBits) -> int:
    if code < 32:
        return code + 3
    if code > 52:
        raise ZstdError(f"bad match-length code {code}")
    base, bits = ML_CODE_TABLE[code - 32]
    return base + stream.read(bits)

# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


class HufTable:
    """Canonical Huffman decode table (RFC 8878 4.2.1): symbol weights
    -> bit lengths nb = max_bits + 1 - w; the table of 2^max_bits
    cells hosts the LONGEST codes first (from index 0 upward), each
    symbol occupying 2^(max_bits - nb) consecutive cells in natural
    symbol order within its length class."""

    __slots__ = ("max_bits", "symbol", "length")

    def __init__(self, weights: list[int]):
        # ``weights`` are the EXPLICIT weights; the last symbol's
        # weight is implied: it completes the 2^(w-1) sum to the next
        # power of two (RFC 8878 4.2.1.1), and must itself be a
        # power-of-two contribution or the description is corrupt.
        explicit = sum((1 << (w - 1)) for w in weights if w > 0)
        if explicit == 0:
            raise ZstdError("Huffman table with no weighted symbols")
        max_bits = explicit.bit_length()  # smallest 2^k strictly > explicit
        left = (1 << max_bits) - explicit
        if left & (left - 1):
            raise ZstdError("Huffman weights do not complete a power of two")
        weights = weights + [left.bit_length()]
        if max_bits > 11:
            raise ZstdError(f"Huffman max bits {max_bits} > 11")
        size = 1 << max_bits
        lengths = [max_bits + 1 - w if w > 0 else 0 for w in weights]
        rank_count = [0] * (max_bits + 1)
        for nb in lengths:
            if nb:
                rank_count[nb] += 1
        rank_idx = [0] * (max_bits + 2)
        # longest codes first: index 0 hosts nb == max_bits
        acc = 0
        for nb in range(max_bits, 0, -1):
            rank_idx[nb] = acc
            acc += rank_count[nb] * (1 << (max_bits - nb))
        if acc != size:
            raise ZstdError("Huffman lengths do not fill the table")
        self.max_bits = max_bits
        self.symbol = [0] * size
        self.length = [0] * size
        for sym, nb in enumerate(lengths):
            if nb == 0:
                continue
            run = 1 << (max_bits - nb)
            base = rank_idx[nb]
            for j in range(base, base + run):
                self.symbol[j] = sym
                self.length[j] = nb
            rank_idx[nb] = base + run

    def decode_stream(self, stream: BackwardBits, count: int) -> bytes:
        out = bytearray(count)
        mb = self.max_bits
        for i in range(count):
            idx = stream.peek(mb)
            out[i] = self.symbol[idx]
            stream.skip(self.length[idx])
        if stream.overflowed or not stream.exhausted():
            # a valid stream is EXACTLY consumed by its literal count;
            # anything else is corruption that would otherwise yield
            # silently wrong bytes in a checksum-less frame
            raise ZstdError("Huffman literal stream not exactly consumed")
        return bytes(out)

    def codes(self) -> dict[int, tuple[int, int]]:
        """symbol -> (code value, bit length), read back off the table
        (the encoder's source of truth — one normative construction)."""
        out: dict[int, tuple[int, int]] = {}
        i = 0
        size = 1 << self.max_bits
        while i < size:
            sym, nb = self.symbol[i], self.length[i]
            out[sym] = (i >> (self.max_bits - nb), nb)
            i += 1 << (self.max_bits - nb)
        return out


def huf_read_weights(data: bytes, pos: int) -> tuple[list[int], int]:
    """Huffman tree description -> (explicit weights, bytes consumed)."""
    if pos >= len(data):
        raise ZstdError("missing Huffman tree description")
    head = data[pos]
    pos += 1
    if head >= 128:
        n = head - 127
        raw = data[pos : pos + (n + 1) // 2]
        if len(raw) < (n + 1) // 2:
            raise ZstdError("truncated direct Huffman weights")
        weights = []
        for i in range(n):
            b = raw[i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return weights, 1 + (n + 1) // 2
    # FSE-compressed weights: head = compressed byte count
    comp = data[pos : pos + head]
    if len(comp) < head:
        raise ZstdError("truncated FSE Huffman weights")
    probs, al, used = fse_read_distribution(comp, 0, 255, 6)
    table = FseTable(probs, al)
    stream = BackwardBits(comp[used:])
    s1 = FseState(table, stream)
    s2 = FseState(table, stream)
    weights: list[int] = []
    while True:
        weights.append(s1.symbol())
        s1.update(stream)
        if stream.overflowed:
            weights.append(s2.symbol())
            break
        weights.append(s2.symbol())
        s2.update(stream)
        if stream.overflowed:
            weights.append(s1.symbol())
            break
        if len(weights) > 255:
            raise ZstdError("too many Huffman weights")
    if len(weights) > 255:
        raise ZstdError("too many Huffman weights")
    return weights, 1 + head


# ---------------------------------------------------------------------------
# literals section
# ---------------------------------------------------------------------------


def decode_literals(block: bytes, pos: int, frame) -> tuple[bytes, int]:
    """-> (literals, new position). ``frame.huf_table`` carries the
    treeless-repeat state across blocks of one frame."""
    b0 = block[pos]
    ltype = b0 & 3
    size_format = (b0 >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if size_format in (0, 2):
            regen = b0 >> 3
            pos += 1
        elif size_format == 1:
            regen = (b0 >> 4) | (block[pos + 1] << 4)
            pos += 2
        else:
            regen = (b0 >> 4) | (block[pos + 1] << 4) | (block[pos + 2] << 12)
            pos += 3
        if ltype == 0:
            lits = block[pos : pos + regen]
            if len(lits) < regen:
                raise ZstdError("truncated raw literals")
            return lits, pos + regen
        return bytes([block[pos]]) * regen, pos + 1
    # Huffman-compressed (2) / treeless (3)
    if size_format == 0:
        h = b0 | (block[pos + 1] << 8) | (block[pos + 2] << 16)
        regen = (h >> 4) & 0x3FF
        comp = (h >> 14) & 0x3FF
        streams = 1
        pos += 3
    elif size_format == 1:
        h = b0 | (block[pos + 1] << 8) | (block[pos + 2] << 16)
        regen = (h >> 4) & 0x3FF
        comp = (h >> 14) & 0x3FF
        streams = 4
        pos += 3
    elif size_format == 2:
        h = b0 | (block[pos + 1] << 8) | (block[pos + 2] << 16) | (block[pos + 3] << 24)
        regen = (h >> 4) & 0x3FFF
        comp = (h >> 18) & 0x3FFF
        streams = 4
        pos += 4
    else:
        h = (
            b0
            | (block[pos + 1] << 8)
            | (block[pos + 2] << 16)
            | (block[pos + 3] << 24)
            | (block[pos + 4] << 32)
        )
        regen = (h >> 4) & 0x3FFFF
        comp = (h >> 22) & 0x3FFFF
        streams = 4
        pos += 5
    payload = block[pos : pos + comp]
    if len(payload) < comp:
        raise ZstdError("truncated compressed literals")
    off = 0
    if ltype == 2:
        weights, used = huf_read_weights(payload, 0)
        frame.huf_table = HufTable(weights)
        off = used
    elif frame.huf_table is None:
        raise ZstdError("treeless literals with no previous Huffman table")
    table = frame.huf_table
    body = payload[off:]
    if streams == 1:
        lits = table.decode_stream(BackwardBits(body), regen)
    else:
        if len(body) < 6:
            raise ZstdError("4-stream literals too short for jump table")
        s1, s2, s3 = struct.unpack_from("<3H", body, 0)
        parts = body[6:]
        c1, c2, c3 = parts[:s1], parts[s1 : s1 + s2], parts[s1 + s2 : s1 + s2 + s3]
        c4 = parts[s1 + s2 + s3 :]
        per = (regen + 3) // 4
        last = regen - 3 * per
        if last < 0:
            raise ZstdError("4-stream literals regenerated size too small")
        lits = b"".join(
            table.decode_stream(BackwardBits(c), n)
            for c, n in ((c1, per), (c2, per), (c3, per), (c4, last))
        )
    if len(lits) != regen:
        raise ZstdError("literals regenerated size mismatch")
    return lits, pos + comp

# ---------------------------------------------------------------------------
# sequences section
# ---------------------------------------------------------------------------

_PREDEF_LL = None
_PREDEF_ML = None
_PREDEF_OF = None


def _predefined_tables() -> tuple[FseTable, FseTable, FseTable]:
    global _PREDEF_LL, _PREDEF_ML, _PREDEF_OF
    if _PREDEF_LL is None:
        _PREDEF_LL = FseTable(LL_DEFAULT_DIST, LL_DEFAULT_LOG)
        _PREDEF_ML = FseTable(ML_DEFAULT_DIST, ML_DEFAULT_LOG)
        _PREDEF_OF = FseTable(OF_DEFAULT_DIST, OF_DEFAULT_LOG)
    return _PREDEF_LL, _PREDEF_ML, _PREDEF_OF


class _RleTable(FseTable):
    """A one-symbol, zero-bit FSE table (RLE sequence mode)."""

    def __init__(self, symbol: int):  # noqa: super-init-not-called
        self.accuracy_log = 0
        self.symbol = [symbol]
        self.nb_bits = [0]
        self.baseline = [0]


def _read_seq_table(
    block: bytes,
    pos: int,
    mode: int,
    which: str,
    predefined: FseTable,
    max_symbol: int,
    max_log: int,
    frame,
) -> tuple[FseTable, int]:
    if mode == 0:
        return predefined, pos
    if mode == 1:
        sym = block[pos]
        if sym > max_symbol:
            raise ZstdError(f"{which} RLE symbol {sym} out of range")
        return _RleTable(sym), pos + 1
    if mode == 2:
        probs, al, used = fse_read_distribution(block, pos, max_symbol, max_log)
        return FseTable(probs, al), pos + used
    table = frame.seq_tables.get(which)
    if table is None:
        raise ZstdError(f"{which} repeat mode with no previous table")
    return table, pos


def decode_sequences_section(
    block: bytes, pos: int, frame
) -> list[tuple[int, int, int]]:
    """-> [(literals_length, match_length, offset)] (RFC 8878 3.1.1.4).
    ``frame`` carries table-repeat and repeat-offset state."""
    b0 = block[pos]
    pos += 1
    if b0 == 0:
        if pos != len(block):
            raise ZstdError("trailing bytes after a zero-sequence block")
        return []
    if b0 < 128:
        n = b0
    elif b0 < 255:
        n = ((b0 - 128) << 8) + block[pos]
        pos += 1
    else:
        n = block[pos] + (block[pos + 1] << 8) + 0x7F00
        pos += 2
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise ZstdError("reserved sequence-mode bits set")
    ll_mode, of_mode, ml_mode = (modes >> 6) & 3, (modes >> 4) & 3, (modes >> 2) & 3
    pll, pml, pof = _predefined_tables()
    ll_t, pos = _read_seq_table(block, pos, ll_mode, "ll", pll, LL_MAX_SYMBOL, LL_MAX_LOG, frame)
    of_t, pos = _read_seq_table(block, pos, of_mode, "of", pof, OF_MAX_SYMBOL, OF_MAX_LOG, frame)
    ml_t, pos = _read_seq_table(block, pos, ml_mode, "ml", pml, ML_MAX_SYMBOL, ML_MAX_LOG, frame)
    frame.seq_tables["ll"], frame.seq_tables["of"], frame.seq_tables["ml"] = ll_t, of_t, ml_t

    stream = BackwardBits(block[pos:])
    ll_s = FseState(ll_t, stream)
    of_s = FseState(of_t, stream)
    ml_s = FseState(ml_t, stream)
    out = []
    for i in range(n):
        of_code = of_s.symbol()
        ml_code = ml_s.symbol()
        ll_code = ll_s.symbol()
        # extra bits are read offset, match, literals
        value = (1 << of_code) + stream.read(of_code) if of_code else 1
        ml = ml_decode(ml_code, stream)
        ll = ll_decode(ll_code, stream)
        offset = _apply_offset(value, frame.rep_offsets, ll)
        out.append((ll, ml, offset))
        if i + 1 < n:
            # state updates read literals, match, offset
            ll_s.update(stream)
            ml_s.update(stream)
            of_s.update(stream)
    if stream.overflowed or not stream.exhausted():
        raise ZstdError("sequence bitstream not exactly consumed")
    return out


def _apply_offset(value: int, reps: list[int], ll: int) -> int:
    if value > 3:
        offset = value - 3
        reps[2] = reps[1]
        reps[1] = reps[0]
        reps[0] = offset
        return offset
    idx = value - 1 if ll != 0 else value
    if idx == 0:
        return reps[0]
    if idx < 3:
        offset = reps[idx]
        if idx == 2:
            reps[2] = reps[1]
        reps[1] = reps[0]
        reps[0] = offset
        return offset
    offset = reps[0] - 1
    if offset <= 0:
        raise ZstdError("repeat-offset underflow")
    reps[2] = reps[1]
    reps[1] = reps[0]
    reps[0] = offset
    return offset


def _execute_sequences(
    out: bytearray,
    literals: bytes,
    seqs: list[tuple[int, int, int]],
    frame_start: int,
    block_start: int,
) -> None:
    # Block_Maximum_Size bounds a block's REGENERATED size too —
    # checked incrementally so a few crafted KiB cannot balloon into
    # GiB (decompression bomb) before an end-of-block check would run
    budget_end = block_start + MAX_BLOCK_SIZE
    lpos = 0
    for ll, ml, offset in seqs:
        if lpos + ll > len(literals):
            raise ZstdError("sequence consumes more literals than present")
        if len(out) + ll + ml > budget_end:
            raise ZstdError("block regenerates more than the 128 KiB maximum")
        out += literals[lpos : lpos + ll]
        lpos += ll
        # the window resets per FRAME: a match may reach back across
        # blocks of the same frame, never into a previous frame's output
        if offset > len(out) - frame_start:
            raise ZstdError(
                f"match offset {offset} beyond frame window ({len(out) - frame_start} bytes)"
            )
        if offset >= ml:
            start = len(out) - offset
            out += out[start : start + ml]
        else:
            for _ in range(ml):  # overlapping copy, byte at a time
                out.append(out[-offset])
    if len(out) + (len(literals) - lpos) > budget_end:
        raise ZstdError("block regenerates more than the 128 KiB maximum")
    out += literals[lpos:]


# ---------------------------------------------------------------------------
# frame decoding
# ---------------------------------------------------------------------------


class _FrameState:
    __slots__ = ("huf_table", "seq_tables", "rep_offsets")

    def __init__(self):
        self.huf_table: HufTable | None = None
        self.seq_tables: dict[str, FseTable] = {}
        self.rep_offsets = [1, 4, 8]


def _decode_block(
    block: bytes, frame: _FrameState, out: bytearray, frame_start: int
) -> None:
    block_start = len(out)
    literals, pos = decode_literals(block, 0, frame)
    seqs = decode_sequences_section(block, pos, frame)
    _execute_sequences(out, literals, seqs, frame_start, block_start)


def zstd_decompress(buf: bytes) -> bytes:
    """Decompress a sequence of zstd frames (skippable frames are
    skipped). Raises ZstdError on any malformed input (bounds errors
    from truncated fields are converted, so callers see ONE typed
    error)."""
    try:
        return _zstd_decompress_inner(buf)
    except (IndexError, struct.error, OverflowError) as e:
        raise ZstdError(f"truncated or malformed zstd input: {e}") from e


def _zstd_decompress_inner(buf: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(buf):
        if len(buf) - pos < 4:
            raise ZstdError("truncated frame magic")
        (magic,) = struct.unpack_from("<I", buf, pos)
        if SKIPPABLE_MAGIC_MIN <= magic <= SKIPPABLE_MAGIC_MAX:
            if pos + 8 > len(buf):
                raise ZstdError("truncated skippable frame header")
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            if pos + 8 + size > len(buf):
                raise ZstdError("skippable frame overruns input")
            pos += 8 + size
            continue
        if magic != ZSTD_MAGIC:
            raise ZstdError(f"bad zstd magic 0x{magic:08x}")
        pos += 4
        fhd = buf[pos]
        pos += 1
        fcs_flag = fhd >> 6
        single_segment = bool(fhd & 0x20)
        if fhd & 0x08:
            raise ZstdError("reserved frame-header bit set")
        has_checksum = bool(fhd & 0x04)
        did_flag = fhd & 3
        if did_flag:
            did = int.from_bytes(buf[pos + (0 if single_segment else 1) :][: (0, 1, 2, 4)[did_flag]], "little")
            if did:
                # decoding a dictionary frame without its dictionary
                # would produce silently wrong output — refuse loudly
                raise ZstdError(f"frame references dictionary {did}; dictionaries unsupported")
        if not single_segment:
            pos += 1  # window descriptor (we keep the whole frame in memory)
        pos += (0, 1, 2, 4)[did_flag]
        fcs = None
        fcs_len = {0: 1 if single_segment else 0, 1: 2, 2: 4, 3: 8}[fcs_flag]
        if fcs_len:
            fcs = int.from_bytes(buf[pos : pos + fcs_len], "little")
            if fcs_flag == 1:
                fcs += 256
            pos += fcs_len
        frame = _FrameState()
        frame_start = len(out)
        while True:
            header = buf[pos] | (buf[pos + 1] << 8) | (buf[pos + 2] << 16)
            pos += 3
            last = header & 1
            btype = (header >> 1) & 3
            bsize = header >> 3
            if btype in (0, 1) and bsize > MAX_BLOCK_SIZE:
                # Block_Maximum_Size applies to every block type; the
                # 21-bit size field can claim up to 2 MiB-1
                raise ZstdError(f"block size {bsize} > 128 KiB maximum")
            if btype == 0:
                if pos + bsize > len(buf):
                    raise ZstdError("truncated raw block")
                out += buf[pos : pos + bsize]
                pos += bsize
            elif btype == 1:
                if pos >= len(buf):
                    raise ZstdError("truncated RLE block")
                out += bytes([buf[pos]]) * bsize
                pos += 1
            elif btype == 2:
                if bsize > MAX_BLOCK_SIZE:
                    raise ZstdError(f"compressed block {bsize} > 128 KiB")
                _decode_block(buf[pos : pos + bsize], frame, out, frame_start)
                pos += bsize
            else:
                raise ZstdError("reserved block type")
            if last:
                break
        if fcs is not None and len(out) - frame_start != fcs:
            raise ZstdError(
                f"frame content size mismatch: {len(out) - frame_start} != {fcs}"
            )
        if has_checksum:
            (want,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            view = memoryview(out)[frame_start:]
            try:
                got = xxh64(view) & 0xFFFFFFFF
            finally:
                view.release()
            if got != want:
                raise ZstdError(f"content checksum mismatch {got:08x} != {want:08x}")
    return bytes(out)

# ---------------------------------------------------------------------------
# encoder (conformant subset; see module docstring)
# ---------------------------------------------------------------------------


class _BackwardWriter:
    """Accumulates (value, nbits) writes in DECODER-READ order and
    renders the back-to-front byte stream with its sentinel bit."""

    def __init__(self):
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        if value < 0 or value >= (1 << nbits):
            raise ZstdError(f"backward write {value} does not fit {nbits} bits")
        self.acc = (self.acc << nbits) | value
        self.nbits += nbits

    def render(self) -> bytes:
        total = self.nbits + 1  # sentinel
        v = (1 << self.nbits) | self.acc
        return v.to_bytes((total + 7) // 8, "little")


def _fse_state_chain(table: FseTable, codes: list[int]) -> tuple[int, list[tuple[int, int]]]:
    """Choose decode states x_0..x_{n-1} with symbol(x_i) = codes[i]
    by walking the decode table backward: for any target state and
    required symbol, the predecessor is the unique state of that
    symbol whose (baseline, nb_bits) window covers the target.
    -> (x_0, [(update_bits_value, nb) for transitions 0..n-2])."""
    size = len(table.symbol)
    by_symbol: dict[int, list[int]] = {}
    for st in range(size):
        by_symbol.setdefault(table.symbol[st], []).append(st)
    x = by_symbol[codes[-1]][0]
    updates: list[tuple[int, int]] = []
    for i in range(len(codes) - 2, -1, -1):
        prev = None
        for st in by_symbol[codes[i]]:
            base, nb = table.baseline[st], table.nb_bits[st]
            if base <= x < base + (1 << nb):
                prev = st
                updates.append((x - base, nb))
                break
        if prev is None:
            raise ZstdError("FSE encode: no predecessor state (corrupt table)")
        x = prev
    updates.reverse()
    return x, updates


def _ll_code(v: int) -> tuple[int, int, int]:
    """literals length -> (code, extra value, extra bits)."""
    if v < 16:
        return v, 0, 0
    for i in range(len(LL_CODE_TABLE) - 1, -1, -1):
        base, bits = LL_CODE_TABLE[i]
        if v >= base:
            return 16 + i, v - base, bits
    raise ZstdError(f"unencodable literals length {v}")


def _ml_code(v: int) -> tuple[int, int, int]:
    if v < 3:
        raise ZstdError(f"match length {v} < 3")
    if v < 35:
        return v - 3, 0, 0
    for i in range(len(ML_CODE_TABLE) - 1, -1, -1):
        base, bits = ML_CODE_TABLE[i]
        if v >= base:
            return 32 + i, v - base, bits
    raise ZstdError(f"unencodable match length {v}")


def _huffman_lengths(freqs: dict[int, int]) -> dict[int, int] | None:
    """Plain Huffman code lengths via a heap; None when the tree
    exceeds the 11-bit zstd limit (caller falls back to raw)."""
    import heapq

    if len(freqs) < 2:
        return None
    heap = [(n, sym, None) for sym, n in freqs.items()]
    heapq.heapify(heap)
    nodes = {}
    nid = 0
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        nid += 1
        nodes[f"n{nid}"] = (a, b)
        heapq.heappush(heap, (a[0] + b[0], 256 + nid, f"n{nid}"))
    lengths: dict[int, int] = {}

    def walk(entry, depth):
        _, sym, ref = entry
        if ref is None:
            lengths[sym] = max(depth, 1)
            return
        a, b = nodes[ref]
        walk(a, depth + 1)
        walk(b, depth + 1)

    walk(heap[0], 0)
    if max(lengths.values()) > 11:
        return None
    return lengths


def _encode_huffman_literals(lits: bytes) -> bytes | None:
    """Literals section with Huffman-compressed payload and a direct
    weight description; None when Huffman cannot help (raw fallback)."""
    freqs: dict[int, int] = {}
    for b in lits:
        freqs[b] = freqs.get(b, 0) + 1
    lengths = _huffman_lengths(freqs)
    if lengths is None:
        return None
    max_len = max(lengths.values())
    last_sym = max(lengths)
    weights_full = [0] * (last_sym + 1)
    for sym, ln in lengths.items():
        weights_full[sym] = max_len + 1 - ln
    explicit = weights_full[:-1]
    if len(explicit) > 128:
        return None  # direct description caps at 128 explicit weights
    table = HufTable(explicit)
    codes = table.codes()
    # weight description (direct): header 127 + n, high nibble first
    n = len(explicit)
    desc = bytearray([127 + n])
    for i in range(0, n, 2):
        hi = explicit[i] << 4
        lo = explicit[i + 1] if i + 1 < n else 0
        desc.append(hi | lo)
    regen = len(lits)
    if regen <= 1023:
        # single stream, size_format 00
        w = _BackwardWriter()
        for b in lits:
            code, nb = codes[b]
            w.write(code, nb)
        payload = bytes(desc) + w.render()
        comp = len(payload)
        if comp > 1023 or comp >= regen:
            return None
        h = 2 | (0 << 2) | (regen << 4) | (comp << 14)
        return bytes([h & 0xFF, (h >> 8) & 0xFF, (h >> 16) & 0xFF]) + payload
    # four streams, size_format 10 (14-bit sizes)
    per = (regen + 3) // 4
    chunks = [lits[0:per], lits[per : 2 * per], lits[2 * per : 3 * per], lits[3 * per :]]
    streams = []
    for c in chunks:
        w = _BackwardWriter()
        for b in c:
            code, nb = codes[b]
            w.write(code, nb)
        streams.append(w.render())
    jump = struct.pack("<3H", len(streams[0]), len(streams[1]), len(streams[2]))
    payload = bytes(desc) + jump + b"".join(streams)
    comp = len(payload)
    if regen > 16383 or comp > 16383 or comp >= regen:
        return None
    h = 2 | (2 << 2) | (regen << 4) | (comp << 18)
    return bytes(
        [h & 0xFF, (h >> 8) & 0xFF, (h >> 16) & 0xFF, (h >> 24) & 0xFF]
    ) + payload


def _encode_literals_section(lits: bytes) -> bytes:
    if len(lits) > 1 and len(set(lits)) == 1:
        # RLE literals
        regen = len(lits)
        if regen < 32:
            return bytes([1 | (0 << 2) | (regen << 3), lits[0]])
        if regen < 4096:
            h = 1 | (1 << 2) | (regen << 4)
            return bytes([h & 0xFF, (h >> 8) & 0xFF, lits[0]])
        h = 1 | (3 << 2) | (regen << 4)
        return bytes([h & 0xFF, (h >> 8) & 0xFF, (h >> 16) & 0xFF, lits[0]])
    if len(lits) >= 64:
        huf = _encode_huffman_literals(lits)
        if huf is not None:
            return huf
    regen = len(lits)
    if regen < 32:
        return bytes([0 | (0 << 2) | (regen << 3)]) + lits
    if regen < 4096:
        h = 0 | (1 << 2) | (regen << 4)
        return bytes([h & 0xFF, (h >> 8) & 0xFF]) + lits
    h = 0 | (3 << 2) | (regen << 4)
    return bytes([h & 0xFF, (h >> 8) & 0xFF, (h >> 16) & 0xFF]) + lits


def _find_sequences(data: bytes) -> tuple[list[tuple[int, int, int]], bytes]:
    """Greedy hash-4 LZ parse -> ([(ll, ml, offset)], literals)."""
    n = len(data)
    table: dict[bytes, int] = {}
    seqs: list[tuple[int, int, int]] = []
    lits = bytearray()
    i = 0
    anchor = 0
    while i + 4 <= n:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None:
            ml = 4
            while i + ml < n and data[cand + ml] == data[i + ml]:
                ml += 1
            # zstd requires the last sequence to leave no dangling match
            # past the block; greedy emit is fine
            ll = i - anchor
            lits += data[anchor:i]
            seqs.append((ll, ml, i - cand))
            i += ml
            anchor = i
        else:
            i += 1
    lits += data[anchor:]
    return seqs, bytes(lits)


def _encode_sequences_section(seqs: list[tuple[int, int, int]]) -> bytes:
    if not seqs:
        return b"\x00"
    n = len(seqs)
    if n < 128:
        head = bytes([n])
    elif n < 0x7F00:
        head = bytes([128 + (n >> 8), n & 0xFF])
    else:
        m = n - 0x7F00  # 3-byte form encodes n - 0x7F00 (decoder adds it back)
        head = bytes([255, m & 0xFF, (m >> 8) & 0xFF])
    modes = 0  # predefined tables for LL, OF, ML
    pll, pml, pof = _predefined_tables()
    ll_parts, ml_parts, of_parts = [], [], []
    for ll, ml, offset in seqs:
        ll_parts.append(_ll_code(ll))
        ml_parts.append(_ml_code(ml))
        value = offset + 3  # no repeat-offset use on the encode side
        code = value.bit_length() - 1
        of_parts.append((code, value - (1 << code), code))
    ll0, ll_updates = _fse_state_chain(pll, [c for c, _, _ in ll_parts])
    ml0, ml_updates = _fse_state_chain(pml, [c for c, _, _ in ml_parts])
    of0, of_updates = _fse_state_chain(pof, [c for c, _, _ in of_parts])
    w = _BackwardWriter()
    w.write(ll0, pll.accuracy_log)
    w.write(of0, pof.accuracy_log)
    w.write(ml0, pml.accuracy_log)
    for i in range(n):
        _, ofv, ofb = of_parts[i]
        _, mlv, mlb = ml_parts[i]
        _, llv, llb = ll_parts[i]
        w.write(ofv, ofb)
        w.write(mlv, mlb)
        w.write(llv, llb)
        if i + 1 < n:
            w.write(*ll_updates[i])
            w.write(*ml_updates[i])
            w.write(*of_updates[i])
    return head + bytes([modes]) + w.render()


def zstd_compress(data: bytes, checksum: bool = True, block_size: int = 1 << 16) -> bytes:
    """Compress into a single zstd frame (single-segment, frame
    content size always present) using the encoder subset."""
    if not 1 <= block_size <= MAX_BLOCK_SIZE:
        raise ValueError(f"block_size must be in [1, {MAX_BLOCK_SIZE}], got {block_size}")
    out = bytearray(struct.pack("<I", ZSTD_MAGIC))
    n = len(data)
    fhd = 0x20 | (0x04 if checksum else 0)
    if n < 256:
        out.append(fhd)
        out.append(n)
    elif n < 65536 + 256:
        out.append(fhd | 0x40)
        out += struct.pack("<H", n - 256)
    else:
        out.append(fhd | 0x80)
        out += struct.pack("<I", n)
    chunks = [data[i : i + block_size] for i in range(0, n, block_size)] or [b""]
    for ci, chunk in enumerate(chunks):
        last = 1 if ci == len(chunks) - 1 else 0
        if len(chunk) > 1 and len(set(chunk)) == 1:
            header = last | (1 << 1) | (len(chunk) << 3)
            out += bytes([header & 0xFF, (header >> 8) & 0xFF, (header >> 16) & 0xFF])
            out.append(chunk[0])
            continue
        body = None
        if len(chunk) >= 32:
            seqs, lits = _find_sequences(chunk)
            cand = _encode_literals_section(lits) + _encode_sequences_section(seqs)
            if len(cand) < len(chunk):
                body = cand
        if body is not None:
            header = last | (2 << 1) | (len(body) << 3)
            out += bytes([header & 0xFF, (header >> 8) & 0xFF, (header >> 16) & 0xFF])
            out += body
        else:
            header = last | (0 << 1) | (len(chunk) << 3)
            out += bytes([header & 0xFF, (header >> 8) & 0xFF, (header >> 16) & 0xFF])
            out += chunk
    if checksum:
        out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)

"""HTTP/2 + HPACK wire subset for the gRPC transport (RFC 7540 / RFC 7541).

The reference's *default* client scheme is ``grpc://`` (client/clip_client/
client.py:29-54 parses grpc|grpcs first-class; every Flow in its test suite
speaks it). This container has no grpcio, so the transport is implemented
from the public specs, the same first-principles route as the image codecs:

- HTTP/2 framing (RFC 7540 §4-6): DATA / HEADERS / CONTINUATION / SETTINGS /
  PING / GOAWAY / WINDOW_UPDATE / RST_STREAM, client preface, stream states
  sufficient for unary RPC (one request message, one response + trailers).
- HPACK (RFC 7541): full static table, dynamic table with eviction, all four
  literal representations, integer prefix coding, and Appendix-B static
  Huffman coding (decode always; encode opt-in via HpackEncoder(huffman=True)
  — the in-repo peers default to raw literals for wire-byte stability, but a
  real gRPC client's Huffman-coded headers now decode correctly).

Flow control: both ends raise the connection + initial stream windows to the
RFC maximum right after the preface (SETTINGS INITIAL_WINDOW_SIZE +
connection WINDOW_UPDATE), and the send path *verifies* the credit rather
than blocking on it — a peer that never raised its window raises a
ConnectionError naming the missing WINDOW_UPDATE.
"""

from __future__ import annotations

import struct

# frame types (RFC 7540 §6)
DATA = 0x0
HEADERS = 0x1
PRIORITY = 0x2
RST_STREAM = 0x3
SETTINGS = 0x4
PUSH_PROMISE = 0x5
PING = 0x6
GOAWAY = 0x7
WINDOW_UPDATE = 0x8
CONTINUATION = 0x9

# flags
FLAG_END_STREAM = 0x1
FLAG_ACK = 0x1
FLAG_END_HEADERS = 0x4
FLAG_PADDED = 0x8
FLAG_PRIORITY = 0x20

SETTINGS_HEADER_TABLE_SIZE = 0x1
SETTINGS_MAX_CONCURRENT_STREAMS = 0x3
SETTINGS_INITIAL_WINDOW_SIZE = 0x4
SETTINGS_MAX_FRAME_SIZE = 0x5

PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"
DEFAULT_WINDOW = 65_535
MAX_WINDOW = (1 << 31) - 1
MAX_FRAME = 16_384  # we never negotiate larger


def pack_frame(ftype: int, flags: int, stream_id: int, payload: bytes) -> bytes:
    if len(payload) > (1 << 24) - 1:
        raise ValueError("frame too large")
    hdr = struct.pack(">I", len(payload))[1:] + bytes(
        (ftype, flags)
    ) + struct.pack(">I", stream_id & 0x7FFFFFFF)
    return hdr + payload


def read_exact(sock, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-frame")
        buf += chunk
    return bytes(buf)


def read_frame(sock) -> tuple[int, int, int, bytes]:
    """-> (type, flags, stream_id, payload)."""
    hdr = read_exact(sock, 9)
    length = int.from_bytes(hdr[:3], "big")
    ftype, flags = hdr[3], hdr[4]
    stream_id = int.from_bytes(hdr[5:9], "big") & 0x7FFFFFFF
    payload = read_exact(sock, length) if length else b""
    return ftype, flags, stream_id, payload


def settings_payload(pairs: dict[int, int]) -> bytes:
    return b"".join(struct.pack(">HI", k, v) for k, v in pairs.items())


def parse_settings(payload: bytes) -> dict[int, int]:
    out = {}
    for off in range(0, len(payload), 6):
        k, v = struct.unpack(">HI", payload[off : off + 6])
        out[k] = v
    return out


def strip_padding(flags: int, payload: bytes, *, priority: bool = False) -> bytes:
    """Remove PADDED / PRIORITY envelope from a HEADERS/DATA payload.

    RFC 7540 §6.1: pad length >= remaining payload is a PROTOCOL_ERROR —
    raise rather than return a silently wrong slice."""
    pad = 0
    if flags & FLAG_PADDED:
        if not payload:
            raise ConnectionError("PADDED frame with empty payload")
        pad = payload[0]
        payload = payload[1:]
    if priority and (flags & FLAG_PRIORITY):
        payload = payload[5:]  # stream dep (4) + weight (1)
    if pad:
        if pad >= len(payload):
            raise ConnectionError(
                f"HTTP/2 pad length {pad} >= payload {len(payload)} "
                "(PROTOCOL_ERROR, RFC 7540 §6.1)"
            )
        payload = payload[: len(payload) - pad]
    return payload


# ---------------------------------------------------------------- HPACK ----

# RFC 7541 Appendix A — the full static table.
STATIC_TABLE: list[tuple[str, str]] = [
    (":authority", ""),
    (":method", "GET"),
    (":method", "POST"),
    (":path", "/"),
    (":path", "/index.html"),
    (":scheme", "http"),
    (":scheme", "https"),
    (":status", "200"),
    (":status", "204"),
    (":status", "206"),
    (":status", "304"),
    (":status", "400"),
    (":status", "404"),
    (":status", "500"),
    ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"),
    ("accept-language", ""),
    ("accept-ranges", ""),
    ("accept", ""),
    ("access-control-allow-origin", ""),
    ("age", ""),
    ("allow", ""),
    ("authorization", ""),
    ("cache-control", ""),
    ("content-disposition", ""),
    ("content-encoding", ""),
    ("content-language", ""),
    ("content-length", ""),
    ("content-location", ""),
    ("content-range", ""),
    ("content-type", ""),
    ("cookie", ""),
    ("date", ""),
    ("etag", ""),
    ("expect", ""),
    ("expires", ""),
    ("from", ""),
    ("host", ""),
    ("if-match", ""),
    ("if-modified-since", ""),
    ("if-none-match", ""),
    ("if-range", ""),
    ("if-unmodified-since", ""),
    ("last-modified", ""),
    ("link", ""),
    ("location", ""),
    ("max-forwards", ""),
    ("proxy-authenticate", ""),
    ("proxy-authorization", ""),
    ("range", ""),
    ("referer", ""),
    ("refresh", ""),
    ("retry-after", ""),
    ("server", ""),
    ("set-cookie", ""),
    ("strict-transport-security", ""),
    ("transfer-encoding", ""),
    ("user-agent", ""),
    ("vary", ""),
    ("via", ""),
    ("www-authenticate", ""),
]


def _encode_int(value: int, prefix_bits: int, first_byte: int = 0) -> bytes:
    """RFC 7541 §5.1 prefix integer; ``first_byte`` carries the pattern bits."""
    limit = (1 << prefix_bits) - 1
    if value < limit:
        return bytes((first_byte | value,))
    out = bytearray((first_byte | limit,))
    value -= limit
    while value >= 128:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


def _decode_int(data: bytes, pos: int, prefix_bits: int) -> tuple[int, int]:
    limit = (1 << prefix_bits) - 1
    value = data[pos] & limit
    pos += 1
    if value < limit:
        return value, pos
    shift = 0
    while True:
        if shift > 63:  # ~10 continuation bytes: no sane header needs more
            raise ConnectionError(
                "HPACK integer with unbounded continuation bytes "
                "(COMPRESSION_ERROR)"
            )
        b = data[pos]
        pos += 1
        value += (b & 0x7F) << shift
        shift += 7
        if not (b & 0x80):
            return value, pos


# RFC 7541 Appendix B — static Huffman code, (code, bit-length) per symbol
# 0..255 plus EOS (index 256). Verified against the RFC's own C.4/C.6
# request/response examples in tests/test_grpc.py.
HUFFMAN_TABLE: list[tuple[int, int]] = [
    (0x1FF8, 13), (0x7FFFD8, 23), (0xFFFFFE2, 28), (0xFFFFFE3, 28),
    (0xFFFFFE4, 28), (0xFFFFFE5, 28), (0xFFFFFE6, 28), (0xFFFFFE7, 28),
    (0xFFFFFE8, 28), (0xFFFFEA, 24), (0x3FFFFFFC, 30), (0xFFFFFE9, 28),
    (0xFFFFFEA, 28), (0x3FFFFFFD, 30), (0xFFFFFEB, 28), (0xFFFFFEC, 28),
    (0xFFFFFED, 28), (0xFFFFFEE, 28), (0xFFFFFEF, 28), (0xFFFFFF0, 28),
    (0xFFFFFF1, 28), (0xFFFFFF2, 28), (0x3FFFFFFE, 30), (0xFFFFFF3, 28),
    (0xFFFFFF4, 28), (0xFFFFFF5, 28), (0xFFFFFF6, 28), (0xFFFFFF7, 28),
    (0xFFFFFF8, 28), (0xFFFFFF9, 28), (0xFFFFFFA, 28), (0xFFFFFFB, 28),
    (0x14, 6), (0x3F8, 10), (0x3F9, 10), (0xFFA, 12),
    (0x1FF9, 13), (0x15, 6), (0xF8, 8), (0x7FA, 11),
    (0x3FA, 10), (0x3FB, 10), (0xF9, 8), (0x7FB, 11),
    (0xFA, 8), (0x16, 6), (0x17, 6), (0x18, 6),
    (0x0, 5), (0x1, 5), (0x2, 5), (0x19, 6),
    (0x1A, 6), (0x1B, 6), (0x1C, 6), (0x1D, 6),
    (0x1E, 6), (0x1F, 6), (0x5C, 7), (0xFB, 8),
    (0x7FFC, 15), (0x20, 6), (0xFFB, 12), (0x3FC, 10),
    (0x1FFA, 13), (0x21, 6), (0x5D, 7), (0x5E, 7),
    (0x5F, 7), (0x60, 7), (0x61, 7), (0x62, 7),
    (0x63, 7), (0x64, 7), (0x65, 7), (0x66, 7),
    (0x67, 7), (0x68, 7), (0x69, 7), (0x6A, 7),
    (0x6B, 7), (0x6C, 7), (0x6D, 7), (0x6E, 7),
    (0x6F, 7), (0x70, 7), (0x71, 7), (0x72, 7),
    (0xFC, 8), (0x73, 7), (0xFD, 8), (0x1FFB, 13),
    (0x7FFF0, 19), (0x1FFC, 13), (0x3FFC, 14), (0x22, 6),
    (0x7FFD, 15), (0x3, 5), (0x23, 6), (0x4, 5),
    (0x24, 6), (0x5, 5), (0x25, 6), (0x26, 6),
    (0x27, 6), (0x6, 5), (0x74, 7), (0x75, 7),
    (0x28, 6), (0x29, 6), (0x2A, 6), (0x7, 5),
    (0x2B, 6), (0x76, 7), (0x2C, 6), (0x8, 5),
    (0x9, 5), (0x2D, 6), (0x77, 7), (0x78, 7),
    (0x79, 7), (0x7A, 7), (0x7B, 7), (0x7FFE, 15),
    (0x7FC, 11), (0x3FFD, 14), (0x1FFD, 13), (0xFFFFFFC, 28),
    (0xFFFE6, 20), (0x3FFFD2, 22), (0xFFFE7, 20), (0xFFFE8, 20),
    (0x3FFFD3, 22), (0x3FFFD4, 22), (0x3FFFD5, 22), (0x7FFFD9, 23),
    (0x3FFFD6, 22), (0x7FFFDA, 23), (0x7FFFDB, 23), (0x7FFFDC, 23),
    (0x7FFFDD, 23), (0x7FFFDE, 23), (0xFFFFEB, 24), (0x7FFFDF, 23),
    (0xFFFFEC, 24), (0xFFFFED, 24), (0x3FFFD7, 22), (0x7FFFE0, 23),
    (0xFFFFEE, 24), (0x7FFFE1, 23), (0x7FFFE2, 23), (0x7FFFE3, 23),
    (0x7FFFE4, 23), (0x1FFFDC, 21), (0x3FFFD8, 22), (0x7FFFE5, 23),
    (0x3FFFD9, 22), (0x7FFFE6, 23), (0x7FFFE7, 23), (0xFFFFEF, 24),
    (0x3FFFDA, 22), (0x1FFFDD, 21), (0xFFFE9, 20), (0x3FFFDB, 22),
    (0x3FFFDC, 22), (0x7FFFE8, 23), (0x7FFFE9, 23), (0x1FFFDE, 21),
    (0x7FFFEA, 23), (0x3FFFDD, 22), (0x3FFFDE, 22), (0xFFFFF0, 24),
    (0x1FFFDF, 21), (0x3FFFDF, 22), (0x7FFFEB, 23), (0x7FFFEC, 23),
    (0x1FFFE0, 21), (0x1FFFE1, 21), (0x3FFFE0, 22), (0x1FFFE2, 21),
    (0x7FFFED, 23), (0x3FFFE1, 22), (0x7FFFEE, 23), (0x7FFFEF, 23),
    (0xFFFEA, 20), (0x3FFFE2, 22), (0x3FFFE3, 22), (0x3FFFE4, 22),
    (0x7FFFF0, 23), (0x3FFFE5, 22), (0x3FFFE6, 22), (0x7FFFF1, 23),
    (0x3FFFFE0, 26), (0x3FFFFE1, 26), (0xFFFEB, 20), (0x7FFF1, 19),
    (0x3FFFE7, 22), (0x7FFFF2, 23), (0x3FFFE8, 22), (0x1FFFFEC, 25),
    (0x3FFFFE2, 26), (0x3FFFFE3, 26), (0x3FFFFE4, 26), (0x7FFFFDE, 27),
    (0x7FFFFDF, 27), (0x3FFFFE5, 26), (0xFFFFF1, 24), (0x1FFFFED, 25),
    (0x7FFF2, 19), (0x1FFFE3, 21), (0x3FFFFE6, 26), (0x7FFFFE0, 27),
    (0x7FFFFE1, 27), (0x3FFFFE7, 26), (0x7FFFFE2, 27), (0xFFFFF2, 24),
    (0x1FFFE4, 21), (0x1FFFE5, 21), (0x3FFFFE8, 26), (0x3FFFFE9, 26),
    (0xFFFFFFD, 28), (0x7FFFFE3, 27), (0x7FFFFE4, 27), (0x7FFFFE5, 27),
    (0xFFFEC, 20), (0xFFFFF3, 24), (0xFFFED, 20), (0x1FFFE6, 21),
    (0x3FFFE9, 22), (0x1FFFE7, 21), (0x1FFFE8, 21), (0x7FFFF3, 23),
    (0x3FFFEA, 22), (0x3FFFEB, 22), (0x1FFFFEE, 25), (0x1FFFFEF, 25),
    (0xFFFFF4, 24), (0xFFFFF5, 24), (0x3FFFFEA, 26), (0x7FFFF4, 23),
    (0x3FFFFEB, 26), (0x7FFFFE6, 27), (0x3FFFFEC, 26), (0x3FFFFED, 26),
    (0x7FFFFE7, 27), (0x7FFFFE8, 27), (0x7FFFFE9, 27), (0x7FFFFEA, 27),
    (0x7FFFFEB, 27), (0xFFFFFFE, 28), (0x7FFFFEC, 27), (0x7FFFFED, 27),
    (0x7FFFFEE, 27), (0x7FFFFEF, 27), (0x7FFFFF0, 27), (0x3FFFFEE, 26),
    (0x3FFFFFFF, 30),
]

# (code, length) -> symbol, for the bit-walk decoder; 5 is the shortest code.
_HUFF_DECODE: dict[tuple[int, int], int] = {
    (code, length): sym for sym, (code, length) in enumerate(HUFFMAN_TABLE)
}
_HUFF_MIN_LEN = 5
_EOS = 256


def huffman_encode(raw: bytes) -> bytes:
    """RFC 7541 §5.2: concatenated MSB-first codes, padded to a byte
    boundary with the EOS prefix (all-ones)."""
    acc = 0
    nbits = 0
    out = bytearray()
    for b in raw:
        code, length = HUFFMAN_TABLE[b]
        acc = (acc << length) | code
        nbits += length
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1  # drop flushed bits: keep acc bounded
    if nbits:
        pad = 8 - nbits
        out.append(((acc << pad) | ((1 << pad) - 1)) & 0xFF)
    return bytes(out)


def huffman_decode(data: bytes) -> bytes:
    """Bit-walk decode against the static table. Padding must be a strict
    EOS prefix (< 8 bits, all ones); an embedded EOS or bad padding raises
    ConnectionError (COMPRESSION_ERROR per RFC 7541 §5.2)."""
    out = bytearray()
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        # greedily peel complete codes off the high end
        while nbits >= _HUFF_MIN_LEN:
            for length in range(_HUFF_MIN_LEN, min(nbits, 30) + 1):
                sym = _HUFF_DECODE.get(
                    ((acc >> (nbits - length)) & ((1 << length) - 1), length)
                )
                if sym is not None:
                    if sym == _EOS:
                        raise ConnectionError(
                            "HPACK Huffman: embedded EOS (COMPRESSION_ERROR)"
                        )
                    out.append(sym)
                    nbits -= length
                    acc &= (1 << nbits) - 1
                    break
            else:
                break  # need more input bits
    if nbits >= 8:
        raise ConnectionError("HPACK Huffman: undecodable trailing code")
    if nbits and (acc & ((1 << nbits) - 1)) != (1 << nbits) - 1:
        raise ConnectionError(
            "HPACK Huffman: padding is not an EOS prefix (COMPRESSION_ERROR)"
        )
    return bytes(out)


def _encode_str(s: str, *, huffman: bool = False) -> bytes:
    raw = s.encode("utf-8")
    if huffman:
        enc = huffman_encode(raw)
        return _encode_int(len(enc), 7, 0x80) + enc  # H=1
    return _encode_int(len(raw), 7, 0x00) + raw  # H=0: raw literal


class HpackEncoder:
    """Emits every field as Literal Without Indexing / New Name — always
    legal, stateless, and keeps the peer's dynamic table untouched.
    ``huffman=True`` Huffman-codes the string literals (RFC 7541 §5.2);
    default stays raw for wire-byte stability between the in-repo peers."""

    def __init__(self, *, huffman: bool = False):
        self.huffman = huffman

    def encode(self, headers: list[tuple[str, str]]) -> bytes:
        out = bytearray()
        for name, value in headers:
            out.append(0x00)  # literal w/o indexing, new name
            out += _encode_str(name.lower(), huffman=self.huffman)
            out += _encode_str(value, huffman=self.huffman)
        return bytes(out)


class HpackDecoder:
    """Full HPACK decode, including Huffman-coded string literals."""

    def __init__(self, max_table_size: int = 4096):
        self.dynamic: list[tuple[str, str]] = []
        self.max_size = max_table_size
        self.size = 0

    def _entry(self, index: int) -> tuple[str, str]:
        if index <= 0:
            raise ValueError("HPACK index 0")
        if index <= len(STATIC_TABLE):
            return STATIC_TABLE[index - 1]
        d = index - len(STATIC_TABLE) - 1
        if d >= len(self.dynamic):
            raise ValueError(f"HPACK index {index} out of table")
        return self.dynamic[d]

    def _add(self, name: str, value: str) -> None:
        entry_size = len(name.encode()) + len(value.encode()) + 32
        self.dynamic.insert(0, (name, value))
        self.size += entry_size
        while self.size > self.max_size and self.dynamic:
            n, v = self.dynamic.pop()
            self.size -= len(n.encode()) + len(v.encode()) + 32

    def _read_str(self, data: bytes, pos: int) -> tuple[str, int]:
        huff = bool(data[pos] & 0x80)
        length, pos = _decode_int(data, pos, 7)
        raw = data[pos : pos + length]
        if len(raw) < length:
            raise ConnectionError("HPACK string literal truncated")
        if huff:
            raw = huffman_decode(raw)
        return raw.decode("utf-8"), pos + length

    def decode(self, data: bytes) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        pos = 0
        while pos < len(data):
            b = data[pos]
            if b & 0x80:  # indexed
                idx, pos = _decode_int(data, pos, 7)
                out.append(self._entry(idx))
            elif (b & 0xC0) == 0x40:  # literal, incremental indexing
                idx, pos = _decode_int(data, pos, 6)
                name = self._entry(idx)[0] if idx else None
                if name is None:
                    name, pos = self._read_str(data, pos)
                value, pos = self._read_str(data, pos)
                self._add(name, value)
                out.append((name, value))
            elif (b & 0xE0) == 0x20:  # dynamic table size update
                new_size, pos = _decode_int(data, pos, 5)
                self.max_size = new_size
                while self.size > self.max_size and self.dynamic:
                    n, v = self.dynamic.pop()
                    self.size -= len(n.encode()) + len(v.encode()) + 32
            else:  # literal w/o indexing (0x00) or never-indexed (0x10)
                idx, pos = _decode_int(data, pos, 4)
                name = self._entry(idx)[0] if idx else None
                if name is None:
                    name, pos = self._read_str(data, pos)
                value, pos = self._read_str(data, pos)
                out.append((name, value))
        return out


class SendWindow:
    """Peer-granted send credit (connection or stream). Both ends of this
    transport raise windows to MAX right after the preface; running out
    therefore means a protocol bug, so ``take`` fails loudly instead of
    blocking (which would deadlock a single-threaded frame loop)."""

    def __init__(self, initial: int = DEFAULT_WINDOW):
        self.credit = initial

    def grant(self, n: int) -> None:
        self.credit = min(self.credit + n, MAX_WINDOW)

    def take(self, n: int) -> None:
        if n > self.credit:
            raise ConnectionError(
                f"HTTP/2 send window exhausted ({n} > {self.credit}); peer "
                "never sent WINDOW_UPDATE — not a cas-ray peer?"
            )
        self.credit -= n


def raise_windows_frames() -> bytes:
    """SETTINGS(initial window = MAX) + connection WINDOW_UPDATE to MAX —
    sent by both ends right after the preface."""
    return pack_frame(
        SETTINGS, 0, 0,
        settings_payload({SETTINGS_INITIAL_WINDOW_SIZE: MAX_WINDOW}),
    ) + pack_frame(
        WINDOW_UPDATE, 0, 0, struct.pack(">I", MAX_WINDOW - DEFAULT_WINDOW)
    )


def chunk_data_frames(stream_id: int, payload: bytes, *, end_stream: bool) -> list[bytes]:
    """DATA frames ≤ MAX_FRAME each; END_STREAM only on the last."""
    if not payload:
        return [pack_frame(DATA, FLAG_END_STREAM if end_stream else 0, stream_id, b"")]
    frames = []
    for off in range(0, len(payload), MAX_FRAME):
        chunk = payload[off : off + MAX_FRAME]
        last = off + MAX_FRAME >= len(payload)
        flags = FLAG_END_STREAM if (end_stream and last) else 0
        frames.append(pack_frame(DATA, flags, stream_id, chunk))
    return frames

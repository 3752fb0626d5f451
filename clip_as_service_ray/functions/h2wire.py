"""HTTP/2 + HPACK wire subset for the gRPC transport (RFC 7540 / RFC 7541).

The reference's *default* client scheme is ``grpc://`` (client/clip_client/
client.py:29-54 parses grpc|grpcs first-class; every Flow in its test suite
speaks it). This container has no grpcio, so the transport is implemented
from the public specs, the same first-principles route as the image codecs:

- HTTP/2 framing (RFC 7540 §4-6): DATA / HEADERS / CONTINUATION / SETTINGS /
  PING / GOAWAY / WINDOW_UPDATE / RST_STREAM, client preface, stream states
  sufficient for unary RPC (one request message, one response + trailers).
- HPACK (RFC 7541): full static table, dynamic table with eviction, all four
  literal representations, integer prefix coding. Huffman-coded string
  literals (H bit) are NOT implemented — both ends of this transport emit
  raw literals, and a peer that sends Huffman gets a clear error instead of
  silent corruption (same honest-subset policy as the arithmetic-JPEG guard).

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
    """Remove PADDED / PRIORITY envelope from a HEADERS/DATA payload."""
    pad = 0
    if flags & FLAG_PADDED:
        pad = payload[0]
        payload = payload[1:]
    if priority and (flags & FLAG_PRIORITY):
        payload = payload[5:]  # stream dep (4) + weight (1)
    if pad:
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
        b = data[pos]
        pos += 1
        value += (b & 0x7F) << shift
        shift += 7
        if not (b & 0x80):
            return value, pos


def _encode_str(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _encode_int(len(raw), 7, 0x00) + raw  # H=0: raw literal


class HpackEncoder:
    """Emits every field as Literal Without Indexing / New Name — always
    legal, stateless, and keeps the peer's dynamic table untouched."""

    def encode(self, headers: list[tuple[str, str]]) -> bytes:
        out = bytearray()
        for name, value in headers:
            out.append(0x00)  # literal w/o indexing, new name
            out += _encode_str(name.lower())
            out += _encode_str(value)
        return bytes(out)


class HpackDecoder:
    """Full HPACK decode minus Huffman literals (documented subset)."""

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
        if data[pos] & 0x80:
            raise NotImplementedError(
                "HPACK Huffman-coded literal: this transport's peers emit "
                "raw literals only (documented subset; see h2wire docstring)"
            )
        length, pos = _decode_int(data, pos, 7)
        s = data[pos : pos + length].decode("utf-8")
        return s, pos + length

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

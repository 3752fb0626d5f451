"""Multimodal column stages: decode / feature-extract / resize / frame-sample.

The reference's image path (uri->blob load at ``client.py:168-197``, PIL
decode + resize + center-crop + normalize at ``executors/helper.py:20-56`` /
``model/clip.py:25-52``) re-expressed as Ray Data actor-pool stages over
opaque ``binary`` columns with typed metadata.

IMAGE CODEC LIBRARIES ARE NOT AVAILABLE IN THIS ENVIRONMENT, so the three
common formats decode FOR REAL from first principles: BMP (numpy-only
parser, ``decode_bmp`` — 1/4/8-bit palettes, RLE4/RLE8, 16-bit 5-5-5,
BI_BITFIELDS, 24/32-bit; guards left: BI_JPEG/BI_PNG embeddings and
OS/2 core headers), PNG at EVERY legal bit depth
(``decode_png`` — stdlib zlib inflate + numpy scanline unfiltering:
1/2/4/8/16-bit, gray / RGB / palette / alpha, all five filter types, Adam7
interlacing), and baseline + progressive JPEG (``functions/jpeg.py`` — T.81
marker parse, Huffman entropy decode with restart markers, batch numpy
IDCT, 4:2:0 upsampling).
``decode=\"real\"`` raises NotImplementedError only for the one genuinely
exotic variant left (arithmetic-coded JPEG — the QM-coder's Table D.3 is
not reconstructible offline); ``decode=\"fake\"`` produces a deterministic
pseudo-image derived from the payload bytes (downstream shapes/stats
testable for any mime). The audio path (``AudioFeatures``) is fully real —
raw PCM needs no codec. Everything around decode — the Arrow schema,
small-batch sizing for large binary payloads, actor-pool signature, and
output layout — is real and tested.

Schemas:
  media in : id:int64, payload:binary, mime:string, width:int32, height:int32
  image out: id:int64, tensor flattened as list<float> (C*H*W), shape:list<int32>
  frames out: id:int64, frame_idx:int32, payload:binary
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

IMAGENET_MEAN = (0.48145466, 0.4578275, 0.40821073)  # model/clip.py:36-41
IMAGENET_STD = (0.26862954, 0.26130258, 0.27577711)


def _bmp_palette(payload: bytes, bpp: int) -> np.ndarray:
    """BGRA color table following the BITMAPINFOHEADER: biClrUsed entries
    (0 -> 2^bpp). Returns (n, 3) uint8 RGB."""
    hdr_size = int.from_bytes(payload[14:18], "little")
    n_colors = int.from_bytes(payload[46:50], "little") or (1 << bpp)
    off = 14 + hdr_size
    quads = np.frombuffer(
        payload, dtype=np.uint8, count=n_colors * 4, offset=off
    ).reshape(n_colors, 4)
    return np.ascontiguousarray(quads[:, 2::-1])  # BGRx -> RGB


def _bmp_check_indices(idx: np.ndarray, payload: bytes, bpp: int) -> np.ndarray:
    """Malformed-payload contract: a pixel/RLE stream referencing a palette
    entry past biClrUsed is a ValueError, not an IndexError downstream."""
    n_colors = int.from_bytes(payload[46:50], "little") or (1 << bpp)
    if idx.size and int(idx.max()) >= n_colors:
        raise ValueError(
            f"BMP palette index {int(idx.max())} out of range ({n_colors} colors)"
        )
    return idx


def _bmp_rle_rows(
    payload: bytes, pix_off: int, w: int, h: int, four_bit: bool
) -> np.ndarray:
    """Decode an RLE4/RLE8 pixel stream (BI_RLE4/BI_RLE8 per the public BMP
    spec) into (h, w) palette indices, bottom-up row order as stored. One
    control flow for both widths: encoded runs (count, value — RLE4
    alternates the value byte's two nibbles), escapes 0: 0=EOL, 1=EOB,
    2=delta(dx, dy), n>=3 = absolute run of n pixels, word-aligned."""
    if pix_off >= len(payload):
        raise ValueError("truncated BMP: RLE pixel data out of range")
    data = payload[pix_off:]
    out = np.zeros((h, w), np.uint8)
    x = y = i = 0
    n = len(data)
    while i + 1 < n and y < h:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt:  # encoded run
            run = min(cnt, w - x)
            if four_bit:
                pair = np.array([val >> 4, val & 15], np.uint8)
                out[y, x : x + run] = np.tile(pair, (run + 1) // 2)[:run]
            else:
                out[y, x : x + run] = val
            x += run
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if i + 1 >= n:
                raise ValueError("truncated BMP RLE delta")
            x = min(x + data[i], w)
            y += data[i + 1]
            i += 2
        else:  # absolute mode: val literal pixels, word-aligned
            nbytes = (val + 1) // 2 if four_bit else val
            if i + nbytes > n:
                raise ValueError("truncated BMP RLE absolute run")
            if four_bit:
                packed = np.frombuffer(data, np.uint8, nbytes, i)
                nib = np.empty(nbytes * 2, np.uint8)
                nib[0::2] = packed >> 4
                nib[1::2] = packed & 15
                pixels = nib
            else:
                pixels = np.frombuffer(data, np.uint8, nbytes, i)
            run = min(val, w - x)
            out[y, x : x + run] = pixels[:run]
            x += run
            i += nbytes + (nbytes & 1)
    return out


def _bmp_unpack_indices(payload, pix_off, w, h, bpp) -> np.ndarray:
    """Uncompressed 1/4/8-bit rows -> (h, w) palette indices."""
    stride = ((w * bpp + 31) // 32) * 4
    if pix_off + stride * h > len(payload):
        raise ValueError("truncated BMP")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=pix_off
    ).reshape(h, stride)
    if bpp == 8:
        return rows[:, :w]
    if bpp == 4:
        nib = np.empty((h, stride * 2), np.uint8)
        nib[:, 0::2] = rows >> 4
        nib[:, 1::2] = rows & 15
        return nib[:, :w]
    bits = np.unpackbits(rows, axis=1)  # MSB-first, the BMP bit order
    return bits[:, :w]


def _bmp_bitfields(payload, pix_off, w, h, bpp) -> np.ndarray:
    """BI_BITFIELDS 16/32-bit: per-channel masks follow the info header
    (same byte position inside V4/V5 headers); channels rescale to 8-bit
    as (v * 255) // mask_max."""
    masks = [
        int.from_bytes(payload[54 + 4 * i : 58 + 4 * i], "little")
        for i in range(3)
    ]
    nb = bpp // 8
    stride = ((w * bpp + 31) // 32) * 4
    if pix_off + stride * h > len(payload) or any(m == 0 for m in masks):
        raise ValueError("truncated BMP or empty bitfield mask")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=pix_off
    ).reshape(h, stride)[:, : w * nb]
    px = (
        rows.reshape(h, w, nb)
        .astype(np.uint32)
        .dot(np.array([1 << (8 * i) for i in range(nb)], np.uint32))
    )
    chans = []
    for m in masks:
        shift = (m & -m).bit_length() - 1
        maxv = m >> shift
        chans.append((((px >> shift) & maxv) * 255 // maxv).astype(np.uint8))
    return np.stack(chans, axis=-1)


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL image decode for BMP, numpy-only, per the public spec
    (BITMAPFILEHEADER + BITMAPINFOHEADER/V4/V5): 1/4/8-bit paletted,
    RLE4/RLE8, 16/24/32-bit uncompressed, and BI_BITFIELDS. Returns
    HxWx3 uint8 RGB. Raises ValueError for malformed payloads,
    NotImplementedError only for the exotic leftovers (BI_JPEG/BI_PNG
    embeddings, OS/2 core headers)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if int.from_bytes(payload[14:18], "little") < 40:
        # BITMAPCOREHEADER stores 16-bit w/h at different offsets
        raise NotImplementedError("OS/2 core-header BMP")
    pix_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    bottom_up, h = h > 0, abs(h)
    if w <= 0 or h <= 0:
        raise ValueError("truncated BMP")
    if compression == 1 and bpp == 8:  # BI_RLE8
        img = _bmp_palette(payload, 8)[
            _bmp_check_indices(_bmp_rle_rows(payload, pix_off, w, h, False), payload, 8)
        ]
    elif compression == 2 and bpp == 4:  # BI_RLE4
        img = _bmp_palette(payload, 4)[
            _bmp_check_indices(_bmp_rle_rows(payload, pix_off, w, h, True), payload, 4)
        ]
    elif compression == 3 and bpp in (16, 32):  # BI_BITFIELDS
        img = _bmp_bitfields(payload, pix_off, w, h, bpp)
    elif compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    elif bpp in (24, 32):
        nb = bpp // 8
        stride = ((w * bpp + 31) // 32) * 4  # rows padded to 4 bytes
        if pix_off + stride * h > len(payload):
            raise ValueError("truncated BMP")
        rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=pix_off)
        img = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
        img = np.ascontiguousarray(img[..., 2::-1])  # BGR(A) -> RGB
    elif bpp == 16:  # no BI_BITFIELDS -> the default 5-5-5 layout
        stride = ((w * 16 + 31) // 32) * 4
        if pix_off + stride * h > len(payload):
            raise ValueError("truncated BMP")
        px = np.frombuffer(
            payload, dtype="<u2", count=(stride // 2) * h, offset=pix_off
        ).reshape(h, stride // 2)[:, :w].astype(np.uint32)
        img = np.stack(
            [
                (((px >> s) & 31) * 255 // 31).astype(np.uint8)
                for s in (10, 5, 0)
            ],
            axis=-1,
        )
    elif bpp in (1, 4, 8):
        img = _bmp_palette(payload, bpp)[
            _bmp_check_indices(
                _bmp_unpack_indices(payload, pix_off, w, h, bpp), payload, bpp
            )
        ]
    else:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    if bottom_up:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray) -> bytes:
    """Inverse of decode_bmp (24-bit bottom-up, row-padded): test/fixture
    writer so the real-decode path is exercisable without codec libs."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB -> BGR, bottom-up
    raw = body.tobytes()
    header = (
        b"BM"
        + (54 + len(raw)).to_bytes(4, "little")
        + b"\0\0\0\0"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raw).to_bytes(4, "little")
        + b"\x13\x0b\0\0\x13\x0b\0\0"  # 2835 ppm ~ 72 dpi
        + (0).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
    )
    return header + raw


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            raise ValueError("truncated PNG chunk")
        yield ctype, data
        pos += 12 + ln  # length + type + data + crc
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filtering (spec §9: None/Sub/Up/Average/Paeth).

    Row-vectorized where the recurrence allows: Sub is a per-pixel-channel
    prefix sum mod 256; Up adds the already-reconstructed previous row;
    Average/Paeth have a genuine left+up dependency, resolved per pixel
    column within the row (w iterations of vector ops over bpp channels)."""
    rows = raw.reshape(h, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        cur = rows[y, 1:].astype(np.int64)
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: prefix sum along x with stride bpp
            px = cur.reshape(-1, bpp)
            rec = np.cumsum(px, axis=0).reshape(-1)
        elif f == 2:  # Up
            rec = cur + prev
        elif f == 3:  # Average
            rec = cur.copy()
            up = prev.astype(np.int64)
            rec[:bpp] += up[:bpp] >> 1
            rec[:bpp] &= 0xFF
            for x in range(bpp, stride, bpp):
                left = rec[x - bpp : x]
                rec[x : x + bpp] += (left + up[x : x + bpp]) >> 1
                rec[x : x + bpp] &= 0xFF
        elif f == 4:  # Paeth
            rec = cur.copy()
            up = prev.astype(np.int64)
            rec[:bpp] += up[:bpp]  # left & upper-left are 0 -> predictor = up
            rec[:bpp] &= 0xFF
            for x in range(bpp, stride, bpp):
                a = rec[x - bpp : x]  # left (already reconstructed)
                b = up[x : x + bpp]  # up
                c = up[x - bpp : x]  # upper-left
                p = a + b - c
                pa_ = np.abs(p - a)
                pb_ = np.abs(p - b)
                pc_ = np.abs(p - c)
                pred = np.where((pa_ <= pb_) & (pa_ <= pc_), a, np.where(pb_ <= pc_, b, c))
                rec[x : x + bpp] += pred
                rec[x : x + bpp] &= 0xFF
        else:
            raise ValueError(f"PNG filter type {f} invalid")
        prev = (rec & 0xFF).astype(np.uint8)
        out[y] = prev
    return out


# Adam7 pass grid (PNG spec §8.2): (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def decode_png(payload: bytes, keep_precision: bool = False) -> np.ndarray:
    """REAL PNG decode with stdlib zlib + numpy only (PNG spec: IHDR/IDAT
    inflate + per-scanline unfiltering). Supports EVERY legal bit depth
    (1/2/4-bit gray+palette, 8-bit, 16-bit gray/RGB/alpha), color types
    0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), both
    non-interlaced and Adam7-interlaced (each of the 7 passes is an
    independently-filtered sub-image scattered back onto the pixel grid,
    spec §8.2). Returns HxWx3 uint8 RGB (alpha dropped, PIL convert('RGB')
    semantics; 16-bit keeps the most-significant byte like PIL's 'RGB;16B'
    rawmode, or the full uint16 samples when ``keep_precision`` — mirroring
    the 12-bit JPEG API). Raises ValueError for non-PNG bytes or
    depth/color-type combinations the spec forbids."""
    import zlib

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    idat = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype_n, _comp, _filt, interlace = ihdr[8:13]
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace} invalid")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype_n)
    if channels is None:
        raise ValueError(f"PNG color type {ctype_n} invalid")
    if depth not in (1, 2, 4, 8, 16) or (
        depth < 8 and ctype_n not in (0, 3)
    ) or (depth == 16 and ctype_n == 3):
        raise ValueError(f"PNG depth {depth} invalid for color type {ctype_n}")
    bits_pp = channels * depth
    bpp = max(1, bits_pp // 8)  # filter stride (spec §9: filters act on bytes)
    dtype = np.uint16 if depth == 16 else np.uint8

    def samples(sub: np.ndarray, ph: int, pw: int) -> np.ndarray:
        """(ph, pstride) unfiltered bytes -> (ph, pw, channels) samples."""
        if depth == 8:
            return sub.reshape(ph, pw, channels)
        if depth == 16:  # network byte order (big-endian) sample pairs
            u = sub.reshape(ph, pw * channels, 2)
            v = (u[..., 0].astype(np.uint16) << 8) | u[..., 1]
            return v.reshape(ph, pw, channels)
        # sub-byte: MSB-first packed samples, scanline-trailing bits ignored
        bits = np.unpackbits(sub, axis=1)
        vals = bits.reshape(ph, -1, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        v = (vals * weights).sum(axis=2).astype(np.uint8)
        return v[:, :pw].reshape(ph, pw, 1)

    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if interlace == 1:  # Adam7: 7 independently-filtered sub-images
        px = np.zeros((h, w, channels), dtype=dtype)
        pos = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = -(-(w - x0) // xs) if w > x0 else 0
            ph = -(-(h - y0) // ys) if h > y0 else 0
            if pw <= 0 or ph <= 0:
                continue
            pstride = (pw * bits_pp + 7) // 8
            nbytes = ph * (pstride + 1)
            if pos + nbytes > len(raw):
                raise ValueError("PNG Adam7 pixel data size mismatch")
            sub = _png_unfilter(raw[pos : pos + nbytes], ph, pstride, bpp)
            px[y0::ys, x0::xs] = samples(sub, ph, pw)
            pos += nbytes
        if pos != len(raw):
            raise ValueError("PNG Adam7 pixel data size mismatch")
    else:
        stride = (w * bits_pp + 7) // 8
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG pixel data size mismatch")
        px = samples(_png_unfilter(raw, h, stride, bpp), h, w)
    if ctype_n == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        return pal[px[..., 0]]
    if depth < 8:  # grayscale: scale to full 8-bit range (spec §11.2.2 LUT)
        px = (px * np.uint8(255 // ((1 << depth) - 1))).astype(np.uint8)
    elif depth == 16 and not keep_precision:
        # PIL 'RGB;16B' semantics: most-significant byte per sample
        px = (px >> 8).astype(np.uint8)
    if ctype_n == 0:
        return np.repeat(px, 3, axis=2)
    if ctype_n == 4:
        return np.repeat(px[..., :1], 3, axis=2)
    return np.ascontiguousarray(px[..., :3])  # RGB / RGBA->RGB


def _png_filter_rows(img: np.ndarray, filter_type: int) -> np.ndarray:
    """Filter one (sub-)image into scanline rows (filter byte + data)."""
    h, w, _c = img.shape
    px = img.astype(np.int64)
    up = np.zeros((h, w, 3), dtype=np.int64)
    up[1:] = px[:-1]
    left = np.zeros((h, w, 3), dtype=np.int64)
    left[:, 1:] = px[:, :-1]
    ul = np.zeros((h, w, 3), dtype=np.int64)
    ul[1:, 1:] = px[:-1, :-1]
    if filter_type == 0:
        filt = px
    elif filter_type == 1:
        filt = px - left
    elif filter_type == 2:
        filt = px - up
    elif filter_type == 3:
        filt = px - ((left + up) >> 1)
    else:
        p = left + up - ul
        pa_, pb_, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where(
            (pa_ <= pb_) & (pa_ <= pc_), left, np.where(pb_ <= pc_, up, ul)
        )
        filt = px - pred
    body = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    body[:, 0] = filter_type
    body[:, 1:] = (filt & 0xFF).astype(np.uint8).reshape(h, w * 3)
    return body


def encode_png(img: np.ndarray, filter_type: int = 0, interlace: bool = False) -> bytes:
    """Minimal PNG writer (8-bit RGB, one chosen filter type for every
    scanline; optional Adam7 interlacing with each pass filtered as its own
    sub-image) — test/fixture writer so the real-decode path is exercisable
    without codec libs; also round-trip proof for the unfilter kernels."""
    import zlib

    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8 and filter_type in (0, 1, 2, 3, 4)
    if interlace:
        parts = []
        for x0, y0, xs, ys in _ADAM7:
            sub = img[y0::ys, x0::xs]
            if sub.shape[0] and sub.shape[1]:
                parts.append(_png_filter_rows(np.ascontiguousarray(sub), filter_type).tobytes())
        body = b"".join(parts)
    else:
        body = _png_filter_rows(img, filter_type)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return len(data).to_bytes(4, "big") + ctype + data + crc.to_bytes(4, "big")

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 1 if interlace else 0])  # depth 8, RGB, deflate
    )
    raw = body if isinstance(body, bytes) else body.tobytes()
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_filter_bytes(rows: np.ndarray, bpp: int, filter_type: int) -> np.ndarray:
    """Filter raw scanline BYTES (h, stride) at an arbitrary filter stride
    ``bpp`` — the exact inverse of ``_png_unfilter`` for any depth. Returns
    (h, stride+1) rows with the leading filter byte."""
    h, stride = rows.shape
    px = rows.astype(np.int64)
    up = np.zeros_like(px)
    up[1:] = px[:-1]
    left = np.zeros_like(px)
    left[:, bpp:] = px[:, :-bpp]
    ul = np.zeros_like(px)
    ul[1:, bpp:] = px[:-1, :-bpp]
    if filter_type == 0:
        filt = px
    elif filter_type == 1:
        filt = px - left
    elif filter_type == 2:
        filt = px - up
    elif filter_type == 3:
        filt = px - ((left + up) >> 1)
    else:
        p = left + up - ul
        pa_, pb_, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where(
            (pa_ <= pb_) & (pa_ <= pc_), left, np.where(pb_ <= pc_, up, ul)
        )
        filt = px - pred
    body = np.zeros((h, 1 + stride), dtype=np.uint8)
    body[:, 0] = filter_type
    body[:, 1:] = (filt & 0xFF).astype(np.uint8)
    return body


def _pack_scanlines(img: np.ndarray, depth: int, channels: int) -> np.ndarray:
    """(h, w, channels) samples -> (h, stride) raw scanline bytes for
    ``depth``: 16-bit big-endian pairs, 8-bit identity, sub-byte MSB-first
    packing with zero padding bits at the row tail (spec §7.2)."""
    h, w = img.shape[:2]
    flat = img.reshape(h, w * channels).astype(np.uint16)
    if depth == 16:
        b = np.empty((h, w * channels * 2), np.uint8)
        b[:, 0::2] = (flat >> 8).astype(np.uint8)
        b[:, 1::2] = (flat & 0xFF).astype(np.uint8)
        return b
    if depth == 8:
        return flat.astype(np.uint8)
    spb = 8 // depth
    stride = (w * channels * depth + 7) // 8
    padded = np.zeros((h, stride * spb), np.uint8)
    padded[:, : w * channels] = flat
    bits = ((padded[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(h, -1), axis=1)


def encode_png_ext(
    img: np.ndarray,
    depth: int = 8,
    ctype_n: int = 2,
    filter_type: int = 0,
    interlace: bool = False,
    palette: np.ndarray | None = None,
) -> bytes:
    """Fixture PNG writer for EVERY legal (depth, color type) combination —
    the round-trip proof for ``decode_png``'s wide/sub-byte paths. ``img`` is
    (h, w, channels) samples (uint8, or uint16 for depth 16; palette indices
    for color type 3); ``palette`` is the (n, 3) PLTE for color type 3."""
    import zlib

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype_n]
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    assert c == channels and filter_type in (0, 1, 2, 3, 4)
    bpp = max(1, channels * depth // 8)
    if interlace:
        parts = []
        for x0, y0, xs, ys in _ADAM7:
            sub = img[y0::ys, x0::xs]
            if sub.shape[0] and sub.shape[1]:
                rows = _pack_scanlines(np.ascontiguousarray(sub), depth, channels)
                parts.append(_png_filter_bytes(rows, bpp, filter_type).tobytes())
        body = b"".join(parts)
    else:
        body = _png_filter_bytes(
            _pack_scanlines(img, depth, channels), bpp, filter_type
        ).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return len(data).to_bytes(4, "big") + ctype + data + crc.to_bytes(4, "big")

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([depth, ctype_n, 0, 0, 1 if interlace else 0])
    )
    plte = chunk(b"PLTE", palette.astype(np.uint8).tobytes()) if palette is not None else b""
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + plte
        + chunk(b"IDAT", zlib.compress(body))
        + chunk(b"IEND", b"")
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for PIL.Image.open: bytes -> HxWx3 uint8."""
    seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(int(seed))
    return rng.integers(0, 256, (height, width, 3), dtype=np.uint8)


def _resize_center_crop(img: np.ndarray, size: int) -> np.ndarray:
    """Nearest-neighbor resize (shorter side -> size) + center crop — the
    geometry of the reference transform (Resize(BICUBIC)+CenterCrop,
    model/clip.py:28-35) with a numpy kernel instead of PIL."""
    h, w, _ = img.shape
    scale = size / min(h, w)
    nh, nw = max(size, int(round(h * scale))), max(size, int(round(w * scale)))
    ys = np.clip((np.arange(nh) / scale).astype(np.int64), 0, h - 1)
    xs = np.clip((np.arange(nw) / scale).astype(np.int64), 0, w - 1)
    img = img[ys][:, xs]
    top, left = (nh - size) // 2, (nw - size) // 2
    return img[top : top + size, left : left + size]


class ImagePreprocess:
    """Actor-pool UDF: media batch -> normalized CHW float tensors.

    Mirrors preproc_image (executors/helper.py:20-56): decode -> resize ->
    center-crop -> RGB float -> normalize(mean, std) -> CHW, with the heavy
    payload dropped from the output (drop_image_content analog,
    helper.py:44-47). Use small batch_size: payloads are large binaries.
    """

    def __init__(self, size: int = 224, decode: str = "fake"):
        self.size = size
        self.decode = decode
        self.mean = np.asarray(IMAGENET_MEAN, dtype=np.float32).reshape(3, 1, 1)
        self.std = np.asarray(IMAGENET_STD, dtype=np.float32).reshape(3, 1, 1)

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self.decode == "fake":
            return _fake_decode(payload, width, height)
        # decode == "real": BMP, PNG and baseline JPEG decode for real
        # (numpy/stdlib parsers — see module header); anything else raises
        # at exactly the point an external codec call would go.
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:8] == PNG_SIG:
            return decode_png(payload)
        if payload[:3] == b"\xff\xd8\xff":
            from clip_as_service_ray.functions.jpeg import decode_jpeg

            return decode_jpeg(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            from clip_as_service_ray.functions.gif import decode_gif

            return decode_gif(payload)
        raise NotImplementedError(
            "unrecognized image format: only BMP, PNG, JPEG (baseline + "
            "progressive) and GIF decode without codec libraries "
            "(PIL/libjpeg absent here)"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_numpy()
        heights = batch.column("height").to_numpy()
        tensors, shapes = [], []
        for p, w, h in zip(payloads, widths, heights):
            img = self._decode(p, int(w), int(h))
            img = _resize_center_crop(img, self.size)
            chw = (img.astype(np.float32) / 255.0).transpose(2, 0, 1)
            chw = (chw - self.mean) / self.std
            tensors.append(chw.ravel())
            shapes.append([3, self.size, self.size])
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "tensor": pa.array([t.tolist() for t in tensors], pa.list_(pa.float32())),
                "shape": pa.array(shapes, pa.list_(pa.int32())),
            }
        )


class FrameSample:
    """Actor-pool UDF: video rows -> every k-th frame row (flat_map shape).

    The video payload is treated as a concatenation of fixed-size fake
    frames (real impl: libav demux). Emits (id, frame_idx, payload) rows —
    one input row fans out to many output rows.
    """

    def __init__(self, frame_bytes: int = 1024, every_k: int = 5):
        self.frame_bytes = frame_bytes
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, idx_out, payload_out = [], [], []
        for i, payload in zip(batch.column("id").to_numpy(), batch.column("payload").to_pylist()):
            n_frames = max(0, len(payload) // self.frame_bytes)
            for fi in range(0, n_frames, self.every_k):
                ids_out.append(int(i))
                idx_out.append(fi)
                payload_out.append(payload[fi * self.frame_bytes : (fi + 1) * self.frame_bytes])
        return pa.table(
            {
                "id": pa.array(ids_out, pa.int64()),
                "frame_idx": pa.array(idx_out, pa.int32()),
                "payload": pa.array(payload_out, pa.binary()),
            }
        )


class GifFrameSample:
    """Actor-pool UDF: REAL frame sampling for the multi-frame format the
    sandbox can actually decode (GIF; the video analog of FrameSample's
    byte-sliced stub). Emits every k-th COMPOSED frame, re-encoded as BMP —
    a real, self-describing payload any downstream stage can decode."""

    def __init__(self, every_k: int = 2, max_frames: int | None = None):
        self.every_k = max(1, int(every_k))
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        from clip_as_service_ray.functions.gif import decode_gif_frames

        ids_out, idx_out, payload_out = [], [], []
        for i, payload in zip(
            batch.column("id").to_numpy(), batch.column("payload").to_pylist()
        ):
            frames = decode_gif_frames(payload, max_frames=self.max_frames)
            for fi in range(0, len(frames), self.every_k):
                ids_out.append(int(i))
                idx_out.append(fi)
                payload_out.append(encode_bmp(frames[fi]))
        return pa.table(
            {
                "id": pa.array(ids_out, pa.int64()),
                "frame_idx": pa.array(idx_out, pa.int32()),
                "payload": pa.array(payload_out, pa.binary()),
            }
        )


class AudioFeatures:
    """Actor-pool UDF: audio rows (payload = raw PCM s16le mono) ->
    per-window acoustic features. Unlike the image path, this stage is
    FULLY REAL: raw-PCM 'decode' is just ``np.frombuffer`` (no codec
    library needed), and the features are standard DSP — per-window
    log-energy, zero-crossing rate, and spectral centroid via rFFT.

    Output rows (one per analysis window — flat_map shape like FrameSample):
        id:int64, frame_idx:int32, log_energy:float64, zcr:float64,
        centroid_hz:float64
    """

    def __init__(self, sample_rate: int = 16000, win: int = 1024, hop: int = 512):
        self.sample_rate = sample_rate
        self.win = win
        self.hop = hop
        # rFFT bin frequencies + Hann window, computed once per actor (the
        # T1 load-once pattern); Hann + power weighting keeps the centroid
        # from being dragged upward by rectangular-window leakage
        self._freqs = np.fft.rfftfreq(win, d=1.0 / sample_rate)
        self._hann = np.hanning(win)

    def _features(self, pcm: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        n = (len(pcm) - self.win) // self.hop + 1 if len(pcm) >= self.win else 0
        if n <= 0:
            z = np.zeros(0, dtype=np.float64)
            return z, z, z
        idx = np.arange(self.win)[None, :] + self.hop * np.arange(n)[:, None]
        frames = pcm[idx].astype(np.float64) / 32768.0  # (n, win)
        energy = np.log1p((frames**2).sum(axis=1))
        zcr = (np.diff(np.signbit(frames), axis=1) != 0).mean(axis=1)
        power = np.abs(np.fft.rfft(frames * self._hann, axis=1)) ** 2
        denom = power.sum(axis=1)
        centroid = (power @ self._freqs) / np.where(denom == 0, 1.0, denom)
        return energy, zcr, centroid

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, idx_out, en_out, zc_out, ce_out = [], [], [], [], []
        for i, payload in zip(
            batch.column("id").to_numpy(), batch.column("payload").to_pylist()
        ):
            pcm = np.frombuffer(payload[: len(payload) // 2 * 2], dtype="<i2")
            en, zc, ce = self._features(pcm)
            k = len(en)
            ids_out.append(np.full(k, int(i), dtype=np.int64))
            idx_out.append(np.arange(k, dtype=np.int32))
            en_out.append(en)
            zc_out.append(zc)
            ce_out.append(ce)
        if not ids_out:
            ids_out = [np.array([], dtype=np.int64)]
            idx_out = [np.array([], dtype=np.int32)]
            en_out = zc_out = ce_out = [np.array([], dtype=np.float64)]
        return pa.table(
            {
                "id": pa.array(np.concatenate(ids_out), pa.int64()),
                "frame_idx": pa.array(np.concatenate(idx_out), pa.int32()),
                "log_energy": pa.array(np.concatenate(en_out), pa.float64()),
                "zcr": pa.array(np.concatenate(zc_out), pa.float64()),
                "centroid_hz": pa.array(np.concatenate(ce_out), pa.float64()),
            }
        )


def extract_audio_features(
    ds, *, sample_rate: int = 16000, win: int = 1024, hop: int = 512, concurrency: int = 2
):
    """audio Dataset (id, payload PCM s16le) -> per-window feature rows."""
    return ds.map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"sample_rate": sample_rate, "win": win, "hop": hop},
        batch_format="pyarrow",
        batch_size=32,  # payloads are large binaries; keep blocks bounded
        concurrency=concurrency,
    )


def preprocess_images(ds, *, size: int = 224, decode: str = "fake", concurrency: int = 2):
    """media Dataset -> tensor Dataset (small batches: binary payloads)."""
    return ds.map_batches(
        ImagePreprocess,
        fn_constructor_kwargs={"size": size, "decode": decode},
        batch_format="pyarrow",
        batch_size=64,  # payloads are MB-scale in real use; keep blocks bounded
        concurrency=concurrency,
    )


def sample_frames(ds, *, frame_bytes: int = 1024, every_k: int = 5, concurrency: int = 2):
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"frame_bytes": frame_bytes, "every_k": every_k},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=concurrency,
    )

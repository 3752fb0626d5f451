"""GIF codec (87a/89a) in numpy + stdlib: LZW decode/encode, interlace,
multi-frame.

Completes the sandbox's real-codec family (BMP/PNG/JPEG in
stages/multimodal.py + functions/jpeg.py): GIF is the multi-frame member,
so ``decode_gif_frames`` also powers a REAL frame-sampling path for the
video-analog pipeline. Format per the public GIF89a specification:

- logical screen descriptor + global color table;
- per frame: optional graphic control extension (transparency index,
  disposal), image descriptor (local rect, local color table, interlace
  flag), LZW-compressed index stream in 255-byte sub-blocks;
- LZW: variable code width (min_code_size+1 .. 12 bits), CLEAR resets the
  dictionary, EOI terminates.

Frame composition: frames render onto the running canvas at their rect;
transparent pixels leave the canvas unchanged. All four disposal modes are
implemented (GIF89a §23): 0/1 leave the rect in place, 2 restores it to the
logical screen's background color (we compose onto RGB, so "background" is
the GCT color at the bg index rather than transparency), 3 restores the
pre-frame canvas content; the disposal runs when the NEXT frame arrives.

The encoder performs REAL LZW compression (dictionary growth through the
full 12-bit range with CLEAR on overflow) and can emit interlaced and
multi-frame files — decoder tests round-trip through every path.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_rows(h: int) -> np.ndarray:
    """Row permutation: output_row[i] = source row index in stream order."""
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    inv = np.empty(h, dtype=np.int64)
    inv[np.asarray(order, dtype=np.int64)] = np.arange(h)
    return inv


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """LZW index-stream decode -> uint8 array of pixel indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader: GIF packs codes LSB-first
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little"
    )
    pos = 0
    width = min_code_size + 1
    # dictionary: list of byte sequences (as lists kept small via tuples)
    base = [(i,) for i in range(clear)] + [(), ()]
    table = list(base)
    out: list[int] = []
    prev: tuple | None = None
    n_bits = len(bits)
    while pos + width <= n_bits:
        code = int(np.dot(bits[pos:pos + width], 1 << np.arange(width)))
        pos += width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):  # the KwKwK case
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > table")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_expected:
            break
    return np.asarray(out[:n_expected], dtype=np.uint8)


class _LZWEncoder:
    """Real LZW with dictionary growth + CLEAR-on-overflow; LSB-first bits."""

    def __init__(self, min_code_size: int):
        self.mcs = min_code_size
        self.clear = 1 << min_code_size
        self.eoi = self.clear + 1
        self.bits: list[tuple[int, int]] = []  # (code, width)
        self._reset()

    def _reset(self):
        self.table: dict[tuple, int] = {(i,): i for i in range(self.clear)}
        self.next_code = self.eoi + 1
        self.width = self.mcs + 1

    def encode(self, indices: np.ndarray) -> bytes:
        emit = self.bits.append
        emit((self.clear, self.width))
        w: tuple = ()
        for k in indices.tolist():
            wk = w + (k,)
            if wk in self.table:
                w = wk
                continue
            emit((self.table[w], self.width))
            if self.next_code < (1 << 12):
                self.table[wk] = self.next_code
                if self.next_code == (1 << self.width) and self.width < 12:
                    self.width += 1
                self.next_code += 1
            else:
                emit((self.clear, self.width))
                self._reset()
            w = (k,)
        if w:
            emit((self.table[w], self.width))
        emit((self.eoi, self.width))
        # pack LSB-first
        total = sum(wd for _c, wd in self.bits)
        arr = np.zeros(total, dtype=np.uint8)
        p = 0
        for code, wd in self.bits:
            for b in range(wd):
                arr[p] = (code >> b) & 1
                p += 1
        return np.packbits(arr, bitorder="little").tobytes()


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        n = buf[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += buf[pos:pos + n]
        pos += n


def decode_gif_frames(payload: bytes, max_frames: int | None = None) -> list[np.ndarray]:
    """GIF bytes -> list of (h, w, 3) uint8 RGB frames (composed canvas)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)  # black until first frame
    # restore-to-background fills with the logical screen's background color
    # (GIF89a §18; we compose onto an RGB canvas, so "background" is the GCT
    # color at the bg index rather than transparency)
    bg_rgb = gct[_bg] if (gct is not None and _bg < len(gct)) else np.zeros(3, np.uint8)
    frames: list[np.ndarray] = []
    transparent = None
    disposal = 0
    pending: tuple | None = None  # previous frame's (mode, rect, saved)
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                gflags, _delay, tidx = struct.unpack(
                    "<BHB", payload[pos + 1 : pos + 1 + size]
                )
                pos += 1 + size
                assert payload[pos] == 0
                pos += 1
                disposal = (gflags >> 2) & 0x7
                if disposal > 3:
                    raise ValueError(f"GIF disposal method {disposal} reserved")
                transparent = tidx if (gflags & 0x1) else None
            else:  # comment / app / plain-text: skip sub-blocks
                _data, pos = _read_sub_blocks(payload, pos)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block {b:#x}")
        if pending is not None:
            # the PREVIOUS frame's disposal runs when the next frame arrives
            mode, (py, px, ph, pw), saved = pending
            if mode == 2:  # restore to background color
                canvas[py : py + ph, px : px + pw] = bg_rgb
            else:  # 3: restore to the pre-frame canvas content
                canvas[py : py + ph, px : px + pw] = saved
            pending = None
        fx, fy, fw, fh, iflags = struct.unpack("<HHHHB", payload[pos:pos + 9])
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(payload[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame without any color table")
        mcs = payload[pos]
        pos += 1
        data, pos = _read_sub_blocks(payload, pos)
        idx = _lzw_decode(data, mcs, fw * fh).reshape(fh, fw)
        if iflags & 0x40:  # interlaced
            idx = idx[_deinterlace_rows(fh)]
        if disposal in (2, 3):
            pending = (
                disposal,
                (fy, fx, fh, fw),
                canvas[fy : fy + fh, fx : fx + fw].copy() if disposal == 3 else None,
            )
        rect = canvas[fy:fy + fh, fx:fx + fw]
        px = ct[np.minimum(idx, len(ct) - 1)]
        if transparent is not None:
            mask = idx != transparent
            rect[mask] = px[mask]
        else:
            rect[:, :] = px
        frames.append(canvas.copy())
        transparent = None
        disposal = 0
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First composed frame -> (h, w, 3) uint8 RGB."""
    return decode_gif_frames(payload, max_frames=1)[0]


def _palettize(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h, w, 3) -> (palette [n<=256, 3], indices) via exact unique colors."""
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3).astype(np.uint32)
    keys = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
    uniq, inv = np.unique(keys, return_inverse=True)
    if len(uniq) > 256:
        raise ValueError(f"GIF encoder supports <=256 unique colors, got {len(uniq)}")
    pal = np.stack(
        [(uniq >> 16) & 0xFF, (uniq >> 8) & 0xFF, uniq & 0xFF], axis=1
    ).astype(np.uint8)
    return pal, inv.reshape(h, w).astype(np.uint8)


def encode_gif(
    frames: np.ndarray | list[np.ndarray],
    *,
    interlace: bool = False,
    offsets: list[tuple[int, int]] | None = None,
    disposals: list[int] | None = None,
    bg_color: tuple[int, int, int] | None = None,
) -> bytes:
    """(h, w, 3) uint8 frame or list of frames -> GIF89a bytes. One shared
    global palette (exact colors across all frames, <=256). Frame 0 sets
    the logical screen size; later frames may be smaller sub-rects placed
    at ``offsets[i]`` (x, y). ``disposals[i]`` emits a graphic-control
    extension with that disposal mode (0/1 leave, 2 restore-to-background,
    3 restore-to-previous); ``bg_color`` sets the screen background color
    (added to the palette)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    offsets = offsets or [(0, 0)] * len(frames)
    disposals = disposals or [0] * len(frames)
    h, w = frames[0].shape[:2]
    stacked = np.concatenate(
        [f.reshape(-1, 3) for f in frames]
        + ([np.asarray([bg_color], np.uint8)] if bg_color is not None else [])
    )
    pal, _ = _palettize(stacked.reshape(1, -1, 3))
    pal_bits = max(1, int(np.ceil(np.log2(max(2, len(pal))))))
    n_slots = 1 << pal_bits
    pal_full = np.zeros((n_slots, 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal
    pkeys = (
        (pal[:, 0].astype(np.uint32) << 16)
        | (pal[:, 1].astype(np.uint32) << 8)
        | pal[:, 2].astype(np.uint32)
    )
    bg_idx = 0
    if bg_color is not None:
        bkey = (bg_color[0] << 16) | (bg_color[1] << 8) | bg_color[2]
        bg_idx = int(np.searchsorted(pkeys, bkey))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), bg_idx, 0)
    out += pal_full.tobytes()
    mcs = max(2, pal_bits)
    for f, (fx, fy), disp in zip(frames, offsets, disposals):
        fh, fw = f.shape[:2]
        if disp:
            out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, (disp & 0x7) << 2, 0, 0, 0)
        keys = (
            (f[..., 0].astype(np.uint32) << 16)
            | (f[..., 1].astype(np.uint32) << 8)
            | f[..., 2].astype(np.uint32)
        ).reshape(-1)
        idx = np.searchsorted(pkeys, keys)  # pkeys sorted by construction
        rows = idx.reshape(fh, fw).astype(np.uint8)
        iflags = 0
        if interlace:
            # stream order = pass order = argsort of the decoder's inverse
            rows = rows[np.argsort(_deinterlace_rows(fh), kind="stable")]
            iflags |= 0x40
        out += struct.pack("<BHHHHB", 0x2C, fx, fy, fw, fh, iflags)
        out.append(mcs)
        out += _sub_blocks(_LZWEncoder(mcs).encode(rows.reshape(-1)))
    out.append(0x3B)
    return bytes(out)

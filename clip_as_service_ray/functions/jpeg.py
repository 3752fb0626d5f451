"""JPEG (ITU-T T.81) codec in numpy + stdlib: baseline AND progressive.

No libjpeg/PIL in this environment, so the image stage decodes JFIF
itself: marker parse -> Huffman entropy decode (arbitrary DHT tables,
byte-stuffing, restart markers) -> batch dequantize/de-zigzag -> one
vectorized IDCT over all blocks of a component -> chroma upsample ->
YCbCr->RGB. Progressive (SOF2) decode covers all four scan kinds —
DC/AC first + refinement, spectral selection, successive approximation,
EOBn runs, interleaved DC and non-interleaved AC geometry (T.81 Annex G;
refinement walk mirrors libjpeg jdphuff.c). Encoders exist for
fixtures/round-trip tests: baseline (4:4:4 or 4:2:0, libjpeg-convention
quality scaling, Annex K tables) and progressive (4:4:4 scan script with
successive approximation; optional cross-block EOBn runs via a custom
table, since Annex K defines no EOBn symbols). Entropy coding is
per-symbol Python (inherently sequential); all block math is numpy.
12-bit precision (extended sequential SOF1 / progressive, 16-bit DQT)
decodes for real; arithmetic-coded variants raise NotImplementedError (the
QM-coder's Table D.3 constants are not reconstructible offline, and a
guessed table would silently mis-decode real files).

Reference parity note: the reference feeds images through PIL into CLIP
preprocessing (`/root/reference/server/clip_server/model/clip.py:56-79`);
this module replaces the PIL decode leg for the sandbox. Tables and
algorithm are the public T.81 spec (Annex A/F/K).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position -> natural (row-major) coefficient index (T.81 Fig. A.6)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.1/K.2 base quantization tables (natural order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# orthonormal 8x8 DCT-II basis: forward F = C @ B @ C.T, inverse B = C.T @ F @ C
_C8 = np.array([
    [np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
     * np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
    for u in range(8)
])
_C8[0, :] = np.sqrt(1 / 8)  # exact alpha(0) row


def _canonical_codes(bits, vals):
    """(BITS, HUFFVAL) -> list of (value, code, length) in canonical order."""
    out, code, k = [], 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((vals[k], code, length))
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, vals):
    return {(ln, code): v for v, code, ln in _canonical_codes(bits, vals)}


def _encode_table(bits, vals):
    return {v: (code, ln) for v, code, ln in _canonical_codes(bits, vals)}


class _BitReader:
    """Entropy-segment bit reader: un-stuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.cnt = 0

    def _next_byte(self):
        d = self.data
        if self.pos >= len(d):
            return None
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt != 0x00:
                return None  # a real marker ends the entropy segment
            self.pos += 2
            return 0xFF
        self.pos += 1
        return b

    def read_bit(self) -> int:
        if self.cnt == 0:
            b = self._next_byte()
            self.cur = 0 if b is None else b  # spec: pad past-the-end with 0
            self.cnt = 8
        self.cnt -= 1
        return (self.cur >> self.cnt) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code in entropy stream")

    def restart(self):
        """Byte-align and consume an RSTn marker."""
        self.cnt = 0
        d = self.data
        if not (self.pos + 1 < len(d) and d[self.pos] == 0xFF
                and 0xD0 <= d[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2


def _extend(r: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: s-bit magnitude -> signed value."""
    return r if r >= (1 << (s - 1)) else r - (1 << s) + 1


def decode_jpeg(payload: bytes, keep_precision: bool = False) -> np.ndarray:
    """JFIF -> (h, w, 3) RGB (grayscale replicated). 8-bit frames return
    uint8; 12-bit frames (extended sequential / progressive, T.81 B.2.2
    sample precision 12 with 16-bit DQT entries) return uint8 scaled by
    255/4095, or native 0..4095 uint16 when ``keep_precision=True``."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    dri = 0
    frame = None
    pos = 2
    data = payload
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq_, tq = seg[o] >> 4, seg[o] & 0xF
                if pq_ == 0:
                    tab = np.frombuffer(seg[o + 1:o + 65], dtype=np.uint8).astype(np.int64)
                    o += 65
                elif pq_ == 1:  # 16-bit entries (12-bit precision frames)
                    tab = np.frombuffer(seg[o + 1:o + 129], dtype=">u2").astype(np.int64)
                    o += 129
                else:
                    raise ValueError(f"DQT precision field {pq_} invalid")
                qt[tq] = tab  # stored in zigzag order
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1:o + 17])
                n = sum(bits)
                vals = list(seg[o + 17:o + 17 + n])
                huff[(tc, th)] = _decode_table(bits, vals)
                o += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec not in (8, 12):
                raise ValueError(f"SOF precision {prec} invalid")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "prec": prec,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"unsupported SOF marker {marker:#x}")
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            ns = seg[0]
            sel = {}
            scan_ids = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                sel[cs] = (tables >> 4, tables & 0xF)
                scan_ids.append(cs)
            if frame is None:
                raise ValueError("SOS before SOF")
            if not frame.get("progressive"):
                pos += seglen
                return _decode_scan(data, pos, frame, sel, qt, huff, dri, keep_precision)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            _init_prog_state(frame)
            pos = _decode_prog_scan(
                data, pos + seglen, frame, scan_ids, sel,
                ss, se, ahal >> 4, ahal & 0xF, huff, dri,
            )
            continue
        pos += seglen
    if frame is not None and frame.get("progressive") and "state" in frame:
        comps = frame["state"]
        hmax = max(c["h"] for c in frame["comps"])
        vmax = max(c["v"] for c in frame["comps"])
        return _blocks_to_image(
            comps, frame["h"], frame["w"], hmax, vmax, qt,
            prec=frame.get("prec", 8), keep_precision=keep_precision,
        )
    raise ValueError("no SOS marker found")


def _init_prog_state(frame) -> None:
    """Allocate per-component coefficient arrays once (first SOS): the
    MCU-padded block grid shared by every scan of the progressive frame."""
    if "state" in frame:
        return
    comps = [dict(c) for c in frame["comps"]]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        # non-interleaved scan geometry (T.81 A.1.1): ceil dims of the
        # component's OWN sample grid, NOT the MCU-padded grid
        sw = -(-(w * c["h"]) // hmax)
        sh = -(-(h * c["v"]) // vmax)
        c["nbw"] = -(-sw // 8)
        c["nbh"] = -(-sh // 8)
        c["blocks"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        c["pred"] = 0
    frame["state"] = comps
    frame["mcux"], frame["mcuy"] = mcux, mcuy


def _refine_nonzero(blk, k, se, p1, rd) -> None:
    """Append one correction bit to every nonzero-history coefficient in
    blk[k..se] (T.81 G.2.2 / libjpeg decode_mcu_AC_refine tail)."""
    for j in range(k, se + 1):
        if blk[j] != 0 and rd.read_bit():
            if (blk[j] & p1) == 0:
                blk[j] += p1 if blk[j] >= 0 else -p1


def _decode_prog_scan(
    data, pos, frame, scan_ids, sel, ss, se, ah, al, huff, dri
) -> int:
    """Decode one progressive scan (any of the four kinds); returns the byte
    offset of the next marker. Coefficients accumulate into frame['state']."""
    comps = [next(c for c in frame["state"] if c["id"] == cid) for cid in scan_ids]
    rd = _BitReader(data, pos)
    interleaved = len(comps) > 1
    eobrun = 0
    p1 = 1 << al

    if ss == 0:  # DC scan (se must be 0)
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        for c in comps:
            c["pred"] = 0

        def dc_block(c, idx, dc_t):
            blk = c["blocks"][idx]
            if ah == 0:
                s = rd.decode_huff(dc_t)
                diff = _extend(rd.read_bits(s), s) if s else 0
                c["pred"] += diff
                blk[0] = c["pred"] << al
            elif rd.read_bit():
                blk[0] |= p1

        if interleaved:
            mcux, mcuy = frame["mcux"], frame["mcuy"]
            n_mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if dri and n_mcu and n_mcu % dri == 0:
                        rd.restart()
                        for c in comps:
                            c["pred"] = 0
                    n_mcu += 1
                    for c in comps:
                        dc_t = huff.get((0, sel[c["id"]][0]))
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                row = my * c["v"] + by
                                col = mx * c["h"] + bx
                                dc_block(c, row * c["bw"] + col, dc_t)
        else:
            c = comps[0]
            dc_t = huff.get((0, sel[c["id"]][0]))
            n_blk = 0
            for row in range(c["nbh"]):
                for col in range(c["nbw"]):
                    if dri and n_blk and n_blk % dri == 0:
                        rd.restart()
                        c["pred"] = 0
                    n_blk += 1
                    dc_block(c, row * c["bw"] + col, dc_t)
    else:  # AC scan: single component, non-interleaved (T.81 G.1.1.1.1)
        if interleaved:
            raise ValueError("progressive AC scan must be non-interleaved")
        c = comps[0]
        ac_t = huff.get((1, sel[c["id"]][1]))
        n_blk = 0
        for row in range(c["nbh"]):
            for col in range(c["nbw"]):
                if dri and n_blk and n_blk % dri == 0:
                    rd.restart()
                    eobrun = 0
                n_blk += 1
                blk = c["blocks"][row * c["bw"] + col]
                if ah == 0:  # AC first scan (with optional point transform)
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = rd.decode_huff(ac_t)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += rd.read_bits(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("AC index overflow in scan band")
                        blk[k] = _extend(rd.read_bits(s), s) << al
                        k += 1
                else:  # AC refinement (G.2.2; libjpeg decode_mcu_AC_refine)
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = rd.decode_huff(ac_t)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r != 15:
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += rd.read_bits(r)
                                    break
                                val = 0  # ZRL: pass 16 zero-history coeffs
                            elif s == 1:
                                val = p1 if rd.read_bit() else -p1
                            else:
                                raise ValueError("refinement size must be 1")
                            while k <= se:
                                if blk[k] != 0:
                                    if rd.read_bit():
                                        if (blk[k] & p1) == 0:
                                            blk[k] += p1 if blk[k] >= 0 else -p1
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if val != 0 and k <= se:
                                blk[k] = val
                            k += 1
                    if eobrun > 0:
                        _refine_nonzero(blk, k, se, p1, rd)
                        eobrun -= 1

    return _next_marker_pos(data, rd.pos)


def _next_marker_pos(data: bytes, pos: int) -> int:
    """First byte offset at/after ``pos`` holding a real marker (FF followed
    by neither 00 stuffing nor RSTn)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            if 0xD0 <= data[pos + 1] <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return n


def _decode_scan(data, pos, frame, sel, qt, huff, dri, keep_precision=False) -> np.ndarray:
    if frame is None:
        raise ValueError("SOS before SOF")
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks across, padded to MCU grid
        c["bh"] = mcuy * c["v"]
        c["blocks"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        c["pred"] = 0
        c["dc"], c["ac"] = sel[c["id"]]

    rd = _BitReader(data, pos)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:
                rd.restart()
                for c in comps:
                    c["pred"] = 0
            n_mcu += 1
            for c in comps:
                dc_t = huff[(0, c["dc"])]
                ac_t = huff[(1, c["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int32)
                        s = rd.decode_huff(dc_t)
                        diff = _extend(rd.read_bits(s), s) if s else 0
                        c["pred"] += diff
                        blk[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = rd.decode_huff(ac_t)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            blk[k] = _extend(rd.read_bits(s), s)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["blocks"][row * c["bw"] + col] = blk

    return _blocks_to_image(
        comps, h, w, hmax, vmax, qt,
        prec=frame.get("prec", 8), keep_precision=keep_precision,
    )


def _blocks_to_image(comps, h, w, hmax, vmax, qt, prec: int = 8,
                     keep_precision: bool = False) -> np.ndarray:
    """Shared tail of baseline and progressive decode: dequantize,
    de-zigzag, one vectorized IDCT per component, upsample, color convert.
    ``prec`` sets the level shift (2^(prec-1)) and clamp range; the 8-bit
    path is byte-identical to the original fixed-128 form."""
    half = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    planes = []
    for c in comps:
        zz = c["blocks"].astype(np.float64) * qt[c["tq"]][None, :]
        nat = np.zeros_like(zz)
        nat[:, ZIGZAG] = zz  # de-zigzag: zigzag pos i lives at natural ZIGZAG[i]
        b = nat.reshape(-1, 8, 8)
        px = np.einsum("ij,njk,kl->nil", _C8.T, b, _C8) + half
        grid = px.reshape(c["bh"], c["bw"], 8, 8).transpose(0, 2, 1, 3)
        plane = grid.reshape(c["bh"] * 8, c["bw"] * 8)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        rgb = np.stack([planes[0]] * 3, axis=-1)
    else:
        y, cb, cr = planes[0], planes[1] - half, planes[2] - half
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b_ = y + 1.772 * cb
        rgb = np.stack([r, g, b_], axis=-1)
    rgb = np.clip(rgb, 0, maxv)
    if prec == 8:
        return rgb.astype(np.uint8)
    if keep_precision:
        return np.round(rgb).astype(np.uint16)
    return np.round(rgb * (255.0 / maxv)).astype(np.uint8)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-convention quality (1-100) -> scaled table."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amplitude(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _encode_blocks(bw, blocks_zz, pred, dc_tab, ac_tab):
    """Write one component block's coefficients (zigzag int array)."""
    for blk in blocks_zz:
        diff = int(blk[0]) - pred[0]
        pred[0] = int(blk[0])
        s = _category(diff)
        code, ln = dc_tab[s]
        bw.write(code, ln)
        if s:
            bw.write(_amplitude(diff, s), s)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tab[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_tab[(run << 4) | s]
            bw.write(code, ln)
            bw.write(_amplitude(v, s), s)
            run = 0
        if last < 63:
            code, ln = ac_tab[0x00]  # EOB
            bw.write(code, ln)


def _dct_quant(plane: np.ndarray, qtab_zz: np.ndarray, half: float = 128.0) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) -> (n_blocks, 64) zigzag ints.
    Blocks ordered row-major over the block grid. ``half`` is the level
    shift (128 for 8-bit samples, 2048 for 12-bit)."""
    H, W = plane.shape
    b = plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    f = np.einsum("ij,njk,kl->nil", _C8, b - half, _C8.T).reshape(-1, 64)
    zz = f[:, ZIGZAG]
    return np.round(zz / qtab_zz[None, :]).astype(np.int32)


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    H, W = plane.shape
    return np.pad(plane, ((0, (-H) % mult), (0, (-W) % mult)), mode="edge")


def encode_jpeg(img: np.ndarray, quality: int = 90, subsample: bool = False,
                precision: int = 8) -> bytes:
    """(h, w, 3) or (h, w) -> JFIF bytes.

    ``subsample=True`` emits 4:2:0 (chroma averaged 2x2), else 4:4:4.
    ``precision=12`` (samples 0..4095, uint16) emits an extended-sequential
    frame (SOF1) with 16-bit DQT entries and widened flat Huffman tables
    (Annex K baseline tables stop at DC category 11 / AC size 10; 12-bit
    coefficients reach category 15) — the fixture path for decode_jpeg's
    12-bit support.
    """
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    half = float(1 << (precision - 1))
    qy = _quality_scale(QT_LUMA, quality)[ZIGZAG]      # zigzag order
    qc = _quality_scale(QT_CHROMA, quality)[ZIGZAG]

    if gray:
        y = img.astype(np.float64)
        planes = [(_pad_edge(y, 8), qy, 0)]
        comps = [(1, 1, 1, 0)]
    else:
        rgb = img.astype(np.float64)
        r, g, b_ = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b_
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b_ + half
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b_ + half
        if subsample:
            yp = _pad_edge(y, 16)
            cbp = _pad_edge(cb, 16)
            crp = _pad_edge(cr, 16)
            cbs = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
            crs = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
            planes = [(yp, qy, 0), (cbs, qc, 1), (crs, qc, 1)]
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        else:
            planes = [(_pad_edge(y, 8), qy, 0), (_pad_edge(cb, 8), qc, 1),
                      (_pad_edge(cr, 8), qc, 1)]
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]

    coeffs = [_dct_quant(p, q, half=half) for p, q, _ in planes]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, tab in ((0, qy), (1, qc)) if not gray else ((0, qy),):
        if precision == 8:
            out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
                + bytes(int(x) for x in tab)
        else:  # Pq=1: 16-bit entries
            out += b"\xff\xdb" + struct.pack(">H", 131) + bytes([0x10 | tq]) \
                + tab.astype(">u2").tobytes()
    nc = 1 if gray else 3
    sof = 0xC0 if precision == 8 else 0xC1  # extended sequential for 12-bit
    out += bytes([0xFF, sof]) + struct.pack(">HBHHB", 8 + 3 * nc, precision, h, w, nc)
    for cid, hs, vs, tq in comps:
        out += bytes([cid, (hs << 4) | vs, tq])
    if precision == 8:
        tables = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)]
        if not gray:
            tables += [(0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_CHROMA)]
    else:
        tables = [(0x00, _FLAT_DC12), (0x10, _FLAT_AC12)]
        if not gray:
            tables += [(0x01, _FLAT_DC12), (0x11, _FLAT_AC12)]
    for tid, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tid]) \
            + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for i, (cid, *_rest) in enumerate(comps):
        out += bytes([cid, 0x00 if i == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    if precision == 8:
        enc_dc = [_encode_table(*HUFF_DC_LUMA), _encode_table(*HUFF_DC_CHROMA)]
        enc_ac = [_encode_table(*HUFF_AC_LUMA), _encode_table(*HUFF_AC_CHROMA)]
    else:
        enc_dc = [_encode_table(*_FLAT_DC12)] * 2
        enc_ac = [_encode_table(*_FLAT_AC12)] * 2
    bw = _BitWriter()
    preds = [[0] for _ in comps]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    bws = [planes[i][0].shape[1] // 8 for i in range(len(comps))]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                tsel = 0 if ci == 0 else 1
                for by in range(vs):
                    for bx in range(hs):
                        row = my * vs + by
                        col = mx * hs + bx
                        blk = coeffs[ci][row * bws[ci] + col]
                        _encode_blocks(bw, [blk], preds[ci],
                                       enc_dc[tsel], enc_ac[tsel])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------- progressive encoder

# flat 8-bit AC Huffman table for EOB-run scans: Annex K baseline tables
# carry no EOBn symbols ((r<<4)|0 for r>=1 — baseline never needs them), so
# runs longer than one block require a custom table; all (run, size) symbols
# at code length 8 is canonical-valid (176 codes < 255)
_FLAT_AC = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
)

# 12-bit tables: DC categories reach 15 (diff range +-16384 after the 2048
# level shift) and AC sizes reach 15 — beyond Annex K's baseline tables.
# Flat canonical tables: 16 DC symbols at length 5, 242 AC symbols (EOB +
# ZRL + every (run, 1<=size<=15)) at length 8.
_FLAT_DC12 = ([0, 0, 0, 0, 16] + [0] * 11, list(range(16)))
_FLAT_AC12 = (
    [0, 0, 0, 0, 0, 0, 0, 242, 0, 0, 0, 0, 0, 0, 0, 0],
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 16)],
)


def _flush_eobrun(bw, ac_tab, eobrun: int, br: list[int]) -> None:
    """Emit an EOBn symbol covering ``eobrun`` blocks plus the buffered
    correction bits of those blocks (refinement scans)."""
    if eobrun:
        r = eobrun.bit_length() - 1
        code, ln = ac_tab[r << 4]
        bw.write(code, ln)
        if r:
            bw.write(eobrun - (1 << r), r)
    for bit in br:
        bw.write(bit, 1)


def _enc_ac_first_scan(bw, blocks, ss, se, al, ac_tab, eob_runs=False):
    """AC first scan (Ah=0) over one component's blocks: point transform
    |v| >> Al, zero runs. ``eob_runs=False`` flushes an EOB per block (fits
    the Annex K tables); ``eob_runs=True`` accumulates cross-block EOBn runs
    (needs a table with EOBn symbols, e.g. ``_FLAT_AC``)."""
    eobrun = 0
    for blk in blocks:
        r = 0
        emitted = False
        for k in range(ss, se + 1):
            v = int(blk[k])
            mag = (v if v >= 0 else -v) >> al
            if mag == 0:
                r += 1
                continue
            if not emitted and eobrun:
                _flush_eobrun(bw, ac_tab, eobrun, [])
                eobrun = 0
            while r > 15:
                code, ln = ac_tab[0xF0]
                bw.write(code, ln)
                r -= 16
            s = mag.bit_length()
            code, ln = ac_tab[(r << 4) | s]
            bw.write(code, ln)
            signed = mag if v >= 0 else -mag
            bw.write(_amplitude(signed, s), s)
            r = 0
            emitted = True
        if r > 0 or not emitted:
            eobrun += 1
            if not eob_runs or eobrun == 0x7FFF:
                _flush_eobrun(bw, ac_tab, eobrun, [])
                eobrun = 0
    _flush_eobrun(bw, ac_tab, eobrun, [])


def _enc_ac_refine_scan(bw, blocks, ss, se, al, ac_tab, eob_runs=False):
    """AC refinement scan (Ah=Al+1): libjpeg jcphuff encode_mcu_AC_refine
    ordering — pending ZRLs flush BEFORE buffering the current coefficient's
    correction bit, so the decoder's coefficient walk consumes correction
    bits in exactly the emitted order. ``eob_runs=True`` accumulates
    cross-block EOBn runs with their buffered correction bits."""
    eobrun = 0
    run_br: list[int] = []  # correction bits of the blocks inside the run
    for blk in blocks:
        mags = [(abs(int(blk[k])) >> al, int(blk[k]) >= 0) for k in range(ss, se + 1)]
        # last newly-significant index (libjpeg's EOB): ZRLs are emitted only
        # while one lies ahead; trailing zeros/corrections fold into the run
        kex = ss - 1
        for i, (m, _pos) in enumerate(mags):
            if m == 1:
                kex = ss + i
        r = 0
        br: list[int] = []
        emitted = False
        for i, (mag, positive) in enumerate(mags):
            k = ss + i
            if mag == 0:
                r += 1
                continue
            if k <= kex:
                # symbols still follow in this block: close any pending
                # cross-block run, then pending ZRLs — BEFORE buffering this
                # coefficient's bit, so the decoder's walk consumes
                # correction bits in traversal order (jcphuff.c ordering)
                if eobrun or run_br:
                    _flush_eobrun(bw, ac_tab, eobrun, run_br)
                    eobrun, run_br = 0, []
                while r > 15:
                    code, ln = ac_tab[0xF0]
                    bw.write(code, ln)
                    r -= 16
                    for bit in br:
                        bw.write(bit, 1)
                    br = []
            if mag > 1:  # already significant: append this bit's correction
                br.append(mag & 1)
                continue
            # newly significant (magnitude exactly 1 at this approximation)
            code, ln = ac_tab[(r << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if positive else 0, 1)
            for bit in br:
                bw.write(bit, 1)
            br = []
            r = 0
            emitted = True
        if r > 0 or br or not emitted:
            # this block's tail (or whole band) joins an EOB run
            eobrun += 1
            run_br.extend(br)
            if not eob_runs or eobrun == 0x7FFF:
                _flush_eobrun(bw, ac_tab, eobrun, run_br)
                eobrun, run_br = 0, []
    _flush_eobrun(bw, ac_tab, eobrun, run_br)


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 90, eob_runs: bool = False
) -> bytes:
    """(h, w, 3) or (h, w) uint8 -> progressive (SOF2) JFIF bytes, 4:4:4.

    Scan script exercises every progressive decode path: interleaved DC
    first with successive approximation (Al=1), per-component AC first in
    two spectral bands at Al=1, DC refinement, per-component AC refinement
    — the shape emitted by `jpegtran -progressive`-style encoders.
    ``eob_runs=True`` additionally codes cross-block EOBn runs through a
    custom AC table (Annex K tables carry no EOBn symbols)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qy = _quality_scale(QT_LUMA, quality)[ZIGZAG]
    qc = _quality_scale(QT_CHROMA, quality)[ZIGZAG]
    if gray:
        planes = [(_pad_edge(img.astype(np.float64), 8), qy)]
        comps = [(1, 0)]  # (component id, quant table)
    else:
        rgb = img.astype(np.float64)
        r, g, b_ = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b_
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b_ + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b_ + 128.0
        planes = [(_pad_edge(y, 8), qy), (_pad_edge(cb, 8), qc),
                  (_pad_edge(cr, 8), qc)]
        comps = [(1, 0), (2, 1), (3, 1)]
    coeffs = [_dct_quant(p, q) for p, q in planes]
    nc = len(comps)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, tab in ((0, qy), (1, qc)) if not gray else ((0, qy),):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(x) for x in tab)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for cid, tq in comps:
        out += bytes([cid, 0x11, tq])  # 4:4:4 sampling
    tables = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)]
    if not gray:
        tables += [(0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_CHROMA)]
    if eob_runs:
        tables.append((0x12, _FLAT_AC))  # AC table slot 2 (progressive: 0-3)
    for tid, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tid]) \
            + bytes(bits) + bytes(vals)

    enc_dc = [_encode_table(*HUFF_DC_LUMA), _encode_table(*HUFF_DC_CHROMA)]
    if eob_runs:
        flat = _encode_table(*_FLAT_AC)
        enc_ac = [flat, flat]
        ac_sel = [2, 2]
    else:
        enc_ac = [_encode_table(*HUFF_AC_LUMA), _encode_table(*HUFF_AC_CHROMA)]
        ac_sel = [0, 1]

    def sos_header(comp_idx, ss, se, ah, al):
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_idx), len(comp_idx))
        for ci in comp_idx:
            tsel = 0 if ci == 0 else 1
            hdr += bytes([comps[ci][0], (tsel << 4) | ac_sel[tsel]])
        return hdr + bytes([ss, se, (ah << 4) | al])

    # ---- scan 1: DC first, all components interleaved, Al=1
    out += sos_header(list(range(nc)), 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * nc
    n_blocks = coeffs[0].shape[0]  # 4:4:4: every component shares the grid
    for b in range(n_blocks):
        for ci in range(nc):
            v = int(coeffs[ci][b][0]) >> 1  # arithmetic shift (two's compl.)
            diff = v - preds[ci]
            preds[ci] = v
            s = _category(diff)
            code, ln = enc_dc[0 if ci == 0 else 1][s]
            bw.write(code, ln)
            if s:
                bw.write(_amplitude(diff, s), s)
    bw.flush()
    out += bw.out

    # ---- scans 2..: AC first per component, two spectral bands, Al=1
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(nc):
            out += sos_header([ci], ss, se, 0, 1)
            bw = _BitWriter()
            _enc_ac_first_scan(
                bw, coeffs[ci], ss, se, 1,
                enc_ac[0 if ci == 0 else 1], eob_runs=eob_runs,
            )
            bw.flush()
            out += bw.out

    # ---- DC refinement, all components interleaved, Ah=1 Al=0
    out += sos_header(list(range(nc)), 0, 0, 1, 0)
    bw = _BitWriter()
    for b in range(n_blocks):
        for ci in range(nc):
            bw.write(int(coeffs[ci][b][0]) & 1, 1)
    bw.flush()
    out += bw.out

    # ---- AC refinement per component, full band, Ah=1 Al=0
    for ci in range(nc):
        out += sos_header([ci], 1, 63, 1, 0)
        bw = _BitWriter()
        _enc_ac_refine_scan(
            bw, coeffs[ci], 1, 63, 0,
            enc_ac[0 if ci == 0 else 1], eob_runs=eob_runs,
        )
        bw.flush()
        out += bw.out

    out += b"\xff\xd9"
    return bytes(out)

"""Text canonicalization + term splitting.

Semantics cloned from the reference tokenizer
(``/root/reference/server/clip_server/model/simple_tokenizer.py``):

- ``basic_clean``      = ftfy.fix_text + html.unescape twice + strip
                         (simple_tokenizer.py:58-61)
- ``whitespace_clean`` = collapse ``\\s+`` -> ' ' + strip
                         (simple_tokenizer.py:64-67)
- lowercase            (simple_tokenizer.py:137)
- term split           = regex findall with the reference pattern
                         (simple_tokenizer.py:89-92): contraction suffixes,
                         unicode letter runs, single digits, punctuation runs.

We stop at words (SURVEY.md M4): BM25 terms are these regex tokens; the BPE
subword stage (M5) is not needed for term scoring.

ftfy is not available in this environment; it is imported best-effort and
falls back to identity (documented in tests — mojibake cases are skipped).
"""

from __future__ import annotations

import html

import numpy as np

try:  # pragma: no cover - environment-dependent
    import ftfy

    _fix_text = ftfy.fix_text
    _HAS_FTFY = True
except ImportError:  # pragma: no cover
    def _fix_text(text: str) -> str:
        return text

    _HAS_FTFY = False

try:
    import regex as _re

    # exact reference pattern, simple_tokenizer.py:89-92
    TOKEN_PATTERN = _re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
        _re.IGNORECASE,
    )
except ImportError:  # pragma: no cover - `regex` is available in this env
    import re as _re

    # \p{L}/\p{N} unavailable in stdlib re; \w-based approximation
    TOKEN_PATTERN = _re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[^\W\d_]+|\d|[^\s\w]+""",
        _re.IGNORECASE | _re.UNICODE,
    )

_WS = _re.compile(r"\s+")


def basic_clean(text: str) -> str:
    """ftfy + double html.unescape + strip (simple_tokenizer.py:58-61)."""
    text = _fix_text(text)
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    """Collapse runs of whitespace (simple_tokenizer.py:64-67)."""
    return _WS.sub(" ", text).strip()


def normalize(text: str, lowercase: bool = True) -> str:
    """Full canonicalization as applied at simple_tokenizer.py:137."""
    text = whitespace_clean(basic_clean(text))
    return text.lower() if lowercase else text


def tokenize(text: str, lowercase: bool = True) -> list[str]:
    """Normalize then split into terms with the reference regex."""
    return TOKEN_PATTERN.findall(normalize(text, lowercase=lowercase))


def tokenize_texts(texts, lowercase: bool = True) -> list[list[str]]:
    """Tokenize a column of texts. Nulls -> empty term list.

    The regex engine is C-backed; the Python loop here is over *rows of one
    batch*, which is the same granularity the reference uses
    (``simple_tokenizer.py:138`` runs findall per document).

    Fast path: ``whitespace_clean`` (collapse ``\\s+`` -> ' ') is provably a
    no-op for the TOKEN LIST — no alternative of TOKEN_PATTERN can match or
    span whitespace (letters/digits exclude it; the punctuation run is
    ``[^\\s...]+``), so findall over the uncollapsed string yields the exact
    same tokens. It is skipped here (it cost as much as findall itself);
    ``normalize()`` keeps it for callers that need the canonical STRING.
    Equivalence is pinned by tests/test_tokenizer.py.
    """
    pat = TOKEN_PATTERN
    clean = basic_clean
    out = []
    if lowercase:
        for t in texts:
            out.append([] if not t else pat.findall(clean(t).lower()))
    else:
        for t in texts:
            out.append([] if not t else pat.findall(clean(t)))
    return out


def tokenize_column(col, lowercase: bool = True) -> list[list[str]]:
    """Tokenize an Arrow string column — list-of-lists facade over the
    vectorized flat path (``tokenize_column_flat``). Identical token lists
    to ``tokenize_texts`` (pinned by tests/test_tokenizer.py)."""
    tokens, lens = tokenize_column_flat(col, lowercase=lowercase)
    toks = tokens.to_pylist()
    out: list[list[str]] = []
    p = 0
    for n in lens:
        q = p + int(n)
        out.append(toks[p:q])
        p = q
    return out


# ---------------------------------------------------------------------------
# Vectorized ASCII fast path
# ---------------------------------------------------------------------------
# The per-row ``findall`` loop dominates the build's tokenize stage (~85% of
# tokenize_column wall time measured on the bench fixture). For ASCII text the
# reference pattern (simple_tokenizer.py:89-92) is equivalent to a 4-class
# byte run segmentation:
#
#   letters  [\p{L}]+          -> maximal letter runs
#   digits   [\p{N}]           -> one token per digit
#   punct    [^\s\p{L}\p{N}]+  -> maximal punct runs
#   ws       \s                -> skipped (never matched)
#
# plus the ordered contraction alternatives ('s|'t|'re|'ve|'m|'ll|'d): an
# apostrophe starts a contraction token IFF it begins a fresh match (the
# previous byte is NOT punct — a greedy punct run would otherwise have
# consumed it) and the following 1-2 letters spell a suffix; the consumed
# letters are carved off the front of the following letter run. Everything
# here is numpy over the Arrow string buffer — no per-row Python.
#
# Rows that the byte model cannot express exactly fall back to the scalar
# reference path: any non-ASCII byte (\p{L}/\p{N}/\s beyond ASCII), '&'
# (html.unescape pre-pass, as in tokenize_column), or '<|' (the
# <|startoftext|>/<|endoftext|> specials). The class and suffix tables are
# DERIVED from the same compiled pattern's character classes at import time,
# so the fast path provably agrees with the regex on every ASCII byte;
# differential equivalence is pinned by tests/test_tokenizer.py.

try:
    _P_WS, _P_L, _P_N = _re.compile(r"\s"), _re.compile(r"\p{L}"), _re.compile(r"\p{N}")
except _re.error:  # pragma: no cover - stdlib re fallback branch
    _P_WS, _P_L, _P_N = _re.compile(r"\s"), _re.compile(r"[^\W\d_]"), _re.compile(r"\d")


def _build_byte_tables():
    cls = np.full(256, 4, np.uint8)  # 4 = non-ASCII marker (resolved per codepoint)
    for bb in range(128):
        ch = chr(bb)
        if _P_WS.match(ch):
            cls[bb] = 0
        elif _P_L.match(ch):
            cls[bb] = 1
        elif _P_N.match(ch):
            cls[bb] = 2
        else:
            cls[bb] = 3
    # 1-letter suffixes 's 't 'm 'd and 2-letter 're 've 'll, IGNORECASE
    suf1 = np.zeros(256, bool)
    for chs in "stmd":
        suf1[ord(chs)] = suf1[ord(chs.upper())] = True
    suf2 = np.asarray(
        sorted(
            ord(a) * 256 + ord(bch)
            for pair in ("re", "ve", "ll")
            for a in (pair[0], pair[0].upper())
            for bch in (pair[1], pair[1].upper())
        ),
        dtype=np.int32,
    )
    # bytes stripped by Python str.strip() (basic_clean, simple_tokenizer.py:61)
    # but NOT whitespace to the `regex` engine: \x1c-\x1f. These are punct
    # tokens interior but vanish at row ends — the one place basic_clean's
    # strip() is not a token no-op.
    stripx = np.zeros(256, bool)
    for bb in range(128):
        if chr(bb).isspace() and cls[bb] != 0:
            stripx[bb] = True
    return cls, suf1, suf2, stripx


_CLS, _SUF1, _SUF2, _STRIPX = _build_byte_tables()
_CLS_BMP: np.ndarray | None = None  # lazy 0x10000-entry codepoint class table
_FOLDX_BMP: np.ndarray | None = None  # codepoints where utf8_lower != str.lower


def _cls_bmp() -> np.ndarray:
    """Codepoint class table for the Basic Multilingual Plane, derived from
    the SAME regex character classes as the pattern (one findall sweep per
    class — built once per process, ~tens of ms). Classes as _CLS; non-BMP
    codepoints (4-byte UTF-8) take the per-row fallback instead."""
    global _CLS_BMP
    if _CLS_BMP is None:
        t = np.full(0x10000, 3, np.uint8)
        bmp = "".join(map(chr, range(0x10000)))
        for klass, pat in ((0, _P_WS), (1, _P_L), (2, _P_N)):
            idx = [ord(ch) for ch in pat.findall(bmp)]
            t[idx] = klass
        _CLS_BMP = t
    return _CLS_BMP


def _foldx_bmp() -> np.ndarray:
    """BMP codepoints whose Arrow ``utf8_lower`` differs from Python
    ``str.lower`` (the scalar reference fold): e.g. U+0130 İ (Python expands
    to i + combining dot) — plus U+03A3 Σ, whose Python lowering is
    CONTEXT-sensitive (final sigma). Rows containing any take the scalar
    fallback so the fast path is fold-exact, not just fold-close."""
    global _FOLDX_BMP
    if _FOLDX_BMP is None:
        import pyarrow as pa
        import pyarrow.compute as pc

        codes = [cp for cp in range(0x10000) if not 0xD800 <= cp <= 0xDFFF]
        cps = [chr(cp) for cp in codes]
        arrow = pc.utf8_lower(pa.array(cps, pa.string())).to_pylist()
        t = np.zeros(0x10000, bool)
        for cp, a, ch in zip(codes, arrow, cps):
            if a != ch.lower():
                t[cp] = True
        t[0x03A3] = True  # final-sigma context rule
        _FOLDX_BMP = t
    return _FOLDX_BMP


def _token_spans(b: np.ndarray, c: np.ndarray, rel_off: np.ndarray):
    """Token byte spans for concatenated rows, via run-length encoding.

    b: uint8 bytes of all rows; c: per-byte class (0 ws / 1 letter / 2 digit
    / 3 punct / 4 opaque — continuation bytes carry their codepoint's class);
    rel_off: int64 row offsets (len n_rows+1). Returns (starts, ends) sorted
    by start — row-major, in-row match order. Bytes of fallback rows may be
    present; their (garbage) spans are discarded by the caller's row mask.

    All per-byte work is one class compare + nonzero; everything else runs
    at RUN granularity (~#tokens, typically 4x fewer than bytes)."""
    m = len(b)
    sx = _STRIPX[b]
    if sx.any():
        # basic_clean's str.strip(): \x1c-\x1f are Python whitespace (dropped
        # at row ends) but regex punct (kept interior). Reclass the stripped
        # margins as whitespace so runs break exactly as the scalar path.
        c = c.copy()
        nz = np.nonzero(~(sx | (c == 0)))[0]
        hit_rows = np.unique(
            np.searchsorted(rel_off, np.nonzero(sx)[0], side="right") - 1
        )
        for r in hit_rows:
            s, e = rel_off[r], rel_off[r + 1]
            lo = np.searchsorted(nz, s)
            hi = np.searchsorted(nz, e) - 1
            if lo >= len(nz) or nz[lo] >= e:  # all-strippable row
                c[s:e] = 0
            else:
                c[s : nz[lo]] = 0
                c[nz[hi] + 1 : e] = 0

    # run boundaries: class changes ∪ row boundaries (runs never span rows).
    # Empty first/last rows put 0 / m into rel_off[1:-1] — as "boundaries"
    # they would create a zero-length run (a spurious empty token) or an
    # out-of-range rstart, so keep strict-interior offsets only.
    bounds = np.nonzero(c[1:] != c[:-1])[0] + 1
    interior = rel_off[1:-1]
    interior = interior[(interior > 0) & (interior < m)]
    if len(interior):
        bounds = np.unique(np.concatenate([bounds, interior]))
    rstart = np.empty(len(bounds) + 1, np.int64)
    rstart[0] = 0
    rstart[1:] = bounds
    rend = np.empty(len(bounds) + 1, np.int64)
    rend[:-1] = bounds
    rend[-1] = m
    rcls = c[rstart]

    lmask = rcls == 1
    ls, le = rstart[lmask], rend[lmask]
    pmask_all = rcls == 3
    ps, pe = rstart[pmask_all], rend[pmask_all]

    # contractions: an apostrophe punct-run start whose following 1-2 letters
    # spell a suffix ('s 't 'm 'd / 're 've 'll), same row
    cand = ps[b[ps] == 39]
    if len(cand):
        row_end = rel_off[np.searchsorted(rel_off, cand, side="right")]
        i1 = np.minimum(cand + 1, m - 1)
        i2 = np.minimum(cand + 2, m - 1)
        ok1 = cand + 1 < row_end
        one = ok1 & _SUF1[b[i1]]
        pair = b[i1].astype(np.int32) * 256 + b[i2]
        two = (cand + 2 < row_end) & ~one & np.isin(pair, _SUF2)
        k = one.astype(np.int64) + 2 * two.astype(np.int64)
        qk = cand[k > 0]
        kk = k[k > 0]
    else:
        qk = kk = np.empty(0, np.int64)
    if len(qk):
        # carve suffix letters off the front of the following letter run
        j = np.searchsorted(ls, qk + 1)
        ls = ls.copy()
        ls[j] = qk + 1 + kk
        keep = ls < le
        ls, le = ls[keep], le[keep]
        # the apostrophe is no longer a punct run of its own
        jj = np.searchsorted(ps, qk)
        pkeep = np.ones(len(ps), bool)
        pkeep[jj] = False
        ps, pe = ps[pkeep], pe[pkeep]

    # digit runs expand to one token per byte (ASCII digits only in good
    # rows; non-ASCII digits force the row fallback)
    dmask = rcls == 2
    dstart, dend = rstart[dmask], rend[dmask]
    dlens = dend - dstart
    tot = int(dlens.sum())
    if tot:
        off = np.zeros(len(dstart), np.int64)
        np.cumsum(dlens[:-1], out=off[1:])
        dp = np.arange(tot, dtype=np.int64) + np.repeat(dstart - off, dlens)
    else:
        dp = np.empty(0, np.int64)

    starts = np.concatenate([ls, qk, ps, dp])
    ends = np.concatenate([le, qk + 1 + kk, pe, dp + 1])
    o = np.argsort(starts, kind="stable")
    return starts[o], ends[o]


def tokenize_column_flat(col, lowercase: bool = True):
    """Tokenize an Arrow string column into a FLAT token array.

    Returns ``(tokens, lens)`` where ``tokens`` is a ``pa.StringArray`` of
    all rows' tokens in row-major order and ``lens`` is an int64 ndarray of
    per-row token counts. Token-identical to ``tokenize_texts`` /
    ``tokenize_column`` (pinned by tests/test_tokenizer.py); the flat layout
    lets the build consume tokens without materializing Python lists."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    empty = pa.array([], pa.string())
    if n == 0:
        return empty, np.zeros(0, np.int64)
    if _HAS_FTFY:  # pragma: no cover - scalar parity path when ftfy exists
        lists = tokenize_texts(col.to_pylist(), lowercase=lowercase)
        lens = np.fromiter((len(t) for t in lists), np.int64, count=n)
        return pa.array([t for lst in lists for t in lst], pa.string()), lens
    if col.null_count:
        col = pc.fill_null(col, "")
    lowered = pc.utf8_lower(col) if lowercase else col
    if isinstance(lowered, pa.ChunkedArray):  # pragma: no cover
        lowered = lowered.combine_chunks()

    import pyarrow.types as pt

    odt = np.int64 if pt.is_large_string(lowered.type) else np.int32
    offs = np.frombuffer(lowered.buffers()[1], odt)[
        lowered.offset : lowered.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(lowered.buffers()[2], np.uint8)
    b = data[offs[0] : offs[-1]]
    rel_off = offs - offs[0]
    if len(b) == 0:
        return empty, np.zeros(n, np.int64)

    # per-byte classes; non-ASCII codepoints resolved exactly from the BMP
    # table (continuation bytes inherit the lead's class so multibyte letters
    # extend letter runs at the byte level)
    c = _CLS[b]
    bad_rows = np.zeros(n, bool)

    def _mark(pos: np.ndarray):
        if len(pos):
            bad_rows[np.searchsorted(rel_off, pos, side="right") - 1] = True

    pos80 = np.nonzero(b >= 0x80)[0]
    if len(pos80):
        t16 = _cls_bmp()
        m = len(b)
        bb = b[pos80]
        l2 = pos80[(bb >= 0xC0) & (bb < 0xE0)]
        l3 = pos80[(bb >= 0xE0) & (bb < 0xF0)]
        l4 = pos80[bb >= 0xF0]
        if len(l2):
            cp2 = ((b[l2] & 0x1F).astype(np.int32) << 6) | (b[np.minimum(l2 + 1, m - 1)] & 0x3F)
            k2 = t16[cp2]
            c[l2] = k2
            c[np.minimum(l2 + 1, m - 1)] = k2
            _mark(l2[k2 == 2])  # non-ASCII digit: one token per CODEPOINT
        if len(l3):
            cp3 = (
                ((b[l3] & 0x0F).astype(np.int32) << 12)
                | ((b[np.minimum(l3 + 1, m - 1)] & 0x3F).astype(np.int32) << 6)
                | (b[np.minimum(l3 + 2, m - 1)] & 0x3F)
            )
            k3 = t16[cp3]
            c[l3] = k3
            c[np.minimum(l3 + 1, m - 1)] = k3
            c[np.minimum(l3 + 2, m - 1)] = k3
            _mark(l3[k3 == 2])
        _mark(l4)  # astral plane: per-row fallback

    if lowercase:
        # fold-divergent sources (İ, Σ, …) are only visible in the RAW
        # buffer — the fold already rewrote them in `lowered` (İ becomes
        # plain ASCII 'i'), so this scan is independent of pos80
        rodt = np.int64 if pt.is_large_string(col.type) else np.int32
        roffs = np.frombuffer(col.buffers()[1], rodt)[
            col.offset : col.offset + n + 1
        ].astype(np.int64)
        rb = np.frombuffer(col.buffers()[2], np.uint8)[roffs[0] : roffs[-1]]
        rpos = np.nonzero(rb >= 0xC0)[0]  # lead bytes only
        if len(rpos):
            fx = _foldx_bmp()
            rrel = roffs - roffs[0]
            mm = len(rb)
            rbb = rb[rpos]
            rl2 = rpos[rbb < 0xE0]
            rl3 = rpos[(rbb >= 0xE0) & (rbb < 0xF0)]
            divpos = []
            if len(rl2):
                cp = ((rb[rl2] & 0x1F).astype(np.int32) << 6) | (
                    rb[np.minimum(rl2 + 1, mm - 1)] & 0x3F
                )
                divpos.append(rl2[fx[cp]])
            if len(rl3):
                cp = (
                    ((rb[rl3] & 0x0F).astype(np.int32) << 12)
                    | ((rb[np.minimum(rl3 + 1, mm - 1)] & 0x3F).astype(np.int32) << 6)
                    | (rb[np.minimum(rl3 + 2, mm - 1)] & 0x3F)
                )
                divpos.append(rl3[fx[cp]])
            for dv in divpos:
                if len(dv):
                    bad_rows[np.searchsorted(rrel, dv, side="right") - 1] = True

    # '&' rows take the html.unescape pre-pass; '<|' rows may hold specials
    amp_rows = np.zeros(n, bool)
    amppos = np.nonzero(b == 38)[0]
    if len(amppos):
        amp_rows[np.searchsorted(rel_off, amppos, side="right") - 1] = True
        bad_rows |= amp_rows
    ltpos = np.nonzero((b[:-1] == 60) & (b[1:] == 124))[0]
    if len(ltpos):
        _mark(ltpos)
        _mark(ltpos + 1)

    starts, ends = _token_spans(b, c, rel_off)
    row_of_tok = np.searchsorted(rel_off, starts, side="right") - 1

    if bad_rows.any():
        # scalar reference path for the fallback rows: encode their tokens
        # into a blob APPENDED to b, splice spans by destination index — one
        # gather builds the final values buffer, no per-token argsort/take
        good = ~bad_rows[row_of_tok]
        starts, ends, row_of_tok = starts[good], ends[good], row_of_tok[good]
        findall = TOKEN_PATTERN.findall
        unesc = html.unescape
        fb_idx = np.nonzero(bad_rows)[0]
        fb_lists = []
        for i in fb_idx:
            if amp_rows[i]:  # '&': exact reference order, unescape first
                raw = unesc(unesc(col[int(i)].as_py())).strip()
                fb_lists.append(findall(raw.lower() if lowercase else raw))
            else:
                t = col[int(i)].as_py().strip()  # basic_clean strip, Python fold
                fb_lists.append(findall(t.lower() if lowercase else t) if t else [])
        enc = [tok.encode("utf-8") for lst in fb_lists for tok in lst]
        fb_counts = np.fromiter((len(l) for l in fb_lists), np.int64, count=len(fb_lists))
        fb_lens = np.fromiter((len(e) for e in enc), np.int64, count=len(enc))
        base = len(b)
        b = np.concatenate([b, np.frombuffer(b"".join(enc), np.uint8)])
        fb_starts = np.zeros(len(enc), np.int64)
        if len(enc) > 1:
            np.cumsum(fb_lens[:-1], out=fb_starts[1:])
        fb_starts += base

        counts = np.bincount(row_of_tok, minlength=n)
        counts[fb_idx] = fb_counts
        row_off = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=row_off[1:])
        g_off = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(row_of_tok, minlength=n), out=g_off[1:])
        dest_good = row_off[row_of_tok] + (
            np.arange(len(starts), dtype=np.int64) - g_off[row_of_tok]
        )
        fb_rows = np.repeat(fb_idx, fb_counts)
        f_off = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(fb_rows, minlength=n), out=f_off[1:])
        dest_fb = row_off[fb_rows] + (
            np.arange(len(enc), dtype=np.int64) - f_off[fb_rows]
        )
        total = len(starts) + len(enc)
        s2 = np.empty(total, np.int64)
        e2 = np.empty(total, np.int64)
        s2[dest_good], e2[dest_good] = starts, ends
        s2[dest_fb], e2[dest_fb] = fb_starts, fb_starts + fb_lens
        starts, ends, lens_out = s2, e2, counts
    else:
        lens_out = np.bincount(row_of_tok, minlength=n)

    # one fancy gather builds the token values buffer
    tok_lens = ends - starts
    out_off = np.zeros(len(starts) + 1, np.int64)
    np.cumsum(tok_lens, out=out_off[1:])
    gather = np.arange(out_off[-1], dtype=np.int64) + np.repeat(
        starts - out_off[:-1], tok_lens
    )
    values = b[gather]
    assert out_off[-1] < (1 << 31), "token bytes exceed int32 offsets; shrink batch"
    tokens = pa.Array.from_buffers(
        pa.utf8(),
        len(starts),
        [None, pa.py_buffer(out_off.astype(np.int32)), pa.py_buffer(values)],
    )
    return tokens, lens_out


def term_frequencies(terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(unique_terms, counts) for one document's term list; dl = len(terms)."""
    if not terms:
        return np.array([], dtype=object), np.array([], dtype=np.int32)
    uniq, counts = np.unique(np.asarray(terms, dtype=object), return_counts=True)
    return uniq, counts.astype(np.int32)

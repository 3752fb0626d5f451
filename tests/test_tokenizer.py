"""Tokenizer semantics pinned to the reference
(/root/reference/server/clip_server/model/simple_tokenizer.py:58-92,135-143).

Golden rows cover every normalization branch (FIXTURES.md golden_tokens):
double html.unescape, whitespace collapse, lowercase, each regex alternative
(contraction suffixes, letter runs, single digits, punctuation runs).
"""

import pytest

from clip_as_service_ray.functions.tokenizer import (
    basic_clean,
    normalize,
    tokenize,
    tokenize_texts,
    whitespace_clean,
)

GOLDEN = [
    # (input, expected terms)
    ("hello world", ["hello", "world"]),
    ("Hello WORLD", ["hello", "world"]),  # lowercase (simple_tokenizer.py:137)
    ("  spaced\t\nout  ", ["spaced", "out"]),  # whitespace_clean (:64-67)
    ("don't", ["don", "'t"]),  # contraction suffix branch (:89-92)
    ("we'll i'm you're they'd i've it's", ["we", "'ll", "i", "'m", "you", "'re", "they", "'d", "i", "'ve", "it", "'s"]),
    ("42nd street", ["4", "2", "nd", "street"]),  # single-digit alternative
    ("wow!!! ok?!?", ["wow", "!!!", "ok", "?!?"]),  # punctuation runs
    ("Tom &amp;amp; Jerry", ["tom", "&", "jerry"]),  # DOUBLE unescape (:60)
    ("a &lt;tag&gt; b", ["a", "<", "tag", ">", "b"]),
    ("naïve café", ["naïve", "café"]),  # \p{L} includes accented letters
    ("東京 データ", ["東京", "データ"]),  # non-Latin letter runs
    ("", []),
    ("   \t  ", []),
    ("<|startoftext|>x<|endoftext|>", ["<|startoftext|>", "x", "<|endoftext|>"]),
    ("mix3d alphanum3ric", ["mix", "3", "d", "alphanum", "3", "ric"]),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_golden_tokens(text, expected):
    assert tokenize(text) == expected


def test_basic_clean_double_unescape():
    assert basic_clean("&amp;amp;") == "&"
    assert basic_clean("  x  ") == "x"


def test_whitespace_clean():
    assert whitespace_clean("a \t\n  b\r\nc") == "a b c"


def test_normalize_composition():
    assert normalize("  A &amp;  B  ") == "a & b"
    assert normalize("A", lowercase=False) == "A"


def test_tokenize_texts_nulls_and_empties():
    out = tokenize_texts([None, "", "one two", "   "])
    assert out == [[], [], ["one", "two"], []]


def test_fast_path_equals_normalized_path():
    """tokenize_texts skips whitespace_clean; prove token equality with the
    fully-normalized path on goldens plus adversarial whitespace strings."""
    import numpy as np

    from clip_as_service_ray.functions.tokenizer import TOKEN_PATTERN

    rng = np.random.default_rng(5)
    pieces = ["ab", "x9", "don't", "!!", "…", "\t", "\n", "  ", " ", "é龍", "<|startoftext|>"]
    samples = [t for t, _ in GOLDEN]
    for _ in range(200):
        samples.append("".join(rng.choice(pieces, rng.integers(1, 25))))
    for s in samples:
        slow = TOKEN_PATTERN.findall(normalize(s))
        fast = tokenize_texts([s])[0]
        assert fast == slow, repr(s)


def test_tokenize_column_equals_tokenize_texts():
    """The Arrow-column build hot path (vectorized lower + &-gated unescape)
    must produce identical token lists to the scalar path — including
    case-sensitive entities where unescape-then-lower differs from
    lower-then-unescape (&Gt; is U+226B, &gt; is '>')."""
    import pyarrow as pa

    from clip_as_service_ray.functions.tokenizer import tokenize_column

    samples = [t for t, _ in GOLDEN] + [
        None, "", "   ", "A &Gt; B", "A &gt; B", "&AMP; &amp;", "&Auml;bc",
        "Tom &amp;amp; Jerry", "x &Omega; y", "no entities HERE", "&bogus; &",
        "MiXeD Case &LT;tag&GT;", "東京 &amp; データ",
    ]
    for lc in (True, False):
        col = pa.array(samples, pa.string())
        fast = tokenize_column(col, lowercase=lc)
        slow = tokenize_texts(samples, lowercase=lc)
        assert fast == slow
    # chunked input
    ch = pa.chunked_array([samples[:5], samples[5:]], pa.string())
    assert tokenize_column(ch) == tokenize_texts(samples)


def test_tokenize_column_flat_equals_scalar_fuzz():
    """The vectorized byte-classification path (tokenize_column_flat) must be
    token-identical to the scalar reference path on adversarial contraction /
    control-char / unicode-fold cases and on random fuzz, in both case
    modes. Covers: contraction carving ('s/'t/'re/'ve/'m/'ll/'d incl. the
    'street prefix-match rule), greedy punct runs over apostrophes, \\x1c-\\x1f
    (Python-strip-only whitespace), fold-divergent codepoints (İ, final
    sigma), non-ASCII digits (one token per codepoint), astral-plane chars,
    '&' entity rows, and <|startoftext|> specials."""
    import random
    import string

    import pyarrow as pa

    from clip_as_service_ray.functions.tokenizer import tokenize_column_flat

    def flat_to_lists(tokens, lens):
        toks = tokens.to_pylist()
        out, p = [], 0
        for ln in lens:
            q = p + int(ln)
            out.append(toks[p:q])
            p = q
        return out

    cases = [
        "don't stop", "it's can't we'll they'd i've you're shouldn't i'm",
        "'street 'reach 'verify 'llama 'lt 'm", "a''t x's't", "Tom &amp; Jerry",
        "<|startoftext|>hello<|endoftext|>", "", "   ",
        "naïve café 東京 データ 検索 モデル", "abc123!!! x,y;z", "42 7", "a’b",
        "x'", "'", "a'ref'll", "UPPER Case", None, "tab\there\nnewline",
        chr(28) + "fs" + chr(31), "a" + chr(28) + "b", chr(28) + "!x",
        "٣ arabic digits ٤٥", "emoji 😀 astral 𝕏", "İstanbul TURKISH ı",
        "ΣΊΣΥΦΟΣ greek sigma ς", "中文标点。，！", "ｆｕｌｌｗｉｄｔｈ１２３",
        "　ideographic space　", "ǅungla titlecase", "x &lt; y &amp; z",
    ]
    random.seed(11)
    charset = (
        string.ascii_letters + string.digits + " \t\n'\"!?.,;:-_()[]&<>|"
        + "éİΣ東あ٣😀" + chr(28) + chr(31)
    )
    for _ in range(2500):
        cases.append("".join(random.choice(charset) for _ in range(random.randint(0, 40))))
    col = pa.array(cases, pa.string())
    filled = [c if c is not None else "" for c in cases]
    for lc in (True, False):
        got = flat_to_lists(*tokenize_column_flat(col, lowercase=lc))
        exp = tokenize_texts(filled, lowercase=lc)
        for i, (g, e) in enumerate(zip(got, exp)):
            assert g == e, (lc, repr(cases[i]), e, g)


def test_tokenize_column_flat_fixture_shard():
    """Flat path == scalar path over a slice of the synthetic transcripts
    fixture (the actual build input distribution, ~20% unicode-bearing rows)."""
    import pyarrow as pa

    from clip_as_service_ray.functions.tokenizer import tokenize_column_flat
    from clip_as_service_ray.sources.transcripts import synthesize_transcripts

    tbl = synthesize_transcripts(4000, seed=9)
    col = tbl.column("text").combine_chunks()
    tokens, lens = tokenize_column_flat(col)
    assert int(lens.sum()) == len(tokens)
    toks = tokens.to_pylist()
    exp = tokenize_texts(col.to_pylist())
    p = 0
    for i, ln in enumerate(lens):
        q = p + int(ln)
        assert toks[p:q] == exp[i], i
        p = q


def test_tokenize_column_flat_empty_edge_rows():
    """Empty FIRST/LAST rows regression: an empty last row used to crash
    (rel_off boundary == m indexed past the class array) and an empty first
    row emitted a spurious '' token (zero-length run at offset 0)."""
    import pyarrow as pa

    from clip_as_service_ray.functions.tokenizer import tokenize_column_flat

    for rows in (
        ["a", ""], ["", "a"], ["a b", ""], ["x y", "", ""], ["", "", "x"],
        ["", ""], ["a", "", "b"], [" ", "a", ""],
    ):
        tokens, lens = tokenize_column_flat(pa.array(rows, pa.string()))
        exp = tokenize_texts(rows)
        assert lens.tolist() == [len(e) for e in exp], rows
        assert tokens.to_pylist() == [t for e in exp for t in e], rows

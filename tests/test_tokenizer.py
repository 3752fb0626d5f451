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

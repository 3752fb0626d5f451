"""Byte-pair-encoding kernels (SURVEY §2.2 M5, the last un-ported row).

Semantics follow the reference subword tokenizer
(``/root/reference/server/clip_server/model/simple_tokenizer.py``):

- ``bytes_to_unicode``  — the published GPT-2/CLIP reversible byte→printable
  mapping (simple_tokenizer.py:20-43): printable latin bytes map to
  themselves, everything else is shifted into 256+n codepoints so merge
  tables never contain whitespace/control characters.
- word framing          — a word is its UTF-8 bytes through that map with
  ``</w>`` appended to the LAST symbol (simple_tokenizer.py:103), so merges
  learned at word ends don't leak into word interiors.
- ``bpe_word``          — the greedy loop (simple_tokenizer.py:94-133):
  repeatedly merge the pair with the LOWEST merge rank present in the word
  until no ranked pair remains; per-word results are cached by the caller
  (simple_tokenizer.py:85-88 LRU analog lives in stages/bpe.py).

The reference ships a frozen 49k-merge vocab file; this engine instead
LEARNS the merge table from the corpus (``train_bpe`` — the classic
Sennrich-2016 procedure over a word-frequency table, with a deterministic
(count DESC, pair ASC) tie-break). Training input is (word, freq), NOT the
corpus: the corpus-sized work is the distributed word count in
stages/bpe.py; the merge loop is corpus-size-independent.
"""

from __future__ import annotations

from collections import defaultdict

_END = "</w>"
_INF = float("inf")


def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte→unicode map (simple_tokenizer.py:20-43)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


_B2U = bytes_to_unicode()
_U2B = {v: k for k, v in _B2U.items()}


def word_symbols(word: str) -> tuple[str, ...]:
    """UTF-8 bytes through the unicode map, ``</w>`` fused onto the last
    symbol (simple_tokenizer.py:103). Empty word -> ()."""
    if not word:
        return ()
    syms = [_B2U[b] for b in word.encode("utf-8")]
    syms[-1] += _END
    return tuple(syms)


def _merge_word(syms: list[str], a: str, b: str, ab: str) -> list[str]:
    """Merge every left-to-right occurrence of (a, b) into ab."""
    out = []
    i, n = 0, len(syms)
    while i < n:
        if syms[i] == a and i + 1 < n and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    cache: dict | None = None,
) -> tuple[str, ...]:
    """Greedy lowest-rank merge loop (simple_tokenizer.py:105-130)."""
    if cache is not None:
        hit = cache.get(word)
        if hit is not None:
            return hit
    syms = list(word_symbols(word))
    while len(syms) > 1:
        best = min(zip(syms, syms[1:]), key=lambda p: ranks.get(p, _INF))
        if best not in ranks:
            break
        syms = _merge_word(syms, best[0], best[1], best[0] + best[1])
    out = tuple(syms)
    if cache is not None:
        cache[word] = out
    return out


def bpe_decode(tokens) -> str:
    """Tokens -> text: invert the byte map, ``</w>`` -> space
    (simple_tokenizer.py:145-152)."""
    raw = bytes(_U2B[c] for c in "".join(tokens))
    return raw.decode("utf-8", errors="replace").replace(_END, " ").rstrip()


def train_bpe(
    word_freqs: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Learn a merge table from a word-frequency table (Sennrich 2016).

    Incremental pair-count maintenance: a pair→word inverted index means
    each merge touches only the words that contain the merged pair, not the
    whole vocabulary. Deterministic: ties broken by (count DESC, pair ASC),
    input iterated in sorted word order. Stops early when no pair occurs
    more than once (merging hapax pairs memorizes words, not subwords).
    """
    words: list[list] = []  # [symbols, freq]
    for w in sorted(word_freqs):
        syms = list(word_symbols(w))
        words.append([syms, int(word_freqs[w])])

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set] = defaultdict(set)
    for wi, (syms, f) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += f
            pair_words[p].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        ab = best[0] + best[1]
        touched = {best}
        for wi in sorted(pair_words.get(best, ())):
            syms, f = words[wi]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= f
                pair_words[p].discard(wi)
                touched.add(p)
            new_syms = _merge_word(syms, best[0], best[1], ab)
            words[wi][0] = new_syms
            for p in zip(new_syms, new_syms[1:]):
                pair_counts[p] += f
                pair_words[p].add(wi)
        for p in touched:
            if pair_counts.get(p, 0) <= 0:
                pair_counts.pop(p, None)
                pair_words.pop(p, None)
    return merges


def merge_ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    """Merge list -> rank lookup for ``bpe_word`` (lower = earlier)."""
    return {pair: i for i, pair in enumerate(merges)}

"""Compact per-actor term lookup structures (round-3 verdict item 4).

A reader actor used to build ``dict(zip(terms, values))`` maps for the term
dictionary (term -> df) and the postings block index (term -> block rows).
At the bench vocabulary (~4k terms) that's free; at a real 10^7-10^8-term
vocabulary each dict costs GBs per actor (hash table + per-entry boxing)
and dominates actor init. The maps below keep the dict READ interface
(``get`` / ``in`` / ``[]`` / ``len`` / iteration) but store only the sorted
key array plus aligned value arrays, answering lookups with
``np.searchsorted`` binary search — O(log n) string comparisons, zero
per-entry overhead beyond the arrays the reader already holds.
"""

from __future__ import annotations

import numpy as np


class SortedArrayMap:
    """Read-only ``term -> scalar`` map over a SORTED key array.

    ``keys`` must be ascending-unique (numpy object array of str);
    ``values`` is any aligned indexable (numpy array)."""

    __slots__ = ("keys", "values")

    def __init__(self, keys: np.ndarray, values: np.ndarray):
        self.keys = keys
        self.values = values

    def _ix(self, key) -> int:
        i = int(np.searchsorted(self.keys, key))
        if i < len(self.keys) and self.keys[i] == key:
            return i
        return -1

    def get(self, key, default=None):
        i = self._ix(key)
        return self.values[i] if i >= 0 else default

    def __getitem__(self, key):
        i = self._ix(key)
        if i < 0:
            raise KeyError(key)
        return self.values[i]

    def __contains__(self, key) -> bool:
        return self._ix(key) >= 0

    def __len__(self) -> int:
        return len(self.keys)

    def __iter__(self):
        return iter(self.keys)


class BlockRowsMap:
    """Read-only ``term -> np.ndarray of block row indices`` in CSR form.

    ``keys`` sorted-unique terms; rows for ``keys[i]`` are
    ``order[starts[i]:ends[i]]`` — the contiguous run the reader's lexsort
    already produced, sliced lazily (a view, never copied)."""

    __slots__ = ("keys", "starts", "ends", "order")

    def __init__(
        self,
        keys: np.ndarray,
        starts: np.ndarray,
        ends: np.ndarray,
        order: np.ndarray,
    ):
        self.keys = keys
        self.starts = starts
        self.ends = ends
        self.order = order

    @classmethod
    def empty(cls) -> "BlockRowsMap":
        z = np.array([], dtype=np.int64)
        return cls(np.array([], dtype=object), z, z, z)

    def _ix(self, key) -> int:
        i = int(np.searchsorted(self.keys, key))
        if i < len(self.keys) and self.keys[i] == key:
            return i
        return -1

    def get(self, key, default=None):
        i = self._ix(key)
        if i < 0:
            return default
        return self.order[self.starts[i] : self.ends[i]]

    def __getitem__(self, key):
        i = self._ix(key)
        if i < 0:
            raise KeyError(key)
        return self.order[self.starts[i] : self.ends[i]]

    def __contains__(self, key) -> bool:
        return self._ix(key) >= 0

    def __len__(self) -> int:
        return len(self.keys)

    def __iter__(self):
        return iter(self.keys)

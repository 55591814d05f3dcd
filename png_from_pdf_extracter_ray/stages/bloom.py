"""Vectorized Bloom filter over uint64 hash arrays.

The broadcast-semi-join PREFILTER for membership checks at scale
(decontamination, blocklists, seen-before joins): the small side ships
to every worker as a FIXED-size bitmap (2^b bits — 16 MiB at b=27)
instead of a Python set whose broadcast cost grows with the benchmark,
and each batch queries it with k vectorized gathers — no Python per
element.

Contract: NO false negatives (a Bloom test is a guaranteed superset of
true membership), tunable false positives — so it composes as
``bloom.contains(...)`` prefilter → exact confirm on the (much smaller)
surviving candidate set, keeping the end-to-end result exact.  Double
hashing (Kirsch–Mitzenmacher) derives the k probe indices from one
64-bit hash, so inputs are the engine's standing uint64 hash arrays
(``pd.util.hash_array`` / shingle polynomials) — no extra hash passes.
"""

from __future__ import annotations

import numpy as np

_U = np.uint64


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (wrapping uint64 array ops throughout) —
    decorrelates the second probe stream from the input hash."""
    z = h.astype(np.uint64, copy=True)
    z ^= z >> _U(30)
    z *= _U(0xBF58476D1CE4E5B9)
    z ^= z >> _U(27)
    z *= _U(0x94D049BB133111EB)
    z ^= z >> _U(31)
    return z


class BloomFilter:
    """Fixed 2^``n_bits_log2``-bit filter with ``n_hashes`` probes.

    Serializes to (bytes, b, k) via :meth:`to_state` for ``ray.put``
    broadcast; reconstruct zero-copy-ish with :meth:`from_state`.
    """

    __slots__ = ("words", "n_bits_log2", "n_hashes")

    def __init__(self, words: np.ndarray, n_bits_log2: int, n_hashes: int) -> None:
        self.words = words
        self.n_bits_log2 = n_bits_log2
        self.n_hashes = n_hashes

    @staticmethod
    def _indices(hashes: np.ndarray, n_bits_log2: int, n_hashes: int) -> np.ndarray:
        h1 = hashes.astype(np.uint64, copy=False)
        h2 = _mix64(h1) | _U(1)  # odd stride → full-period probe walk
        i = np.arange(n_hashes, dtype=np.uint64)[:, None]
        mask = _U((1 << n_bits_log2) - 1)
        return ((h1[None, :] + i * h2[None, :]) & mask).astype(np.int64)

    @classmethod
    def build(
        cls, hashes: np.ndarray, n_bits_log2: int | None = None, n_hashes: int = 4
    ) -> "BloomFilter":
        """Size defaults to ≥16 bits/element (FP ≈ 0.2% at k=4),
        floor 2^16 bits (a single 8 KiB word array)."""
        n = int(hashes.size)
        if n_bits_log2 is None:
            n_bits_log2 = max(16, int(np.ceil(np.log2(max(n, 1) * 16))))
        words = np.zeros(1 << max(n_bits_log2 - 6, 0), dtype=np.uint64)
        if n:
            idx = cls._indices(hashes, n_bits_log2, n_hashes)
            np.bitwise_or.at(
                words, idx >> 6, _U(1) << (idx.astype(np.uint64) & _U(63))
            )
        return cls(words, n_bits_log2, n_hashes)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Boolean mask: True where ALL k probe bits are set (possible
        member), False where provably absent.  Vectorized over the whole
        input array."""
        if hashes.size == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indices(hashes, self.n_bits_log2, self.n_hashes)
        bits = (self.words[idx >> 6] >> (idx.astype(np.uint64) & _U(63))) & _U(1)
        return bits.all(axis=0)

    def to_state(self) -> tuple[bytes, int, int]:
        return self.words.tobytes(), self.n_bits_log2, self.n_hashes

    @classmethod
    def from_state(cls, state: tuple[bytes, int, int]) -> "BloomFilter":
        blob, b, k = state
        return cls(np.frombuffer(blob, dtype=np.uint64), b, k)

"""Blocked Bloom filter (Bloom 1970; double hashing per Kirsch-Mitzenmacher
2006) — the reference's mergeable-sketch algebra applied to approximate
SET MEMBERSHIP:

* ``insert``: bits[h_i(x)] <- 1 for k derived probe positions — an
  OR-fold, commutative / associative / idempotent / order-independent
  exactly like the reference's min-fold insert (src/utils/utils.c:3-33),
  so a filter over a set partitioned ANY way equals the merge of the
  partial filters (the FCDS contract, src/fcds/minhash-fcds.c:149-184).
* ``merge``: elementwise bitwise OR (the reference's elementwise min,
  src/utils/utils.c:36-46).
* ``query``: all k probe bits set → "maybe present" (no false negatives;
  false-positive rate ~ (1 - e^(-kn/m))^k).

Constant space — ``m_bits/8`` bytes regardless of key count — which is
the point at corpus scale: an exact seen-set of 10^10 digests is 80+ GB,
the equivalent ~1% Bloom filter is ~1.5 GB, broadcast once.

All kernels are vectorized numpy over uint64 arrays — no Python loop
over keys anywhere.
"""

from __future__ import annotations

import numpy as np

from minhash_ray.stages.banding import splitmix64

U64 = np.uint64

_H2_SALT = U64(0xD6E8FEB86659FD93)       # any odd-mixing constant


def bloom_empty(m_bits: int) -> np.ndarray:
    """All-zero filter: (m_bits/64,) uint64 words. m_bits must be a
    power of two (probe positions use a mask, not a modulo)."""
    if m_bits & (m_bits - 1) or m_bits < 64:
        raise ValueError("m_bits must be a power of two >= 64")
    return np.zeros(m_bits >> 6, dtype=np.uint64)


def _probe_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) int64 bit positions via double hashing: h1 + i*h2 mod m.
    h2 is forced odd so the probe stride is coprime with the power-of-two
    m and the k positions never collapse onto one slot."""
    h = keys.astype(U64, copy=False)
    h1 = splitmix64(h)
    h2 = splitmix64(h ^ _H2_SALT) | U64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    pos = h1[:, None] + i * h2[:, None]           # uint64 wrap is fine
    return (pos & U64(m_bits - 1)).astype(np.int64)


def bloom_insert(filt: np.ndarray, keys: np.ndarray, k: int) -> np.ndarray:
    """OR the k probe bits of every key into ``filt`` (in place; also
    returned).  Vectorized scatter-OR — the unordered idempotent fold."""
    if len(keys) == 0:
        return filt
    m_bits = len(filt) << 6
    pos = _probe_positions(keys, m_bits, k).ravel()
    np.bitwise_or.at(filt, pos >> 6, U64(1) << (pos.astype(np.uint64) & U64(63)))
    return filt


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise OR of two equally-sized filters into a new array."""
    if a.shape != b.shape:
        raise ValueError("cannot merge filters of different sizes")
    return a | b


def bloom_query(filt: np.ndarray, keys: np.ndarray, k: int) -> np.ndarray:
    """(n,) bool: True iff ALL k probe bits are set ("maybe present").
    Guaranteed True for every inserted key (no false negatives)."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    m_bits = len(filt) << 6
    pos = _probe_positions(keys, m_bits, k)
    bits = (filt[pos >> 6] >> (pos.astype(np.uint64) & U64(63))) & U64(1)
    return bits.all(axis=1)

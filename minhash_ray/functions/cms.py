"""Count-min sketch (Cormode & Muthukrishnan 2005) — the reference's
mergeable-summary algebra applied to approximate FREQUENCY estimation:

* ``insert``: counts[d][h_d(x)] += c for each of ``depth`` derived rows.
* ``merge``: elementwise SUM.  Commutative and associative like the
  reference's min-fold (src/utils/utils.c:3-46) but NOT idempotent — the
  one member of the family where each element must be counted exactly
  once.  Ray Data guarantees that by construction (every row lives in
  exactly one batch), so per-batch partial sketches still fold to the
  identical array as a serial build — the FCDS partial-aggregation
  contract (src/fcds/minhash-fcds.c:149-184) with + in place of min.
* ``query``: min over the depth rows — an overestimate, never under
  (error <= e·N/width with probability 1 - e^-depth).

Probe positions use the same double-hashing scheme as the Bloom filter
(Kirsch-Mitzenmacher 2006): two splitmix64 chains serve any depth.
All kernels are vectorized numpy — no Python loop over keys.
"""

from __future__ import annotations

import numpy as np

from minhash_ray.stages.banding import splitmix64

U64 = np.uint64

_H2_SALT = U64(0xA24BAED4963EE407)


def cms_empty(width: int, depth: int) -> np.ndarray:
    """All-zero sketch: (depth, width) int64.  width must be a power of
    two (probe positions use a mask, not a modulo)."""
    if width & (width - 1) or width < 2:
        raise ValueError("width must be a power of two >= 2")
    return np.zeros((depth, width), dtype=np.int64)


def _cms_positions(keys: np.ndarray, width: int, depth: int) -> np.ndarray:
    """(n, depth) int64 column indices via double hashing h1 + d*h2,
    h2 forced odd (coprime with the power-of-two width)."""
    h = keys.astype(U64, copy=False)
    h1 = splitmix64(h)
    h2 = splitmix64(h ^ _H2_SALT) | U64(1)
    d = np.arange(depth, dtype=np.uint64)[None, :]
    return ((h1[:, None] + d * h2[:, None]) & U64(width - 1)).astype(np.int64)


def cms_insert(cms: np.ndarray, keys: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Add ``counts[i]`` at every probe position of ``keys[i]`` (in
    place; also returned).  Vectorized scatter-add."""
    if len(keys) == 0:
        return cms
    depth, width = cms.shape
    pos = _cms_positions(keys, width, depth)
    rows = np.broadcast_to(np.arange(depth, dtype=np.int64)[None, :], pos.shape)
    np.add.at(cms, (rows.ravel(), pos.ravel()),
              np.repeat(counts.astype(np.int64), depth))
    return cms


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise sum of two equally-shaped sketches into a new array."""
    if a.shape != b.shape:
        raise ValueError("cannot merge sketches of different shapes")
    return a + b


def cms_query(cms: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """(n,) int64 estimated counts: min over the depth rows.  Guaranteed
    >= the true count of every inserted key."""
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int64)
    depth, width = cms.shape
    pos = _cms_positions(keys, width, depth)
    return cms[np.arange(depth)[None, :], pos].min(axis=1)

"""MinHash sketch construction / merge / query as vectorized numpy kernels.

Semantics match the reference exactly:

* insert = per-slot min-update (reference ``basic_insert``,
  src/utils/utils.c:3-33).  Because a whole row's shingle set is inserted at
  once, the element-at-a-time min-update collapses to one segmented min.
* merge = elementwise min (reference ``merge``, src/utils/utils.c:36-46).
* query = fraction of equal slots (reference ``query``,
  src/serial/minhash-serial.c:16-26) — note equal-INFTY slots count as
  equal, exactly like the C code; the pipeline routes zero-shingle rows
  away from banding so empty sketches never cross-match.
* empty sketch = all INFTY = UINT64_MAX (reference ``init_empty_values``,
  src/configuration/configuration.c:143-148).
"""

from __future__ import annotations

import numpy as np

from minhash_ray.config import INFTY
from minhash_ray.functions.hashing import HashTables, hash_matrix

U64 = np.uint64
_INFTY = U64(INFTY)

# Cap on the (n_shingles, num_perm) hash-matrix size per internal chunk so a
# signature batch never allocates more than ~64 MiB for the matrix.
_MAX_MATRIX_CELLS = 250_000


def signatures_from_shingles(
    shingles: np.ndarray,
    counts: np.ndarray,
    tables: HashTables,
) -> np.ndarray:
    """Per-row MinHash signatures.

    shingles: flat (total,) uint64 shingle hashes; counts: (n_rows,) int64
    shingles per row.  Returns (n_rows, num_perm) uint64; rows with zero
    shingles are all-INFTY.
    """
    n_rows = counts.shape[0]
    k = tables.num_perm
    out = np.full((n_rows, k), _INFTY, dtype=np.uint64)
    total = int(counts.sum())
    if total == 0:
        return out

    ends = np.cumsum(counts)
    starts = ends - counts
    nonempty = np.flatnonzero(counts > 0)

    # chunk over rows so the (chunk_shingles, k) matrix stays bounded
    max_shingles = max(1, _MAX_MATRIX_CELLS // k)
    i = 0
    while i < len(nonempty):
        j = i
        acc = 0
        while j < len(nonempty) and (acc + counts[nonempty[j]] <= max_shingles or j == i):
            acc += counts[nonempty[j]]
            j += 1
        rows = nonempty[i:j]
        # gather this chunk's shingles contiguously
        seg_counts = counts[rows]
        gather_idx = np.repeat(starts[rows], seg_counts) + _seg_arange(seg_counts)
        chunk = shingles[gather_idx]
        H = hash_matrix(chunk, tables)                       # (chunk_total, k)
        seg_starts = np.cumsum(seg_counts) - seg_counts
        out[rows] = np.minimum.reduceat(H, seg_starts, axis=0)
        i = j
    return out


def _seg_arange(counts: np.ndarray) -> np.ndarray:
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(counts)
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(ends - counts, counts)
    return out


def segment_intersection_counts(
    flat: np.ndarray, offsets: np.ndarray, idx_a: np.ndarray, idx_b: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized intersection sizes between per-row sorted-unique segments.

    ``flat``: concatenated sorted-unique uint64 sets, ``offsets``:
    (n_rows+1,) int64 segment bounds, ``idx_a``/``idx_b``: (n_pairs,) row
    indices.  Returns (intersection, |A|, |B|) per pair.

    No per-pair python loop: both sides' segments are gathered with a pair
    tag and lex-sorted by (pair, value); a value common to a pair's two
    segments then appears exactly twice adjacently (each side is unique
    within itself), so adjacent-duplicate runs count the intersection.
    O((Ta+Tb) log(Ta+Tb)) total, independent of pair count.
    """
    counts = np.diff(offsets)
    ca = counts[idx_a].astype(np.int64)
    cb = counts[idx_b].astype(np.int64)
    n_pairs = len(idx_a)
    pair_a = np.repeat(np.arange(n_pairs, dtype=np.int64), ca)
    pair_b = np.repeat(np.arange(n_pairs, dtype=np.int64), cb)
    ga = np.repeat(offsets[idx_a], ca) + _seg_arange(ca)
    gb = np.repeat(offsets[idx_b], cb) + _seg_arange(cb)
    vals = np.concatenate([flat[ga], flat[gb]])
    tags = np.concatenate([pair_a, pair_b])
    if len(vals) == 0:
        return np.zeros(n_pairs, dtype=np.int64), ca, cb
    order = np.lexsort((vals, tags))
    v = vals[order]
    t = tags[order]
    dup = (v[1:] == v[:-1]) & (t[1:] == t[:-1])
    inter = np.bincount(t[1:][dup], minlength=n_pairs).astype(np.int64)
    return inter, ca, cb


def exact_jaccard_for_pairs(
    flat: np.ndarray, offsets: np.ndarray, idx_a: np.ndarray, idx_b: np.ndarray
) -> np.ndarray:
    """True set Jaccard per candidate pair over flat+offsets shingle sets.
    Pairs where either side is empty get 0.0."""
    inter, ca, cb = segment_intersection_counts(flat, offsets, idx_a, idx_b)
    union = ca + cb - inter
    jacc = np.zeros(len(idx_a), dtype=np.float64)
    nz = union > 0
    jacc[nz] = inter[nz] / union[nz]
    return jacc


def merge_signatures(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise-min merge (reference ``merge``, src/utils/utils.c:36-46)."""
    return np.minimum(a, b)


def estimate_similarity(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Fraction-of-equal-slots Jaccard estimate (reference ``query``,
    src/serial/minhash-serial.c:16-26), vectorized over pair rows.

    a, b: (n_pairs, k) uint64 → (n_pairs,) float64.
    """
    if a.ndim == 1:
        a = a[None, :]
        b = b[None, :]
    return (a == b).mean(axis=1)

"""SimHash fingerprints (Charikar 2002, STOC — "Similarity estimation
techniques from rounding algorithms"): 64-bit sign-of-weighted-sum over
feature hashes.  No reference implementation exists (the C library is
MinHash-only); built from the published algorithm as an additional
fingerprint channel feeding the same pair-verification stage.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_SHIFTS = np.arange(64, dtype=np.uint64)
_ONE = U64(1)


def simhash_from_shingles(shingles: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-row 64-bit SimHash over each row's shingle-hash multiset.

    Bit i of the output is 1 iff the sum over shingles of (+1 if bit i set
    else -1) is > 0.  Rows with zero shingles get simhash 0.

    shingles: flat (total,) uint64; counts: (n_rows,) int64 → (n_rows,) uint64.
    """
    n_rows = counts.shape[0]
    out = np.zeros(n_rows, dtype=np.uint64)
    total = int(counts.sum())
    if total == 0:
        return out
    ends = np.cumsum(counts)
    starts = ends - counts
    # chunk over row ranges so the (chunk, 64) vote matrix stays bounded
    max_chunk = 250_000
    r0 = 0
    while r0 < n_rows:
        r1 = r0
        acc = 0
        while r1 < n_rows and (acc + counts[r1] <= max_chunk or r1 == r0):
            acc += counts[r1]
            r1 += 1
        if acc == 0:
            r0 = r1
            continue
        seg = shingles[starts[r0]:ends[r1 - 1]]
        # ±1 votes per bit; int32 accumulators (row shingle counts < 2^31);
        # in-place vote transform — one (chunk, 64) buffer, no temporaries
        bits = seg[:, None] >> _SHIFTS[None, :]
        bits &= _ONE
        votes = bits.astype(np.int32)
        votes *= 2
        votes -= 1                                         # (chunk, 64) in {-1, +1}
        local_counts = counts[r0:r1]
        nonempty = local_counts > 0
        seg_starts = (starts[r0:r1] - starts[r0])[nonempty]
        sums = np.add.reduceat(votes, seg_starts, axis=0)  # (n_nonempty, 64)
        bits_out = (sums > 0).astype(np.uint64)
        vals = (bits_out << _SHIFTS[None, :]).sum(axis=1, dtype=np.uint64)
        out[r0:r1][nonempty] = vals
        r0 = r1
    return out


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-element popcount(a ^ b) for uint64 arrays."""
    x = np.bitwise_xor(a, b)
    # SWAR popcount on uint64
    m1 = U64(0x5555555555555555)
    m2 = U64(0x3333333333333333)
    m4 = U64(0x0F0F0F0F0F0F0F0F)
    h01 = U64(0x0101010101010101)
    x = x - ((x >> _ONE) & m1)
    x = (x & m2) + ((x >> U64(2)) & m2)
    x = (x + (x >> U64(4))) & m4
    return ((x * h01) >> U64(56)).astype(np.int64)


def simhash_bands(values: np.ndarray, n_chunks: int = 4) -> np.ndarray:
    """Split each 64-bit simhash into n_chunks equal bit-chunks for LSH:
    two fingerprints within Hamming distance n_chunks-1 share at least one
    chunk (pigeonhole).  Returns (n, n_chunks) uint64 chunk values."""
    width = 64 // n_chunks
    mask = U64((1 << width) - 1)
    shifts = (np.arange(n_chunks, dtype=np.uint64) * U64(width))
    return (values[:, None] >> shifts[None, :]) & mask

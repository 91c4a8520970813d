"""Hash families with exact C-semantics parity.

Reimplements the reference's two hash families (reference:
src/utils/hash.c:6-25) as vectorized numpy kernels.  The C code computes in
``uint64`` with silent wraparound mod 2^64; numpy uint64 arrays wrap
identically, so every intermediate here is kept strictly ``np.uint64``
(numpy 1.26 promotes ``uint64 op python-int`` to float64 — never mix).

Coefficient generation mirrors ``hash_functions_init`` (reference:
src/configuration/configuration.c:97-140): coefficients are draws of C
``random()`` ∈ [0, 2^31-1] stored in uint32.  The reference leaves them
unseeded and achieves cross-sketch comparability by sharing one table in
memory (reference: test/test_serial_similarity.c:58-61); we achieve it by
deriving the table deterministically from a seed so every Ray worker builds
an identical table.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64


def make_pairwise_coefficients(
    seed: int, num_perm: int, modulus: int
) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) uint64 vectors of length num_perm, values in [0, 2^31) like C random()."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 2**31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, 2**31, size=num_perm, dtype=np.uint64)
    return a, b


def make_kwise_coefficients(seed: int, num_perm: int, degree: int, modulus: int) -> np.ndarray:
    """(num_perm, degree+1) uint64 coefficient table, values in [0, 2^31)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**31, size=(num_perm, degree + 1), dtype=np.uint64)


def pairwise_hash_matrix(x: np.ndarray, a: np.ndarray, b: np.ndarray, modulus: int) -> np.ndarray:
    """``((a*x mod M) + b) mod M`` for every (element, permutation) pair.

    Vectorized form of the reference ``pairwise_func`` (src/utils/hash.c:6-9):
    ``a*x`` wraps mod 2^64 exactly as the C uint64 multiply does.

    x: (n,) uint64 elements; a, b: (k,) uint64 → returns (n, k) uint64.
    """
    x = np.ascontiguousarray(x, dtype=np.uint64)
    M = U64(modulus)
    # one (n, k) allocation + in-place ops: the matrix is the dominant
    # memory traffic of the signature stage, and 4 temporaries of it per
    # batch put 30 concurrent workers into mmap contention
    h = np.multiply(a[None, :], x[:, None])    # uint64 wraparound == C semantics
    h %= M
    h += b[None, :]
    h %= M
    return h


def kwise_hash_matrix(x: np.ndarray, coeffs: np.ndarray, modulus: int) -> np.ndarray:
    """Degree-k polynomial family, vectorized form of ``kwise_func``
    (src/utils/hash.c:13-25)::

        pow_x = 1; sum = 0
        for j in 0..k:  sum = (sum + (pow_x * c_j % M)) % M
                        pow_x = (pow_x * x) % M
        return sum % M

    Note ``pow_x * x`` wraps mod 2^64 before the mod — kept bit-for-bit.

    x: (n,) uint64; coeffs: (k_perm, degree+1) uint64 → (n, k_perm) uint64.
    """
    x = np.ascontiguousarray(x, dtype=np.uint64)
    M = U64(modulus)
    n = x.shape[0]
    k_perm, ncoef = coeffs.shape
    pow_x = np.ones(n, dtype=np.uint64)
    acc = np.zeros((n, k_perm), dtype=np.uint64)
    for j in range(ncoef):
        acc = (acc + (pow_x[:, None] * coeffs[None, :, j]) % M) % M
        pow_x = (pow_x * x) % M                # wraps mod 2^64 first, like C
    return acc % M


def hash_matrix(x: np.ndarray, tables: "HashTables") -> np.ndarray:
    if tables.family == "pairwise":
        return pairwise_hash_matrix(x, tables.a, tables.b, tables.modulus)
    return kwise_hash_matrix(x, tables.coeffs, tables.modulus)


class HashTables:
    """Precomputed coefficient tables — the state a signature actor holds.

    The reference's analogue is the ``hash_functions`` array shared by every
    sketch (src/configuration/configuration.c:97-140); here it is rebuilt
    deterministically from (seed, family, num_perm, degree) in each worker.
    """

    def __init__(self, seed: int, family: str, num_perm: int, modulus: int, degree: int = 2):
        self.family = family
        self.modulus = modulus
        self.num_perm = num_perm
        if family == "pairwise":
            self.a, self.b = make_pairwise_coefficients(seed, num_perm, modulus)
            self.coeffs = None
        elif family == "kwise":
            self.a = self.b = None
            self.coeffs = make_kwise_coefficients(seed, num_perm, degree, modulus)
        else:
            raise ValueError(f"unknown hash family {family!r}")

    @classmethod
    def from_config(cls, cfg) -> "HashTables":
        return cls(cfg.seed, cfg.hash_family, cfg.num_perm, cfg.modulus, cfg.kwise_degree)


# ---------------------------------------------------------------------------
# 64-bit string/byte hashing for shingles (engine-level; the reference has no
# string hashing — elements arrive as bare uint64, test/test_serial.c:66-68).
# FNV-1a 64 with a seed fold, plus a vectorized polynomial combiner.
# ---------------------------------------------------------------------------

FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def fnv1a_64(data: bytes, seed: int = 0) -> int:
    """Scalar FNV-1a 64 over bytes, seed folded in first. Pure python (used
    for per-unique-token hashing and by the oracle)."""
    h = FNV_OFFSET ^ (seed & _MASK64)
    for byte in data:
        h ^= byte
        h = (h * FNV_PRIME) & _MASK64
    return h


def hash_str_array(strings, seed: int = 0) -> np.ndarray:
    """uint64 FNV-1a hash of each string (utf-8). Python loop — call on the
    *unique* values of a dictionary-encoded column, never on the raw column."""
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = fnv1a_64(s.encode("utf-8"), seed)
    return out


def combine_wgrams(token_hashes: np.ndarray, idx: np.ndarray, w: int) -> np.ndarray:
    """Order-sensitive polynomial combine of w consecutive token hashes.

    token_hashes: flat (n_tokens,) uint64; idx: (n_shingles,) start indices.
    h = ((seed'⊕t0)·P + t1)·P + ...  all mod 2^64. Fully vectorized.
    """
    P = U64(FNV_PRIME)
    idx = np.ascontiguousarray(idx, dtype=np.int64)   # int index math stays int64
    h = token_hashes[idx].copy()
    for j in range(1, w):
        h = h * P + token_hashes[idx + j]
    return h

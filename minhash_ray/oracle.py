"""Pure-Python differential oracle.

A deliberately slow, scalar, element-at-a-time reimplementation of the
reference's sketch semantics (mirroring the C control flow, not the numpy
kernels), used the way the reference uses its serial implementation as the
oracle for the parallel ones (reference: test/test_parallel_lock.c:47-57,
test/parallel/test_conc_minhash.c:68-103).  pytest asserts engine output ==
oracle output with exact uint64 equality.
"""

from __future__ import annotations

import numpy as np

from minhash_ray.config import INFTY, PipelineConfig
from minhash_ray.functions.hashing import (
    FNV_OFFSET,
    FNV_PRIME,
    make_kwise_coefficients,
    make_pairwise_coefficients,
)

_M64 = (1 << 64) - 1


class OracleSketch:
    """Scalar mirror of the reference minhash_sketch + hash_functions."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.M = cfg.modulus
        self.size = cfg.num_perm
        if cfg.hash_family == "pairwise":
            a, b = make_pairwise_coefficients(cfg.seed, cfg.num_perm, cfg.modulus)
            self.a = [int(v) for v in a]
            self.b = [int(v) for v in b]
            self.coeffs = None
        else:
            c = make_kwise_coefficients(cfg.seed, cfg.num_perm, cfg.kwise_degree, cfg.modulus)
            self.coeffs = [[int(v) for v in row] for row in c]
        self.sketch = [INFTY] * self.size          # init_empty_values semantics

    # -- hash families, scalar, mirroring src/utils/hash.c --
    def _pairwise(self, i: int, x: int) -> int:
        # ((a*x mod M) + b) mod M with a*x wrapping mod 2^64 (C uint64)
        return (((self.a[i] * x) & _M64) % self.M + self.b[i]) % self.M

    def _kwise(self, i: int, x: int) -> int:
        pow_x = 1
        total = 0
        for c in self.coeffs[i]:
            total = (total + (pow_x * c) % self.M) % self.M
            pow_x = ((pow_x * x) & _M64) % self.M   # pow_x*x wraps mod 2^64 first
        return total % self.M

    def _hash(self, i: int, x: int) -> int:
        if self.coeffs is None:
            return self._pairwise(i, x)
        return self._kwise(i, x)

    def insert(self, elem: int) -> bool:
        """basic_insert (src/utils/utils.c:3-33): per-slot min-update."""
        changed = False
        for i in range(self.size):
            val = self._hash(i, elem)
            if val < self.sketch[i]:
                self.sketch[i] = val
                changed = True
        return changed

    def merge(self, other: "OracleSketch") -> bool:
        """merge (src/utils/utils.c:36-46)."""
        changed = False
        for i in range(self.size):
            if self.sketch[i] > other.sketch[i]:
                self.sketch[i] = other.sketch[i]
                changed = True
        return changed

    def query(self, other: "OracleSketch") -> float:
        """query (src/serial/minhash-serial.c:16-26): fraction equal slots."""
        eq = sum(1 for i in range(self.size) if self.sketch[i] == other.sketch[i])
        return eq / self.size

    def as_array(self) -> np.ndarray:
        return np.array(self.sketch, dtype=np.uint64)


# -- scalar shingling mirror (engine-level semantics, see functions/shingles.py) --

def oracle_fnv1a(data: bytes, seed: int = 0) -> int:
    h = FNV_OFFSET ^ (seed & _M64)
    for byte in data:
        h ^= byte
        h = (h * FNV_PRIME) & _M64
    return h


def oracle_token_shingles(text: str, w: int, seed: int) -> list[int]:
    tokens = (text or "").lower().split()
    hashes = [oracle_fnv1a(t.encode("utf-8"), seed) for t in tokens]
    out = []
    for i in range(len(hashes) - w + 1):
        h = hashes[i]
        for j in range(1, w):
            h = (h * FNV_PRIME + hashes[i + j]) & _M64
        out.append(h)
    return out


def oracle_char_shingles(text: str, w: int, seed: int) -> list[int]:
    import re

    norm = re.sub(r"\s+", " ", (text or "").lower()).strip()
    data = [b ^ (seed & _M64) for b in norm.encode("utf-8")]
    out = []
    for i in range(len(data) - w + 1):
        h = data[i]
        for j in range(1, w):
            h = (h * FNV_PRIME + data[i + j]) & _M64
        out.append(h)
    return out


def oracle_signature(text: str, cfg: PipelineConfig) -> np.ndarray:
    """Full scalar pipeline: text → shingles → element-at-a-time inserts."""
    sk = OracleSketch(cfg)
    if cfg.shingle_mode == "token":
        shingles = oracle_token_shingles(text, cfg.shingle_w, cfg.seed)
    else:
        shingles = oracle_char_shingles(text, cfg.shingle_w, cfg.seed)
    for s in shingles:
        sk.insert(s)
    return sk.as_array()


def oracle_simhash(text: str, cfg: PipelineConfig) -> int:
    """Scalar SimHash (Charikar 2002) over the same shingle hashes."""
    if cfg.shingle_mode == "token":
        shingles = oracle_token_shingles(text, cfg.shingle_w, cfg.seed)
    else:
        shingles = oracle_char_shingles(text, cfg.shingle_w, cfg.seed)
    if not shingles:
        return 0
    votes = [0] * 64
    for s in shingles:
        for bit in range(64):
            votes[bit] += 1 if (s >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if votes[bit] > 0:
            out |= 1 << bit
    return out


def oracle_jaccard(text_a: str, text_b: str, cfg: PipelineConfig) -> float:
    """True shingle-set Jaccard (ground truth for recall accounting)."""
    if cfg.shingle_mode == "token":
        sa = set(oracle_token_shingles(text_a, cfg.shingle_w, cfg.seed))
        sb = set(oracle_token_shingles(text_b, cfg.shingle_w, cfg.seed))
    else:
        sa = set(oracle_char_shingles(text_a, cfg.shingle_w, cfg.seed))
        sb = set(oracle_char_shingles(text_b, cfg.shingle_w, cfg.seed))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)

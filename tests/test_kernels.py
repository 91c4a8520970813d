"""Kernel unit tests vs the pure-Python oracle — the reference's own
validation standard (exact elementwise equality, the way
test/test_parallel_lock.c:47-57 validates parallel vs serial sketches)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from minhash_ray.config import INFTY, PipelineConfig
from minhash_ray.functions.hashing import HashTables, fnv1a_64, hash_str_array
from minhash_ray.functions.minhash import (
    estimate_similarity,
    merge_signatures,
    signatures_from_shingles,
)
from minhash_ray.functions.shingles import char_shingles, token_shingles
from minhash_ray.functions.simhash import hamming_distance, simhash_bands, simhash_from_shingles
from minhash_ray.oracle import (
    OracleSketch,
    oracle_char_shingles,
    oracle_signature,
    oracle_simhash,
    oracle_token_shingles,
)

TEXTS = [
    "Hello World this is a test of the engine",
    "",
    "one",
    "a b",
    "a b c",
    "x  y\tz  w",
    "hello world THIS is a test of the engine",
    "the quick brown fox jumps over the lazy dog " * 5,
    "unicode éèê accents and 中文 tokens mixed in",
]


@pytest.mark.parametrize("family,degree", [("pairwise", 2), ("kwise", 2), ("kwise", 5)])
def test_signatures_match_oracle(family, degree):
    cfg = PipelineConfig(hash_family=family, kwise_degree=degree)
    sh, counts = token_shingles(pa.array(TEXTS), cfg.shingle_w, cfg.seed)
    sigs = signatures_from_shingles(sh, counts, HashTables.from_config(cfg))
    for i, t in enumerate(TEXTS):
        assert np.array_equal(sigs[i], oracle_signature(t, cfg)), t


def test_shingles_match_oracle():
    cfg = PipelineConfig()
    sh, counts = token_shingles(pa.array(TEXTS), cfg.shingle_w, cfg.seed)
    off = 0
    for i, t in enumerate(TEXTS):
        assert [int(v) for v in sh[off : off + counts[i]]] == oracle_token_shingles(
            t, cfg.shingle_w, cfg.seed
        )
        off += counts[i]


def test_char_shingles_match_oracle():
    sh, counts = char_shingles(pa.array(TEXTS), 4, 7)
    off = 0
    for i, t in enumerate(TEXTS):
        assert [int(v) for v in sh[off : off + counts[i]]] == oracle_char_shingles(t, 4, 7)
        off += counts[i]


def test_empty_rows_are_all_infty():
    cfg = PipelineConfig()
    sh, counts = token_shingles(pa.array(["", "ab", "a b c d"]), cfg.shingle_w, cfg.seed)
    sigs = signatures_from_shingles(sh, counts, HashTables.from_config(cfg))
    assert counts[0] == 0 and counts[1] == 0 and counts[2] == 2
    assert (sigs[0] == np.uint64(INFTY)).all()
    assert (sigs[1] == np.uint64(INFTY)).all()
    assert not (sigs[2] == np.uint64(INFTY)).all()


def test_merge_is_elementwise_min_and_matches_oracle():
    cfg = PipelineConfig(num_perm=32, bands=8, rows_per_band=4)
    rng = np.random.default_rng(1)
    elems_a = [int(x) for x in rng.integers(0, 2**63, 50)]
    elems_b = [int(x) for x in rng.integers(0, 2**63, 50)]
    oa, ob, oall = OracleSketch(cfg), OracleSketch(cfg), OracleSketch(cfg)
    for e in elems_a:
        oa.insert(e)
        oall.insert(e)
    for e in elems_b:
        ob.insert(e)
        oall.insert(e)
    oa.merge(ob)
    # partition-any-way == merge of partials (the min-fold algebra the
    # reference's FCDS design exploits, src/fcds/minhash-fcds.c:252-316)
    assert oa.as_array().tolist() == oall.as_array().tolist()
    tables = HashTables.from_config(cfg)
    sig_a = signatures_from_shingles(
        np.array(elems_a, dtype=np.uint64), np.array([50]), tables
    )
    sig_b = signatures_from_shingles(
        np.array(elems_b, dtype=np.uint64), np.array([50]), tables
    )
    merged = merge_signatures(sig_a, sig_b)
    assert np.array_equal(merged[0], oall.as_array())


def test_similarity_matches_oracle_query():
    cfg = PipelineConfig(num_perm=64, bands=16, rows_per_band=4)
    a, b = OracleSketch(cfg), OracleSketch(cfg)
    for e in range(100):
        a.insert(e)
    for e in range(50, 150):
        b.insert(e)
    expected = a.query(b)
    sim = estimate_similarity(a.as_array()[None, :], b.as_array()[None, :])[0]
    assert sim == pytest.approx(expected)
    # two empty sketches estimate similarity 1.0 (INFTY == INFTY), exactly
    # like the C comparator — the pipeline must route empties away instead
    e1, e2 = OracleSketch(cfg), OracleSketch(cfg)
    assert estimate_similarity(e1.as_array()[None, :], e2.as_array()[None, :])[0] == 1.0


def test_simhash_matches_oracle():
    cfg = PipelineConfig()
    sh, counts = token_shingles(pa.array(TEXTS), cfg.shingle_w, cfg.seed)
    sims = simhash_from_shingles(sh, counts)
    for i, t in enumerate(TEXTS):
        assert int(sims[i]) == oracle_simhash(t, cfg)


def test_hamming_and_bands():
    a = np.array([0b1111, 0], dtype=np.uint64)
    b = np.array([0b0101, 2**63], dtype=np.uint64)
    assert hamming_distance(a, b).tolist() == [2, 1]
    chunks = simhash_bands(np.array([0x0123456789ABCDEF], dtype=np.uint64), 4)
    assert chunks[0].tolist() == [0xCDEF, 0x89AB, 0x4567, 0x0123]


def test_fnv_is_stable():
    # pinned digest: cross-run / cross-process determinism (PYTHONHASHSEED-free)
    assert fnv1a_64(b"hello") == 11831194018420276491
    assert hash_str_array(["hello"], 0)[0] == np.uint64(11831194018420276491)


def test_hash_uint64_wraparound_parity():
    # elements near 2^64 exercise the C uint64 wraparound path
    cfg = PipelineConfig(num_perm=16, bands=4, rows_per_band=4)
    tables = HashTables.from_config(cfg)
    big = np.array([2**64 - 1, 2**63 + 12345, 2**32 + 7], dtype=np.uint64)
    sigs = signatures_from_shingles(big, np.array([3]), tables)
    o = OracleSketch(cfg)
    for e in [2**64 - 1, 2**63 + 12345, 2**32 + 7]:
        o.insert(e)
    assert np.array_equal(sigs[0], o.as_array())


def test_byte_oph_batch_matches_per_row():
    """byte_oph_signatures_batch must be bit-identical to the per-row
    kernel for every payload shape (empty, < w, no-sampled-grams fallback,
    large)."""
    import numpy as np

    from minhash_ray.functions.audio import byte_oph_signature, byte_oph_signatures_batch

    rng = np.random.default_rng(17)
    payloads = [
        b"",
        b"ab",                       # shorter than w=4
        b"abcd",                     # exactly one gram
        bytes(rng.integers(0, 256, size=7, dtype=np.uint8)),
        bytes(rng.integers(0, 256, size=333, dtype=np.uint8)),
        bytes(rng.integers(0, 256, size=20000, dtype=np.uint8)),
        b"\x00" * 100,               # constant bytes
    ]
    for k in (8, 64):
        batch = byte_oph_signatures_batch(payloads, k, 4, 42)
        for i, p in enumerate(payloads):
            ref = byte_oph_signature(p, k, 4, 42)
            assert np.array_equal(batch[i], ref), (i, k)

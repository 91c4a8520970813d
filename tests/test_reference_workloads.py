"""Tests mirroring the reference's own workload shapes and ctest anchors.

The reference validates its parallel variants against a serially-built
sketch over the same element set (test/test_parallel_lock.c:47-57) and
smoke-runs fixed CLI configs (test/CMakeLists.txt:96-109: 1M elements,
sketch sizes 100/128).  Here the same contracts are checked on the
vectorized kernels: partition-any-way + merge == one-shot build (the
min-fold algebra the FCDS propagator relies on,
src/fcds/minhash-fcds.c:252-316), at the ctest element scale.
"""

from __future__ import annotations

import numpy as np
import pytest

from minhash_ray.config import INFTY, PipelineConfig
from minhash_ray.functions.hashing import HashTables
from minhash_ray.functions.minhash import (
    estimate_similarity,
    merge_signatures,
    signatures_from_shingles,
)


def _build(elems: np.ndarray, tables) -> np.ndarray:
    return signatures_from_shingles(elems, np.array([len(elems)]), tables)[0]


@pytest.mark.parametrize("family", ["pairwise", "kwise"])
def test_ctest_anchor_partitioned_equals_serial(family):
    """1M consecutive elements (the ctest smoke workload,
    test/test_serial.c:66-68 inserts i+startsize), built in one shot vs
    8 arbitrary partitions merged — exact elementwise equality."""
    cfg = PipelineConfig(num_perm=128, bands=32, rows_per_band=4, hash_family=family)
    tables = HashTables.from_config(cfg)
    elems = np.arange(1_000_000, dtype=np.uint64)
    serial = _build(elems, tables)

    rng = np.random.default_rng(0)
    perm = rng.permutation(len(elems))
    shuffled = elems[perm]
    parts = np.array_split(shuffled, 8)
    partials = [_build(p, tables) for p in parts]
    merged = partials[0]
    for p in partials[1:]:
        merged = merge_signatures(merged, p)
    assert np.array_equal(merged, serial)


def test_init_values_preseed_semantics():
    """The reference's init_size pre-seeding (init_values inserts [0, n),
    src/configuration/configuration.c:150-156): a sketch pre-seeded with
    [0, n) then fed more elements == one built over the union."""
    cfg = PipelineConfig(num_perm=64, bands=16, rows_per_band=4)
    tables = HashTables.from_config(cfg)
    pre = _build(np.arange(100, dtype=np.uint64), tables)
    more = _build(np.arange(500, 900, dtype=np.uint64), tables)
    combined = merge_signatures(pre, more)
    union = _build(
        np.concatenate([np.arange(100, dtype=np.uint64), np.arange(500, 900, dtype=np.uint64)]),
        tables,
    )
    assert np.array_equal(combined, union)


def test_similarity_estimate_tracks_true_jaccard():
    """The estimator's statistical contract (reference query semantics,
    src/serial/minhash-serial.c:16-26): estimated ~ true Jaccard within
    a few sigma at k=128."""
    cfg = PipelineConfig()
    tables = HashTables.from_config(cfg)
    a = np.arange(0, 1000, dtype=np.uint64)
    for overlap in (250, 500, 750):
        b = np.arange(1000 - overlap, 2000 - overlap, dtype=np.uint64)
        true_j = overlap / (2000 - overlap)
        est = estimate_similarity(
            _build(a, tables)[None, :], _build(b, tables)[None, :]
        )[0]
        sigma = (true_j * (1 - true_j) / cfg.num_perm) ** 0.5
        assert abs(est - true_j) < 5 * sigma, (overlap, true_j, est)


def test_empty_sketch_is_all_infty():
    cfg = PipelineConfig(num_perm=32, bands=8, rows_per_band=4)
    tables = HashTables.from_config(cfg)
    sig = signatures_from_shingles(np.empty(0, dtype=np.uint64), np.array([0]), tables)
    assert (sig[0] == np.uint64(INFTY)).all()

"""Property-based tests (hypothesis): the vectorized kernels must match the
scalar oracle on arbitrary unicode text and arbitrary uint64 element sets —
the reference's differential-oracle standard generalized beyond fixtures."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from minhash_ray.config import PipelineConfig
from minhash_ray.functions.hashing import HashTables
from minhash_ray.functions.minhash import merge_signatures, signatures_from_shingles
from minhash_ray.functions.shingles import token_shingles
from minhash_ray.functions.simhash import simhash_from_shingles
from minhash_ray.oracle import OracleSketch, oracle_signature, oracle_simhash

CFG = PipelineConfig(num_perm=32, bands=8, rows_per_band=4)
TABLES = HashTables.from_config(CFG)

texts = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),  # no surrogates
        max_size=80,
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=40, deadline=None)
@given(texts)
def test_signature_and_simhash_match_oracle_on_arbitrary_text(batch_texts):
    sh, counts = token_shingles(pa.array(batch_texts, pa.string()), CFG.shingle_w, CFG.seed)
    sigs = signatures_from_shingles(sh, counts, TABLES)
    simh = simhash_from_shingles(sh, counts)
    for i, t in enumerate(batch_texts):
        assert np.array_equal(sigs[i], oracle_signature(t, CFG)), repr(t)
        assert int(simh[i]) == oracle_simhash(t, CFG), repr(t)


elements = st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=200)


@settings(max_examples=40, deadline=None)
@given(elements, st.integers(min_value=1, max_value=5))
def test_partitioned_build_equals_serial_on_arbitrary_elements(elems, n_parts):
    arr = np.array(elems, dtype=np.uint64)
    serial = signatures_from_shingles(arr, np.array([len(arr)]), TABLES)[0]
    parts = np.array_split(arr, n_parts)
    merged = None
    for p in parts:
        sig = signatures_from_shingles(p, np.array([len(p)]), TABLES)[0]
        merged = sig if merged is None else merge_signatures(merged, sig)
    assert np.array_equal(merged, serial)
    # and the scalar oracle agrees
    o = OracleSketch(CFG)
    for e in elems:
        o.insert(int(e))
    assert np.array_equal(serial, o.as_array())


@settings(max_examples=25, deadline=None)
@given(elements)
def test_insert_is_idempotent_and_order_independent(elems):
    arr = np.array(elems, dtype=np.uint64)
    once = signatures_from_shingles(arr, np.array([len(arr)]), TABLES)[0]
    doubled = np.concatenate([arr, arr[::-1]])
    twice = signatures_from_shingles(doubled, np.array([len(doubled)]), TABLES)[0]
    assert np.array_equal(once, twice)

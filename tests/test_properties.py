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


# --- round-2 kernels ------------------------------------------------------

sets_strategy = st.lists(
    st.lists(st.integers(min_value=0, max_value=500), min_size=0, max_size=40),
    min_size=1,
    max_size=12,
)


@settings(max_examples=40, deadline=None)
@given(sets_strategy, st.data())
def test_exact_jaccard_kernel_property(raw_sets, data):
    from minhash_ray.functions.minhash import exact_jaccard_for_pairs

    sets = [np.unique(np.array(s, dtype=np.uint64)) for s in raw_sets]
    flat = np.concatenate(sets) if sets else np.empty(0, dtype=np.uint64)
    offs = np.concatenate([[0], np.cumsum([len(s) for s in sets])]).astype(np.int64)
    n = len(sets)
    idx_a = np.array(data.draw(st.lists(st.integers(0, n - 1), min_size=1, max_size=20)))
    idx_b = np.array(data.draw(st.lists(st.integers(0, n - 1), min_size=len(idx_a), max_size=len(idx_a))))
    got = exact_jaccard_for_pairs(flat, offs, idx_a, idx_b)
    for k in range(len(idx_a)):
        sa, sb = set(sets[idx_a[k]].tolist()), set(sets[idx_b[k]].tolist())
        u = sa | sb
        want = len(sa & sb) / len(u) if u else 0.0
        assert abs(got[k] - want) < 1e-12


payloads_strategy = st.lists(st.binary(min_size=0, max_size=400), min_size=1, max_size=10)


@settings(max_examples=40, deadline=None)
@given(payloads_strategy, st.sampled_from([8, 64]))
def test_byte_oph_batch_property(payloads, k):
    from minhash_ray.functions.audio import byte_oph_signature, byte_oph_signatures_batch

    batch = byte_oph_signatures_batch(payloads, k, 4, 42)
    for i, p in enumerate(payloads):
        assert np.array_equal(batch[i], byte_oph_signature(p, k, 4, 42))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=64),
       st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=64),
       st.integers(0, 8))
def test_audio_similarity_bounds_and_symmetry(xs, ys, min_filled):
    from minhash_ray.functions.audio import audio_similarity

    n = min(len(xs), len(ys))
    a = np.array(xs[:n], dtype=np.uint64)[None, :]
    b = np.array(ys[:n], dtype=np.uint64)[None, :]
    s_ab = audio_similarity(a, b, min_filled)[0]
    s_ba = audio_similarity(b, a, min_filled)[0]
    assert s_ab == s_ba
    assert 0.0 <= s_ab <= 1.0
    INF = np.uint64(2**64 - 1)
    # identical fully-filled sketches score exactly 1.0
    if (a != INF).all() and (a >= min_filled).all() and (a != INF).sum() >= min_filled:
        assert audio_similarity(a, a, min_filled)[0] == 1.0


@given(
    st.lists(st.integers(min_value=0, max_value=300), min_size=0, max_size=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_wordpoly_chunked_fold_matches_sequential(lens, seed):
    """The chunked Horner fold (128 KB scratch) must equal the plain
    sequential word fold ``h = h*M + w_i`` finished by ``h*M + len`` for
    arbitrary row lengths, including zero rows, sub-word rows, and rows
    straddling the chunk boundary (exercised via a shrunken chunk)."""
    import minhash_ray.util as U

    rng = np.random.default_rng(seed)
    flat = rng.integers(0, 256, size=sum(lens), dtype=np.uint8)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    mult = 0xD6E8FEB86659FD93

    def seq(flat, offs):
        out = []
        for i in range(len(offs) - 1):
            b = bytes(flat[offs[i]:offs[i + 1]])
            if not b:
                out.append(0)
                continue
            b += b"\0" * ((-len(b)) % 8)
            h = 0
            for j in range(0, len(b), 8):
                h = (h * mult + int.from_bytes(b[j:j + 8], "little")) % 2**64
            out.append((h * mult + (offs[i + 1] - offs[i])) % 2**64)
        return np.array(out, dtype=np.uint64)

    want = seq(flat, offs)
    got = U.wordpoly_digest_rows(flat, offs, mult)
    assert (got == want).all()
    # force multi-chunk rows: shrink the chunk to 4 words
    old = U._WORDPOLY_CHUNK_WORDS
    U._WORDPOLY_CHUNK_WORDS = 4
    try:
        got_small = U.wordpoly_digest_rows(flat, offs, mult)
    finally:
        U._WORDPOLY_CHUNK_WORDS = old
    assert (got_small == want).all()


@settings(max_examples=50, deadline=None)
@given(texts)
def test_tokenize_matches_python_split_reference(batch_texts):
    """The vectorized tokenizer (arrow split + defensive trim + empty
    filter, functions/shingles.tokenize_with_strings) must equal the naive
    Python ``text.lower().split()`` reference on arbitrary unicode —
    including trailing/leading/repeated whitespace, the shapes the r5
    split-kernel corruption hid in."""
    import pyarrow.compute as pc

    from minhash_ray.functions.shingles import tokenize_with_strings

    flat, counts, hashes = tokenize_with_strings(
        pa.array(batch_texts, pa.string()), CFG.seed
    )
    got = flat.to_pylist()
    # reference: Python split over the SAME (arrow) lowering — isolates
    # the split/trim/filter semantics this property pins (arrow and
    # Python lowercase diverge on e.g. U+0130, which is out of scope)
    lowered = pc.utf8_lower(pa.array(batch_texts, pa.string())).to_pylist()
    want = [tok for t in lowered for tok in t.split()]
    assert got == want
    assert counts.tolist() == [len(t.split()) for t in lowered]
    # hashes are positionally consistent with the token strings
    from minhash_ray.functions.hashing import fnv1a_64

    for tok, h in zip(got, hashes.tolist()):
        assert h == fnv1a_64(tok.encode("utf-8"), CFG.seed)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-0.999, max_value=0.999, allow_nan=False),
        min_size=64,
        max_size=512,
    )
)
def test_g711_roundtrip_property(samples):
    """G.711 µ-law/A-law round-trip on arbitrary waveforms: length
    preserved, output in [-1, 1], and per-sample error bounded by the
    largest companding step (~1/32 of full scale at the top segment)."""
    from minhash_ray.functions.audio import (
        decode_alaw,
        decode_mulaw,
        encode_alaw,
        encode_mulaw,
    )

    w = np.array(samples, dtype=np.float64)
    for enc, dec in ((encode_mulaw, decode_mulaw), (encode_alaw, decode_alaw)):
        out = dec(enc(w))
        assert len(out) == len(w)
        assert np.all(np.abs(out) <= 1.0)
        assert np.max(np.abs(out - w)) < 0.0325

"""Round-3 hardening: forced join-attach verifier paths must be identical
to the broadcast paths (no operator may require a whole-corpus ray.put),
and the hot-bucket fallback must survive pathological corpora."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _canon_df(res):
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        df = res.to_pandas()
    elif isinstance(res, pa.Table):
        df = res.to_pandas()
    else:
        df = res
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_ngram_join_verify_path_is_bit_identical(ray_session, sf_dir):
    """broadcast_max_rows=0 forces the join-attach verifier; output must be
    bit-identical to the broadcast-pack path (same PPJoin length filter,
    same exact-Jaccard gate, same ordered dedupe)."""
    from minhash_ray.pipelines.dedup_text import ngram_jaccard_pairs

    broadcast = ngram_jaccard_pairs(sf_dir)
    joined = ngram_jaccard_pairs(sf_dir, broadcast_max_rows=0, num_partitions=4)
    assert broadcast.num_rows > 0
    assert broadcast.equals(joined)


def test_substring_join_attach_path_matches_broadcast(ray_session, sf_dir):
    """broadcast_max_rows=0 forces text attachment through partitioned
    joins; the per-pair LCS results must match the broadcast-pack path
    exactly (row order is not part of the contract)."""
    import __ray_entry__ as E

    bro = _canon_df(E.substring_pairs(sf_dir))
    joined = _canon_df(E.substring_pairs(sf_dir, broadcast_max_rows=0))
    assert len(bro) > 0
    assert list(bro.columns) == list(joined.columns)
    assert bro.equals(joined)

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


def _boilerplate_clips(n: int = 96) -> pa.Table:
    """Pathological corpus: every transcript identical (every band bucket
    is hot), payloads distinct so only the text LSH channel links rows."""
    rng = np.random.default_rng(7)
    text = "the same boilerplate sentence repeated across the whole corpus forever"
    payloads = [rng.integers(0, 255, size=400, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "clip_id": pa.array([f"c{i:05d}" for i in range(n)], pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
            "sr_hz": pa.array([16000] * n, pa.int32()),
            "dur_ms": pa.array([100] * n, pa.int32()),
            "codec": pa.array(["pcm_s16le"] * n, pa.string()),
            "transcript": pa.array([text] * n, pa.string()),
        }
    )


def _n_clusters(res) -> int:
    t = pa.concat_tables(
        list(res.assignments.iter_batches(batch_size=65536, batch_format="pyarrow"))
    )
    return len(set(t.column("cluster_id").to_pylist()))


def test_hot_buckets_distributed_path_streams(ray_session):
    """driver_agg_max_rows=0 forces the distributed groupby-count hot path
    (now streamed via iter_batches); an all-identical corpus must still
    collapse to one cluster."""
    import ray.data as rd

    from minhash_ray.config import PipelineConfig
    from minhash_ray.pipelines.dedup import run_dedup

    cfg = PipelineConfig(
        signature_concurrency=2,
        hot_band_threshold=8,
        band_group_cap=16,
        driver_agg_max_rows=0,
        use_exact_channel=False,
        use_audio_channel=False,
    )
    res = run_dedup(rd.from_arrow(_boilerplate_clips()), cfg, num_partitions=4)
    assert _n_clusters(res) == 1


def test_hot_bucket_cap_degrades_to_global_salting(ray_session):
    """max_hot_buckets=0 forces the global-salting degrade path (the
    escape hatch for corpora whose hot list is not metadata-scale); the
    representative star must preserve connectivity."""
    import ray.data as rd

    from minhash_ray.config import PipelineConfig
    from minhash_ray.pipelines.dedup import run_dedup
    from minhash_ray.stages.candidates import find_hot_buckets

    cfg = PipelineConfig(
        signature_concurrency=2,
        hot_band_threshold=8,
        band_group_cap=16,
        max_hot_buckets=0,
        use_exact_channel=False,
        use_audio_channel=False,
        # salting (and therefore the degrade path under test) only runs
        # for the join backend — local reducers cap runs directly
        candidate_backend="join",
    )
    res = run_dedup(rd.from_arrow(_boilerplate_clips()), cfg, num_partitions=4)
    assert _n_clusters(res) == 1

    # the cap itself: a hot corpus with max_hot_buckets=0 reports None
    band = rd.from_arrow(
        pa.table(
            {
                "bucket": pa.array([1] * 50, pa.int64()),
                "clip_id": pa.array([f"c{i}" for i in range(50)], pa.string()),
            }
        )
    )
    assert find_hot_buckets(band, threshold=8, max_hot_buckets=0) is None
    assert find_hot_buckets(band, threshold=8, max_hot_buckets=0, driver_max_rows=0) is None


def test_wordpoly_digest_matches_serial_fold():
    """The word-polynomial digest must equal the serial fold
    h = (((w0·M + w1)·M + ...)·M + len) over zero-padded little-endian
    8-byte words, for every row shape (empty, sub-word, word-aligned,
    long) and for sliced columns (odd buffer offsets force the copy
    path)."""
    import struct

    from minhash_ray.pipelines.dedup_text import (
        _DIGEST_PARAMS,
        _string_flat_offsets,
        _wordpoly_digest_rows,
    )

    def ref(raw: bytes, mult: int) -> int:
        pad = raw + b"\x00" * ((-len(raw)) % 8)
        h = 0
        for (w,) in struct.iter_unpack("<Q", pad):
            h = (h * mult + w) % 2**64
        return (h * mult + len(raw)) % 2**64 if raw else 0

    texts = ["", "a", "hello wo", "hello world", "hello worlc", "x" * 1000, "élève"]
    for arr in (pa.array(texts, pa.string()), pa.array(texts, pa.string()).slice(1)):
        got_texts = arr.to_pylist()
        flat, offs = _string_flat_offsets(arr)
        for _, mult in _DIGEST_PARAMS:
            got = _wordpoly_digest_rows(flat, offs, mult)
            for i, s in enumerate(got_texts):
                assert got[i] == np.uint64(ref(s.encode(), mult)), (s, mult)
        assert len(set(got.tolist())) == len(got_texts)


def test_energy_fp_i16_matches_float_path():
    """The integer-domain energy fingerprint must be bit-identical to the
    float64 path (both exact; the scale constant cancels in comparisons)."""
    from minhash_ray.functions.audio import (
        decode_pcm,
        energy_delta_fingerprint,
        energy_delta_fingerprint_i16,
    )

    rng = np.random.default_rng(11)
    for size in (0, 64, 65, 130, 4097, 100_001):
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        wave = decode_pcm(payload, "pcm_s16le")
        w16 = np.frombuffer(payload[: size - size % 2], dtype="<i2")
        assert energy_delta_fingerprint(wave, 64) == energy_delta_fingerprint_i16(w16, 64)


def test_signature_stage_content_digest_separates_boundary():
    """The transcript||\\x00||payload digest must distinguish boundary
    shifts (t='a',p=b'b' vs t='ab',p=b'') and collide exactly on equal
    content."""
    from minhash_ray.config import PipelineConfig
    from minhash_ray.stages.signature import ValidateSignatureStage

    def mk(rows):
        return pa.table(
            {
                "clip_id": pa.array([r[0] for r in rows], pa.string()),
                "bytes": pa.array([r[2] for r in rows], pa.binary()),
                "sr_hz": pa.array([16000] * len(rows), pa.int32()),
                "dur_ms": pa.array([10] * len(rows), pa.int32()),
                "codec": pa.array(["pcm_s16le"] * len(rows), pa.string()),
                "transcript": pa.array([r[1] for r in rows], pa.string()),
            }
        )

    stage = ValidateSignatureStage(PipelineConfig())
    out = stage(
        mk(
            [
                ("a", "a", b"b"),
                ("b", "ab", b""),
                ("c", "a", b"b"),
                ("d", "", b""),
                ("e", "hello world three tokens", b"\x01\x02" * 50),
                ("f", "hello world three tokens", b"\x01\x02" * 50),
            ]
        )
    )
    h = out.column("content_hash").to_pylist()
    assert h[0] != h[1]          # boundary shift distinguished
    assert h[0] == h[2]          # equal content collides
    assert h[4] == h[5]
    assert len(set(h)) == 4


def test_tiered_dedup_merges_exact_groups_through_near_edges(ray_session, tmp_path):
    """Tier interplay: an exact duplicate of a near-dup member must route
    through its exact representative to the near-merged cluster root, and
    exactly one doc per final cluster carries keep=1 (the root itself)."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.dedup_text import doc_dedup_tiered

    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok30", "changed")          # 1/60 tokens differs
    other = " ".join(f"other{i}" for i in range(60))
    uniq = " ".join(f"lone{i}" for i in range(60))
    texts = [
        base,    # 0: root of the merged cluster
        base,    # 1: exact dup of 0
        near,    # 2: near dup of 0 (trigram Jaccard ~0.95 >> tau)
        other,   # 3: root of second cluster
        other,   # 4: exact dup of 3
        uniq,    # 5: singleton
    ]
    d = tmp_path / "tiered"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}),
        str(d / "documents.parquet"),
    )

    out = (
        doc_dedup_tiered(str(d), num_partitions=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.doc_id.tolist() == [0, 1, 2, 3, 4, 5]
    assert out.cluster_id.tolist() == [0, 0, 0, 3, 3, 5]
    assert out.keep.tolist() == [1, 0, 0, 1, 0, 1]


def test_signature_task_form_matches_actor_form(ray_session, small_fixture):
    """make_signature_fn (task-pool, per-worker cached state) must be
    bit-identical to ValidateSignatureStage as an actor pool — same kernel,
    two execution forms."""
    import os

    from minhash_ray.config import PipelineConfig
    from minhash_ray.sources.clips import read_clips
    from minhash_ray.stages.signature import ValidateSignatureStage, make_signature_fn

    path = os.path.join(str(small_fixture), "clips.parquet")
    cfg = PipelineConfig()
    task_df = (
        read_clips(path)
        .map_batches(make_signature_fn(cfg), batch_format="pyarrow")
        .drop_columns(["shingles"])
        .to_pandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    actor_df = (
        read_clips(path)
        .map_batches(
            ValidateSignatureStage,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            concurrency=2,
        )
        .drop_columns(["shingles"])
        .to_pandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    assert task_df.columns.tolist() == actor_df.columns.tolist()
    for c in task_df.columns:
        a, b = task_df[c], actor_df[c]
        if a.dtype == object:
            assert all(
                (x == y) if not hasattr(x, "__len__") or isinstance(x, str)
                else (np.asarray(x) == np.asarray(y)).all()
                for x, y in zip(a, b)
            ), c
        else:
            assert (a == b).all(), c


def test_rowgroup_reader_equals_plain_read(ray_session, small_fixture, tmp_path):
    """The row-group-parallel Datasource must return exactly the rows of a
    direct pyarrow read (same order: one read task per row group, in file
    order)."""
    import os

    import pyarrow.parquet as pq

    from minhash_ray.sources.clips import read_clips

    direct = pq.read_table(os.path.join(str(small_fixture), "clips.parquet"))
    path = str(tmp_path / "clips_rg.parquet")
    pq.write_table(direct, path, row_group_size=100)
    assert pq.read_metadata(path).num_row_groups >= 4   # the parallel path
    got = pa.concat_tables(
        b for b in read_clips(path).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ).combine_chunks()
    assert got.cast(direct.schema).equals(direct)


def test_candidate_pairs_globally_unique(ray_session):
    """A pair colliding in MANY buckets (the normal case for a true
    near-dup: every band matches) must come out of candidate_pairs exactly
    once — reducer-local dedupe is keyed by the bucket hash, so without the
    global distinct the pair re-emerges once per band partition."""
    import ray.data as rd

    from minhash_ray.config import PipelineConfig
    from minhash_ray.stages.candidates import candidate_pairs

    # 6 clips in 2 triples; each triple shares 40 distinct buckets (spread
    # across partitions by value), plus a singleton bucket per clip
    rows_b, rows_c = [], []
    for g, ids in enumerate((["a", "b", "c"], ["x", "y", "z"])):
        for k in range(40):
            for cid in ids:
                rows_b.append(g * 1_000_003 + k * 7919)
                rows_c.append(cid)
    band_ds = rd.from_arrow(
        pa.table({"bucket": pa.array(rows_b, pa.int64()),
                  "clip_id": pa.array(rows_c, pa.string())})
    )
    cfg = PipelineConfig()
    got = (
        candidate_pairs(band_ds, cfg, num_partitions=4)
        .to_pandas()
        .sort_values(["clip_id_a", "clip_id_b"])
        .reset_index(drop=True)
    )
    expect = sorted(
        [("a", "b"), ("a", "c"), ("b", "c"), ("x", "y"), ("x", "z"), ("y", "z")]
    )
    assert list(map(tuple, got.itertuples(index=False))) == expect

    # forced groupby path agrees
    got_g = (
        candidate_pairs(band_ds, cfg.with_(pair_dedupe="global"), num_partitions=4)
        .to_pandas()
        .sort_values(["clip_id_a", "clip_id_b"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, got_g.itertuples(index=False))) == expect


def test_cached_parquet_file_detects_rewrite(tmp_path):
    """The per-worker ParquetFile cache keys on (path, mtime_ns, size): a
    rewritten file must be re-opened, never served stale."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from minhash_ray.sources.clips import _cached_parquet_file

    path = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"x": pa.array([1, 2, 3], pa.int64())}), path)
    pf1 = _cached_parquet_file(path)
    assert _cached_parquet_file(path) is pf1          # cache hit
    time.sleep(0.01)                                  # ensure mtime advances
    pq.write_table(pa.table({"x": pa.array([9, 9], pa.int64())}), path)
    pf2 = _cached_parquet_file(path)
    assert pf2 is not pf1
    assert pf2.read().column("x").to_pylist() == [9, 9]

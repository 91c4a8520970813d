"""Operator-coverage tests: text analysis, text dedup, ANN, relational ops
vs DuckDB oracles at sf0.001, multimodal plumbing, substring kernel."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _pdf(res):
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


SQL_QUERIES = [
    "token_counts", "text_quality", "doc_fingerprints", "lang_stats",
    "exact_dedup_docs", "ann_topk", "embedding_pairs_exact", "lineitem_agg",
    "orders_by_segment", "top_customers", "supplier_regions",
    "events_by_type", "filtered_lineitem", "part_brand_stats",
    "ngram_jaccard_pairs", "rolling_fingerprints",
    "doc_minhash_slots", "simhash_fingerprints", "minhash_dup_pairs",
    "lang_id", "embedding_dup_pairs", "ann_topk_ivf", "doc_dedup_tiered",
    "window_counts", "sessionize", "asof_prior", "simhash_dup_pairs",
    "token_quantiles", "corpus_curation", "bpe_token_counts",
    "range_join_recent", "clips_minhash_slots", "sliding_window_counts",
    "top_orders_per_customer", "term_doc_freq", "stratified_sample_docs",
    "decontaminate", "distinct_users_per_type", "customers_without_orders",
    "scrub_terms", "lang_token_quantiles", "salient_terms", "nation_revenue",
    "mixture_sample", "bbit_minhash_pairs", "word_counts", "oph_minhash_slots",
    "oph_dense_slots", "oph_dup_pairs", "window_top_events",
    "audio_stats", "audio_exact_dedup", "customer_order_counts",
    "users_with_both", "weighted_jaccard_pairs", "frequent_terms",
    "semantic_dedup", "doc_repetition", "customers_with_orders",
    "normalize_text", "chunk_dedup_docs", "token_percent_rank",
    "assign_splits", "containment_pairs", "pack_sequences",
    "near_dup_vs_reference", "winnowing_fingerprints", "revenue_rollup",
    "training_manifest", "event_type_transitions", "winnowing_dup_pairs",
    "funnel_counts", "doc_dedup_keep_best", "dup_graph_degrees",
    "minhash_sim_histogram", "scoped_dup_pairs", "snm_dup_pairs",
    "dedup_cluster_sizes", "clips_rate_outliers", "nation_segment_balance",
    "lang_confusion", "session_stats", "repeated_ngram_scrub",
    "tf_cosine_pairs", "cms_term_counts", "repeated_ngram_dedup",
    "chunk_documents", "global_shuffle_order", "token_bigram_counts",
    "cross_source_dups", "dup_graph_components", "dup_knn_graph",
    "curation_report", "bigram_familiarity", "retention_cohorts",
    "dup_graph_triangles", "value_outliers", "interarrival_stats",
    "segment_priority_cube", "length_gate_docs", "cumulative_user_value",
    "props_field_stats", "gopher_quality_gate", "audio_chunk_plan",
    "posting_lists", "lang_source_pivot", "value_histogram",
    "type_cooccurrence", "shipping_priority", "latest_event_per_user",
    "trailing_value_sum", "user_event_paths", "local_supplier_volume",
    "dup_graph_pagerank", "sliding_window_distinct_users", "dedup_lines",
    "active_sessions_per_window", "dup_spans", "dup_span_scrub", "pii_scrub",
    "returned_item_revenue", "large_volume_customers", "value_winsorize",
    "ann_topk_pq",
]


def test_normalize_text_unicode_and_whitespace(ray_session, tmp_path):
    """Planted unicode/whitespace cases: NFC composition, lowercasing,
    run collapse — and oracle agreement on the planted fixture (the
    testdata corpus is plain ASCII, so the parametrized check alone never
    exercises NFC)."""
    import duckdb
    import pyarrow.parquet as pq

    texts = [
        "He\u0301llo   W\u00f6rld",     # combining acute -> NFC-precomposed \u00e9
        "  MiXeD\tCase\r\nlines  ",
        "",
    ]
    t = pa.table(
        {"doc_id": pa.array(range(3), pa.int64()), "text": pa.array(texts, pa.string())}
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    from minhash_ray.pipelines.text import normalize_text

    out = _pdf(normalize_text(str(d))).set_index("doc_id")["text_norm"]
    assert out[0] == "h\u00e9llo w\u00f6rld"
    assert out[1] == "mixed case lines"
    assert out[2] == ""

    import __ray_entry__ as E

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    odf = _canon(con.execute(E.oracle_sql()["normalize_text"]).fetchdf())
    assert _canon(out.reset_index()).equals(odf)


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_duckdb_oracle(ray_session, sf_dir, duck, name, monkeypatch):
    import __ray_entry__ as E

    # data-derived oracle literals (embedding LSH planes, IVF centroids)
    # must come from the SAME tables the query runs over
    monkeypatch.setenv("GRAFT_ORACLE_SF_DIR", sf_dir)
    rdf = _canon(_pdf(E.queries()[name](sf_dir)))
    odf = _canon(duck.execute(E.oracle_sql()[name]).fetchdf())
    assert list(rdf.columns) == list(odf.columns)
    assert [str(d) for d in rdf.dtypes] == [str(d) for d in odf.dtypes]
    assert rdf.equals(odf), f"{name} values differ"


def test_rows_only_queries_have_stable_schema(ray_session, sf_dir):
    import __ray_entry__ as E

    expected_cols = {
        "doc_sample": ["doc_id", "n_chars_measured", "n_tokens"],
        "bpe_train": ["rank", "left", "right", "merged", "pair_count"],
        "clips_pair_snr": ["clip_id_a", "clip_id_b", "channel", "snr_db", "snr_ok"],
    }
    for name, cols in expected_cols.items():
        df = _pdf(E.queries()[name](sf_dir))
        assert list(df.columns) == cols, name
        assert len(df) >= 0


def test_minhash_dup_pairs_deterministic_and_verified(ray_session, sf_dir):
    from minhash_ray.pipelines.dedup_text import minhash_dup_pairs, ngram_jaccard_pairs

    p1 = _pdf(minhash_dup_pairs(sf_dir)).sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    p2 = _pdf(minhash_dup_pairs(sf_dir)).sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    assert p1.equals(p2)
    # estimator vs exact n-gram jaccard: every kept pair has real overlap
    ex = _pdf(ngram_jaccard_pairs(sf_dir, threshold=0.0))
    j_of = {(a, b): j for a, b, j in zip(ex.doc_id_a, ex.doc_id_b, ex.jaccard)}
    for a, b, sim in zip(p1.doc_id_a, p1.doc_id_b, p1.sim):
        j = j_of.get((a, b), 0.0)
        assert abs(j - sim) < 0.25, (a, b, j, sim)


def test_embedding_lsh_finds_planted_dups(ray_session, tmp_path):
    """Hyperplane-LSH near-dup path on embeddings WITH planted duplicates
    (the testdata embeddings are near-orthogonal, so plant our own)."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(3)
    base = rng.standard_normal((200, 32))
    dup = base[:40] + rng.standard_normal((40, 32)) * 0.05   # cos ~ 0.999
    mat = np.vstack([base, dup]).astype(np.float32)
    ids = np.arange(len(mat), dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(r) for r in mat], pa.list_(pa.float32())),
            "label": pa.array(np.zeros(len(mat), dtype=np.int32), pa.int32()),
        }
    )
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"))

    from minhash_ray.pipelines.ann import embedding_dup_pairs

    pairs = _pdf(embedding_dup_pairs(str(d), threshold=0.9))
    found = set(zip(pairs.vec_id_a, pairs.vec_id_b))
    planted = {(i, 200 + i) for i in range(40)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.95, recall
    # verification keeps only true high-cosine pairs
    assert (pairs.cos >= 0.9).all()


def test_ann_topk_is_true_topk(ray_session, sf_dir):
    import duckdb

    from minhash_ray.pipelines.ann import ann_topk

    got = _pdf(ann_topk(sf_dir, query_vec_id=3, k=5))
    rows = duckdb.connect().execute(
        f"""SELECT vec_id FROM '{sf_dir}/embeddings.parquet' WHERE vec_id <> 3
            ORDER BY list_cosine_similarity(embedding,
              (SELECT embedding FROM '{sf_dir}/embeddings.parquet' WHERE vec_id=3)) DESC, vec_id
            LIMIT 5"""
    ).fetchall()
    assert got.vec_id.tolist() == [r[0] for r in rows]
    assert got["rank"].tolist() == [1, 2, 3, 4, 5]


def test_multimodal_frame_features_and_stub(ray_session, small_fixture):
    import ray.data as rd

    from minhash_ray.pipelines.multimodal import audio_frame_features

    clips = rd.read_parquet(str(small_fixture / "clips.parquet")).limit(20)
    t = pa.concat_tables(
        list(
            audio_frame_features(clips).iter_batches(batch_size=4096, batch_format="pyarrow")
        )
    )
    assert t.column("frame_idx").to_numpy().min() >= 0          # all pcm decodes
    assert t.schema.field("feature").type == pa.list_(pa.float32(), 8)

    # stub boundary: unknown codec rows become decode_error rows, not crashes
    def poison(batch: pa.Table) -> pa.Table:
        codecs = ["mp3"] * batch.num_rows
        i = batch.column_names.index("codec")
        return batch.set_column(i, "codec", pa.array(codecs, pa.string()))

    poisoned = clips.map_batches(poison, batch_format="pyarrow")
    t2 = pa.concat_tables(
        list(
            audio_frame_features(poisoned).iter_batches(batch_size=4096, batch_format="pyarrow")
        )
    )
    assert (t2.column("frame_idx").to_numpy() == -1).all()
    assert all(
        e and "no registered decoder" in e
        for e in t2.column("decode_error").to_pylist()
    )


def test_resample_stub(ray_session, small_fixture):
    import ray.data as rd

    from minhash_ray.pipelines.multimodal import resample_stub

    clips = rd.read_parquet(str(small_fixture / "clips.parquet")).limit(10)
    out = pa.concat_tables(
        list(
            resample_stub(clips, 16000).iter_batches(batch_size=4096, batch_format="pyarrow")
        )
    )
    assert (out.column("sr_hz").to_numpy() == 16000).all()


def test_substring_kernel():
    from minhash_ray.functions.substring import lcs_ratio, longest_common_substring_len

    assert longest_common_substring_len("abcdef", "zabcy") == 3
    assert longest_common_substring_len("", "abc") == 0
    assert longest_common_substring_len("aaaa", "aa") == 2
    assert lcs_ratio("hello world", "hello world") == 1.0
    assert lcs_ratio("abc", "xyz") == 0.0


def test_embedding_lsh_join_verifier_matches_broadcast(ray_session, tmp_path):
    """Force the join-attach (at-scale) verification path with
    broadcast_max_rows=0: same pairs, same cosines as the broadcast path."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(13)
    base = rng.standard_normal((150, 24))
    dup = base[:30] + rng.standard_normal((30, 24)) * 0.05
    mat = np.vstack([base, dup]).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(mat), dtype=np.int64), pa.int64()),
            "embedding": pa.array([list(r) for r in mat], pa.list_(pa.float32())),
            "label": pa.array(np.zeros(len(mat), dtype=np.int32), pa.int32()),
        }
    )
    d = tmp_path / "emb2"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"))

    from minhash_ray.pipelines.ann import embedding_dup_pairs

    bc = _pdf(embedding_dup_pairs(str(d), threshold=0.9))
    jn = _pdf(embedding_dup_pairs(str(d), threshold=0.9, broadcast_max_rows=0))
    key = ["vec_id_a", "vec_id_b"]
    bc = bc.sort_values(key).reset_index(drop=True)
    jn = jn.sort_values(key).reset_index(drop=True)
    assert bc.equals(jn)
    planted = {(i, 150 + i) for i in range(30)}
    found = set(zip(jn.vec_id_a, jn.vec_id_b))
    assert len(found & planted) / len(planted) >= 0.95


def test_doc_sample_deterministic(ray_session, sf_dir):
    from minhash_ray.pipelines.text import doc_sample

    s1 = _pdf(doc_sample(sf_dir)).sort_values("doc_id").reset_index(drop=True)
    s2 = _pdf(doc_sample(sf_dir)).sort_values("doc_id").reset_index(drop=True)
    assert s1.equals(s2)
    assert list(s1.columns) == ["doc_id", "n_chars_measured", "n_tokens"]
    n_docs = len(_pdf(doc_sample(sf_dir, fraction=1.0)))
    assert 0 < len(s1) < n_docs
    # a different seed draws a different sample
    s3 = _pdf(doc_sample(sf_dir, seed=7)).sort_values("doc_id").reset_index(drop=True)
    assert not s1.equals(s3)


def test_ivf_topk_recall_on_clustered_embeddings(ray_session, tmp_path):
    """IVF index + probed query: on clustered data (where IVF is the right
    tool) recall@k vs brute force must be high, and the full-probe setting
    must equal brute force exactly."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.ann import ann_topk, ann_topk_ivf, build_ivf_index

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((30, 24)) * 4
    pts = np.concatenate(
        [c + rng.standard_normal((25, 24)) for c in centers]
    ).astype(np.float32)
    ids = np.arange(len(pts), dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(r) for r in pts], pa.list_(pa.float32())),
            "label": pa.array(np.zeros(len(pts), dtype=np.int32), pa.int32()),
        }
    )
    d = tmp_path / "ivf"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"))

    exact = _pdf(ann_topk(str(d), query_vec_id=3, k=10))
    index = build_ivf_index(str(d), n_centroids=16, seed=1)
    approx = _pdf(ann_topk_ivf(str(d), query_vec_id=3, k=10, n_probe=4, index=index))
    recall = len(set(approx.vec_id) & set(exact.vec_id)) / 10
    assert recall >= 0.9, recall
    # probing every cell == exact brute force
    full = _pdf(ann_topk_ivf(str(d), query_vec_id=3, k=10, n_probe=16, index=index))
    assert full.vec_id.tolist() == exact.vec_id.tolist()


def test_event_window_ops_partition_invariant(ray_session, sf_dir):
    """The order-sensitive window ops hash-partition on user_id; the
    partition count must be invisible in the result (keys are never split,
    so within-partition lexsort gives exact global semantics)."""
    from minhash_ray.pipelines.events import asof_prior, sessionize

    a = _canon(_pdf(sessionize(sf_dir, num_partitions=2)))
    b = _canon(_pdf(sessionize(sf_dir, num_partitions=32)))
    assert a.equals(b)
    c = _canon(_pdf(asof_prior(sf_dir, num_partitions=2)))
    d = _canon(_pdf(asof_prior(sf_dir, num_partitions=32)))
    assert c.equals(d)


def test_asof_prior_self_type_excludes_self(ray_session, sf_dir):
    """left_type == right_type: the running maximum is shifted one row, so
    an event's prior is the PREVIOUS click, never itself."""
    from minhash_ray.pipelines.events import asof_prior

    df = _pdf(asof_prior(sf_dir, left_type="click", right_type="click"))
    assert len(df) > 0
    assert (df.event_id != df.prior_event_id).all()
    # exactly one click per user (its first) has no prior
    firsts = df.sort_values(["user_id", "event_id"]).groupby("user_id").head(1)
    assert (firsts.prior_event_id == -1).all()
    assert int((df.prior_event_id == -1).sum()) == df.user_id.nunique()


def test_sliding_window_hop_equals_window_reduces_to_tumbling(ray_session, sf_dir):
    """hop == window must make sliding_window_counts bit-identical to the
    tumbling window_counts output."""
    from minhash_ray.pipelines.events import sliding_window_counts, window_counts

    tumb = _canon(_pdf(window_counts(sf_dir, window_minutes=60)))
    slid = _canon(_pdf(sliding_window_counts(sf_dir, window_minutes=60, hop_minutes=60)))
    assert tumb.equals(slid)


def test_sliding_window_replication_factor(ray_session, sf_dir):
    """With window=4*hop every event lands in exactly 4 windows: total
    n_events across windows = 4x the event count."""
    from minhash_ray.pipelines.events import sliding_window_counts

    df = _pdf(sliding_window_counts(sf_dir, window_minutes=60, hop_minutes=15))
    import pyarrow.parquet as pq

    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    assert int(df["n_events"].sum()) == 4 * n_events


def test_decontaminate_flags_benchmark_members(ray_session, sf_dir):
    """Every benchmark doc with >= w tokens shares its own grams -> must
    self-flag; docs with < w tokens yield no grams -> must not flag."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.dedup_text import DOC_CFG, decontaminate

    out = decontaminate(sf_dir).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    w = DOC_CFG.shingle_w
    for did, text in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        n_tok = len((text or "").split())
        if did % 43 == 0 and n_tok >= w:
            assert out.loc[did, "contaminated"], f"benchmark doc {did} not flagged"
        if n_tok < w:
            assert not out.loc[did, "contaminated"], f"gramless doc {did} flagged"


def test_stratified_sample_is_exact_per_stratum_topk(ray_session, sf_dir):
    """The distributed two-level sample equals the brute-force smallest-k
    splitmix64(doc_id) per lang, rank for rank."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.text import stratified_sample_docs
    from minhash_ray.stages.banding import splitmix64

    k = 7
    got = (
        stratified_sample_docs(sf_dir, k=k)
        .to_pandas()
        .sort_values(["lang", "rnk"])
        .reset_index(drop=True)
    )
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    df = docs.to_pandas()
    df["h"] = splitmix64(df["doc_id"].to_numpy().astype(np.uint64))
    want_rows = []
    for lang, grp in df.groupby("lang"):
        grp = grp.sort_values(["h", "doc_id"]).head(k)
        for i, did in enumerate(grp["doc_id"].to_numpy()):
            want_rows.append((lang, int(did), i + 1))
    import pandas as pd

    want = pd.DataFrame(want_rows, columns=["lang", "doc_id", "rnk"]).sort_values(
        ["lang", "rnk"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["lang", "doc_id", "rnk"]], want)


def test_new_partitioned_ops_are_partition_invariant(ray_session, sf_dir):
    """Anti-join, count-distinct and per-group top-k give identical results
    at different partition counts (the partitioning is an implementation
    detail, never a semantics knob)."""
    import pandas as pd

    from minhash_ray.pipelines.events import distinct_users_per_type
    from minhash_ray.pipelines.relational import (
        customers_without_orders,
        top_orders_per_customer,
    )

    from minhash_ray.pipelines.events import (
        cumulative_user_value,
        interarrival_stats,
        latest_event_per_user,
        trailing_value_sum,
        type_cooccurrence,
    )

    for fn, kw in [
        (customers_without_orders, {}),
        (distinct_users_per_type, {}),
        (top_orders_per_customer, {}),
        (interarrival_stats, {}),
        (cumulative_user_value, {}),
        (type_cooccurrence, {}),
        (latest_event_per_user, {}),
        (trailing_value_sum, {}),
    ]:
        a = _canon(_pdf(fn(sf_dir, num_partitions=3, **kw)))
        b = _canon(_pdf(fn(sf_dir, num_partitions=32, **kw)))
        pd.testing.assert_frame_equal(a, b), fn.__name__


def test_semantic_dedup_planted_clusters(ray_session, tmp_path):
    """SemDeDup keep semantics on planted near-identical groups: each
    planted (base, dup) pair lands in one component whose min vec_id is
    the only kept row; unrelated vectors stay kept singletons."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    base = rng.standard_normal((120, 32))
    dup = base[:30] + rng.standard_normal((30, 32)) * 0.03    # cos ~ 0.999
    mat = np.vstack([base, dup]).astype(np.float32)
    ids = np.arange(len(mat), dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(r) for r in mat], pa.list_(pa.float32())),
            "label": pa.array(np.zeros(len(mat), dtype=np.int32), pa.int32()),
        }
    )
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"))

    from minhash_ray.pipelines.ann import semantic_dedup

    out = _pdf(semantic_dedup(str(d), n_centroids=8, threshold=0.9))
    assert len(out) == len(mat)                       # every vector assigned
    by_id = out.set_index("vec_id")
    hits = 0
    for i in range(30):
        # dup 120+i must co-cluster with base i (same IVF cell is expected
        # at cos~0.999; a cell-boundary straddle is possible but rare)
        if by_id.loc[120 + i, "cluster_id"] == by_id.loc[i, "cluster_id"]:
            hits += 1
            assert by_id.loc[120 + i, "keep"] == 0    # min-id rep keeps
            assert by_id.loc[i, "keep"] == 1
    assert hits >= 27, hits                           # >=90% recall
    # exactly one keeper per cluster
    g = out.groupby("cluster_id")["keep"].sum()
    assert (g == 1).all()
    # keep flag is min-id semantics
    mins = out.groupby("cluster_id")["vec_id"].min()
    kept = set(out[out.keep == 1].vec_id)
    assert kept == set(mins)


def test_doc_repetition_flags_planted_degenerates(ray_session, tmp_path):
    """Planted degenerate docs trip the Gopher-style gates (and the DuckDB
    oracle agrees on the planted fixture, where the flags actually fire —
    the testdata corpus has no degenerate docs, so the parametrized
    oracle check alone never exercises flagged=1)."""
    import duckdb
    import pyarrow.parquet as pq

    import ray.data as rd

    texts = [
        "the quick brown fox jumps over the lazy dog near a quiet river bank",
        "spam ham spam ham spam ham spam ham spam ham spam ham spam ham",   # top-bigram
        "a b c a b c a b c a b c a b c a b c a b c",                        # dup-trigram
        "",                                                                  # empty
        "one two",                                                           # no trigrams
        "solo",                                                              # no bigrams
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    from minhash_ray.pipelines.text import doc_repetition

    out = _pdf(doc_repetition(str(d))).set_index("doc_id").sort_index()
    assert out.loc[0, "flagged"] == 0
    assert out.loc[1, "flagged"] == 1          # "spam ham" dominates bigrams
    assert out.loc[2, "flagged"] == 1          # every trigram repeats
    assert out.loc[3].tolist() == [0] * 7      # empty doc: all-zero counts
    assert out.loc[4, "n_trigrams"] == 0 and out.loc[4, "n_bigrams"] == 1
    assert out.loc[5, "n_bigrams"] == 0 and out.loc[5, "n_tokens"] == 1

    # oracle agreement on the planted fixture
    import __ray_entry__ as E

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    odf = _canon(con.execute(E.oracle_sql()["doc_repetition"]).fetchdf())
    assert _canon(out.reset_index()).equals(odf)


def test_read_docs_formats_equivalent(ray_session, sf_dir, tmp_path):
    """JSONL and CSV exports of the documents table read back identical to
    the parquet source, and the text operators accept any of them through
    ``docs=``."""
    import duckdb

    from minhash_ray.pipelines.text import doc_repetition
    from minhash_ray.sources.docs import read_docs

    src = f"{sf_dir}/documents.parquet"
    jl = tmp_path / "docs.jsonl"
    cs = tmp_path / "docs.csv"
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT doc_id, text FROM '{src}' ORDER BY doc_id) "
        f"TO '{jl}' (FORMAT JSON)"
    )
    con.execute(
        f"COPY (SELECT doc_id, text FROM '{src}' ORDER BY doc_id) "
        f"TO '{cs}' (FORMAT CSV, HEADER)"
    )

    base = _canon(read_docs(src, columns=["doc_id", "text"]).to_pandas())
    for alt in (str(jl), str(cs)):
        got = _canon(read_docs(alt, columns=["doc_id", "text"]).to_pandas())
        assert got.equals(base), alt

    # operators run unchanged over the non-parquet source
    rep_pq = _canon(_pdf(doc_repetition(sf_dir)))
    rep_jl = _canon(_pdf(doc_repetition("", docs=read_docs(str(jl)))))
    assert rep_jl.equals(rep_pq)


def test_hll_approx_distinct_within_bound(ray_session, sf_dir):
    """HLL estimate lands within the sketch's error envelope of the exact
    per-type distinct count (2^12 registers → ~1.6% σ; gate at 5%)."""
    import duckdb

    from minhash_ray.pipelines.events import approx_distinct_users_per_type

    got = _pdf(approx_distinct_users_per_type(sf_dir)).set_index("event_type")
    exact = dict(
        duckdb.connect().execute(
            f"SELECT event_type, count(DISTINCT user_id) FROM "
            f"'{sf_dir}/events.parquet' GROUP BY event_type"
        ).fetchall()
    )
    assert set(got.index) == set(exact)
    for et, n in exact.items():
        est = int(got.loc[et, "n_users_approx"])
        assert abs(est - n) <= max(3, 0.05 * n), (et, est, n)


def test_hll_partition_invariance(ray_session, sf_dir):
    """Partitioned == serial for the HLL sketch fold (the reference's
    do_compare_with_serial contract, test/test_serial.c) — identical
    estimates regardless of how the input is partitioned."""
    import ray.data as rd

    from minhash_ray.pipelines.events import approx_distinct_users_per_type

    outs = []
    for parts in (1, 7):
        # repartition upstream of the op by pre-reading with a block cap
        import os

        ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet")).repartition(parts)

        from minhash_ray.pipelines import events as ev

        orig = ev._events
        try:
            ev._events = lambda _sf, columns=None: ds.select_columns(columns) if columns else ds
            outs.append(_canon(_pdf(approx_distinct_users_per_type(sf_dir))))
        finally:
            ev._events = orig
    assert outs[0].equals(outs[1])


def test_hll_kernel_merge_algebra():
    """Sketch algebra invariants (the reference's insert/merge contracts):
    merge is commutative + associative + idempotent; partitioned fold ==
    serial fold register-for-register."""
    from minhash_ray.functions.hll import (
        hll_estimate,
        hll_from_u64_values,
        hll_merge,
    )

    rng = np.random.default_rng(11)
    vals = np.unique(rng.integers(0, 1 << 62, size=30000).astype(np.uint64))
    a, b, c = vals[:9000], vals[9000:21000], vals[21000:]
    sa, sb, sc = map(hll_from_u64_values, (a, b, c))
    whole = hll_from_u64_values(vals)
    assert np.array_equal(hll_merge(sa, hll_merge(sb, sc)), whole)
    assert np.array_equal(hll_merge(hll_merge(sa, sb), sc), whole)
    assert np.array_equal(hll_merge(sa, sb), hll_merge(sb, sa))
    assert np.array_equal(hll_merge(sa, sa), sa)               # idempotent
    # duplicate inserts don't move the estimate (idempotent insert)
    dup = np.concatenate([vals, vals, vals[:5]])
    assert hll_estimate(hll_from_u64_values(dup)) == hll_estimate(whole)


def test_bottom_k_quantiles_accuracy_and_invariance(ray_session, sf_dir):
    """KMV bottom-k quantiles: within sampling tolerance of the exact
    quantiles, and EXACTLY partition-invariant (set-min fold)."""
    import duckdb
    import os

    import ray.data as rd

    from minhash_ray.pipelines import events as ev
    from minhash_ray.pipelines.events import approx_value_quantiles

    got = _pdf(approx_value_quantiles(sf_dir)).set_index("q")["value_approx"]
    n = duckdb.connect().execute(
        f"SELECT count(*) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    for q in (0.25, 0.5, 0.75, 0.9):
        exact_rank_lo = duckdb.connect().execute(
            f"SELECT quantile_disc(value, {max(0.0, q - 0.08)}) FROM '{sf_dir}/events.parquet'"
        ).fetchone()[0]
        exact_rank_hi = duckdb.connect().execute(
            f"SELECT quantile_disc(value, {min(1.0, q + 0.08)}) FROM '{sf_dir}/events.parquet'"
        ).fetchone()[0]
        assert exact_rank_lo <= got[q] <= exact_rank_hi, (q, got[q])

    outs = []
    for parts in (1, 9):
        ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet")).repartition(parts)
        orig = ev._events
        try:
            ev._events = lambda _sf, columns=None: ds.select_columns(columns) if columns else ds
            outs.append(_pdf(approx_value_quantiles(sf_dir)))
        finally:
            ev._events = orig
    assert outs[0].equals(outs[1])


def test_chunk_dedup_planted_cases(ray_session, tmp_path):
    """Planted keep-first semantics: a doc that copies an earlier doc's
    chunk loses it, a full copy is emptied to '', a within-doc repeated
    chunk is dropped at its second position, and the survivor doc keeps
    everything."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.dedup_text import chunk_dedup_docs

    W = 4
    a = " ".join(f"a{i}" for i in range(2 * W))            # 2 chunks, doc 1
    b_chunks = [" ".join(f"a{i}" for i in range(W)),        # copy of A chunk 0
                " ".join(f"b{i}" for i in range(W)),        # own
                " ".join(f"b{i}" for i in range(W))]        # within-doc repeat
    b = " ".join(b_chunks)
    c = a                                                   # full copy → ''
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([a, b, c], pa.string()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    df = (
        chunk_dedup_docs(str(d), words_per_chunk=W)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert df.loc[1, "clean_text"] == a
    assert (df.loc[1, "n_chunks"], df.loc[1, "n_kept"]) == (2, 2)
    # doc 2: loses A's chunk and its own repeated chunk → one survivor
    assert df.loc[2, "clean_text"] == b_chunks[1]
    assert (df.loc[2, "n_chunks"], df.loc[2, "n_kept"]) == (3, 1)
    # doc 3: everything appeared earlier → present but empty
    assert df.loc[3, "clean_text"] == ""
    assert (df.loc[3, "n_chunks"], df.loc[3, "n_kept"]) == (2, 0)


def test_assign_splits_deterministic_and_reasonable(ray_session, sf_dir):
    """Same doc → same split across runs; bucket == splitmix64 mod 100 is
    content-independent so fractions land near 90/5/5 on 500 uniform ids."""
    from minhash_ray.pipelines.text import assign_splits

    a = _pdf(assign_splits(sf_dir)).sort_values("doc_id").reset_index(drop=True)
    b = _pdf(assign_splits(sf_dir)).sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    frac = a.split.value_counts(normalize=True)
    assert 0.80 <= frac.get("train", 0) <= 0.97
    assert set(a.split) <= {"train", "val", "test"}


def test_token_percent_rank_tie_and_extremes(ray_session, sf_dir):
    """Tied token counts share one pct_rank; min group is exactly 0.0 and
    every value is (#strictly smaller)/(N-1)."""
    from minhash_ray.pipelines.text import token_percent_rank

    df = _pdf(token_percent_rank(sf_dir))
    n = len(df)
    grp = df.groupby("n_tokens")["pct_rank"]
    assert (grp.nunique() == 1).all()
    below = 0
    for val, cnt in df.n_tokens.value_counts().sort_index().items():
        expect = below / (n - 1)
        got = df.loc[df.n_tokens == val, "pct_rank"].iloc[0]
        assert got == expect, (val, got, expect)
        below += cnt


def test_containment_finds_planted_subset_doc(ray_session, tmp_path):
    """A short doc embedded verbatim in a much longer one scores
    containment 1.0 in the contained→container direction while its
    Jaccard stays far below the pair threshold — the asymmetric semantics
    the operator exists for."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.dedup_text import containment_pairs, ngram_jaccard_pairs

    short = " ".join(f"s{i}" for i in range(12))
    long = short + " " + " ".join(f"x{i}" for i in range(120))
    other = " ".join(f"y{i}" for i in range(30))
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([short, long, other], pa.string()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    got = _pdf(containment_pairs(str(d), threshold=0.8))
    pairs = {(a, b): c for a, b, c in zip(got.doc_id_a, got.doc_id_b, got.containment)}
    assert pairs.get((1, 2)) == 1.0            # short ⊂ long, directed
    assert (2, 1) not in pairs                  # reverse direction fails 0.8
    assert all(a != 3 and b != 3 for a, b in pairs)
    jac = _pdf(ngram_jaccard_pairs(str(d), threshold=0.3))
    assert not ((jac.doc_id_a == 1) & (jac.doc_id_b == 2)).any()


def test_pack_sequences_budget_invariants(ray_session, sf_dir):
    """Every non-terminal sequence's token mass sits within one document
    of the budget (the documented straddle rule), ids are conserved, and
    the packing is deterministic across runs and partition counts."""
    from minhash_ray.pipelines.text import pack_sequences

    B = 256
    a = _pdf(pack_sequences(sf_dir, budget_tokens=B)).sort_values("doc_id").reset_index(drop=True)
    b = _pdf(pack_sequences(sf_dir, budget_tokens=B, num_partitions=3)).sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)                       # partition-invariant scan
    sums = a.groupby("seq_id")["n_tokens"].sum()
    max_doc = int(a.n_tokens.max())
    last = sums.index.max()
    non_last = sums[sums.index != last]
    assert (non_last > B - max_doc).all()
    assert (non_last < B + max_doc).all()
    assert a.doc_id.is_unique and len(a) == 500


def test_near_dup_vs_reference_planted(ray_session, tmp_path):
    """Cross-corpus semantics: a corpus doc near-copying a reference doc
    is flagged against it; reference docs never appear on the corpus
    side; unrelated corpus docs stay clean."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.dedup_text import near_dup_vs_reference

    base = " ".join(f"w{i}" for i in range(40))
    near = base + " tail1 tail2"                  # high trigram jaccard vs base
    other = " ".join(f"z{i}" for i in range(40))
    # doc 0 and 43 are reference (mod 43); 1, 2 are corpus
    t = pa.table(
        {
            "doc_id": pa.array([0, 43, 1, 2], pa.int64()),
            "text": pa.array([base, other, near, " ".join(f"q{i}" for i in range(30))], pa.string()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    got = _pdf(near_dup_vs_reference(str(d), threshold=0.3))
    pairs = set(zip(got.doc_id, got.ref_doc_id))
    assert (1, 0) in pairs
    assert all(a % 43 != 0 and b % 43 == 0 for a, b in pairs)
    assert 2 not in set(got.doc_id)


def test_winnowing_guarantee_and_short_docs(ray_session, tmp_path):
    """The winnowing guarantee: two docs sharing a substring of length
    >= window + win - 1 chars share at least one fingerprint; a doc with
    fewer grams than the window still yields exactly one fingerprint
    (its min); disjoint docs share nothing."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.dedup_text import winnowing_fingerprints

    window, win = 16, 8
    shared = "the quick brown fox jumps over the lazy dog again"   # 50 chars
    a = "prefix one " + shared + " suffix alpha"
    b = "different lead " + shared + " other tail"
    c = "zzz completely unrelated content qqq xyzzy plugh"
    short = "tiny doc"                                             # < window+? grams
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([a, b, c, short], pa.string()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    df = _pdf(winnowing_fingerprints(str(d), window=window, win=win))
    fps = {i: set(df.loc[df.doc_id == i, "fp_hash"]) for i in [1, 2, 3, 4]}
    assert fps[1] & fps[2], "shared 50-char substring must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    # 'tiny doc' has 8 chars -> 0 grams at window=16... use gram math:
    n_grams = max(len(short) - (window - 1), 0)
    assert len(fps[4]) == (1 if 0 < n_grams < win else (0 if n_grams == 0 else len(fps[4])))


def test_audio_dup_pairs_recall_on_planted_audio_dups(ray_session, small_fixture):
    """Audio-only near-dup pairs recover every truth pair whose PAYLOAD is
    byte-identical: 'exact' and 'near_transcript' (same wave, edited
    text — exactly the re-upload case the audio channel exists for).
    'near_audio' pairs perturb the waveform, so their byte sketches
    legitimately diverge and are the transcript channel's job."""
    import duckdb
    import ray.data as rd

    from minhash_ray.pipelines.audio import audio_dup_pairs

    clips = rd.read_parquet(str(small_fixture / "clips.parquet"))
    got = _pdf(audio_dup_pairs(clips))
    found = {tuple(sorted(p)) for p in zip(got.clip_id_a, got.clip_id_b)}

    truth = duckdb.connect().execute(
        f"SELECT clip_id_a, clip_id_b, kind FROM "
        f"'{small_fixture}/truth_pairs.parquet' WHERE kind IN ('exact', 'near_transcript')"
    ).fetchall()
    want = {tuple(sorted((a, b))) for a, b, _ in truth}
    assert want, "fixture must plant audio-duplicate pairs"
    recall = len(found & want) / len(want)
    assert recall >= 0.95, recall
    # determinism
    got2 = _pdf(audio_dup_pairs(rd.read_parquet(str(small_fixture / "clips.parquet"))))
    found2 = {tuple(sorted(p)) for p in zip(got2.clip_id_a, got2.clip_id_b)}
    assert found == found2


def test_funnel_counts_planted_semantics(ray_session, tmp_path):
    """Funnel strictness on a planted event log: equal timestamps never
    chain, out-of-order steps reset nothing (the chain is earliest-
    feasible), repeated step types need DISTINCT timestamps, and users
    missing a step stop at the last reached depth."""
    import pandas as pd
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.events import funnel_counts

    us = 1_000_000

    def ev(eid, uid, t, typ):
        return {
            "event_id": eid,
            "ts": t * us,
            "user_id": uid,
            "event_type": typ,
            "value": 1.0,
            "props": "{}",
        }

    rows = [
        # u1: clean chain -> depth 3
        ev(1, 1, 1, "view"), ev(2, 1, 2, "click"), ev(3, 1, 3, "purchase"),
        # u2: click BEFORE its view -> only step 0 (view) reached
        ev(4, 2, 1, "click"), ev(5, 2, 2, "view"), ev(6, 2, 3, "purchase"),
        # u3: view and click at the SAME ts -> strict > fails step 1,
        # but a later click rescues it; no purchase -> depth 2
        ev(7, 3, 5, "view"), ev(8, 3, 5, "click"), ev(9, 3, 6, "click"),
        # u4: view only -> depth 1
        ev(10, 4, 1, "view"),
        # u5: no view at all -> depth 0
        ev(11, 5, 1, "purchase"), ev(12, 5, 2, "click"),
    ]
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    path = tmp_path / "ev"
    path.mkdir()
    pq.write_table(pa.Table.from_pandas(df), str(path / "events.parquet"))

    out = _canon(_pdf(funnel_counts(str(path), steps=("view", "click", "purchase"))))
    got = {int(r.step): int(r.n_users) for r in out.itertuples()}
    # u2's purchase@3 IS after its view@2 but click never chains -> depth 1
    assert got == {0: 4, 1: 2, 2: 1}

    # repeated step type: u1 has no second view after its click;
    # u3's click@6 > view@5 but no view after 6 -> nobody reaches step 2
    out2 = _canon(_pdf(funnel_counts(str(path), steps=("view", "click", "view"))))
    got2 = {int(r.step): int(r.n_users) for r in out2.itertuples()}
    assert got2 == {0: 4, 1: 2, 2: 0}

    # partition invariance: one task vs many
    a = _canon(_pdf(funnel_counts(str(path), num_partitions=2)))
    b = _canon(_pdf(funnel_counts(str(path), num_partitions=32)))
    pd.testing.assert_frame_equal(a, b)


def test_snm_rank_partition_invariance(ray_session, sf_dir):
    """The sorted-neighborhood global rank (and therefore the pair set)
    is identical at different partition counts — the ordered prefix
    count's range partitioning is an implementation detail."""
    import pandas as pd

    from minhash_ray.pipelines.dedup_text import snm_dup_pairs

    a = _canon(_pdf(snm_dup_pairs(sf_dir, num_partitions=2)))
    b = _canon(_pdf(snm_dup_pairs(sf_dir, num_partitions=32)))
    pd.testing.assert_frame_equal(a, b)


def test_containment_broadcast_path_matches_join_path(ray_session, sf_dir):
    """The containment verify's task-built plasma pack and the join-attach
    fallback produce bit-identical pairs (the forced-path proof pattern
    used for every broadcast/join switch in the repo)."""
    import pandas as pd

    from minhash_ray.pipelines.dedup_text import containment_pairs

    a = _canon(_pdf(containment_pairs(sf_dir)))
    b = _canon(_pdf(containment_pairs(sf_dir, broadcast_max_rows=0)))
    pd.testing.assert_frame_equal(a, b)


def test_repeated_ngram_scrub_planted_and_paths(ray_session, tmp_path):
    """Planted boilerplate: a 5-token footer repeated in 4 docs is fully
    scrubbed everywhere (all occurrences, not keep-first), unique content
    survives byte-for-byte, a doc that is ONLY boilerplate empties out,
    and the forced join-attach path (broadcast_max_rows=0) is
    bit-identical to the broadcast fast path."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.dedup_text import repeated_ngram_scrub

    footer = "copyright acme corp all rights"          # 5 tokens, w=3 grams
    bodies = [" ".join(f"u{d}w{i}" for i in range(8)) for d in range(4)]
    texts = [f"{b} {footer}" for b in bodies] + [footer, "lone unique doc"]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    got = (
        _pdf(repeated_ngram_scrub(str(d), min_df=4))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # every footer occurrence removed (5 docs contain it, min_df=4)
    for i, b in enumerate(bodies):
        assert got.text_scrubbed[i] == b
        assert got.n_removed[i] == 5
    assert got.text_scrubbed[4] == "" and got.n_removed[4] == 5   # footer-only doc
    assert got.text_scrubbed[5] == "lone unique doc" and got.n_removed[5] == 0

    forced = (
        _pdf(repeated_ngram_scrub(str(d), min_df=4, broadcast_max_rows=0))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(forced)


def test_bloom_kernel_algebra_and_guarantees():
    """Bloom kernels: partitioned OR-fold == serial build bit-identically
    (the reference merge contract applied to membership), no false
    negatives ever, and the false-positive rate on fresh keys stays
    within ~2x the analytic (1-e^(-kn/m))^k envelope."""
    from minhash_ray.functions.bloom import (
        bloom_empty,
        bloom_insert,
        bloom_merge,
        bloom_query,
    )

    rng = np.random.default_rng(11)
    keys = rng.integers(0, 2**63, size=20_000, dtype=np.int64).view(np.uint64)
    m_bits, k = 1 << 18, 7

    serial = bloom_insert(bloom_empty(m_bits), keys, k)
    parts = np.array_split(keys, 7)
    folded = bloom_empty(m_bits)
    for p in parts[::-1]:                       # order-independence too
        folded = bloom_merge(folded, bloom_insert(bloom_empty(m_bits), p, k))
    assert np.array_equal(serial, folded)

    assert bloom_query(serial, keys, k).all()   # no false negatives

    fresh = rng.integers(0, 2**63, size=50_000, dtype=np.int64).view(np.uint64)
    fresh = fresh[~np.isin(fresh, keys)]
    fp = bloom_query(serial, fresh, k).mean()
    expected = (1 - np.exp(-k * len(keys) / m_bits)) ** k
    assert fp <= 2 * expected + 1e-3, (fp, expected)


def test_bloom_decontaminate_superset_of_exact(ray_session, sf_dir):
    """Pipeline guarantee: every doc the exact decontaminate flags is
    flagged by the Bloom variant (no false negatives), per-doc bloom
    n_hits >= exact n_hits, and at the default m/k the FP overhead on
    this corpus is tiny."""
    from minhash_ray.pipelines.dedup_text import bloom_decontaminate, decontaminate

    ex = _pdf(decontaminate(sf_dir)).set_index("doc_id").sort_index()
    bl = _pdf(bloom_decontaminate(sf_dir)).set_index("doc_id").sort_index()
    assert (bl.loc[ex.index[ex.contaminated], "contaminated"]).all()
    assert (bl.n_hits >= ex.n_hits).all()
    extra = int(bl.contaminated.sum()) - int(ex.contaminated.sum())
    assert extra <= max(2, 0.01 * len(ex)), extra


def test_tf_cosine_planted_and_paths(ray_session, tmp_path):
    """tf-cosine semantics on planted vectors: an exact copy and a
    doubled-tf copy both score cos == 1 (the gate's exact-tie branch and
    scale invariance), a half-overlap doc stays below 0.9, and the dense,
    forced-sparse and forced-join-attach paths are bit-identical."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.dedup_text import tf_cosine_pairs

    base = "alpha beta gamma delta alpha beta"          # tf {a:2,b:2,g:1,d:1}
    texts = [
        base,
        base,                                           # exact copy: cos = 1
        base + " " + base,                              # doubled tf: cos = 1
        "alpha beta zeta eta theta iota kappa",         # partial overlap
    ]
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    got = _canon(_pdf(tf_cosine_pairs(str(d), threshold=0.9)))
    pairs = set(zip(got.doc_id_a, got.doc_id_b))
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert all(4 not in p for p in pairs)
    row12 = got[(got.doc_id_a == 1) & (got.doc_id_b == 2)].iloc[0]
    assert row12["dot"] ** 2 == row12["na2"] * row12["nb2"]   # cos exactly 1

    sparse = _canon(_pdf(tf_cosine_pairs(str(d), threshold=0.9, force_sparse=True)))
    joinp = _canon(
        _pdf(
            tf_cosine_pairs(
                str(d), threshold=0.9, force_sparse=True, broadcast_max_rows=0
            )
        )
    )
    assert got.equals(sparse) and got.equals(joinp)


def test_cms_kernel_algebra_and_guarantees():
    """Count-min kernels: per-partition partial sketches SUM to the
    serial build bit-identically (the mergeable-summary contract, + in
    place of min), estimates never undercount, and with a deliberately
    tiny width the collision overestimate stays within the e*N/width
    envelope (union bound over depth rows)."""
    from minhash_ray.functions.cms import cms_empty, cms_insert, cms_merge, cms_query

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 2**63, size=30_000, dtype=np.int64).view(np.uint64)
    counts = rng.integers(1, 6, size=len(keys)).astype(np.int64)
    width, depth = 1 << 10, 4

    serial = cms_insert(cms_empty(width, depth), keys, counts)
    folded = cms_empty(width, depth)
    for lo in range(0, len(keys), 7000):
        part = cms_insert(
            cms_empty(width, depth), keys[lo : lo + 7000], counts[lo : lo + 7000]
        )
        folded = cms_merge(folded, part)
    assert np.array_equal(serial, folded)

    # exact truth per distinct key
    u, inv = np.unique(keys, return_inverse=True)
    truth = np.zeros(len(u), dtype=np.int64)
    np.add.at(truth, inv, counts)
    est = cms_query(serial, u)
    assert (est >= truth).all()                      # never undercounts
    N = int(counts.sum())
    bound = int(np.e * N / width) + 1
    assert np.quantile(est - truth, 0.99) <= bound, (est - truth).max()


def test_repeated_ngram_dedup_keep_first_semantics(ray_session, tmp_path):
    """Keep-first semantics on planted repeats: a phrase shared by two
    docs survives only in the lower doc_id (and only at its FIRST
    position when repeated within one doc); unique text is untouched;
    the forced join-attach path is bit-identical."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.dedup_text import repeated_ngram_dedup

    phrase = "the quick brown fox jumps"                 # 5 tokens (w=3)
    texts = [
        phrase + " unique one tail",                      # doc 1: first occurrence
        "prefix words here " + phrase,                    # doc 2: later copy removed
        phrase + " middle filler " + phrase,              # doc 3: within-doc repeat
        "entirely novel text with no repeats at all",
    ]
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    got = (
        _pdf(repeated_ngram_dedup(str(d)))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.text_dedup[0] == texts[0]                  # winner keeps everything
    assert got.text_dedup[1] == "prefix words here"       # later copy scrubbed
    assert got.n_removed[1] == 5
    # keep-first is GLOBAL: doc 3's two copies both lose to doc 1's
    assert got.text_dedup[2] == "middle filler" and got.n_removed[2] == 10
    assert got.text_dedup[3] == texts[3] and got.n_removed[3] == 0

    forced = (
        _pdf(repeated_ngram_dedup(str(d), broadcast_max_rows=0))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(forced)


def test_chunk_documents_window_semantics(ray_session, tmp_path):
    """Sliding-window invariants on planted docs: stride-spaced starts,
    truncated final window, short doc -> one chunk, empty doc -> none,
    and full reconstruction when stride == width (no overlap)."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.text import chunk_documents

    toks = [f"t{i}" for i in range(25)]
    short23 = [f"s{i}" for i in range(23)]
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [" ".join(toks), "short doc", "", " ".join(short23)], pa.string()
            ),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    got = (
        _pdf(chunk_documents(str(d), words_per_chunk=10, stride=5))
        .sort_values(["doc_id", "cidx"])
        .reset_index(drop=True)
    )
    d1 = got[got.doc_id == 1]
    # 25 tokens: 1 + ceil((25-10)/5) = 4 windows, last one full at [15, 25)
    assert d1.cidx.tolist() == [0, 1, 2, 3]
    assert d1.n_tokens.tolist() == [10, 10, 10, 10]
    assert d1.chunk.iloc[0] == " ".join(toks[0:10])
    assert d1.chunk.iloc[1] == " ".join(toks[5:15])
    assert d1.chunk.iloc[3] == " ".join(toks[15:25])
    d2 = got[got.doc_id == 2]
    assert len(d2) == 1 and d2.chunk.iloc[0] == "short doc"
    assert (got.doc_id != 3).all()                      # empty doc: no chunks
    d4 = got[got.doc_id == 4]
    # 23 tokens: starts 0,5,10,15 — final window truncated to [15, 23)
    assert d4.n_tokens.tolist() == [10, 10, 10, 8]
    assert d4.chunk.iloc[3] == " ".join(short23[15:23])

    # stride == width: disjoint cover, concatenation reconstructs the doc
    nz = (
        _pdf(chunk_documents(str(d), words_per_chunk=10, stride=10))
        .sort_values(["doc_id", "cidx"])
        .reset_index(drop=True)
    )
    rec = " ".join(nz[nz.doc_id == 1].chunk)
    assert rec == " ".join(toks)


def test_kmeans_train_planted_clusters(ray_session, tmp_path):
    """Three well-separated planted clusters: exact membership counts,
    centroids allclose to the true cluster means, determinism across
    runs, and k > #points keeps empty cells at their init vectors."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from minhash_ray.pipelines.ann import kmeans_train

    rng = np.random.default_rng(7)
    centers = np.array([[10.0, 0.0], [-10.0, 5.0], [0.0, -12.0]])
    sizes = [40, 30, 20]
    pts = np.concatenate(
        [c + 0.01 * rng.standard_normal((s, 2)) for c, s in zip(centers, sizes)]
    )
    t = pa.table(
        {
            "vec_id": pa.array(range(len(pts)), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(pts.reshape(-1).astype(np.float32), pa.float32()), 2
            ).cast(pa.list_(pa.float32())),
        }
    )
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"))

    out = _pdf(kmeans_train(str(d), k=3, iters=8))
    assert sorted(out.n_members.tolist()) == sorted(sizes)
    got = np.stack(out.centroid.to_numpy())
    # each true center matched by exactly one learned centroid
    for c, s in zip(centers, sizes):
        dist = np.linalg.norm(got - c, axis=1)
        j = int(np.argmin(dist))
        assert dist[j] < 0.05 and out.n_members[j] == s
    out2 = _pdf(kmeans_train(str(d), k=3, iters=8))
    assert out2.n_members.tolist() == out.n_members.tolist()
    assert np.allclose(np.stack(out2.centroid.to_numpy()), got, rtol=1e-12)


def test_dup_knn_graph_planted_ties(ray_session, tmp_path):
    """Three identical docs: every node's two neighbors tie at sim 1.0 and
    rank by neighbor id; k=1 keeps only the smaller neighbor."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.dedup_text import dup_knn_graph

    base = ("sphinx of black quartz judge my vow while zephyrs blow over "
            "the quiet harbor wall at dawn and gulls wheel above") * 3
    t = pa.table(
        {
            "doc_id": pa.array([10, 20, 30, 40], pa.int64()),
            "text": pa.array([base, base, base, "totally unrelated words"],
                             pa.string()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    out = _pdf(dup_knn_graph(str(d), k=3)).sort_values(
        ["doc_id", "rnk"]).reset_index(drop=True)
    got = {(r.doc_id, r.rnk): (r.neighbor_id, r.sim) for r in out.itertuples()}
    assert got[(10, 1)] == (20, 1.0) and got[(10, 2)] == (30, 1.0)
    assert got[(20, 1)] == (10, 1.0) and got[(30, 2)] == (20, 1.0)
    assert 40 not in set(out.doc_id)

    k1 = _pdf(dup_knn_graph(str(d), k=1))
    assert len(k1) == 3 and set(k1.rnk) == {1}
    assert {(r.doc_id, r.neighbor_id) for r in k1.itertuples()} == {
        (10, 20), (20, 10), (30, 10)}


def test_cross_source_dups_planted(ray_session, tmp_path):
    """Planted two-source corpus: a cross-source near-copy lands in the
    (A, B) cell, a within-source copy in the (A, A) diagonal, and
    unrelated docs contribute nothing."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.dedup_text import cross_source_dups

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest before nightfall comes again") * 3
    other = ("completely different content about distributed data "
             "processing engines and arrow batches at large scale") * 3
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array([base, base + " extra", base, other,
                              "tiny unrelated"], pa.string()),
            "source": pa.array(["A", "B", "A", "B", "A"], pa.string()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    out = _pdf(cross_source_dups(str(d))).sort_values(
        ["source_a", "source_b"]).reset_index(drop=True)
    got = {(a, b): c for a, b, c in out.values.tolist()}
    assert got[("A", "A")] == 1          # docs 1-3 within-source copy
    assert got[("A", "B")] == 2          # docs (1,2) and (2,3) cross pairs
    assert ("B", "B") not in got


def test_audio_energy_stats_planted_and_mirrored(ray_session, tmp_path):
    """Planted int16 waveforms: exact energy / peak / clipping / silence
    counts, odd-trailing-byte truncation, empty payloads, non-pcm codec
    stub rows — then a numpy mirror over a synthesized fixture slice."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from minhash_ray.pipelines.audio import audio_energy_stats

    wavs = {
        "a": np.array([0, 100, -200, 32767, -32768], dtype="<i2"),
        "b": np.array([512, -512, 513], dtype="<i2"),     # silence boundary
        "c": np.array([], dtype="<i2"),                   # empty payload
        "d": np.array([7, -7], dtype="<i2"),              # all silent
    }
    payloads = {k: v.tobytes() for k, v in wavs.items()}
    payloads["a"] += b"\x01"                              # odd trailing byte
    t = pa.table(
        {
            "clip_id": pa.array(list(payloads) + ["e"], pa.string()),
            "bytes": pa.array(list(payloads.values()) + [b"\x00\x01\x02\x03"], pa.binary()),
            "codec": pa.array(["pcm_s16le"] * 4 + ["opus"], pa.string()),
        }
    )
    out = _pdf(audio_energy_stats(rd.from_arrow(t))).set_index("clip_id")
    a = out.loc["a"]
    assert (a.n_samples, a.energy, a.peak_abs, a.n_clipped, a.n_silent, a.decode_ok) == (
        5, 100**2 + 200**2 + 32767**2 + 32768**2, 32768, 2, 3, 1)
    b = out.loc["b"]
    assert (b.n_samples, b.n_silent, b.peak_abs) == (3, 2, 513)
    c = out.loc["c"]
    assert (c.n_samples, c.energy, c.peak_abs, c.n_clipped, c.n_silent) == (0, 0, 0, 0, 0)
    d = out.loc["d"]
    assert (d.n_samples, d.energy, d.n_silent) == (2, 98, 2)
    e = out.loc["e"]
    assert (e.decode_ok, e.n_samples, e.energy) == (0, 0, 0)

    # fixture mirror: per-row numpy decode must agree exactly
    from minhash_ray.sources.synth import clips_dir_for

    d_dir = clips_dir_for("/root/testdata/sf0.001")
    ft = pq.read_table(f"{d_dir}/clips.parquet", columns=["clip_id", "bytes", "codec"])
    got = _pdf(audio_energy_stats(rd.from_arrow(ft))).set_index("clip_id")
    rows = ft.slice(0, 64).to_pylist()
    for r in rows:
        w = np.frombuffer(r["bytes"][: len(r["bytes"]) - len(r["bytes"]) % 2], dtype="<i2").astype(np.int64)
        g = got.loc[r["clip_id"]]
        assert g.n_samples == len(w) and g.energy == int((w * w).sum())
        assert g.peak_abs == (int(np.abs(w).max()) if len(w) else 0)


def test_token_bigram_counts_planted(ray_session, tmp_path):
    """Planted corpus: bigrams never cross document boundaries, counts are
    exact, lowercasing folds case variants, and the min_count gate holds."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.text import token_bigram_counts

    texts = (["big cat"] * 3 + ["Big Cat"] * 2      # 5x (big, cat) after lower
             + ["cat big"] * 2                      # 2x reversed — below gate
             + ["big", "cat"] * 4)                  # singles: no pairs at all
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    out = _pdf(token_bigram_counts(str(d), min_count=3))
    assert out.values.tolist() == [["big", "cat", 5]]
    out2 = _pdf(token_bigram_counts(str(d), min_count=1))
    got = {(a, b): c for a, b, c in out2.values.tolist()}
    assert got == {("big", "cat"): 5, ("cat", "big"): 2}


def test_global_shuffle_order_is_permutation_and_partition_invariant(ray_session, sf_dir):
    """pos is exactly the permutation 1..N, identical at any partition
    count (the range partitioning agrees with the global hash order by
    construction), and genuinely shuffles (pos order != doc_id order)."""
    from minhash_ray.pipelines.text import global_shuffle_order

    a = _pdf(global_shuffle_order(sf_dir, num_partitions=32)).sort_values("doc_id").reset_index(drop=True)
    b = _pdf(global_shuffle_order(sf_dir, num_partitions=4)).sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    n = len(a)
    assert sorted(a.pos.tolist()) == list(range(1, n + 1))
    by_pos = a.sort_values("pos").doc_id.to_numpy()
    assert not (np.diff(by_pos) > 0).all()   # not the identity order


def test_bm25_topk_matches_numpy_mirror(ray_session, sf_dir):
    """BM25 scores match an independent numpy mirror of the formula
    (same accumulation order) computed straight off the parquet —
    identical top-k ids, ranks, and scores to the last ulp envelope —
    and a planted all-query-terms doc outranks partial matches."""
    import pyarrow.parquet as pq

    from minhash_ray.functions.shingles import tokenize_with_strings
    from minhash_ray.pipelines.dedup_text import DOC_CFG
    from minhash_ray.pipelines.text import bm25_topk

    query, k1, b, k = "table scan batch window", 1.2, 0.75, 10
    got = _pdf(bm25_topk(sf_dir, query=query, k=k, k1=k1, b=b))

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    flat, counts, hashes = tokenize_with_strings(t.column("text").combine_chunks(),
                                                 DOC_CFG.seed)
    _qf, _qc, qh = tokenize_with_strings(pa.array([query], pa.string()), DOC_CFG.seed)
    q_terms = np.unique(qh)
    m = len(q_terms)
    n = len(counts)
    tf = np.zeros((n, m), dtype=np.int64)
    pos = np.minimum(np.searchsorted(q_terms, hashes), m - 1)
    is_q = q_terms[pos] == hashes
    row = np.repeat(np.arange(n, dtype=np.int64), counts)
    np.add.at(tf, (row[is_q], pos[is_q]), 1)
    df = (tf > 0).sum(axis=0).astype(np.float64)
    N, avgdl = n, counts.sum() / n
    idf = np.log(1.0 + (N - df + 0.5) / (df + 0.5))
    tff = tf.astype(np.float64)
    denom = tff + k1 * (1.0 - b + b * counts.astype(np.float64)[:, None] / avgdl)
    score = np.where(tff > 0, idf[None, :] * tff * (k1 + 1.0) / denom, 0.0).sum(axis=1)
    ids = t.column("doc_id").to_numpy()
    order = np.lexsort((ids, -score))[:k]
    assert got.doc_id.tolist() == ids[order].tolist()
    assert got["rank"].tolist() == list(range(1, len(order) + 1))
    assert np.allclose(got.score.to_numpy(), score[order], rtol=1e-12)
    assert (np.diff(got.score.to_numpy()) <= 1e-12).all()   # descending


def test_bigram_familiarity_planted(ray_session, tmp_path):
    """Planted corpus: a doc made of a bigram repeated past min_count
    scores 10000 bp, an all-unique-bigram doc scores 0, a one-token doc
    has zero grams, and the forced join-attach path is bit-identical."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.text import bigram_familiarity

    common = "alpha beta " * 6            # bigram (alpha,beta) x6, (beta,alpha) x5
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [common, common, "one two three four five", "solo"],
                pa.string(),
            ),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    out = _pdf(bigram_familiarity(str(d), min_count=10)).set_index("doc_id")
    # (alpha,beta) occurs 12x >= 10 across the two copies; (beta,alpha) 10x
    assert out.loc[1].n_grams == 11 and out.loc[1].n_frequent == 11
    assert out.loc[1].familiar_bp == 10000 and out.loc[2].familiar_bp == 10000
    assert out.loc[3].n_grams == 4 and out.loc[3].n_frequent == 0
    assert out.loc[3].familiar_bp == 0
    assert out.loc[4].n_grams == 0 and out.loc[4].familiar_bp == 0

    forced = _pdf(
        bigram_familiarity(str(d), min_count=10, broadcast_max_rows=0)
    ).sort_values("doc_id").reset_index(drop=True)
    base = out.reset_index().sort_values("doc_id").reset_index(drop=True)
    assert forced.equals(base[forced.columns.tolist()])


def test_retention_cohorts_planted(ray_session, tmp_path):
    """Three users across three weekly periods: cohort rows count each
    user once per active period, keyed by the period of its first event."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.events import retention_cohorts

    W = 7 * 86_400_000_000
    # user 1: periods 0, 1, 2; user 2: periods 0, 2; user 3: period 1 only
    rows = [(1, 0), (1, 0), (1, W), (1, 2 * W), (2, 10), (2, 2 * W + 5),
            (3, W + 3), (3, W + 9)]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "ts": pa.array([ts for _, ts in rows], pa.timestamp("us")),
            "event_type": pa.array(["x"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array([""] * len(rows), pa.string()),
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))

    out = _pdf(retention_cohorts(str(d)))
    got = {(r.cohort_us, r.period_us): r.n_users for r in out.itertuples()}
    assert got == {
        (0, 0): 2,          # users 1, 2 start in period 0
        (0, W): 1,          # user 1 active in period 1
        (0, 2 * W): 2,      # users 1, 2 active in period 2
        (W, W): 1,          # user 3 starts (and only lives) in period 1
    }


def test_dup_graph_triangles_planted(ray_session, tmp_path):
    """A 4-clique of identical docs plus a pendant and a disjoint pair:
    every clique node closes C(3,2)=3 triangles, the pendant and the
    pair nodes close none (but appear zero-filled)."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.dedup_text import dup_graph_triangles

    base = ("sphinx of black quartz judge my vow while zephyrs blow over "
            "the quiet harbor wall at dawn and gulls wheel above") * 3
    other = ("pack my box with five dozen liquor jugs under the bright "
             "cold moon as trains rattle past the yard fence all night") * 3
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 7, 8], pa.int64()),
            "text": pa.array([base, base, base, base, other, other], pa.string()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    out = _pdf(dup_graph_triangles(str(d))).set_index("doc_id")["n_triangles"]
    assert out.loc[1] == 3 and out.loc[2] == 3 and out.loc[3] == 3
    assert out.loc[4] == 3
    assert out.loc[7] == 0 and out.loc[8] == 0
    assert len(out) == 6


def test_value_outliers_planted(ray_session, tmp_path):
    """A user with 20 tight values and one 100x spike flags exactly the
    spike; a two-event user never flags (every point is within 1σ of a
    two-point mean); a boundary value exactly at z·σ does NOT flag
    (strict inequality, decided in exact integers)."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.events import value_outliers

    vals_u1 = [10.00] * 10 + [10.02] * 10 + [1000.00]   # spike at event 20
    vals_u2 = [5.00, 50.00]
    # user 3: values {0 x8, 4} → μ=4/9·? with cents: 0...0,400: n=9, s=400,
    # s2=160000; event vc=0: lhs=(0·9-400)²=160000, rhs=9·(9·160000-160000)
    # =9·1280000 — not boundary; craft exact boundary instead: two values
    # a,a and one b where (b·n-s)² == z²(n·s2-s²): use {0,0,0} degenerate σ=0
    # → any equal value has lhs=0=rhs → strict '>' keeps it unflagged.
    vals_u3 = [7.00, 7.00, 7.00]
    users = [1] * len(vals_u1) + [2] * len(vals_u2) + [3] * len(vals_u3)
    vals = vals_u1 + vals_u2 + vals_u3
    t = pa.table(
        {
            "event_id": pa.array(range(len(vals)), pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array([i * 1000 for i in range(len(vals))],
                           pa.timestamp("us")),
            "event_type": pa.array(["x"] * len(vals), pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array([""] * len(vals), pa.string()),
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))

    out = _pdf(value_outliers(str(d)))
    assert set(out.event_id) == {20}
    assert out.loc[out.event_id == 20, "value_cents"].iloc[0] == 100000


def test_gopher_gate_rules_trigger_on_planted_docs(ray_session, tmp_path):
    """Planted edge docs: each rule of the composite gate flips keep=False
    for exactly the doc built to violate it (the testdata corpus never
    violates the alpha/stopword rules, so the parametrized oracle check
    alone can't exercise them); the planted fixture also re-checks oracle
    agreement so both engines see identical rule semantics on the edges."""
    import duckdb
    import pyarrow.parquet as pq

    good = "the cat sat of the mat and ran to town in style " * 3
    texts = [
        good,                                   # 0: passes every rule
        "the a of",                             # 1: too few tokens
        good.replace("cat", "123").replace("sat", "456")
            .replace("mat", "789").replace("ran", "000")
            .replace("town", "111").replace("style", "222"),  # 2: alpha frac
        "cat sat mat ran town style park door " * 2,          # 3: no stopwords
        "",                                     # 4: empty
        ("a " * 11) + "supercalifragilisticexpialidocious" * 3,  # 5: mean len
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    from minhash_ray.pipelines.text import gopher_quality_gate

    out = _pdf(gopher_quality_gate(str(d))).set_index("doc_id").sort_index()
    assert bool(out.loc[0, "keep"])
    assert not out.loc[1:, "keep"].any()
    assert out.loc[4, "n_tokens"] == 0 and out.loc[4, "n_stopwords"] == 0

    import __ray_entry__ as E

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    odf = _canon(con.execute(E.oracle_sql()["gopher_quality_gate"]).fetchdf())
    assert _canon(out.reset_index()).equals(odf)


def test_audio_chunk_bytes_tiles_and_overlaps(ray_session, sf_dir):
    """hop == window tiles the payload exactly (concatenating a clip's
    chunks reproduces its even-length byte prefix); hop = window/2 doubles
    chunk count (±1 tail) and every chunk's bytes equal the payload slice
    its plan row claims; the plan op is the bytes op minus the payload."""
    import os

    from minhash_ray.pipelines.multimodal import audio_chunk_bytes, audio_chunk_plan
    from minhash_ray.sources.clips import read_clips
    from minhash_ray.sources.synth import clips_dir_for

    p = os.path.join(clips_dir_for(sf_dir), "clips.parquet")
    clips = read_clips(p, columns=["clip_id", "sr_hz", "bytes"])
    out = _pdf(audio_chunk_bytes(clips, window_ms=250, hop_ms=250))
    plan = _canon(_pdf(audio_chunk_plan(clips, window_ms=250, hop_ms=250)))
    assert _canon(out.drop(columns=["bytes"])).equals(plan)

    import pyarrow.parquet as pq

    orig = (
        pq.read_table(p, columns=["clip_id", "bytes"])
        .to_pandas()
        .set_index("clip_id")["bytes"]
    )
    grouped = out.sort_values(["clip_id", "chunk_idx"]).groupby("clip_id")
    n_tile = {}
    for cid, grp in grouped:
        cat = b"".join(grp["bytes"])
        b = orig[cid]
        assert cat == b[: 2 * (len(b) // 2)]
        n_tile[cid] = len(grp)

    ov = _pdf(audio_chunk_bytes(clips, window_ms=250, hop_ms=125))
    for cid, grp in ov.sort_values(["clip_id", "chunk_idx"]).groupby("clip_id"):
        assert len(grp) in (2 * n_tile[cid] - 1, 2 * n_tile[cid])
        b = orig[cid]
        for _, r in grp.head(3).iterrows():
            assert r["bytes"] == b[2 * r["start_smp"]: 2 * r["end_smp"]]


def test_audio_containment_finds_planted_partial_overlap(ray_session, tmp_path):
    """A clip that is the exact second half of a longer clip: whole-clip
    audio LSH structurally misses the pair (shared grams ~= the length
    ratio, far below audio_tau) while chunk-level containment flags it
    with the contained side 100% matched; an unrelated clip stays out."""
    import pyarrow.parquet as pq

    from minhash_ray.functions.audio import encode_pcm, synth_waveform
    from minhash_ray.pipelines.audio import audio_containment_pairs, audio_dup_pairs
    from minhash_ray.sources.clips import read_clips

    rng = np.random.default_rng(7)
    sr = 16000
    wa = synth_waveform(rng, sr, 2000)
    wc = synth_waveform(rng, sr, 2000)
    payloads = {
        "clipA": encode_pcm(wa),
        "clipB": encode_pcm(wa[len(wa) // 2:]),
        "clipC": encode_pcm(wc),
    }
    ids = sorted(payloads)
    t = pa.table(
        {
            "clip_id": pa.array(ids, pa.string()),
            "bytes": pa.array([payloads[i] for i in ids], pa.binary()),
            "sr_hz": pa.array([sr] * 3, pa.int32()),
            "dur_ms": pa.array(
                [len(payloads[i]) // 2 * 1000 // sr for i in ids], pa.int32()
            ),
            "codec": pa.array(["pcm_s16le"] * 3, pa.string()),
            "transcript": pa.array(["x y z"] * 3, pa.string()),
        }
    )
    p = tmp_path / "clips.parquet"
    pq.write_table(t, str(p))

    out = _pdf(audio_containment_pairs(read_clips(str(p)), num_partitions=4))
    pairs = set(zip(out["clip_id_a"], out["clip_id_b"]))
    assert ("clipA", "clipB") in pairs
    row = out.set_index(["clip_id_a", "clip_id_b"]).loc[("clipA", "clipB")]
    assert row["n_matched_b"] == row["n_chunks_b"] == 4
    assert row["n_chunks_a"] == 8
    assert not any("clipC" in a or "clipC" in b for a, b in pairs)

    whole = _pdf(audio_dup_pairs(read_clips(str(p)), num_partitions=4))
    # an empty result arrives column-less; either way the pair is absent
    whole_pairs = (
        set(zip(whole["clip_id_a"], whole["clip_id_b"])) if len(whole) else set()
    )
    assert ("clipA", "clipB") not in whole_pairs


def test_audio_dup_regions_merge_exact_spans(ray_session, tmp_path):
    """The planted half-contained clip yields exactly two merged spans:
    the tail half of the long clip and the whole short clip, in samples,
    with the unrelated clip absent."""
    import pyarrow.parquet as pq

    from minhash_ray.functions.audio import encode_pcm, synth_waveform
    from minhash_ray.pipelines.audio import audio_dup_regions
    from minhash_ray.sources.clips import read_clips

    rng = np.random.default_rng(7)
    sr = 16000
    wa = synth_waveform(rng, sr, 2000)
    wc = synth_waveform(rng, sr, 2000)
    payloads = {
        "clipA": encode_pcm(wa),
        "clipB": encode_pcm(wa[len(wa) // 2:]),
        "clipC": encode_pcm(wc),
    }
    ids = sorted(payloads)
    t = pa.table(
        {
            "clip_id": pa.array(ids, pa.string()),
            "bytes": pa.array([payloads[i] for i in ids], pa.binary()),
            "sr_hz": pa.array([sr] * 3, pa.int32()),
            "dur_ms": pa.array(
                [len(payloads[i]) // 2 * 1000 // sr for i in ids], pa.int32()
            ),
            "codec": pa.array(["pcm_s16le"] * 3, pa.string()),
            "transcript": pa.array(["x y z"] * 3, pa.string()),
        }
    )
    p = tmp_path / "clips.parquet"
    pq.write_table(t, str(p))

    out = _pdf(audio_dup_regions(read_clips(str(p)), num_partitions=4))
    rows = set(
        zip(out["clip_id"], out["other_clip_id"], out["start_smp"], out["end_smp"])
    )
    half = len(wa) // 2
    assert rows == {
        ("clipA", "clipB", half, 2 * half),
        ("clipB", "clipA", 0, half),
    }


def test_weighted_sample_deterministic_and_size_biased(ray_session, tmp_path):
    """The A-ES sample is a pure function of (corpus, seed) — identical
    across runs and partitionings — and weight-proportional: with 50 docs
    at weight 10000 vs 450 at weight 100, the heavy docs dominate a k=50
    sample (expected heavy share ~= 10000*50/(10000*50+100*450) ~ 92%)."""
    import pyarrow.parquet as pq

    n_heavy, n_light = 50, 450
    t = pa.table(
        {
            "doc_id": pa.array(range(n_heavy + n_light), pa.int64()),
            "n_chars": pa.array(
                [10000] * n_heavy + [100] * n_light, pa.int64()
            ),
            "text": pa.array(["x"] * (n_heavy + n_light), pa.string()),
            "lang": pa.array(["en"] * (n_heavy + n_light), pa.string()),
            "source": pa.array(["s"] * (n_heavy + n_light), pa.string()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    from minhash_ray.pipelines.text import weighted_sample_docs

    a = _canon(_pdf(weighted_sample_docs(str(d), k=50)))
    b = _canon(_pdf(weighted_sample_docs(str(d), k=50)))
    assert a.equals(b)
    assert len(a) == 50
    heavy = (a["doc_id"] < n_heavy).sum()
    assert heavy >= 40
    c = _canon(_pdf(weighted_sample_docs(str(d), k=50, seed=7)))
    assert not a.equals(c)  # a different seed draws a different sample


def test_pq_topk_recall_on_clustered_embeddings(ray_session, tmp_path):
    """PQ asymmetric-distance top-k: on clustered data the 8-byte codes
    must recover most of the exact brute-force top-k, deterministically
    across two index builds, and the stored codes must be exactly
    m_sub bytes per vector (the 64x compression the index exists for)."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.ann import ann_topk, ann_topk_pq, build_pq_index

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((30, 24)) * 4
    pts = np.concatenate(
        [c + rng.standard_normal((25, 24)) * 0.3 for c in centers]
    ).astype(np.float32)
    ids = np.arange(len(pts), dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(r) for r in pts], pa.list_(pa.float32())),
            "label": pa.array(np.zeros(len(pts), dtype=np.int32), pa.int32()),
        }
    )
    d = tmp_path / "pq"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"))

    exact = _pdf(ann_topk(str(d), query_vec_id=3, k=10))
    idx = build_pq_index(str(d), m_sub=8, n_codes=16, seed=1)
    index_ds, books, dim = idx
    assert books.shape == (8, 16, 3) and dim == 24
    codes = _pdf(index_ds)
    assert all(len(c) == 8 for c in codes["codes"])
    approx = _pdf(ann_topk_pq(str(d), query_vec_id=3, k=10, index=idx))
    # 8-byte codes collapse WITHIN-cluster distances (that's the point of
    # the compression), so the pinned property is cluster-level: every
    # result comes from the query's planted cluster (ids 0..24), exactly
    # like the exact top-k does
    assert set(exact.vec_id) <= set(range(25))
    assert set(approx.vec_id) <= set(range(25)), sorted(approx.vec_id)
    recall = len(set(approx.vec_id) & set(exact.vec_id)) / 10
    assert recall >= 0.4, recall
    idx2 = build_pq_index(str(d), m_sub=8, n_codes=16, seed=1)
    approx2 = _pdf(ann_topk_pq(str(d), query_vec_id=3, k=10, index=idx2))
    assert approx.vec_id.tolist() == approx2.vec_id.tolist()


def test_ivfpq_topk_probes_and_scores(ray_session, tmp_path):
    """IVF+PQ: full-probe equals the PQ-only ranking exactly (the coarse
    stage only prunes), few-probe results still come from the query's
    planted cluster, and the index stores 9 bytes of search state per
    vector (cell int + 8 code bytes)."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.ann import (
        ann_topk_ivfpq,
        ann_topk_pq,
        build_ivfpq_index,
        build_pq_index,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((30, 24)) * 4
    pts = np.concatenate(
        [c + rng.standard_normal((25, 24)) * 0.3 for c in centers]
    ).astype(np.float32)
    ids = np.arange(len(pts), dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(r) for r in pts], pa.list_(pa.float32())),
            "label": pa.array(np.zeros(len(pts), dtype=np.int32), pa.int32()),
        }
    )
    d = tmp_path / "ivfpq"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"))

    idx = build_ivfpq_index(str(d), n_centroids=16, m_sub=8, n_codes=16, seed=1)
    index_ds, cents, books, dim = idx
    assert books.shape == (8, 16, 3) and cents.shape == (16, 24)
    rows = _pdf(index_ds)
    assert all(len(c) == 8 for c in rows["codes"])

    pq_only = _pdf(
        ann_topk_pq(str(d), query_vec_id=3, k=10,
                    index=build_pq_index(str(d), m_sub=8, n_codes=16, seed=1))
    )
    full = _pdf(ann_topk_ivfpq(str(d), query_vec_id=3, k=10, n_probe=16, index=idx))
    assert full.vec_id.tolist() == pq_only.vec_id.tolist()

    few = _pdf(ann_topk_ivfpq(str(d), query_vec_id=3, k=10, n_probe=4, index=idx))
    assert set(few.vec_id) <= set(range(25)), sorted(few.vec_id)

"""Round-4 regression tests for the ADVICE r3 findings:

1. ``_hash_fixed_bytes`` must be independent of the numpy 'S' array's
   padded width (trailing-NUL folding made the same id route to different
   global-distinct shards between batches with different max id lengths).
2. ``reduce_partition``'s over-cap star+chain emission must be O(run_len),
   not O(run_len x partition_rows), and must emit exactly the 2m-3 edge
   set the module docstring promises.
3. ``_cached_parquet_file`` must keep multiple files open (bounded LRU),
   not clear the cache on every new key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def test_hash_fixed_bytes_width_independent():
    from minhash_ray.functions.hashing import fnv1a_64
    from minhash_ray.stages.candidates import _hash_fixed_bytes

    for s in [b"ab", b"clip-000123", b"x", b"\xc3\xa9tude".decode().encode("utf-8")]:
        ref = fnv1a_64(s)
        for width in (len(s), len(s) + 1, len(s) + 6, 64):
            got = _hash_fixed_bytes(np.array([s], dtype=f"S{width}"))[0]
            assert int(got) == ref, (s, width)
    # mixed lengths in one array: each row hashes its own true bytes
    arr = np.array([b"a", b"abc", b"abcdefgh"], dtype="S8")
    out = _hash_fixed_bytes(arr)
    assert [int(x) for x in out] == [fnv1a_64(b"a"), fnv1a_64(b"abc"), fnv1a_64(b"abcdefgh")]
    # empty string row: hash of zero bytes = FNV offset basis
    from minhash_ray.functions.hashing import FNV_OFFSET

    assert int(_hash_fixed_bytes(np.array([b""], dtype="S4"))[0]) == FNV_OFFSET


def test_pair_pkey_stable_across_batch_widths():
    """The same (a, b) pair must get the same pkey whether its batch's
    widest id is 2 bytes or 20 — otherwise the global distinct silently
    leaks duplicate pairs across shards."""
    from minhash_ray.stages.candidates import _pair_pkey

    narrow = pa.table({"clip_id_a": pa.array(["ab"]), "clip_id_b": pa.array(["cd"])})
    wide = pa.table(
        {
            "clip_id_a": pa.array(["ab", "a-much-longer-clip-id"]),
            "clip_id_b": pa.array(["cd", "another-long-clip-id"]),
        }
    )
    k_narrow = _pair_pkey(narrow).column("pkey").to_pylist()[0]
    k_wide = _pair_pkey(wide).column("pkey").to_pylist()[0]
    assert k_narrow == k_wide


def _band_table(n: int, bucket: int = 7) -> pa.Table:
    return pa.table(
        {
            "bucket": pa.array([bucket] * n, pa.int64()),
            "clip_id": pa.array([f"c{i:06d}" for i in range(n)], pa.string()),
        }
    )


def _pairs_set(ds) -> set[tuple[str, str]]:
    t = pa.concat_tables(list(ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow")))
    return set(
        zip(t.column("clip_id_a").to_pylist(), t.column("clip_id_b").to_pylist())
    )


def test_overcap_run_emits_exact_star_chain(ray_session):
    """One bucket with run_len >> cap on the LOCAL backend: the reducer
    must emit exactly the star+chain edge set (2m-3 unordered pairs, one
    connected component) — and do so via the O(run_len) direct path."""
    import ray.data as rd

    from minhash_ray.config import PipelineConfig
    from minhash_ray.stages.candidates import candidate_pairs

    n = 400
    cfg = PipelineConfig(band_group_cap=16, candidate_backend="local")
    pairs = _pairs_set(candidate_pairs(rd.from_arrow(_band_table(n)), cfg, num_partitions=4))
    assert len(pairs) == 2 * n - 3
    # connectivity: union-find over the emitted edges collapses to 1 root
    parent = {f"c{i:06d}": f"c{i:06d}" for i in range(n)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    assert len({find(k) for k in parent}) == 1


def test_small_run_still_emits_all_pairs(ray_session):
    import ray.data as rd

    from minhash_ray.config import PipelineConfig
    from minhash_ray.stages.candidates import candidate_pairs

    n = 12
    cfg = PipelineConfig(band_group_cap=16, candidate_backend="local")
    pairs = _pairs_set(candidate_pairs(rd.from_arrow(_band_table(n)), cfg, num_partitions=2))
    assert len(pairs) == n * (n - 1) // 2


def test_parquet_file_cache_holds_multiple_files(tmp_path):
    import pyarrow.parquet as pq

    from minhash_ray.sources import clips as clips_mod

    paths = []
    for i in range(3):
        p = tmp_path / f"t{i}.parquet"
        pq.write_table(pa.table({"x": pa.array([i])}), p)
        paths.append(str(p))

    clips_mod._PQ_FILE_CACHE.clear()
    first = [clips_mod._cached_parquet_file(p) for p in paths]
    # alternating between files must hit the cache (same object back)
    for p, pf in zip(paths, first):
        assert clips_mod._cached_parquet_file(p) is pf
    # a rewritten file gets a fresh reader; others stay cached
    pq.write_table(pa.table({"x": pa.array([99, 100])}), paths[0])
    assert clips_mod._cached_parquet_file(paths[0]) is not first[0]
    assert clips_mod._cached_parquet_file(paths[1]) is first[1]
    # bounded: a burst of distinct files never grows the cache past the cap
    for i in range(10):
        p = tmp_path / f"extra{i}.parquet"
        pq.write_table(pa.table({"x": pa.array([i])}), p)
        clips_mod._cached_parquet_file(str(p))
    assert len(clips_mod._PQ_FILE_CACHE) <= clips_mod._PQ_FILE_CACHE_MAX
    clips_mod._PQ_FILE_CACHE.clear()


def _canon(ds) -> pa.Table:
    if isinstance(ds, pa.Table):
        return ds.combine_chunks()
    t = pa.concat_tables(list(ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow")))
    return t.combine_chunks()


def test_doc_lsh_shuffle_verify_matches_broadcast(ray_session, sf_dir):
    """broadcast_verify_max_rows=0 forces minhash_dup_pairs through the
    verify_shuffle join-attach path; edges must be bit-identical to the
    broadcast-pack path (same estimator gate, same ordered dedupe)."""
    from minhash_ray.pipelines.dedup_text import DOC_CFG, minhash_dup_pairs

    bro = _canon(minhash_dup_pairs(sf_dir))
    shuf = _canon(
        minhash_dup_pairs(sf_dir, cfg=DOC_CFG.with_(broadcast_verify_max_rows=0),
                          num_partitions=4)
    )
    assert bro.num_rows > 0
    assert bro.equals(shuf)


def test_simhash_join_attach_matches_broadcast(ray_session, sf_dir):
    """broadcast_verify_max_rows=0 forces simhash_dup_pairs' fingerprint
    verification through two slim partitioned joins; the pair list must be
    bit-identical to the broadcast-pack path."""
    from minhash_ray.pipelines.dedup_text import DOC_CFG, simhash_dup_pairs

    bro = _canon(simhash_dup_pairs(sf_dir))
    joined = _canon(
        simhash_dup_pairs(sf_dir, cfg=DOC_CFG.with_(broadcast_verify_max_rows=0),
                          num_partitions=4)
    )
    assert bro.num_rows > 0
    assert bro.equals(joined)


def test_tiered_checkpoint_resume(ray_session, sf_dir, tmp_path, monkeypatch):
    """Kill-after-tier-1 resume: run tiered dedup with checkpoints, delete
    the tier-2/3 checkpoints (simulating a crash after tier 1 published),
    rerun — tier 1 must be LOADED (not recomputed) and the final output
    must be bit-identical to the uninterrupted run."""
    import shutil

    from minhash_ray.pipelines.dedup_text import DOC_CFG, doc_dedup_tiered
    from minhash_ray.state.checkpoint import CheckpointManager

    def sorted_out(ds) -> pa.Table:
        return _canon(ds).sort_by(
            [("doc_id", "ascending"), ("cluster_id", "ascending")]
        )

    root = str(tmp_path / "ckpt")
    full = sorted_out(doc_dedup_tiered(sf_dir, ckpt_root=root))
    mgr = CheckpointManager(root, DOC_CFG)
    assert mgr.is_complete("tier1_reps")
    assert mgr.is_complete("tier2_pairs")
    assert mgr.is_complete("tier3_assign")

    # finished run short-circuits straight to the published tier3
    loads: list[str] = []
    orig_load = CheckpointManager.load

    def spy_load(self, stage):
        loads.append(stage)
        return orig_load(self, stage)

    monkeypatch.setattr(CheckpointManager, "load", spy_load)
    again = sorted_out(doc_dedup_tiered(sf_dir, ckpt_root=root))
    assert loads == ["tier3_assign"]
    assert full.equals(again)

    # crash-after-tier-1: wipe tiers 2+3, rerun
    shutil.rmtree(mgr.stage_dir("tier2_pairs"))
    shutil.rmtree(mgr.stage_dir("tier3_assign"))
    loads.clear()
    resumed = sorted_out(doc_dedup_tiered(sf_dir, ckpt_root=root))
    assert "tier1_reps" in loads           # tier 1 reused, not recomputed
    assert "tier3_assign" not in loads[:1]  # it did real work this time
    assert full.equals(resumed)
    assert mgr.is_complete("tier2_pairs") and mgr.is_complete("tier3_assign")


def test_curation_audit_finds_zero_missed_dups(ray_session, sf_dir):
    """Full-fraction audit over the dedup-kept docs: the exact n-gram
    verifier must find NO pair of kept docs at true jaccard >= tau."""
    from minhash_ray.pipelines.curation import curation_audit

    missed = _canon(_pa_table(curation_audit(sf_dir, fraction=1.0)))
    assert missed.num_rows == 0, missed.to_pydict()


def _pa_table(res) -> pa.Table:
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(
        list(res.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    )


def test_tiered_flagship_matches_run_dedup_partition(ray_session, small_fixture):
    """run_dedup_tiered must produce the SAME cluster partition as the
    flagship run_dedup (exact dups share every signature bit, so folding
    them into tier 1 cannot change connectivity), with keep = is-root and
    tier marking how each clip was routed."""
    import collections

    from minhash_ray.config import PipelineConfig
    from minhash_ray.pipelines.dedup import run_dedup, run_dedup_tiered
    from minhash_ray.sources.clips import read_clips

    path = str(small_fixture / "clips.parquet")
    cfg = PipelineConfig()
    base = run_dedup(read_clips(path), cfg, num_partitions=4).assignments.to_pandas()
    tier = run_dedup_tiered(read_clips(path), cfg, num_partitions=4).to_pandas()
    assert len(base) == len(tier)

    def part(df):
        m = collections.defaultdict(set)
        for c, i in zip(df.cluster_id, df.clip_id):
            m[c].add(i)
        return set(frozenset(v) for v in m.values())

    assert part(base) == part(tier)
    # keep iff canonical root; exactly one keep per cluster
    assert all((k == 1) == (c == i) for k, c, i in zip(tier.keep, tier.cluster_id, tier.clip_id))
    assert tier.keep.sum() == tier.cluster_id.nunique()
    # every exact-tier clip shares content with its rep: it must NOT be
    # its own cluster root (its rep has a smaller id in the same cluster)
    ex = tier[tier.tier == "exact"]
    assert (ex.keep == 0).all()
    # the fixture plants exact duplicates, so tier 1 must fold some rows
    assert len(ex) > 0


def test_tiered_flagship_partition_invariance(ray_session, small_fixture):
    """Same output at a different partition count / block layout (the
    reference's own permutation-invariance oracle, SURVEY §5.2)."""
    from minhash_ray.config import PipelineConfig
    from minhash_ray.pipelines.dedup import run_dedup_tiered
    from minhash_ray.sources.clips import read_clips

    path = str(small_fixture / "clips.parquet")
    cfg = PipelineConfig()
    a = (
        run_dedup_tiered(read_clips(path), cfg, num_partitions=2)
        .to_pandas().sort_values("clip_id").reset_index(drop=True)
    )
    b = (
        run_dedup_tiered(
            read_clips(path).repartition(7), cfg, num_partitions=5
        )
        .to_pandas().sort_values("clip_id").reset_index(drop=True)
    )
    assert a.equals(b)


def test_tiered_flagship_checkpoint_resume(ray_session, small_fixture, tmp_path, monkeypatch):
    """Same kill-after-tier-1 resume contract for the CLIPS tiered
    pipeline: tier-1 reps reused from the published checkpoint, final
    output bit-identical, finished run short-circuits to tier3."""
    import shutil

    from minhash_ray.config import PipelineConfig
    from minhash_ray.pipelines.dedup import run_dedup_tiered
    from minhash_ray.sources.clips import read_clips
    from minhash_ray.state.checkpoint import CheckpointManager

    path = str(small_fixture / "clips.parquet")
    cfg = PipelineConfig()

    def sorted_out(ds) -> pa.Table:
        return _canon(ds).sort_by([("clip_id", "ascending")])

    root = str(tmp_path / "ckpt")
    full = sorted_out(
        run_dedup_tiered(read_clips(path), cfg, num_partitions=4, ckpt_root=root)
    )
    mgr = CheckpointManager(root, cfg)
    for st in ("signatures", "tier1_reps", "tier2_edges", "tier3_assign"):
        assert mgr.is_complete(st), st

    loads: list[str] = []
    orig_load = CheckpointManager.load

    def spy_load(self, stage):
        loads.append(stage)
        return orig_load(self, stage)

    monkeypatch.setattr(CheckpointManager, "load", spy_load)
    again = sorted_out(
        run_dedup_tiered(read_clips(path), cfg, num_partitions=4, ckpt_root=root)
    )
    assert loads == ["tier3_assign"]
    assert full.equals(again)

    # crash after tier 1: wipe tier 2+3, rerun — signatures and tier-1
    # reps load, the near tier recomputes, output identical
    shutil.rmtree(mgr.stage_dir("tier2_edges"))
    shutil.rmtree(mgr.stage_dir("tier3_assign"))
    loads.clear()
    resumed = sorted_out(
        run_dedup_tiered(read_clips(path), cfg, num_partitions=4, ckpt_root=root)
    )
    assert "signatures" in loads and "tier1_reps" in loads
    assert full.equals(resumed)
    assert mgr.is_complete("tier2_edges") and mgr.is_complete("tier3_assign")


def test_tiered_fast_path_matches_distributed(ray_session, small_fixture):
    """driver_agg_max_rows=0 forces the tiered pipeline's distributed
    exact tier (packed groupby + joins); default config takes the
    driver-gather fast path. Outputs must be bit-identical."""
    from minhash_ray.config import PipelineConfig
    from minhash_ray.pipelines.dedup import run_dedup_tiered
    from minhash_ray.sources.clips import read_clips

    path = str(small_fixture / "clips.parquet")
    fast = (
        run_dedup_tiered(read_clips(path), PipelineConfig(), num_partitions=4)
        .to_pandas().sort_values("clip_id").reset_index(drop=True)
    )
    slow = (
        run_dedup_tiered(
            read_clips(path), PipelineConfig(driver_agg_max_rows=0), num_partitions=4
        )
        .to_pandas().sort_values("clip_id").reset_index(drop=True)
    )
    assert fast.equals(slow)


def test_weighted_jaccard_join_path_matches_broadcast(ray_session, sf_dir):
    """broadcast_max_rows=0 forces weighted_jaccard_pairs through the
    partitioned join-attach verifier; output must be bit-identical to the
    broadcast path (the shared _set_jaccard_pairs contract)."""
    from minhash_ray.pipelines.dedup_text import weighted_jaccard_pairs

    bro = _canon(weighted_jaccard_pairs(sf_dir))
    shuf = _canon(weighted_jaccard_pairs(sf_dir, broadcast_max_rows=0))
    key = [("doc_id_a", "ascending"), ("doc_id_b", "ascending")]
    assert bro.sort_by(key).equals(shuf.sort_by(key))
    assert bro.num_rows > 0


def test_partitioned_sink_roundtrip_and_resume(ray_session, sf_dir, tmp_path):
    """Resumable sharded sink: roundtrip == input, a rerun skips every
    published shard, and a damaged shard (marker removed) is the ONLY one
    rewritten."""
    import json
    import os
    import time

    import ray.data as rd

    from minhash_ray.sinks import read_partitioned, write_partitioned

    src = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text"])
    out = str(tmp_path / "sharded")
    res1 = write_partitioned(src, out, key_col="doc_id", num_shards=8)
    assert sorted(res1["written"]) == list(range(8)) and not res1["skipped"]
    assert sum(res1["rows"].values()) == src.count()

    back = read_partitioned(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = src.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back.equals(want)

    # full rerun: everything skipped, no file touched
    mtimes = {
        s: os.path.getmtime(os.path.join(out, f"shard-{s:05d}", "part-0.parquet"))
        for s in range(8)
    }
    res2 = write_partitioned(src, out, key_col="doc_id", num_shards=8)
    assert not res2["written"] and sorted(res2["skipped"]) == list(range(8))
    assert res2["rows"] == {int(k): v for k, v in res1["rows"].items()}

    # damage one shard -> only it is rewritten
    victim = 3
    os.remove(os.path.join(out, f"shard-{victim:05d}", "_SUCCESS"))
    time.sleep(0.05)
    res3 = write_partitioned(src, out, key_col="doc_id", num_shards=8)
    assert res3["written"] == [victim]
    for s in range(8):
        mt = os.path.getmtime(os.path.join(out, f"shard-{s:05d}", "part-0.parquet"))
        assert (mt != mtimes[s]) == (s == victim), s
    back2 = read_partitioned(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back2.equals(want)

    # incomplete output refuses to read
    os.remove(os.path.join(out, "shard-00005", "_SUCCESS"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no _SUCCESS"):
        read_partitioned(out)


# ---------------------------------------------------------------------------
# mixture_sample: per-source downsampling to a target mixture
# ---------------------------------------------------------------------------


def _mixture_pdf(ds):
    return (
        ds.to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )


def test_mixture_sample_dict_weights_exact_quotas(ray_session, sf_dir):
    """Explicit dict weights: quota_s = min_t floor(w_s*n_t/w_t) exactly;
    weight-0 and unlisted sources are dropped entirely; kept docs are the
    hash-smallest per source (checked against a numpy replay)."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.text import mixture_sample
    from minhash_ray.stages.banding import splitmix64

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    srcs = sorted(set(t.column("source").to_pylist()))
    assert len(srcs) >= 4
    # non-uniform: first source weight 3, second weight 1, third weight 0,
    # fourth missing from the dict entirely
    w = {srcs[0]: 3, srcs[1]: 1, srcs[2]: 0}
    df = _mixture_pdf(mixture_sample(sf_dir, weights=w))

    ids = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)
    src = np.asarray(t.column("source").to_pylist())
    n = {s: int((src == s).sum()) for s in srcs}
    pos = [(n[s], w[s]) for s in srcs if w.get(s, 0) > 0]
    for s in srcs:
        ws = w.get(s, 0)
        quota = min(ws * nt // wt for nt, wt in pos) if ws > 0 else 0
        got = df[df["source"] == s]
        assert len(got) == quota, (s, quota, len(got))
        if quota:
            h = splitmix64(ids[src == s].view(np.uint64))
            want = np.sort(ids[src == s][np.argsort(h)][:quota])
            assert list(got["doc_id"]) == list(want), s


def test_mixture_sample_boundary_path_matches_coarse_buckets(ray_session, sf_dir):
    """bucket_bits=2 (4 buckets → nearly everything rides the exact
    boundary-rank path) must produce byte-identical output to the default
    16-bit histogram (boundary work ≈ 0)."""
    from minhash_ray.pipelines.text import mixture_sample

    a = _mixture_pdf(mixture_sample(sf_dir, bucket_bits=2))
    b = _mixture_pdf(mixture_sample(sf_dir, bucket_bits=16))
    assert a.equals(b)
    assert len(a) > 0


def test_mixture_sample_uniform_weights_keep_all_on_balanced_corpus(
    ray_session, sf_dir
):
    """Uniform weights on the balanced fixture (equal per-source counts):
    quota_s = n_s for every source → the sample is the whole corpus (the
    quota==n_s keep-all edge takes the b_cut=n_buckets branch)."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.text import mixture_sample

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    counts = {}
    for s in t.column("source").to_pylist():
        counts[s] = counts.get(s, 0) + 1
    if len(set(counts.values())) != 1:  # pragma: no cover — fixture drift guard
        import pytest as _pytest

        _pytest.skip("fixture no longer balanced")
    df = _mixture_pdf(mixture_sample(sf_dir, weights=lambda s: 1))
    assert len(df) == t.num_rows


# ---------------------------------------------------------------------------
# b-bit MinHash (Li & König 2010)
# ---------------------------------------------------------------------------


def test_bbit_minhash_pairs_matches_fullwidth_on_fixture(ray_session, sf_dir):
    """At b=8 over the planted fixture the b-bit pipeline recovers the
    SAME pair set as the full-width estimator (the 2^-8 collision noise
    is far below the gate margin), and est_jaccard is exactly the
    collision-corrected transform of the reported match fraction."""
    from minhash_ray.pipelines.dedup_text import (
        DOC_CFG,
        bbit_minhash_pairs,
        bbit_threshold,
        minhash_dup_pairs,
    )

    full = minhash_dup_pairs(sf_dir).to_pandas()
    bb = bbit_minhash_pairs(sf_dir, b=8).to_pandas()
    assert len(bb) > 0
    assert set(zip(full["doc_id_a"], full["doc_id_b"])) == set(
        zip(bb["doc_id_a"], bb["doc_id_b"])
    )
    k = DOC_CFG.num_perm
    want = (bb["sim"].to_numpy() * k * 256 - k) / (k * 255)
    assert np.array_equal(bb["est_jaccard"].to_numpy(), want)
    # every kept pair clears the collision-corrected gate exactly
    thr = bbit_threshold(DOC_CFG.tau - DOC_CFG.verify_margin, 8)
    assert (bb["sim"].to_numpy() >= thr).all()
    # the b-bit match fraction can only exceed the full-width one
    # (masking never splits an equal slot pair)
    m = bb.merge(full, on=["doc_id_a", "doc_id_b"], suffixes=("_b", "_full"))
    assert (m["sim_b"].to_numpy() >= m["sim_full"].to_numpy() - 1e-12).all()


def test_bbit_threshold_endpoints():
    from minhash_ray.pipelines.dedup_text import bbit_threshold

    assert bbit_threshold(0.0, 8) == 1.0 / 256
    assert bbit_threshold(1.0, 8) == 1.0
    # wider b → smaller collision floor → threshold approaches tau
    assert abs(bbit_threshold(0.7, 32) - 0.7) < 1e-6


# ---------------------------------------------------------------------------
# bpe_train: iterative BPE merge learning over the word histogram
# ---------------------------------------------------------------------------


def _naive_bpe(texts, n_merges):
    """Independent reference: straight Sennrich-style BPE over the corpus
    word multiset (no histogram shortcut) — ties by lexicographically
    smallest pair, left-to-right non-overlapping application."""
    from collections import Counter

    words = []
    for t in texts:
        for w in t.lower().split():
            if w:
                words.append(list(w))
    merges = []
    for _ in range(n_merges):
        pc_ = Counter()
        for seq in words:
            for i in range(len(seq) - 1):
                pc_[(seq[i], seq[i + 1])] += 1
        if not pc_:
            break
        (la, rb), bc = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        if bc < 2:
            break
        for seq in words:
            i = 0
            while i < len(seq) - 1:
                if seq[i] == la and seq[i + 1] == rb:
                    seq[i : i + 2] = [la + rb]
                else:
                    i += 1
        merges.append((la, rb, la + rb, bc))
    return merges


def test_bpe_train_matches_naive_reference(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.text import bpe_train

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quicker brown foxes jumped over lazy dogs",
        "lowering the lower bound lowers the lowest bound",
        "pack my box with five dozen liquor jugs",
        "the THE The tHe",  # case folding
        "",  # empty doc
        "   ",  # whitespace-only doc
    ] * 3
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    d = tmp_path / "bpe"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    got = bpe_train(str(d), n_merges=25).to_pandas()
    want = _naive_bpe(texts, 25)
    assert len(got) == len(want)
    for i, (la, rb, m, bc) in enumerate(want):
        row = got.iloc[i]
        assert (row["left"], row["right"], row["merged"], row["pair_count"]) == (
            la, rb, m, bc
        ), i

    # deterministic across runs
    again = bpe_train(str(d), n_merges=25).to_pandas()
    assert got.equals(again)


def test_bpe_train_early_stop_when_no_repeated_pair(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.text import bpe_train

    t = pa.table(
        {"doc_id": pa.array([0, 1], pa.int64()),
         "text": pa.array(["ab", "cd"], pa.string())}
    )
    d = tmp_path / "bpe2"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    got = bpe_train(str(d), n_merges=10).to_pandas()
    assert len(got) == 0


# ---------------------------------------------------------------------------
# OPH densification (rotation borrow)
# ---------------------------------------------------------------------------


def test_oph_dense_borrow_semantics_on_planted_docs(ray_session, tmp_path):
    """Planted corpus: a zero-shingle doc (stays all -1, borrowed 0), a
    short doc (few grams → guaranteed empty bins) and a long doc; the
    dense output must equal a per-doc brute-force rotation borrow of the
    sparse output, and occupied bins never change."""
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.dedup_text import oph_dense_slots, oph_minhash_slots

    texts = [
        "one two",                       # < w tokens → no shingles at all
        "alpha beta gamma delta",        # 2 trigrams → mostly empty bins
        " ".join(f"tok{i}" for i in range(60)),  # long doc
    ]
    t = pa.table(
        {"doc_id": pa.array([10, 20, 30], pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    d = tmp_path / "oph"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    k = 16
    sparse = (
        oph_minhash_slots(str(d), k=k).to_pandas()
        .sort_values(["doc_id", "bin"]).reset_index(drop=True)
    )
    dense = (
        oph_dense_slots(str(d), k=k).to_pandas()
        .sort_values(["doc_id", "bin"]).reset_index(drop=True)
    )
    assert len(sparse) == len(dense) == 3 * k

    for doc in [10, 20, 30]:
        s = sparse[sparse["doc_id"] == doc]["slot"].to_numpy()
        got = dense[dense["doc_id"] == doc]
        occ = np.flatnonzero(s != -1)
        if occ.size == 0:
            assert (got["slot"].to_numpy() == -1).all()
            assert (got["borrowed"].to_numpy() == 0).all()
            continue
        for b in range(k):
            ts = [(j - b) % k for j in occ]
            tmin = min(ts)
            donor = (b + tmin) % k
            row = got[got["bin"] == b].iloc[0]
            assert row["borrowed"] == tmin, (doc, b)
            assert row["slot"] == s[donor], (doc, b)

    # the zero-shingle doc really had zero shingles, and the short doc
    # really had empty bins (the test exercises both paths)
    s10 = sparse[sparse["doc_id"] == 10]["slot"].to_numpy()
    s20 = sparse[sparse["doc_id"] == 20]["slot"].to_numpy()
    assert (s10 == -1).all()
    assert (s20 == -1).any() and (s20 != -1).any()


def test_oph_dup_pairs_recovers_planted_pairs(ray_session, sf_dir):
    """The 16-bin densified-OPH pipeline recovers the planted dup pairs
    the 128-permutation flagship chain finds (at 1/8 the sketch width the
    estimator is noisier, so subset-equality of the pair KEYS with full
    recall of the planted set is the right assertion, not sim equality)."""
    from minhash_ray.pipelines.dedup_text import minhash_dup_pairs, oph_dup_pairs

    full = minhash_dup_pairs(sf_dir).to_pandas()
    oph = oph_dup_pairs(sf_dir).to_pandas()
    full_keys = set(zip(full["doc_id_a"], full["doc_id_b"]))
    oph_keys = set(zip(oph["doc_id_a"], oph["doc_id_b"]))
    assert len(full_keys) > 0
    # full recall of the flagship's pairs on the planted fixture
    assert full_keys <= oph_keys
    # and no wild fan-out of false positives (16 bins, tau-margin gate)
    assert len(oph_keys) <= 2 * len(full_keys)


# ---------------------------------------------------------------------------
# pair_snr: the north-rule per-row invariant as a relation
# ---------------------------------------------------------------------------


def test_pair_snr_gates_match_planted_truth(ray_session, small_fixture):
    """Over the planted fixture's verified dup edges: every truth pair
    whose audio is planted same-or-perturbed-at-SNR>=30dB (exact,
    near_audio, near_both, and near_transcript — whose audio is
    IDENTICAL, only the transcript is perturbed) must pass the 30 dB
    gate; boilerplate edges (shared template text, independent audio)
    must fail it.  This is BASELINE.json's per-row invariant
    (decoded-PCM SNR gate) as an executable check."""
    import pyarrow.parquet as pq

    from minhash_ray.config import PipelineConfig
    from minhash_ray.pipelines.audio import pair_snr
    from minhash_ray.pipelines.dedup import run_dedup
    from minhash_ray.sources.clips import read_clips

    clips = read_clips(str(small_fixture / "clips.parquet"))
    res = run_dedup(clips, PipelineConfig(), num_partitions=4)
    out = pair_snr(
        read_clips(str(small_fixture / "clips.parquet")), res.edges
    ).to_pandas()
    assert len(out) > 0

    truth = pq.read_table(str(small_fixture / "truth_pairs.parquet")).to_pandas()
    kind = {}
    for r in truth.itertuples():
        kind[(r.clip_id_a, r.clip_id_b)] = r.kind
        kind[(r.clip_id_b, r.clip_id_a)] = r.kind

    audio_same = {"exact", "near_audio", "near_both", "near_transcript"}
    n_audio = n_boiler = 0
    for r in out.itertuples():
        k = kind.get((r.clip_id_a, r.clip_id_b))
        if k in audio_same:
            n_audio += 1
            assert r.snr_ok == 1 and r.snr_db >= 30.0, (r.clip_id_a, r.clip_id_b, k, r.snr_db)
        elif k == "boilerplate":
            n_boiler += 1
            assert r.snr_ok == 0, (r.clip_id_a, r.clip_id_b, r.snr_db)
    # both regimes actually exercised
    assert n_audio > 0 and n_boiler > 0


def test_audio_phash_pairs_exact_vs_bruteforce(ray_session, tmp_path):
    """audio_phash_pairs == brute-force: over a mixed fixture (tones,
    gain-scaled copies, noise-perturbed copies, short clips, external
    codecs) the operator's pair set must EQUAL the all-pairs Hamming ≤ d
    set over per-clip fingerprints — exact recall (pigeonhole banding
    never misses within the radius) AND exact precision (Hamming verify
    never keeps a pair outside it).  Gain invariance is asserted
    explicitly: a 0.5x-volume copy pairs with its original at Hamming 0."""
    import itertools

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from minhash_ray.functions.audio import (
        encode_pcm,
        energy_delta_fingerprint_i16,
        synth_waveform,
    )
    from minhash_ray.functions.simhash import hamming_distance
    from minhash_ray.pipelines.audio import audio_phash_pairs

    rng = np.random.default_rng(7)
    sr = 16000
    ids, payloads, codecs = [], [], []

    def add(cid, wave, codec="pcm_s16le"):
        ids.append(cid)
        payloads.append(encode_pcm(wave))
        codecs.append(codec)

    base = [synth_waveform(rng, sr, int(d)) for d in rng.integers(400, 1200, size=12)]
    for i, w in enumerate(base):
        add(f"base_{i:02d}", w)
    # gain-scaled copies (the perceptual-dup case: all bytes differ)
    add("gain_half_of_00", base[0] * 0.5)
    add("gain_tenth_of_01", base[1] * 0.1)
    # noise-perturbed copy: small envelope wobble, expect small Hamming
    add("noisy_of_02", np.clip(base[2] + rng.normal(0, 0.01, len(base[2])), -1, 1))
    # short clip (< n_frames+1 samples) and external codec: never band
    add("too_short", base[3][:40])
    add("ext_codec", base[4], codec="opus")
    add("ext_codec_copy", base[4], codec="opus")

    t = pa.table(
        {
            "clip_id": pa.array(ids, pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
            "sr_hz": pa.array([sr] * len(ids), pa.int32()),
            "dur_ms": pa.array([len(p) // 2 * 1000 // sr for p in payloads], pa.int32()),
            "codec": pa.array(codecs, pa.string()),
            "transcript": pa.array(["x"] * len(ids), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "clips.parquet"))

    from tests.test_ops import _pdf

    got = _pdf(
        audio_phash_pairs(
            rd.read_parquet(str(tmp_path / "clips.parquet")), max_hamming=6
        )
    )
    found = {tuple(sorted(p)) for p in zip(got.clip_id_a, got.clip_id_b)}

    # brute force with the same kernel
    fps = {}
    for cid, payload, codec in zip(ids, payloads, codecs):
        if codec != "pcm_s16le":
            continue
        w16 = np.frombuffer(payload, dtype="<i2")
        if len(w16) < 65:
            continue
        fps[cid] = np.uint64(energy_delta_fingerprint_i16(w16, 64))
    want = set()
    for a, b in itertools.combinations(sorted(fps), 2):
        d = int(hamming_distance(np.array([fps[a]]), np.array([fps[b]]))[0])
        if d <= 6:
            want.add(tuple(sorted((a, b))))
    assert found == want, (sorted(found - want)[:5], sorted(want - found)[:5])

    # gain invariance at Hamming 0, and the reported distance is exact
    by_pair = {
        tuple(sorted(p)): h
        for p, h in zip(zip(got.clip_id_a, got.clip_id_b), got.hamming)
    }
    assert by_pair[tuple(sorted(("base_00", "gain_half_of_00")))] == 0
    assert by_pair[tuple(sorted(("base_01", "gain_tenth_of_01")))] == 0
    # stub boundary: external-codec twins and short clips never pair
    flat = {c for p in found for c in p}
    assert not {"too_short", "ext_codec", "ext_codec_copy"} & flat


def test_snm_join_verify_path_matches_broadcast(ray_session, sf_dir):
    """snm_dup_pairs' verify-size switch: the forced join-attach path
    (broadcast_max_rows=0) is bit-identical to the default broadcast
    path — the same proof pattern as the ngram/substring/simhash
    switches."""
    from minhash_ray.pipelines.dedup_text import snm_dup_pairs

    a = snm_dup_pairs(sf_dir)
    b = snm_dup_pairs(sf_dir, broadcast_max_rows=0)
    assert a.equals(b)
    assert a.num_rows > 0          # the fixture corpus must exercise it


def test_assignments_diff_between_checkpoints(ray_session, small_fixture, tmp_path):
    """assignments_diff between a half-corpus checkpoint and the
    half+append checkpoint: every second-half clip reports `added`,
    nothing reports `removed` (append never drops clips), `moved` rows
    have differing non-null cluster ids on both sides, and
    include_same=True accounts for every clip of the merged corpus."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from minhash_ray.config import PipelineConfig
    from minhash_ray.pipelines.dedup import append_clips, assignments_diff, run_dedup

    cfg = PipelineConfig(signature_concurrency=2)
    full = pq.read_table(str(small_fixture / "clips.parquet"))
    idx = np.arange(full.num_rows)
    first = full.take(pa.array(idx[idx % 2 == 0]))
    second = full.take(pa.array(idx[idx % 2 == 1]))
    d = tmp_path / "parts"
    d.mkdir()
    pq.write_table(first, str(d / "first.parquet"))
    pq.write_table(second, str(d / "second.parquet"))

    root_a = str(tmp_path / "ckpt_a")
    run_dedup(rd.read_parquet(str(d / "first.parquet")), cfg, ckpt_root=root_a,
              num_partitions=4)
    # B = copy of A extended by the append (A must stay frozen for the diff)
    import shutil

    root_b = str(tmp_path / "ckpt_b")
    shutil.copytree(root_a, root_b)
    append_clips(rd.read_parquet(str(d / "second.parquet")), cfg, ckpt_root=root_b,
                 num_partitions=4)

    diff = assignments_diff(root_a, root_b, cfg).to_pandas()
    second_ids = set(second.column("clip_id").to_pylist())
    added = diff[diff.status == "added"]
    assert set(added.clip_id) == second_ids
    assert added.cluster_id_a.isna().all()
    assert (diff.status != "removed").all()
    moved = diff[diff.status == "moved"]
    if len(moved):
        assert (moved.cluster_id_a != moved.cluster_id_b).all()
        assert moved.cluster_id_a.notna().all() and moved.cluster_id_b.notna().all()

    everything = assignments_diff(root_a, root_b, cfg, include_same=True).to_pandas()
    assert len(everything) == full.num_rows
    assert set(everything.clip_id) == set(full.column("clip_id").to_pylist())

    # wrong config -> refuses (checkpoints are config-hashed)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        assignments_diff(root_a, root_b, PipelineConfig(num_perm=32))


def test_dedup_lines_planted_semantics(ray_session, tmp_path):
    """Planted multi-line docs (the testdata corpus is single-line, so
    the oracle hash-match alone pins only the no-op path): first
    occurrence kept in order, later exact repeats dropped, distinct
    lines untouched, empty docs and all-duplicate docs behave, and the
    planted cases also agree with the DuckDB oracle byte-for-byte."""
    import duckdb
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.text import dedup_lines
    from tests.test_ops import _pdf

    texts = [
        "alpha\nbeta\nalpha\ngamma\nbeta\nalpha",   # repeats interleaved
        "one\ntwo\nthree",                          # nothing to drop
        "same\nsame\nsame",                         # collapses to one line
        "",                                         # empty doc
        "tail\n",                                   # trailing delimiter => empty last line
        "x\n\nx\n\ny",                              # repeated EMPTY lines dedupe too
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    out = _pdf(dedup_lines(str(d))).set_index("doc_id").sort_index()
    assert out.loc[0, "text_dedup"] == "alpha\nbeta\ngamma"
    assert out.loc[0, "n_lines"] == 6 and out.loc[0, "n_removed"] == 3
    assert out.loc[1, "text_dedup"] == "one\ntwo\nthree"
    assert out.loc[1, "n_removed"] == 0
    assert out.loc[2, "text_dedup"] == "same"
    assert out.loc[2, "n_removed"] == 2
    assert out.loc[3, "text_dedup"] == "" and out.loc[3, "n_lines"] == 1
    assert out.loc[4, "text_dedup"] == "tail\n"     # '' kept once after 'tail'
    assert out.loc[4, "n_removed"] == 0
    assert out.loc[5, "text_dedup"] == "x\n\ny"
    assert out.loc[5, "n_removed"] == 2

    import __ray_entry__ as E

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    odf = (
        con.execute(E.oracle_sql()["dedup_lines"]).fetchdf()
        .set_index("doc_id").sort_index()
    )
    got = out.reset_index()[["doc_id", "text_dedup", "n_lines", "n_removed"]]
    want = odf.reset_index()[["doc_id", "text_dedup", "n_lines", "n_removed"]]
    for c in ("n_lines", "n_removed"):
        got[c] = got[c].astype("int64")
        want[c] = want[c].astype("int64")
    assert got.equals(want)


def test_repack_chunk_bytes_contiguous_equals_gather():
    """The one-memcpy-per-clip chunk repack is byte-identical to the
    general index gather on contiguous (hop == window) geometry —
    including truncated final chunks and interleaved clip sizes."""
    from minhash_ray.pipelines.audio import _repack_chunk_bytes

    rng = np.random.default_rng(11)
    buf = rng.integers(0, 256, size=10_000, dtype=np.uint8)
    # three clips with payload spans and window 64 bytes (tiled, last
    # chunk truncated)
    clip_spans = [(0, 1000), (1000, 1130), (5000, 5001)]
    row_l, bs_l, bl_l = [], [], []
    w = 64
    for i, (s, e) in enumerate(clip_spans):
        n = e - s
        k = 0
        while k * w < n:
            row_l.append(i)
            bs_l.append(s + k * w)
            bl_l.append(min(w, n - k * w))
            k += 1
    row = np.array(row_l, dtype=np.int64)
    bs = np.array(bs_l, dtype=np.int64)
    bl = np.array(bl_l, dtype=np.int64)
    fast, off_f = _repack_chunk_bytes(buf, row, bs, bl, contiguous=True)
    slow, off_s = _repack_chunk_bytes(buf, row, bs, bl, contiguous=False)
    assert np.array_equal(off_f, off_s)
    assert np.array_equal(fast, slow)
    # empty input
    z = np.zeros(0, dtype=np.int64)
    fe, oe = _repack_chunk_bytes(buf, z, z, z, contiguous=True)
    assert len(fe) == 0 and list(oe) == [0]


def test_audio_trim_plan_planted(ray_session, tmp_path):
    """Planted silence shapes: leading+trailing pads trim to the loud
    core, all-silent and empty clips yield the empty span, non-pcm
    codecs report decode_ok=False, a clip with NO silence keeps its full
    span, and a single loud sample trims to a width-1 span."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from minhash_ray.pipelines.audio import audio_trim_plan
    from tests.test_ops import _pdf

    def pcm(samples):
        return np.asarray(samples, dtype="<i2").tobytes()

    sil, loud = 100, 5000          # vs silence_abs=512
    rows = [
        ("padded", pcm([sil] * 7 + [loud, -loud, loud] + [0] * 5), "pcm_s16le"),
        ("all_silent", pcm([sil, -sil, 0, sil]), "pcm_s16le"),
        ("empty", b"", "pcm_s16le"),
        ("no_silence", pcm([loud, -loud, loud, loud]), "pcm_s16le"),
        ("one_sample", pcm([0, 0, loud, 0]), "pcm_s16le"),
        ("ext", pcm([loud] * 8), "opus"),
    ]
    t = pa.table(
        {
            "clip_id": pa.array([r[0] for r in rows], pa.string()),
            "bytes": pa.array([r[1] for r in rows], pa.binary()),
            "sr_hz": pa.array([16000] * len(rows), pa.int32()),
            "dur_ms": pa.array([1] * len(rows), pa.int32()),
            "codec": pa.array([r[2] for r in rows], pa.string()),
            "transcript": pa.array(["x"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "clips.parquet"))
    out = _pdf(
        audio_trim_plan(rd.read_parquet(str(tmp_path / "clips.parquet")))
    ).set_index("clip_id")

    assert (out.loc["padded", ["trim_start_smp", "trim_end_smp"]] == [7, 10]).all()
    assert out.loc["padded", "n_samples"] == 15
    assert (out.loc["all_silent", ["trim_start_smp", "trim_end_smp"]] == [0, 0]).all()
    assert (out.loc["empty", ["trim_start_smp", "trim_end_smp", "n_samples"]] == 0).all()
    assert (out.loc["no_silence", ["trim_start_smp", "trim_end_smp"]] == [0, 4]).all()
    assert (out.loc["one_sample", ["trim_start_smp", "trim_end_smp"]] == [2, 3]).all()
    assert not out.loc["ext", "decode_ok"]
    assert (out.loc["ext", ["trim_start_smp", "trim_end_smp"]] == [0, 0]).all()
    assert out.loc["padded", "decode_ok"] and out.loc["all_silent", "decode_ok"]

"""Round-2 regression tests: audio OPH empty-slot hygiene, empty-stage
checkpoints, non-ASCII clip ids, resample poison rows, vectorized exact
Jaccard, and broadcast-vs-shuffle verify parity (the two scale paths must
produce bit-identical edges)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from minhash_ray.config import PipelineConfig
from minhash_ray.pipelines.dedup import run_dedup


def _collect(ds) -> pa.Table:
    return pa.concat_tables(list(ds.iter_batches(batch_size=65536, batch_format="pyarrow")))


def _write_clips(tmp_path, rows, name="clips"):
    from minhash_ray.sources.clips import CLIPS_SCHEMA

    t = pa.Table.from_pylist(rows, schema=CLIPS_SCHEMA)
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "clips.parquet"))
    return str(d / "clips.parquet")


def _clip(cid, text, payload, sr=8000, dur=100, codec="pcm_s16le"):
    return {
        "clip_id": cid, "bytes": payload, "sr_hz": sr, "dur_ms": dur,
        "codec": codec, "transcript": text,
    }


# ---------------------------------------------------------------------------
# audio OPH hygiene


def test_short_audio_payloads_do_not_cross_link(ray_session, tmp_path):
    """Unrelated tiny payloads (mostly-empty OPH sketches) used to reach
    audio_tau via shared all-INFTY slots and merge clusters; with the
    informative-slot estimator + min_filled gate they must all stay
    singletons."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    texts = [
        "alpha bravo charlie delta echo foxtrot",
        "golf hotel india juliet kilo lima",
        "mike november oscar papa quebec romeo",
        "sierra tango uniform victor whiskey xray",
        "yankee zulu one two three four",
        "five six seven eight nine ten",
        "red orange yellow green blue indigo",
        "violet crimson amber teal navy coral",
    ]
    rows = [
        _clip(f"short_{i:04d}", texts[i], rng.bytes(40))
        for i in range(len(texts))
    ]
    p = _write_clips(tmp_path, rows)
    res = run_dedup(rd.read_parquet(p), PipelineConfig(signature_concurrency=1),
                    num_partitions=2)
    t = _collect(res.assignments)
    clusters = t["cluster_id"].to_pylist()
    assert len(set(clusters)) == len(clusters), "short payloads cross-linked"


def test_audio_similarity_ignores_shared_empty_slots():
    from minhash_ray.functions.audio import audio_similarity

    INF = np.uint64(2**64 - 1)
    a = np.full((1, 8), INF, dtype=np.uint64)
    b = np.full((1, 8), INF, dtype=np.uint64)
    a[0, 0] = 7
    b[0, 0] = 7
    # one real match, seven both-empty slots: reference estimator says 1.0,
    # hygiene estimator says 1.0 over 1 informative slot — but min_filled
    # blocks rows this empty from gating at all
    assert audio_similarity(a, b, min_filled=0)[0] == 1.0
    assert audio_similarity(a, b, min_filled=2)[0] == 0.0
    # mismatched fill: a filled where b empty → informative but not a match
    b2 = np.full((1, 8), INF, dtype=np.uint64)
    b2[0, 1] = 9
    assert audio_similarity(a, b2, min_filled=0)[0] == 0.0


# ---------------------------------------------------------------------------
# empty-stage checkpoints


def test_empty_checkpoint_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from minhash_ray.stages.verify import EDGES_SCHEMA
    from minhash_ray.state.checkpoint import CheckpointManager

    cfg = PipelineConfig()
    mgr = CheckpointManager(str(tmp_path / "ck"), cfg)
    empty = rd.from_arrow(EDGES_SCHEMA.empty_table())
    saved = mgr.save("edges", empty, input_stage="signatures")
    assert saved.count() == 0
    assert mgr.is_complete("edges")
    loaded = mgr.load("edges")
    assert loaded.count() == 0
    assert loaded.schema().names == [f.name for f in EDGES_SCHEMA]


def test_no_dup_corpus_checkpointed_run_and_resume(ray_session, tmp_path):
    """A corpus with zero duplicate edges must publish a loadable edges
    checkpoint and resume cleanly (previously: 'Must provide at least one
    path' on the trailing load)."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    texts = [
        "completely distinct sentence number one about rivers and stones",
        "another unrelated utterance describing mountain weather patterns",
        "a third standalone transcript covering ancient naval history",
        "fourth unique line speaking of culinary experiments gone wrong",
    ]
    rows = [_clip(f"nd_{i:04d}", texts[i], rng.bytes(4000)) for i in range(4)]
    p = _write_clips(tmp_path, rows)
    cfg = PipelineConfig(signature_concurrency=1)
    root = str(tmp_path / "ckpt")
    res = run_dedup(rd.read_parquet(p), cfg, ckpt_root=root, num_partitions=2)
    assert res.edges.count() == 0
    assert res.assignments.count() == 4
    # resume from the (empty) edges checkpoint
    res2 = run_dedup(rd.read_parquet(p), cfg, ckpt_root=root, num_partitions=2)
    assert res2.edges.count() == 0
    assert sorted(_collect(res2.assignments)["clip_id"].to_pylist()) == sorted(
        r["clip_id"] for r in rows
    )


# ---------------------------------------------------------------------------
# non-ASCII clip ids


def test_unicode_clip_ids_full_pipeline(ray_session, tmp_path):
    import ray.data as rd

    from minhash_ray.functions.audio import encode_pcm, synth_waveform

    rng = np.random.default_rng(9)
    w1 = synth_waveform(rng, 8000, 600)
    w2 = synth_waveform(rng, 8000, 600)
    dup_text = "el rápido zorro marrón salta sobre el perro perezoso hoy"
    rows = [
        _clip("café_0001", dup_text, encode_pcm(w1), dur=600),
        _clip("café_0002", dup_text, encode_pcm(w1), dur=600),   # exact dup
        _clip("naïve_0003", "üblicherweise völlig anderer text über straßenbahnen",
              encode_pcm(w2), dur=600),
        _clip("日本_0004", "yet another unrelated english sentence for padding",
              encode_pcm(synth_waveform(rng, 8000, 600)), dur=600),
    ]
    p = _write_clips(tmp_path, rows)
    res = run_dedup(rd.read_parquet(p), PipelineConfig(signature_concurrency=1),
                    num_partitions=2)
    t = _collect(res.assignments)
    cl = dict(zip(t["clip_id"].to_pylist(), t["cluster_id"].to_pylist()))
    assert cl["café_0001"] == cl["café_0002"] == "café_0001"
    assert cl["naïve_0003"] == "naïve_0003"
    assert cl["日本_0004"] == "日本_0004"


def test_bytes_key_array_utf8_order_matches_str():
    from minhash_ray.util import bytes_key_array

    ids = ["café", "cafe", "日本", "naïve", "a", "zz"]
    arr = bytes_key_array(pa.array(ids, pa.string()))
    order_np = np.argsort(arr)
    order_py = sorted(range(len(ids)), key=lambda i: ids[i].encode("utf-8"))
    assert list(order_np) == order_py


# ---------------------------------------------------------------------------
# resample poison rows


def test_resample_survives_unsupported_codec(ray_session, tmp_path):
    import ray.data as rd

    from minhash_ray.pipelines.multimodal import resample_stub

    rng = np.random.default_rng(4)
    rows = [
        _clip("ok_0001", "hello there world", rng.bytes(2000), sr=8000),
        _clip("bad_0002", "this one is opus encoded", rng.bytes(2000), codec="opus"),
        _clip("ok_0003", "goodbye cruel world", rng.bytes(2000), sr=22050),
    ]
    p = _write_clips(tmp_path, rows)
    out = _collect(resample_stub(rd.read_parquet(p), 16000))
    by_id = {r["clip_id"]: r for r in out.to_pylist()}
    assert len(by_id) == 3
    assert by_id["bad_0002"]["resample_error"] is not None
    assert by_id["bad_0002"]["sr_hz"] == 8000          # passed through unchanged
    assert by_id["ok_0001"]["resample_error"] is None
    assert by_id["ok_0001"]["sr_hz"] == 16000
    assert by_id["ok_0003"]["sr_hz"] == 16000


# ---------------------------------------------------------------------------
# vectorized exact Jaccard kernel


def test_exact_jaccard_kernel_matches_brute_force():
    from minhash_ray.functions.minhash import exact_jaccard_for_pairs

    rng = np.random.default_rng(0)
    n_rows = 40
    sets = [
        np.unique(rng.integers(0, 60, size=rng.integers(0, 30), dtype=np.uint64))
        for _ in range(n_rows)
    ]
    flat = np.concatenate(sets) if sets else np.empty(0, dtype=np.uint64)
    offs = np.concatenate([[0], np.cumsum([len(s) for s in sets])]).astype(np.int64)
    idx_a = rng.integers(0, n_rows, size=200)
    idx_b = rng.integers(0, n_rows, size=200)
    got = exact_jaccard_for_pairs(flat, offs, idx_a, idx_b)
    for k in range(len(idx_a)):
        sa, sb = set(sets[idx_a[k]].tolist()), set(sets[idx_b[k]].tolist())
        union = sa | sb
        expect = len(sa & sb) / len(union) if union else 0.0
        assert got[k] == pytest.approx(expect, abs=1e-12)


# ---------------------------------------------------------------------------
# broadcast vs shuffle verify parity (the 10^12-path semantics test)


def test_shuffle_verify_path_is_bit_identical_to_broadcast(ray_session, small_fixture):
    """Force the join-based (at-scale) verify path with
    broadcast_verify_max_rows=0 and assert edges AND assignments are
    bit-identical to the broadcast path — the two scale regimes share one
    semantics (edges gated on exact shingle Jaccard in both)."""
    import ray.data as rd

    base_cfg = PipelineConfig(signature_concurrency=2)
    ds1 = rd.read_parquet(str(small_fixture / "clips.parquet"))
    res_b = run_dedup(ds1, base_cfg, num_partitions=4)
    ds2 = rd.read_parquet(str(small_fixture / "clips.parquet"))
    res_s = run_dedup(
        ds2, base_cfg.with_(broadcast_verify_max_rows=0), num_partitions=4
    )

    def edge_set(res):
        t = _collect(res.edges)
        return {
            (a, b, ch, round(s, 10), round(j, 10), round(asim, 10))
            for a, b, ch, s, j, asim in zip(
                t["clip_id_a"].to_pylist(), t["clip_id_b"].to_pylist(),
                t["channel"].to_pylist(), t["sim"].to_pylist(),
                t["jaccard"].to_pylist(), t["audio_sim"].to_pylist(),
            )
        }

    assert edge_set(res_b) == edge_set(res_s)

    def assign_map(res):
        t = _collect(res.assignments)
        return dict(zip(t["clip_id"].to_pylist(), t["cluster_id"].to_pylist()))

    assert assign_map(res_b) == assign_map(res_s)


# ---------------------------------------------------------------------------
# config-knob wiring: substring_check LCS gate, simhash_max_hamming chunks


def _swap_halves_fixture(tmp_path):
    """Two docs sharing almost all token trigrams (X+Y vs Y+X) — high
    jaccard but LCS ratio ~0.5 — plus an exact-duplicate control pair."""
    rng = np.random.default_rng(21)
    X = " ".join(f"xtok{i:03d}" for i in range(30))
    Y = " ".join(f"ytok{i:03d}" for i in range(30))
    rows = [
        _clip("sw_0001", X + " " + Y, rng.bytes(40)),
        _clip("sw_0002", Y + " " + X, rng.bytes(40)),
        _clip("sw_0003", "a completely different utterance altogether here now", rng.bytes(40)),
    ]
    return _write_clips(tmp_path, rows, name="swap")


def test_substring_check_gates_reordered_text(ray_session, tmp_path):
    import ray.data as rd

    p = _swap_halves_fixture(tmp_path)
    base = PipelineConfig(signature_concurrency=1)

    res_off = run_dedup(rd.read_parquet(p), base, num_partitions=2)
    t = _collect(res_off.assignments)
    cl = dict(zip(t["clip_id"].to_pylist(), t["cluster_id"].to_pylist()))
    assert cl["sw_0001"] == cl["sw_0002"]            # jaccard alone links them
    e = _collect(res_off.edges)
    assert (np.asarray(e["lcs_ratio"].to_numpy()) == -1.0).all()   # not computed

    cfg_on = base.with_(substring_check=True, substring_min_ratio=0.9)
    res_on = run_dedup(rd.read_parquet(p), cfg_on, num_partitions=2)
    t2 = _collect(res_on.assignments)
    cl2 = dict(zip(t2["clip_id"].to_pylist(), t2["cluster_id"].to_pylist()))
    assert cl2["sw_0001"] != cl2["sw_0002"]          # LCS gate rejects the edge

    # report-only mode: edges keep the pair but carry the measured ratio
    cfg_rep = base.with_(substring_check=True, substring_min_ratio=0.0)
    res_rep = run_dedup(rd.read_parquet(p), cfg_rep, num_partitions=2)
    e3 = _collect(res_rep.edges)
    by_pair = {
        (a, b): r for a, b, r in zip(
            e3["clip_id_a"].to_pylist(), e3["clip_id_b"].to_pylist(),
            e3["lcs_ratio"].to_pylist(),
        )
    }
    r = by_pair[("sw_0001", "sw_0002")]
    assert 0.3 < r < 0.7, r

    # the shuffle (at-scale) path applies the same gate
    res_shuf = run_dedup(
        rd.read_parquet(p),
        cfg_on.with_(broadcast_verify_max_rows=0),
        num_partitions=2,
    )
    t4 = _collect(res_shuf.assignments)
    cl4 = dict(zip(t4["clip_id"].to_pylist(), t4["cluster_id"].to_pylist()))
    assert cl4 == cl2


def test_simhash_max_hamming_drives_chunk_count(ray_session, tmp_path):
    """simhash_max_hamming=d → d+1 chunk band rows per doc (pigeonhole
    guarantee wiring)."""
    import ray.data as rd

    from minhash_ray.stages.banding import make_simhash_band_fn

    rng = np.random.default_rng(8)
    rows = [
        _clip(f"sh_{i:04d}", f"some words about topic number {i} and more filler", rng.bytes(2000))
        for i in range(4)
    ]
    p = _write_clips(tmp_path, rows, name="shh")
    cfg = PipelineConfig(signature_concurrency=1)
    res = run_dedup(rd.read_parquet(p), cfg, num_partitions=2)
    sig = res.signatures
    for d in (1, 3, 7):
        out = _collect(sig.map_batches(make_simhash_band_fn(d + 1), batch_format="pyarrow"))
        assert out.num_rows == 4 * (d + 1)


# ---------------------------------------------------------------------------
# hot-bucket salting (exercised explicitly: fixtures never cross the
# default hot threshold, and cold corpora now skip the salt pass entirely)


def test_hot_bucket_salting_preserves_connectivity(ray_session, tmp_path):
    """200 clips sharing one transcript (one hot band bucket per band) with
    distinct audio: salting splits the bucket into sub-buckets, the
    representative pass restores cross-salt connectivity, and all copies
    land in ONE cluster."""
    import ray.data as rd

    rng = np.random.default_rng(33)
    shared = "the exact same transcript repeated across many many clips today"
    rows = [
        _clip(f"hot_{i:05d}", shared, rng.bytes(3000)) for i in range(200)
    ] + [
        _clip("cold_99999", "a lone unrelated transcript sits here quietly",
              rng.bytes(3000))
    ]
    p = _write_clips(tmp_path, rows, name="hot")
    cfg = PipelineConfig(
        signature_concurrency=1,
        hot_band_threshold=64,
        band_group_cap=32,
        use_exact_channel=False,     # force the salted text channel to do the work
        use_audio_channel=False,
    )
    res = run_dedup(rd.read_parquet(p), cfg, num_partitions=2)
    t = _collect(res.assignments)
    cl = dict(zip(t["clip_id"].to_pylist(), t["cluster_id"].to_pylist()))
    hot_clusters = {cl[f"hot_{i:05d}"] for i in range(200)}
    assert hot_clusters == {"hot_00000"}, len(hot_clusters)
    assert cl["cold_99999"] == "cold_99999"


# ---------------------------------------------------------------------------
# checkpoint retention (reference garbage_collector_list analogue,
# src/fcds/minhash-fcds.c:401-433 — drop unreferenced versions)


def test_checkpoint_prune_other_configs(ray_session, tmp_path):
    import os

    import ray.data as rd

    from minhash_ray.stages.cluster import ASSIGN_SCHEMA
    from minhash_ray.state.checkpoint import CheckpointManager

    root = str(tmp_path / "ck")
    cfg_a = PipelineConfig()
    cfg_b = PipelineConfig(shingle_w=4)
    ds = rd.from_arrow(
        pa.table({"clip_id": ["a"], "cluster_id": ["a"]}, schema=ASSIGN_SCHEMA)
    )
    mgr_a = CheckpointManager(root, cfg_a)
    mgr_a.save("assignments", ds, input_stage="edges", schema=ASSIGN_SCHEMA)
    mgr_b = CheckpointManager(root, cfg_b)
    mgr_b.save("assignments", ds, input_stage="edges", schema=ASSIGN_SCHEMA)
    assert mgr_a.is_complete("assignments") and mgr_b.is_complete("assignments")

    # retention: keep only the current config's versions
    mgr_b.prune_other_configs()
    assert mgr_b.is_complete("assignments")
    assert sorted(os.listdir(root)) == [cfg_b.config_hash()]
    assert not mgr_a.is_complete("assignments")   # existing handle: pruned


# ---------------------------------------------------------------------------
# the full 10^12 configuration: every driver-side shortcut disabled


def test_all_distributed_paths_equal_driver_paths(ray_session, small_fixture):
    """Force the complete at-scale configuration in one run — Dataset.join
    candidate backend, global pair dedupe, join-based verify, distributed
    exact channel + hot-bucket counting (driver_agg_max_rows=0), and
    min-label-propagation clustering (driver_uf_max_edges=0) — and require
    cluster assignments identical to the default (driver-shortcut) paths."""
    import ray.data as rd

    base = PipelineConfig(signature_concurrency=2)
    ds1 = rd.read_parquet(str(small_fixture / "clips.parquet"))
    res_default = run_dedup(ds1, base, num_partitions=4)

    scale_cfg = base.with_(
        candidate_backend="join",
        pair_dedupe="global",
        broadcast_verify_max_rows=0,
        driver_uf_max_edges=0,
        driver_agg_max_rows=0,
    )
    ds2 = rd.read_parquet(str(small_fixture / "clips.parquet"))
    res_scale = run_dedup(ds2, scale_cfg, num_partitions=4)

    def assign_map(res):
        t = _collect(res.assignments)
        return dict(zip(t["clip_id"].to_pylist(), t["cluster_id"].to_pylist()))

    assert assign_map(res_scale) == assign_map(res_default)

    def uniq_edges(res):
        t = _collect(res.edges)
        return {
            (a, b, ch) for a, b, ch in zip(
                t["clip_id_a"].to_pylist(), t["clip_id_b"].to_pylist(),
                t["channel"].to_pylist(),
            )
        }

    assert uniq_edges(res_scale) == uniq_edges(res_default)

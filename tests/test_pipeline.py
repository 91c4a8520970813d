"""End-to-end pipeline tests on the planted-duplicate fixture: recall gate,
permutation/parallelism invariance, empty-transcript hygiene, checkpoint
resume, per-row invariants (SNR + transcript equality)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from minhash_ray.config import PipelineConfig
from minhash_ray.functions.audio import decode_pcm, snr_db
from minhash_ray.oracle import oracle_signature
from minhash_ray.pipelines.dedup import dedup_metrics, run_dedup
from minhash_ray.stages.signature import signature_matrix


@pytest.fixture(scope="module")
def result(ray_session, small_fixture):
    import ray.data as rd

    cfg = PipelineConfig(signature_concurrency=2)
    ds = rd.read_parquet(str(small_fixture / "clips.parquet"))
    res = run_dedup(ds, cfg, num_partitions=4)
    return cfg, small_fixture, res


def _collect(ds) -> pa.Table:
    return pa.concat_tables(
        list(ds.iter_batches(batch_size=65536, batch_format="pyarrow"))
    )


def test_signatures_match_oracle_exactly(result):
    """The reference's validation standard: engine (parallel) signatures ==
    oracle (serial) signatures, exact uint64 equality
    (cf. test/test_parallel_lock.c:47-57)."""
    cfg, fixture, res = result
    sig_t = _collect(res.signatures)
    clips = pq.read_table(str(fixture / "clips.parquet"))
    text_of = dict(zip(clips["clip_id"].to_pylist(), clips["transcript"].to_pylist()))
    sigs = signature_matrix(sig_t, cfg.num_perm)
    ids = sig_t["clip_id"].to_pylist()
    sample = list(range(0, len(ids), 7))
    for i in sample:
        assert np.array_equal(sigs[i], oracle_signature(text_of[ids[i]], cfg))


def test_recall_and_precision_gate(result):
    cfg, fixture, res = result
    m = dedup_metrics(res.assignments, str(fixture / "truth_pairs.parquet"), cfg)
    assert m["recall_gated"] >= 0.99, m
    assert m["precision"] >= 0.95, m


def test_assignments_cover_every_clip_exactly_once(result):
    cfg, fixture, res = result
    t = _collect(res.assignments)
    clips = pq.read_table(str(fixture / "clips.parquet"))
    assert sorted(t["clip_id"].to_pylist()) == sorted(clips["clip_id"].to_pylist())
    # canonical representative: cluster_id is the min clip_id of its members
    from collections import defaultdict

    members = defaultdict(list)
    for cid, cl in zip(t["clip_id"].to_pylist(), t["cluster_id"].to_pylist()):
        members[cl].append(cid)
    for cl, ids in members.items():
        assert cl == min(ids)


def test_empty_transcripts_do_not_cross_match(result):
    """Zero-shingle rows (all-INFTY sketches) must not band-match each other
    (reference INFTY semantics, src/configuration/configuration.c:143-148)."""
    cfg, fixture, res = result
    clips = pq.read_table(str(fixture / "clips.parquet"))
    t = _collect(res.assignments)
    cluster_of = dict(zip(t["clip_id"].to_pylist(), t["cluster_id"].to_pylist()))
    empties = [
        cid
        for cid, tx in zip(clips["clip_id"].to_pylist(), clips["transcript"].to_pylist())
        if len((tx or "").split()) < 3
    ]
    assert len(empties) >= 2
    # each adversarial empty has unique audio → all must stay singletons
    clusters = [cluster_of[c] for c in empties]
    assert len(set(clusters)) == len(clusters)


def test_per_row_invariants_snr_and_transcript(result):
    """input_hint invariant: decoded PCM unchanged through the pipeline
    (allclose / SNR >= 30dB is trivially infinite here since stage V never
    rewrites bytes — asserted by re-decoding the source) and transcript
    equality between input and validated output."""
    cfg, fixture, res = result
    clips = pq.read_table(str(fixture / "clips.parquet"))
    v = _collect(res.validated)
    tx_in = dict(zip(clips["clip_id"].to_pylist(), clips["transcript"].to_pylist()))
    for cid, tx in zip(v["clip_id"].to_pylist(), v["transcript"].to_pylist()):
        assert tx == tx_in[cid]
    # decode round-trip: payload → waveform → payload is bit-identical
    from minhash_ray.functions.audio import encode_pcm

    for payload in clips["bytes"].to_pylist()[:10]:
        wave = decode_pcm(payload, "pcm_s16le")
        assert encode_pcm(wave) == payload
        assert snr_db(wave, wave) == float("inf")


def test_parallelism_and_block_invariance(ray_session, small_fixture):
    """Permutation invariance — the reference's core oracle idea: any
    partitioning / ordering must yield identical signatures and clusters
    (min-fold commutativity, src/utils/utils.c:3-46)."""
    import ray.data as rd

    cfg = PipelineConfig(signature_concurrency=2)
    base = rd.read_parquet(str(small_fixture / "clips.parquet"))
    res1 = run_dedup(base, cfg, num_partitions=4)
    shuffled = (
        rd.read_parquet(str(small_fixture / "clips.parquet"))
        .random_shuffle(seed=7)
        .repartition(13)
    )
    res2 = run_dedup(shuffled, cfg.with_(signature_concurrency=1, batch_size=97), num_partitions=3)

    def assign_map(res):
        t = _collect(res.assignments)
        return dict(zip(t["clip_id"].to_pylist(), t["cluster_id"].to_pylist()))

    def sig_map(res):
        t = _collect(res.signatures)
        mat = signature_matrix(t, cfg.num_perm)
        return {cid: mat[i].tobytes() for i, cid in enumerate(t["clip_id"].to_pylist())}

    assert sig_map(res1) == sig_map(res2)
    assert assign_map(res1) == assign_map(res2)


def test_checkpoint_resume(ray_session, small_fixture, tmp_path):
    """Kill-and-resume: a second run with a complete checkpoint tree must
    reuse every stage (manifest hit) and produce identical output."""
    import ray.data as rd

    from minhash_ray.state.checkpoint import CheckpointManager

    cfg = PipelineConfig(signature_concurrency=2)
    ckpt_root = str(tmp_path / "ckpt")
    ds = rd.read_parquet(str(small_fixture / "clips.parquet"))
    res1 = run_dedup(ds, cfg, ckpt_root=ckpt_root, num_partitions=4)
    a1 = _collect(res1.assignments)

    mgr = CheckpointManager(ckpt_root, cfg)
    for stage in ("signatures", "edges", "assignments"):
        assert mgr.is_complete(stage), stage
        m = mgr.manifest(stage)
        assert m["config_hash"] == cfg.config_hash()
        assert m["rows"] > 0 and m["partitions"]

    # resume must NOT recompute: feed a poisoned input — any recomputation
    # would crash on schema validation, checkpoints make it moot
    poisoned = ds.map_batches(lambda t: t.slice(0, 1), batch_format="pyarrow")
    res2 = run_dedup(poisoned, cfg, ckpt_root=ckpt_root, num_partitions=4)
    a2 = _collect(res2.assignments)
    assert sorted(a1.to_pylist(), key=lambda r: r["clip_id"]) == sorted(
        a2.to_pylist(), key=lambda r: r["clip_id"]
    )

    # a different semantic config must NOT reuse those checkpoints
    assert not CheckpointManager(ckpt_root, cfg.with_(shingle_w=4)).is_complete("signatures")


def test_label_propagation_matches_union_find(ray_session, small_fixture):
    """Distributed min-label propagation (scale path) == driver union-find."""
    import ray.data as rd

    cfg = PipelineConfig(signature_concurrency=2)
    ds = rd.read_parquet(str(small_fixture / "clips.parquet"))
    res = run_dedup(ds, cfg, num_partitions=4)
    from minhash_ray.stages.cluster import components_driver, components_label_propagation

    edges = res.edges.materialize()
    uf = components_driver(edges)
    lp_t = _collect(components_label_propagation(edges, num_partitions=4))
    lp = dict(zip(lp_t["clip_id"].to_pylist(), lp_t["cluster_id"].to_pylist()))
    assert lp == uf


def test_audio_byte_channel_links_same_audio_different_transcript(ray_session, tmp_path):
    """Byte-level audio MinHash channel: clips sharing a byte-identical
    payload but unrelated transcripts must cluster together (the
    'byte-level audio fingerprints' channel of the north star)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    from minhash_ray.functions.audio import encode_pcm, synth_waveform

    rng = np.random.default_rng(5)
    waves = [synth_waveform(rng, 8000, 800) for _ in range(6)]
    rows = []
    # pairs (0,1), (2,3): same audio, different transcripts; 4,5 singles
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight nine ten",
        "lorem ipsum dolor sit amet consectetur adipiscing elit",
        "pack my box with five dozen liquor jugs today again",
        "unique text number five stands completely alone here",
        "unique text number six stands completely alone here too",
    ]
    audio = [waves[0], waves[0], waves[1], waves[1], waves[2], waves[3]]
    for i, (t, w) in enumerate(zip(texts, audio)):
        rows.append(
            {
                "clip_id": f"clip_{i:08d}",
                "bytes": encode_pcm(w),
                "sr_hz": 8000,
                "dur_ms": 800,
                "codec": "pcm_s16le",
                "transcript": t,
            }
        )
    from minhash_ray.sources.clips import CLIPS_SCHEMA

    t = pa.Table.from_pylist(rows, schema=CLIPS_SCHEMA)
    p = tmp_path / "aud"
    p.mkdir()
    pq.write_table(t, str(p / "clips.parquet"))

    cfg = PipelineConfig(signature_concurrency=1)
    res = run_dedup(rd.read_parquet(str(p / "clips.parquet")), cfg, num_partitions=2)
    tbl = pa.concat_tables(
        list(res.assignments.iter_batches(batch_size=4096, batch_format="pyarrow"))
    )
    cl = dict(zip(tbl["clip_id"].to_pylist(), tbl["cluster_id"].to_pylist()))
    assert cl["clip_00000000"] == cl["clip_00000001"]
    assert cl["clip_00000002"] == cl["clip_00000003"]
    assert cl["clip_00000000"] != cl["clip_00000002"]
    assert cl["clip_00000004"] != cl["clip_00000005"]

    # with the channel off, the same pairs must NOT link (transcripts differ)
    res2 = run_dedup(
        rd.read_parquet(str(p / "clips.parquet")),
        cfg.with_(use_audio_channel=False),
        num_partitions=2,
    )
    tbl2 = pa.concat_tables(
        list(res2.assignments.iter_batches(batch_size=4096, batch_format="pyarrow"))
    )
    cl2 = dict(zip(tbl2["clip_id"].to_pylist(), tbl2["cluster_id"].to_pylist()))
    assert cl2["clip_00000000"] != cl2["clip_00000001"]


def test_partial_checkpoint_resume(ray_session, small_fixture, tmp_path):
    """Mid-pipeline resume: with only the signatures checkpoint published
    (job 'killed' before edges), a resumed run must reuse signatures (its
    manifest mtime is untouched) and recompute the rest to the same
    result."""
    import os
    import shutil

    import ray.data as rd

    from minhash_ray.state.checkpoint import CheckpointManager

    cfg = PipelineConfig(signature_concurrency=2)
    ckpt_root = str(tmp_path / "ckpt")
    ds = rd.read_parquet(str(small_fixture / "clips.parquet"))
    res_full = run_dedup(ds, cfg, ckpt_root=ckpt_root, num_partitions=4)
    full = sorted(_collect(res_full.assignments).to_pylist(), key=lambda r: r["clip_id"])

    # simulate a crash after stage S: drop edges + assignments checkpoints
    mgr = CheckpointManager(ckpt_root, cfg)
    shutil.rmtree(mgr.stage_dir("edges"))
    shutil.rmtree(mgr.stage_dir("assignments"))
    sig_manifest = os.path.join(mgr.stage_dir("signatures"), "manifest.json")
    mtime_before = os.path.getmtime(sig_manifest)

    res2 = run_dedup(ds, cfg, ckpt_root=ckpt_root, num_partitions=4)
    resumed = sorted(_collect(res2.assignments).to_pylist(), key=lambda r: r["clip_id"])
    assert resumed == full
    assert os.path.getmtime(sig_manifest) == mtime_before   # not recomputed
    assert mgr.is_complete("edges") and mgr.is_complete("assignments")

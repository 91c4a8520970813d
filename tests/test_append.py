"""Incremental append mode: sketch only the new partition, extend the
signature/edge checkpoints by part appends, recluster — final assignments
must equal a single-shot run over the full corpus (the reference's
insert-while-query contract, test/fcds/test_fixed_queries_infinite_write.c)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from minhash_ray.config import PipelineConfig
from minhash_ray.pipelines.dedup import append_clips, run_dedup
from minhash_ray.state.checkpoint import CheckpointManager


def _collect(ds) -> pa.Table:
    return pa.concat_tables(list(ds.iter_batches(batch_size=65536, batch_format="pyarrow")))


def _assign_map(res) -> dict:
    t = _collect(res.assignments)
    return dict(zip(t["clip_id"].to_pylist(), t["cluster_id"].to_pylist()))


def test_append_equals_single_shot(ray_session, small_fixture, tmp_path):
    import ray.data as rd

    cfg = PipelineConfig(signature_concurrency=2)
    full = pq.read_table(str(small_fixture / "clips.parquet"))

    # split interleaved so planted dup pairs straddle the halves
    idx = np.arange(full.num_rows)
    first = full.take(pa.array(idx[idx % 2 == 0]))
    second = full.take(pa.array(idx[idx % 2 == 1]))
    d = tmp_path / "parts"
    d.mkdir()
    pq.write_table(first, str(d / "first.parquet"))
    pq.write_table(second, str(d / "second.parquet"))

    # single-shot truth over the full table
    res_full = run_dedup(
        rd.read_parquet(str(small_fixture / "clips.parquet")), cfg, num_partitions=4
    )
    want = _assign_map(res_full)

    # run on the first half with checkpoints, then append the second half
    root = str(tmp_path / "ckpt")
    res_half = run_dedup(
        rd.read_parquet(str(d / "first.parquet")), cfg, ckpt_root=root, num_partitions=4
    )
    assert len(_assign_map(res_half)) == first.num_rows

    sig_manifest_rows_before = CheckpointManager(root, cfg).manifest("signatures")["rows"]
    res_app = append_clips(
        rd.read_parquet(str(d / "second.parquet")), cfg, ckpt_root=root, num_partitions=4
    )
    got = _assign_map(res_app)

    assert got == want

    # checkpoints were extended, not rebuilt
    mgr = CheckpointManager(root, cfg)
    m = mgr.manifest("signatures")
    assert m["rows"] == full.num_rows
    assert m["rows"] > sig_manifest_rows_before
    assert any(p["file"].startswith("append-") for p in m["partitions"])
    assert mgr.is_complete("edges") and mgr.is_complete("assignments")

    # a later resume of the merged corpus reuses the appended checkpoints
    res_resume = run_dedup(
        rd.read_parquet(str(small_fixture / "clips.parquet")), cfg,
        ckpt_root=root, num_partitions=4,
    )
    assert _assign_map(res_resume) == want


def test_append_requires_complete_checkpoint(ray_session, small_fixture, tmp_path):
    import pytest

    import ray.data as rd

    cfg = PipelineConfig(signature_concurrency=2)
    with pytest.raises(ValueError, match="complete"):
        append_clips(
            rd.read_parquet(str(small_fixture / "clips.parquet")),
            cfg, ckpt_root=str(tmp_path / "nope"), num_partitions=2,
        )


def test_append_rejects_overlapping_clip_ids(ray_session, small_fixture, tmp_path):
    """Re-appending an already-ingested partition must raise BEFORE any
    checkpoint mutation (silent duplicate rows would corrupt all later
    runs)."""
    import pytest

    import ray.data as rd

    cfg = PipelineConfig(signature_concurrency=2)
    sub = pq.read_table(str(small_fixture / "clips.parquet")).slice(0, 60)
    p = tmp_path / "sub.parquet"
    pq.write_table(sub, str(p))
    root = str(tmp_path / "ckpt")
    run_dedup(rd.read_parquet(str(p)), cfg, ckpt_root=root, num_partitions=2)

    rows_before = CheckpointManager(root, cfg).manifest("signatures")["rows"]
    with pytest.raises(ValueError, match="already exists"):
        append_clips(rd.read_parquet(str(p)), cfg, ckpt_root=root, num_partitions=2)
    # the failed append left the checkpoint untouched
    assert CheckpointManager(root, cfg).manifest("signatures")["rows"] == rows_before


def test_load_ignores_unlisted_parts_and_reconciliation_removes_them(
    ray_session, small_fixture, tmp_path
):
    """The manifest rename is the commit point: a part file renamed into
    the live dir by a crashed append (never listed in the manifest) is
    invisible to load() and deleted by clear_stale_temps."""
    import os

    import ray.data as rd

    cfg = PipelineConfig(signature_concurrency=2)
    sub = pq.read_table(str(small_fixture / "clips.parquet")).slice(0, 40)
    p = tmp_path / "sub.parquet"
    pq.write_table(sub, str(p))
    root = str(tmp_path / "ckpt")
    run_dedup(rd.read_parquet(str(p)), cfg, ckpt_root=root, num_partitions=2)

    mgr = CheckpointManager(root, cfg)
    rows = mgr.manifest("signatures")["rows"]
    stage_dir = mgr.stage_dir("signatures")
    listed = sorted(os.listdir(stage_dir))
    # simulate a crash mid-append: an orphan part lands in the live dir
    orphan = os.path.join(stage_dir, "append-deadbeef-00000.parquet")
    first_part = next(f for f in listed if f.endswith(".parquet"))
    import shutil

    shutil.copyfile(os.path.join(stage_dir, first_part), orphan)

    assert mgr.load("signatures").count() == rows       # orphan invisible
    mgr.clear_stale_temps()
    assert not os.path.exists(orphan)                   # orphan reconciled away
    assert mgr.load("signatures").count() == rows

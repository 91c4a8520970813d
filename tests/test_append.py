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


def _canon_df(d):
    return d.sort_values(list(d.columns)).reset_index(drop=True)


def test_doc_tiered_append_equals_single_shot(ray_session, sf_dir, tmp_path):
    """Half the documents table checkpointed, the other half appended:
    assignments equal the single-shot run exactly — only new exact-tier
    reps are sketched, old pairs load from the checkpoint, and old docs
    re-route through their previous cluster roots without re-reading
    the old corpus."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd

    from minhash_ray.pipelines.dedup_text import (
        doc_dedup_tiered,
        doc_dedup_tiered_append,
    )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def rng(lo, hi):
        return docs.map_batches(
            lambda b: b.filter(
                pc.and_(
                    pc.greater_equal(b.column("doc_id"), lo),
                    pc.less(b.column("doc_id"), hi),
                )
            ),
            batch_format="pyarrow",
        )

    full = _canon_df(doc_dedup_tiered(sf_dir).to_pandas())
    ck = str(tmp_path / "dck")
    doc_dedup_tiered(sf_dir, docs=rng(0, 250), ckpt_root=ck).to_pandas()
    out = _canon_df(
        doc_dedup_tiered_append(rng(250, 1 << 40), ckpt_root=ck).to_pandas()
    )
    assert out.equals(full)


def test_doc_tiered_append_rename_and_near_dup(ray_session, tmp_path):
    """Appended docs with SMALLER ids that exactly copy existing texts
    force rep renames (min-fold determinism), and a near-dup new text
    exercises the restricted near tier — still equal to single-shot."""
    import pyarrow as pa

    import ray.data as rd

    from minhash_ray.pipelines.dedup_text import (
        doc_dedup_tiered,
        doc_dedup_tiered_append,
    )

    base = [f"the quick brown fox jumps over dog number {i} " * 6 for i in range(20)]
    old_tbl = pa.table(
        {"doc_id": pa.array(range(100, 120), pa.int64()),
         "text": pa.array(base, pa.string())}
    )
    new_tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [base[0], base[5], base[2] + "extra tail words here"], pa.string()
            ),
        }
    )
    ck = str(tmp_path / "rck")
    doc_dedup_tiered("", docs=rd.from_arrow(old_tbl), ckpt_root=ck).to_pandas()
    out = _canon_df(
        doc_dedup_tiered_append(rd.from_arrow(new_tbl), ckpt_root=ck).to_pandas()
    )
    full = _canon_df(
        doc_dedup_tiered("", docs=rd.from_arrow(pa.concat_tables([old_tbl, new_tbl]))).to_pandas()
    )
    assert out.equals(full)
    # the copied group's keep flag moved to the new smaller id
    assert int(out[out.doc_id == 1].keep.iloc[0]) == 1
    assert int(out[out.doc_id == 100].keep.iloc[0]) == 0
    assert int(out[out.doc_id == 100].cluster_id.iloc[0]) == 1


def test_doc_tiered_append_rejects_overlap_and_incomplete(ray_session, tmp_path):
    import pyarrow as pa
    import pytest

    import ray.data as rd

    from minhash_ray.pipelines.dedup_text import (
        doc_dedup_tiered,
        doc_dedup_tiered_append,
    )

    tbl = pa.table(
        {"doc_id": pa.array([1, 2, 3], pa.int64()),
         "text": pa.array(["aa bb cc dd", "ee ff gg hh", "ii jj kk ll"], pa.string())}
    )
    ck = str(tmp_path / "ock")
    with pytest.raises(ValueError, match="complete"):
        doc_dedup_tiered_append(rd.from_arrow(tbl), ckpt_root=ck)
    doc_dedup_tiered("", docs=rd.from_arrow(tbl), ckpt_root=ck).to_pandas()
    with pytest.raises(ValueError, match="already"):
        doc_dedup_tiered_append(rd.from_arrow(tbl.slice(0, 1)), ckpt_root=ck)


def test_docs_cli_run_and_append(tmp_path):
    """--docs CLI smoke: fresh run publishes checkpoints, --append merges
    a JSONL partition; counts line up (subprocess: the CLI owns its Ray
    session)."""
    import json
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    words = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()
    base = [
        " ".join(f"{w}{i}" for w in words) + f" distinct body {i} " + " ".join(
            f"{w}x{(i * 7 + j) % 97}" for j, w in enumerate(words)
        )
        for i in range(10)
    ]
    d = tmp_path / "in"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(10), pa.int64()),
                  "text": pa.array(base, pa.string())}),
        str(d / "docs.parquet"),
    )
    with open(d / "new.jsonl", "w") as f:
        for i in range(3):
            f.write(json.dumps({"doc_id": 100 + i, "text": base[i]}) + "\n")

    def run(*extra):
        cp = subprocess.run(
            [sys.executable, "-m", "minhash_ray.cli", "--docs",
             "--output", str(tmp_path / "out"), "--checkpoint", str(tmp_path / "ck"),
             "--num-cpus", "4", *extra],
            capture_output=True, text=True, cwd="/root/repo", timeout=600,
        )
        assert cp.returncode == 0, cp.stderr[-2000:]
        return json.loads(cp.stdout.strip().splitlines()[-1])

    first = run("--input", str(d / "docs.parquet"))
    assert first["docs"] == 10
    second = run("--append", "--input", str(d / "new.jsonl"))
    # 3 appended docs are exact copies of existing texts -> docs grow,
    # kept stays exactly what the first run kept
    assert second["docs"] == 13 and second["kept"] == first["kept"]


def test_doc_tiered_append_crash_resume_rolls_forward(ray_session, tmp_path):
    """Epoch protocol: a crash after ANY prefix of the append's stage
    saves (plan only / +tier1 / +sigs / +pairs) rolls forward on rerun to
    the exact completed-append state — including the rename-forcing case
    where a naive rerun would strand stale rep ids in the old pairs."""
    import os
    import shutil

    import pyarrow as pa
    import pytest

    import ray.data as rd

    from minhash_ray.config import PipelineConfig
    from minhash_ray.pipelines.dedup_text import (
        DOC_CFG,
        doc_dedup_tiered,
        doc_dedup_tiered_append,
    )
    from minhash_ray.state.checkpoint import CheckpointManager

    base = [f"the quick brown fox jumps over dog number {i} " * 6 for i in range(20)]
    old_tbl = pa.table(
        {"doc_id": pa.array(range(100, 120), pa.int64()),
         "text": pa.array(base, pa.string())}
    )
    # smaller ids copying old texts -> renames; one near-dup -> new pairs
    new_tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [base[0], base[5], base[2] + "extra tail words here"], pa.string()
            ),
        }
    )

    ck = str(tmp_path / "eck")
    doc_dedup_tiered("", docs=rd.from_arrow(old_tbl), ckpt_root=ck).to_pandas()
    backup = str(tmp_path / "backup")
    shutil.copytree(ck, backup)

    expected = (
        doc_dedup_tiered_append(rd.from_arrow(new_tbl), ckpt_root=ck)
        .to_pandas()
        .sort_values(["doc_id"])
        .reset_index(drop=True)
    )
    final = str(tmp_path / "final")
    shutil.copytree(ck, final)
    mgr = CheckpointManager(ck, DOC_CFG)

    def restore(stages_from_final):
        shutil.rmtree(ck)
        shutil.copytree(backup, ck)
        for s in stages_from_final:
            dst = mgr.stage_dir(s)
            src = CheckpointManager(final, DOC_CFG).stage_dir(s)
            if os.path.exists(dst):
                shutil.rmtree(dst)
            shutil.copytree(src, dst)

    crash_points = [
        ["append_plan"],
        ["append_plan", "tier1_reps"],
        ["append_plan", "tier1_reps", "tier2_sigs"],
        ["append_plan", "tier1_reps", "tier2_sigs", "tier2_pairs"],
    ]
    for stages in crash_points:
        restore(stages)
        out = (
            doc_dedup_tiered_append(rd.from_arrow(new_tbl), ckpt_root=ck)
            .to_pandas()
            .sort_values(["doc_id"])
            .reset_index(drop=True)
        )
        assert out.equals(expected), f"crash after {stages[-1]} diverged"

    # resuming with a DIFFERENT new partition is rejected
    restore(["append_plan", "tier1_reps"])
    other = pa.table(
        {"doc_id": pa.array([7], pa.int64()), "text": pa.array(["zzz"], pa.string())}
    )
    with pytest.raises(ValueError, match="differs"):
        doc_dedup_tiered_append(rd.from_arrow(other), ckpt_root=ck)

    # a completed append re-run with the same input fails disjointness
    restore(["append_plan", "tier1_reps", "tier2_sigs", "tier2_pairs", "tier3_assign"])
    with pytest.raises(ValueError, match="already"):
        doc_dedup_tiered_append(rd.from_arrow(new_tbl), ckpt_root=ck)


def test_doc_tiered_append_twice(ray_session, tmp_path):
    """Two successive appends (epoch 1 then epoch 2) equal single-shot
    over all three partitions — the steady-state ingest loop."""
    import pyarrow as pa

    import ray.data as rd

    from minhash_ray.pipelines.dedup_text import (
        doc_dedup_tiered,
        doc_dedup_tiered_append,
    )

    base = [f"unique seed document text number {i} with words " * 5 for i in range(12)]
    p1 = pa.table({"doc_id": pa.array(range(0, 6), pa.int64()),
                   "text": pa.array(base[:6], pa.string())})
    p2 = pa.table({"doc_id": pa.array(range(100, 104), pa.int64()),
                   "text": pa.array([base[0], base[6], base[7], base[1] + " tail"], pa.string())})
    p3 = pa.table({"doc_id": pa.array(range(200, 203), pa.int64()),
                   "text": pa.array([base[6], base[8], base[2]], pa.string())})

    ck = str(tmp_path / "tck")
    doc_dedup_tiered("", docs=rd.from_arrow(p1), ckpt_root=ck).to_pandas()
    doc_dedup_tiered_append(rd.from_arrow(p2), ckpt_root=ck).to_pandas()
    out = _canon_df(
        doc_dedup_tiered_append(rd.from_arrow(p3), ckpt_root=ck).to_pandas()
    )
    full = _canon_df(
        doc_dedup_tiered(
            "", docs=rd.from_arrow(pa.concat_tables([p1, p2, p3]))
        ).to_pandas()
    )
    assert out.equals(full)


def test_compact_merges_parts_and_preserves_rows(ray_session, tmp_path):
    """compact() rewrites an append-fragmented checkpoint into the target
    part count with identical content, surviving manifest lineage
    (input_stage, compacted_from), and stays loadable/complete."""
    import ray.data as rd

    cfg = PipelineConfig()
    mgr = CheckpointManager(str(tmp_path / "ck"), cfg)

    def tbl(lo, hi):
        return pa.table(
            {
                "k": pa.array(range(lo, hi), pa.int64()),
                "v": pa.array([f"v{i}" for i in range(lo, hi)], pa.string()),
            }
        )

    mgr.save("stage", rd.from_arrow(tbl(0, 100)), input_stage="input")
    for j in range(3):
        mgr.append_parts("stage", rd.from_arrow(tbl(100 + j * 50, 150 + j * 50)))
    m = mgr.manifest("stage")
    assert len(m["partitions"]) >= 4 and m["rows"] == 250
    before = _collect(mgr.load("stage")).sort_by("k")

    mgr.compact("stage", target_rows_per_part=1_000_000)
    m2 = mgr.manifest("stage")
    assert len(m2["partitions"]) == 1
    assert m2["rows"] == 250
    assert m2["input_stage"] == "input"
    assert m2["compacted_from"] >= 4
    assert mgr.is_complete("stage")
    after = _collect(mgr.load("stage")).sort_by("k")
    assert before.equals(after)

    # re-appending after compaction still works
    mgr.append_parts("stage", rd.from_arrow(tbl(250, 260)))
    assert mgr.manifest("stage")["rows"] == 260

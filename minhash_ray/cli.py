"""Job entry point — the ``ray job submit`` surface of the engine.

    python -m minhash_ray.cli --input /path/clips_parquet_or_lance \
        --output /path/out --checkpoint /path/ckpt \
        [--truth /path/truth_pairs.parquet] [--num-perm 128] [--tau 0.5] ...

Reads the clips table, runs the full near-dup pipeline (resuming from the
checkpoint root when present), writes cluster assignments + edges as
partitioned Parquet, and prints a one-line JSON result with row counts and
(when ground truth is supplied) recall/precision metrics.

Owns its Ray session (guarded — under ``ray job submit`` the driver may
already have initialised Ray).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", default=None,
                    help="clips table (parquet dir/file or lance); required "
                         "except in --compact maintenance mode")
    ap.add_argument("--output", default=None,
                    help="output directory; required except in --compact mode")
    ap.add_argument("--checkpoint", default=None, help="checkpoint root (enables resume)")
    ap.add_argument("--truth", default=None, help="truth_pairs.parquet for metrics")
    ap.add_argument("--num-perm", type=int, default=128)
    ap.add_argument("--bands", type=int, default=32)
    ap.add_argument("--rows-per-band", type=int, default=4)
    ap.add_argument("--shingle-w", type=int, default=3)
    ap.add_argument("--tau", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--num-partitions", type=int, default=32)
    ap.add_argument("--no-audio-channel", action="store_true")
    ap.add_argument("--append", action="store_true",
                    help="treat --input as a NEW clips partition and merge it "
                         "into the existing --checkpoint corpus (old clips are "
                         "not re-sketched; signature/edge checkpoints are "
                         "extended by atomic part appends)")
    ap.add_argument("--docs", action="store_true",
                    help="run the DOCUMENT tiered dedup pipeline instead of "
                         "the clips flagship: --input is a documents table "
                         "(doc_id, text; parquet/jsonl/csv auto-detected); "
                         "with --append, --input is a NEW documents partition "
                         "merged into the --checkpoint corpus "
                         "(doc_dedup_tiered_append)")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU count (omit under ray job submit)")
    ap.add_argument("--compact", action="store_true",
                    help="maintenance mode: compact every complete stage of "
                         "the --checkpoint corpus (merge append-fragmented "
                         "part files; no pipeline run)")
    ap.add_argument("--diff-against", default=None, metavar="OLD_ROOT",
                    help="maintenance mode: diff the --checkpoint corpus's "
                         "cluster assignments against an OLDER checkpoint "
                         "root (same config); writes changed rows (added / "
                         "removed / moved) to --output as partitioned "
                         "parquet and prints per-status counts")
    ap.add_argument("--target-rows-per-part", type=int, default=1_000_000,
                    help="compaction target part size (rows)")
    args = ap.parse_args(argv)
    maintenance = args.compact or args.diff_against
    if not maintenance and not args.input:
        ap.error("--input is required (except in maintenance modes)")
    if not args.compact and not args.output:
        ap.error("--output is required (except with --compact)")
    if maintenance and not args.checkpoint:
        ap.error("maintenance modes require --checkpoint")

    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from minhash_ray.config import PipelineConfig
    from minhash_ray.pipelines.dedup import append_clips, dedup_metrics, run_dedup
    from minhash_ray.sources.clips import read_clips

    cfg = PipelineConfig(
        seed=args.seed,
        num_perm=args.num_perm,
        bands=args.bands,
        rows_per_band=args.rows_per_band,
        shingle_w=args.shingle_w,
        tau=args.tau,
        use_audio_channel=not args.no_audio_channel,
    )

    t0 = time.time()
    if args.compact:
        from minhash_ray.state.checkpoint import CheckpointManager

        if args.docs:
            from minhash_ray.pipelines.dedup_text import DOC_CFG as _cfg
        else:
            _cfg = cfg
        mgr = CheckpointManager(args.checkpoint, _cfg)
        base = mgr._base()
        report = {}
        for s in sorted(os.listdir(base)) if os.path.isdir(base) else []:
            if not mgr.is_complete(s):
                continue
            before = len(mgr.manifest(s)["partitions"])
            mgr.compact(s, target_rows_per_part=args.target_rows_per_part)
            report[s] = {
                "parts_before": before,
                "parts_after": len(mgr.manifest(s)["partitions"]),
                "rows": mgr.manifest(s)["rows"],
            }
        print(json.dumps({
            "compacted": report,
            "sec": round(time.time() - t0, 2),
            "config_hash": _cfg.config_hash(),
        }))
        ray.shutdown()
        return 0
    if args.diff_against:
        from minhash_ray.pipelines.dedup import assignments_diff

        diff = assignments_diff(args.diff_against, args.checkpoint, cfg)
        counts: dict = {}
        n_rows = 0
        import pyarrow as pa

        batches = []
        for b in diff.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            n_rows += b.num_rows
            g = b.group_by("status").aggregate([([], "count_all")])
            for s, c in zip(g.column("status").to_pylist(),
                            g.column("count_all").to_pylist()):
                counts[s] = counts.get(s, 0) + int(c)
            batches.append(b)
        if args.output:
            import pyarrow.parquet as pq

            os.makedirs(args.output, exist_ok=True)
            pq.write_table(
                pa.concat_tables(batches) if batches else pa.table(
                    {"clip_id": pa.array([], pa.string())}
                ),
                os.path.join(args.output, "assignments_diff.parquet"),
            )
        print(json.dumps({
            "diff_rows": n_rows,
            "by_status": counts,
            "sec": round(time.time() - t0, 2),
            "config_hash": cfg.config_hash(),
            "output": args.output,
        }))
        ray.shutdown()
        return 0
    if args.docs:
        from minhash_ray.pipelines.dedup_text import (
            DOC_CFG,
            doc_dedup_tiered,
            doc_dedup_tiered_append,
        )
        from minhash_ray.sources.docs import read_docs

        docs = read_docs(args.input, columns=["doc_id", "text"])
        if args.append:
            if not args.checkpoint:
                ap.error("--append requires --checkpoint")
            assign = doc_dedup_tiered_append(
                docs, DOC_CFG, ckpt_root=args.checkpoint,
                num_partitions=args.num_partitions,
            )
        else:
            assign = doc_dedup_tiered(
                "", DOC_CFG, num_partitions=args.num_partitions,
                docs=docs, ckpt_root=args.checkpoint,
            )
        os.makedirs(args.output, exist_ok=True)
        assign = assign.materialize()
        assign.write_parquet(os.path.join(args.output, "assignments"))
        import pyarrow.compute as pc

        n = assign.count()
        kept = assign.map_batches(
            lambda b: b.filter(pc.equal(b.column("keep"), 1)),
            batch_format="pyarrow",
        ).count()
        print(json.dumps({
            "docs": n,
            "kept": kept,
            "sec": round(time.time() - t0, 2),
            "docs_per_sec": round(n / max(time.time() - t0, 1e-9), 1),
            "config_hash": DOC_CFG.config_hash(),
            "output": args.output,
        }))
        ray.shutdown()
        return 0
    if args.append:
        if not args.checkpoint:
            ap.error("--append requires --checkpoint")
        res = append_clips(
            read_clips(args.input),
            cfg,
            ckpt_root=args.checkpoint,
            num_partitions=args.num_partitions,
        )
    else:
        res = run_dedup(
            read_clips(args.input),
            cfg,
            ckpt_root=args.checkpoint,
            num_partitions=args.num_partitions,
        )
    os.makedirs(args.output, exist_ok=True)
    res.assignments.write_parquet(os.path.join(args.output, "assignments"))
    res.edges.write_parquet(os.path.join(args.output, "edges"))
    n = res.assignments.count()
    out = {
        "clips": n,
        "edges": res.edges.count(),
        "sec": round(time.time() - t0, 2),
        "clips_per_sec": round(n / (time.time() - t0), 1),
        "config_hash": cfg.config_hash(),
        "output": args.output,
    }
    if args.truth:
        # append mode: --input is only the new partition, so text-based
        # precision (which needs every clip's transcript) is unavailable —
        # fall back to planted-truth membership precision
        clips_path = (
            args.input if args.input.endswith(".parquet") and not args.append else None
        )
        m = dedup_metrics(res.assignments, args.truth, cfg, clips_path=clips_path)
        out.update({k: round(v, 4) if isinstance(v, float) else v for k, v in m.items()})
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

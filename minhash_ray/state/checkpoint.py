"""Per-stage checkpoints with lineage metadata and atomic publish.

The Ray-native re-expression of the reference's versioned sketch list
(src/datatypes/sketch_list.c:5-68 — immutable published versions readable
while the writer continues) and generation swap
(src/parallel/minhash-concurrent.c:305-352 — publish happens atomically):

* a stage writes its Parquet part files into ``<dir>.tmp-<nonce>``,
* a ``manifest.json`` carrying lineage (config hash, stage name, input
  stage, per-file row counts, engine version) is written **into** the temp
  dir,
* one atomic ``os.rename`` publishes the version.  Readers either see a
  complete manifest or nothing — a killed job leaves only temp dirs, which
  the next run clears.

Resume = for each stage in order, reuse the checkpoint iff its manifest is
complete and its config hash matches the current semantic config.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from minhash_ray.config import PipelineConfig

MANIFEST = "manifest.json"


class CheckpointManager:
    def __init__(self, root: str, cfg: PipelineConfig):
        self.root = root
        self.cfg = cfg
        self.cfg_hash = cfg.config_hash()
        os.makedirs(self._base(), exist_ok=True)

    def _base(self) -> str:
        return os.path.join(self.root, self.cfg_hash)

    def stage_dir(self, stage: str) -> str:
        return os.path.join(self._base(), stage)

    def manifest(self, stage: str) -> dict | None:
        path = os.path.join(self.stage_dir(stage), MANIFEST)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def is_complete(self, stage: str) -> bool:
        m = self.manifest(stage)
        return bool(m) and m.get("status") == "complete" and m.get("config_hash") == self.cfg_hash

    def load(self, stage: str):
        """Open a published checkpoint as a Dataset.

        Reads ONLY the part files listed in the manifest — the manifest
        rename is therefore the true commit point: parts renamed into the
        live dir by a crashed/concurrent ``append_parts`` are invisible
        until their manifest lands (and are deleted by
        ``clear_stale_temps`` reconciliation)."""
        import ray.data as rd

        d = self.stage_dir(stage)
        m = self.manifest(stage)
        if m and m.get("partitions") is not None:
            files = [os.path.join(d, p["file"]) for p in m["partitions"]]
        else:  # pre-manifest layout fallback
            files = [
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            ]
        return rd.read_parquet(files)

    def save(self, stage: str, ds, input_stage: str | None = None, extra: dict | None = None,
             schema=None):
        """Execute ``ds`` into a checkpoint, atomically publish, return a
        Dataset reading from the published files (so downstream consumes the
        immutable version, not the recomputation)."""
        final = self.stage_dir(stage)
        tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp, exist_ok=True)
        try:
            ds.write_parquet(tmp)
            # per-partition lineage: row counts per part file
            import pyarrow.parquet as pq

            parts = []
            for f in sorted(os.listdir(tmp)):
                if f.endswith(".parquet"):
                    parts.append(
                        {"file": f, "rows": pq.ParquetFile(os.path.join(tmp, f)).metadata.num_rows}
                    )
            if not parts:
                # Ray's write_parquet emits no files for an empty dataset; a
                # checkpoint must still be loadable (a corpus with zero dup
                # edges publishes an empty 'edges' stage), so write one
                # schema-bearing empty part file.  The schema comes from the
                # caller (stage contracts are static) or, failing that, the
                # dataset itself (None for a fully-empty execution).
                import pyarrow as pa

                arrow_schema = schema
                if arrow_schema is None:
                    ds_schema = ds.schema()
                    arrow_schema = getattr(ds_schema, "base_schema", None)
                    if not isinstance(arrow_schema, pa.Schema) and ds_schema is not None:
                        arrow_schema = pa.schema(list(zip(ds_schema.names, ds_schema.types)))
                if not isinstance(arrow_schema, pa.Schema):
                    raise ValueError(
                        f"checkpoint stage {stage!r} is empty and no schema is "
                        "known; pass schema= to save()"
                    )
                fname = "part-empty.parquet"
                pq.write_table(arrow_schema.empty_table(), os.path.join(tmp, fname))
                parts.append({"file": fname, "rows": 0})
            manifest = {
                "status": "complete",
                "stage": stage,
                "config_hash": self.cfg_hash,
                "config": self.cfg.semantic_dict(),
                "input_stage": input_stage,
                "created_at": time.time(),
                "engine_version": __import__("minhash_ray").__version__,
                "partitions": parts,
                "rows": sum(p["rows"] for p in parts),
            }
            if extra:
                manifest.update(extra)
            with open(os.path.join(tmp, MANIFEST), "w") as f:
                json.dump(manifest, f, indent=1)
            if os.path.exists(final):
                shutil.rmtree(final)
            os.rename(tmp, final)                      # atomic publish
        finally:
            if os.path.exists(tmp):
                shutil.rmtree(tmp, ignore_errors=True)
        return self.load(stage)

    def append_parts(self, stage: str, ds, schema=None, extra: dict | None = None):
        """Incrementally extend a published checkpoint with new part files —
        the append-mode analogue of the reference's insert-while-query
        contract (an ever-growing sketch, test/fcds/
        test_fixed_queries_infinite_write.c:90-99): existing parts are
        never rewritten; new parts land under a unique prefix via atomic
        per-file renames, then the manifest is atomically replaced.
        Readers concurrently see either the old or the new manifest, both
        of which list only complete files."""
        final = self.stage_dir(stage)
        m = self.manifest(stage)
        if not self.is_complete(stage):
            raise ValueError(f"cannot append to incomplete checkpoint stage {stage!r}")
        tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp, exist_ok=True)
        nonce = uuid.uuid4().hex[:8]
        try:
            ds.write_parquet(tmp)
            import pyarrow.parquet as pq

            new_parts = []
            for i, f in enumerate(sorted(os.listdir(tmp))):
                if not f.endswith(".parquet"):
                    continue
                rows = pq.ParquetFile(os.path.join(tmp, f)).metadata.num_rows
                name = f"append-{nonce}-{i:05d}.parquet"
                os.rename(os.path.join(tmp, f), os.path.join(final, name))
                new_parts.append({"file": name, "rows": rows})
            m["partitions"] = m.get("partitions", []) + new_parts
            m["rows"] = sum(p["rows"] for p in m["partitions"])
            m["appended_at"] = time.time()
            if extra:
                m.update(extra)
            mpath = os.path.join(final, MANIFEST)
            mtmp = f"{mpath}.tmp-{nonce}"
            with open(mtmp, "w") as f:
                json.dump(m, f, indent=1)
            os.rename(mtmp, mpath)                     # atomic manifest swap
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return self.load(stage)

    def compact(self, stage: str, target_rows_per_part: int = 1_000_000):
        """Rewrite a published stage's part files into
        ``ceil(rows / target_rows_per_part)`` parts — the maintenance pass
        an append-heavy checkpoint needs (every ``append_parts``
        micro-batch lands its own files; a long-lived corpus accumulates
        thousands of small parts whose per-file open/footer cost
        dominates resume reads).

        Same commit discipline as :meth:`save`: the compacted version is
        written to a tmp dir and published by ONE atomic rename, with the
        source checkpoint untouched until then — a crash mid-compaction
        leaves the original fully readable.  Lineage survives: the new
        manifest keeps ``input_stage`` and records ``compacted_from`` (the
        old part count).  Returns the reloaded Dataset."""
        import math

        m = self.manifest(stage)
        if not self.is_complete(stage):
            raise ValueError(f"cannot compact incomplete checkpoint stage {stage!r}")
        import pyarrow.parquet as pq

        d = self.stage_dir(stage)
        first = os.path.join(d, m["partitions"][0]["file"])
        arrow_schema = pq.read_schema(first)
        n_parts = max(1, math.ceil(max(m["rows"], 1) / max(target_rows_per_part, 1)))
        ds = self.load(stage).repartition(n_parts)
        return self.save(
            stage,
            ds,
            input_stage=m.get("input_stage"),
            extra={"compacted_from": len(m["partitions"])},
            schema=arrow_schema,
        )

    def clear_stale_temps(self) -> None:
        """Drop temp dirs of crashed writers and reconcile each published
        stage dir against its manifest: part files not listed (orphans of
        an append that died between the per-file renames and the manifest
        swap) are deleted — they were never visible to ``load`` and a
        retried append re-writes them under a fresh nonce."""
        base = self._base()
        for name in os.listdir(base):
            path = os.path.join(base, name)
            if ".tmp-" in name:
                shutil.rmtree(path, ignore_errors=True)
                continue
            if not os.path.isdir(path):
                continue
            m = self.manifest(name)
            if not m or m.get("partitions") is None:
                continue
            listed = {p["file"] for p in m["partitions"]}
            for f in os.listdir(path):
                if f.endswith(".parquet") and f not in listed:
                    try:
                        os.remove(os.path.join(path, f))
                    except OSError:
                        pass

    def prune_other_configs(self) -> None:
        """Checkpoint retention (the reference's garbage_collector_list
        analogue, src/fcds/minhash-fcds.c:401-433): drop versions built
        under other config hashes."""
        if not os.path.isdir(self.root):
            return
        for name in os.listdir(self.root):
            if name != self.cfg_hash:
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)

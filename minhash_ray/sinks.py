"""Resumable partitioned parquet sink.

Output contract for long jobs at corpus scale: one directory per key-hash
shard, each published atomically (tmp file + rename, then a ``_SUCCESS``
marker carrying the row count).  A rerun after a mid-write failure skips
every finished shard and recomputes only the missing ones — finer-grained
than the whole-stage atomicity of ``state/checkpoint.CheckpointManager``
(reference analog: the atomic version publish of
src/datatypes/sketch_list.c:5-68, applied per-shard).

Single-box note: workers write to a local path here; on a multi-node
cluster ``out_dir`` must be shared storage (the usual Ray Data sink
assumption — ``Dataset.write_parquet`` has the same contract).
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa

SUCCESS = "_SUCCESS"


def _shard_of(col: pa.ChunkedArray | pa.Array, num_shards: int) -> np.ndarray:
    from minhash_ray.stages.banding import splitmix64
    from minhash_ray.stages.candidates import _hash_fixed_bytes

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        h = splitmix64(col.to_numpy(zero_copy_only=False).astype(np.uint64))
    else:
        # vectorized width-independent FNV over the id bytes (the pair-key
        # hash of stages/candidates — never a Python loop over rows)
        h = _hash_fixed_bytes(col.to_numpy(zero_copy_only=False).astype("S"))
    return (h % np.uint64(num_shards)).astype(np.int64)


def _shard_dir(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard-{shard:05d}")


def write_partitioned(ds, out_dir: str, key_col: str, num_shards: int = 64) -> dict:
    """Write ``ds`` as ``out_dir/shard-K/part-*.parquet`` partitioned by
    ``splitmix64(key) % num_shards``; skip shards already published.

    Returns ``{"written": [...], "skipped": [...], "rows": {shard: n}}``.
    Call again after a failure with the same arguments to finish the
    remaining shards; finished shard directories are never touched."""
    os.makedirs(out_dir, exist_ok=True)
    done = {
        s for s in range(num_shards)
        if os.path.exists(os.path.join(_shard_dir(out_dir, s), SUCCESS))
    }
    missing = [s for s in range(num_shards) if s not in done]
    rows: dict[int, int] = {}
    for s in done:
        with open(os.path.join(_shard_dir(out_dir, s), SUCCESS)) as f:
            rows[s] = json.load(f)["rows"]
    if not missing:
        return {"written": [], "skipped": sorted(done), "rows": rows}

    missing_set = set(missing)

    def tag_and_filter(batch: pa.Table) -> pa.Table:
        sh = _shard_of(batch.column(key_col), num_shards)
        keep = np.isin(sh, list(missing_set))
        return batch.filter(pa.array(keep)).append_column(
            "__shard", pa.array(sh[keep], pa.int64())
        )

    def write_shard(group: pa.Table) -> pa.Table:
        s = int(group.column("__shard")[0].as_py())
        body = group.drop_columns(["__shard"])
        d = _shard_dir(out_dir, s)
        os.makedirs(d, exist_ok=True)
        import pyarrow.parquet as pq

        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex[:8]}.parquet")
        pq.write_table(body, tmp)
        os.rename(tmp, os.path.join(d, "part-0.parquet"))
        with open(os.path.join(d, SUCCESS + ".tmp"), "w") as f:
            json.dump({"rows": body.num_rows}, f)
        os.rename(os.path.join(d, SUCCESS + ".tmp"), os.path.join(d, SUCCESS))
        return pa.table(
            {"shard": pa.array([s], pa.int64()),
             "rows": pa.array([body.num_rows], pa.int64())}
        )

    written = (
        ds.map_batches(tag_and_filter, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(write_shard, batch_format="pyarrow")
    )
    got = {int(r["shard"]): int(r["rows"]) for r in written.take_all()}
    # shards that received zero rows still need a marker, or every rerun
    # would re-scan the input looking for them
    for s in missing:
        if s not in got:
            d = _shard_dir(out_dir, s)
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, SUCCESS + ".tmp"), "w") as f:
                json.dump({"rows": 0}, f)
            os.rename(os.path.join(d, SUCCESS + ".tmp"), os.path.join(d, SUCCESS))
            got[s] = 0
    rows.update(got)
    return {"written": sorted(got), "skipped": sorted(done), "rows": rows}


def read_partitioned(out_dir: str):
    """Read back every published shard (missing-marker shards rejected —
    the output of an interrupted job is not silently truncated)."""
    import ray.data as rd

    files = []
    for entry in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, entry)
        if not entry.startswith("shard-") or not os.path.isdir(d):
            continue
        if not os.path.exists(os.path.join(d, SUCCESS)):
            raise ValueError(f"shard {entry} has no {SUCCESS} marker — incomplete output")
        files.extend(
            os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
        )
    return rd.read_parquet(files)

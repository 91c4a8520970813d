"""Clips-table source/sink.

The target data model (BASELINE.json input_hint) is a Lance table of audio
clip + transcript pairs.  ``pylance`` is not installed in this sandbox, so
the reader auto-detects: ``.lance`` datasets go through
``ray.data.read_lance`` when the library is importable, anything else falls
back to Parquet with the identical Arrow schema (FIXTURES.md Table 1).

The reference has no I/O at all (elements are loop counters,
reference: test/test_serial.c:66-68) — this module is engine-new.
"""

from __future__ import annotations

import os

import pyarrow as pa

CLIPS_COLUMNS = ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]

CLIPS_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("dur_ms", pa.int32()),
        ("codec", pa.string()),
        ("transcript", pa.string()),
    ]
)


def _have_lance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_clips(path: str, columns: list[str] | None = None, **read_kwargs):
    """Read a clips table as a ``ray.data.Dataset``.

    ``columns`` prunes at the read — pass only what the stage needs so the
    audio payload never leaves storage for transcript-only work.
    """
    import ray.data as rd

    if path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions")):
        if _have_lance():
            return rd.read_lance(path, columns=columns, **read_kwargs)
        raise RuntimeError(
            f"{path} looks like a Lance dataset but pylance is not installed; "
            "re-export as parquet or install lance"
        )
    if not read_kwargs:
        if os.path.isfile(path):
            files = [path]
        elif os.path.isdir(path):
            files = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        else:
            files = []
        if files:
            rg_ds = _read_parquet_rowgroups(files, columns)
            if rg_ds is not None:
                return rg_ds
    if "override_num_blocks" not in read_kwargs:
        # keep read blocks ≫ parallelism: Ray's default gives a SINGLE read
        # task for a single parquet file (then splits post-read), which
        # serializes the scan and starves the signature actor pool — on a
        # 32-CPU node that alone doubled the wall time of the heaviest
        # stage.  Row-group granularity bounds the effective parallelism.
        from minhash_ray.util import cluster_cpus

        n_blocks = max(32, 2 * cluster_cpus())
        if os.path.isfile(path):
            # never ask for more blocks than rows: Ray pads the shortfall
            # with EMPTY blocks, and an empty block that shuffles first
            # breaks a downstream join's schema broadcast
            # (util.strip_empty_blocks doc); footer metadata is KBs
            import pyarrow.parquet as pq

            try:
                n_rows = pq.read_metadata(path).num_rows
                n_blocks = max(1, min(n_blocks, n_rows // 32 + 1))
            except Exception:
                pass
        read_kwargs["override_num_blocks"] = n_blocks
    return rd.read_parquet(path, columns=columns, **read_kwargs)


# worker-process cache of open (memory-mapped) parquet readers, keyed by
# (path, mtime, size) so a rewritten file is never served stale; small
# LRU (not clear-on-miss) so a worker whose tasks alternate between files
# — clips + documents in one session, concurrent bench queries — keeps
# all of them open instead of re-parsing footers per task (ADVICE r3)
_PQ_FILE_CACHE: dict = {}
_PQ_FILE_CACHE_MAX = 4


def _cached_parquet_file(path: str):
    import pyarrow.parquet as pq

    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    pf = _PQ_FILE_CACHE.pop(key, None)     # pop+reinsert = LRU touch
    if pf is None:
        pf = pq.ParquetFile(pa.memory_map(path))
        # evict oldest entries for the same path first (a rewritten file's
        # stale reader can never be hit again), then plain LRU
        for k in [k for k in _PQ_FILE_CACHE if k[0] == path]:
            _PQ_FILE_CACHE.pop(k, None)
        while len(_PQ_FILE_CACHE) >= _PQ_FILE_CACHE_MAX:
            _PQ_FILE_CACHE.pop(next(iter(_PQ_FILE_CACHE)))
    _PQ_FILE_CACHE[key] = pf
    return pf


def _read_parquet_rowgroups(paths: list[str], columns: list[str] | None):
    """Row-group-parallel scan of one or more parquet files (a single
    hand-off file OR a sharded directory), or None when there are too few
    row groups to be worth it.

    ``ray.data.read_parquet`` parallelizes across *files* — each file is
    one read task no matter what ``override_num_blocks`` says (the split
    into N output blocks happens inside that task), so a 10 GB
    single-file corpus is a single-threaded ~90 s decode that gates every
    downstream stage and destroys N→4N scaling — and a 2-shard 21 GB
    directory is a 2-way scan that flattened the r5 scaling refresh to
    0.28 (signatures 85 s at BOTH 4 and 16 CPUs) until this path learned
    directories.  At 100 TB inputs arrive as very many files and file
    granularity is plenty; this exists so the few-huge-files hand-off
    shape still scans at full width: genuine ReadTasks per row-group
    range, each opening its file itself (footer metadata is KBs; payload
    bytes never pass through the driver).  Tasks never span files.
    """
    import pyarrow.parquet as pq

    import ray.data as rd

    try:
        mds = [pq.read_metadata(p) for p in paths]
    except Exception:
        return None
    n_rg_total = sum(md.num_row_groups for md in mds)
    if n_rg_total < 4:
        return None
    # genuine ReadTasks (not an index-Dataset + map_batches: a downstream
    # stage fusing with that bundles the tiny index blocks up to ITS
    # batch_size and collapses the whole scan back into one task — observed:
    # 98 row groups → 1 fused task).  A Datasource read keeps its task
    # granularity through any fusion.
    #
    # Row groups are GROUPED into ~128 MB tasks (while keeping the task
    # count ≥ 2x cluster CPUs when the file allows): file row groups are
    # deliberately small for read flexibility, but one task/block per row
    # group floods every downstream stage with tiny blocks — measured on
    # the 100k-clip corpus at 16 CPUs, 391 single-row-group tasks more
    # than TRIPLED candidates/verify/cluster time (3.4→11.9 s candidates)
    # for a marginal signature-stage gain.
    from ray.data.block import BlockMetadata
    from ray.data.datasource import Datasource, ReadTask

    from minhash_ray.util import cluster_cpus

    # flattened (path, row-group) layout across all shard files
    sizes_by_file = [
        [md.row_group(i).total_byte_size for i in range(md.num_row_groups)]
        for md in mds
    ]
    rows_by_file = [
        [md.row_group(i).num_rows for i in range(md.num_row_groups)]
        for md in mds
    ]
    total = sum(sum(s) for s in sizes_by_file)
    # ~16 tasks per CPU, bytes clamped to [8 MB, 512 MB].  Both measured
    # extremes lose: one task per fine row group (86 tasks/CPU at 4 CPUs)
    # drowns the driver-side scheduler when it shares the box with few
    # workers (sig stage 27→36 s at 4 CPUs), while ~5 coarse 128 MB tasks
    # per CPU at 16 CPUs thrash the shared LLC and expose last-wave
    # straggle (sig stage 11→17 s).  The winning layouts at BOTH
    # parallelism levels sat near ~20 tasks/CPU — so derive the task size
    # from the cluster width, not a fixed byte target.  Downstream
    # block-count pressure is handled by the post-signature coalesce in
    # run_dedup, not by fattening read tasks.
    env_target = os.environ.get("GRAFT_READ_TASK_BYTES")
    if env_target:
        per_task = max(1, int(env_target))
    else:
        n_tasks_target = 16 * cluster_cpus()
        per_task = max(8 << 20, min(512 << 20, total // max(1, n_tasks_target)))
    # [ (path, start_rg, end_rg) ) per task — tasks never span files
    groups: list[tuple[str, int, int]] = []
    for p, sizes in zip(paths, sizes_by_file):
        start, acc = 0, 0
        for i in range(len(sizes)):
            if acc and acc + sizes[i] > per_task:
                groups.append((p, start, i))
                start, acc = i, 0
            acc += sizes[i]
        if len(sizes):
            groups.append((p, start, len(sizes)))

    # declare the (column-pruned) footer schema on every ReadTask so
    # ds.schema() is metadata-only — without it the first schema() call
    # executes a limit-1 read task (~0.6 s of serial time inside every
    # pipeline run just to validate the input contract)
    file_schema = mds[0].schema.to_arrow_schema()
    if columns is not None:
        file_schema = pa.schema([file_schema.field(c) for c in columns])
    rows_of = dict(zip(paths, rows_by_file))
    sizes_of = dict(zip(paths, sizes_by_file))

    class _RowGroupDatasource(Datasource):
        def get_name(self):
            return "ParquetRowGroups"

        def estimate_inmemory_data_size(self):
            return total

        def get_read_tasks(self, parallelism):
            tasks = []
            for p, g0, g1 in groups:

                def read_fn(p=p, g0=g0, g1=g1):
                    # memory-map: pages come straight off the page cache
                    # with no read()+memcpy (measured ~2x per row group),
                    # and use_threads=False — parallelism comes from the
                    # task pool; per-task arrow thread pools (16 workers
                    # x 32 threads) only thrash each other.  The open
                    # ParquetFile is cached per worker process: footer
                    # metadata parse is ~tens of ms for a many-row-group
                    # file, and paying it once per TASK (several hundred
                    # fine-grained tasks) burned whole core-seconds.
                    pf = _cached_parquet_file(p)
                    t = pf.read_row_groups(
                        list(range(g0, g1)), columns=columns, use_threads=False
                    )
                    return [t]

                tasks.append(
                    ReadTask(
                        read_fn,
                        BlockMetadata(
                            num_rows=sum(rows_of[p][g0:g1]),
                            size_bytes=sum(sizes_of[p][g0:g1]),
                            exec_stats=None,
                            input_files=[p],
                        ),
                        schema=file_schema,
                    )
                )
            return tasks

    return rd.read_datasource(_RowGroupDatasource(), override_num_blocks=len(groups))


def write_table(ds, path: str) -> None:
    """Write a Dataset as partitioned Parquet (Lance when available and the
    path asks for it).  One directory of part files, never one giant file."""
    if path.endswith(".lance"):
        if _have_lance():
            ds.write_lance(path)
            return
        raise RuntimeError("lance output requested but pylance is not installed")
    ds.write_parquet(path)


def validate_clips_schema(schema: pa.Schema) -> None:
    """Stage-boundary schema check: the declared input contract must hold."""
    missing = [name for name in CLIPS_COLUMNS if name not in schema.names]
    if missing:
        raise ValueError(f"clips table missing columns {missing}; got {schema.names}")
    for name in CLIPS_COLUMNS:
        expected = CLIPS_SCHEMA.field(name).type
        actual = schema.field(name).type
        if actual != expected and not (
            pa.types.is_large_binary(actual) and pa.types.is_binary(expected)
        ) and not (pa.types.is_large_string(actual) and pa.types.is_string(expected)):
            raise ValueError(f"clips column {name!r}: expected {expected}, got {actual}")

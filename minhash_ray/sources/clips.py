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
    if not read_kwargs and os.path.isfile(path):
        rg_ds = _read_single_parquet_rowgroups(path, columns)
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


def _read_single_parquet_rowgroups(path: str, columns: list[str] | None):
    """Row-group-parallel scan of ONE parquet file, or None if it has too
    few row groups to be worth it.

    ``ray.data.read_parquet`` parallelizes across *files* — a single file
    is one read task no matter what ``override_num_blocks`` says (the
    split into N output blocks happens inside that task), so a 10 GB
    single-file corpus is a single-threaded ~90 s decode that gates every
    downstream stage and destroys N→4N scaling.  At 100 TB inputs arrive
    as many files and this path never triggers; it exists so one giant
    file (a common hand-off shape) still scans at full width: a tiny
    index Dataset of row-group ids is mapped with one task per row group,
    each task opening the file itself and decoding only its row group
    (footer metadata is KBs; payload bytes never pass through the driver).
    """
    import pyarrow.parquet as pq

    import ray.data as rd

    try:
        md = pq.read_metadata(path)
    except Exception:
        return None
    n_rg = md.num_row_groups
    if n_rg < 4:
        return None
    # genuine ReadTasks (not an index-Dataset + map_batches: a downstream
    # stage fusing with that bundles the tiny index blocks up to ITS
    # batch_size and collapses the whole scan back into one task — observed:
    # 98 row groups → 1 fused task).  A Datasource read keeps one task per
    # row group through any fusion.
    from ray.data.block import BlockMetadata
    from ray.data.datasource import Datasource, ReadTask

    class _RowGroupDatasource(Datasource):
        def get_name(self):
            return "ParquetRowGroups"

        def estimate_inmemory_data_size(self):
            return sum(
                md.row_group(i).total_byte_size for i in range(n_rg)
            )

        def get_read_tasks(self, parallelism):
            tasks = []
            for i in range(n_rg):
                rg = md.row_group(i)

                def read_fn(i=i):
                    # memory-map: pages come straight off the page cache
                    # with no read()+memcpy (measured ~2x per row group),
                    # and use_threads=False — parallelism comes from the
                    # task pool; per-task arrow thread pools (16 workers
                    # x 32 threads) only thrash each other
                    mm = pa.memory_map(path)
                    try:
                        t = pq.ParquetFile(mm).read_row_group(
                            i, columns=columns, use_threads=False
                        )
                    finally:
                        mm.close()
                    return [t]

                tasks.append(
                    ReadTask(
                        read_fn,
                        BlockMetadata(
                            num_rows=rg.num_rows,
                            size_bytes=rg.total_byte_size,
                            exec_stats=None,
                            input_files=[path],
                        ),
                    )
                )
            return tasks

    return rd.read_datasource(_RowGroupDatasource(), override_num_blocks=n_rg)


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

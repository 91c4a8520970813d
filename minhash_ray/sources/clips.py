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
    if "override_num_blocks" not in read_kwargs:
        # keep read blocks ≫ parallelism: Ray's default gives a SINGLE read
        # task for a single parquet file (then splits post-read), which
        # serializes the scan and starves the signature actor pool — on a
        # 32-CPU node that alone doubled the wall time of the heaviest
        # stage.  Row-group granularity bounds the effective parallelism.
        from minhash_ray.util import cluster_cpus

        read_kwargs["override_num_blocks"] = max(32, 2 * cluster_cpus())
    return rd.read_parquet(path, columns=columns, **read_kwargs)


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

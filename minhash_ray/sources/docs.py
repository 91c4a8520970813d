"""Documents-table source with format auto-detect.

The text pipelines read `documents.parquet` by default; real corpora also
arrive as JSONL dumps or CSV exports.  ``read_docs`` maps each format to
the matching Ray Data reader (all of them stream file shards as blocks —
no driver materialization) and returns the same (doc_id, text, ...)
Dataset contract, so every text operator accepts any format through its
``docs=`` override.

Like ``sources/clips.py``, `.lance` datasets route through
``ray.data.read_lance`` when pylance is importable (absent in this
sandbox — the branch is documented, not testable here).

The reference has no I/O at all (elements are loop counters,
reference: test/test_serial.c:66-68) — this module is engine-new.
"""

from __future__ import annotations

import os


def _detect_format(path: str) -> str:
    if path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions")):
        return "lance"
    if os.path.isdir(path):
        for entry in sorted(os.listdir(path)):
            for fmt, exts in (
                ("parquet", (".parquet",)),
                ("json", (".jsonl", ".json", ".ndjson")),
                ("csv", (".csv",)),
            ):
                if entry.endswith(exts):
                    return fmt
        raise ValueError(f"no parquet/jsonl/csv files under {path}")
    for fmt, exts in (
        ("parquet", (".parquet",)),
        ("json", (".jsonl", ".json", ".ndjson")),
        ("csv", (".csv",)),
    ):
        if path.endswith(exts):
            return fmt
    raise ValueError(f"unrecognized documents format: {path}")


def read_docs(path: str, columns: list[str] | None = None, **read_kwargs):
    """Read a documents table as a ``ray.data.Dataset`` — parquet, JSONL
    (one object per line), CSV, or Lance, auto-detected from the path.

    ``columns`` prunes at the read for parquet/lance (storage-side
    projection); the row-oriented formats (JSONL/CSV) must parse whole
    rows, so projection happens right after parse — same schema out,
    different cost, which is exactly why parquet is the recommended
    landing format at scale."""
    import ray.data as rd

    fmt = _detect_format(path)
    if fmt == "lance":
        try:
            import lance  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                f"{path} looks like a Lance dataset but pylance is not "
                "installed; re-export as parquet or install lance"
            ) from e
        return rd.read_lance(path, columns=columns, **read_kwargs)
    if fmt == "parquet":
        return rd.read_parquet(path, columns=columns, **read_kwargs)
    ds = rd.read_json(path, **read_kwargs) if fmt == "json" else rd.read_csv(path, **read_kwargs)
    if columns:
        ds = ds.select_columns(columns)
    return ds

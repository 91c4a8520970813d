"""Stage S — MinHash + SimHash signatures.

A **stateful actor-pool stage**: the hash-coefficient tables are built once
per actor in ``__init__`` (the Ray re-expression of the reference's shared
``hash_functions`` array, src/configuration/configuration.c:97-140 — the
reference shares one table across sketches in memory, we rebuild an
identical table from the config seed in every worker), and every batch is a
vectorized numpy fold (reference ``basic_insert`` min-update semantics,
src/utils/utils.c:3-33, collapsed to one segmented min per row).

Run it as ``ds.map_batches(SignatureStage, fn_constructor_kwargs=...,
concurrency=N, batch_size=B, batch_format="pyarrow")``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from minhash_ray.config import PipelineConfig
from minhash_ray.functions.hashing import HashTables
from minhash_ray.functions.minhash import signatures_from_shingles
from minhash_ray.functions.shingles import shingles_for_config
from minhash_ray.functions.simhash import simhash_from_shingles


def signatures_schema(num_perm: int) -> pa.Schema:
    return pa.schema(
        [
            ("clip_id", pa.string()),
            ("signature", pa.list_(pa.uint64(), num_perm)),
            ("simhash", pa.uint64()),
            ("audio_fp", pa.uint64()),
            ("content_hash", pa.string()),
            ("n_shingles", pa.int64()),
        ]
    )


class SignatureStage:
    """Callable class for ``map_batches`` actor pools — coefficient tables
    and config are actor state, built once."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.tables = HashTables.from_config(cfg)
        self.schema = signatures_schema(cfg.num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("transcript")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        shingles, counts = shingles_for_config(texts, self.cfg)
        sigs = signatures_from_shingles(shingles, counts, self.tables)
        simhash = simhash_from_shingles(shingles, counts)

        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), pa.uint64()), self.cfg.num_perm
        )
        cols = {
            "clip_id": batch.column("clip_id"),
            "signature": sig_col,
            "simhash": pa.array(simhash, pa.uint64()),
            "audio_fp": batch.column("audio_fp")
            if "audio_fp" in batch.column_names
            else pa.array(np.zeros(batch.num_rows, dtype=np.uint64), pa.uint64()),
            "content_hash": batch.column("content_hash")
            if "content_hash" in batch.column_names
            else pa.array([""] * batch.num_rows, pa.string()),
            "n_shingles": pa.array(counts.astype(np.int64), pa.int64()),
        }
        return pa.table(cols, schema=self.schema)


def signature_matrix(table: pa.Table, num_perm: int) -> np.ndarray:
    """(n, k) uint64 view of a signatures column (zero-copy when possible)."""
    col = table.column("signature")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    return flat.to_numpy(zero_copy_only=False).reshape(-1, num_perm)

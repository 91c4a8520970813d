"""Deduplication operators over a generic documents table — the same
sketch machinery as the flagship clips pipeline, applied to (doc_id, text):

* exact dedup (hash-partitioned min-per-group),
* MinHash signatures + MinHash-LSH near-dup pairs,
* SimHash fingerprints,
* exact n-gram Jaccard verification,
* rolling-hash document fingerprints.

All reuse the reference-parity kernels (src/utils/hash.c, src/utils/utils.c
semantics) through the Ray Data stages.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from minhash_ray.config import PipelineConfig
from minhash_ray.functions.hashing import HashTables
from minhash_ray.functions.minhash import estimate_similarity, signatures_from_shingles
from minhash_ray.functions.shingles import shingles_for_config
from minhash_ray.functions.simhash import simhash_from_shingles

DOC_CFG = PipelineConfig()   # shared default: k=128, w=3 token shingles


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def exact_dedup(sf_dir: str):
    """One row per distinct text: the minimum doc_id of its group.

    Exact dedup = hash-partitioned groupby + vectorized min aggregate."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    agg = ds.groupby("text").min("doc_id")

    def rename(batch: pa.Table) -> pa.Table:
        mcol = [c for c in batch.column_names if c != "text"][0]
        return pa.table({"doc_id": batch.column(mcol), "text": batch.column("text")})

    return agg.map_batches(rename, batch_format="pyarrow")


class DocSignatureStage:
    """Actor-pool signature stage for documents (doc_id int64 keys)."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.tables = HashTables.from_config(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        shingles, counts = shingles_for_config(texts, self.cfg)
        sigs = signatures_from_shingles(shingles, counts, self.tables)
        simh = simhash_from_shingles(shingles, counts)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "signature": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1), pa.uint64()), self.cfg.num_perm
                ),
                "simhash": pa.array(simh, pa.uint64()),
                "n_shingles": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )


def doc_signatures(sf_dir: str, cfg: PipelineConfig = DOC_CFG):
    """doc_id, signature(list<u64,k>), simhash, n_shingles."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        DocSignatureStage,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=2,
    )


def simhash_fingerprints(sf_dir: str, cfg: PipelineConfig = DOC_CFG):
    """doc_id, simhash (as int64 for plain-SQL-friendly schema: value is the
    64-bit fingerprint reinterpreted, deterministic)."""
    sigs = doc_signatures(sf_dir, cfg)

    def project(batch: pa.Table) -> pa.Table:
        sh = batch.column("simhash").to_numpy().astype(np.int64)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "simhash": pa.array(sh, pa.int64())}
        )

    return sigs.map_batches(project, batch_format="pyarrow")


def minhash_dup_pairs(sf_dir: str, cfg: PipelineConfig = DOC_CFG, num_partitions: int = 8):
    """Near-duplicate pairs (doc_id_a < doc_id_b, sim >= tau-margin) via the
    full LSH pipeline: banding → salted bucket self-join → verified
    estimator (reference query semantics, src/serial/minhash-serial.c:16-26)."""
    from minhash_ray.stages.banding import make_minhash_band_fn
    from minhash_ray.stages.candidates import candidate_pairs

    sigs = doc_signatures(sf_dir, cfg).materialize()

    def with_str_ids(batch: pa.Table) -> pa.Table:
        ids = [f"{d:012d}" for d in batch.column("doc_id").to_pylist()]
        return pa.table(
            {
                "clip_id": pa.array(ids, pa.string()),
                "signature": batch.column("signature"),
                "simhash": batch.column("simhash"),
                "n_shingles": batch.column("n_shingles"),
            }
        )

    keyed = sigs.map_batches(with_str_ids, batch_format="pyarrow").materialize()
    band_rows = keyed.map_batches(
        make_minhash_band_fn(cfg.bands, cfg.rows_per_band, cfg.num_perm),
        batch_format="pyarrow",
    )
    # materialize the slim pair table so the join phase releases its CPUs
    # before the verify actor pool starts (join + idle actor pools in one
    # streaming graph deadlock a small cluster)
    pairs = candidate_pairs(band_rows, cfg, num_partitions=num_partitions).materialize()

    # verify via broadcast pack (documents tables are far under the limit)
    from minhash_ray.stages.verify import verify_broadcast

    def add_audio_fp(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "audio_fp", pa.array(np.zeros(batch.num_rows, dtype=np.uint64), pa.uint64())
        )

    edges = verify_broadcast(
        pairs, keyed.map_batches(add_audio_fp, batch_format="pyarrow"), cfg
    ).materialize()

    def to_doc_ids(batch: pa.Table) -> pa.Table:
        a = [int(x) for x in batch.column("clip_id_a").to_pylist()]
        b = [int(x) for x in batch.column("clip_id_b").to_pylist()]
        return pa.table(
            {
                "doc_id_a": pa.array(a, pa.int64()),
                "doc_id_b": pa.array(b, pa.int64()),
                "sim": batch.column("sim"),
            }
        )

    out = edges.map_batches(to_doc_ids, batch_format="pyarrow")

    # the local pair-dedupe strategy tolerates cross-batch duplicates for
    # clustering; a user-facing pair list should be unique — doc-scale
    # output, so one block + one vectorized drop_duplicates
    def dedupe(batch):
        return batch.drop_duplicates(subset=["doc_id_a", "doc_id_b"]).sort_values(
            ["doc_id_a", "doc_id_b"]
        )

    return out.repartition(1).map_batches(dedupe, batch_format="pandas", batch_size=None)


def ngram_jaccard_pairs(sf_dir: str, cfg: PipelineConfig = DOC_CFG, threshold: float = 0.3):
    """Exact n-gram-set Jaccard for LSH candidate pairs — the brute-force
    verification channel (true set Jaccard, not the sketch estimate).

    Broadcasts per-doc shingle sets (document corpora at test scale); the
    sketch-estimate path above is the scale path."""
    import ray

    t = pa.concat_tables(
        list(
            _docs(sf_dir, ["doc_id", "text"]).iter_batches(
                batch_size=65536, batch_format="pyarrow"
            )
        )
    )
    texts = t.column("text")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    shingles, counts = shingles_for_config(texts, cfg)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    doc_ids = t.column("doc_id").to_pylist()
    sets = {
        doc_ids[i]: frozenset(shingles[offsets[i] : offsets[i + 1]].tolist())
        for i in range(len(doc_ids))
    }
    sets_ref = [ray.put(sets)]

    pairs = minhash_dup_pairs(sf_dir, cfg.with_(verify_margin=0.5))  # loose: all candidates

    class ExactJaccard:
        def __init__(self):
            self.sets = ray.get(sets_ref[0])

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_j = []
            for a, b in zip(
                batch.column("doc_id_a").to_pylist(), batch.column("doc_id_b").to_pylist()
            ):
                sa, sb = self.sets[a], self.sets[b]
                union = sa | sb
                out_j.append(len(sa & sb) / len(union) if union else 1.0)
            t = pa.table(
                {
                    "doc_id_a": batch.column("doc_id_a"),
                    "doc_id_b": batch.column("doc_id_b"),
                    "jaccard": pa.array(out_j, pa.float64()),
                }
            )
            mask = pa.array(np.array(out_j) >= threshold)
            return t.filter(mask)

    return pairs.map_batches(ExactJaccard, batch_format="pyarrow", concurrency=2)


def rolling_fingerprints(sf_dir: str, window: int = 16):
    """doc_id, n_grams, min_gram_hash — rolling-hash document fingerprint
    (byte w-gram channel; the min over a doc's rolling hashes is a 1-perm
    MinHash, reference min-fold semantics src/utils/utils.c:3-33)."""
    from minhash_ray.functions.shingles import char_shingles

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        shingles, counts = char_shingles(texts, window, DOC_CFG.seed)
        ends = np.cumsum(counts)
        starts = ends - counts
        mins = np.zeros(len(counts), dtype=np.uint64)
        for i in range(len(counts)):           # few rows per batch; segment min
            if counts[i]:
                mins[i] = shingles[starts[i] : ends[i]].min()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_grams": pa.array(counts.astype(np.int64), pa.int64()),
                "min_gram_hash": pa.array(mins.astype(np.int64), pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")

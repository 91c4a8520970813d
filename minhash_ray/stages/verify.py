"""Stage P — pair verification.

Candidate pairs get their signatures attached and the exact reference
similarity estimator applied — fraction of equal sketch slots (reference
``query``, src/serial/minhash-serial.c:16-26), vectorized over pair rows —
plus auxiliary channels (SimHash Hamming distance, audio-fingerprint
Hamming, optional suffix-automaton longest-common-substring ratio).
Edges with ``sim >= tau`` survive.

Two signature-attachment strategies (auto-selected by corpus size):

* **broadcast** (≤ ``broadcast_verify_max_rows`` clips): the signature
  table is ``ray.put`` once as numpy matrices + an id index and read in
  every verify task — no shuffle at all.  This is the "broadcast small
  sides" rule; at sf0.1 scale the table is ~50 MB.
* **shuffle** (the 10^12-clip path): two hash self-joins attach side-A and
  side-B signatures (``Dataset.join`` partitioned on clip_id); memory per
  task is bounded by the join partition count, nothing is materialized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from minhash_ray.config import PipelineConfig
from minhash_ray.functions.minhash import estimate_similarity
from minhash_ray.functions.simhash import hamming_distance

EDGES_SCHEMA = pa.schema(
    [
        ("clip_id_a", pa.string()),
        ("clip_id_b", pa.string()),
        ("sim", pa.float64()),
        ("simhash_dist", pa.int64()),
        ("audio_fp_dist", pa.int64()),
        ("channel", pa.string()),
    ]
)


def _edges_table(ids_a, ids_b, sim, sh_dist, fp_dist, channel: str, keep_mask) -> pa.Table:
    t = pa.table(
        {
            "clip_id_a": ids_a,
            "clip_id_b": ids_b,
            "sim": pa.array(sim, pa.float64()),
            "simhash_dist": pa.array(sh_dist, pa.int64()),
            "audio_fp_dist": pa.array(fp_dist, pa.int64()),
            "channel": pa.array([channel] * len(sim), pa.string()),
        },
        schema=EDGES_SCHEMA,
    )
    return t.filter(pa.array(keep_mask)) if keep_mask is not None else t


class BroadcastVerifier:
    """Actor-pool verify stage: resolves the broadcast signature pack once
    per actor in ``__init__``, verifies each pair batch vectorized."""

    def __init__(self, pack_ref, cfg: PipelineConfig):
        import ray

        pack = ray.get(pack_ref[0])
        self.index: dict[str, int] = pack["index"]
        self.sigs: np.ndarray = pack["sigs"]
        self.simhash: np.ndarray = pack["simhash"]
        self.audio_fp: np.ndarray = pack["audio_fp"]
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_a = batch.column("clip_id_a")
        ids_b = batch.column("clip_id_b")
        idx_a = np.fromiter(
            (self.index[x] for x in ids_a.to_pylist()), dtype=np.int64, count=batch.num_rows
        )
        idx_b = np.fromiter(
            (self.index[x] for x in ids_b.to_pylist()), dtype=np.int64, count=batch.num_rows
        )
        sim = estimate_similarity(self.sigs[idx_a], self.sigs[idx_b])
        sh = hamming_distance(self.simhash[idx_a], self.simhash[idx_b])
        fp = hamming_distance(self.audio_fp[idx_a], self.audio_fp[idx_b])
        keep = sim >= self.cfg.tau - self.cfg.verify_margin
        return _edges_table(ids_a, ids_b, sim, sh, fp, "minhash", keep)


def build_broadcast_pack(sig_ds, cfg: PipelineConfig):
    """Collect the signature table into numpy matrices + id index and
    ``ray.put`` it once.  Only valid under ``broadcast_verify_max_rows``."""
    import ray

    from minhash_ray.stages.signature import signature_matrix

    tables = []
    for batch in sig_ds.select_columns(
        ["clip_id", "signature", "simhash", "audio_fp"]
    ).iter_batches(batch_size=65536, batch_format="pyarrow"):
        tables.append(batch)
    t = pa.concat_tables(tables)
    ids = t.column("clip_id").to_pylist()
    pack = {
        "index": {cid: i for i, cid in enumerate(ids)},
        "sigs": signature_matrix(t, cfg.num_perm),
        "simhash": np.ascontiguousarray(t.column("simhash").to_numpy(), dtype=np.uint64),
        "audio_fp": np.ascontiguousarray(t.column("audio_fp").to_numpy(), dtype=np.uint64),
    }
    return [ray.put(pack)]


def verify_broadcast(pairs_ds, sig_ds, cfg: PipelineConfig, concurrency: int = 4):
    from minhash_ray.util import clamp_concurrency

    concurrency = clamp_concurrency(concurrency)
    pack_ref = build_broadcast_pack(sig_ds, cfg)
    return pairs_ds.map_batches(
        BroadcastVerifier,
        fn_constructor_kwargs={"pack_ref": pack_ref, "cfg": cfg},
        batch_format="pyarrow",
        batch_size=65536,
        concurrency=concurrency,
    )


def verify_shuffle(pairs_ds, sig_ds, cfg: PipelineConfig, num_partitions: int = 32):
    """Scale path: attach signatures by two partitioned hash joins."""
    from minhash_ray.util import clamp_partitions

    num_partitions = clamp_partitions(num_partitions)
    slim = sig_ds.select_columns(["clip_id", "signature", "simhash", "audio_fp"])

    with_a = pairs_ds.join(
        slim,
        join_type="inner",
        on=("clip_id_a",),
        right_on=("clip_id",),
        right_suffix="_sa",
        num_partitions=num_partitions,
    )
    with_ab = with_a.join(
        slim,
        join_type="inner",
        on=("clip_id_b",),
        right_on=("clip_id",),
        right_suffix="_sb",
        num_partitions=num_partitions,
    )

    num_perm = cfg.num_perm
    tau = cfg.tau - cfg.verify_margin

    def compute(batch: pa.Table) -> pa.Table:
        def mat(name):
            col = batch.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return col.flatten().to_numpy(zero_copy_only=False).reshape(-1, num_perm)

        def vec(name):
            return np.ascontiguousarray(batch.column(name).to_numpy(), dtype=np.uint64)

        # join suffixes: first join keeps right cols with _sa only on clash;
        # resolve by position — the first 'signature' is side A
        names = batch.column_names
        sig_cols = [c for c in names if c.startswith("signature")]
        simh_cols = [c for c in names if c.startswith("simhash")]
        fp_cols = [c for c in names if c.startswith("audio_fp")]
        sim = estimate_similarity(mat(sig_cols[0]), mat(sig_cols[1]))
        sh = hamming_distance(vec(simh_cols[0]), vec(simh_cols[1]))
        fp = hamming_distance(vec(fp_cols[0]), vec(fp_cols[1]))
        keep = sim >= tau
        return _edges_table(
            batch.column("clip_id_a"), batch.column("clip_id_b"), sim, sh, fp, "minhash", keep
        )

    return with_ab.map_batches(compute, batch_format="pyarrow")


def exact_edges(validated_ds, num_partitions: int = 8, driver_max_rows: int = 50_000_000,
                n_rows: int | None = None):
    """Exact-duplicate channel: star edges within identical content hashes.

    Covers zero-shingle rows, which are excluded from banding (all-INFTY
    sketches must not cross-match, reference
    src/configuration/configuration.c:143-148).

    Below ``driver_max_rows`` the (clip_id, content_hash) projection
    streams to the driver, min-reps are computed with one pandas groupby
    and broadcast back — Ray's aggregate+join carries ~10 s of fixed
    overhead that dwarfs this metadata-scale reduction.  Beyond it, the
    distributed groupby-min + partitioned-join path runs instead.
    """
    from minhash_ray.util import clamp_partitions

    num_partitions = clamp_partitions(num_partitions)
    slim = validated_ds.select_columns(["clip_id", "content_hash"])
    if n_rows is None:
        n_rows = slim.count()

    if n_rows <= driver_max_rows:
        import ray

        import pandas as pd

        frames = [
            b for b in slim.iter_batches(batch_size=1_048_576, batch_format="pandas")
        ]
        df = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            columns=["clip_id", "content_hash"]
        )
        reps = df.groupby("content_hash")["clip_id"].min()
        rep_of = reps.to_dict()
        rep_ref = [ray.put(rep_of)]

        class Star:
            def __init__(self):
                self.rep = ray.get(rep_ref[0])

            def __call__(self, batch: pa.Table) -> pa.Table:
                ids = batch.column("clip_id").to_pylist()
                hashes = batch.column("content_hash").to_pylist()
                a = [self.rep[h] for h in hashes]
                keep = np.fromiter(
                    (x < y for x, y in zip(a, ids)), dtype=bool, count=len(ids)
                )
                n = int(keep.sum())
                return _edges_table(
                    pa.array([x for x, k in zip(a, keep) if k], pa.string()),
                    pa.array([y for y, k in zip(ids, keep) if k], pa.string()),
                    np.ones(n, dtype=np.float64),
                    np.zeros(n, dtype=np.int64),
                    np.zeros(n, dtype=np.int64),
                    "exact",
                    None,
                )

        return slim.map_batches(Star, batch_format="pyarrow", concurrency=2)

    reps = slim.groupby("content_hash").min("clip_id")
    rep_col = [c for c in reps.schema().names if c != "content_hash"][0]

    joined = slim.join(
        reps,
        join_type="inner",
        on=("content_hash",),
        num_partitions=num_partitions,
    )

    def star(batch: pa.Table) -> pa.Table:
        a = batch.column(rep_col)
        b = batch.column("clip_id")
        mask = pc.less(a, b)
        t = batch.filter(mask)
        n = t.num_rows
        return _edges_table(
            t.column(rep_col),
            t.column("clip_id"),
            np.ones(n, dtype=np.float64),
            np.zeros(n, dtype=np.int64),
            np.zeros(n, dtype=np.int64),
            "exact",
            None,
        )

    return joined.map_batches(star, batch_format="pyarrow")


def verify_pairs(pairs_ds, sig_ds, cfg: PipelineConfig, n_clips: int | None = None,
                 num_partitions: int = 32, concurrency: int = 4):
    """Auto-select broadcast vs shuffle verification."""
    if n_clips is not None and n_clips <= cfg.broadcast_verify_max_rows:
        return verify_broadcast(pairs_ds, sig_ds, cfg, concurrency=concurrency)
    return verify_shuffle(pairs_ds, sig_ds, cfg, num_partitions=num_partitions)

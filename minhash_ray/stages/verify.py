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
        ("sim", pa.float64()),          # sketch estimator (reference query)
        ("jaccard", pa.float64()),      # exact shingle-set jaccard (-1 = not computed)
        ("audio_sim", pa.float64()),
        ("simhash_dist", pa.int64()),
        ("audio_fp_dist", pa.int64()),
        ("channel", pa.string()),
    ]
)


def _edges_table(ids_a, ids_b, sim, sh_dist, fp_dist, channel: str, keep_mask,
                 audio_sim=None, jaccard=None) -> pa.Table:
    if audio_sim is None:
        audio_sim = np.zeros(len(sim), dtype=np.float64)
    if jaccard is None:
        jaccard = np.full(len(sim), 1.0 if channel == "exact" else -1.0, dtype=np.float64)
    t = pa.table(
        {
            "clip_id_a": ids_a,
            "clip_id_b": ids_b,
            "sim": pa.array(sim, pa.float64()),
            "jaccard": pa.array(jaccard, pa.float64()),
            "audio_sim": pa.array(audio_sim, pa.float64()),
            "simhash_dist": pa.array(sh_dist, pa.int64()),
            "audio_fp_dist": pa.array(fp_dist, pa.int64()),
            "channel": pa.array([channel] * len(sim), pa.string()),
        },
        schema=EDGES_SCHEMA,
    )
    return t.filter(pa.array(keep_mask)) if keep_mask is not None else t


def make_broadcast_verifier(pack_ref, cfg: PipelineConfig):
    """Verify stage as a plain task fn: the broadcast signature pack is
    fetched through the per-worker-process cache (numpy arrays are
    zero-copy views of the shared object store), so tasks stay elastic —
    no actor pool reserving CPUs while upstream stages run."""
    threshold = cfg.tau - cfg.verify_margin
    tau = cfg.tau
    audio_tau = cfg.audio_tau

    def verify(batch: pa.Table) -> pa.Table:
        from minhash_ray.util import cached_get

        pack = cached_get(pack_ref[0])
        ids_sorted, sigs = pack["ids_sorted"], pack["sigs"]
        ids_a = batch.column("clip_id_a")
        ids_b = batch.column("clip_id_b")
        idx_a = np.searchsorted(ids_sorted, np.array(ids_a.to_pylist(), dtype="S"))
        idx_b = np.searchsorted(ids_sorted, np.array(ids_b.to_pylist(), dtype="S"))
        sim = estimate_similarity(sigs[idx_a], sigs[idx_b])
        sh = hamming_distance(pack["simhash"][idx_a], pack["simhash"][idx_b])
        fp = hamming_distance(pack["audio_fp"][idx_a], pack["audio_fp"][idx_b])
        audio_sigs = pack.get("audio_sigs")
        if audio_sigs is not None:
            # exclude all-INFTY (empty payload) sketches from matching 1.0
            asim = estimate_similarity(audio_sigs[idx_a], audio_sigs[idx_b])
            nonempty = ~(
                (audio_sigs[idx_a] == np.uint64(2**64 - 1)).all(axis=1)
                & (audio_sigs[idx_b] == np.uint64(2**64 - 1)).all(axis=1)
            )
            asim = asim * nonempty
        else:
            asim = np.zeros(len(sim), dtype=np.float64)

        shingles = pack.get("shingles")
        if shingles is not None:
            # exact verification: candidate generation came from the sketch
            # bands, but the kept edge is gated on the TRUE shingle-set
            # jaccard — no estimator variance at the tau boundary (standard
            # LSH verify step; the estimator value is still reported)
            offs = pack["shingle_offsets"]
            jacc = np.empty(len(sim), dtype=np.float64)
            for i in range(len(sim)):
                a0, a1 = offs[idx_a[i]], offs[idx_a[i] + 1]
                b0, b1 = offs[idx_b[i]], offs[idx_b[i] + 1]
                na, nb = a1 - a0, b1 - b0
                if na == 0 or nb == 0:
                    jacc[i] = 0.0
                    continue
                inter = len(
                    np.intersect1d(shingles[a0:a1], shingles[b0:b1], assume_unique=True)
                )
                jacc[i] = inter / (na + nb - inter)
            keep = (jacc >= tau) | (asim >= audio_tau)
            return _edges_table(
                ids_a, ids_b, sim, sh, fp, "minhash", keep, audio_sim=asim, jaccard=jacc
            )

        keep = (sim >= threshold) | (asim >= audio_tau)
        return _edges_table(ids_a, ids_b, sim, sh, fp, "minhash", keep, audio_sim=asim)

    return verify


def driver_exact_edges_table(ids, hashes) -> pa.Table:
    """Exact-duplicate star edges computed driver-side (vectorized pandas
    transform-min).  ids/hashes: equal-length sequences."""
    import pandas as pd

    df = pd.DataFrame({"clip_id": ids, "content_hash": hashes})
    rep = df.groupby("content_hash")["clip_id"].transform("min")
    mask = (rep < df["clip_id"]).to_numpy()
    n = int(mask.sum())
    return _edges_table(
        pa.array(rep[mask].tolist(), pa.string()),
        pa.array(df["clip_id"][mask].tolist(), pa.string()),
        np.ones(n, dtype=np.float64),
        np.zeros(n, dtype=np.int64),
        np.zeros(n, dtype=np.int64),
        "exact",
        None,
    )


def build_broadcast_pack(sig_ds, cfg: PipelineConfig, with_content: bool = False):
    """Collect the signature table into numpy matrices + sorted-id index and
    ``ray.put`` it once.  Only valid under ``broadcast_verify_max_rows``.

    With ``with_content=True`` the same single driver pass also returns the
    exact-duplicate star-edge table (no separate stage or second scan).
    """
    import ray

    from minhash_ray.stages.signature import signature_matrix

    schema_names = sig_ds.schema().names
    cols = ["clip_id", "signature", "simhash", "audio_fp"]
    have_audio = "audio_sig" in schema_names
    if have_audio:
        cols.append("audio_sig")
    if with_content:
        cols.append("content_hash")
    have_shingles = cfg.exact_verify and "shingles" in schema_names
    have_transcript = cfg.exact_verify and not have_shingles and "transcript" in schema_names
    if have_shingles:
        cols.append("shingles")
    elif have_transcript:
        cols.append("transcript")
    tables = []
    for batch in sig_ds.select_columns(cols).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        tables.append(batch)
    t = pa.concat_tables(tables)
    # the pack is pure numpy (no python dict): workers get zero-copy plasma
    # views with no per-process deserialization cost — a dict index costs
    # ~1 s per worker process and therefore ANTI-scales with worker count.
    # ids are kept as a sorted fixed-width byte array; lookup = searchsorted.
    ids = np.array(t.column("clip_id").to_pylist(), dtype="S")
    order = np.argsort(ids)
    pack = {
        "ids_sorted": ids[order],
        "sigs": signature_matrix(t, cfg.num_perm)[order],
        "simhash": np.ascontiguousarray(t.column("simhash").to_numpy(), dtype=np.uint64)[order],
        "audio_fp": np.ascontiguousarray(t.column("audio_fp").to_numpy(), dtype=np.uint64)[order],
    }
    if have_audio:
        col = t.column("audio_sig")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        pack["audio_sigs"] = (
            col.flatten().to_numpy(zero_copy_only=False).reshape(-1, cfg.audio_num_perm)[order]
        )
    if have_shingles or have_transcript:
        # per-row sorted-unique shingle sets for exact verification, laid
        # out flat + offsets in the same sorted-id order as the matrices.
        # Normally read straight from the (parallel-computed) `shingles`
        # column; the transcript fallback recomputes driver-side.
        if have_shingles:
            col = t.column("shingles")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            ss = np.ascontiguousarray(
                col.flatten().to_numpy(zero_copy_only=False), dtype=np.uint64
            )
            raw_offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            ucounts = np.diff(raw_offs)
            uoffs = raw_offs
        else:
            from minhash_ray.functions.shingles import shingles_for_config

            texts = t.column("transcript")
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            sh, counts = shingles_for_config(texts, cfg)
            n_rows = len(counts)
            row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
            o2 = np.lexsort((sh, row_ids))
            rs, ss_all = row_ids[o2], sh[o2]
            uniq_mask = np.ones(len(rs), dtype=bool)
            if len(rs) > 1:
                uniq_mask[1:] = (rs[1:] != rs[:-1]) | (ss_all[1:] != ss_all[:-1])
            rs, ss = rs[uniq_mask], ss_all[uniq_mask]
            ucounts = np.bincount(rs, minlength=n_rows)
            uoffs = np.concatenate([[0], np.cumsum(ucounts)])
        # permute the variable-length segments into sorted-id order
        sc = ucounts[order]
        total = int(sc.sum())
        if total:
            seg_local = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(sc) - sc, sc
            )
            gather = np.repeat(uoffs[order], sc) + seg_local
            pack["shingles"] = np.ascontiguousarray(ss[gather])
        else:
            pack["shingles"] = np.empty(0, dtype=np.uint64)
        pack["shingle_offsets"] = np.concatenate([[0], np.cumsum(sc)]).astype(np.int64)
    refs = [ray.put(pack)]
    if with_content:
        exact_tbl = driver_exact_edges_table(
            t.column("clip_id").to_pylist(), t.column("content_hash").to_pylist()
        )
        return refs, exact_tbl
    return refs


def verify_broadcast(pairs_ds, sig_ds, cfg: PipelineConfig, concurrency: int = 4):
    pack_ref = build_broadcast_pack(sig_ds, cfg)
    return pairs_ds.map_batches(
        make_broadcast_verifier(pack_ref, cfg),
        batch_format="pyarrow",
        batch_size=65536,
    )


def verify_shuffle(pairs_ds, sig_ds, cfg: PipelineConfig, num_partitions: int = 32):
    """Scale path: attach signatures by two partitioned hash joins."""
    from minhash_ray.util import clamp_partitions

    num_partitions = clamp_partitions(num_partitions)
    cols = ["clip_id", "signature", "simhash", "audio_fp"]
    have_audio = "audio_sig" in sig_ds.schema().names
    if have_audio:
        cols.append("audio_sig")
    slim = sig_ds.select_columns(cols)

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
    audio_num_perm = cfg.audio_num_perm
    tau = cfg.tau - cfg.verify_margin
    audio_tau = cfg.audio_tau

    def compute(batch: pa.Table) -> pa.Table:
        def mat(name, width):
            col = batch.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return col.flatten().to_numpy(zero_copy_only=False).reshape(-1, width)

        def vec(name):
            return np.ascontiguousarray(batch.column(name).to_numpy(), dtype=np.uint64)

        # join suffixes: first join keeps right cols with _sa only on clash;
        # resolve by position — the first 'signature' is side A
        names = batch.column_names
        sig_cols = [c for c in names if c.startswith("signature")]
        simh_cols = [c for c in names if c.startswith("simhash")]
        fp_cols = [c for c in names if c.startswith("audio_fp")]
        audio_cols = [c for c in names if c.startswith("audio_sig")]
        sim = estimate_similarity(mat(sig_cols[0], num_perm), mat(sig_cols[1], num_perm))
        sh = hamming_distance(vec(simh_cols[0]), vec(simh_cols[1]))
        fp = hamming_distance(vec(fp_cols[0]), vec(fp_cols[1]))
        if len(audio_cols) == 2:
            aa = mat(audio_cols[0], audio_num_perm)
            ab = mat(audio_cols[1], audio_num_perm)
            asim = estimate_similarity(aa, ab)
            nonempty = ~(
                (aa == np.uint64(2**64 - 1)).all(axis=1)
                & (ab == np.uint64(2**64 - 1)).all(axis=1)
            )
            asim = asim * nonempty
        else:
            asim = np.zeros(len(sim), dtype=np.float64)
        keep = (sim >= tau) | (asim >= audio_tau)
        return _edges_table(
            batch.column("clip_id_a"), batch.column("clip_id_b"), sim, sh, fp,
            "minhash", keep, audio_sim=asim,
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
        # only hashes with >1 member can produce star edges — broadcast the
        # small dup-rep map as sorted numpy arrays (zero-copy per worker)
        sizes = df.groupby("content_hash")["clip_id"].size()
        dup = reps[sizes > 1]
        keys = np.array(dup.index.to_numpy(), dtype="S")
        vals = np.array(dup.to_numpy(), dtype="S")
        order = np.argsort(keys)
        rep_ref = [ray.put({"keys": keys[order], "vals": vals[order]})]

        def star_fn(batch: pa.Table) -> pa.Table:
            from minhash_ray.util import cached_get

            rep = cached_get(rep_ref[0])
            keys_s, vals_s = rep["keys"], rep["vals"]
            ids = np.array(batch.column("clip_id").to_pylist(), dtype="S")
            hashes = np.array(batch.column("content_hash").to_pylist(), dtype="S")
            if len(keys_s) == 0:
                return _edges_table(
                    pa.array([], pa.string()), pa.array([], pa.string()),
                    np.zeros(0), np.zeros(0, dtype=np.int64),
                    np.zeros(0, dtype=np.int64), "exact", None,
                )
            pos = np.searchsorted(keys_s, hashes)
            pos_c = np.minimum(pos, len(keys_s) - 1)
            found = keys_s[pos_c] == hashes
            a = vals_s[pos_c]
            keep = found & (a < ids)
            n = int(keep.sum())
            return _edges_table(
                pa.array([x.decode() for x in a[keep]], pa.string()),
                pa.array([x.decode() for x in ids[keep]], pa.string()),
                np.ones(n, dtype=np.float64),
                np.zeros(n, dtype=np.int64),
                np.zeros(n, dtype=np.int64),
                "exact",
                None,
            )

        return slim.map_batches(star_fn, batch_format="pyarrow")

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

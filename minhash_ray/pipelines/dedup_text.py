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


# shared vectorized digest machinery (minhash_ray/util.py) — also the
# content-hash kernel of the signature stage
from minhash_ray.util import DIGEST_PARAMS as _DIGEST_PARAMS
from minhash_ray.util import string_flat_offsets as _string_flat_offsets
from minhash_ray.util import wordpoly_digest_rows as _wordpoly_digest_rows


def _add_text_digest(batch: pa.Table) -> pa.Table:
    """Append the 128-bit text digest as two int64 key columns (dg0, dg1) —
    the exact-identity shuffle key shared by exact_dedup and the tiered
    pipeline (16-byte keys instead of whole documents in the shuffle)."""
    flat, offs = _string_flat_offsets(batch.column("text"))
    cols = {"doc_id": batch.column("doc_id"), "text": batch.column("text")}
    with np.errstate(over="ignore"):
        for i, (seed, mult) in enumerate(_DIGEST_PARAMS):
            M = np.uint64(mult)
            d = np.uint64(seed) * M + _wordpoly_digest_rows(flat, offs, mult)
            cols[f"dg{i}"] = pa.array(d.view(np.int64), pa.int64())
    return pa.table(cols)


def exact_dedup(sf_dir: str):
    """One row per distinct text: the minimum doc_id of its group.

    Exact dedup = hash-partitioned groupby + vectorized min aggregate,
    keyed on a 128-bit text digest (two independent word-polynomial
    hashes) instead of the raw string — the shuffle hashes/compares 16-byte
    keys, not whole documents; the text itself rides as an aggregated
    payload (all group members are identical, so min(text) IS the text).
    Distinct digests are corpus-width, so the fold is per-batch Arrow
    partials through a digest-hash partition (``fold_by_int_keys``),
    never a Ray aggregate over them."""
    from minhash_ray.util import fold_by_int_keys

    ds = _docs(sf_dir, ["doc_id", "text"])
    keyed = ds.map_batches(_add_text_digest, batch_format="pyarrow")

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(["dg0", "dg1"]).aggregate(
            [("doc_id", "min"), ("text", "min")]
        )
        return pa.table(
            {
                "dg0": agg.column("dg0"),
                "dg1": agg.column("dg1"),
                "doc_id": agg.column("doc_id_min"),
                "text": agg.column("text_min"),
            }
        )

    def final(t: pa.Table) -> pa.Table:
        agg = t.group_by(["dg0", "dg1"]).aggregate(
            [("doc_id", "min"), ("text", "min")]
        )
        return pa.table(
            {"doc_id": agg.column("doc_id_min"), "text": agg.column("text_min")}
        )

    return fold_by_int_keys(keyed, ["dg0", "dg1"], partial, final, 8)


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


# per-worker-process stage cache (same pattern as
# stages/signature.make_signature_fn): coefficient tables build once per
# worker while the operator stays a fusable TASK pool — a fixed actor pool
# here cost ~1-2 s of spin-up on EVERY document query for a stage whose
# state is a few KB of seeded coefficients
_DOC_STAGE_CACHE: dict = {}


def make_doc_signature_fn(cfg: PipelineConfig):
    def doc_signature_fn(batch: pa.Table) -> pa.Table:
        stage = _DOC_STAGE_CACHE.get(cfg)
        if stage is None:
            stage = DocSignatureStage(cfg)
            _DOC_STAGE_CACHE[cfg] = stage
        return stage(batch)

    return doc_signature_fn


def doc_signatures(sf_dir: str, cfg: PipelineConfig = DOC_CFG, docs=None):
    """doc_id, signature(list<u64,k>), simhash, n_shingles.

    ``docs`` overrides the source dataset (any Dataset with doc_id + text —
    e.g. the exact-tier survivors in :func:`doc_dedup_tiered`)."""
    if docs is None:
        docs = _docs(sf_dir, ["doc_id", "text"])
    return docs.map_batches(
        make_doc_signature_fn(cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_size or None,
    )


def simhash_fingerprints(sf_dir: str, cfg: PipelineConfig = DOC_CFG):
    """doc_id, simhash (as int64 for plain-SQL-friendly schema: value is the
    64-bit fingerprint reinterpreted, deterministic)."""
    sigs = doc_signatures(sf_dir, cfg)

    def project(batch: pa.Table) -> pa.Table:
        sh = np.ascontiguousarray(batch.column("simhash").to_numpy()).view(np.int64)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "simhash": pa.array(sh, pa.int64())}
        )

    return sigs.map_batches(project, batch_format="pyarrow")


def minhash_dup_pairs(sf_dir: str, cfg: PipelineConfig = DOC_CFG, num_partitions: int = 8,
                      docs=None, sigs=None):
    """Near-duplicate pairs (doc_id_a < doc_id_b, sim >= tau-margin) via the
    full LSH pipeline: banding → salted bucket self-join → verified
    estimator (reference query semantics, src/serial/minhash-serial.c:16-26).

    ``docs`` overrides the source dataset (doc_id + text columns);
    ``sigs`` supplies already-materialized :func:`doc_signatures` output
    (the tiered pipeline computes/checkpoints it once and passes it in)."""
    from minhash_ray.stages.banding import make_minhash_band_fn
    from minhash_ray.stages.candidates import candidate_pairs

    if sigs is None:
        sigs = doc_signatures(sf_dir, cfg, docs=docs).materialize()

    def with_str_ids(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.utf8_lpad(pc.cast(batch.column("doc_id"), pa.string()), 12, "0")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "clip_id": ids,
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

    # verify via the broadcast/shuffle auto-switch: documents tables are
    # usually far under ``broadcast_verify_max_rows`` and take the pack
    # path, but a corpus-scale run flips to the two-slim-join shuffle
    # attach with IDENTICAL edge semantics (proven bit-identical by
    # test_doc_lsh_shuffle_verify_matches_broadcast)
    from minhash_ray.stages.verify import verify_pairs

    def add_audio_fp(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "audio_fp", pa.array(np.zeros(batch.num_rows, dtype=np.uint64), pa.uint64())
        )

    n_docs = keyed.count()
    edges = verify_pairs(
        pairs,
        keyed.map_batches(add_audio_fp, batch_format="pyarrow"),
        cfg,
        n_clips=n_docs,
        num_partitions=num_partitions,
    ).materialize()

    def to_doc_ids(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id_a": pc.cast(batch.column("clip_id_a"), pa.int64()),
                "doc_id_b": pc.cast(batch.column("clip_id_b"), pa.int64()),
                "sim": batch.column("sim"),
            }
        )

    out = edges.map_batches(to_doc_ids, batch_format="pyarrow")

    # the local pair-dedupe strategy tolerates cross-batch duplicates for
    # clustering; a user-facing pair list should be unique and ordered
    return _dedupe_sorted_pairs(out, val_col="sim")


def bbit_threshold(tau: float, b: int) -> float:
    """b-bit collision-corrected match-fraction threshold (Li & König
    2010): two docs with Jaccard R agree on a b-bit slot with probability
    E = C + (1-C)·R where C = 2^-b is the random-collision baseline, so
    gating the b-bit match fraction at C + tau·(1-C) keeps exactly the
    pairs a full-width estimator would keep at tau (in expectation)."""
    c = 1.0 / (1 << b)
    return c + tau * (1.0 - c)


def bbit_minhash_pairs(
    sf_dir: str,
    b: int = 8,
    cfg: PipelineConfig = DOC_CFG,
    num_partitions: int = 8,
    docs=None,
):
    """(doc_id_a, doc_id_b, sim, est_jaccard): near-dup pairs from b-BIT
    MinHash (Li & König 2010) — each of the k sketch slots keeps only its
    low ``b`` bits, shrinking signature bytes (and therefore the LSH band
    shuffle + verify-pack traffic, the dominant movers at 10^12 docs) by
    64/b with a quantified variance cost instead of a recall cliff.

    The masked sketch rides the UNCHANGED production machinery — the same
    band fold, salted bucket shuffle, and broadcast/shuffle auto-switch
    verify as :func:`minhash_dup_pairs` — only the estimator gate moves to
    the collision-corrected threshold ``bbit_threshold(tau - margin, b)``.
    ``sim`` is the raw b-bit match fraction; ``est_jaccard`` is the
    unbiased Jaccard estimate (E - C)/(1 - C) = (sim·k·2^b - k)/(k·(2^b-1))
    — exact-integer operands and one IEEE division, so the DuckDB oracle
    reproduces it bit-for-bit."""
    import dataclasses

    if not (1 <= b <= 32):
        raise ValueError("b must be in [1, 32]")
    mask = np.uint64((1 << b) - 1)
    k = cfg.num_perm
    thr = bbit_threshold(cfg.tau - cfg.verify_margin, b)
    # verify_margin=0 so the verifier's gate is EXACTLY thr (adding then
    # re-subtracting a margin would perturb the float literal the oracle
    # replays)
    cfg2 = dataclasses.replace(cfg, tau=thr, verify_margin=0.0)

    def mask_fn(batch: pa.Table) -> pa.Table:
        sig = batch.column("signature")
        if isinstance(sig, pa.ChunkedArray):
            sig = sig.combine_chunks()
        vals = sig.values.to_numpy(zero_copy_only=False).astype(np.uint64) & mask
        masked = pa.FixedSizeListArray.from_arrays(pa.array(vals, pa.uint64()), k)
        return batch.set_column(
            batch.schema.get_field_index("signature"), "signature", masked
        )

    sigs = doc_signatures(sf_dir, cfg, docs=docs).map_batches(
        mask_fn, batch_format="pyarrow"
    )
    pairs = minhash_dup_pairs(sf_dir, cfg2, num_partitions=num_partitions, sigs=sigs)

    # edge lists are metadata-scale (pa.Table); append the unbiased estimate
    num = 1 << b
    sim = pairs.column("sim").to_numpy(zero_copy_only=False)
    est = (sim * k * num - k) / (k * (num - 1))
    return pairs.append_column("est_jaccard", pa.array(est, pa.float64()))


def simhash_dup_pairs(
    sf_dir: str,
    cfg: PipelineConfig = DOC_CFG,
    max_hamming: int = 8,
    num_partitions: int = 8,
    docs=None,
):
    """All doc pairs within ``max_hamming`` SimHash bits — EXACT-recall
    near-dup pairs via the pigeonhole chunk banding (any pair differing in
    ≤ d of 64 bits must agree on at least one of d+1 bit-chunks), then an
    exact Hamming verification.  Below ``cfg.broadcast_verify_max_rows``
    docs the fingerprints are verified against a broadcast pack
    (doc-id-sorted numpy arrays, 16 B/doc, accumulated vectorized — no
    per-row Python); above it the pack is replaced by two slim
    ``Dataset.join`` attaches of the (clip_id, simhash) table — the
    ``verify_shuffle`` pattern — so no whole-corpus driver gather remains
    at scale (both paths proven bit-identical by
    test_simhash_join_attach_matches_broadcast).  Zero-shingle docs never
    band (their all-zero fingerprints would cross-link unrelated empty
    docs).  SQL-checked: the DuckDB oracle replays the fingerprint chain
    and an O(n²) ``bit_count(xor(...))`` self-join exactly."""
    import pyarrow.compute as pc

    import ray

    from minhash_ray.functions.simhash import hamming_distance
    from minhash_ray.stages.banding import make_simhash_band_fn
    from minhash_ray.stages.candidates import candidate_pairs

    sigs = doc_signatures(sf_dir, cfg, docs=docs).materialize()

    def with_str_ids(batch: pa.Table) -> pa.Table:
        ids = pc.utf8_lpad(pc.cast(batch.column("doc_id"), pa.string()), 12, "0")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "clip_id": ids,
                "simhash": batch.column("simhash"),
                "n_shingles": batch.column("n_shingles"),
            }
        )

    keyed = sigs.map_batches(with_str_ids, batch_format="pyarrow")
    band_rows = keyed.map_batches(
        make_simhash_band_fn(max_hamming + 1), batch_format="pyarrow"
    )
    exact_cfg = cfg.with_(salt_hot_bands=False, band_group_cap=1_000_000_000)
    pairs = candidate_pairs(band_rows, exact_cfg, num_partitions=num_partitions).materialize()

    n_docs = sigs.count()
    if n_docs <= cfg.broadcast_verify_max_rows:
        ids_parts: list[np.ndarray] = []
        sh_parts: list[np.ndarray] = []
        for b in sigs.select_columns(["doc_id", "simhash"]).iter_batches(
            batch_size=1_048_576, batch_format="pyarrow"
        ):
            ids_parts.append(
                np.ascontiguousarray(b.column("doc_id").to_numpy(), dtype=np.int64)
            )
            sh_parts.append(
                np.ascontiguousarray(b.column("simhash").to_numpy(), dtype=np.uint64)
            )
        ids_np = np.concatenate(ids_parts) if ids_parts else np.empty(0, dtype=np.int64)
        sh_np = np.concatenate(sh_parts) if sh_parts else np.empty(0, dtype=np.uint64)
        o = np.argsort(ids_np)
        pack_ref = [ray.put({"ids": ids_np[o], "sh": sh_np[o]})]

        def verify(batch: pa.Table) -> pa.Table:
            from minhash_ray.util import cached_get

            pack = cached_get(pack_ref[0])
            a = pc.cast(batch.column("clip_id_a"), pa.int64()).to_numpy()
            b = pc.cast(batch.column("clip_id_b"), pa.int64()).to_numpy()
            ia = np.searchsorted(pack["ids"], a)
            ib = np.searchsorted(pack["ids"], b)
            d = hamming_distance(pack["sh"][ia], pack["sh"][ib]).astype(np.int64)
            keep = d <= max_hamming
            return pa.table(
                {
                    "doc_id_a": pa.array(a[keep], pa.int64()),
                    "doc_id_b": pa.array(b[keep], pa.int64()),
                    "hamming": pa.array(d[keep], pa.int64()),
                }
            )

        verified = pairs.map_batches(verify, batch_format="pyarrow", batch_size=8192)
    else:
        # join-attach scale path: two slim partitioned joins of the
        # (clip_id, simhash) table — 16 B/doc payload, no driver gather
        from minhash_ray.util import strip_empty_blocks

        def fp_side(suffix: str):
            def rename(batch: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "clip_id": batch.column("clip_id"),
                        f"sh_{suffix}": batch.column("simhash"),
                    }
                )

            return keyed.map_batches(rename, batch_format="pyarrow")

        with_a = pairs.join(
            fp_side("a"),
            join_type="inner",
            on=("clip_id_a",),
            right_on=("clip_id",),
            num_partitions=num_partitions,
        )
        # barrier between chained joins: join #1 can finalize empty
        # partitions as schema-less blocks that break join #2's schema
        # broadcast (util.strip_empty_blocks docstring)
        with_ab = strip_empty_blocks(with_a).join(
            fp_side("b"),
            join_type="inner",
            on=("clip_id_b",),
            right_on=("clip_id",),
            num_partitions=num_partitions,
        )

        def ham_gate(batch: pa.Table) -> pa.Table:
            a = pc.cast(batch.column("clip_id_a"), pa.int64()).to_numpy()
            b = pc.cast(batch.column("clip_id_b"), pa.int64()).to_numpy()
            sa = np.ascontiguousarray(batch.column("sh_a").to_numpy(), dtype=np.uint64)
            sb = np.ascontiguousarray(batch.column("sh_b").to_numpy(), dtype=np.uint64)
            d = hamming_distance(sa, sb).astype(np.int64)
            keep = d <= max_hamming
            return pa.table(
                {
                    "doc_id_a": pa.array(a[keep], pa.int64()),
                    "doc_id_b": pa.array(b[keep], pa.int64()),
                    "hamming": pa.array(d[keep], pa.int64()),
                }
            )

        verified = with_ab.map_batches(ham_gate, batch_format="pyarrow")
    return _dedupe_sorted_pairs(verified, val_col="hamming", val_type=pa.int64())


def _doc_shingle_sets(sf_dir: str, cfg: PipelineConfig, docs=None):
    """documents → {doc_id, shingles (sorted-unique list<u64>), n}.
    ``docs`` overrides the source dataset (doc_id + text columns)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        shingles, counts = shingles_for_config(texts, cfg)
        n = batch.num_rows
        row_ids = np.repeat(np.arange(n, dtype=np.int64), counts)
        o = np.lexsort((shingles, row_ids))
        rs, ss = row_ids[o], shingles[o]
        uniq = np.ones(len(rs), dtype=bool)
        if len(rs) > 1:
            uniq[1:] = (rs[1:] != rs[:-1]) | (ss[1:] != ss[:-1])
        rs_u, ss_u = rs[uniq], ss[uniq]
        ucounts = np.bincount(rs_u, minlength=n).astype(np.int64)
        col = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(ucounts)]), pa.int32()),
            pa.array(ss_u, pa.uint64()),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "shingles": col,
                "n": pa.array(ucounts, pa.int64()),
            }
        )

    if docs is None:
        docs = _docs(sf_dir, ["doc_id", "text"])
    return docs.map_batches(fn, batch_format="pyarrow")


def ngram_jaccard_pairs(
    sf_dir: str,
    cfg: PipelineConfig = DOC_CFG,
    threshold: float = 0.3,
    broadcast_max_rows: int = 2_000_000,
    num_partitions: int = 8,
    docs=None,
):
    """EXACT token-trigram-set Jaccard similarity self-join: ALL doc pairs
    with true Jaccard >= threshold, via prefix filtering (AllPairs/PPJoin,
    Bayardo et al. 2007 "Scaling up all pairs similarity search"; Xiao et
    al. 2008): with each doc's sorted-unique shingle set, any pair at
    J >= t must share an element among the first ``n - ceil(t*n) + 1``
    shingles of BOTH sets under the global order, so only those prefix
    shingles are indexed (a groupby-bucket shuffle), and candidates are
    verified against the true sets.  Exact — unlike the MinHash-LSH path
    above — and SQL-expressible, so it carries a DuckDB oracle.

    Verification auto-switches like the clips pipeline: corpora up to
    ``broadcast_max_rows`` docs broadcast the flat+offsets shingle pack
    once; beyond it the shingle sets are attached to the candidate pairs
    by two partitioned hash joins (packed as binary through the join — the
    ``stages/verify.verify_shuffle`` pattern), so nothing ever
    materializes the whole corpus.  Both paths apply the identical PPJoin
    length filter + exact-Jaccard gate (proven bit-identical in
    ``test_ngram_join_verify_path_is_bit_identical``).
    """
    sets_ds = _doc_shingle_sets(sf_dir, cfg, docs=docs).materialize()
    return _set_jaccard_pairs(
        sets_ds, cfg, threshold, broadcast_max_rows, num_partitions
    )


def _df_table(sets_ds):
    """Materialized (e, sum(c)) global document-frequency aggregate over
    the sets' elements — the single df pass shared by the AllPairs prefix
    order and the dense small-vocabulary switch.  Metadata-per-element:
    stays a Dataset (never gathered) so the vocabulary can be corpus-scale
    — which is exactly why the fold rides ``fold_by_int_keys`` (per-batch
    Arrow partials through an element-hash partition) and never hands
    Ray's aggregate the vocabulary as groups."""
    import pyarrow.compute as pc

    from minhash_ray.stages.verify import _list_flat_offsets
    from minhash_ray.util import fold_by_int_keys

    def df_partial(batch: pa.Table) -> pa.Table:
        flat, _offs = _list_flat_offsets(batch.column("shingles"))
        u, c = np.unique(flat, return_counts=True)     # per-doc unique already
        # int64 two's-complement view: Ray's groupby shuffle rejects
        # uint64 values above int64 max (bijective, viewed back below)
        return pa.table(
            {"e": pa.array(u.view(np.int64), pa.int64()),
             "c": pa.array(c.astype(np.int64), pa.int64())}
        )

    def df_final(t: pa.Table) -> pa.Table:
        agg = t.group_by("e").aggregate([("c", "sum")])
        return pa.table(
            {"e": agg.column("e"), "sum(c)": pc.cast(agg.column("c_sum"), pa.int64())}
        )

    return fold_by_int_keys(sets_ds, ["e"], df_partial, df_final, 8).materialize()


def _df_order_ref(sets_ds, n_docs: int, df_agg=None):
    """Build + broadcast the global document-frequency hot table backing
    the AllPairs rare-first prefix order (Bayardo/Ma/Srikant §3.1): the
    prefix-filter lemma holds for ANY total order shared by both sides,
    and taking each set's RAREST elements first minimizes how often two
    sets collide on a common element — without it, a corpus whose
    elements are all frequent (small vocab, unigram multisets) floods
    the bucket self-join with near-all-pairs candidates.  The order used:
    elements absent from the hot table first (by value), then hot
    elements by ascending document frequency (by value within ties).
    The hot table is metadata-scale by construction (df >= hot floor,
    capped at the hottest ``max_hot``) so it broadcasts at any corpus
    size; a capped-out table only degrades ordering quality, never
    exactness.  Returns a one-element list holding the ``ray.put`` ref
    (list wrapper keeps the ref out of Ray's closure capture).

    ``df_agg`` optionally supplies the already-materialized (e, sum(c))
    aggregate from :func:`_df_table` so callers that need the distinct
    count too pay the df pass once."""
    import ray

    if df_agg is None:
        df_agg = _df_table(sets_ds)

    hot_df_floor = max(64, n_docs // 1000)
    max_hot = 1 << 18
    df_ds = (
        df_agg.map_batches(
            lambda t: t.filter(
                pa.array(
                    np.asarray(t.column("sum(c)").to_numpy(zero_copy_only=False))
                    >= hot_df_floor
                )
            ),
            batch_format="pyarrow",
        )
        .sort("sum(c)", descending=True)
        .limit(max_hot)
    )
    hot_batches = list(df_ds.iter_batches(batch_size=max_hot, batch_format="pyarrow"))
    hot_tbl = pa.concat_tables(hot_batches) if hot_batches else None
    if hot_tbl is not None and hot_tbl.num_rows:
        he = np.ascontiguousarray(
            hot_tbl.column("e").to_numpy(zero_copy_only=False).astype(np.int64)
        ).view(np.uint64)
        hd = np.asarray(hot_tbl.column("sum(c)").to_numpy(), dtype=np.int64)
        o_he = np.argsort(he)
        hot_pack = {"e": he[o_he], "df": hd[o_he]}
    else:
        hot_pack = {"e": np.empty(0, np.uint64), "df": np.empty(0, np.int64)}
    return [ray.put(hot_pack)]


def _df_order_perm(flat, offs, counts, hot):
    """Per-batch permutation realizing the rare-first order of
    :func:`_df_order_ref` within each set (sets stay contiguous)."""
    parents = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    if len(hot["e"]):
        pos = np.searchsorted(hot["e"], flat)
        pos = np.minimum(pos, len(hot["e"]) - 1)
        is_hot = hot["e"][pos] == flat
        df_key = np.where(is_hot, hot["df"][pos], 0)
        return np.lexsort((flat, df_key, is_hot.astype(np.int8), parents))
    return np.arange(len(flat))              # per-doc value order (sorted)


# dense small-vocabulary switch: when the GLOBAL distinct-element count
# collapses (measured by the df pass we run anyway), AllPairs prefix
# filtering degenerates — every element is frequent, candidates approach
# all-pairs (measured 63M join rows for 5000 docs / 315 elements on the
# sf0.1 unigram-multiset corpus) — while the whole corpus's incidence
# structure fits in one broadcastable matrix.  The gate BOUNDS the
# broadcast by construction: V <= _DENSE_VOCAB_MAX and n·V <=
# _DENSE_CELLS_MAX cells (float32 pack <= 256 MB).  Real web-scale text
# never trips it (trigram vocab is corpus-scale); degenerate/boilerplate
# element spaces do, exactly where the prefix path melts down.
_DENSE_VOCAB_MAX = 4096
_DENSE_CELLS_MAX = 1 << 26


def _dense_set_jaccard(sets_ds, df_agg, threshold: float, n_docs: int) -> pa.Table:
    """Exact set-Jaccard self-join by blocked incidence matmul: docs ×
    elements 0/1 matrix (gate-bounded, broadcast once), row-chunk tasks
    compute chunk·Mᵀ (float32 dot products are EXACT here — every count
    <= V <= 4096 < 2^24), gate ``inter/(na+nb-inter) >= t`` with the same
    int64→float64 division as the sparse verify, emit a < b pairs.
    Bit-identical to the AllPairs path (goldened + oracle-checked)."""
    import ray

    from minhash_ray.stages.verify import _list_flat_offsets

    et = pa.concat_tables(
        list(df_agg.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    )
    elems = np.sort(
        np.ascontiguousarray(
            et.column("e").to_numpy(zero_copy_only=False).astype(np.int64)
        ).view(np.uint64)
    )
    V = len(elems)

    st = pa.concat_tables(
        list(sets_ds.iter_batches(batch_size=1 << 16, batch_format="pyarrow"))
    )
    ids = np.asarray(st.column("doc_id").to_numpy(), dtype=np.int64)
    col = st.column("shingles")
    flat, offs = _list_flat_offsets(
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    )
    order = np.argsort(ids)
    n = len(ids)
    M = np.zeros((n, V), dtype=np.float32)
    counts = np.diff(offs)
    row_of = np.empty(n, dtype=np.int64)
    row_of[order] = np.arange(n)
    rows = np.repeat(row_of, counts)
    M[rows, np.searchsorted(elems, flat)] = 1.0
    ids_sorted = ids[order]
    sizes = M.sum(axis=1).astype(np.int64)
    pack_ref = ray.put((ids_sorted, M, sizes))

    @ray.remote
    def block(lo: int, hi: int, pack):
        # pack is the ray.put ref passed as a task arg: Ray auto-resolves
        # it to the (ids, M, sizes) tuple with zero-copy numpy views
        ids_s, M_, sz = pack
        S = M_[lo:hi] @ M_.T                      # exact integer values in f32
        inter = np.rint(S).astype(np.int64)
        na = sz[lo:hi, None]
        union = na + sz[None, :] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            jacc = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = jacc >= threshold
        # strict upper triangle in GLOBAL row order → a < b, no self-pairs
        gi = np.arange(lo, hi)[:, None]
        keep &= np.arange(len(ids_s))[None, :] > gi
        r, c = np.nonzero(keep)
        return pa.table(
            {
                "doc_id_a": pa.array(ids_s[lo + r], pa.int64()),
                "doc_id_b": pa.array(ids_s[c], pa.int64()),
                "jaccard": pa.array(jacc[r, c], pa.float64()),
            }
        )

    chunk = max(256, min(4096, -(-n // max(1, 4 * 8))))
    outs = ray.get(
        [block.remote(lo, min(lo + chunk, n), pack_ref) for lo in range(0, n, chunk)]
    )
    nonempty = [o for o in outs if o.num_rows]
    if not nonempty:
        return pa.table(
            {
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    t = pa.concat_tables(nonempty)
    a = t.column("doc_id_a").to_numpy()
    b = t.column("doc_id_b").to_numpy()
    o = np.lexsort((b, a))
    return t.take(pa.array(o))


def _set_jaccard_pairs(
    sets_ds,
    cfg: PipelineConfig,
    threshold: float,
    broadcast_max_rows: int,
    num_partitions: int,
) -> pa.Table:
    """The set-agnostic AllPairs/PPJoin machinery behind
    :func:`ngram_jaccard_pairs` and :func:`weighted_jaccard_pairs`:
    prefix-filter banding → candidate shuffle → exact-Jaccard verify
    (broadcast pack below ``broadcast_max_rows``, partitioned join-attach
    above, both bit-identical).  ``sets_ds`` is any Dataset shaped
    {doc_id int64, shingles sorted-unique list<u64>, n int64}."""
    import ray

    from minhash_ray.stages.verify import _list_flat_offsets

    n_docs = sets_ds.count()

    df_agg = _df_table(sets_ds)
    n_distinct = df_agg.count()
    if n_distinct <= _DENSE_VOCAB_MAX and n_docs * n_distinct <= _DENSE_CELLS_MAX:
        return _dense_set_jaccard(sets_ds, df_agg, threshold, n_docs)

    hot_ref = _df_order_ref(sets_ds, n_docs, df_agg=df_agg)

    def prefix_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from minhash_ray.functions.minhash import _seg_arange
        from minhash_ray.util import cached_get

        flat, offs = _list_flat_offsets(batch.column("shingles"))
        counts = np.diff(offs)
        L = np.clip(
            counts - np.ceil(threshold * counts).astype(np.int64) + 1, 0, counts
        ).astype(np.int64)
        perm = _df_order_perm(flat, offs, counts, cached_get(hot_ref[0]))
        sel = np.repeat(offs[:-1], L) + _seg_arange(L)
        gather = perm[sel]
        buckets = (flat[gather] >> np.uint64(1)).astype(np.int64)
        ids = pc.utf8_lpad(pc.cast(batch.column("doc_id"), pa.string()), 12, "0")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        out_ids = ids.take(pa.array(np.repeat(np.arange(batch.num_rows), L)))
        return pa.table(
            {
                "bucket": pa.array(buckets, pa.int64()),
                "clip_id": out_ids,
                "n": pa.array(np.repeat(counts, L), pa.int64()),
                "p": pa.array(_seg_arange(L), pa.int64()),
            }
        )

    # --- candidate generation: prefix self-join + PPJoin positional filter
    # (Xiao et al. §3): a pair sharing only LATE prefix elements cannot
    # reach the overlap the Jaccard gate requires — for the first common
    # element (shared total order) at 0-based positions (pa, pb),
    # overlap <= 1 + min(na-pa-1, nb-pb-1); pruning rows below o_min is
    # exactness-preserving because a qualifying pair's first-common-element
    # row always satisfies the bound.  o_min is the smallest integer o with
    # o/(na+nb-o) >= t under the SAME IEEE ops as the verify gate (±1
    # float-edge adjusted).  The length filter (min/max >= t) runs here
    # too, so size-implausible pairs never reach the distinct shuffle.
    from minhash_ray.stages.candidates import dedupe_pairs
    from minhash_ray.util import bytes_key_array, strip_empty_blocks

    pr = strip_empty_blocks(
        sets_ds.map_batches(prefix_rows, batch_format="pyarrow")
    ).materialize()
    joined = pr.join(
        pr, join_type="inner", on=("bucket",), right_suffix="_r",
        num_partitions=8,
    )

    def prune(batch: pa.Table) -> pa.Table:
        ka = bytes_key_array(batch.column("clip_id"))
        kb = bytes_key_array(batch.column("clip_id_r"))
        na = batch.column("n").to_numpy(zero_copy_only=False)
        nb = batch.column("n_r").to_numpy(zero_copy_only=False)
        pa_ = batch.column("p").to_numpy(zero_copy_only=False)
        pb_ = batch.column("p_r").to_numpy(zero_copy_only=False)
        keep = ka < kb
        keep &= np.minimum(na, nb) >= threshold * np.maximum(na, nb)
        s = na + nb
        o = np.maximum(
            np.ceil(threshold * s / (1.0 + threshold)).astype(np.int64), 1
        )
        om1 = np.maximum(o - 1, 1)
        o = np.where(om1 / (s - om1) >= threshold, om1, o)
        o = np.where(o / np.maximum(s - o, 1) >= threshold, o, o + 1)
        keep &= (1 + np.minimum(na - pa_ - 1, nb - pb_ - 1)) >= o
        idx = np.flatnonzero(keep)
        if len(idx):
            comb = np.char.add(ka[idx], kb[idx])
            _, first = np.unique(comb, return_index=True)   # batch-local distinct
            idx = idx[np.sort(first)]
        sel = pa.array(idx, pa.int64())
        return pa.table(
            {
                "clip_id_a": batch.column("clip_id").take(sel),
                "clip_id_b": batch.column("clip_id_r").take(sel),
            }
        )

    pruned = strip_empty_blocks(joined.map_batches(prune, batch_format="pyarrow"))
    pairs = dedupe_pairs(
        pruned, driver_max_rows=cfg.driver_agg_max_rows, num_partitions=8
    ).materialize()

    if n_docs > broadcast_max_rows:
        # scale path: attach the true shingle sets to the candidate pairs
        # by two partitioned hash joins (sets ride as packed binary — the
        # stages/verify.verify_shuffle pattern); same length filter + exact
        # jaccard gate as the broadcast path below, nothing driver-resident
        verified = _ngram_verify_join(
            pairs, sets_ds, threshold, num_partitions=num_partitions
        )
        return _dedupe_sorted_pairs(verified)

    # verification against the true sets: broadcast flat+offsets pack
    verified = _ngram_verify_broadcast(pairs, sets_ds, threshold)
    return _dedupe_sorted_pairs(verified)


def _ngram_verify_broadcast(pairs, sets_ds, threshold: float):
    """Small-corpus twin of :func:`_ngram_verify_join`: one flat+offsets
    shingle pack via ``ray.put`` (read per worker, never per task), PPJoin
    length filter, exact-Jaccard gate — bit-identical to the join path
    (proven in test_ngram_join_verify_path_is_bit_identical)."""
    import ray

    from minhash_ray.stages.verify import _list_flat_offsets

    t = pa.concat_tables(
        list(sets_ds.iter_batches(batch_size=65536, batch_format="pyarrow"))
    )
    ids_np = np.asarray(t.column("doc_id").to_numpy(), dtype=np.int64)
    order = np.argsort(ids_np)
    flat_all, offs_all = _list_flat_offsets(
        t.column("shingles").combine_chunks()
        if isinstance(t.column("shingles"), pa.ChunkedArray)
        else t.column("shingles")
    )
    counts_all = np.diff(offs_all)[order]
    sc = counts_all
    seg_local = (
        np.arange(int(sc.sum()), dtype=np.int64) - np.repeat(np.cumsum(sc) - sc, sc)
        if sc.sum()
        else np.empty(0, dtype=np.int64)
    )
    gather = np.repeat(offs_all[:-1][order], sc) + seg_local
    pack_ref = [ray.put({
        "ids": ids_np[order],
        "flat": np.ascontiguousarray(flat_all[gather]),
        "offs": np.concatenate([[0], np.cumsum(sc)]).astype(np.int64),
    })]

    def verify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from minhash_ray.functions.minhash import exact_jaccard_for_pairs
        from minhash_ray.util import cached_get

        pack = cached_get(pack_ref[0])
        a = pc.cast(batch.column("clip_id_a"), pa.int64()).to_numpy()
        b = pc.cast(batch.column("clip_id_b"), pa.int64()).to_numpy()
        idx_a = np.searchsorted(pack["ids"], a)
        idx_b = np.searchsorted(pack["ids"], b)
        # PPJoin length filter (exactness-preserving): J(A,B) <= min/max of
        # the set sizes, so size-mismatched candidates skip the expensive
        # exact intersection entirely
        counts = np.diff(pack["offs"])
        ca, cb = counts[idx_a], counts[idx_b]
        plausible = np.minimum(ca, cb) >= threshold * np.maximum(ca, cb)
        a, b = a[plausible], b[plausible]
        idx_a, idx_b = idx_a[plausible], idx_b[plausible]
        jacc = exact_jaccard_for_pairs(pack["flat"], pack["offs"], idx_a, idx_b)
        keep = jacc >= threshold
        return pa.table(
            {
                "doc_id_a": pa.array(a[keep], pa.int64()),
                "doc_id_b": pa.array(b[keep], pa.int64()),
                "jaccard": pa.array(jacc[keep], pa.float64()),
            }
        )

    # 8k-pair batches: candidate blocks are few and large (one per reducer
    # partition), and the exact-set lexsort is superlinear in batch mass —
    # without re-batching the verify runs on ~8 giant tasks
    return pairs.map_batches(verify, batch_format="pyarrow", batch_size=8192)


def _dedupe_sorted_pairs(verified, val_col: str = "jaccard", val_type=None) -> pa.Table:
    """Verified pair lists are metadata-scale (edges, not corpus): stream
    to the driver, one vectorized lexsort + mask dedupes and orders them —
    no repartition(1) single-block serialization, no pandas."""
    val_type = val_type or pa.float64()
    batches = list(verified.iter_batches(batch_size=1_048_576, batch_format="pyarrow"))
    if not batches:
        return pa.table(
            {
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
                val_col: pa.array([], val_type),
            }
        )
    vt = pa.concat_tables(batches)
    a = vt.column("doc_id_a").to_numpy()
    b = vt.column("doc_id_b").to_numpy()
    j = vt.column(val_col).to_numpy()
    o = np.lexsort((b, a))
    a, b, j = a[o], b[o], j[o]
    first = np.ones(len(a), dtype=bool)
    if len(a) > 1:
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return pa.table(
        {
            "doc_id_a": pa.array(a[first], pa.int64()),
            "doc_id_b": pa.array(b[first], pa.int64()),
            val_col: pa.array(j[first], val_type),
        }
    )


def _ngram_verify_join(pairs, sets_ds, threshold: float, num_partitions: int = 8):
    """Join-attach verifier for the exact n-gram join (the 10^12-doc path):
    candidate pairs get each side's sorted-unique shingle set attached via
    two partitioned ``Dataset.join``s (list<u64> packed as large_binary —
    Acero rejects list payloads), then the SAME PPJoin length filter and
    exact-Jaccard gate as the broadcast path run per batch."""
    import pyarrow.compute as pc

    from minhash_ray.stages.verify import _pack_u64_column, _unpack_u64_column
    from minhash_ray.util import clamp_partitions

    def int_pairs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id_a": pc.cast(batch.column("clip_id_a"), pa.int64()),
                "doc_id_b": pc.cast(batch.column("clip_id_b"), pa.int64()),
            }
        )

    ipairs = pairs.map_batches(int_pairs, batch_format="pyarrow")

    def side(suffix: str):
        def pack(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    f"sh_{suffix}": _pack_u64_column(batch.column("shingles")),
                }
            )

        return sets_ds.map_batches(pack, batch_format="pyarrow")

    np_parts = clamp_partitions(num_partitions)
    with_a = ipairs.join(
        side("a"), join_type="inner", on=("doc_id_a",), right_on=("doc_id",),
        num_partitions=np_parts,
    )
    from minhash_ray.util import strip_empty_blocks

    # mandatory barrier between chained joins (util.strip_empty_blocks doc)
    with_ab = strip_empty_blocks(with_a).join(
        side("b"), join_type="inner", on=("doc_id_b",), right_on=("doc_id",),
        num_partitions=np_parts,
    )

    def verify_join(batch: pa.Table) -> pa.Table:
        from minhash_ray.functions.minhash import exact_jaccard_for_pairs

        fa, oa = _unpack_u64_column(batch.column("sh_a"))
        fb, ob = _unpack_u64_column(batch.column("sh_b"))
        ca, cb = np.diff(oa), np.diff(ob)
        # PPJoin length filter — identical to the broadcast path
        plausible = np.flatnonzero(
            np.minimum(ca, cb) >= threshold * np.maximum(ca, cb)
        )
        n = batch.num_rows
        flat = np.concatenate([fa, fb])
        offs = np.concatenate([oa, len(fa) + ob[1:]])
        jacc = exact_jaccard_for_pairs(flat, offs, plausible, n + plausible)
        keep = jacc >= threshold
        sel = plausible[keep]
        return pa.table(
            {
                "doc_id_a": pc.take(batch.column("doc_id_a"), pa.array(sel)),
                "doc_id_b": pc.take(batch.column("doc_id_b"), pa.array(sel)),
                "jaccard": pa.array(jacc[keep], pa.float64()),
            }
        )

    return with_ab.map_batches(verify_join, batch_format="pyarrow", batch_size=8192)


def doc_minhash_slots(sf_dir: str, cfg: PipelineConfig = DOC_CFG, n_perms: int = 8):
    """The CORE REFERENCE SKETCH SEMANTICS as a SQL-checkable relation:
    (doc_id, perm, slot) where slot is the MinHash value of permutation
    ``perm`` over the doc's token-trigram shingles — i.e. ``basic_insert``
    min-fold of ``pairwise_func`` hashes (reference src/utils/utils.c:3-33,
    src/utils/hash.c:6-9), exploded long-form for the first ``n_perms``
    permutations.  The DuckDB oracle replays the ENTIRE hash chain
    (FNV-1a token hash → polynomial w-gram combine → ``((a·x mod 2^64)
    mod M + b) mod M`` with the seeded coefficient table embedded as
    literals) in HUGEINT arithmetic — the sketch algebra is therefore
    oracle-checked end-to-end, not just pytest-checked.

    Slots are int64-reinterpreted (INFTY → -1 for zero-shingle docs).
    """
    sigs = doc_signatures(sf_dir, cfg)

    def explode(batch: pa.Table) -> pa.Table:
        col = batch.column("signature")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = col.flatten().to_numpy(zero_copy_only=False).reshape(-1, cfg.num_perm)
        # true bit reinterpret (INFTY -> -1 guaranteed), not a value cast
        sub = np.ascontiguousarray(mat[:, :n_perms]).view(np.int64)
        ids = np.asarray(batch.column("doc_id").to_numpy(), dtype=np.int64)
        n = len(ids)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, n_perms), pa.int64()),
                "perm": pa.array(np.tile(np.arange(n_perms, dtype=np.int64), n), pa.int64()),
                "slot": pa.array(sub.reshape(-1), pa.int64()),
            }
        )

    return sigs.map_batches(explode, batch_format="pyarrow")


def oph_minhash_slots(sf_dir: str, k: int = 16, cfg: PipelineConfig = DOC_CFG,
                      docs=None):
    """(doc_id, bin, slot): ONE-PERMUTATION-HASHING sketch (Li, Owen &
    Zhang 2012) over the doc's token w-gram shingles — each gram is
    hashed ONCE (``splitmix64`` over the same FNV-1a → polynomial w-gram
    chain the k-permutation sketch uses), routed to bin ``h % k``, and
    each bin keeps its minimum.  One hash per gram instead of k
    (``doc_minhash_slots`` recomputes the pairwise family per
    permutation), the O(grams) sketch-construction path for CPU-bound
    corpora; empty bins surface as slot = -1 (the OPH analog of the
    reference INFTY semantics — densification is the documented next
    step before an estimator uses these).

    Slot values are the full 64-bit hashes bit-reinterpreted to int64 so
    the relation is plain-SQL; the DuckDB oracle replays gram chain +
    splitmix64 + min-per-bin in HUGEINT."""
    ds = docs if docs is not None else _docs(sf_dir, ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, s = _oph_matrix(batch, k, cfg)
        n = len(ids)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, k), pa.int64()),
                "bin": pa.array(np.tile(np.arange(k, dtype=np.int64), n), pa.int64()),
                "slot": pa.array(s.reshape(-1), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _oph_matrix(batch: pa.Table, k: int, cfg: PipelineConfig):
    """Per-batch OPH core: (doc ids int64, (n, k) int64 slot matrix with
    -1 for empty bins)."""
    from minhash_ray.functions.shingles import token_shingles
    from minhash_ray.stages.banding import splitmix64

    K = np.uint64(k)
    U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
    texts = batch.column("text")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    grams, counts = token_shingles(texts, cfg.shingle_w, cfg.seed)
    h = splitmix64(grams)
    n = len(counts)
    buf = np.full(n * k, U64_MAX, dtype=np.uint64)
    if len(h):
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        np.minimum.at(buf, rows * k + (h % K).astype(np.int64), h)
    slot = buf.view(np.int64).copy()
    slot[buf == U64_MAX] = -1  # empty bin sentinel (min can't be 2^64-1
    # unless a gram hashes exactly there — astronomically unlikely and the
    # oracle would flag it)
    ids = np.asarray(batch.column("doc_id").to_numpy(), dtype=np.int64)
    return ids, slot.reshape(n, k)


def oph_dense_slots(sf_dir: str, k: int = 16, cfg: PipelineConfig = DOC_CFG,
                    docs=None):
    """(doc_id, bin, slot, borrowed): DENSIFIED one-permutation sketch —
    every empty bin borrows the value of the nearest non-empty bin to its
    cyclic right (the rotation scheme of Shrivastava & Li 2014's improved
    densification, direction fixed), so the estimator downstream never
    meets an empty slot and two docs' sketches stay alignable bin-by-bin.
    Docs with NO shingles at all keep all bins at -1 (nothing to borrow —
    reference INFTY semantics).  ``borrowed`` is the cyclic distance to
    the donor bin (0 = the bin was occupied), making the densification
    itself part of the checked relation.

    Fully vectorized: one reverse-running-min pass over the doubled bin
    axis finds every bin's donor; no per-doc loop.  Densification runs in
    the SAME task as sketch construction (shares the per-batch (n, k)
    matrix — no doc can straddle a batch boundary).  The DuckDB oracle
    replays gram chain + splitmix64 + min-per-bin + a min-t cyclic
    borrow join."""
    ds = docs if docs is not None else _docs(sf_dir, ["doc_id", "text"])

    def densify(batch: pa.Table) -> pa.Table:
        ids, s = _oph_matrix(batch, k, cfg)
        n = len(ids)
        occupied = s != -1
        # donor index per (doc, bin): nearest occupied at (bin + t) % k,
        # smallest t >= 0 — scan the doubled axis right-to-left keeping
        # the closest occupied position
        occ2 = np.concatenate([occupied, occupied], axis=1)  # (n, 2k)
        idx2 = np.where(occ2, np.arange(2 * k, dtype=np.int64), np.iinfo(np.int64).max)
        # reverse running-min gives, at column j, the smallest occupied
        # column >= j
        donor2 = np.minimum.accumulate(idx2[:, ::-1], axis=1)[:, ::-1]
        donor = donor2[:, :k]
        any_occ = occupied.any(axis=1)
        dense = s.copy()
        t = np.zeros((n, k), dtype=np.int64)
        rows = np.flatnonzero(any_occ)
        if rows.size:
            d = donor[rows]
            dense[rows] = s[rows][np.arange(rows.size)[:, None], d % k]
            t[rows] = d - np.arange(k, dtype=np.int64)[None, :]
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, k), pa.int64()),
                "bin": pa.array(np.tile(np.arange(k, dtype=np.int64), n), pa.int64()),
                "slot": pa.array(dense.reshape(-1), pa.int64()),
                "borrowed": pa.array(t.reshape(-1), pa.int64()),
            }
        )

    return ds.map_batches(densify, batch_format="pyarrow")


def oph_dup_pairs(sf_dir: str, k: int = 16, bands: int = 8,
                  cfg: PipelineConfig = DOC_CFG, num_partitions: int = 8,
                  docs=None):
    """(doc_id_a, doc_id_b, sim): near-dup pairs from the DENSIFIED OPH
    sketch end-to-end — the modern fast-MinHash dedup shape: one hash per
    gram at sketch time (O(grams), vs O(k·grams) for the k-permutation
    chain), rotation densification so every bin is comparable, then the
    UNCHANGED production LSH machinery (band fold → salted bucket shuffle
    → broadcast/shuffle auto-switch verify) over the k dense bins as the
    signature.  ``sim`` is the fraction of equal dense bins — the OPH
    Jaccard estimator — gated at the same tau - margin as the flagship
    chain.  Zero-shingle docs are excluded from banding (INFTY semantics,
    same as the k-permutation path).

    The DuckDB oracle replays gram chain → splitmix64 → min-per-bin →
    borrow join → band fold → bucket self-join → estimator gate, so the
    whole OPH pipeline is SQL-checked, not just the sketch."""
    import dataclasses

    if k % bands:
        raise ValueError("bands must divide k")
    cfg2 = dataclasses.replace(
        cfg, num_perm=k, bands=bands, rows_per_band=k // bands
    )
    ds = docs if docs is not None else _docs(sf_dir, ["doc_id", "text"])

    def sig_fn(batch: pa.Table) -> pa.Table:
        ids, s = _oph_matrix(batch, k, cfg)
        n = len(ids)
        occupied = s != -1
        occ2 = np.concatenate([occupied, occupied], axis=1)
        idx2 = np.where(occ2, np.arange(2 * k, dtype=np.int64), np.iinfo(np.int64).max)
        donor = np.minimum.accumulate(idx2[:, ::-1], axis=1)[:, ::-1][:, :k]
        dense = s.copy()
        rows = np.flatnonzero(occupied.any(axis=1))
        if rows.size:
            d = donor[rows]
            dense[rows] = s[rows][np.arange(rows.size)[:, None], d % k]
        sig = pa.FixedSizeListArray.from_arrays(
            pa.array(dense.reshape(-1).view(np.uint64), pa.uint64()), k
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "signature": sig,
                "simhash": pa.array(np.zeros(n, np.uint64), pa.uint64()),
                # band fn's zero-shingle skip keys on this column: occupied
                # bin count is 0 exactly when the doc had no shingles
                "n_shingles": pa.array(
                    occupied.sum(axis=1).astype(np.int64), pa.int64()
                ),
            }
        )

    sigs = ds.map_batches(sig_fn, batch_format="pyarrow")
    return minhash_dup_pairs(
        sf_dir, cfg2, num_partitions=num_partitions, sigs=sigs
    )


def doc_dedup_tiered(sf_dir: str, cfg: PipelineConfig = DOC_CFG, num_partitions: int = 8,
                     docs=None, ckpt_root: str | None = None):
    """TIERED dedup — the production shape of a training-data dedup stage
    (exact tier shrinks the corpus before the expensive near tier, cf.
    RefinedWeb/CCNet-style pipelines):

    1. **exact tier**: hash-partitioned groupby on the 128-bit text digest;
       each group's min doc_id is its exact representative.  At 100 TB this
       is the cheap pass that typically removes 30-50% of a web corpus
       before any sketching happens.
    2. **near tier**: the full MinHash-LSH pipeline (:func:`minhash_dup_pairs`
       — sketch → banded buckets → verified estimator) over the exact
       SURVIVORS only.  The verify step auto-switches broadcast-pack →
       partitioned-join attach above ``cfg.broadcast_verify_max_rows``
       (both paths bit-identical), so this tier carries no whole-corpus
       driver gather at scale.
    3. **cluster tier**: connected components over the near-dup pairs
       (``stages/cluster.assign_clusters`` — driver scatter-min union-find
       below ``driver_uf_max_edges``, distributed min-label propagation
       beyond), canonical cluster id = min doc_id of the merged component.

    Every doc (including exact duplicates) gets a row: ``(doc_id,
    cluster_id, keep)`` where ``keep = 1`` iff the doc is its cluster's
    canonical representative — filtering ``keep = 1`` yields the deduped
    corpus.  Because exact reps are min-of-group and cluster roots are
    min-of-component, ``cluster_id`` is the min doc_id over the union of
    all exact groups in the component — a deterministic, order-independent
    outcome (the same min-fold commutativity the reference's concurrent
    sketches rely on, src/utils/utils.c:3-46).

    Scale shape: one 16-byte-key groupby (tier 1), the LSH pipeline over
    survivors (tier 2), and two partitioned hash joins to route every doc
    through its exact rep to its cluster root (tier 3) — no stage holds
    the corpus on the driver (the verified pair list is metadata-scale,
    like every near-dup pipeline here).

    With ``ckpt_root`` each tier publishes an atomic checkpoint
    (``tier1_reps`` / ``tier2_pairs`` / ``tier3_assign`` under the
    config-hash dir, the same ``CheckpointManager`` contract as the
    flagship): a rerun after a crash loads completed tiers instead of
    recomputing them, and a finished run returns the published
    ``tier3_assign`` immediately.
    """
    import ray.data as rd

    from minhash_ray.stages.cluster import assign_clusters
    from minhash_ray.util import clamp_partitions

    ckpt = None
    if ckpt_root:
        from minhash_ray.state.checkpoint import CheckpointManager

        ckpt = CheckpointManager(ckpt_root, cfg)
        ckpt.clear_stale_temps()
        if ckpt.is_complete("tier3_assign"):
            return ckpt.load("tier3_assign")

    if docs is None:
        docs = _docs(sf_dir, ["doc_id", "text"])
    # the digest pass over every doc is required for tier-3 routing even
    # on resume (every doc gets an output row); it is map-only
    keyed = docs.map_batches(_add_text_digest, batch_format="pyarrow").materialize()

    # --- tier 1: exact groups ---
    if ckpt and ckpt.is_complete("tier1_reps"):
        reps = ckpt.load("tier1_reps").materialize()
    else:
        # distinct digests are corpus-width: per-batch Arrow partials fold
        # through a digest-hash partition (never Ray-aggregate groups)
        from minhash_ray.util import fold_by_int_keys

        def t1_partial(batch: pa.Table) -> pa.Table:
            agg = batch.group_by(["dg0", "dg1"]).aggregate(
                [("doc_id", "min"), ("text", "min")]
            )
            return pa.table(
                {
                    "dg0": agg.column("dg0"),
                    "dg1": agg.column("dg1"),
                    "rep_id": agg.column("doc_id_min"),
                    "text": agg.column("text_min"),
                }
            )

        def t1_final(t: pa.Table) -> pa.Table:
            agg = t.group_by(["dg0", "dg1"]).aggregate(
                [("rep_id", "min"), ("text", "min")]
            )
            return pa.table(
                {
                    "dg0": agg.column("dg0"),
                    "dg1": agg.column("dg1"),
                    "rep_id": agg.column("rep_id_min"),
                    "text": agg.column("text_min"),
                }
            )

        reps = fold_by_int_keys(
            keyed, ["dg0", "dg1"], t1_partial, t1_final, num_partitions
        ).materialize()
        if ckpt:
            reps = ckpt.save("tier1_reps", reps).materialize()

    # --- tier 2: near-dup pairs over the exact survivors only ---
    if ckpt and ckpt.is_complete("tier2_pairs"):
        batches = list(
            ckpt.load("tier2_pairs").iter_batches(
                batch_size=1_048_576, batch_format="pyarrow"
            )
        )
        pairs = (
            pa.concat_tables(batches)
            if batches
            else pa.table(
                {
                    "doc_id_a": pa.array([], pa.int64()),
                    "doc_id_b": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        )
    else:
        reps_docs = reps.map_batches(
            lambda b: pa.table({"doc_id": b.column("rep_id"), "text": b.column("text")}),
            batch_format="pyarrow",
        )
        # rep signatures are checkpointed so an incremental append
        # (doc_dedup_tiered_append) never re-sketches old reps
        if ckpt and ckpt.is_complete("tier2_sigs"):
            sigs = ckpt.load("tier2_sigs").materialize()
        else:
            sigs = doc_signatures(sf_dir, cfg, docs=reps_docs).materialize()
            if ckpt:
                sigs = ckpt.save(
                    "tier2_sigs", sigs, input_stage="tier1_reps"
                ).materialize()
        pairs = minhash_dup_pairs(sf_dir, cfg, num_partitions, docs=reps_docs, sigs=sigs)
        if ckpt:
            ckpt.save(
                "tier2_pairs",
                rd.from_arrow(pairs),
                input_stage="tier1_reps",
                schema=pairs.schema,
            )

    # --- tier 3: connected components + per-doc routing ---
    def pad12(col) -> pa.Array:
        import pyarrow.compute as pc

        out = pc.utf8_lpad(pc.cast(col, pa.string()), 12, "0")
        return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out

    pairs_ds = rd.from_arrow(
        pa.table(
            {
                "clip_id_a": pad12(pairs.column("doc_id_a")),
                "clip_id_b": pad12(pairs.column("doc_id_b")),
            }
        )
    )
    rep_ids = reps.map_batches(
        lambda b: pa.table({"clip_id": pad12(b.column("rep_id"))}),
        batch_format="pyarrow",
    )
    assign = assign_clusters(rep_ids, pairs_ds, cfg, num_partitions=num_partitions)

    np_parts = clamp_partitions(num_partitions)
    doc_rep = keyed.select_columns(["doc_id", "dg0", "dg1"]).join(
        reps.select_columns(["dg0", "dg1", "rep_id"]),
        join_type="inner",
        on=("dg0", "dg1"),
        num_partitions=np_parts,
    )
    with_key = doc_rep.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("doc_id"), "rep_key": pad12(b.column("rep_id"))}
        ),
        batch_format="pyarrow",
    )
    routed = with_key.join(
        assign, join_type="inner", on=("rep_key",), right_on=("clip_id",),
        num_partitions=np_parts,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cluster = pc.cast(batch.column("cluster_id"), pa.int64())
        doc = pc.cast(batch.column("doc_id"), pa.int64())
        keep = pc.cast(pc.equal(doc, cluster), pa.int64())
        return pa.table({"doc_id": doc, "cluster_id": cluster, "keep": keep})

    out = routed.map_batches(finalize, batch_format="pyarrow")
    if ckpt:
        out = ckpt.save(
            "tier3_assign",
            out,
            input_stage="tier2_pairs",
            schema=pa.schema(
                [("doc_id", pa.int64()), ("cluster_id", pa.int64()), ("keep", pa.int64())]
            ),
        )
    return out


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
        nz = counts > 0
        if nz.any():
            # segments are contiguous in row order, so the nonzero-row
            # starts ARE the reduceat boundaries (zero rows add no elements)
            mins[nz] = np.minimum.reduceat(shingles, starts[nz])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_grams": pa.array(counts.astype(np.int64), pa.int64()),
                "min_gram_hash": pa.array(mins.astype(np.int64), pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def decontaminate(
    sf_dir: str,
    w: int | None = None,
    bench_mod: int = 43,
    cfg: PipelineConfig = DOC_CFG,
):
    """Test-set decontamination: (doc_id, n_hits, contaminated) — flag
    every document that shares at least one token w-gram with a benchmark
    subset (here ``doc_id % bench_mod == 0``, the deterministic stand-in
    for an eval-set table), the standard pre-training hygiene pass that
    keeps eval suites out of the training corpus.

    Scale shape: decontamination is the canonical small-side broadcast —
    eval suites are 10^3..10^5 docs against a 10^9+ corpus.  The benchmark
    side's DISTINCT w-gram hashes are reduced per batch (``np.unique``
    before anything leaves the task), unioned once, sorted, and published
    via one ``ray.put``; the corpus side then streams through a single
    ``map_batches`` probing the sorted uint64 array with ``searchsorted``
    — no shuffle anywhere.  Contract: the benchmark gram set must fit in
    worker memory (8 B/gram; a 10^8-gram eval battery is 800 MB — beyond
    that, bucket both sides on gram hash and use the join-attach pattern
    of ``_ngram_verify_join``).

    ``n_hits`` counts DISTINCT shared grams per document (benchmark docs
    trivially flag themselves — a real run routes them out by source).
    Uses the same tokenizer + w-gram polynomial as the MinHash chain
    (``token_shingles``), so the DuckDB oracle replays it in HUGEINT SQL.
    """
    import ray

    from minhash_ray.functions.shingles import token_shingles

    w = cfg.shingle_w if w is None else w
    docs = _docs(sf_dir, ["doc_id", "text"])

    def bench_grams_fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        mask = (ids % bench_mod) == 0
        texts = batch.column("text").filter(pa.array(mask))
        sh, _ = token_shingles(texts, w, cfg.seed)
        return pa.table({"g": pa.array(np.unique(sh), pa.uint64())})

    # benchmark gram set: per-batch distinct -> one driver union (small
    # side by definition; see contract above)
    parts = [
        b.column("g").to_numpy()
        for b in docs.map_batches(bench_grams_fn, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
    ]
    bench_sorted = (
        np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.uint64)
    )
    bench_ref = ray.put(bench_sorted)

    def probe(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)          # plasma-cached per worker
        sh, cnt = token_shingles(batch.column("text"), w, cfg.seed)
        row = np.repeat(np.arange(len(batch), dtype=np.int64), cnt)
        n_hits = np.zeros(len(batch), dtype=np.int64)
        if len(sh) and len(bench):
            pos = np.minimum(np.searchsorted(bench, sh), len(bench) - 1)
            hit = bench[pos] == sh
            rs, gs = row[hit], sh[hit]
            if len(rs):
                o = np.lexsort((gs, rs))
                rs, gs = rs[o], gs[o]
                first = np.ones(len(rs), dtype=bool)
                first[1:] = (rs[1:] != rs[:-1]) | (gs[1:] != gs[:-1])
                n_hits = np.bincount(rs[first], minlength=len(batch)).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_hits": pa.array(n_hits, pa.int64()),
                "contaminated": pa.array(n_hits > 0, pa.bool_()),
            }
        )

    return docs.map_batches(probe, batch_format="pyarrow")


def _doc_weighted_sets(sf_dir: str, docs=None):
    """documents → {doc_id, shingles (sorted list<u64>), n} where the
    elements are OCCURRENCE-INDEXED token hashes: the i-th occurrence of
    token t in a doc maps to ``splitmix64(hash(t) + i)`` (uint64 wrap) —
    mixed AFTER the index is added, so indexed copies are scattered
    across the 64-bit space (consecutive-integer elements would share
    AllPairs prefix buckets, ``element >> 1``, and self-pair the doc).

    This reduces weighted (multiset) Jaccard to plain set Jaccard —
    ``|A∩B| = Σ_t min(tf_A, tf_B)`` because exactly the first
    ``min(tf_A, tf_B)`` indexed copies of each shared token coincide — so
    the AllPairs/PPJoin machinery runs unchanged.  Injectivity of the
    mapping over the corpus vocabulary is the same 64-bit-hash assumption
    the ngram oracle already documents."""
    from minhash_ray.functions.shingles import tokenize_batch
    from minhash_ray.stages.banding import splitmix64

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        th, counts = tokenize_batch(texts, DOC_CFG.seed)
        n = batch.num_rows
        row_ids = np.repeat(np.arange(n, dtype=np.int64), counts)
        o = np.lexsort((th, row_ids))
        rs, ts = row_ids[o], th[o]
        new = np.ones(len(ts), dtype=bool)
        new[1:] = (rs[1:] != rs[:-1]) | (ts[1:] != ts[:-1])
        run_start = np.maximum.accumulate(
            np.where(new, np.arange(len(ts)), 0)
        )
        occ = (np.arange(len(ts)) - run_start).astype(np.uint64)
        with np.errstate(over="ignore"):
            elems = splitmix64(ts + occ)
        # per-row sorted elements (the verify kernel's contract)
        o2 = np.lexsort((elems, rs))
        rs2, es2 = rs[o2], elems[o2]
        c2 = np.bincount(rs2, minlength=n).astype(np.int64)
        col = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(c2)]), pa.int32()),
            pa.array(es2, pa.uint64()),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "shingles": col,
                "n": pa.array(c2, pa.int64()),
            }
        )

    if docs is None:
        docs = _docs(sf_dir, ["doc_id", "text"])
    return docs.map_batches(fn, batch_format="pyarrow")


def weighted_jaccard_pairs(
    sf_dir: str,
    threshold: float = 0.7,
    broadcast_max_rows: int = 2_000_000,
    num_partitions: int = 8,
    docs=None,
) -> pa.Table:
    """EXACT weighted (multiset) Jaccard self-join: all doc pairs with
    ``Σ_t min(tf_a, tf_b) / Σ_t max(tf_a, tf_b) >= threshold`` over
    whitespace tokens — the frequency-aware near-dup measure (boilerplate
    with different repetition counts scores lower than under set Jaccard).

    Implementation: multisets become sets of occurrence-indexed token
    hashes (:func:`_doc_weighted_sets`), then the identical
    AllPairs/PPJoin prefix-filter pipeline as :func:`ngram_jaccard_pairs`
    runs over them (one bucket shuffle + verified exact intersections;
    broadcast/join-attach auto-switch).  Unigram multisets over a small
    vocabulary are the worst case for prefix filtering — every element is
    frequent — which is exactly what the global df-ascending prefix order
    in :func:`_set_jaccard_pairs` bounds (measured on the 31-word sf0.1
    corpus: 108M → 31.6M candidate rows at this threshold; the old
    unordered prefixes at the old 0.4 default emitted 218M and pushed a
    reducer into multi-GB allocations).  The DuckDB oracle computes the
    min/max-of-tf formula directly — an independent identity:
    Σmax = tot_a + tot_b − Σmin."""
    sets_ds = _doc_weighted_sets(sf_dir, docs=docs).materialize()
    tbl = _set_jaccard_pairs(
        sets_ds, DOC_CFG, threshold, broadcast_max_rows, num_partitions
    )
    return tbl.rename_columns(["doc_id_a", "doc_id_b", "wjaccard"])


# --- corpus-wide chunk-level exact dedup (CCNet-style line dedup) ---------
#
# CCNet / RefinedWeb dedupe at sub-document granularity: every LINE
# (paragraph) is hashed, the first occurrence corpus-wide is kept and
# every later occurrence is dropped from its document.  The synthetic
# corpus has no newline structure, so the unit here is a fixed window of
# ``words_per_chunk`` whitespace tokens — the machinery (explode →
# hash-keyed keep-first → reassemble in order) is identical.

_CIDX_BITS = 21          # chunks-per-doc bound: 2^21 chunks ≈ 42M words/doc
_CIDX_MASK = (1 << _CIDX_BITS) - 1


def _explode_chunks(batch: pa.Table, words_per_chunk: int) -> pa.Table:
    """Vectorized explode of (doc_id, text) into (doc_id, cidx, chunk):
    one row per ``words_per_chunk``-token window, chunk text rebuilt with
    single-space joins (``pc.binary_join`` over a re-offset list view of
    the SAME flattened token buffer — no per-row Python, no token copy)."""
    import pyarrow.compute as pc

    if batch.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "cidx": pa.array([], pa.int64()),
                "chunk": pa.array([], pa.string()),
            }
        )
    texts = batch.column("text")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern(texts, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    values = toks.flatten()                       # honors any list offset
    offs = toks.offsets.to_numpy().astype(np.int64)
    offs = offs - offs[0]
    ntok = offs[1:] - offs[:-1]                   # >= 1: split("") == [""]
    W = int(words_per_chunk)
    nch = (ntok + W - 1) // W
    total = int(nch.sum())
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    starts_cum = np.concatenate(([0], np.cumsum(nch)))
    within = np.arange(total, dtype=np.int64) - np.repeat(starts_cum[:-1], nch)
    chunk_start = np.repeat(offs[:-1], nch) + W * within
    chunk_offsets = np.concatenate((chunk_start, offs[-1:]))
    chunk_list = pa.ListArray.from_arrays(
        pa.array(chunk_offsets, pa.int32()), values
    )
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(doc_ids, nch), pa.int64()),
            "cidx": pa.array(within, pa.int64()),
            "chunk": pc.binary_join(chunk_list, " "),
        }
    )


def _chunk_pkey(batch: pa.Table):
    """Packed (doc_id, cidx) key — int64, lexicographic order preserved.
    Raises if the corpus exceeds the documented packing bounds instead of
    silently corrupting keys."""
    doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    cidx = batch.column("cidx").to_numpy(zero_copy_only=False).astype(np.int64)
    if len(cidx) and (int(cidx.max()) > _CIDX_MASK or int(doc.max()) >= (1 << (63 - _CIDX_BITS))):
        raise ValueError(
            f"chunk pkey overflow: need cidx <= {_CIDX_MASK} and doc_id < 2^{63 - _CIDX_BITS}"
        )
    return (doc << _CIDX_BITS) | cidx


def chunk_dedup_docs(
    sf_dir: str,
    words_per_chunk: int = 20,
    num_partitions: int = 8,
    docs=None,
):
    """Corpus-wide keep-first exact chunk dedup (CCNet-style line dedup,
    Wenzek et al. 2020, over fixed ``words_per_chunk``-token windows):
    every distinct chunk survives only at its first occurrence — minimum
    (doc_id, cidx) corpus-wide — and each document is reassembled from its
    surviving chunks in order.  Output per doc: (doc_id, clean_text,
    n_chunks, n_kept); a doc whose every chunk appeared earlier elsewhere
    survives with clean_text = ''.

    Scale shape (three wide ops, none carries text more than once):
      1. hash pass — explode → 128-bit chunk digest + packed order key,
         chunk text DROPPED before the shuffle; ``groupby(digest).min(ord)``
         is a partial+final aggregate over 24-byte rows.  The winning
         (doc_id, cidx) set is DECODED from the min itself — no second
         digest-keyed join.
      2. keep attach — re-exploded chunks left-outer-join the winner pkey
         table on one int64 key (text crosses the exchange exactly once).
      3. reassembly — doc-hash partition, per-partition vectorized
         lexsort + run-boundary ``binary_join`` (no per-doc Python).
    """
    import pyarrow.compute as pc

    from minhash_ray.util import clamp_partitions

    np_parts = clamp_partitions(num_partitions)
    ds = docs if docs is not None else _docs(sf_dir, ["doc_id", "text"])
    W = int(words_per_chunk)

    exploded = ds.map_batches(
        lambda b: _explode_chunks(b, W), batch_format="pyarrow"
    )

    def keys(batch: pa.Table) -> pa.Table:
        flat, offs = _string_flat_offsets(batch.column("chunk"))
        cols = {}
        with np.errstate(over="ignore"):
            for i, (seed, mult) in enumerate(_DIGEST_PARAMS):
                d = np.uint64(seed) * np.uint64(mult) + _wordpoly_digest_rows(
                    flat, offs, mult
                )
                cols[f"dg{i}"] = pa.array(d.view(np.int64), pa.int64())
        cols["ord"] = pa.array(_chunk_pkey(batch), pa.int64())
        return pa.table(cols)

    # distinct chunk digests are corpus-width → fold Arrow partials
    # through a digest-hash partition (never Ray-aggregate groups)
    from minhash_ray.util import fold_by_int_keys

    def min_ord_partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(["dg0", "dg1"]).aggregate([("ord", "min")])
        return pa.table(
            {
                "dg0": agg.column("dg0"),
                "dg1": agg.column("dg1"),
                "ord": agg.column("ord_min"),
            }
        )

    def min_ord_final(t: pa.Table) -> pa.Table:
        agg = t.group_by(["dg0", "dg1"]).aggregate([("ord", "min")])
        return pa.table(
            {
                "pkey": agg.column("ord_min"),
                "keep": pa.array(np.ones(agg.num_rows, dtype=np.int8), pa.int8()),
            }
        )

    kept_keys = fold_by_int_keys(
        exploded.map_batches(keys, batch_format="pyarrow"),
        ["dg0", "dg1"],
        min_ord_partial,
        min_ord_final,
        num_partitions,
    )

    def with_pkey(batch: pa.Table) -> pa.Table:
        return batch.append_column("pkey", pa.array(_chunk_pkey(batch), pa.int64()))

    flagged = exploded.map_batches(with_pkey, batch_format="pyarrow").join(
        kept_keys,
        join_type="left_outer",
        on=("pkey",),
        num_partitions=np_parts,
    )

    def with_ppart(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        # splitmix64-style spread so sequential doc_ids don't skew partitions
        h = (doc.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        return batch.append_column(
            "ppart", pa.array((h % np.uint64(np_parts)).astype(np.int64), pa.int64())
        )

    def reassemble(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "clean_text": pa.array([], pa.string()),
                    "n_chunks": pa.array([], pa.int64()),
                    "n_kept": pa.array([], pa.int64()),
                }
            )
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cidx = batch.column("cidx").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pc.fill_null(pc.cast(batch.column("keep"), pa.int8()), 0).to_numpy(
            zero_copy_only=False
        ).astype(bool)
        chunks = batch.column("chunk")
        if isinstance(chunks, pa.ChunkedArray):
            chunks = chunks.combine_chunks()
        order = np.lexsort((cidx, doc))
        doc_s, keep_s = doc[order], keep[order]
        new_doc = np.ones(len(doc_s), dtype=bool)
        new_doc[1:] = doc_s[1:] != doc_s[:-1]
        doc_start = np.flatnonzero(new_doc)                 # first row of each doc
        out_docs = doc_s[doc_start]
        n_chunks = np.diff(np.append(doc_start, len(doc_s)))
        # per-doc kept counts: cumsum-difference over the sorted keep flags
        kc = np.concatenate(([0], np.cumsum(keep_s.astype(np.int64))))
        bounds = np.append(doc_start, len(doc_s))
        n_kept = kc[bounds[1:]] - kc[bounds[:-1]]
        # kept chunks, still in (doc, cidx) order → list offsets from n_kept
        kept_rows = order[keep_s]
        kept_vals = chunks.take(pa.array(kept_rows, pa.int64()))
        joined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(np.concatenate(([0], np.cumsum(n_kept))), pa.int32()),
                kept_vals,
            ),
            " ",
        )
        return pa.table(
            {
                "doc_id": pa.array(out_docs, pa.int64()),
                "clean_text": joined,
                "n_chunks": pa.array(n_chunks, pa.int64()),
                "n_kept": pa.array(n_kept, pa.int64()),
            }
        )

    return (
        flagged.map_batches(with_ppart, batch_format="pyarrow")
        .groupby("ppart")
        .map_groups(reassemble, batch_format="pyarrow")
    )


_SETS_PACK_TASK = None


def _sets_pack_task():
    """Lazily-defined remote task building a sorted-id shingle-set pack
    (ids int64 asc, flat u64, offsets) from materialized set blocks —
    the off-driver pack-build idiom of ``stages/verify``."""
    global _SETS_PACK_TASK
    if _SETS_PACK_TASK is None:
        import ray

        @ray.remote
        def sets_pack(*blocks: pa.Table):
            from minhash_ray.functions.minhash import _seg_arange
            from minhash_ray.stages.verify import _list_flat_offsets

            tables = [b for b in blocks if b.num_rows] or [blocks[0]]
            t = pa.concat_tables(tables)
            ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            flat, offs = _list_flat_offsets(t.column("shingles"))
            o = np.argsort(ids, kind="stable")
            counts = np.diff(offs)[o]
            sel = np.repeat(offs[:-1][o], counts) + _seg_arange(counts)
            return {
                "ids": ids[o],
                "flat": flat[sel],
                "offs": np.concatenate(([0], np.cumsum(counts))).astype(np.int64),
            }

        _SETS_PACK_TASK = sets_pack
    return _SETS_PACK_TASK


def _sets_pack_refs(sets_ds) -> list:
    return [_sets_pack_task().remote(*sets_ds.to_arrow_refs())]


def containment_pairs(
    sf_dir: str,
    threshold: float = 0.8,
    num_partitions: int = 32,
    docs=None,
    broadcast_max_rows: int | None = None,
) -> "object":
    """EXACT directed near-containment self-join: ordered pairs
    (doc_id_a, doc_id_b, containment) with a != b and
    ``containment = |S_a ∩ S_b| / |S_a| >= threshold`` over the distinct
    token-trigram shingle sets of :func:`ngram_jaccard_pairs`.  Asymmetric
    by design: a short doc embedded verbatim in a long one scores ~1.0
    here while its Jaccard is tiny — the subset/quote/boilerplate detector
    of a dedup suite (Broder's containment measure).

    Scale shape (probe-prefix × full-index, the containment adaptation of
    AllPairs): the PROBE side emits only its ``|A| - minreq + 1`` rarest
    elements (rare-first global df order, shared machinery
    :func:`_df_order_ref`); the INDEX side emits every element (no length
    bound exists on the container, so the index cannot be prefixed).  One
    partitioned hash join on the element key + a distinct-pair groupby
    yields candidates; verification gates ``inter / |A|`` from exact
    segmented intersections, reading the true sets from a task-built
    plasma pack under ``broadcast_verify_max_rows`` (candidates outnumber
    docs ~60:1, so the pack beats shipping each set once per pair) and
    from two slim partitioned joins above it (bit-identical, forced-path
    pytest) — nothing driver-resident either way.  ``minreq`` is the
    smallest integer k with ``k/|A| >= threshold`` under IEEE division
    (float-edge-exact, so the prefix bound can never exclude a pair the
    gate would keep)."""
    import pyarrow.compute as pc

    from minhash_ray.functions.minhash import _seg_arange, segment_intersection_counts
    from minhash_ray.stages.verify import (
        _list_flat_offsets,
        _pack_u64_column,
        _unpack_u64_column,
    )
    from minhash_ray.util import cached_get, clamp_partitions, strip_empty_blocks

    np_parts = clamp_partitions(num_partitions)
    sets_ds = _doc_shingle_sets(sf_dir, DOC_CFG, docs=docs).materialize()
    n_docs = sets_ds.count()
    hot_ref = _df_order_ref(sets_ds, n_docs)

    def _minreq(counts: np.ndarray) -> np.ndarray:
        # smallest integer k with k/n >= t under the SAME IEEE ops the
        # verify gate uses — ceil(t*n) alone can overshoot by 1 when t*n
        # rounds just above an integer, silently shrinking the prefix
        k = np.ceil(threshold * counts).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            dec = (k - 1) / np.maximum(counts, 1) >= threshold
        return np.where(dec & (k > 0), k - 1, k)

    def probe_rows(batch: pa.Table) -> pa.Table:
        flat, offs = _list_flat_offsets(batch.column("shingles"))
        counts = np.diff(offs)
        L = np.clip(counts - _minreq(counts) + 1, 0, counts).astype(np.int64)
        L[counts == 0] = 0                     # empty sets never contain
        perm = _df_order_perm(flat, offs, counts, cached_get(hot_ref[0]))
        sel = np.repeat(offs[:-1], L) + _seg_arange(L)
        gather = perm[sel]
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array((flat[gather] >> np.uint64(1)).astype(np.int64), pa.int64()),
                "doc_id_a": pa.array(np.repeat(ids, L), pa.int64()),
                "na": pa.array(np.repeat(counts, L), pa.int64()),
                "pa_": pa.array(_seg_arange(L), pa.int64()),
            }
        )

    def index_rows(batch: pa.Table) -> pa.Table:
        flat, offs = _list_flat_offsets(batch.column("shingles"))
        counts = np.diff(offs)
        # SAME rare-first order as the probe prefixes so the positional
        # bound below argues about one shared total order
        perm = _df_order_perm(flat, offs, counts, cached_get(hot_ref[0]))
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array((flat[perm] >> np.uint64(1)).astype(np.int64), pa.int64()),
                "doc_id_b": pa.array(np.repeat(ids, counts), pa.int64()),
                "nb": pa.array(np.repeat(counts, counts), pa.int64()),
                "pb_": pa.array(_seg_arange(counts), pa.int64()),
            }
        )

    probes = sets_ds.map_batches(probe_rows, batch_format="pyarrow")
    index = sets_ds.map_batches(index_rows, batch_format="pyarrow")
    joined = probes.join(
        index, join_type="inner", on=("bucket",), num_partitions=np_parts
    )

    def slim_pairs(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_id_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_id_b").to_numpy(zero_copy_only=False)
        na = batch.column("na").to_numpy(zero_copy_only=False)
        nb = batch.column("nb").to_numpy(zero_copy_only=False)
        pa_ = batch.column("pa_").to_numpy(zero_copy_only=False)
        pb_ = batch.column("pb_").to_numpy(zero_copy_only=False)
        o = _minreq(na)
        keep = a != b
        # size filter: inter <= min(na, nb), so nb < minreq(na) can't pass
        keep &= nb >= o
        # positional filter (first-common-element bound, shared total
        # order): overlap <= 1 + min(na-pa-1, nb-pb-1)
        keep &= (1 + np.minimum(na - pa_ - 1, nb - pb_ - 1)) >= o
        # batch-local distinct before the global one (candidate rows repeat
        # once per shared prefix/index element)
        pairs = np.stack([a[keep], b[keep]], axis=1)
        if len(pairs):
            pairs = np.unique(pairs, axis=0)
        return pa.table(
            {
                "doc_id_a": pa.array(pairs[:, 0], pa.int64()),
                "doc_id_b": pa.array(pairs[:, 1], pa.int64()),
            }
        )

    cand = strip_empty_blocks(
        strip_empty_blocks(joined.map_batches(slim_pairs, batch_format="pyarrow"))
        .groupby(["doc_id_a", "doc_id_b"])
        .count()
        .select_columns(["doc_id_a", "doc_id_b"])
    )

    # --- verify: broadcast set-pack fast path under the size switch ---
    # candidate pairs outnumber docs ~60:1 here (every near-dup cluster is
    # quadratic in pairs), so the join-attach ships each doc's set once
    # per PAIR; under ``broadcast_verify_max_rows`` one plasma pack keyed
    # by sorted doc_id serves every verify task zero-copy instead.  The
    # join-attach path stays the >limit fallback (same gate math,
    # bit-identical output — forced-path pytest).
    limit = (
        DOC_CFG.broadcast_verify_max_rows
        if broadcast_max_rows is None
        else broadcast_max_rows
    )
    if n_docs <= limit:
        from minhash_ray.util import cached_get as _get

        pack_ref = _sets_pack_refs(sets_ds)

        def verify_bcast(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            if n == 0:
                return pa.table(
                    {
                        "doc_id_a": pa.array([], pa.int64()),
                        "doc_id_b": pa.array([], pa.int64()),
                        "containment": pa.array([], pa.float64()),
                    }
                )
            pack = _get(pack_ref[0])
            ids, flat_p, offs_p = pack["ids"], pack["flat"], pack["offs"]
            a = batch.column("doc_id_a").to_numpy()
            b = batch.column("doc_id_b").to_numpy()
            ra = np.searchsorted(ids, a)
            rb = np.searchsorted(ids, b)
            ca = offs_p[ra + 1] - offs_p[ra]
            cb = offs_p[rb + 1] - offs_p[rb]
            sel_a = np.repeat(offs_p[ra], ca) + _seg_arange(ca)
            sel_b = np.repeat(offs_p[rb], cb) + _seg_arange(cb)
            flat = np.concatenate([flat_p[sel_a], flat_p[sel_b]])
            offs = np.concatenate(
                [
                    np.concatenate(([0], np.cumsum(ca))),
                    int(ca.sum()) + np.cumsum(cb),
                ]
            )
            idx = np.arange(n, dtype=np.int64)
            inter, _sa, _sb = segment_intersection_counts(flat, offs, idx, n + idx)
            cont = np.zeros(n, dtype=np.float64)
            nz = ca > 0
            cont[nz] = inter[nz] / ca[nz]
            keep = cont >= threshold
            sel = np.flatnonzero(keep)
            return pa.table(
                {
                    "doc_id_a": pa.array(a[sel], pa.int64()),
                    "doc_id_b": pa.array(b[sel], pa.int64()),
                    "containment": pa.array(cont[keep], pa.float64()),
                }
            )

        return cand.map_batches(verify_bcast, batch_format="pyarrow", batch_size=8192)

    def side(suffix: str):
        def pack(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    f"sh_{suffix}": _pack_u64_column(batch.column("shingles")),
                }
            )

        return sets_ds.map_batches(pack, batch_format="pyarrow")

    with_a = cand.join(
        side("a"), join_type="inner", on=("doc_id_a",), right_on=("doc_id",),
        num_partitions=np_parts,
    )
    with_ab = strip_empty_blocks(with_a).join(
        side("b"), join_type="inner", on=("doc_id_b",), right_on=("doc_id",),
        num_partitions=np_parts,
    )

    def verify(batch: pa.Table) -> pa.Table:
        fa, oa = _unpack_u64_column(batch.column("sh_a"))
        fb, ob = _unpack_u64_column(batch.column("sh_b"))
        ca = np.diff(oa)
        n = batch.num_rows
        flat = np.concatenate([fa, fb])
        offs = np.concatenate([oa, len(fa) + ob[1:]])
        idx = np.arange(n, dtype=np.int64)
        inter, _sa, _sb = segment_intersection_counts(flat, offs, idx, n + idx)
        cont = np.zeros(n, dtype=np.float64)
        nz = ca > 0
        cont[nz] = inter[nz] / ca[nz]
        keep = cont >= threshold
        sel = np.flatnonzero(keep)
        return pa.table(
            {
                "doc_id_a": pc.take(batch.column("doc_id_a"), pa.array(sel)),
                "doc_id_b": pc.take(batch.column("doc_id_b"), pa.array(sel)),
                "containment": pa.array(cont[keep], pa.float64()),
            }
        )

    return with_ab.map_batches(verify, batch_format="pyarrow", batch_size=8192)


def near_dup_vs_reference(
    sf_dir: str,
    threshold: float = 0.3,
    ref_mod: int = 43,
    num_partitions: int = 8,
    docs=None,
):
    """Cross-corpus fuzzy dedup — the incremental-ingestion operator: flag
    every CORPUS doc whose exact trigram-set Jaccard against ANY
    REFERENCE doc reaches ``threshold``; output (doc_id, ref_doc_id,
    jaccard) pairs.  The reference here is the deterministic subset
    ``doc_id % ref_mod == 0`` (the ``decontaminate`` convention);
    ``decontaminate`` flags ANY shared w-gram, this op applies the
    thresholded whole-document similarity a crawl-ingest dedup uses.

    Scale shape: both sides emit AllPairs prefixes in ONE shared
    rare-first order (the reference is part of the corpus's df mass), the
    cross join runs prefix × prefix on the element key with the same
    size + positional pruning as the self-join, and verification attaches
    the corpus-side set by one partitioned join while the REFERENCE pack
    (ids + flat + offsets) broadcasts once — the asymmetric small-side
    broadcast an incremental pipeline wants (the reference index is the
    small, reusable side; the crawl streams)."""
    import pyarrow.compute as pc
    import ray

    from minhash_ray.functions.minhash import (
        _seg_arange,
        exact_jaccard_for_pairs,
    )
    from minhash_ray.stages.verify import (
        _list_flat_offsets,
        _pack_u64_column,
        _unpack_u64_column,
    )
    from minhash_ray.util import cached_get, clamp_partitions, strip_empty_blocks

    np_parts = clamp_partitions(num_partitions)
    sets_ds = _doc_shingle_sets(sf_dir, DOC_CFG, docs=docs).materialize()
    n_docs = sets_ds.count()
    hot_ref = _df_order_ref(sets_ds, n_docs)

    def prefix_rows_for(side: str):
        want_ref = side == "ref"

        def fn(batch: pa.Table) -> pa.Table:
            ids_all = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            mask = (ids_all % ref_mod == 0) == want_ref
            sel_rows = np.flatnonzero(mask)
            sub = batch.take(pa.array(sel_rows, pa.int64()))
            flat, offs = _list_flat_offsets(sub.column("shingles"))
            counts = np.diff(offs)
            L = np.clip(
                counts - np.ceil(threshold * counts).astype(np.int64) + 1, 0, counts
            ).astype(np.int64)
            perm = _df_order_perm(flat, offs, counts, cached_get(hot_ref[0]))
            sel = np.repeat(offs[:-1], L) + _seg_arange(L)
            gather = perm[sel]
            ids = ids_all[mask]
            sfx = "_r" if want_ref else ""
            return pa.table(
                {
                    "bucket": pa.array(
                        (flat[gather] >> np.uint64(1)).astype(np.int64), pa.int64()
                    ),
                    f"doc_id{sfx}": pa.array(np.repeat(ids, L), pa.int64()),
                    f"n{sfx}": pa.array(np.repeat(counts, L), pa.int64()),
                    f"p{sfx}": pa.array(_seg_arange(L), pa.int64()),
                }
            )

        return fn

    corpus_pref = strip_empty_blocks(
        sets_ds.map_batches(prefix_rows_for("corpus"), batch_format="pyarrow")
    )
    ref_pref = strip_empty_blocks(
        sets_ds.map_batches(prefix_rows_for("ref"), batch_format="pyarrow")
    )
    joined = corpus_pref.join(
        ref_pref, join_type="inner", on=("bucket",), num_partitions=np_parts
    )

    def prune(batch: pa.Table) -> pa.Table:
        na = batch.column("n").to_numpy(zero_copy_only=False)
        nb = batch.column("n_r").to_numpy(zero_copy_only=False)
        pa_ = batch.column("p").to_numpy(zero_copy_only=False)
        pb_ = batch.column("p_r").to_numpy(zero_copy_only=False)
        keep = np.minimum(na, nb) >= threshold * np.maximum(na, nb)
        s = na + nb
        o = np.maximum(np.ceil(threshold * s / (1.0 + threshold)).astype(np.int64), 1)
        om1 = np.maximum(o - 1, 1)
        o = np.where(om1 / (s - om1) >= threshold, om1, o)
        o = np.where(o / np.maximum(s - o, 1) >= threshold, o, o + 1)
        keep &= (1 + np.minimum(na - pa_ - 1, nb - pb_ - 1)) >= o
        idx = np.flatnonzero(keep)
        a = batch.column("doc_id").to_numpy(zero_copy_only=False)[idx]
        b = batch.column("doc_id_r").to_numpy(zero_copy_only=False)[idx]
        if len(idx):
            pairs = np.unique(np.stack([a, b], axis=1), axis=0)
        else:
            pairs = np.empty((0, 2), dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(pairs[:, 0], pa.int64()),
                "ref_doc_id": pa.array(pairs[:, 1], pa.int64()),
            }
        )

    cand = strip_empty_blocks(
        strip_empty_blocks(joined.map_batches(prune, batch_format="pyarrow"))
        .groupby(["doc_id", "ref_doc_id"])
        .count()
        .select_columns(["doc_id", "ref_doc_id"])
    )

    # reference pack broadcast once (the small reusable index side)
    def ref_only(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.take(pa.array(np.flatnonzero(ids % ref_mod == 0), pa.int64()))

    rt = pa.concat_tables(
        list(
            sets_ds.map_batches(ref_only, batch_format="pyarrow").iter_batches(
                batch_size=1 << 16, batch_format="pyarrow"
            )
        )
    )
    rids = np.asarray(rt.column("doc_id").to_numpy(), dtype=np.int64)
    rcol = rt.column("shingles")
    rflat, roffs = _list_flat_offsets(
        rcol.combine_chunks() if isinstance(rcol, pa.ChunkedArray) else rcol
    )
    ro = np.argsort(rids)
    rc = np.diff(roffs)[ro]
    seg = (
        np.arange(int(rc.sum()), dtype=np.int64) - np.repeat(np.cumsum(rc) - rc, rc)
        if rc.sum()
        else np.empty(0, dtype=np.int64)
    )
    gather = np.repeat(roffs[:-1][ro], rc) + seg
    ref_pack = [ray.put({
        "ids": rids[ro],
        "flat": np.ascontiguousarray(rflat[gather]),
        "offs": np.concatenate([[0], np.cumsum(rc)]).astype(np.int64),
    })]

    # attach the corpus-side set by ONE partitioned join, verify per batch
    def corpus_pack(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id_j": batch.column("doc_id"),
                "sh_a": _pack_u64_column(batch.column("shingles")),
            }
        )

    with_a = cand.join(
        sets_ds.map_batches(corpus_pack, batch_format="pyarrow"),
        join_type="inner",
        on=("doc_id",),
        right_on=("doc_id_j",),
        num_partitions=np_parts,
    )

    def verify(batch: pa.Table) -> pa.Table:
        pack = cached_get(ref_pack[0])
        fa, oa = _unpack_u64_column(batch.column("sh_a"))
        b = pc.cast(batch.column("ref_doc_id"), pa.int64()).to_numpy()
        idx_b = np.searchsorted(pack["ids"], b)
        n = batch.num_rows
        flat = np.concatenate([fa, pack["flat"]])
        offs = np.concatenate([oa, len(fa) + pack["offs"][1:]])
        # per-row corpus set index i pairs with reference set (n + idx_b)
        jacc = (
            exact_jaccard_for_pairs(
                flat, offs, np.arange(n, dtype=np.int64), n + idx_b
            )
            if n
            else np.empty(0, dtype=np.float64)
        )
        keep = jacc >= threshold
        sel = np.flatnonzero(keep)
        return pa.table(
            {
                "doc_id": pc.take(batch.column("doc_id"), pa.array(sel)),
                "ref_doc_id": pc.take(batch.column("ref_doc_id"), pa.array(sel)),
                "jaccard": pa.array(jacc[keep], pa.float64()),
            }
        )

    return with_a.map_batches(verify, batch_format="pyarrow", batch_size=8192)


def winnowing_fingerprints(sf_dir: str, window: int = 16, win: int = 8, docs=None):
    """(doc_id, fp_hash): the WINNOWING fingerprint set (Schleimer,
    Wilkerson, Aiken 2003 — the MOSS local fingerprinting scheme): the
    minimum rolling char-``window``-gram hash in every sliding window of
    ``win`` consecutive gram positions, DISTINCT per document.  Winnowing
    guarantees any match of length ``window + win - 1`` chars shares a
    fingerprint — the position-robust dedup/plagiarism index that a
    single whole-doc min (``rolling_fingerprints`` = 1-perm MinHash)
    cannot give.  Documents with fewer than ``win`` grams contribute one
    truncated-window fingerprint (the min of all their grams); empty
    docs contribute none.

    Scale shape: one vectorized pass per batch — the same
    ``char_shingles`` kernel as ``rolling_fingerprints`` (hash chain
    already SQL-oracle-anchored), a strided ``sliding_window_view`` min
    (full windows never cross doc boundaries because short docs take the
    reduceat path), and an in-batch lexsort dedup; output is the compact
    (doc, fingerprint) index ready for a groupby(fp) candidate join."""
    from numpy.lib.stride_tricks import sliding_window_view

    from minhash_ray.functions.shingles import char_shingles

    W = int(win)
    if W < 1:
        raise ValueError("win must be >= 1")

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        shingles, counts = char_shingles(texts, window, DOC_CFG.seed)
        ends = np.cumsum(counts)
        starts = ends - counts
        n = len(counts)
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)

        # long docs: every full window lies within one doc segment
        long = counts >= W
        if long.any() and len(shingles) >= W:
            sw = sliding_window_view(shingles, W).min(axis=1)
            n_win = (counts - W + 1)[long]
            gs = np.repeat(starts[long], n_win) + (
                np.arange(int(n_win.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(n_win) - n_win, n_win)
            )
            long_vals = sw[gs]
            long_docs = np.repeat(doc_ids[long], n_win)
        else:
            long_vals = np.empty(0, dtype=np.uint64)
            long_docs = np.empty(0, dtype=np.int64)

        # short docs (0 < n_grams < win): one truncated window = segment min
        short = (counts > 0) & ~long
        if short.any():
            short_vals = np.minimum.reduceat(shingles, starts[short])
            short_docs = doc_ids[short]
        else:
            short_vals = np.empty(0, dtype=np.uint64)
            short_docs = np.empty(0, dtype=np.int64)

        vals = np.concatenate([long_vals, short_vals])
        docs_r = np.concatenate([long_docs, short_docs])
        if len(vals):
            order = np.lexsort((vals, docs_r))
            v_s, d_s = vals[order], docs_r[order]
            first = np.ones(len(v_s), dtype=bool)
            first[1:] = (d_s[1:] != d_s[:-1]) | (v_s[1:] != v_s[:-1])
            v_s, d_s = v_s[first], d_s[first]
        else:
            v_s = np.empty(0, dtype=np.uint64)
            d_s = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(d_s, pa.int64()),
                "fp_hash": pa.array(v_s.astype(np.int64), pa.int64()),
            }
        )

    src = docs if docs is not None else _docs(sf_dir, ["doc_id", "text"])
    return src.map_batches(fn, batch_format="pyarrow")


def winnowing_dup_pairs(
    sf_dir: str,
    window: int = 16,
    win: int = 8,
    min_shared: int = 2,
    num_partitions: int = 8,
    docs=None,
):
    """(doc_id_a, doc_id_b, n_shared): document pairs sharing at least
    ``min_shared`` winnowing fingerprints — the MOSS match-detection step
    over :func:`winnowing_fingerprints` (any shared run of
    ``window + win - 1`` chars guarantees a shared fingerprint, so
    ``min_shared`` runs of shared prose force a pair out).

    Scale shape: one partitioned self-join on the fingerprint key (the
    inverted-index join), a<b ordering + batch-local partial pair counts
    (Arrow ``group_by`` in the map task), then the partials fold inside
    a PAIR-HASH partition (``groupby(pkey).map_groups`` with one
    vectorized Arrow aggregate per partition) and the HAVING gate runs in
    the same pass — the exchange carries pair partials, never fingerprint
    lists, and no stage asks Ray's aggregate to iterate the ~corpus-width
    set of distinct pairs as groups (measured 8.5 s wall / 130 s CPU for
    ~800k groups at sf0.1; the pkey fold is ~20× cheaper).  Ultra-common
    fingerprints (site boilerplate) are the skew risk; they are exactly
    the hot-key story of every exact join here, and the count semantics
    forbid dropping them by default."""
    import pyarrow.compute as pc

    from minhash_ray.stages.banding import splitmix64
    from minhash_ray.util import clamp_partitions, strip_empty_blocks

    np_parts = clamp_partitions(num_partitions)
    fps = winnowing_fingerprints(sf_dir, window=window, win=win, docs=docs).materialize()

    def right(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"fp_hash": batch.column("fp_hash"), "doc_id_b": batch.column("doc_id")}
        )

    joined = fps.join(
        fps.map_batches(right, batch_format="pyarrow"),
        join_type="inner",
        on=("fp_hash",),
        num_partitions=np_parts,
    )

    P = np.uint64(max(2, 4 * np_parts))

    def partial(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_id").to_numpy(zero_copy_only=False)
        b = batch.column("doc_id_b").to_numpy(zero_copy_only=False)
        keep = a < b
        t = pa.table(
            {
                "doc_id_a": pa.array(a[keep], pa.int64()),
                "doc_id_b": pa.array(b[keep], pa.int64()),
            }
        )
        agg = t.group_by(["doc_id_a", "doc_id_b"]).aggregate([([], "count_all")])
        aa = agg.column("doc_id_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        bb = agg.column("doc_id_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        pkey = (splitmix64(splitmix64(aa) ^ bb) % P).astype(np.int64)
        return pa.table(
            {
                "doc_id_a": agg.column("doc_id_a"),
                "doc_id_b": agg.column("doc_id_b"),
                "c": pc.cast(agg.column("count_all"), pa.int64()),
                "pkey": pa.array(pkey, pa.int64()),
            }
        )

    def fold_and_gate(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(["doc_id_a", "doc_id_b"]).aggregate([("c", "sum")])
        n = pc.cast(agg.column("c_sum"), pa.int64())
        t = pa.table(
            {
                "doc_id_a": agg.column("doc_id_a"),
                "doc_id_b": agg.column("doc_id_b"),
                "n_shared": n,
            }
        )
        return t.filter(pc.greater_equal(t.column("n_shared"), min_shared))

    return (
        strip_empty_blocks(joined.map_batches(partial, batch_format="pyarrow"))
        .groupby("pkey")
        .map_groups(fold_and_gate, batch_format="pyarrow")
    )


def doc_dedup_keep_best(
    sf_dir: str,
    cfg: PipelineConfig = DOC_CFG,
    num_partitions: int = 8,
    docs=None,
):
    """(doc_id, cluster_id, keep_first, keep_best): the tiered dedup
    clusters of :func:`doc_dedup_tiered` with BOTH keep policies a
    curation run chooses between — ``keep_first`` (min doc_id, the
    deterministic canonical rep) and ``keep_best`` (the cluster member
    with the MOST whitespace tokens, tie-broken to min doc_id) — the
    production policy when dup clusters mix truncated and full copies of
    a page and the longest copy is the one worth training on.

    Scale shape: the assignment table (3 int64 columns) joins per-doc
    token counts on a partitioned doc_id hash join; per-cluster argmax is
    ONE packed-int64 max (``n_tokens * 2^32 + (2^32-1 - doc_id)`` —
    lexicographic (max tokens, min doc_id) under plain integer max),
    folded as per-batch Arrow partials through a CLUSTER-HASH partition
    (``groupby(pkey).map_groups``, one vectorized aggregate per
    partition — never a Ray aggregate iterating corpus-width clusters as
    groups); a second slim join routes each winner back to its members.
    Packing headroom: doc_id < 2^32 and n_tokens < 2^31 (asserted per
    batch) — at larger id spaces widen to two-column max_by semantics."""
    import pyarrow.compute as pc

    from minhash_ray.stages.banding import splitmix64
    from minhash_ray.util import clamp_partitions

    np_parts = clamp_partitions(num_partitions)
    assign = doc_dedup_tiered(sf_dir, cfg, num_partitions, docs=docs)

    def tok(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(text))
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        n[pc.equal(pc.utf8_trim_whitespace(text), "").to_numpy(zero_copy_only=False)] = 0
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_tokens": pa.array(n, pa.int64())}
        )

    tokens = (_docs(sf_dir, ["doc_id", "text"]) if docs is None else docs).map_batches(
        tok, batch_format="pyarrow"
    )
    joined = assign.join(
        tokens, join_type="inner", on=("doc_id",), num_partitions=np_parts
    )

    HI = np.int64(1) << 32

    def pack(batch: pa.Table) -> pa.Table:
        doc = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False)
        nt = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        assert (doc >= 0).all() and (doc < HI).all(), "doc_id exceeds packing headroom"
        assert (nt < (HI >> 1)).all(), "n_tokens exceeds packing headroom"
        packed = nt * HI + (HI - 1 - doc)
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "cluster_id": pc.cast(batch.column("cluster_id"), pa.int64()),
                "keep_first": pc.cast(batch.column("keep"), pa.int64()),
                "packed": pa.array(packed, pa.int64()),
            }
        )

    packed_ds = joined.map_batches(pack, batch_format="pyarrow").materialize()

    P = np.uint64(max(2, 4 * np_parts))

    def best_partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by("cluster_id").aggregate([("packed", "max")])
        ck = agg.column("cluster_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "cluster_id": agg.column("cluster_id"),
                "bp": agg.column("packed_max"),
                "pkey": pa.array((splitmix64(ck) % P).astype(np.int64), pa.int64()),
            }
        )

    def best_fold(batch: pa.Table) -> pa.Table:
        agg = batch.group_by("cluster_id").aggregate([("bp", "max")])
        return pa.table(
            {"cluster_id": agg.column("cluster_id"), "bp": agg.column("bp_max")}
        )

    best = (
        packed_ds.map_batches(best_partial, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(best_fold, batch_format="pyarrow")
    )
    routed = packed_ds.join(
        best, join_type="inner", on=("cluster_id",), num_partitions=np_parts
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "cluster_id": batch.column("cluster_id"),
                "keep_first": batch.column("keep_first"),
                "keep_best": pc.cast(
                    pc.equal(batch.column("packed"), batch.column("bp")), pa.int64()
                ),
            }
        )

    return routed.map_batches(finalize, batch_format="pyarrow")


def dup_graph_components(
    sf_dir: str,
    cfg: PipelineConfig = DOC_CFG,
    num_partitions: int = 8,
    docs=None,
):
    """(doc_id, component_id): connected components of the verified
    near-dup pair graph, component id = min doc_id of the component —
    computed by the DISTRIBUTED min-label-propagation path
    (:func:`minhash_ray.stages.cluster.components_label_propagation`),
    never the driver union-find, so the oracle hash-match independently
    checks the 10^12-scale clustering code (``doc_dedup_tiered`` exercises
    the auto-switching ``assign_clusters``, which at test scale takes the
    driver path).  Only graph nodes get rows; singleton docs are not part
    of the pair graph (``doc_dedup_tiered`` is the every-doc variant)."""
    import ray.data as rd

    pairs = minhash_dup_pairs(sf_dir, cfg, num_partitions, docs=docs)
    if pairs.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "component_id": pa.array([], pa.int64()),
            }
        )
    from minhash_ray.stages.cluster import components_label_propagation

    edges = rd.from_arrow(pairs.select(["doc_id_a", "doc_id_b"]))
    return components_label_propagation(
        edges,
        num_partitions=num_partitions,
        col_a="doc_id_a",
        col_b="doc_id_b",
        out_cols=("doc_id", "component_id"),
    )


def dup_knn_graph(
    sf_dir: str,
    cfg: PipelineConfig = DOC_CFG,
    k: int = 3,
    num_partitions: int = 8,
    docs=None,
):
    """(doc_id, neighbor_id, sim, rnk): each document's k most-similar
    verified near-dup neighbors (rank 1..k, ties broken by neighbor id)
    — the k-NN similarity graph a curation run feeds to graph-based
    cluster analysis or semantic-dedup audits.

    Scale shape: the verified pair table is metadata-scale by
    construction; both directions of each edge go through the two-level
    exact top-k of ``relational.top_orders_per_customer`` (per-batch
    prune to <= k rows per doc, doc-hash partition, identical final
    selection — exact because a doc's global top-k is a subset of the
    union of its per-batch top-ks).  Sims are exact multiples of
    1/num_perm, so ranking on the integer equal-slot count is
    float-hazard-free."""
    import ray.data as rd

    from minhash_ray.stages.banding import splitmix64
    from minhash_ray.util import clamp_partitions

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("neighbor_id", pa.int64()),
         ("sim", pa.float64()), ("rnk", pa.int64())]
    )
    pairs = minhash_dup_pairs(sf_dir, cfg, num_partitions, docs=docs)
    if pairs.num_rows == 0:
        return pa.table(
            {"doc_id": [], "neighbor_id": [], "sim": [], "rnk": []},
            schema=out_schema,
        )
    P = np.uint64(max(2, clamp_partitions(num_partitions)))
    nperm = cfg.num_perm

    da = pairs.column("doc_id_a").to_numpy(zero_copy_only=False).astype(np.int64)
    db = pairs.column("doc_id_b").to_numpy(zero_copy_only=False).astype(np.int64)
    sim = pairs.column("sim").to_numpy(zero_copy_only=False)
    both = pa.table(
        {
            "doc_id": pa.array(np.concatenate([da, db]), pa.int64()),
            "neighbor_id": pa.array(np.concatenate([db, da]), pa.int64()),
            # integer equal-slot count: exact sort key (sim = n_eq/num_perm)
            "n_eq": pa.array(
                np.rint(np.concatenate([sim, sim]) * nperm).astype(np.int64),
                pa.int64(),
            ),
        }
    )

    def _topk(doc, nb, n_eq):
        order = np.lexsort((nb, -n_eq, doc))
        d_s = doc[order]
        n = len(order)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = d_s[1:] != d_s[:-1]
        idx = np.arange(n, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new, idx, 0))
        r = idx - start
        keep = r < k
        return order[keep], r[keep]

    def local(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy()
        nb = batch.column("neighbor_id").to_numpy()
        n_eq = batch.column("n_eq").to_numpy()
        sel, _ = _topk(doc, nb, n_eq)
        pkey = (splitmix64(doc[sel].astype(np.uint64)) % P).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc[sel], pa.int64()),
                "neighbor_id": pa.array(nb[sel], pa.int64()),
                "n_eq": pa.array(n_eq[sel], pa.int64()),
                "pkey": pa.array(pkey, pa.int64()),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy()
        nb = batch.column("neighbor_id").to_numpy()
        n_eq = batch.column("n_eq").to_numpy()
        sel, r = _topk(doc, nb, n_eq)
        return pa.table(
            {
                "doc_id": pa.array(doc[sel], pa.int64()),
                "neighbor_id": pa.array(nb[sel], pa.int64()),
                "sim": pa.array(n_eq[sel].astype(np.float64) / nperm, pa.float64()),
                "rnk": pa.array(r + 1, pa.int64()),
            }
        )

    pruned = rd.from_arrow(both).map_batches(local, batch_format="pyarrow")
    return pruned.groupby("pkey").map_groups(final, batch_format="pyarrow")


def cross_source_dups(
    sf_dir: str,
    cfg: PipelineConfig = DOC_CFG,
    num_partitions: int = 8,
    docs=None,
):
    """(source_a, source_b, n_pairs): near-dup pair counts per unordered
    SOURCE pair — the cross-corpus contamination matrix a multi-dump
    ingest run ships with (how much of dump A is near-copied in dump B;
    the diagonal is within-source duplication).

    Scale shape: the verified LSH pair table is metadata-scale by
    construction; each endpoint's source label is attached by ONE slim
    partitioned hash join against (doc_id, source) — never a broadcast
    of the corpus — and the matrix itself is |sources|² rows, so the
    final count is a tiny Ray aggregate over per-batch Arrow partials."""
    import pyarrow.compute as pc

    import ray.data as rd

    from minhash_ray.util import clamp_partitions, strip_empty_blocks

    out_schema = pa.schema(
        [("source_a", pa.string()), ("source_b", pa.string()), ("n_pairs", pa.int64())]
    )
    pairs = minhash_dup_pairs(sf_dir, cfg, num_partitions, docs=docs)
    if pairs.num_rows == 0:
        return pa.table(
            {"source_a": [], "source_b": [], "n_pairs": []}, schema=out_schema
        )
    np_ = clamp_partitions(num_partitions)
    src = (
        docs.select_columns(["doc_id", "source"])
        if docs is not None
        else _docs(sf_dir, ["doc_id", "source"])
    )
    src = strip_empty_blocks(src)
    pds = strip_empty_blocks(rd.from_arrow(pairs.select(["doc_id_a", "doc_id_b"])))

    j1 = pds.join(
        src, join_type="inner", on=("doc_id_a",), right_on=("doc_id",),
        num_partitions=np_,
    ).map_batches(
        lambda t: pa.table(
            {"doc_id_b": t.column("doc_id_b"), "source_a": t.column("source")}
        ),
        batch_format="pyarrow",
    )
    j2 = strip_empty_blocks(j1).join(
        src, join_type="inner", on=("doc_id_b",), right_on=("doc_id",),
        num_partitions=np_,
    )

    def partial(batch: pa.Table) -> pa.Table:
        sa, sb = batch.column("source_a"), batch.column("source")
        le = pc.less_equal(sa, sb)
        t = pa.table(
            {"source_a": pc.if_else(le, sa, sb), "source_b": pc.if_else(le, sb, sa)}
        )
        agg = t.group_by(["source_a", "source_b"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "source_a": agg.column("source_a"),
                "source_b": agg.column("source_b"),
                "c": pc.cast(agg.column("count_all"), pa.int64()),
            }
        )

    agg = (
        j2.map_batches(partial, batch_format="pyarrow")
        .groupby(["source_a", "source_b"])
        .sum("c")
    )
    t = pa.concat_tables(
        list(agg.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    )
    if t.num_rows == 0:
        return pa.table(
            {"source_a": [], "source_b": [], "n_pairs": []}, schema=out_schema
        )
    ccol = [c for c in t.column_names if c not in ("source_a", "source_b")][0]
    return pa.table(
        {
            "source_a": t.column("source_a"),
            "source_b": t.column("source_b"),
            "n_pairs": pc.cast(t.column(ccol), pa.int64()),
        }
    )


def dup_graph_degrees(
    sf_dir: str,
    cfg: PipelineConfig = DOC_CFG,
    num_partitions: int = 8,
    docs=None,
):
    """(doc_id, n_dups): near-dup fan-out per document over the verified
    LSH pair graph — the skew diagnostic a dedup run ships with (a doc
    with hundreds of near-dups is boilerplate/template content and the
    hot-bucket salting's natural customer; cf. ``find_hot_buckets``).

    Scale shape: the verified pair table is metadata-scale by
    construction (never all-pairs); degrees fold as per-batch Arrow
    partials through a doc-hash partition (``groupby(pkey).map_groups``
    — the distinct-doc set is corpus-width, so Ray's aggregate must
    never see docs as groups)."""
    import pyarrow.compute as pc

    import ray.data as rd

    from minhash_ray.stages.banding import splitmix64
    from minhash_ray.util import clamp_partitions

    P = np.uint64(max(2, 4 * clamp_partitions(num_partitions)))
    pairs = minhash_dup_pairs(sf_dir, cfg, num_partitions, docs=docs)
    both = pa.table(
        {
            "doc_id": pa.concat_arrays(
                [
                    pairs.column("doc_id_a").combine_chunks(),
                    pairs.column("doc_id_b").combine_chunks(),
                ]
            )
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by("doc_id").aggregate([([], "count_all")])
        ids = agg.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "doc_id": agg.column("doc_id"),
                "c": pc.cast(agg.column("count_all"), pa.int64()),
                "pkey": pa.array((splitmix64(ids) % P).astype(np.int64), pa.int64()),
            }
        )

    def fold(batch: pa.Table) -> pa.Table:
        agg = batch.group_by("doc_id").aggregate([("c", "sum")])
        return pa.table(
            {
                "doc_id": agg.column("doc_id"),
                "n_dups": pc.cast(agg.column("c_sum"), pa.int64()),
            }
        )

    return (
        rd.from_arrow(both)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(fold, batch_format="pyarrow")
    )


def minhash_sim_histogram(
    sf_dir: str,
    cfg: PipelineConfig = DOC_CFG,
    num_partitions: int = 8,
    docs=None,
):
    """(n_eq_slots, n_pairs): distribution of the fraction-equal estimator
    over the verified near-dup pairs, bucketed by the exact equal-slot
    COUNT (``sim * num_perm`` recovered as an integer — every sim is
    n/num_perm with a power-of-two denominator, so the recovery is
    float-exact) — the threshold-sensitivity diagnostic for tuning tau."""
    import ray.data as rd

    from ray.data.aggregate import Count

    pairs = minhash_dup_pairs(sf_dir, cfg, num_partitions, docs=docs)
    sims = pairs.column("sim").to_numpy()
    n_eq = np.floor(sims * cfg.num_perm + 0.5).astype(np.int64)
    t = pa.table({"n_eq_slots": pa.array(n_eq, pa.int64())})
    return rd.from_arrow(t).groupby("n_eq_slots").aggregate(
        Count(alias_name="n_pairs")
    )


def scoped_dup_pairs(
    sf_dir: str,
    scope_col: str = "lang",
    cfg: PipelineConfig = DOC_CFG,
    num_partitions: int = 8,
    docs=None,
):
    """(lang, doc_id_a, doc_id_b, sim): near-duplicate pairs WITHIN each
    scope — by default per language, the partition-scoped dedup a
    multilingual corpus runs (cross-language "duplicates" are usually
    translations worth keeping, and per-scope thresholds differ).

    Scale shape: the scope is folded into the LSH bucket key itself
    (``bucket ^= hash64(scope)`` on the band rows, one vectorized pass
    over the dictionary-encoded scope prefix), so CROSS-scope candidates
    never exist — the pair shuffle and the verify gather each cost what
    the largest scope costs, not what the corpus costs.  This is the
    bucket-salting machinery of the hot-band path reused as a semantic
    partitioner.  A residual prefix-equality filter after verify drops
    64-bit salt collisions (p ≈ 2^-64 per bucket pair; the filter also
    makes the guarantee independent of hash quality).

    Ids ride as ``rpad(scope, 8) | zero-padded doc_id`` strings through
    the shared banding/verify stages, so the scope is recoverable from
    the pair output without a join."""
    import pyarrow.compute as pc

    from minhash_ray.functions.hashing import hash_str_array
    from minhash_ray.stages.banding import make_minhash_band_fn
    from minhash_ray.stages.candidates import candidate_pairs
    from minhash_ray.stages.verify import verify_pairs

    if docs is None:
        docs = _docs(sf_dir, ["doc_id", "text", scope_col])

    sig_fn = make_doc_signature_fn(cfg)

    def sig_with_scope(batch: pa.Table) -> pa.Table:
        out = sig_fn(batch)                     # row-aligned with input
        return out.append_column("scope", batch.column(scope_col))

    sigs = docs.map_batches(
        sig_with_scope, batch_format="pyarrow", batch_size=cfg.batch_size or None
    ).materialize()

    def with_str_ids(batch: pa.Table) -> pa.Table:
        scope = pc.utf8_rpad(pc.cast(batch.column("scope"), pa.string()), 8, " ")
        did = pc.utf8_lpad(pc.cast(batch.column("doc_id"), pa.string()), 12, "0")
        ids = pc.binary_join_element_wise(scope, did, "|")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "clip_id": ids,
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

    def salt_by_scope(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ids = batch.column("clip_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        prefix = pc.utf8_slice_codeunits(ids, 0, 8)
        d = pc.dictionary_encode(prefix)
        uniq = d.dictionary.to_pylist()          # a handful of scopes
        salts = hash_str_array(uniq, seed=cfg.seed)
        per_row = salts[d.indices.to_numpy(zero_copy_only=False)]
        bucket = batch.column("bucket").to_numpy().astype(np.uint64) ^ per_row
        return pa.table(
            {
                "bucket": pa.array(bucket.view(np.int64), pa.int64()),
                "clip_id": ids,
            }
        )

    salted = band_rows.map_batches(salt_by_scope, batch_format="pyarrow")
    pairs = candidate_pairs(salted, cfg, num_partitions=num_partitions).materialize()

    def add_audio_fp(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "audio_fp", pa.array(np.zeros(batch.num_rows, dtype=np.uint64), pa.uint64())
        )

    n_docs = keyed.count()
    edges = verify_pairs(
        pairs,
        keyed.map_batches(add_audio_fp, batch_format="pyarrow"),
        cfg,
        n_clips=n_docs,
        num_partitions=num_partitions,
    ).materialize()

    def parse(batch: pa.Table) -> pa.Table:
        ia, ib = batch.column("clip_id_a"), batch.column("clip_id_b")
        la = pc.utf8_trim_whitespace(pc.utf8_slice_codeunits(ia, 0, 8))
        lb = pc.utf8_trim_whitespace(pc.utf8_slice_codeunits(ib, 0, 8))
        same = pc.equal(la, lb)                  # salt-collision guard
        t = pa.table(
            {
                "lang": la,
                "doc_id_a": pc.cast(pc.utf8_slice_codeunits(ia, 9, 21), pa.int64()),
                "doc_id_b": pc.cast(pc.utf8_slice_codeunits(ib, 9, 21), pa.int64()),
                "sim": batch.column("sim"),
            }
        )
        return t.filter(same)

    parsed = edges.map_batches(parse, batch_format="pyarrow")
    batches = list(parsed.iter_batches(batch_size=1_048_576, batch_format="pyarrow"))
    if not batches:
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
    vt = pa.concat_tables(batches)
    a = vt.column("doc_id_a").to_numpy()
    b = vt.column("doc_id_b").to_numpy()
    o = np.lexsort((b, a))
    first = np.ones(len(a), dtype=bool)
    if len(a) > 1:
        first[1:] = (a[o][1:] != a[o][:-1]) | (b[o][1:] != b[o][:-1])
    sel = pa.array(o[first])
    return pa.table(
        {
            "lang": vt.column("lang").take(sel),
            "doc_id_a": vt.column("doc_id_a").take(sel),
            "doc_id_b": vt.column("doc_id_b").take(sel),
            "sim": vt.column("sim").take(sel),
        }
    )


def snm_dup_pairs(
    sf_dir: str,
    window: int = 8,
    key_chars: int = 24,
    threshold: float = 0.3,
    cfg: PipelineConfig = DOC_CFG,
    num_partitions: int = 32,
    docs=None,
    broadcast_max_rows: int = 2_000_000,
) -> pa.Table:
    """Sorted-neighborhood near-dup pairs (Hernández & Stolfo's
    merge/purge): documents are globally ordered by a normalized sort key
    (first ``key_chars`` chars of ``lower(trim(text))``, tie-break
    doc_id); every pair within ``window`` positions of that order is a
    candidate; candidates gate on EXACT trigram-set Jaccard >=
    ``threshold`` through the shared join-attach verifier.  The
    complementary dedup family to LSH: O(n·window) candidates with recall
    governed by the sort key instead of band-collision probabilities —
    catches prefix-aligned near-dups deterministically.

    Scale shape: the global rank is a distributed ordered prefix COUNT in
    the :func:`~minhash_ray.pipelines.text.pack_sequences` pattern —
    partition by the top bits of the key's first-8-byte integer (range
    partitioning that agrees with the bytewise global order by
    construction; at production scale swap for sampled range bounds if
    key prefixes skew), per-partition lexsort gives local ranks, and P
    partition COUNTS fold into global offsets on the driver (metadata,
    never rows).  Neighbor candidates then ride the banded self-join of
    :func:`~minhash_ray.pipelines.events.range_join_recent` (band =
    rank // window; left copies to their own band, right copies to their
    own and previous band, each pair resolved exactly once in the left
    row's band).  Verification attaches shingle sets by partitioned
    joins — nothing corpus-width ever sits on the driver."""
    import ray.data as rd
    import pyarrow.compute as pc

    from minhash_ray.util import clamp_partitions, strip_empty_blocks

    w = int(window)
    if w <= 0:
        raise ValueError("window must be positive")
    np_parts = clamp_partitions(num_partitions)
    k_bits = max(1, int(np.ceil(np.log2(max(2, np_parts)))))
    shift = np.uint64(64 - k_bits)

    if docs is None:
        docs = _docs(sf_dir, ["doc_id", "text"])

    def keyed_rows(batch: pa.Table) -> pa.Table:
        key = pc.utf8_slice_codeunits(
            pc.utf8_lower(pc.utf8_trim_whitespace(batch.column("text"))), 0, key_chars
        )
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        kb = key.cast(pa.binary())
        # first-8-byte big-endian integer: ordering by (key8, key) equals
        # bytewise ordering by key (numpy 'S' and DuckDB both compare
        # UTF-8 bytes), so top-bit partitioning respects the global order
        key8 = _prefix_bytes_matrix(kb, 8).view(">u8").reshape(-1).astype(np.uint64)
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "key": kb,
                "part": pa.array((key8 >> shift).astype(np.int64), pa.int64()),
            }
        )

    slim = docs.map_batches(keyed_rows, batch_format="pyarrow").materialize()

    # metadata-scale offset fold: per-batch bincount partials (≤ P rows
    # each) summed on the driver — no groupby shuffle for P counters
    n_parts_total = 1 << k_bits

    def part_counts(batch: pa.Table) -> pa.Table:
        c = np.bincount(
            batch.column("part").to_numpy(), minlength=n_parts_total
        ).astype(np.int64)
        nz = np.flatnonzero(c)
        return pa.table(
            {"part": pa.array(nz, pa.int64()), "c": pa.array(c[nz], pa.int64())}
        )

    ct = pa.concat_tables(
        list(
            slim.map_batches(part_counts, batch_format="pyarrow").iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            )
        )
    )
    offsets = np.zeros(n_parts_total, dtype=np.int64)
    np.add.at(
        offsets,
        ct.column("part").to_numpy().astype(np.int64),
        ct.column("c").to_numpy().astype(np.int64),
    )
    offsets = np.concatenate(([0], np.cumsum(offsets)[:-1]))

    def rank_partition(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "r": pa.array([], pa.int64())}
            )
        ids = batch.column("doc_id").to_numpy()
        kb = batch.column("key")
        if isinstance(kb, pa.ChunkedArray):
            kb = kb.combine_chunks()
        # fixed-width 'S' view of the UTF-8 key bytes: \x00 padding sorts
        # before every real byte, so 'S' order == bytewise prefix order
        width = max(1, int(pc.max(pc.binary_length(kb)).as_py() or 1))
        keys = _prefix_bytes_matrix(kb, width).reshape(-1).view(f"S{width}")
        part = int(batch.column("part")[0].as_py())
        order = np.lexsort((ids, keys))
        r = np.empty(len(order), dtype=np.int64)
        r[order] = offsets[part] + np.arange(len(order), dtype=np.int64)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "r": pa.array(r, pa.int64())}
        )

    ranked = slim.groupby("part").map_groups(rank_partition, batch_format="pyarrow")

    # bands are corpus-width/w, so they ride a BAND-HASH partition
    # (groupby(pkey).map_groups) rather than Ray-aggregate groups; rank
    # uniqueness makes the searchsorted matches exact even when several
    # bands share a partition (a left's needed right rank is emitted to
    # the left's own band, hence to the left's partition)
    from minhash_ray.stages.banding import splitmix64 as _smx

    P_bands = np.uint64(max(2, 4 * np_parts))

    def band_rows(batch: pa.Table) -> pa.Table:
        r = batch.column("r").to_numpy()
        ids = batch.column("doc_id").to_numpy()
        band = r // w
        out_band = np.concatenate([band, band, band - 1])
        out_r = np.concatenate([r, r, r])
        out_ids = np.concatenate([ids, ids, ids])
        is_left = np.zeros(3 * len(r), dtype=bool)
        is_left[: len(r)] = True
        keep = out_band >= 0
        pkey = (_smx(out_band[keep].astype(np.uint64)) % P_bands).astype(np.int64)
        return pa.table(
            {
                "pkey": pa.array(pkey, pa.int64()),
                "r": pa.array(out_r[keep], pa.int64()),
                "doc_id": pa.array(out_ids[keep], pa.int64()),
                "is_left": pa.array(is_left[keep], pa.bool_()),
            }
        )

    def per_band(batch: pa.Table) -> pa.Table:
        r = batch.column("r").to_numpy()
        ids = batch.column("doc_id").to_numpy()
        left = batch.column("is_left").to_numpy(zero_copy_only=False)
        lr, lid = r[left], ids[left]
        rr, rid_all = r[~left], ids[~left]
        o = np.argsort(rr)
        rs, rid = rr[o], rid_all[o]
        out_a, out_b = [], []
        for d in range(1, w + 1):
            pos = np.searchsorted(rs, lr + d)
            ok = (pos < len(rs)) & (rs[np.minimum(pos, len(rs) - 1)] == lr + d)
            out_a.append(lid[ok])
            out_b.append(rid[pos[ok]])
        a = np.concatenate(out_a) if out_a else np.empty(0, dtype=np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "clip_id_a": pa.array(a, pa.int64()),
                "clip_id_b": pa.array(b, pa.int64()),
            }
        )

    cand = strip_empty_blocks(
        ranked.map_batches(band_rows, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(per_band, batch_format="pyarrow")
    )

    sets_ds = _doc_shingle_sets(sf_dir, cfg, docs=docs).materialize()
    # same size switch as _set_jaccard_pairs: broadcast pack under the
    # limit (saves two partitioned joins of list<u64> payloads — at 5k
    # docs/sf0.1 that is ~5 s of pure join latency), join-attach above
    if sets_ds.count() > broadcast_max_rows:
        verified = _ngram_verify_join(cand, sets_ds, threshold, num_partitions)
    else:
        verified = _ngram_verify_broadcast(cand, sets_ds, threshold)

    def normalize(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_id_a").to_numpy()
        b = batch.column("doc_id_b").to_numpy()
        return pa.table(
            {
                "doc_id_a": pa.array(np.minimum(a, b), pa.int64()),
                "doc_id_b": pa.array(np.maximum(a, b), pa.int64()),
                "jaccard": batch.column("jaccard"),
            }
        )

    return _dedupe_sorted_pairs(
        verified.map_batches(normalize, batch_format="pyarrow")
    )


def _seg_arange_i64(lengths: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated (int64)."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(lengths)
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(ends - lengths, lengths)
    return out


def _prefix_bytes_matrix(bin_arr: pa.Array, width: int) -> np.ndarray:
    """(n, width) uint8 matrix of each binary value's first ``width``
    bytes, zero-padded — one vectorized scatter from the Arrow buffers
    (offset-safe), no per-row Python."""
    n = len(bin_arr)
    buf = np.zeros((n, width), dtype=np.uint8)
    if n == 0:
        return buf
    flat = np.frombuffer(bin_arr.buffers()[2] or b"", dtype=np.uint8)
    offs_all = np.frombuffer(bin_arr.buffers()[1], dtype=np.int32)
    offs = offs_all[bin_arr.offset : bin_arr.offset + n + 1].astype(np.int64)
    ln = np.minimum(np.diff(offs), width)
    rows = np.repeat(np.arange(n), ln)
    cols = _seg_arange_i64(ln)
    buf[rows, cols] = flat[np.repeat(offs[:-1], ln) + cols]
    return buf


def dedup_cluster_sizes(
    sf_dir: str,
    cfg: PipelineConfig = DOC_CFG,
    num_partitions: int = 8,
    docs=None,
):
    """(cluster_size, n_clusters): the dup-cluster size histogram over the
    tiered dedup assignment — the one-line report every dedup run ends
    with (size-1 clusters = unique docs; the tail is the boilerplate).

    Scale shape: per-cluster sizes fold as per-batch Arrow partials
    through a cluster-hash partition (clusters are corpus-width — never
    Ray-aggregate groups), then the histogram itself is a tiny final
    groupby (distinct sizes only)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from minhash_ray.stages.banding import splitmix64
    from minhash_ray.util import clamp_partitions

    P = np.uint64(max(2, 4 * clamp_partitions(num_partitions)))
    assign = doc_dedup_tiered(sf_dir, cfg, num_partitions, docs=docs)

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by("cluster_id").aggregate([([], "count_all")])
        ck = agg.column("cluster_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "cluster_id": agg.column("cluster_id"),
                "c": pc.cast(agg.column("count_all"), pa.int64()),
                "pkey": pa.array((splitmix64(ck) % P).astype(np.int64), pa.int64()),
            }
        )

    def fold_to_hist(batch: pa.Table) -> pa.Table:
        sizes = batch.group_by("cluster_id").aggregate([("c", "sum")])
        hist = sizes.group_by("c_sum").aggregate([([], "count_all")])
        return pa.table(
            {
                "cluster_size": pc.cast(hist.column("c_sum"), pa.int64()),
                "n_partial": pc.cast(hist.column("count_all"), pa.int64()),
            }
        )

    return (
        assign.map_batches(partial, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(fold_to_hist, batch_format="pyarrow")
        .groupby("cluster_size")
        .aggregate(Sum("n_partial", alias_name="n_clusters"))
    )


def doc_dedup_tiered_append(
    new_docs,
    cfg: PipelineConfig = DOC_CFG,
    ckpt_root: str | None = None,
    num_partitions: int = 8,
):
    """Incremental update of a checkpointed :func:`doc_dedup_tiered`
    corpus: merge a NEW documents partition without re-digesting,
    re-sketching or re-verifying the old corpus — the document-side
    counterpart of the flagship's ``append_clips`` (the reference's
    insert-while-query workload, test/fcds/test_fixed_queries_infinite_write.c:90-99,
    re-expressed over immutable checkpoints).

    What runs per append (new partition = the small side by design):

    1. **exact tier merge** — new docs are digested and grouped; groups
       joining an EXISTING digest route through its rep (an exact dup
       costs one join row, nothing else); brand-new groups become new
       reps.  A new doc id smaller than its group's old rep RENAMES the
       rep (min-fold determinism) — renames are metadata-scale and
       rewrite only int64 id columns, never sketches (same text ⇒ same
       signature).
    2. **near tier** — ONLY brand-new reps are sketched (old rep
       signatures load from the ``tier2_sigs`` checkpoint); banding runs
       over the merged slim signature table but the pair shuffle is
       restricted to buckets the new reps touch, and only pairs touching
       a new rep are verified.  Old-old pairs come verbatim (renamed)
       from ``tier2_pairs``.
    3. **cluster tier** — connected components re-run over the merged
       metadata-scale pair list.  OLD docs are re-routed WITHOUT
       re-reading the old corpus: an old doc's previous cluster root is
       itself a rep connected to the doc's rep by checkpointed edges, so
       ``new_cluster(old doc) = cluster(rename(old_cluster_id))`` — one
       slim join against the previous ``tier3_assign``.

    The result is saved back to the same checkpoint stages and is equal
    to a single-shot run over (old ∪ new) — asserted exactly by pytest,
    the same standard as ``append_clips`` (for pathological hot buckets
    the star+chain candidate ROOTS can differ between the two runs while
    cluster connectivity stays equal; the equality test covers the
    planted fixture).

    **Crash atomicity (epoch protocol).**  The append mutates four stages
    in sequence; a crash between saves must not leave a silently-wrong
    corpus.  Before touching anything the append publishes an
    ``append_plan`` stage (the rename map + brand-new groups + a hash of
    the new ids) tagged with the NEXT epoch; every stage save carries the
    same epoch.  A rerun after a crash detects the epoch skew, verifies
    the rerun's input matches the plan's id hash, and ROLLS FORWARD:
    stages already at the new epoch load as-is, stages behind re-apply
    their step from the saved plan (the rename map is the state a naive
    rerun cannot rederive once tier1 is merged).  A rerun after a
    COMPLETED append fails the disjointness check with a clear error.

    Preconditions: complete tier1_reps / tier2_sigs / tier2_pairs /
    tier3_assign checkpoints for this config, and new doc_ids disjoint
    from the ingested corpus (validated before any mutation)."""
    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    from minhash_ray.stages.banding import make_minhash_band_fn
    from minhash_ray.stages.candidates import candidate_pairs
    from minhash_ray.stages.cluster import assign_clusters
    from minhash_ray.stages.verify import verify_pairs
    from minhash_ray.state.checkpoint import CheckpointManager
    from minhash_ray.util import cached_get, clamp_partitions, strip_empty_blocks

    if not ckpt_root:
        raise ValueError("doc_dedup_tiered_append requires a checkpoint root")
    ckpt = CheckpointManager(ckpt_root, cfg)
    ckpt.clear_stale_temps()
    for stage in ("tier1_reps", "tier2_sigs", "tier2_pairs", "tier3_assign"):
        if not ckpt.is_complete(stage):
            raise ValueError(f"append needs a complete {stage!r} checkpoint")

    np_parts = clamp_partitions(num_partitions)
    new_keyed = new_docs.map_batches(_add_text_digest, batch_format="pyarrow").materialize()

    # new-side ids (small side by design — same driver gather as append_clips)
    id_chunks = [
        b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        for b in new_keyed.select_columns(["doc_id"]).iter_batches(
            batch_size=1_048_576, batch_format="pyarrow"
        )
    ]
    new_ids = np.sort(np.concatenate(id_chunks)) if id_chunks else np.empty(0, np.int64)

    # --- epoch protocol: detect a crashed previous append ---
    import hashlib as _hashlib

    stages4 = ("tier1_reps", "tier2_sigs", "tier2_pairs", "tier3_assign")
    epochs = {
        s: int((ckpt.manifest(s) or {}).get("append_epoch", 0)) for s in stages4
    }
    base = max(epochs.values())
    plan_m = ckpt.manifest("append_plan")
    plan_e = int(plan_m.get("append_epoch", 0)) if plan_m else 0
    new_ids_sha = _hashlib.sha1(new_ids.tobytes()).hexdigest()
    resuming = (plan_e == base + 1) or (plan_e == base and min(epochs.values()) < base)
    if not resuming and min(epochs.values()) < base:
        raise ValueError(
            "doc_dedup_tiered_append: stage epochs disagree but no append "
            f"plan covers them ({epochs}); checkpoint needs a fresh run"
        )
    e_next = plan_e if resuming else base + 1

    old_assign = ckpt.load("tier3_assign")
    if resuming:
        if plan_m.get("new_ids_sha") != new_ids_sha:
            raise ValueError(
                "doc_dedup_tiered_append: resuming a crashed append but the "
                "new partition differs from the one the plan was built for"
            )
        plan_tbl = pa.concat_tables(
            list(
                ckpt.load("append_plan").iter_batches(
                    batch_size=1_048_576, batch_format="pyarrow"
                )
            )
        )
        is_ren = pc.equal(plan_tbl.column("kind"), 0)
        rt = plan_tbl.filter(is_ren)
        ren_old = rt.column("old_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ren_new = rt.column("new_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ft = plan_tbl.filter(pc.equal(plan_tbl.column("kind"), 1))
        fresh_tbls = (
            [
                pa.table(
                    {
                        "dg0": ft.column("dg0"),
                        "dg1": ft.column("dg1"),
                        "rep_id": ft.column("new_id"),
                        "text": ft.column("text"),
                    }
                )
            ]
            if ft.num_rows
            else []
        )
    else:
        # disjointness BEFORE mutating persistent state
        if len(new_ids):
            for b in old_assign.select_columns(["doc_id"]).iter_batches(
                batch_size=1_048_576, batch_format="pyarrow"
            ):
                old = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
                pos = np.minimum(np.searchsorted(new_ids, old), len(new_ids) - 1)
                hit = new_ids[pos] == old
                if hit.any():
                    raise ValueError(
                        f"doc_dedup_tiered_append: doc_id {int(old[hit][0])} already "
                        "ingested; new doc_ids must be disjoint from the corpus"
                    )

        # --- merge plan: renames + brand-new groups ---
        agg = new_keyed.groupby(["dg0", "dg1"]).min(["doc_id", "text"])

        def rename_new_groups(batch: pa.Table) -> pa.Table:
            dcol = [c for c in batch.column_names if "doc_id" in c][0]
            tcol = [c for c in batch.column_names if "text" in c][0]
            return pa.table(
                {
                    "dg0": batch.column("dg0"),
                    "dg1": batch.column("dg1"),
                    "new_min": pc.cast(batch.column(dcol), pa.int64()),
                    "new_text": batch.column(tcol),
                }
            )

        # groupby output can carry schema-less empty blocks that break the
        # Acero join (strip_empty_blocks doc: mandatory barrier before joins)
        new_groups = strip_empty_blocks(
            agg.map_batches(rename_new_groups, batch_format="pyarrow")
        )
        matched = new_groups.join(
            ckpt.load("tier1_reps"),
            join_type="left_outer", on=("dg0", "dg1"), num_partitions=np_parts,
        ).materialize()

        # renames + brand-new groups are both bounded by the new partition
        rn_old, rn_new = [], []
        fresh_tbls = []
        for b in matched.iter_batches(batch_size=1_048_576, batch_format="pyarrow"):
            isnull = pc.is_null(b.column("rep_id")).to_numpy(zero_copy_only=False)
            # a null int64 column round-trips as float64 + NaN: mask BEFORE cast
            old_f = b.column("rep_id").to_numpy(zero_copy_only=False).astype(np.float64)
            old_rep = np.where(isnull, np.float64(2**62), old_f).astype(np.int64)
            new_min = b.column("new_min").to_numpy(zero_copy_only=False).astype(np.int64)
            ren = (~isnull) & (new_min < old_rep)
            if ren.any():
                rn_old.append(old_rep[ren])
                rn_new.append(new_min[ren])
            if isnull.any():
                sel = pa.array(np.flatnonzero(isnull))
                fresh_tbls.append(
                    pa.table(
                        {
                            "dg0": b.column("dg0").take(sel),
                            "dg1": b.column("dg1").take(sel),
                            "rep_id": pc.cast(b.column("new_min").take(sel), pa.int64()),
                            "text": b.column("new_text").take(sel),
                        }
                    )
                )
        ren_old = np.concatenate(rn_old) if rn_old else np.empty(0, np.int64)
        ren_new = np.concatenate(rn_new) if rn_new else np.empty(0, np.int64)

        # publish the plan FIRST: after any later crash a rerun can roll
        # forward from it (the rename map is otherwise unrecoverable)
        ftbl = (
            pa.concat_tables(fresh_tbls)
            if fresh_tbls
            else pa.table(
                {
                    "dg0": pa.array([], pa.int64()),
                    "dg1": pa.array([], pa.int64()),
                    "rep_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                }
            )
        )
        plan_tbl = pa.table(
            {
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(len(ren_old), np.int8), np.ones(ftbl.num_rows, np.int8)]
                    ),
                    pa.int8(),
                ),
                "dg0": pa.concat_arrays(
                    [pa.array(np.zeros(len(ren_old), np.int64), pa.int64()),
                     ftbl.column("dg0").combine_chunks().cast(pa.int64())]
                ),
                "dg1": pa.concat_arrays(
                    [pa.array(np.zeros(len(ren_old), np.int64), pa.int64()),
                     ftbl.column("dg1").combine_chunks().cast(pa.int64())]
                ),
                "old_id": pa.concat_arrays(
                    [pa.array(ren_old, pa.int64()),
                     pa.array(np.full(ftbl.num_rows, -1, np.int64), pa.int64())]
                ),
                "new_id": pa.concat_arrays(
                    [pa.array(ren_new, pa.int64()),
                     ftbl.column("rep_id").combine_chunks().cast(pa.int64())]
                ),
                "text": pa.concat_arrays(
                    [pa.array([""] * len(ren_old), pa.string()),
                     ftbl.column("text").combine_chunks()]
                ),
            }
        )
        ckpt.save(
            "append_plan",
            rd.from_arrow(plan_tbl),
            schema=plan_tbl.schema,
            extra={"append_epoch": e_next, "new_ids_sha": new_ids_sha},
        )

    o = np.argsort(ren_old)
    ren_old, ren_new = ren_old[o], ren_new[o]
    ren_ref = [ray.put({"old": ren_old, "new": ren_new})]

    def rename_col(col, rmap) -> pa.Array:
        v = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
        if len(rmap["old"]):
            pos = np.minimum(np.searchsorted(rmap["old"], v), len(rmap["old"]) - 1)
            hit = rmap["old"][pos] == v
            v = np.where(hit, rmap["new"][pos], v)
        return pa.array(v, pa.int64())

    def rename_reps(batch: pa.Table) -> pa.Table:
        rmap = cached_get(ren_ref[0])
        return pa.table(
            {
                "dg0": batch.column("dg0"),
                "dg1": batch.column("dg1"),
                "rep_id": rename_col(batch.column("rep_id"), rmap),
                "text": batch.column("text"),
            }
        )

    fresh = (
        rd.from_arrow(pa.concat_tables(fresh_tbls))
        if fresh_tbls
        else None
    )
    epoch_extra = {"append_epoch": e_next, "new_ids_sha": new_ids_sha}

    if epochs["tier1_reps"] < e_next:
        merged_reps = ckpt.load("tier1_reps").map_batches(
            rename_reps, batch_format="pyarrow"
        )
        if fresh is not None:
            merged_reps = merged_reps.union(fresh)
        merged_reps = ckpt.save(
            "tier1_reps", merged_reps.materialize(), extra=epoch_extra
        ).materialize()
    else:
        merged_reps = ckpt.load("tier1_reps").materialize()

    # --- tier 2: sketch ONLY brand-new reps ---
    def rename_sigs(batch: pa.Table) -> pa.Table:
        rmap = cached_get(ren_ref[0])
        return batch.set_column(
            batch.column_names.index("doc_id"),
            "doc_id",
            rename_col(batch.column("doc_id"), rmap),
        )

    fresh_ids = (
        np.sort(
            pa.concat_tables(fresh_tbls).column("rep_id").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if fresh_tbls
        else np.empty(0, np.int64)
    )

    if epochs["tier2_sigs"] < e_next:
        old_sigs = ckpt.load("tier2_sigs").map_batches(
            rename_sigs, batch_format="pyarrow"
        )
        if fresh is not None:
            fresh_docs = fresh.map_batches(
                lambda b: pa.table(
                    {"doc_id": b.column("rep_id"), "text": b.column("text")}
                ),
                batch_format="pyarrow",
            )
            new_sigs = doc_signatures("", cfg, docs=fresh_docs).materialize()
            merged_sigs = old_sigs.union(new_sigs).materialize()
        else:
            new_sigs = None
            merged_sigs = old_sigs.materialize()
        merged_sigs = ckpt.save(
            "tier2_sigs", merged_sigs, input_stage="tier1_reps", extra=epoch_extra
        ).materialize()
    else:
        merged_sigs = ckpt.load("tier2_sigs").materialize()
        if len(fresh_ids):
            def only_fresh(batch: pa.Table) -> pa.Table:
                ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
                pos = np.minimum(np.searchsorted(fresh_ids, ids), len(fresh_ids) - 1)
                return batch.filter(pa.array(fresh_ids[pos] == ids))

            new_sigs = merged_sigs.map_batches(
                only_fresh, batch_format="pyarrow"
            ).materialize()
        else:
            new_sigs = None

    def pad12(col) -> pa.Array:
        out = pc.utf8_lpad(pc.cast(col, pa.string()), 12, "0")
        return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out

    def with_str_ids(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "clip_id": pad12(batch.column("doc_id")),
                "signature": batch.column("signature"),
                "simhash": batch.column("simhash"),
                "n_shingles": batch.column("n_shingles"),
            }
        )

    keyed = merged_sigs.map_batches(with_str_ids, batch_format="pyarrow").materialize()

    def run_tier3(merged_pairs: pa.Table):
        # --- tier 3: cluster merged reps, route old docs via their
        # previous cluster root (a rep, connected by checkpointed edges) ---
        pairs_ds = rd.from_arrow(
            pa.table(
                {
                    "clip_id_a": pad12(merged_pairs.column("doc_id_a")),
                    "clip_id_b": pad12(merged_pairs.column("doc_id_b")),
                }
            )
        )
        rep_ids = merged_reps.map_batches(
            lambda b: pa.table({"clip_id": pad12(b.column("rep_id"))}),
            batch_format="pyarrow",
        )
        assign = assign_clusters(rep_ids, pairs_ds, cfg, num_partitions=num_partitions)

        # new docs route through their (merged) exact group rep
        new_routed = new_keyed.select_columns(["doc_id", "dg0", "dg1"]).join(
            merged_reps.select_columns(["dg0", "dg1", "rep_id"]),
            join_type="inner",
            on=("dg0", "dg1"),
            num_partitions=np_parts,
        ).map_batches(
            lambda b: pa.table(
                {"doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                 "rep_key": pad12(b.column("rep_id"))}
            ),
            batch_format="pyarrow",
        )

        # old docs route through rename(old_cluster_id)
        def old_route(batch: pa.Table) -> pa.Table:
            rmap = cached_get(ren_ref[0])
            return pa.table(
                {
                    "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                    "rep_key": pad12(rename_col(batch.column("cluster_id"), rmap)),
                }
            )

        old_routed = old_assign.map_batches(old_route, batch_format="pyarrow")
        routed = strip_empty_blocks(old_routed.union(new_routed)).join(
            assign, join_type="inner", on=("rep_key",), right_on=("clip_id",),
            num_partitions=np_parts,
        )

        def finalize(batch: pa.Table) -> pa.Table:
            cluster = pc.cast(batch.column("cluster_id"), pa.int64())
            doc = pc.cast(batch.column("doc_id"), pa.int64())
            keep = pc.cast(pc.equal(doc, cluster), pa.int64())
            return pa.table({"doc_id": doc, "cluster_id": cluster, "keep": keep})

        out = routed.map_batches(finalize, batch_format="pyarrow")
        return ckpt.save(
            "tier3_assign",
            out,
            input_stage="tier2_pairs",
            schema=pa.schema(
                [("doc_id", pa.int64()), ("cluster_id", pa.int64()), ("keep", pa.int64())]
            ),
            extra=epoch_extra,
        )

    if epochs["tier2_pairs"] >= e_next:
        merged_pairs = pa.concat_tables(
            list(
                ckpt.load("tier2_pairs").iter_batches(
                    batch_size=1_048_576, batch_format="pyarrow"
                )
            )
        )
        return run_tier3(merged_pairs)

    # old pairs, renamed (and re-ordered where a rename crossed the pair)
    old_pairs_tbls = list(
        ckpt.load("tier2_pairs").iter_batches(batch_size=1_048_576, batch_format="pyarrow")
    )
    if old_pairs_tbls:
        opt = pa.concat_tables(old_pairs_tbls)
        rmap = {"old": ren_old, "new": ren_new}
        a = rename_col(opt.column("doc_id_a"), rmap).to_numpy()
        b_ = rename_col(opt.column("doc_id_b"), rmap).to_numpy()
        old_pairs = pa.table(
            {
                "doc_id_a": pa.array(np.minimum(a, b_), pa.int64()),
                "doc_id_b": pa.array(np.maximum(a, b_), pa.int64()),
                "sim": opt.column("sim"),
            }
        )
    else:
        old_pairs = pa.table(
            {
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )

    if new_sigs is not None:
        band_fn = make_minhash_band_fn(cfg.bands, cfg.rows_per_band, cfg.num_perm)
        new_keyed_sigs = new_sigs.map_batches(with_str_ids, batch_format="pyarrow")
        bucket_chunks = [
            np.unique(b.column("bucket").to_numpy())
            for b in new_keyed_sigs.map_batches(band_fn, batch_format="pyarrow")
            .select_columns(["bucket"])
            .iter_batches(batch_size=1_048_576, batch_format="pyarrow")
        ]
        touched = (
            np.unique(np.concatenate(bucket_chunks))
            if bucket_chunks
            else np.empty(0, np.int64)
        )
        touched_ref = [ray.put(touched)]

        def keep_touched(batch: pa.Table) -> pa.Table:
            tb = cached_get(touched_ref[0])
            if len(tb) == 0:
                return batch.slice(0, 0)
            buckets = batch.column("bucket").to_numpy()
            pos = np.minimum(np.searchsorted(tb, buckets), len(tb) - 1)
            return batch.filter(pa.array(tb[pos] == buckets))

        band_rows = keyed.map_batches(band_fn, batch_format="pyarrow").map_batches(
            keep_touched, batch_format="pyarrow"
        )
        cand = candidate_pairs(band_rows, cfg, num_partitions=num_partitions)

        fresh_np = new_sigs.select_columns(["doc_id"]).to_pandas()["doc_id"].to_numpy()
        fresh_pad = np.sort(
            np.char.zfill(fresh_np.astype(np.int64).astype("U12"), 12).astype("S12")
        )
        fresh_ref = [ray.put(fresh_pad)]

        def keep_new_pairs(batch: pa.Table) -> pa.Table:
            from minhash_ray.util import bytes_key_array

            ids = cached_get(fresh_ref[0])
            if len(ids) == 0:
                return batch.slice(0, 0)

            def member(col):
                v = bytes_key_array(batch.column(col))
                pos = np.minimum(np.searchsorted(ids, v), len(ids) - 1)
                return ids[pos] == v

            return batch.filter(pa.array(member("clip_id_a") | member("clip_id_b")))

        cand = cand.map_batches(keep_new_pairs, batch_format="pyarrow").materialize()

        def add_audio_fp(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "audio_fp",
                pa.array(np.zeros(batch.num_rows, dtype=np.uint64), pa.uint64()),
            )

        n_total = keyed.count()
        new_edges = verify_pairs(
            cand,
            keyed.map_batches(add_audio_fp, batch_format="pyarrow"),
            cfg,
            n_clips=n_total,
            num_partitions=num_partitions,
        )

        def to_int_pairs(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id_a": pc.cast(batch.column("clip_id_a"), pa.int64()),
                    "doc_id_b": pc.cast(batch.column("clip_id_b"), pa.int64()),
                    "sim": batch.column("sim"),
                }
            )

        new_pairs = _dedupe_sorted_pairs(
            new_edges.map_batches(to_int_pairs, batch_format="pyarrow"), val_col="sim"
        )
        merged_pairs = pa.concat_tables([old_pairs, new_pairs])
    else:
        merged_pairs = old_pairs
    merged_pairs = _dedupe_sorted_pairs(rd.from_arrow(merged_pairs), val_col="sim")
    ckpt.save(
        "tier2_pairs",
        rd.from_arrow(merged_pairs),
        input_stage="tier1_reps",
        schema=merged_pairs.schema,
        extra=epoch_extra,
    )
    return run_tier3(merged_pairs)


# ---------------------------------------------------------------------------
# Corpus-level repeated n-gram scrub (boilerplate removal)
# ---------------------------------------------------------------------------


def _scrub_from_hits(flat, counts, w: int, hit_rows, hit_starts):
    """Shared scrub core: delete every token position covered by a hit
    w-gram occurrence.  ``flat``/``counts`` are the batch's tokenized
    strings (one ``tokenize_with_strings`` pass, shared with the gram
    hashing so each batch tokenizes exactly once); ``hit_rows``/
    ``hit_starts`` are parallel int64 arrays naming gram occurrences
    (row index in this batch, 0-based token start).  Returns (scrubbed
    StringArray, n_removed int64 array).

    Coverage is a vectorized interval stab: each hit gram contributes
    +1 at its start and -1 one past its end in a per-row-padded delta
    array (one extra slot per row so the -1 of a gram ending at the row
    boundary never leaks into the next row), and covered = running sum
    > 0 — no per-row Python, no per-gram loop.
    """
    import pyarrow.compute as pc

    from minhash_ray.functions.shingles import _segmented_arange

    n_rows = len(counts)
    ext = counts + 1                       # one spill slot per row
    ext_starts = np.cumsum(ext) - ext
    delta = np.zeros(int(ext.sum()), dtype=np.int64)
    if len(hit_rows):
        gpos = ext_starts[hit_rows] + hit_starts
        np.add.at(delta, gpos, 1)
        np.add.at(delta, gpos + w, -1)     # start+w <= counts[row] → in-segment
    cov = np.cumsum(delta) > 0
    tok_row = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    tok_ext = ext_starts[tok_row] + _segmented_arange(counts)
    covered_tok = cov[tok_ext] if len(tok_row) else np.zeros(0, dtype=bool)
    n_removed = np.bincount(tok_row[covered_tok], minlength=n_rows).astype(np.int64)
    kept_counts = counts - n_removed
    offsets = np.concatenate(([0], np.cumsum(kept_counts)))
    kept_list = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        flat.filter(pa.array(~covered_tok)) if len(tok_row) else flat,
    )
    return pc.binary_join(kept_list, " "), n_removed


def repeated_ngram_scrub(
    sf_dir: str,
    w: int | None = None,
    min_df: int = 4,
    num_partitions: int = 8,
    broadcast_max_rows: int = 2_000_000,
    cfg: PipelineConfig = DOC_CFG,
    docs=None,
):
    """Corpus-level repeated n-gram scrub: remove EVERY occurrence of any
    token w-gram that appears in >= ``min_df`` distinct documents (the
    boilerplate / navigation-chrome filter of CCNet-style curation — the
    frequency-threshold complement of ``chunk_dedup_docs``' keep-first
    semantics, in the spirit of Lee et al. 2021's repeated-substring
    removal at w-gram granularity).  A token survives iff no hot gram
    occurrence covers its position; docs are reassembled from surviving
    normalized tokens.  Output: (doc_id, text_scrubbed, n_removed).

    Scale shape (two wide ops, text never shuffled in the common path):
      1. df pass — per-batch per-doc-distinct gram counts fold through a
         gram-hash partition (``fold_by_int_keys``; each doc lives in
         exactly one batch, so summed partials are exact distinct-doc
         counts), then the >=min_df gate.
      2. scrub — if the hot set fits (``broadcast_max_rows``; 8 B/gram,
         and boilerplate is small by construction at a sane min_df) it is
         broadcast once via ``ray.put`` and the corpus streams through
         one searchsorted probe + interval-stab scrub.  Above the limit
         nothing is driver-resident: gram occurrences (doc_id, s, g)
         join the hot table on g, covered starts aggregate per doc
         through a doc-hash fold, and ONE left-outer join carries them
         back onto the docs (the join-attach pattern of
         ``_ngram_verify_join``), proven bit-identical by the forced-path
         pytest.

    Uses the MinHash chain's tokenizer + w-gram polynomial
    (``token_shingles``), so the DuckDB oracle replays the full chain in
    HUGEINT SQL and checks the scrubbed TEXT byte-for-byte.
    """
    import pyarrow.compute as pc

    import ray
    from minhash_ray.functions.hashing import combine_wgrams
    from minhash_ray.functions.shingles import (
        _segmented_arange,
        token_shingles,
        tokenize_with_strings,
    )
    from minhash_ray.util import clamp_partitions, fold_by_int_keys, strip_empty_blocks

    w = cfg.shingle_w if w is None else int(w)
    np_parts = clamp_partitions(num_partitions)
    ds = docs if docs is not None else _docs(sf_dir, ["doc_id", "text"])

    def df_partial(batch: pa.Table) -> pa.Table:
        sh, cnt = token_shingles(batch.column("text"), w, cfg.seed)
        row = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
        if len(sh):
            o = np.lexsort((sh, row))
            rs, gs = row[o], sh[o]
            first = np.ones(len(gs), dtype=bool)
            first[1:] = (rs[1:] != rs[:-1]) | (gs[1:] != gs[:-1])
            gs = gs[first]                 # per-doc distinct grams
        else:
            gs = sh
        ug, c = np.unique(gs, return_counts=True)
        return pa.table(
            {
                "g": pa.array(ug.view(np.int64), pa.int64()),
                "df": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def df_final(t: pa.Table) -> pa.Table:
        agg = t.group_by(["g"]).aggregate([("df", "sum")])
        keep = pc.greater_equal(agg.column("df_sum"), min_df)
        return pa.table({"g": agg.column("g").filter(keep)})

    # strip_empty_blocks: the fold's empty partitions emit schema-less
    # blocks that poison the Acero join below (mandatory pre-join barrier)
    hot = strip_empty_blocks(
        fold_by_int_keys(ds, ["g"], df_partial, df_final, num_partitions)
    )
    n_hot = hot.count()

    if n_hot <= broadcast_max_rows:
        # fast path: one sorted uint64 pack, corpus streams searchsorted
        parts = [
            b.column("g").to_numpy().view(np.uint64)
            for b in hot.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        ]
        hot_sorted = (
            np.sort(np.concatenate(parts)) if parts else np.empty(0, dtype=np.uint64)
        )
        hot_ref = ray.put(hot_sorted)

        def scrub(batch: pa.Table) -> pa.Table:
            hs = ray.get(hot_ref)          # plasma-cached per worker
            # ONE tokenize pass feeds both the gram hashes and reassembly
            flat_toks, counts, tok_hashes = tokenize_with_strings(
                batch.column("text"), cfg.seed
            )
            s_cnt = np.maximum(counts - (w - 1), 0).astype(np.int64)
            tok_starts = np.cumsum(counts) - counts
            gram_local = _segmented_arange(s_cnt)
            starts = np.repeat(tok_starts, s_cnt) + gram_local
            sh = combine_wgrams(tok_hashes, starts, w)
            gram_row = np.repeat(np.arange(len(s_cnt), dtype=np.int64), s_cnt)
            if len(sh) and len(hs):
                pos = np.minimum(np.searchsorted(hs, sh), len(hs) - 1)
                hit = hs[pos] == sh
            else:
                hit = np.zeros(len(sh), dtype=bool)
            text_s, n_rem = _scrub_from_hits(
                flat_toks, counts, w, gram_row[hit], gram_local[hit]
            )
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "text_scrubbed": text_s,
                    "n_removed": pa.array(n_rem, pa.int64()),
                }
            )

        return ds.map_batches(scrub, batch_format="pyarrow")

    # join-attach path: nothing driver-resident
    def explode_grams(batch: pa.Table) -> pa.Table:
        sh, s_cnt = token_shingles(batch.column("text"), w, cfg.seed)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, s_cnt), pa.int64()),
                "s": pa.array(_segmented_arange(s_cnt), pa.int64()),
                "g": pa.array(sh.view(np.int64), pa.int64()),
            }
        )

    cov_pairs = ds.map_batches(explode_grams, batch_format="pyarrow").join(
        hot, join_type="inner", on=("g",), num_partitions=np_parts
    )

    def cov_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id"), "s": batch.column("s")})

    def cov_final(t: pa.Table) -> pa.Table:
        # pack each doc's covered-start list as raw int64 bytes — Acero
        # rejects list payloads in join non-key fields (the same
        # large_binary packing verify_shuffle uses for shingle sets)
        agg = t.group_by(["doc_id"]).aggregate([("s", "list")])
        sl = agg.column("s_list")
        if isinstance(sl, pa.ChunkedArray):
            sl = sl.combine_chunks()
        flat = sl.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offs = sl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        pack = pa.Array.from_buffers(
            pa.large_binary(),
            len(sl),
            [None, pa.py_buffer((offs * 8).tobytes()), pa.py_buffer(flat.tobytes())],
        )
        return pa.table({"doc_id": agg.column("doc_id"), "s_pack": pack})

    starts_ds = strip_empty_blocks(
        fold_by_int_keys(cov_pairs, ["doc_id"], cov_partial, cov_final, num_partitions)
    )
    joined = ds.join(
        starts_ds, join_type="left_outer", on=("doc_id",), num_partitions=np_parts
    )

    def scrub_joined(batch: pa.Table) -> pa.Table:
        sl = batch.column("s_pack")
        if isinstance(sl, pa.ChunkedArray):
            sl = sl.combine_chunks()
        from minhash_ray.util import binary_flat_offsets

        flat_u8, offs = binary_flat_offsets(pc.fill_null(sl, b""))
        row_of = np.repeat(
            np.arange(len(sl), dtype=np.int64), np.diff(offs) // 8
        )
        flat_starts = (
            np.frombuffer(np.ascontiguousarray(flat_u8).tobytes(), dtype=np.int64)
            if len(row_of)
            else np.empty(0, dtype=np.int64)
        )
        flat_toks, counts, _ = tokenize_with_strings(batch.column("text"), cfg.seed)
        text_s, n_rem = _scrub_from_hits(flat_toks, counts, w, row_of, flat_starts)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text_scrubbed": text_s,
                "n_removed": pa.array(n_rem, pa.int64()),
            }
        )

    return joined.map_batches(scrub_joined, batch_format="pyarrow")


def bloom_decontaminate(
    sf_dir: str,
    w: int | None = None,
    bench_mod: int = 43,
    m_bits: int = 1 << 23,
    k_probes: int = 7,
    cfg: PipelineConfig = DOC_CFG,
):
    """Constant-space test-set decontamination: :func:`decontaminate`
    with the benchmark gram set held in a Bloom filter instead of an
    exact sorted array.  Same output schema (doc_id, n_hits,
    contaminated); ``n_hits``/``contaminated`` are UPPER bounds (false
    positives possible at the configured m/k, false negatives never —
    the safe direction for contamination screening: nothing contaminated
    slips through; pytest bounds the FP envelope).

    Why it exists next to the exact op: the broadcast side is
    ``m_bits/8`` bytes REGARDLESS of benchmark size — a 10^10-gram eval
    battery needs 80+ GB exact but ~1.5 GB at 1% FP — and the build is
    the reference's mergeable-sketch algebra applied to membership
    (OR-fold insert/merge: commutative, associative, idempotent,
    order-independent — src/utils/utils.c:3-46 semantics; per-batch
    partial filters fold to the identical array as a serial build, the
    FCDS contract src/fcds/minhash-fcds.c:149-184, pytest-proven).
    """
    import ray

    from minhash_ray.functions.bloom import bloom_empty, bloom_insert, bloom_query
    from minhash_ray.functions.shingles import token_shingles

    w = cfg.shingle_w if w is None else w
    docs = _docs(sf_dir, ["doc_id", "text"])

    def bench_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        mask = (ids % bench_mod) == 0
        texts = batch.column("text").filter(pa.array(mask))
        sh, _ = token_shingles(texts, w, cfg.seed)
        filt = bloom_insert(bloom_empty(m_bits), sh, k_probes)
        return pa.table({"filt": pa.array([filt.tobytes()], pa.large_binary())})

    # per-batch partial filters OR-fold on the driver: constant-size
    # merge (m_bits/8 bytes per partial), the sketch analog of
    # decontaminate's exact gram-set union
    filt = bloom_empty(m_bits)
    for b in docs.map_batches(bench_partial, batch_format="pyarrow").iter_batches(
        batch_size=64, batch_format="pyarrow"
    ):
        for blob in b.column("filt"):
            filt |= np.frombuffer(blob.as_py(), dtype=np.uint64)
    filt_ref = ray.put(filt)

    def probe(batch: pa.Table) -> pa.Table:
        f = ray.get(filt_ref)              # plasma-cached per worker
        sh, cnt = token_shingles(batch.column("text"), w, cfg.seed)
        row = np.repeat(np.arange(len(batch), dtype=np.int64), cnt)
        n_hits = np.zeros(len(batch), dtype=np.int64)
        if len(sh):
            hit = bloom_query(f, sh, k_probes)
            rs, gs = row[hit], sh[hit]
            if len(rs):
                o = np.lexsort((gs, rs))
                rs, gs = rs[o], gs[o]
                first = np.ones(len(rs), dtype=bool)
                first[1:] = (rs[1:] != rs[:-1]) | (gs[1:] != gs[:-1])
                n_hits = np.bincount(rs[first], minlength=len(batch)).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_hits": pa.array(n_hits, pa.int64()),
                "contaminated": pa.array(n_hits > 0, pa.bool_()),
            }
        )

    return docs.map_batches(probe, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Exact term-frequency cosine similarity self-join
# ---------------------------------------------------------------------------


def _doc_tf_sets(sf_dir: str, cfg: PipelineConfig = DOC_CFG, docs=None):
    """documents → {doc_id, shingles (sorted distinct token hashes,
    list<u64>), tfs (aligned term frequencies, list<u64>), n, na2} — the
    weighted-vector analog of :func:`_doc_shingle_sets`.  ``na2 = Σ tf²``
    is the doc's squared L2 norm, exact int64."""
    from minhash_ray.functions.shingles import tokenize_batch

    ds = docs if docs is not None else _docs(sf_dir, ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        hashes, counts = tokenize_batch(batch.column("text"), cfg.seed)
        row = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        if len(hashes):
            o = np.lexsort((hashes, row))
            rs, hs = row[o], hashes[o]
            first = np.ones(len(hs), dtype=bool)
            first[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
            starts = np.flatnonzero(first)
            tf = np.diff(np.concatenate((starts, [len(hs)]))).astype(np.int64)
            uniq_h, uniq_row = hs[first], rs[first]
            n_per_row = np.bincount(uniq_row, minlength=len(counts)).astype(np.int64)
            na2 = np.zeros(len(counts), dtype=np.int64)
            np.add.at(na2, uniq_row, tf * tf)
            if na2.max(initial=0) >= (1 << 31):
                raise ValueError(
                    "tf_cosine_pairs: per-doc squared norm exceeds 2^31 "
                    "(doc too long for the exact int64 gate bounds)"
                )
        else:
            uniq_h = hashes
            tf = np.empty(0, dtype=np.int64)
            n_per_row = np.zeros(len(counts), dtype=np.int64)
            na2 = np.zeros(len(counts), dtype=np.int64)
        offs = pa.array(
            np.concatenate(([0], np.cumsum(n_per_row))).astype(np.int32), pa.int32()
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "shingles": pa.ListArray.from_arrays(
                    offs, pa.array(uniq_h, pa.uint64())
                ),
                "tfs": pa.ListArray.from_arrays(
                    offs, pa.array(tf.view(np.uint64), pa.uint64())
                ),
                "n": pa.array(n_per_row, pa.int64()),
                "na2": pa.array(na2, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _pair_dots(fa, ta, oa, fb, tb, ob) -> np.ndarray:
    """Exact per-pair dot products Σ tf_a·tf_b over shared terms: side a
    holds per-pair sorted-unique term segments (``fa`` flat u64 terms,
    ``ta`` flat tf, ``oa`` offsets), side b likewise.  One lexsort +
    adjacent-match pass — terms are unique per side, so a shared term is
    exactly one adjacent (pair, term) run of the two sides."""
    n = len(oa) - 1
    pid = np.concatenate(
        [np.repeat(np.arange(n, dtype=np.int64), np.diff(oa)),
         np.repeat(np.arange(n, dtype=np.int64), np.diff(ob))]
    )
    terms = np.concatenate([fa, fb])
    tfs = np.concatenate([ta, tb]).astype(np.int64)
    if not len(pid):
        return np.zeros(n, dtype=np.int64)
    o = np.lexsort((terms, pid))
    p, t_, v = pid[o], terms[o], tfs[o]
    match = (p[1:] == p[:-1]) & (t_[1:] == t_[:-1])
    dots = np.zeros(n, dtype=np.int64)
    np.add.at(dots, p[1:][match], v[1:][match] * v[:-1][match])
    return dots


def _cos_gate(dot, na2, nb2, num: int, den: int) -> np.ndarray:
    """cos >= num/den decided EXACTLY: dot²·den² >= num²·na2·nb2 with
    integer semantics.  The vectorized float64 compare decides everything
    far from the boundary (relative error < 1e-12 ≪ the 1e-9 margin);
    rows inside the margin — exact threshold ties like cos == 1 — are
    re-decided in arbitrary-precision Python ints (boundary-only, O(ties))."""
    t2n, t2d = num * num, den * den
    lhs = dot.astype(np.float64) ** 2 * t2d
    rhs = float(t2n) * na2.astype(np.float64) * nb2.astype(np.float64)
    keep = (dot > 0) & (lhs >= rhs)
    margin = (dot > 0) & (
        np.abs(lhs - rhs) <= 1e-9 * np.maximum(np.maximum(lhs, rhs), 1.0)
    )
    for i in np.flatnonzero(margin):
        keep[i] = int(dot[i]) ** 2 * t2d >= t2n * int(na2[i]) * int(nb2[i])
    return keep


_TF_PACK_TASK = None


def _tf_pack_task():
    """Off-driver pack build for the tf-cosine verify: sorted-id
    (terms, tfs, na2) pack from materialized tf-set blocks."""
    global _TF_PACK_TASK
    if _TF_PACK_TASK is None:
        import ray

        @ray.remote
        def tf_pack(*blocks: pa.Table):
            from minhash_ray.functions.minhash import _seg_arange
            from minhash_ray.stages.verify import _list_flat_offsets

            tables = [b for b in blocks if b.num_rows] or [blocks[0]]
            t = pa.concat_tables(tables)
            ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            flat, offs = _list_flat_offsets(t.column("shingles"))
            tfv, _ = _list_flat_offsets(t.column("tfs"))
            na2 = t.column("na2").to_numpy(zero_copy_only=False).astype(np.int64)
            o = np.argsort(ids, kind="stable")
            counts = np.diff(offs)[o]
            sel = np.repeat(offs[:-1][o], counts) + _seg_arange(counts)
            return {
                "ids": ids[o],
                "flat": flat[sel],
                "tfs": tfv[sel].view(np.int64),
                "offs": np.concatenate(([0], np.cumsum(counts))).astype(np.int64),
                "na2": na2[o],
            }

        _TF_PACK_TASK = tf_pack
    return _TF_PACK_TASK


def tf_cosine_pairs(
    sf_dir: str,
    threshold: float = 0.9,
    num_partitions: int = 32,
    docs=None,
    broadcast_max_rows: int | None = None,
    force_sparse: bool = False,
):
    """EXACT term-frequency cosine similarity self-join (the cosine
    AllPairs of Bayardo et al. 2007, the measure their paper was built
    for): unordered pairs (a < b) with ``cos(tf_a, tf_b) >= threshold``
    over raw token-frequency vectors.  Output (doc_id_a, doc_id_b, dot,
    na2, nb2) is ALL-INTEGER — the gate is the exact cross-product
    ``dot²·den² >= num²·na2·nb2`` with threshold = num/den taken from the
    decimal literal (Fraction), so the DuckDB oracle hash-matches
    end-to-end with no float column (``cos = dot/√(na2·nb2)`` is one
    derived expression away).  Bounds: values stay exact while
    ``na2 < 2^31`` per doc (~46k-token docs) — asserted, not assumed.

    Scale shape mirrors the Jaccard machinery: a df pass
    (:func:`_df_table`); the dense small-vocab switch (blocked f64
    incidence matmul — exact below 2^53 — when the element space
    collapses, where prefix filtering degenerates); otherwise Bayardo
    cosine prefix filtering — features in the shared rare-first global
    order (:func:`_df_order_ref`), per-feature max normalized weight
    (hot-capped fold, missing features conservatively bound by 1.0),
    a doc emits its ordered feature j only while the suffix bound
    ``Σ_{i>=j} w_i·maxw_i`` can still reach t (the earliest shared
    feature of any qualifying pair lies in BOTH prefixes — one
    prefix×prefix join on the feature key is exact); verify reads
    (terms, tfs) from a task-built plasma pack under
    ``broadcast_verify_max_rows`` and from two packed-column partitioned
    joins above it (forced-path pytest), computing exact integer dots
    via one lexsort adjacent-match pass."""
    from fractions import Fraction

    import ray
    from minhash_ray.functions.minhash import _seg_arange
    from minhash_ray.stages.verify import (
        _list_flat_offsets,
        _pack_u64_column,
        _unpack_u64_column,
    )
    from minhash_ray.util import (
        cached_get,
        clamp_partitions,
        fold_by_int_keys,
        strip_empty_blocks,
    )

    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    frac = Fraction(str(threshold))
    num, den = frac.numerator, frac.denominator
    t_f = num / den

    np_parts = clamp_partitions(num_partitions)
    sets_ds = _doc_tf_sets(sf_dir, docs=docs).materialize()
    n_docs = sets_ds.count()

    df_agg = _df_table(sets_ds)
    n_distinct = df_agg.count()
    if (
        not force_sparse
        and n_distinct <= _DENSE_VOCAB_MAX
        and n_docs * n_distinct <= (_DENSE_CELLS_MAX >> 1)   # f64: same byte cap
    ):
        return _dense_tf_cosine(sets_ds, df_agg, num, den)

    hot_ref = _df_order_ref(sets_ds, n_docs, df_agg=df_agg)

    # --- per-feature max normalized weight (hot features only; anything
    # outside the hot cap is bounded by maxw <= 1.0, weaker pruning but
    # exact). Partial max per batch -> feature-hash fold -> one small
    # gather (<= the hot cap by construction) -> ray.put ---
    def mw_partial(batch: pa.Table) -> pa.Table:
        hot = cached_get(hot_ref[0])
        flat, offs = _list_flat_offsets(batch.column("shingles"))
        tfv, _ = _list_flat_offsets(batch.column("tfs"))
        na2 = batch.column("na2").to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        norm = np.sqrt(np.repeat(na2, counts).astype(np.float64))
        w = np.divide(
            tfv.view(np.int64).astype(np.float64),
            norm,
            out=np.zeros(len(flat)),
            where=norm > 0,
        )
        if len(hot["e"]) and len(flat):
            pos = np.minimum(np.searchsorted(hot["e"], flat), len(hot["e"]) - 1)
            m = hot["e"][pos] == flat
        else:
            m = np.zeros(len(flat), dtype=bool)
        e, wv = flat[m], w[m]
        if len(e):
            o = np.argsort(e, kind="stable")
            e, wv = e[o], wv[o]
            first = np.ones(len(e), dtype=bool)
            first[1:] = e[1:] != e[:-1]
            mx = np.maximum.reduceat(wv, np.flatnonzero(first))
            e = e[first]
        else:
            mx = wv
        return pa.table(
            {"e": pa.array(e.view(np.int64), pa.int64()),
             "mw": pa.array(mx, pa.float64())}
        )

    def mw_final(t: pa.Table) -> pa.Table:
        agg = t.group_by("e").aggregate([("mw", "max")])
        return pa.table({"e": agg.column("e"), "mw": agg.column("mw_max")})

    mw_tbl = pa.concat_tables(
        list(
            fold_by_int_keys(sets_ds, ["e"], mw_partial, mw_final, num_partitions)
            .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
        or [pa.table({"e": pa.array([], pa.int64()), "mw": pa.array([], pa.float64())})]
    )
    me = np.ascontiguousarray(
        mw_tbl.column("e").to_numpy(zero_copy_only=False).astype(np.int64)
    ).view(np.uint64)
    mv = np.asarray(mw_tbl.column("mw").to_numpy(), dtype=np.float64)
    o_me = np.argsort(me)
    mw_ref = [ray.put({"e": me[o_me], "mw": mv[o_me]})]

    def prefix_rows(batch: pa.Table) -> pa.Table:
        hot = cached_get(hot_ref[0])
        mw = cached_get(mw_ref[0])
        flat, offs = _list_flat_offsets(batch.column("shingles"))
        tfv, _ = _list_flat_offsets(batch.column("tfs"))
        na2 = batch.column("na2").to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        perm = _df_order_perm(flat, offs, counts, hot)
        f_o, t_o = flat[perm], tfv[perm].view(np.int64)
        norm = np.sqrt(np.repeat(na2, counts).astype(np.float64))
        w = np.divide(
            t_o.astype(np.float64), norm, out=np.zeros(len(f_o)), where=norm > 0
        )
        if len(mw["e"]) and len(f_o):
            pos = np.minimum(np.searchsorted(mw["e"], f_o), len(mw["e"]) - 1)
            is_mw = mw["e"][pos] == f_o
            mwv = np.where(is_mw, mw["mw"][pos], 1.0)
        else:
            mwv = np.ones(len(f_o))
        contrib = w * np.minimum(mwv, 1.0)
        # segmented suffix sums: row_total - (inclusive cumsum - self)
        cs = np.cumsum(contrib)
        row_ends = np.cumsum(counts)
        # prepend-0 indexing keeps zero-length rows exact (te[r] = cumsum
        # through row r's end; empty row -> te[r] == te[r-1] -> total 0)
        te = np.concatenate(([0.0], cs))[row_ends]
        totals = te - np.concatenate(([0.0], te[:-1]))
        cum_before = cs - contrib - np.repeat(
            np.concatenate(([0.0], te[:-1])), counts
        )
        suffix = np.repeat(totals, counts) - cum_before
        emit = suffix >= t_f - 1e-9
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    (f_o[emit] >> np.uint64(1)).astype(np.int64), pa.int64()
                ),
                "doc_id": pa.array(np.repeat(ids, counts)[emit], pa.int64()),
            }
        )

    prefixes = sets_ds.map_batches(prefix_rows, batch_format="pyarrow")

    def as_side(suffix: str):
        def rn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "bucket": batch.column("bucket"),
                    f"doc_id_{suffix}": batch.column("doc_id"),
                }
            )

        return prefixes.map_batches(rn, batch_format="pyarrow")

    joined = as_side("a").join(
        as_side("b"), join_type="inner", on=("bucket",), num_partitions=np_parts
    )

    def slim_pairs(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_id_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_id_b").to_numpy(zero_copy_only=False)
        keep = a < b
        pairs = np.stack([a[keep], b[keep]], axis=1)
        if len(pairs):
            pairs = np.unique(pairs, axis=0)
        return pa.table(
            {
                "doc_id_a": pa.array(pairs[:, 0], pa.int64()),
                "doc_id_b": pa.array(pairs[:, 1], pa.int64()),
            }
        )

    cand = strip_empty_blocks(
        strip_empty_blocks(joined.map_batches(slim_pairs, batch_format="pyarrow"))
        .groupby(["doc_id_a", "doc_id_b"])
        .count()
        .select_columns(["doc_id_a", "doc_id_b"])
    )

    limit = (
        DOC_CFG.broadcast_verify_max_rows
        if broadcast_max_rows is None
        else broadcast_max_rows
    )

    def emit(a, b, dot, na2, nb2, keep) -> pa.Table:
        sel = np.flatnonzero(keep)
        return pa.table(
            {
                "doc_id_a": pa.array(np.asarray(a)[sel], pa.int64()),
                "doc_id_b": pa.array(np.asarray(b)[sel], pa.int64()),
                "dot": pa.array(dot[sel], pa.int64()),
                "na2": pa.array(np.asarray(na2)[sel], pa.int64()),
                "nb2": pa.array(np.asarray(nb2)[sel], pa.int64()),
            }
        )

    if n_docs <= limit:
        pack_ref = [_tf_pack_task().remote(*sets_ds.to_arrow_refs())]

        def verify_bcast(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return emit(
                    np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0, np.int64), np.zeros(0, bool),
                )
            pack = cached_get(pack_ref[0])
            a = batch.column("doc_id_a").to_numpy()
            b = batch.column("doc_id_b").to_numpy()
            ra = np.searchsorted(pack["ids"], a)
            rb = np.searchsorted(pack["ids"], b)
            offs_p = pack["offs"]
            ca, cb = offs_p[ra + 1] - offs_p[ra], offs_p[rb + 1] - offs_p[rb]
            sel_a = np.repeat(offs_p[ra], ca) + _seg_arange(ca)
            sel_b = np.repeat(offs_p[rb], cb) + _seg_arange(cb)
            dot = _pair_dots(
                pack["flat"][sel_a], pack["tfs"][sel_a],
                np.concatenate(([0], np.cumsum(ca))),
                pack["flat"][sel_b], pack["tfs"][sel_b],
                np.concatenate(([0], np.cumsum(cb))),
            )
            na2, nb2 = pack["na2"][ra], pack["na2"][rb]
            return emit(a, b, dot, na2, nb2, _cos_gate(dot, na2, nb2, num, den))

        return cand.map_batches(verify_bcast, batch_format="pyarrow", batch_size=8192)

    def side(suffix: str):
        def pack(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    f"sh_{suffix}": _pack_u64_column(batch.column("shingles")),
                    f"tf_{suffix}": _pack_u64_column(batch.column("tfs")),
                    f"n2_{suffix}": batch.column("na2"),
                }
            )

        return sets_ds.map_batches(pack, batch_format="pyarrow")

    with_a = cand.join(
        side("a"), join_type="inner", on=("doc_id_a",), right_on=("doc_id",),
        num_partitions=np_parts,
    )
    with_ab = strip_empty_blocks(with_a).join(
        side("b"), join_type="inner", on=("doc_id_b",), right_on=("doc_id",),
        num_partitions=np_parts,
    )

    def verify_join(batch: pa.Table) -> pa.Table:
        fa, oa = _unpack_u64_column(batch.column("sh_a"))
        fb, ob = _unpack_u64_column(batch.column("sh_b"))
        ta, _ = _unpack_u64_column(batch.column("tf_a"))
        tb, _ = _unpack_u64_column(batch.column("tf_b"))
        dot = _pair_dots(fa, ta.view(np.int64), oa, fb, tb.view(np.int64), ob)
        a = batch.column("doc_id_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_id_b").to_numpy(zero_copy_only=False)
        na2 = batch.column("n2_a").to_numpy(zero_copy_only=False).astype(np.int64)
        nb2 = batch.column("n2_b").to_numpy(zero_copy_only=False).astype(np.int64)
        return emit(a, b, dot, na2, nb2, _cos_gate(dot, na2, nb2, num, den))

    return with_ab.map_batches(verify_join, batch_format="pyarrow")


def _dense_tf_cosine(sets_ds, df_agg, num: int, den: int) -> pa.Table:
    """Exact tf-cosine by blocked dense matmul (the tf analog of
    :func:`_dense_set_jaccard`): docs × vocab tf matrix in float64 —
    every dot < 2^53 stays exact — gate via :func:`_cos_gate`."""
    import ray

    from minhash_ray.stages.verify import _list_flat_offsets

    et = pa.concat_tables(
        list(df_agg.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    )
    elems = np.sort(
        np.ascontiguousarray(
            et.column("e").to_numpy(zero_copy_only=False).astype(np.int64)
        ).view(np.uint64)
    )

    st = pa.concat_tables(
        list(sets_ds.iter_batches(batch_size=1 << 16, batch_format="pyarrow"))
    )
    ids = np.asarray(st.column("doc_id").to_numpy(), dtype=np.int64)
    col = st.column("shingles")
    flat, offs = _list_flat_offsets(
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    )
    tcol = st.column("tfs")
    tfv, _ = _list_flat_offsets(
        tcol.combine_chunks() if isinstance(tcol, pa.ChunkedArray) else tcol
    )
    na2_in = np.asarray(st.column("na2").to_numpy(), dtype=np.int64)
    order = np.argsort(ids)
    n, V = len(ids), len(elems)
    M = np.zeros((n, V), dtype=np.float64)
    counts = np.diff(offs)
    row_of = np.empty(n, dtype=np.int64)
    row_of[order] = np.arange(n)
    rows = np.repeat(row_of, counts)
    M[rows, np.searchsorted(elems, flat)] = tfv.view(np.int64).astype(np.float64)
    ids_sorted = ids[order]
    na2 = np.empty(n, dtype=np.int64)
    na2[row_of] = na2_in
    pack_ref = ray.put((ids_sorted, M, na2))

    @ray.remote
    def block(lo: int, hi: int, pack):
        ids_s, M_, n2 = pack
        dots = np.rint(M_[lo:hi] @ M_.T).astype(np.int64)
        keep = _cos_gate(
            dots.ravel(),
            np.repeat(n2[lo:hi], len(ids_s)),
            np.tile(n2, hi - lo),
            num, den,
        ).reshape(hi - lo, len(ids_s))
        gi = np.arange(lo, hi)[:, None]
        keep &= np.arange(len(ids_s))[None, :] > gi
        r, c = np.nonzero(keep)
        return pa.table(
            {
                "doc_id_a": pa.array(ids_s[lo + r], pa.int64()),
                "doc_id_b": pa.array(ids_s[c], pa.int64()),
                "dot": pa.array(dots[r, c], pa.int64()),
                "na2": pa.array(n2[lo + r], pa.int64()),
                "nb2": pa.array(n2[c], pa.int64()),
            }
        )

    chunk = max(256, min(4096, -(-n // max(1, 4 * 8))))
    outs = ray.get(
        [block.remote(lo, min(lo + chunk, n), pack_ref) for lo in range(0, n, chunk)]
    )
    nonempty = [o for o in outs if o.num_rows]
    if not nonempty:
        return pa.table(
            {
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
                "dot": pa.array([], pa.int64()),
                "na2": pa.array([], pa.int64()),
                "nb2": pa.array([], pa.int64()),
            }
        )
    t = pa.concat_tables(nonempty)
    o = np.lexsort((t.column("doc_id_b").to_numpy(), t.column("doc_id_a").to_numpy()))
    return t.take(pa.array(o))


_POS_BITS = 20                       # gram start within doc: < 2^20 tokens/doc
_POS_MASK = (1 << _POS_BITS) - 1


def repeated_ngram_dedup(
    sf_dir: str,
    w: int | None = None,
    num_partitions: int = 8,
    broadcast_max_rows: int = 2_000_000,
    cfg: PipelineConfig = DOC_CFG,
    docs=None,
):
    """Keep-FIRST repeated n-gram dedup (the exact-substring-dedup
    semantics of Lee et al. 2021 "Deduplicating Training Data Makes
    Language Models Better", at token w-gram granularity): every w-gram
    occurring MORE THAN ONCE in the corpus — across documents or within
    one — survives only at its globally-first occurrence (minimum
    (doc_id, start)); every other occurrence's token span is deleted and
    docs are reassembled.  Contrast :func:`repeated_ngram_scrub`, which
    removes ALL occurrences past a df threshold (boilerplate semantics).
    Output: (doc_id, text_dedup, n_removed).

    Scale shape: the df pass of the scrub becomes a (count, argmin)
    pass — per-batch partials carry each gram's occurrence count and its
    minimum PACKED (doc_id << pos_bits | start) key (one int64; bounds
    doc_id < 2^43, start < 2^20 tokens — asserted), folded through a
    gram-hash partition.  Grams with count >= 2 broadcast as a sorted
    (gram, winner) pack under ``broadcast_max_rows``; above it the
    winner table rides the same join-attach route as the scrub
    (forced-path pytest).  The scrub pass marks every occurrence whose
    packed key differs from the winner and reuses the interval-stab
    coverage + reassembly core (:func:`_scrub_from_hits`).
    """
    import pyarrow.compute as pc

    import ray
    from minhash_ray.functions.hashing import combine_wgrams
    from minhash_ray.functions.shingles import (
        _segmented_arange,
        token_shingles,
        tokenize_with_strings,
    )
    from minhash_ray.util import clamp_partitions, fold_by_int_keys, strip_empty_blocks

    w = cfg.shingle_w if w is None else int(w)
    np_parts = clamp_partitions(num_partitions)
    ds = docs if docs is not None else _docs(sf_dir, ["doc_id", "text"])

    def _packed(ids: np.ndarray, starts: np.ndarray) -> np.ndarray:
        if len(ids) and (
            int(ids.max()) >= (1 << (63 - _POS_BITS)) or int(starts.max(initial=0)) > _POS_MASK
        ):
            raise ValueError(
                f"repeated_ngram_dedup: need doc_id < 2^{63 - _POS_BITS} "
                f"and gram start < 2^{_POS_BITS}"
            )
        return (ids << _POS_BITS) | starts

    def cnt_partial(batch: pa.Table) -> pa.Table:
        sh, s_cnt = token_shingles(batch.column("text"), w, cfg.seed)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        pack = _packed(np.repeat(ids, s_cnt), _segmented_arange(s_cnt))
        if len(sh):
            o = np.argsort(sh, kind="stable")
            gs, ps = sh[o], pack[o]
            first = np.ones(len(gs), dtype=bool)
            first[1:] = gs[1:] != gs[:-1]
            starts = np.flatnonzero(first)
            cnt = np.diff(np.concatenate((starts, [len(gs)]))).astype(np.int64)
            wmin = np.minimum.reduceat(ps, starts)
            gs = gs[first]
        else:
            gs, cnt, wmin = sh, np.empty(0, np.int64), np.empty(0, np.int64)
        return pa.table(
            {
                "g": pa.array(gs.view(np.int64), pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
                "wmin": pa.array(wmin, pa.int64()),
            }
        )

    def cnt_final(t: pa.Table) -> pa.Table:
        agg = t.group_by(["g"]).aggregate([("cnt", "sum"), ("wmin", "min")])
        keep = pc.greater_equal(agg.column("cnt_sum"), 2)
        return pa.table(
            {
                "g": agg.column("g").filter(keep),
                "winner": agg.column("wmin_min").filter(keep),
            }
        )

    hot = strip_empty_blocks(
        fold_by_int_keys(ds, ["g"], cnt_partial, cnt_final, num_partitions)
    )
    n_hot = hot.count()

    def _finish(batch: pa.Table, hit_rows, hit_starts) -> pa.Table:
        flat_toks, counts, _ = tokenize_with_strings(batch.column("text"), cfg.seed)
        text_s, n_rem = _scrub_from_hits(flat_toks, counts, w, hit_rows, hit_starts)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text_dedup": text_s,
                "n_removed": pa.array(n_rem, pa.int64()),
            }
        )

    if n_hot <= broadcast_max_rows:
        parts = [
            (
                b.column("g").to_numpy().view(np.uint64),
                b.column("winner").to_numpy(zero_copy_only=False).astype(np.int64),
            )
            for b in hot.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        ]
        if parts:
            ag = np.concatenate([p[0] for p in parts])
            aw = np.concatenate([p[1] for p in parts])
            o = np.argsort(ag)
            hot_pack = {"g": ag[o], "winner": aw[o]}
        else:
            hot_pack = {"g": np.empty(0, np.uint64), "winner": np.empty(0, np.int64)}
        hot_ref = ray.put(hot_pack)

        def dedup(batch: pa.Table) -> pa.Table:
            hp = ray.get(hot_ref)
            flat_toks, counts, tok_hashes = tokenize_with_strings(
                batch.column("text"), cfg.seed
            )
            s_cnt = np.maximum(counts - (w - 1), 0).astype(np.int64)
            tok_starts = np.cumsum(counts) - counts
            gram_local = _segmented_arange(s_cnt)
            sh = combine_wgrams(tok_hashes, np.repeat(tok_starts, s_cnt) + gram_local, w)
            gram_row = np.repeat(np.arange(len(s_cnt), dtype=np.int64), s_cnt)
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            pack = _packed(ids[gram_row], gram_local)
            if len(sh) and len(hp["g"]):
                pos = np.minimum(np.searchsorted(hp["g"], sh), len(hp["g"]) - 1)
                hit = (hp["g"][pos] == sh) & (hp["winner"][pos] != pack)
            else:
                hit = np.zeros(len(sh), dtype=bool)
            text_s, n_rem = _scrub_from_hits(
                flat_toks, counts, w, gram_row[hit], gram_local[hit]
            )
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "text_dedup": text_s,
                    "n_removed": pa.array(n_rem, pa.int64()),
                }
            )

        return ds.map_batches(dedup, batch_format="pyarrow")

    # join-attach path (the scrub's route): explode occurrences, join the
    # winner table on g, keep non-winner occurrences, fold covered starts
    # per doc, one left-outer join back onto the docs
    def explode_grams(batch: pa.Table) -> pa.Table:
        sh, s_cnt = token_shingles(batch.column("text"), w, cfg.seed)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        s_local = _segmented_arange(s_cnt)
        rep_ids = np.repeat(ids, s_cnt)
        return pa.table(
            {
                "doc_id": pa.array(rep_ids, pa.int64()),
                "s": pa.array(s_local, pa.int64()),
                "pack": pa.array(_packed(rep_ids, s_local), pa.int64()),
                "g": pa.array(sh.view(np.int64), pa.int64()),
            }
        )

    joined = ds.map_batches(explode_grams, batch_format="pyarrow").join(
        hot, join_type="inner", on=("g",), num_partitions=np_parts
    )

    def losers(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch.column("pack"), batch.column("winner"))
        t = batch.filter(keep)
        return pa.table({"doc_id": t.column("doc_id"), "s": t.column("s")})

    cov_pairs = joined.map_batches(losers, batch_format="pyarrow")

    def cov_partial(batch: pa.Table) -> pa.Table:
        return batch

    def cov_final(t: pa.Table) -> pa.Table:
        agg = t.group_by(["doc_id"]).aggregate([("s", "list")])
        sl = agg.column("s_list")
        if isinstance(sl, pa.ChunkedArray):
            sl = sl.combine_chunks()
        flat = sl.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offs = sl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        pack = pa.Array.from_buffers(
            pa.large_binary(),
            len(sl),
            [None, pa.py_buffer((offs * 8).tobytes()), pa.py_buffer(flat.tobytes())],
        )
        return pa.table({"doc_id": agg.column("doc_id"), "s_pack": pack})

    starts_ds = strip_empty_blocks(
        fold_by_int_keys(cov_pairs, ["doc_id"], cov_partial, cov_final, num_partitions)
    )
    out = ds.join(
        starts_ds, join_type="left_outer", on=("doc_id",), num_partitions=np_parts
    )

    def dedup_joined(batch: pa.Table) -> pa.Table:
        sl = batch.column("s_pack")
        if isinstance(sl, pa.ChunkedArray):
            sl = sl.combine_chunks()
        from minhash_ray.util import binary_flat_offsets

        flat_u8, offs = binary_flat_offsets(pc.fill_null(sl, b""))
        row_of = np.repeat(np.arange(len(sl), dtype=np.int64), np.diff(offs) // 8)
        flat_starts = (
            np.frombuffer(np.ascontiguousarray(flat_u8).tobytes(), dtype=np.int64)
            if len(row_of)
            else np.empty(0, dtype=np.int64)
        )
        return _finish(batch, row_of, flat_starts)

    return out.map_batches(dedup_joined, batch_format="pyarrow")


def dup_graph_triangles(
    sf_dir: str,
    cfg: PipelineConfig = DOC_CFG,
    num_partitions: int = 8,
    docs=None,
):
    """(doc_id, n_triangles): per-node triangle counts over the verified
    near-dup graph — the clustering-coefficient numerator that separates
    tight template families (cliques) from chain-shaped drift when a
    curation run audits its dup clusters.

    Scale shape (Suri & Vassilvitskii 2011 MR triangle counting with the
    compact-forward degree orientation): every edge is directed from its
    (degree, id)-smaller endpoint, so wedge generation at a node is
    bounded by its OUT-degree — hubs receive edges, never fan out, and
    Σ d_out² stays near-linear on skewed graphs.  Wedges (two
    out-neighbors of one source, emitted per source-hash partition) join
    the directed edge set on the (v, w) two-column key; each match is one
    triangle counted exactly once (at its orientation-smallest vertex),
    and the three endpoint increments fold through a node-hash partition.
    The pair table is metadata-scale by construction (the LSH gate), so
    the driver-side degree orientation follows the same convention as
    every other dup-graph query; the wedge/join/fold stages are
    distributed."""
    import ray.data as rd

    from minhash_ray.functions.shingles import _segmented_arange
    from minhash_ray.util import clamp_partitions, fold_by_int_keys, strip_empty_blocks

    out_schema = pa.schema([("doc_id", pa.int64()), ("n_triangles", pa.int64())])
    pairs = minhash_dup_pairs(sf_dir, cfg, num_partitions, docs=docs)
    if pairs.num_rows == 0:
        return pa.table({"doc_id": [], "n_triangles": []}, schema=out_schema)
    np_parts = clamp_partitions(num_partitions)

    a = pairs.column("doc_id_a").to_numpy(zero_copy_only=False).astype(np.int64)
    b = pairs.column("doc_id_b").to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    deg = np.bincount(inv, minlength=len(nodes)).astype(np.int64)
    da_, db_ = deg[inv[: len(a)]], deg[inv[len(a):]]
    # orient u -> v along the strict total order (degree, id)
    swap = (db_ < da_) | ((db_ == da_) & (b < a))
    u = np.where(swap, b, a)
    v = np.where(swap, a, b)
    vd = np.where(swap, da_, db_)          # target degree: wedge sort key
    edges = pa.table(
        {
            "u": pa.array(u, pa.int64()),
            "v": pa.array(v, pa.int64()),
            "vdeg": pa.array(vd, pa.int64()),
        }
    )

    def wedges(batch: pa.Table) -> pa.Table:
        # one source-hash partition holds ALL of its sources' out-edges
        su = batch.column("u").to_numpy(zero_copy_only=False)
        sv = batch.column("v").to_numpy(zero_copy_only=False)
        sd = batch.column("vdeg").to_numpy(zero_copy_only=False)
        o = np.lexsort((sv, sd, su))       # per-source neighbors in (deg, id) order
        su, sv, sd = su[o], sv[o], sd[o]
        n = len(su)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = su[1:] != su[:-1]
        seg_id = np.cumsum(new) - 1
        sizes = np.bincount(seg_id).astype(np.int64)
        local = _segmented_arange(sizes)
        # element at local position l pairs as FIRST with the following
        # (size - 1 - l) out-neighbors of the same source
        n_follow = sizes[seg_id] - 1 - local
        first = np.repeat(np.arange(n, dtype=np.int64), n_follow)
        second = first + _segmented_arange(n_follow) + 1
        return pa.table(
            {
                "src": pa.array(su[first], pa.int64()),
                "p": pa.array(sv[first], pa.int64()),
                "q": pa.array(sv[second], pa.int64()),
            }
        )

    def edge_pkey(batch: pa.Table) -> pa.Table:
        return batch

    wedge_ds = fold_by_int_keys(
        rd.from_arrow(edges), ["u"], edge_pkey, wedges, num_partitions
    )
    key_ds = rd.from_arrow(edges.select(["u", "v"]).rename_columns(["p", "q"]))
    tri = strip_empty_blocks(wedge_ds).join(
        strip_empty_blocks(key_ds),
        join_type="inner",
        on=("p", "q"),
        num_partitions=np_parts,
    )

    def endpoint_partial(batch: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [
                batch.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
                for c in ("src", "p", "q")
            ]
        )
        ug, c = np.unique(ids, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(ug, pa.int64()),
                "n_triangles": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def endpoint_final(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        agg = t.group_by(["doc_id"]).aggregate([("n_triangles", "sum")])
        return pa.table(
            {
                "doc_id": agg.column("doc_id"),
                "n_triangles": pc.cast(agg.column("n_triangles_sum"), pa.int64()),
            }
        )

    counts = strip_empty_blocks(
        fold_by_int_keys(tri, ["doc_id"], endpoint_partial, endpoint_final,
                         num_partitions)
    )
    node_ds = rd.from_arrow(pa.table({"doc_id": pa.array(nodes, pa.int64())}))
    joined = node_ds.join(
        counts, join_type="left_outer", on=("doc_id",), num_partitions=np_parts
    )

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "n_triangles": pc.cast(
                    pc.fill_null(batch.column("n_triangles"), 0), pa.int64()
                ),
            }
        )

    return joined.map_batches(project, batch_format="pyarrow")


def dup_graph_pagerank(
    sf_dir: str,
    cfg: PipelineConfig = DOC_CFG,
    iterations: int = 3,
    num_partitions: int = 8,
    docs=None,
):
    """(doc_id, pr_fx): PageRank over the verified near-dup graph — the
    canonical-representative ranking signal (a high-rank node is the hub
    of a template/boilerplate family; pair it with keep-best to pick the
    most-connected copy).  ``iterations`` synchronous power-iteration
    rounds with damping 0.85, computed entirely in FIXED-POINT int64
    (scale 10^9): pr0(v) = S, pr_{t+1}(v) = (15·S)//100 +
    (85 · Σ_{u~v} pr_t(u)//deg(u)) // 100.  Every operation is integer
    floor arithmetic, so the result is bit-exact and the DuckDB oracle
    replays the identical chain through ``iterations`` chained CTEs —
    the repo's oracle-checked ITERATIVE algorithm (k-means is rows-only
    float).  Isolated docs never enter (every graph node has deg ≥ 1,
    so there are no dangling nodes and the inner joins are total).

    Scale shape: one symmetric edge table (2·|pairs| rows, metadata-scale
    by LSH construction but ∝ corpus) with deg(src) attached ONCE
    upfront (static across rounds); per iteration ONE partitioned
    ``Dataset.join`` attaches pr to edge sources and contributions fold
    per destination through the key-hash partition (``fold_by_int_keys``
    — node count is corpus-width, Ray never sees nodes as groups).
    State between rounds is (doc_id, pr) — 16 B/node.
    int64 headroom: 85·Σpr < 2^63 holds to ~10^8 graph nodes at scale
    10^9; drop SCALE one decade per decade of nodes beyond that."""
    import pyarrow.compute as pc

    import ray.data as rd

    from minhash_ray.util import clamp_partitions, fold_by_int_keys, strip_empty_blocks

    SCALE = 1_000_000_000
    TELEPORT = (15 * SCALE) // 100
    np_parts = clamp_partitions(num_partitions)

    pairs = minhash_dup_pairs(sf_dir, cfg, num_partitions, docs=docs)
    if pairs.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "pr_fx": pa.array([], pa.int64())}
        )
    a = pairs.column("doc_id_a").combine_chunks()
    b = pairs.column("doc_id_b").combine_chunks()
    edges = rd.from_arrow(
        pa.table({"src": pa.concat_arrays([a, b]), "dst": pa.concat_arrays([b, a])})
    )

    def deg_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("src").aggregate([([], "count_all")])
        return pa.table(
            {
                "doc_id": g.column("src"),
                "c": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    def deg_final(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("c", "sum")])
        d = pc.cast(g.column("c_sum"), pa.int64())
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "d": d,
                "pr": pa.array(np.full(g.num_rows, SCALE, dtype=np.int64), pa.int64()),
            }
        )

    state = fold_by_int_keys(
        edges, ["doc_id"], deg_partial, deg_final, np_parts
    ).materialize()

    # deg(src) is STATIC across rounds: attach it to the edge table ONCE
    # (one upfront join) so each iteration is a single join + one fold —
    # not a second degree re-attach per round
    edges_d = (
        strip_empty_blocks(edges)
        .join(
            state.select_columns(["doc_id", "d"]),
            join_type="inner",
            on=("src",),
            right_on=("doc_id",),
            num_partitions=np_parts,
        )
        .materialize()
    )

    def slim_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "d": pc.cast(batch.column("d"), pa.int64()),
            }
        )

    edges_d = edges_d.map_batches(slim_edges, batch_format="pyarrow").materialize()
    pr = state.select_columns(["doc_id", "pr"]).materialize()

    def sum_partial(batch: pa.Table) -> pa.Table:
        p = batch.column("pr").to_numpy()
        d = batch.column("d").to_numpy()
        t = pa.table(
            {
                "doc_id": batch.column("dst"),
                "c": pa.array(p // d, pa.int64()),
            }
        )
        g = t.group_by("doc_id").aggregate([("c", "sum")])
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "c": pc.cast(g.column("c_sum"), pa.int64()),
            }
        )

    def sum_final(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("c", "sum")])
        s = pc.cast(g.column("c_sum"), pa.int64()).to_numpy()
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "pr": pa.array(TELEPORT + (85 * s) // 100, pa.int64()),
            }
        )

    for _ in range(iterations):
        with_pr = strip_empty_blocks(edges_d).join(
            pr,
            join_type="inner",
            on=("src",),
            right_on=("doc_id",),
            num_partitions=np_parts,
        )
        pr = fold_by_int_keys(
            strip_empty_blocks(with_pr), ["doc_id"], sum_partial, sum_final, np_parts
        ).materialize()

    def out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("doc_id"), "pr_fx": batch.column("pr")}
        )

    return pr.map_batches(out, batch_format="pyarrow")

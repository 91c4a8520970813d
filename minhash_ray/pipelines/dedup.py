"""The flagship pipeline: clips table → canonical cluster assignments.

Stage graph (SURVEY.md §3.4) — every arrow is streaming, every stage an
Arrow batch transform; checkpoints are optional and per-stage:

    read clips ──V validate/project──S signatures (fused task pool)
        S ──B banding flat-map──G salted bucket self-join──pairs
        pairs ──P verify (broadcast | shuffle join)──edges
        edges ∪ exact-channel edges ──C components──assignments

The audio payload is dropped at stage V; the shuffles only ever move
~(16 + 8k)-byte rows.  All stage semantics trace to the reference sketch
algebra (see the per-module docstrings).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from minhash_ray.config import PipelineConfig
from minhash_ray.sources.clips import read_clips, validate_clips_schema
from minhash_ray.stages.candidates import candidate_pairs
from minhash_ray.stages.cluster import assign_clusters
from minhash_ray.stages.verify import exact_edges, verify_pairs
from minhash_ray.state.checkpoint import CheckpointManager


@dataclass
class DedupResult:
    validated: object          # Dataset: clip_id, transcript, content_hash, audio_fp, ...
    signatures: object         # Dataset: clip_id, signature, simhash, audio_fp, n_shingles
    edges: object              # Dataset: clip_id_a, clip_id_b, sim, ..., channel
    assignments: object        # Dataset: clip_id, cluster_id


def run_dedup(
    clips,
    cfg: PipelineConfig | None = None,
    ckpt_root: str | None = None,
    resume: bool = True,
    num_partitions: int = 32,
    stage_times: dict | None = None,
) -> DedupResult:
    """Run the full near-dup pipeline.

    ``clips``: a Dataset or a path readable by ``read_clips``.
    ``ckpt_root``: when set, stages V/S/E/C publish checkpoints there and a
    resumed run reuses any stage whose manifest is complete for this config.
    ``stage_times``: when a dict is passed, per-stage wall times (sec) are
    recorded into it at the pipeline's materialization barriers (signatures
    / candidates / verify / cluster) — the engine analogue of the
    reference's per-phase timing printouts (test/fcds/
    test_fcds_prob_ops.c:275-282); the clustering stage is then executed
    eagerly so its time is observable.
    """
    import time as _time

    import ray.data as rd

    _t0 = _time.perf_counter()

    def _mark(name):
        nonlocal _t0
        if stage_times is not None:
            now = _time.perf_counter()
            stage_times[name] = round(now - _t0, 3)
            _t0 = now

    cfg = cfg or PipelineConfig()
    if isinstance(clips, str):
        clips = read_clips(clips)
    schema = clips.schema()
    base = getattr(schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        validate_clips_schema(base)
    else:
        validate_clips_schema(pa.schema(list(zip(schema.names, schema.types))))

    ckpt = CheckpointManager(ckpt_root, cfg) if ckpt_root else None
    if ckpt:
        ckpt.clear_stale_temps()

    # --- stage V+S fused: validate / fingerprint / sketch in one pass over
    # the payload column (task pool fused with the read by default, actor
    # pool on opt-in — see stages/signature.py); the audio payload is
    # dropped at this boundary ---
    from minhash_ray.stages.signature import ValidateSignatureStage

    if ckpt and resume and ckpt.is_complete("signatures"):
        signatures = ckpt.load("signatures")
    else:
        if cfg.signature_concurrency:
            # explicit actor-pool opt-in (the template for stages whose
            # state is too heavy to rebuild per worker — a model, an index)
            signatures = clips.map_batches(
                ValidateSignatureStage,
                fn_constructor_kwargs={"cfg": cfg},
                batch_format="pyarrow",
                batch_size=cfg.batch_size or None,
                concurrency=cfg.signature_concurrency,
            )
        else:
            # default: task-pool form — Ray Data fuses it with the read,
            # so payload blocks never cross the object store and no CPUs
            # sit pinned in an idle actor pool while the scan catches up
            # (a 14-actor pool at 16 CPUs left 2 CPUs for ALL read tasks:
            # 129 s for the 10.9 GB / 100k-clip corpus vs ~25 s fused).
            # Worker processes cache the stage state across tasks
            # (stages/signature.py:make_signature_fn).
            from minhash_ray.stages.signature import make_signature_fn

            signatures = clips.map_batches(
                make_signature_fn(cfg),
                batch_format="pyarrow",
                batch_size=cfg.batch_size or None,
            )
        if ckpt:
            from minhash_ray.stages.signature import full_signatures_schema

            signatures = ckpt.save(
                "signatures", signatures, input_stage="input",
                schema=full_signatures_schema(cfg.num_perm, cfg.audio_num_perm),
            )
        else:
            signatures = signatures.materialize()   # consumed 3× (bands, count, verify)
            # coalesce: the read+signature stage wants many small tasks
            # (cache-resident payload batches), but every downstream stage
            # pays per-block overhead — 391 slim signature blocks tripled
            # candidates/verify/cluster time vs ~100.  A split/merge
            # repartition of the slim signature table (~KB/row, payload
            # already dropped) is one cheap pass that restores coarse
            # blocks for the three band maps, the count and the verify.
            import os as _os

            from minhash_ray.util import cluster_cpus

            nb = signatures.num_blocks()
            nb_target = max(8, 2 * cluster_cpus())
            if _os.environ.get("GRAFT_SIG_COALESCE", "1") != "0" and nb > 2 * nb_target:
                _tc = _time.perf_counter()
                signatures = signatures.repartition(nb_target).materialize()
                if stage_times is not None:
                    stage_times["sig_coalesce"] = round(_time.perf_counter() - _tc, 3)
    _mark("signatures")
    validated = signatures                          # superset of the stage-V contract

    # --- stages B+G+P: banding → salted bucket shuffle → verify ---
    if ckpt and resume and ckpt.is_complete("edges"):
        edges = ckpt.load("edges")
        n_clips = None
    else:
        # all enabled channels (minhash bands + simhash d+1 pigeonhole
        # chunks + audio OPH bands) fused into ONE flat-map: the unioned
        # three-pipeline form scanned every signature block three times.
        # n_clips (metadata on the materialized signatures) gates the
        # simhash booster by its saturation bound — see make_fused_band_fn
        from minhash_ray.stages.banding import make_fused_band_fn

        n_clips = signatures.count()
        band_rows = signatures.map_batches(
            make_fused_band_fn(cfg, n_rows=n_clips), batch_format="pyarrow"
        )

        # the pack build only needs the materialized signature blocks: launch
        # it as a Ray task BEFORE the candidates shuffle so it overlaps the
        # whole shuffle instead of adding driver-serial time after it
        pack_future = None
        if n_clips <= cfg.broadcast_verify_max_rows:
            from minhash_ray.stages.verify import build_broadcast_pack_async

            pack_future = build_broadcast_pack_async(signatures, cfg, with_content=True)

        # materialized: the slim pair table is tiny relative to the corpus,
        # and splitting the shuffle graph from the verify stage prevents
        # CPU-reservation deadlock on small clusters
        pairs = candidate_pairs(band_rows, cfg, num_partitions=num_partitions).materialize()
        _mark("candidates")

        if pack_future is not None:
            # one task pass built the broadcast pack AND the exact-dup
            # star edges — no separate exact stage, no driver-serial build
            import ray as _ray

            from minhash_ray.stages.verify import make_broadcast_verifier

            pack_ref, _exact_ref = pack_future
            _tp = _time.perf_counter()
            exact_tbl = _ray.get(_exact_ref)
            if stage_times is not None:
                # residual wait AFTER the candidates shuffle (0 when the
                # overlapped task finished first)
                stage_times["verify_pack"] = round(_time.perf_counter() - _tp, 3)
            # 8k-pair batches: the exact-jaccard lexsort is superlinear in
            # batch mass, and coarse 64k batches leave cores idle
            edges = pairs.map_batches(
                make_broadcast_verifier(pack_ref, cfg),
                batch_format="pyarrow",
                batch_size=8192,
            )
            if cfg.use_exact_channel and exact_tbl.num_rows:
                import ray.data as _rd

                edges = edges.union(_rd.from_arrow(exact_tbl))
        else:
            # 10^12 path: partitioned-join verification + distributed exact
            edges = verify_pairs(
                pairs, signatures, cfg,
                n_clips=n_clips, num_partitions=num_partitions,
            )
            if cfg.use_exact_channel:
                edges = edges.union(
                    exact_edges(
                        signatures,
                        num_partitions=max(2, num_partitions // 4),
                        driver_max_rows=cfg.driver_agg_max_rows,
                        n_rows=n_clips,
                    )
                )
        if ckpt:
            from minhash_ray.stages.verify import EDGES_SCHEMA

            edges = ckpt.save("edges", edges, input_stage="signatures", schema=EDGES_SCHEMA)
        else:
            edges = edges.materialize()     # consumed twice (count + components)
    _mark("verify")

    # --- stage C: connected components → canonical assignments ---
    if ckpt and resume and ckpt.is_complete("assignments"):
        assignments = ckpt.load("assignments")
    else:
        assignments = assign_clusters(
            signatures, edges, cfg, num_partitions=num_partitions
        )
        if ckpt:
            from minhash_ray.stages.cluster import ASSIGN_SCHEMA

            assignments = ckpt.save(
                "assignments", assignments, input_stage="edges", schema=ASSIGN_SCHEMA
            )
        elif stage_times is not None:
            assignments = assignments.materialize()
    _mark("cluster")

    return DedupResult(validated, signatures, edges, assignments)


def run_dedup_tiered(
    clips,
    cfg: PipelineConfig | None = None,
    num_partitions: int = 32,
    stage_times: dict | None = None,
    ckpt_root: str | None = None,
    resume: bool = True,
):
    """TIERED flagship (tier dedup × audio): exact tier → LSH tier over
    exact representatives → connected components, every clip routed
    through its exact rep to its cluster root.

    Produces the SAME final cluster partition as :func:`run_dedup` (exact
    duplicates share every signature bit, so their LSH buckets, verified
    pairs and hence components coincide — asserted in
    tests/test_round4_fixes.py), but the wide stages (banding shuffle,
    candidate self-join, verify) process ONE clip per byte-identical
    (transcript, payload) group: on a re-upload-heavy web-audio corpus
    (commonly 30-50% exact dups) the expensive stages shrink
    proportionally.  This is the audio instance of the production tier
    shape in ``dedup_text.doc_dedup_tiered`` (tier 1 = the reference's
    min-fold idempotence applied to whole rows: inserting a byte-identical
    clip twice cannot change any sketch, src/utils/utils.c:3-33).

    Scale shape: one fused read+signature payload pass (the payload never
    crosses the object store), a 16-byte content-digest groupby, ONE
    signature-width partitioned join (routing + rep filter share it), the
    LSH pipeline over survivors, and one slim routing join; nothing
    corpus-width touches the driver.

    Returns a Dataset ``(clip_id, cluster_id, keep, tier)`` — ``keep=1``
    iff the clip is its cluster's canonical representative (min clip_id,
    the same deterministic min-fold canonicalization as everywhere else);
    ``tier`` is ``'rep'`` for tier-2 survivors, ``'exact'`` for clips
    folded away in tier 1.

    With ``ckpt_root`` each tier publishes an atomic checkpoint
    (``signatures`` / ``tier1_reps`` / ``tier2_edges`` / ``tier3_assign``,
    the same ``CheckpointManager`` contract as the flagship and
    ``doc_dedup_tiered``); a rerun loads completed tiers instead of
    recomputing them and a finished run returns ``tier3_assign``
    immediately.  The ``signatures`` stage is content-identical to
    run_dedup's, so the two pipelines can share a checkpoint root.
    """
    import time as _time

    from minhash_ray.stages.signature import make_signature_fn
    from minhash_ray.util import clamp_partitions, strip_empty_blocks

    _t0 = _time.perf_counter()

    def _mark(name):
        nonlocal _t0
        if stage_times is not None:
            now = _time.perf_counter()
            stage_times[name] = round(now - _t0, 3)
            _t0 = now

    cfg = cfg or PipelineConfig()
    if isinstance(clips, str):
        clips = read_clips(clips)
    np_parts = clamp_partitions(num_partitions)

    ckpt = CheckpointManager(ckpt_root, cfg) if ckpt_root else None
    if ckpt:
        ckpt.clear_stale_temps()
        if resume and ckpt.is_complete("tier3_assign"):
            return ckpt.load("tier3_assign")

    if ckpt and resume and ckpt.is_complete("signatures"):
        signatures = ckpt.load("signatures").materialize()
    else:
        signatures = clips.map_batches(
            make_signature_fn(cfg), batch_format="pyarrow",
            batch_size=cfg.batch_size or None,
        )
        if ckpt:
            from minhash_ray.stages.signature import full_signatures_schema

            signatures = ckpt.save(
                "signatures", signatures, input_stage="input",
                schema=full_signatures_schema(cfg.num_perm, cfg.audio_num_perm),
            )
        else:
            signatures = signatures.materialize()
    _mark("signatures")

    # --- tier 1: exact groups on the content digest.  Two paths, forced-
    # path-tested identical (tests/test_round4_fixes.py):
    #
    # * FAST (≤ cfg.driver_agg_max_rows, no checkpointing): the tier is
    #   metadata-scale — ONE gather of (clip_id, 32-char digest) to the
    #   driver, a lexsort rep-find, and a broadcast sorted-key filter over
    #   the signature blocks.  Replaces two hash shuffles whose
    #   aggregator-actor spin-up dominates at bench scale (the same
    #   small/huge auto-switch as exact_edges and the cluster stage).
    # * DISTRIBUTED (beyond the cap, or whenever checkpoints are on): one
    #   groupby over the packed signature rows.  Within a content_hash
    #   group every column is byte-identical except clip_id (the rows ARE
    #   byte-identical clips), so Min() is simultaneously the rep selector
    #   (min clip_id) and an arbitrary-pick for every other column — the
    #   rep's full signature row falls out of the same shuffle that finds
    #   the rep, with no signature-side join (Acero rejects list payloads
    #   in joins anyway; the u64 vectors ride packed as large_binary, the
    #   verify_shuffle pattern, stages/verify.py:_pack_u64_column). ---
    n_rows = signatures.count()
    use_fast = ckpt is None and n_rows <= cfg.driver_agg_max_rows
    if use_fast:
        import ray as _ray
        import ray.data as _rd

        from minhash_ray.util import bytes_key_array

        slim_batches = list(
            signatures.select_columns(["clip_id", "content_hash"])
            .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
        slim = (
            pa.concat_tables(slim_batches)
            if slim_batches
            else pa.table(
                {
                    "clip_id": pa.array([], pa.string()),
                    "content_hash": pa.array([], pa.string()),
                }
            )
        )
        ids = slim.column("clip_id").combine_chunks()
        kid = bytes_key_array(ids)
        kh = bytes_key_array(slim.column("content_hash").combine_chunks())
        order = np.lexsort((kid, kh))
        kh_s = kh[order]
        new_run = np.ones(len(kh_s), dtype=bool)
        new_run[1:] = kh_s[1:] != kh_s[:-1]
        run_start = np.maximum.accumulate(
            np.where(new_run, np.arange(len(kh_s)), 0)
        )
        rep_row = np.empty(len(kid), dtype=np.int64)
        rep_row[order] = order[run_start]     # rep's original row, per row
        route = _rd.from_arrow(
            pa.table(
                {
                    "clip_id": ids,
                    "rep_id": ids.take(pa.array(rep_row, pa.int64())),
                }
            )
        )
        rep_ref = [_ray.put(np.unique(kid[order[run_start]]))]

        def rep_filter(batch: pa.Table) -> pa.Table:
            from minhash_ray.util import bytes_key_array as _bka
            from minhash_ray.util import cached_get

            keys_s = cached_get(rep_ref[0])
            if len(keys_s) == 0:
                return batch.slice(0, 0)
            ids_b = _bka(batch.column("clip_id"))
            pos = np.minimum(np.searchsorted(keys_s, ids_b), len(keys_s) - 1)
            return batch.filter(pa.array(keys_s[pos] == ids_b))

        reps_sigs = signatures.map_batches(
            rep_filter, batch_format="pyarrow"
        ).materialize()
        _mark("exact_tier")
        return _tiered_lsh_and_route(
            cfg, None, resume, num_partitions, _mark, stage_times,
            reps_sigs, route, None, use_fast=True,
        )

    from minhash_ray.stages.verify import _pack_u64_column, _unpack_u64_column

    def pack(batch: pa.Table) -> pa.Table:
        def u64_as_i64(name):
            col = batch.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pa.array(
                np.ascontiguousarray(col.to_numpy(zero_copy_only=False)).view(np.int64),
                pa.int64(),
            )

        return pa.table(
            {
                "content_hash": batch.column("content_hash"),
                "clip_id": batch.column("clip_id"),
                "transcript": batch.column("transcript"),
                "sig_pk": _pack_u64_column(batch.column("signature")),
                "audio_sig_pk": _pack_u64_column(batch.column("audio_sig")),
                "shingles_pk": _pack_u64_column(batch.column("shingles")),
                "simhash_i": u64_as_i64("simhash"),
                "audio_fp_i": u64_as_i64("audio_fp"),
                "n_shingles": batch.column("n_shingles"),
            }
        )

    # the packed projection over every clip is required for tier-3 routing
    # even on resume (every clip gets an output row); it is map-only
    packed = signatures.map_batches(pack, batch_format="pyarrow").materialize()
    # every hash-shuffle partition spins an aggregator actor (~seconds of
    # startup — stages/candidates.py learned this the hard way): size the
    # tier shuffles by data volume, not by the requested ceiling
    tier_parts = max(2, min(np_parts, (n_rows // 200_000) + 1))
    if ckpt and resume and ckpt.is_complete("tier1_reps"):
        reps_packed = ckpt.load("tier1_reps").materialize()
    else:
        # distinct content hashes are corpus-width: fold per-batch Arrow
        # min partials through a digest-hash partition (Ray's aggregate
        # iterates groups at Python speed — never hand it the digests)
        from minhash_ray.util import fold_by_str_key

        t1_cols = [
            ("clip_id", "rep_id"),
            ("transcript", "transcript"),
            ("sig_pk", "sig_pk"),
            ("audio_sig_pk", "audio_sig_pk"),
            ("shingles_pk", "shingles_pk"),
            ("simhash_i", "simhash_i"),
            ("audio_fp_i", "audio_fp_i"),
            ("n_shingles", "n_shingles"),
        ]

        def t1_partial(batch: pa.Table) -> pa.Table:
            agg = batch.group_by("content_hash").aggregate(
                [(src, "min") for src, _dst in t1_cols]
            )
            return pa.table(
                {
                    "content_hash": agg.column("content_hash"),
                    **{dst: agg.column(f"{src}_min") for src, dst in t1_cols},
                }
            )

        def t1_final(t: pa.Table) -> pa.Table:
            agg = t.group_by("content_hash").aggregate(
                [(dst, "min") for _src, dst in t1_cols]
            )
            return pa.table(
                {
                    "content_hash": agg.column("content_hash"),
                    **{dst: agg.column(f"{dst}_min") for _src, dst in t1_cols},
                }
            )

        reps_packed = fold_by_str_key(
            packed, "content_hash", t1_partial, t1_final, tier_parts
        )
        if ckpt:
            reps_packed = ckpt.save(
                "tier1_reps", reps_packed, input_stage="signatures",
                schema=pa.schema(
                    [
                        ("content_hash", pa.string()),
                        ("rep_id", pa.string()),
                        ("transcript", pa.string()),
                        ("sig_pk", pa.large_binary()),
                        ("audio_sig_pk", pa.large_binary()),
                        ("shingles_pk", pa.large_binary()),
                        ("simhash_i", pa.int64()),
                        ("audio_fp_i", pa.int64()),
                        ("n_shingles", pa.int64()),
                    ]
                ),
            ).materialize()
        else:
            reps_packed = reps_packed.materialize()

    # member → rep routing: slim (clip_id, content_hash) ⋈ (content_hash,
    # rep_id) — 16-byte-ish rows both sides.  strip_empty_blocks is the
    # mandatory barrier before route feeds the tier-3 join (util.py doc).
    route = strip_empty_blocks(
        packed.select_columns(["clip_id", "content_hash"]).join(
            reps_packed.select_columns(["content_hash", "rep_id"]),
            join_type="inner", on=("content_hash",), num_partitions=tier_parts,
        )
    ).select_columns(["clip_id", "rep_id"])

    def unpack(batch: pa.Table) -> pa.Table:
        def fixed(name, k):
            flat, _ = _unpack_u64_column(batch.column(name))
            return pa.FixedSizeListArray.from_arrays(pa.array(flat, pa.uint64()), k)

        def i64_as_u64(name):
            col = batch.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pa.array(
                np.ascontiguousarray(col.to_numpy(zero_copy_only=False)).view(np.uint64),
                pa.uint64(),
            )

        sh_flat, sh_offs = _unpack_u64_column(batch.column("shingles_pk"))
        return pa.table(
            {
                "clip_id": batch.column("rep_id"),
                "transcript": batch.column("transcript"),
                "signature": fixed("sig_pk", cfg.num_perm),
                "simhash": i64_as_u64("simhash_i"),
                "audio_fp": i64_as_u64("audio_fp_i"),
                "audio_sig": fixed("audio_sig_pk", cfg.audio_num_perm),
                "content_hash": batch.column("content_hash"),
                "n_shingles": batch.column("n_shingles"),
                "shingles": pa.ListArray.from_arrays(
                    pa.array(sh_offs, pa.int32()), pa.array(sh_flat, pa.uint64())
                ),
            }
        )

    reps_sigs = reps_packed.map_batches(unpack, batch_format="pyarrow").materialize()
    _mark("exact_tier")
    return _tiered_lsh_and_route(
        cfg, ckpt, resume, num_partitions, _mark, stage_times,
        reps_sigs, route, tier_parts, use_fast=False,
    )


def _tiered_lsh_and_route(
    cfg, ckpt, resume, num_partitions, _mark, stage_times,
    reps_sigs, route, tier_parts, use_fast: bool,
):
    """Tiers 2+3 of :func:`run_dedup_tiered`, shared by its fast
    (driver-scale exact tier) and distributed paths.

    Tier 2 is the LSH pipeline over survivors only (no exact channel —
    byte-identity was tier 1).  Tier 3 computes components over rep edges
    and routes members through their rep: component roots are min over
    reps = min over ALL members (each rep is already its group's min), so
    cluster_id is globally canonical.  On the fast path the rep →
    cluster map is metadata-scale and rides a broadcast sorted-key probe
    (the cluster stage's pattern); the distributed path uses a
    partitioned join.
    """
    import pyarrow.compute as pc

    from minhash_ray.util import strip_empty_blocks

    from minhash_ray.stages.banding import make_fused_band_fn

    if ckpt and resume and ckpt.is_complete("tier2_edges"):
        edges = ckpt.load("tier2_edges").materialize()
        _mark("candidates")
        _mark("verify")
    else:
        n_reps = reps_sigs.count()
        band_rows = reps_sigs.map_batches(
            make_fused_band_fn(cfg, n_rows=n_reps), batch_format="pyarrow"
        )
        pairs = candidate_pairs(band_rows, cfg, num_partitions=num_partitions).materialize()
        _mark("candidates")
        edges = verify_pairs(
            pairs, reps_sigs, cfg, n_clips=n_reps, num_partitions=num_partitions
        )
        if ckpt:
            from minhash_ray.stages.verify import EDGES_SCHEMA

            edges = ckpt.save(
                "tier2_edges", edges, input_stage="tier1_reps", schema=EDGES_SCHEMA
            ).materialize()
        else:
            edges = edges.materialize()
        _mark("verify")

    assign = assign_clusters(reps_sigs, edges, cfg, num_partitions=num_partitions)

    if use_fast:
        import ray as _ray

        from minhash_ray.util import bytes_key_array

        abatches = list(
            assign.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
        atbl = (
            pa.concat_tables(abatches)
            if abatches
            else pa.table(
                {
                    "clip_id": pa.array([], pa.string()),
                    "cluster_id": pa.array([], pa.string()),
                }
            )
        )
        akeys = bytes_key_array(atbl.column("clip_id").combine_chunks())
        aorder = np.argsort(akeys)
        amap_ref = [
            _ray.put(
                {
                    "keys": akeys[aorder],
                    "cluster": atbl.column("cluster_id")
                    .combine_chunks()
                    .take(pa.array(aorder, pa.int64())),
                }
            )
        ]

        def finalize_fast(batch: pa.Table) -> pa.Table:
            from minhash_ray.util import bytes_key_array as _bka
            from minhash_ray.util import cached_get

            pack = cached_get(amap_ref[0])
            rk = _bka(batch.column("rep_id"))
            # every rep_id is present in the assignment map by construction
            pos = np.searchsorted(pack["keys"], rk)
            cluster = pack["cluster"].take(pa.array(pos, pa.int64()))
            cid = batch.column("clip_id")
            keep = pc.cast(pc.equal(cid, cluster), pa.int64())
            tier = pc.if_else(
                pc.equal(cid, batch.column("rep_id")),
                pa.scalar("rep", pa.string()), pa.scalar("exact", pa.string()),
            )
            return pa.table(
                {"clip_id": cid, "cluster_id": cluster, "keep": keep, "tier": tier}
            )

        out = route.map_batches(finalize_fast, batch_format="pyarrow")
        if stage_times is not None:
            out = out.materialize()
        _mark("cluster")
        return out

    routed = route.join(
        strip_empty_blocks(assign).map_batches(
            lambda b: pa.table(
                {"rep_id": b.column("clip_id"), "cluster_id": b.column("cluster_id")}
            ),
            batch_format="pyarrow",
        ),
        join_type="inner", on=("rep_id",), num_partitions=tier_parts,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        cid = batch.column("clip_id")
        cluster = batch.column("cluster_id")
        keep = pc.cast(pc.equal(cid, cluster), pa.int64())
        tier = pc.if_else(
            pc.equal(cid, batch.column("rep_id")),
            pa.scalar("rep", pa.string()), pa.scalar("exact", pa.string()),
        )
        return pa.table(
            {"clip_id": cid, "cluster_id": cluster, "keep": keep, "tier": tier}
        )

    out = routed.map_batches(finalize, batch_format="pyarrow")
    if ckpt:
        out = ckpt.save(
            "tier3_assign", out, input_stage="tier2_edges",
            schema=pa.schema(
                [
                    ("clip_id", pa.string()),
                    ("cluster_id", pa.string()),
                    ("keep", pa.int64()),
                    ("tier", pa.string()),
                ]
            ),
        )
    elif stage_times is not None:
        out = out.materialize()
    _mark("cluster")
    return out


def append_clips(
    new_clips,
    cfg: PipelineConfig | None = None,
    ckpt_root: str | None = None,
    num_partitions: int = 32,
) -> DedupResult:
    """Incremental update mode: merge a NEW clips partition into an
    existing checkpointed corpus without re-sketching old clips — the
    reference's insert-while-query workload (infinite writers against
    live readers, test/fcds/test_fixed_queries_infinite_write.c:90-99)
    re-expressed over checkpoints: the published signature/edge tables
    are the "query sketch", the append is the next insert generation,
    and the merge is the same min-fold/edge-union algebra
    (src/utils/utils.c:36-46).

    Scale shape: only the new partition runs the heavy decode+sketch
    stage; old signatures are extended by atomic part-file appends (never
    rewritten); banding re-reads only slim signature columns; the pair
    shuffle is restricted to buckets the new partition touches; old-old
    edges come verbatim from the edges checkpoint.  Verified-edge union
    plus min-id clustering make the result equal to a single-shot run
    (the LSH candidate set for untouched old-old buckets is unchanged).

    Preconditions: a complete signatures+edges checkpoint under
    ``ckpt_root`` for this config, and new clip_ids disjoint from old.
    """
    import ray

    import ray.data as rd

    from minhash_ray.stages.signature import ValidateSignatureStage, full_signatures_schema
    from minhash_ray.stages.verify import EDGES_SCHEMA
    from minhash_ray.util import bytes_key_array

    cfg = cfg or PipelineConfig()
    if not ckpt_root:
        raise ValueError("append mode requires a checkpoint root")
    ckpt = CheckpointManager(ckpt_root, cfg)
    ckpt.clear_stale_temps()
    for stage in ("signatures", "edges"):
        if not ckpt.is_complete(stage):
            raise ValueError(f"append mode needs a complete {stage!r} checkpoint")

    if isinstance(new_clips, str):
        new_clips = read_clips(new_clips)

    # --- sketch ONLY the new partition (same task-pool/actor-pool split
    # as run_dedup's stage S) ---
    if cfg.signature_concurrency:
        new_sigs = new_clips.map_batches(
            ValidateSignatureStage,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=cfg.batch_size or None,
            concurrency=cfg.signature_concurrency,
        ).materialize()
    else:
        from minhash_ray.stages.signature import make_signature_fn

        new_sigs = new_clips.map_batches(
            make_signature_fn(cfg),
            batch_format="pyarrow",
            batch_size=cfg.batch_size or None,
        ).materialize()

    # new-side metadata (the new partition is the small side by design)
    new_ids: list[str] = []
    for b in new_sigs.select_columns(["clip_id"]).iter_batches(
        batch_size=1_048_576, batch_format="pyarrow"
    ):
        new_ids.extend(b.column("clip_id").to_pylist())
    new_ids_sorted = np.sort(bytes_key_array(new_ids))
    new_ids_ref = [ray.put(new_ids_sorted)]

    # validate the disjointness precondition BEFORE mutating the checkpoint:
    # re-appending an already-ingested partition would silently write
    # duplicate signature rows and edges into persistent state.  Cost: one
    # slim clip_id column scan of the old checkpoint.
    if len(new_ids_sorted):
        for b in ckpt.load("signatures").select_columns(["clip_id"]).iter_batches(
            batch_size=1_048_576, batch_format="pyarrow"
        ):
            old = bytes_key_array(b.column("clip_id"))
            pos = np.minimum(np.searchsorted(new_ids_sorted, old), len(new_ids_sorted) - 1)
            hit = new_ids_sorted[pos] == old
            if hit.any():
                dup = old[hit][0].decode()
                raise ValueError(
                    f"append_clips: clip_id {dup!r} already exists in the "
                    f"checkpoint ({int(hit.sum())} overlapping in this batch); "
                    "new clip_ids must be disjoint from the ingested corpus"
                )

    # publish: extend the signatures checkpoint by part-file append
    signatures = ckpt.append_parts(
        "signatures", new_sigs,
        schema=full_signatures_schema(cfg.num_perm, cfg.audio_num_perm),
        extra={"last_append_rows": len(new_ids)},
    )

    # --- banding over the merged table, restricted to buckets the new
    # partition touches (old-only buckets cannot yield new pairs) ---
    from minhash_ray.stages.banding import make_fused_band_fn

    # one banding config for BOTH the touched-bucket discovery over the new
    # partition and the merged-table pass — the simhash saturation gate
    # keys off the MERGED corpus size so bucket namespaces stay consistent
    n_merged = signatures.count()

    def band_rows_of(ds):
        return ds.map_batches(
            make_fused_band_fn(cfg, n_rows=n_merged), batch_format="pyarrow"
        )

    new_buckets: list[np.ndarray] = []
    for b in band_rows_of(new_sigs).select_columns(["bucket"]).iter_batches(
        batch_size=1_048_576, batch_format="pyarrow"
    ):
        new_buckets.append(np.unique(b.column("bucket").to_numpy()))
    touched = (
        np.unique(np.concatenate(new_buckets)) if new_buckets
        else np.empty(0, dtype=np.int64)
    )
    touched_ref = [ray.put(touched)]

    def keep_touched(batch: pa.Table) -> pa.Table:
        from minhash_ray.util import cached_get

        tb = cached_get(touched_ref[0])
        buckets = batch.column("bucket").to_numpy()
        if len(tb) == 0:
            return batch.slice(0, 0)
        pos = np.minimum(np.searchsorted(tb, buckets), len(tb) - 1)
        return batch.filter(pa.array(tb[pos] == buckets))

    from minhash_ray.stages.candidates import candidate_pairs

    band_rows = band_rows_of(signatures).map_batches(keep_touched, batch_format="pyarrow")
    pairs = candidate_pairs(band_rows, cfg, num_partitions=num_partitions)

    def keep_new_pairs(batch: pa.Table) -> pa.Table:
        from minhash_ray.util import cached_get

        ids = cached_get(new_ids_ref[0])
        if len(ids) == 0:
            return batch.slice(0, 0)

        def member(col):
            v = bytes_key_array(batch.column(col))
            pos = np.minimum(np.searchsorted(ids, v), len(ids) - 1)
            return ids[pos] == v

        return batch.filter(pa.array(member("clip_id_a") | member("clip_id_b")))

    # old-old pairs were adjudicated by the previous run; verify only
    # pairs that involve a new clip
    pairs = pairs.map_batches(keep_new_pairs, batch_format="pyarrow").materialize()

    n_total = signatures.count()
    new_edges = verify_pairs(
        pairs, signatures, cfg, n_clips=n_total, num_partitions=num_partitions
    )
    if cfg.use_exact_channel:
        exact_new = exact_edges(
            signatures,
            num_partitions=max(2, num_partitions // 4),
            driver_max_rows=cfg.driver_agg_max_rows,
            n_rows=n_total,
        ).map_batches(keep_new_pairs, batch_format="pyarrow")
        new_edges = new_edges.union(exact_new)

    edges = ckpt.append_parts("edges", new_edges, schema=EDGES_SCHEMA)

    # --- recluster over the union (cheap: edges are metadata-scale) ---
    assignments = assign_clusters(signatures, edges, cfg, num_partitions=num_partitions)
    from minhash_ray.stages.cluster import ASSIGN_SCHEMA

    assignments = ckpt.save(
        "assignments", assignments, input_stage="edges", schema=ASSIGN_SCHEMA
    )
    return DedupResult(signatures, signatures, edges, assignments)


def dedup_metrics(
    assignments,
    truth_path: str,
    cfg: PipelineConfig | None = None,
    clips_path: str | None = None,
    precision_sample: int = 20000,
    edges=None,
) -> dict:
    """Recall vs planted ground truth + precision vs *true* similarity.

    Recall: a truth pair counts as recovered iff both clips land in the
    same cluster (pair recall through transitivity — matching how a dedup
    consumer uses the output).  Gate (BASELINE.md): recall >= 0.99 over
    truth pairs with jaccard_w >= tau.

    Precision: predicted same-cluster pairs are validated against the TRUE
    shingle-set Jaccard of their transcripts (sampled up to
    ``precision_sample`` pairs), not merely the planted list — transcripts
    derived from a shared text corpus can be genuinely near-duplicate
    without having been planted.  ``precision_strict`` uses j >= tau;
    ``precision_loose`` uses j >= tau - verify_margin (the configured edge
    acceptance band).  When ``clips_path`` is None, precision falls back to
    planted-truth membership.
    """
    import pyarrow.parquet as pq

    cfg = cfg or PipelineConfig()
    truth = pq.read_table(truth_path)
    cluster_of: dict[str, str] = {}
    for batch in assignments.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for cid, cl in zip(
            batch.column("clip_id").to_pylist(), batch.column("cluster_id").to_pylist()
        ):
            cluster_of[cid] = cl

    gated = recovered = 0
    all_pairs = all_recovered = 0
    for a, b, j in zip(
        truth.column("clip_id_a").to_pylist(),
        truth.column("clip_id_b").to_pylist(),
        truth.column("jaccard_w").to_pylist(),
    ):
        same = cluster_of.get(a) == cluster_of.get(b) and cluster_of.get(a) is not None
        all_pairs += 1
        all_recovered += same
        if j >= cfg.tau:
            gated += 1
            recovered += same

    # enumerate predicted same-cluster pairs (sampled)
    from collections import defaultdict

    members = defaultdict(list)
    for cid, cl in cluster_of.items():
        members[cl].append(cid)
    predicted_pairs: list[tuple[str, str]] = []
    for _, ids in members.items():
        if len(ids) < 2:
            continue
        ids.sort()
        for i in range(len(ids)):
            for k in range(i + 1, len(ids)):
                predicted_pairs.append((ids[i], ids[k]))
    n_predicted = len(predicted_pairs)
    if n_predicted > precision_sample:
        rng = np.random.default_rng(0)
        sel = rng.choice(n_predicted, size=precision_sample, replace=False)
        sampled = [predicted_pairs[int(i)] for i in sel]
    else:
        sampled = predicted_pairs

    out = {
        "truth_pairs_gated": gated,
        "recall_gated": (recovered / gated) if gated else 1.0,
        "truth_pairs_all": all_pairs,
        "recall_all": (all_recovered / all_pairs) if all_pairs else 1.0,
        "predicted_pairs": n_predicted,
    }

    if edges is not None:
        # edge-level precision: fraction of kept text-channel edges whose
        # exact jaccard clears tau (audio-channel keeps excluded) — ~1.0 by
        # construction under exact_verify
        tot = ok = 0
        for b in edges.iter_batches(batch_size=262144, batch_format="pyarrow"):
            j = b.column("jaccard").to_numpy()
            asim = b.column("audio_sim").to_numpy()
            text_kept = (j >= 0) & ~(asim >= cfg.audio_tau)
            tot += int(text_kept.sum())
            ok += int((j[text_kept] >= cfg.tau).sum())
        out["edge_precision"] = (ok / tot) if tot else 1.0

    if clips_path is not None and sampled:
        from minhash_ray.oracle import oracle_token_shingles

        clips = pq.read_table(clips_path, columns=["clip_id", "transcript"])
        text_of = dict(
            zip(clips.column("clip_id").to_pylist(), clips.column("transcript").to_pylist())
        )
        cache: dict[str, frozenset] = {}

        def sset(cid: str) -> frozenset:
            if cid not in cache:
                cache[cid] = frozenset(
                    oracle_token_shingles(text_of.get(cid, ""), cfg.shingle_w, cfg.seed)
                )
            return cache[cid]

        strict = loose = 0
        for a, b in sampled:
            sa, sb = sset(a), sset(b)
            union = sa | sb
            j = (len(sa & sb) / len(union)) if union else 1.0
            # exact-channel pairs (byte-identical) always count
            if j >= cfg.tau:
                strict += 1
            if j >= cfg.tau - cfg.verify_margin:
                loose += 1
        out["precision_strict"] = strict / len(sampled)
        out["precision_loose"] = loose / len(sampled)
        out["precision"] = out["precision_strict"]
    else:
        truth_set = set(
            zip(truth.column("clip_id_a").to_pylist(), truth.column("clip_id_b").to_pylist())
        )
        tp = sum(1 for p in sampled if p in truth_set)
        out["precision"] = (tp / len(sampled)) if sampled else 1.0
    return out


def assignments_diff(
    ckpt_root_a: str,
    ckpt_root_b: str,
    cfg: PipelineConfig,
    num_partitions: int = 8,
    include_same: bool = False,
):
    """(clip_id, cluster_id_a, cluster_id_b, status): per-clip cluster
    movement between two published ``assignments`` checkpoints — the
    audit a production dedup run ships after an append/recluster ("which
    clips changed family, which are new, which disappeared").  ``status``
    is ``moved`` / ``added`` (only in B) / ``removed`` (only in A) /
    ``same``; cluster ids are canonical min-member clip_ids
    (stages/cluster.ASSIGN_SCHEMA), so equality across runs is
    meaningful by construction.  By default ``same`` rows are filtered
    batch-side before anything shuffles downstream — the diff of a 10^12
    corpus is metadata-scale unless the config changed.

    Scale shape: ONE full-outer partitioned hash join on clip_id (both
    sides are slim 2-string-column checkpoint reads, ~40 B/row); the
    status is a vectorized null-mask case.  Raises if either checkpoint
    is not complete for this config."""
    import pyarrow.compute as pc

    from minhash_ray.state.checkpoint import CheckpointManager
    from minhash_ray.util import clamp_partitions, strip_empty_blocks

    np_parts = clamp_partitions(num_partitions)
    sides = []
    for root, suffix in ((ckpt_root_a, "a"), (ckpt_root_b, "b")):
        ckpt = CheckpointManager(root, cfg)
        if not ckpt.is_complete("assignments"):
            raise ValueError(
                f"no complete 'assignments' checkpoint for this config under {root}"
            )

        def rename(batch: pa.Table, s=suffix) -> pa.Table:
            return pa.table(
                {
                    "clip_id": batch.column("clip_id"),
                    f"cluster_id_{s}": batch.column("cluster_id"),
                }
            )

        sides.append(ckpt.load("assignments").map_batches(rename, batch_format="pyarrow"))

    joined = sides[0].join(
        sides[1],
        join_type="full_outer",
        on=("clip_id",),
        num_partitions=np_parts,
    )

    def status(batch: pa.Table) -> pa.Table:
        ca = batch.column("cluster_id_a")
        cb = batch.column("cluster_id_b")
        if isinstance(ca, pa.ChunkedArray):
            ca = ca.combine_chunks()
        if isinstance(cb, pa.ChunkedArray):
            cb = cb.combine_chunks()
        in_a = pc.is_valid(ca).to_numpy(zero_copy_only=False)
        in_b = pc.is_valid(cb).to_numpy(zero_copy_only=False)
        same = pc.equal(ca, cb).to_numpy(zero_copy_only=False)
        same = np.where(in_a & in_b, same, False)
        st = np.where(
            same, "same",
            np.where(in_a & in_b, "moved", np.where(in_b, "added", "removed")),
        )
        t = pa.table(
            {
                "clip_id": batch.column("clip_id"),
                "cluster_id_a": ca,
                "cluster_id_b": cb,
                "status": pa.array(st, pa.string()),
            }
        )
        if include_same:
            return t
        return t.filter(pa.array(st != "same"))

    return strip_empty_blocks(joined.map_batches(status, batch_format="pyarrow"))


def modality_agreement(edges, text_tau: float | None = None,
                       audio_tau: float | None = None,
                       cfg: PipelineConfig | None = None):
    """(clip_id_a, clip_id_b, text_dup, audio_dup, modality): per-edge
    modality classification over the flagship's verified edge table — the
    cross-modal disagreement report a multimodal curation run ships with
    (a pair whose transcript matches but whose audio doesn't is a
    re-record / re-dub; audio-only matches are re-transcriptions or
    caption drift; both-channel matches are true re-uploads).

    Text evidence: exact channel, or verified shingle Jaccard >= tau
    (falling back to the sketch estimator when the exact column wasn't
    computed, jaccard = -1).  Audio evidence: byte-OPH audio similarity
    >= tau.  Pure per-batch vectorized map over the edges — no shuffle;
    the edge table is already the post-verify, post-dedup pair set.

    Rows-only op (both channels are sketch-gated); the planted fixture's
    near_text / near_audio / near_both truth kinds pytest the
    classification."""
    import pyarrow.compute as pc

    cfg = cfg or PipelineConfig()
    t_tau = cfg.tau if text_tau is None else text_tau
    a_tau = cfg.audio_tau if audio_tau is None else audio_tau

    def fn(batch: pa.Table) -> pa.Table:
        ch = batch.column("channel").to_numpy(zero_copy_only=False)
        jac = batch.column("jaccard").to_numpy(zero_copy_only=False)
        sim = batch.column("sim").to_numpy(zero_copy_only=False)
        asim = batch.column("audio_sim").to_numpy(zero_copy_only=False)
        text_score = np.where(jac >= 0.0, jac, sim)
        text_dup = (ch == "exact") | (text_score >= t_tau)
        audio_dup = (ch == "exact") | (asim >= a_tau)
        modality = np.where(
            text_dup & audio_dup, "both",
            np.where(text_dup, "text_only",
                     np.where(audio_dup, "audio_only", "estimator_only")),
        )
        return pa.table(
            {
                "clip_id_a": batch.column("clip_id_a"),
                "clip_id_b": batch.column("clip_id_b"),
                "text_dup": pa.array(text_dup.astype(np.int64), pa.int64()),
                "audio_dup": pa.array(audio_dup.astype(np.int64), pa.int64()),
                "modality": pa.array(modality, pa.string()),
            }
        )

    return edges.map_batches(fn, batch_format="pyarrow")


def keep_best_assignments(assignments, clips, num_partitions: int = 8):
    """(clip_id, cluster_id, keep_first, keep_best): both canonical-rep
    policies over the flagship's cluster assignments — ``keep_first``
    (min clip_id, the deterministic rep the pipeline already emits) and
    ``keep_best`` (the cluster member with the LARGEST audio payload,
    tie-broken to min clip_id) — the production policy when a dup
    cluster mixes a full-bitrate original with truncated or re-encoded
    copies and the biggest payload is the one worth keeping (the clips
    analog of ``dedup_text.doc_dedup_keep_best``).

    Scale shape: payload SIZE (never the payload) joins the assignment
    table on a partitioned clip_id hash join; per-cluster winners reduce
    as per-batch vectorized partials (one lexsort + run-starts pass per
    batch) folded through a CLUSTER-hash partition (``fold_by_str_key``
    — cluster ids scale with the corpus, never Ray aggregate groups);
    one slim join routes each winner back to its members."""
    import pyarrow.compute as pc

    from minhash_ray.util import (
        bytes_key_array,
        clamp_partitions,
        fold_by_str_key,
        strip_empty_blocks,
    )

    np_parts = clamp_partitions(num_partitions)

    def sizes(batch: pa.Table) -> pa.Table:
        col = batch.column("bytes")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table(
            {
                "clip_id": batch.column("clip_id"),
                "n_bytes": pc.cast(pc.binary_length(col), pa.int64()),
            }
        )

    sized = strip_empty_blocks(assignments).join(
        clips.map_batches(sizes, batch_format="pyarrow"),
        join_type="inner", on=("clip_id",), num_partitions=np_parts,
    )

    def reduce_best(t: pa.Table) -> pa.Table:
        cid = bytes_key_array(t.column("cluster_id"))
        clip = bytes_key_array(t.column("clip_id"))
        nb = t.column("n_bytes").to_numpy(zero_copy_only=False)
        # first: min clip per cluster
        o1 = np.lexsort((clip, cid))
        starts1 = np.ones(len(o1), dtype=bool)
        starts1[1:] = cid[o1][1:] != cid[o1][:-1]
        f_idx = o1[starts1]
        # best: max bytes, tie min clip
        o2 = np.lexsort((clip, -nb, cid))
        starts2 = np.ones(len(o2), dtype=bool)
        starts2[1:] = cid[o2][1:] != cid[o2][:-1]
        b_idx = o2[starts2]
        return pa.table(
            {
                "cluster_id": t.column("cluster_id").take(pa.array(f_idx)),
                "first_clip": t.column("clip_id").take(pa.array(f_idx)),
                "best_clip": t.column("clip_id").take(pa.array(b_idx)),
                "n_bytes": pa.array(nb[b_idx], pa.int64()),
            }
        )

    def win_partial(batch: pa.Table) -> pa.Table:
        return reduce_best(batch)

    def win_final(t: pa.Table) -> pa.Table:
        # fold partials: re-reduce with first_clip as the min channel and
        # (n_bytes, best_clip) as the max channel
        cid = bytes_key_array(t.column("cluster_id"))
        first = bytes_key_array(t.column("first_clip"))
        best = bytes_key_array(t.column("best_clip"))
        nb = t.column("n_bytes").to_numpy(zero_copy_only=False)
        o1 = np.lexsort((first, cid))
        s1 = np.ones(len(o1), dtype=bool)
        s1[1:] = cid[o1][1:] != cid[o1][:-1]
        f_idx = o1[s1]
        o2 = np.lexsort((best, -nb, cid))
        s2 = np.ones(len(o2), dtype=bool)
        s2[1:] = cid[o2][1:] != cid[o2][:-1]
        b_idx = o2[s2]
        return pa.table(
            {
                "cluster_id": t.column("cluster_id").take(pa.array(f_idx)),
                "first_clip": t.column("first_clip").take(pa.array(f_idx)),
                "best_clip": t.column("best_clip").take(pa.array(b_idx)),
            }
        )

    winners = fold_by_str_key(
        sized.map_batches(win_partial, batch_format="pyarrow"),
        "cluster_id",
        lambda b: b,
        win_final,
        num_partitions,
    )

    out = strip_empty_blocks(assignments).join(
        strip_empty_blocks(winners), join_type="inner", on=("cluster_id",),
        num_partitions=np_parts,
    )

    def flags(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kf = pc.cast(
            pc.equal(batch.column("clip_id"), batch.column("first_clip")), pa.int64()
        )
        kb = pc.cast(
            pc.equal(batch.column("clip_id"), batch.column("best_clip")), pa.int64()
        )
        return pa.table(
            {
                "clip_id": batch.column("clip_id"),
                "cluster_id": batch.column("cluster_id"),
                "keep_first": kf,
                "keep_best": kb,
            }
        )

    return out.map_batches(flags, batch_format="pyarrow")

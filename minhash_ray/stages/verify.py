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
        ("lcs_ratio", pa.float64()),    # suffix-automaton LCS ratio (-1 = not computed)
        ("channel", pa.string()),
    ]
)


def _edges_table(ids_a, ids_b, sim, sh_dist, fp_dist, channel: str, keep_mask,
                 audio_sim=None, jaccard=None, lcs=None) -> pa.Table:
    if audio_sim is None:
        audio_sim = np.zeros(len(sim), dtype=np.float64)
    if jaccard is None:
        jaccard = np.full(len(sim), 1.0 if channel == "exact" else -1.0, dtype=np.float64)
    if lcs is None:
        lcs = np.full(len(sim), 1.0 if channel == "exact" else -1.0, dtype=np.float64)
    t = pa.table(
        {
            "clip_id_a": ids_a,
            "clip_id_b": ids_b,
            "sim": pa.array(sim, pa.float64()),
            "jaccard": pa.array(jaccard, pa.float64()),
            "audio_sim": pa.array(audio_sim, pa.float64()),
            "simhash_dist": pa.array(sh_dist, pa.int64()),
            "audio_fp_dist": pa.array(fp_dist, pa.int64()),
            "lcs_ratio": pa.array(lcs, pa.float64()),
            "channel": pa.array([channel] * len(sim), pa.string()),
        },
        schema=EDGES_SCHEMA,
    )
    return t.filter(pa.array(keep_mask)) if keep_mask is not None else t


def _lcs_gate(texts_a, texts_b, text_keep: np.ndarray, min_ratio: float):
    """Suffix-automaton LCS ratio for text-kept candidate rows only (the
    post-jaccard survivor set — metadata-scale), returning (lcs vector
    with -1 where not computed, updated text_keep)."""
    from minhash_ray.functions.substring import lcs_ratio

    lcs = np.full(len(text_keep), -1.0, dtype=np.float64)
    for i in np.flatnonzero(text_keep):
        lcs[i] = lcs_ratio(texts_a[i], texts_b[i])
    return lcs, text_keep & (lcs >= min_ratio)


def _exact_pregate(cfg: PipelineConfig) -> float:
    """Resolved estimator pregate for exact verification (see
    ``PipelineConfig.exact_verify_pregate``)."""
    if cfg.exact_verify_pregate >= 0:
        return cfg.exact_verify_pregate
    return max(0.0, cfg.tau - 2.0 * cfg.verify_margin)


def make_broadcast_verifier(pack_ref, cfg: PipelineConfig):
    """Verify stage as a plain task fn: the broadcast signature pack is
    fetched through the per-worker-process cache (numpy arrays are
    zero-copy views of the shared object store), so tasks stay elastic —
    no actor pool reserving CPUs while upstream stages run."""
    threshold = cfg.tau - cfg.verify_margin
    tau = cfg.tau
    audio_tau = cfg.audio_tau
    substring_min_ratio = cfg.substring_min_ratio
    pre_gate = _exact_pregate(cfg)

    audio_min_filled = cfg.audio_min_filled

    def verify(batch: pa.Table) -> pa.Table:
        from minhash_ray.functions.audio import audio_similarity
        from minhash_ray.util import bytes_key_array, cached_get

        pack = cached_get(pack_ref[0])
        ids_sorted, sigs, perm = pack["ids_sorted"], pack["sigs"], pack["perm"]
        ids_a = batch.column("clip_id_a")
        ids_b = batch.column("clip_id_b")
        idx_a = perm[np.searchsorted(ids_sorted, bytes_key_array(ids_a))]
        idx_b = perm[np.searchsorted(ids_sorted, bytes_key_array(ids_b))]
        sim = estimate_similarity(sigs[idx_a], sigs[idx_b])
        sh = hamming_distance(pack["simhash"][idx_a], pack["simhash"][idx_b])
        fp = hamming_distance(pack["audio_fp"][idx_a], pack["audio_fp"][idx_b])
        audio_sigs = pack.get("audio_sigs")
        if audio_sigs is not None:
            asim = audio_similarity(
                audio_sigs[idx_a], audio_sigs[idx_b], audio_min_filled
            )
        else:
            asim = np.zeros(len(sim), dtype=np.float64)

        shingles = pack.get("shingles")
        if shingles is not None:
            # exact verification: candidate generation came from the sketch
            # bands, but the kept edge is gated on the TRUE shingle-set
            # jaccard — no estimator variance at the tau boundary (standard
            # LSH verify step; the estimator value is still reported).
            # Fully vectorized (no per-pair python loop).  The estimator
            # PREGATE skips the shingle-set gather for pairs whose est-sim
            # is far below tau AND that the audio channel cannot keep
            # (cfg.exact_verify_pregate) — every KEPT edge still carries
            # its true jaccard.
            from minhash_ray.functions.minhash import exact_jaccard_for_pairs

            jacc = np.full(len(sim), -1.0, dtype=np.float64)
            rows = np.flatnonzero((sim >= pre_gate) | (asim >= audio_tau))
            if rows.size:
                jacc[rows] = exact_jaccard_for_pairs(
                    shingles, pack["shingle_offsets"], idx_a[rows], idx_b[rows]
                )
            text_keep = jacc >= tau
        else:
            jacc = None
            text_keep = sim >= threshold
        lcs = None
        texts = pack.get("transcripts")
        if texts is not None:
            # substring_check: LCS computed only for post-jaccard survivors
            lcs, text_keep = _lcs_gate(
                texts[idx_a], texts[idx_b], text_keep, substring_min_ratio
            )
        keep = text_keep | (asim >= audio_tau)
        return _edges_table(
            ids_a, ids_b, sim, sh, fp, "minhash", keep,
            audio_sim=asim, jaccard=jacc, lcs=lcs,
        )

    return verify


def driver_exact_edges_table(ids, hashes) -> pa.Table:
    """Exact-duplicate star edges computed driver-side.

    Pure numpy: lexsort by (content_hash, clip_id), then each row links to
    the FIRST (= min) clip of its hash run.  The previous pandas
    ``groupby().transform("min")`` hit the object-dtype pure-Python
    per-group fallback (~90k groups ≈ seconds of driver-serial time — an
    Amdahl term the scaling measurement pays directly); this is two sorts
    and a segment gather."""
    from minhash_ray.util import bytes_key_array

    kid = bytes_key_array(ids)
    kh = bytes_key_array(hashes)
    if len(kid) == 0:
        return _edges_table(
            pa.array([], pa.string()), pa.array([], pa.string()),
            np.zeros(0), np.zeros(0, np.int64), np.zeros(0, np.int64),
            "exact", None,
        )
    order = np.lexsort((kid, kh))
    kh_s = kh[order]
    new_run = np.ones(len(kh_s), dtype=bool)
    new_run[1:] = kh_s[1:] != kh_s[:-1]
    run_start = np.maximum.accumulate(np.where(new_run, np.arange(len(kh_s)), 0))
    rep_idx = order[run_start]            # min clip per hash run (original row idx)
    member = ~new_run                     # every non-first row links to its rep
    a_idx = rep_idx[member]
    b_idx = order[member]
    n = int(member.sum())
    if isinstance(ids, pa.ChunkedArray):
        ids_arr = ids.combine_chunks()     # zero-ish copy, not a Python rebuild
    elif isinstance(ids, pa.Array):
        ids_arr = ids
    else:
        ids_arr = pa.array(list(ids), pa.string())
    return _edges_table(
        ids_arr.take(pa.array(a_idx)),
        ids_arr.take(pa.array(b_idx)),
        np.ones(n, dtype=np.float64),
        np.zeros(n, dtype=np.int64),
        np.zeros(n, dtype=np.int64),
        "exact",
        None,
    )


def _pack_from_table(t: pa.Table, cfg: PipelineConfig, with_content: bool):
    """Core pack construction over the concatenated signature table —
    returns ``(pack_dict, exact_edges_table_or_None)``.  Runs inside a Ray
    TASK (see :func:`build_broadcast_pack_async`): the concat + argsort +
    matrix reshapes were ~0.8 s of driver-serial Amdahl time per run at
    200k clips, paid identically at every parallelism level."""
    from minhash_ray.stages.signature import signature_matrix

    schema_names = t.schema.names
    have_audio = "audio_sig" in schema_names
    have_shingles = cfg.exact_verify and "shingles" in schema_names
    have_transcript = cfg.exact_verify and not have_shingles and "transcript" in schema_names
    want_lcs = cfg.substring_check and "transcript" in schema_names
    # the pack is pure numpy (no python dict): workers get zero-copy plasma
    # views with no per-process deserialization cost — a dict index costs
    # ~1 s per worker process and therefore ANTI-scales with worker count.
    # ids are kept as a sorted fixed-width UTF-8 byte array plus a
    # permutation back to row order; lookup = perm[searchsorted(...)].
    # Only the id array is permuted — the big matrices and shingle
    # segments stay in row order, so the driver never pays the gathers
    # (the pack build is serial driver time and caps scaling).
    from minhash_ray.util import bytes_key_array

    ids = bytes_key_array(t.column("clip_id"))
    order = np.argsort(ids).astype(np.int64)
    pack = {
        "ids_sorted": ids[order],
        "perm": order,
        "sigs": signature_matrix(t, cfg.num_perm),
        "simhash": np.ascontiguousarray(t.column("simhash").to_numpy(), dtype=np.uint64),
        "audio_fp": np.ascontiguousarray(t.column("audio_fp").to_numpy(), dtype=np.uint64),
    }
    if have_audio:
        col = t.column("audio_sig")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        pack["audio_sigs"] = (
            col.flatten().to_numpy(zero_copy_only=False).reshape(-1, cfg.audio_num_perm)
        )
    if have_shingles or have_transcript:
        # per-row sorted-unique shingle sets for exact verification, flat +
        # offsets in ROW order (the perm handles id lookup).  Normally read
        # straight from the (parallel-computed) `shingles` column; the
        # transcript fallback recomputes driver-side.
        if have_shingles:
            col = t.column("shingles")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            raw_offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            pack["shingles"] = np.ascontiguousarray(
                col.flatten().to_numpy(zero_copy_only=False), dtype=np.uint64
            )
            pack["shingle_offsets"] = raw_offs - raw_offs[0]
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
            pack["shingles"] = np.ascontiguousarray(ss)
            pack["shingle_offsets"] = np.concatenate([[0], np.cumsum(ucounts)]).astype(
                np.int64
            )
    if want_lcs:
        # raw transcripts for the opt-in LCS gate (object array: only the
        # post-jaccard survivor rows are ever touched; row order, perm'd
        # at lookup)
        pack["transcripts"] = np.array(t.column("transcript").to_pylist(), dtype=object)
    exact_tbl = None
    if with_content:
        exact_tbl = driver_exact_edges_table(
            t.column("clip_id").combine_chunks(), t.column("content_hash").combine_chunks()
        )
    return pack, exact_tbl


_PACK_TASK = None


def _pack_build_task():
    """Lazily-defined remote task building the broadcast pack from the
    materialized signature blocks (zero-copy plasma reads on the worker)."""
    global _PACK_TASK
    if _PACK_TASK is None:
        import ray

        @ray.remote(num_returns=2)
        def pack_build(cfg, with_content: bool, *blocks: pa.Table):
            tables = [b for b in blocks if b.num_rows]
            if not tables:
                tables = [blocks[0]]
            t = pa.concat_tables(tables)
            return _pack_from_table(t, cfg, with_content)

        _PACK_TASK = pack_build
    return _PACK_TASK


def build_broadcast_pack_async(sig_ds, cfg: PipelineConfig, with_content: bool = False):
    """Kick off the broadcast-pack build as a Ray task WITHOUT blocking the
    driver — returns ``([pack_ref], exact_tbl_ref)``.  Callers that can
    (run_dedup) launch this before the candidates shuffle so the pack
    build overlaps it entirely; the verify tasks block on the ref through
    the per-worker cache only when they actually start."""
    blocks = sig_ds.to_arrow_refs()
    pack_ref, exact_ref = _pack_build_task().remote(cfg, with_content, *blocks)
    return [pack_ref], exact_ref


def build_broadcast_pack(sig_ds, cfg: PipelineConfig, with_content: bool = False):
    """Build the signature broadcast pack (numpy matrices + sorted-id
    index) in a Ray task and return ``[pack_ref]`` — only valid under
    ``broadcast_verify_max_rows``.

    With ``with_content=True`` the same single pass also returns the
    exact-duplicate star-edge table (no separate stage or second scan).
    """
    import ray

    refs, exact_ref = build_broadcast_pack_async(sig_ds, cfg, with_content)
    if with_content:
        return refs, ray.get(exact_ref)
    return refs


def verify_broadcast(pairs_ds, sig_ds, cfg: PipelineConfig, concurrency: int = 4):
    pack_ref = build_broadcast_pack(sig_ds, cfg)
    return pairs_ds.map_batches(
        make_broadcast_verifier(pack_ref, cfg),
        batch_format="pyarrow",
        batch_size=8192,
    )


def _list_flat_offsets(col) -> tuple[np.ndarray, np.ndarray]:
    """list<u64> column → (flat uint64, offsets int64), slice-safe."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.ascontiguousarray(col.flatten().to_numpy(zero_copy_only=False), dtype=np.uint64)
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, offs - offs[0]


def _pack_u64_column(col) -> pa.Array:
    """list<u64> / fixed_size_list<u64> column → large_binary (8 B per
    element).  Acero hash joins reject list-typed payload columns, so
    sketch and shingle vectors ride through ``Dataset.join`` as opaque
    byte strings and are reinterpreted (zero-copy) after the join."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        width = col.type.list_size
        n = len(col)
        flat = np.ascontiguousarray(
            col.flatten().to_numpy(zero_copy_only=False), dtype=np.uint64
        )
        offs = np.arange(n + 1, dtype=np.int64) * width
    else:
        flat, offs = _list_flat_offsets(col)
        n = len(offs) - 1
    byte_offsets = (offs * 8).astype(np.int64)
    return pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(byte_offsets.tobytes()),
         pa.py_buffer(np.ascontiguousarray(flat).view(np.uint8).tobytes())],
    )


def _unpack_u64_column(col) -> tuple[np.ndarray, np.ndarray]:
    """large_binary column of packed u64 vectors → (flat uint64, elem
    offsets int64).  Zero-copy on the data buffer when aligned."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    raw_off = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    start, end = int(raw_off[0]), int(raw_off[-1])
    seg = data[start:end]
    if start % 8:
        seg = seg.copy()
    flat = seg.view(np.uint64)
    return flat, (raw_off - start) // 8


def verify_shuffle(pairs_ds, sig_ds, cfg: PipelineConfig, num_partitions: int = 32):
    """Scale path: attach per-side signature state by two partitioned hash
    joins, then apply the SAME edge semantics as the broadcast path — when
    ``cfg.exact_verify`` the per-row sorted-unique shingle sets ride
    through the joins as list<u64> columns and text edges gate on the TRUE
    shingle-set Jaccard >= tau, so a corpus crossing
    ``broadcast_verify_max_rows`` never changes cluster semantics.  Audio
    edges use the same hygiene-filtered OPH similarity as broadcast.

    Columns are renamed explicitly per side BEFORE each join (sig_a/sig_b,
    ...), never resolved positionally from join suffixes — resilient to
    Ray join column-ordering/suffix changes.
    """
    from minhash_ray.util import clamp_partitions

    num_partitions = clamp_partitions(num_partitions)
    schema_names = sig_ds.schema().names
    have_audio = "audio_sig" in schema_names
    exact = cfg.exact_verify and "shingles" in schema_names
    want_lcs = cfg.substring_check and "transcript" in schema_names

    src_cols = ["signature", "simhash", "audio_fp"]
    packed_cols = {"signature"}
    if have_audio:
        src_cols.append("audio_sig")
        packed_cols.add("audio_sig")
    if exact:
        src_cols.append("shingles")
        packed_cols.add("shingles")
    if want_lcs:
        src_cols.append("transcript")

    def make_side(suffix: str):
        def rename(batch: pa.Table) -> pa.Table:
            data = {"clip_id": batch.column("clip_id")}
            for c in src_cols:
                col = batch.column(c)
                # u64 vectors ride as large_binary: Acero joins reject
                # list-typed payload columns
                data[f"{c}_{suffix}"] = _pack_u64_column(col) if c in packed_cols else col
            return pa.table(data)

        return sig_ds.map_batches(rename, batch_format="pyarrow")

    from minhash_ray.util import strip_empty_blocks

    with_a = pairs_ds.join(
        make_side("a"),
        join_type="inner",
        on=("clip_id_a",),
        right_on=("clip_id",),
        num_partitions=num_partitions,
    )
    # the barrier between the chained joins is mandatory, not a tuning
    # choice: join #1 finalizes empty partitions as schema-less blocks
    # that flakily break join #2's schema broadcast (util.py docstring)
    with_ab = strip_empty_blocks(with_a).join(
        make_side("b"),
        join_type="inner",
        on=("clip_id_b",),
        right_on=("clip_id",),
        num_partitions=num_partitions,
    )

    num_perm = cfg.num_perm
    audio_num_perm = cfg.audio_num_perm
    est_threshold = cfg.tau - cfg.verify_margin
    tau = cfg.tau
    audio_tau = cfg.audio_tau
    audio_min_filled = cfg.audio_min_filled
    substring_min_ratio = cfg.substring_min_ratio
    pre_gate = _exact_pregate(cfg)

    def compute(batch: pa.Table) -> pa.Table:
        from minhash_ray.functions.audio import audio_similarity
        from minhash_ray.functions.minhash import exact_jaccard_for_pairs

        def mat(name, width):
            flat, _ = _unpack_u64_column(batch.column(name))
            return flat.reshape(-1, width)

        def vec(name):
            return np.ascontiguousarray(batch.column(name).to_numpy(), dtype=np.uint64)

        sim = estimate_similarity(mat("signature_a", num_perm), mat("signature_b", num_perm))
        sh = hamming_distance(vec("simhash_a"), vec("simhash_b"))
        fp = hamming_distance(vec("audio_fp_a"), vec("audio_fp_b"))
        if have_audio:
            asim = audio_similarity(
                mat("audio_sig_a", audio_num_perm),
                mat("audio_sig_b", audio_num_perm),
                audio_min_filled,
            )
        else:
            asim = np.zeros(len(sim), dtype=np.float64)
        if exact:
            n = batch.num_rows
            jacc = np.full(n, -1.0, dtype=np.float64)
            rows = np.flatnonzero((sim >= pre_gate) | (asim >= audio_tau))
            if rows.size:
                fa, oa = _unpack_u64_column(batch.column("shingles_a"))
                fb, ob = _unpack_u64_column(batch.column("shingles_b"))
                flat = np.concatenate([fa, fb])
                offs = np.concatenate([oa, len(fa) + ob[1:]])
                jacc[rows] = exact_jaccard_for_pairs(flat, offs, rows, n + rows)
            text_keep = jacc >= tau
        else:
            jacc = None
            text_keep = sim >= est_threshold
        lcs = None
        if want_lcs:
            texts_a = np.array(batch.column("transcript_a").to_pylist(), dtype=object)
            texts_b = np.array(batch.column("transcript_b").to_pylist(), dtype=object)
            lcs, text_keep = _lcs_gate(texts_a, texts_b, text_keep, substring_min_ratio)
        keep = text_keep | (asim >= audio_tau)
        return _edges_table(
            batch.column("clip_id_a"), batch.column("clip_id_b"), sim, sh, fp,
            "minhash", keep, audio_sim=asim, jaccard=jacc, lcs=lcs,
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
        from minhash_ray.util import bytes_key_array

        dup = reps[sizes > 1]
        keys = bytes_key_array(dup.index.tolist())
        vals = bytes_key_array(dup.tolist())
        order = np.argsort(keys)
        rep_ref = [ray.put({"keys": keys[order], "vals": vals[order]})]

        def star_fn(batch: pa.Table) -> pa.Table:
            from minhash_ray.util import bytes_key_array, cached_get

            rep = cached_get(rep_ref[0])
            keys_s, vals_s = rep["keys"], rep["vals"]
            ids = bytes_key_array(batch.column("clip_id"))
            hashes = bytes_key_array(batch.column("content_hash"))
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

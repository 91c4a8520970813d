"""Audio-payload operators over the clips table (binary column + typed
metadata, no decode):

* :func:`audio_stats` — per-(codec, sr_hz) storage/duration aggregate; the
  "how much audio do I have" scan every corpus run starts with.
* :func:`audio_exact_dedup` — exact byte-identical audio dedup: every clip
  routed to the minimum clip_id of its payload-identical group.  This is
  the AUDIO exact tier of a tiered dedup (cf. ``dedup_text.doc_dedup_tiered``
  tier 1): at 100 TB it removes re-uploads/re-encodes-of-nothing before any
  sketching happens, and its shuffle moves 16-byte digests, never payloads.

Both are SQL-oracle-checked (the oracle groups/partitions by the raw BLOB,
the engine by its 128-bit word-polynomial digest — an independent identity
check of the digest channel the flagship's exact channel rides on,
stages/signature.py content_hash).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from minhash_ray.util import (
    DIGEST_PARAMS,
    binary_flat_offsets,
    wordpoly_digest_rows,
)


def _combined(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _add_audio_digest(batch: pa.Table) -> pa.Table:
    """(clip_id, ag0, ag1): the 128-bit payload digest as two int64 key
    columns — the exact-identity shuffle key (16 bytes/row instead of the
    payload; same two-channel word-polynomial as the signature stage's
    content hash, computed zero-copy off the Arrow binary buffer)."""
    flat, offs = binary_flat_offsets(_combined(batch.column("bytes")))
    cols = {"clip_id": batch.column("clip_id")}
    with np.errstate(over="ignore"):
        for i, (seed, mult) in enumerate(DIGEST_PARAMS):
            M = np.uint64(mult)
            d = np.uint64(seed) * M + wordpoly_digest_rows(flat, offs, mult)
            cols[f"ag{i}"] = pa.array(d.view(np.int64), pa.int64())
    return pa.table(cols)


def audio_exact_dedup(clips, num_partitions: int = 8):
    """One row per clip: ``(clip_id, rep_clip_id, group_size)`` where
    ``rep_clip_id`` is the minimum clip_id among clips with a byte-identical
    audio payload and ``group_size`` that group's cardinality.

    Scale shape: one map pass digests the payload (it never leaves the read
    task), then a 16-byte-key groupby produces per-group (rep, size) and one
    partitioned hash join routes every clip through its group — no stage
    holds payloads or the corpus on the driver.
    """
    from minhash_ray.util import clamp_partitions, fold_by_int_keys

    keyed = clips.map_batches(_add_audio_digest, batch_format="pyarrow").materialize()
    np_parts = clamp_partitions(num_partitions)

    # distinct payload digests are corpus-width: fold Arrow partials
    # through a digest-hash partition, never Ray-aggregate groups
    def rep_partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(["ag0", "ag1"]).aggregate(
            [("clip_id", "min"), ([], "count_all")]
        )
        return pa.table(
            {
                "ag0": agg.column("ag0"),
                "ag1": agg.column("ag1"),
                "rep_clip_id": agg.column("clip_id_min"),
                "c": pc.cast(agg.column("count_all"), pa.int64()),
            }
        )

    def rep_final(t: pa.Table) -> pa.Table:
        agg = t.group_by(["ag0", "ag1"]).aggregate(
            [("rep_clip_id", "min"), ("c", "sum")]
        )
        return pa.table(
            {
                "ag0": agg.column("ag0"),
                "ag1": agg.column("ag1"),
                "rep_clip_id": agg.column("rep_clip_id_min"),
                "group_size": pc.cast(agg.column("c_sum"), pa.int64()),
            }
        )

    reps = fold_by_int_keys(
        keyed.select_columns(["ag0", "ag1", "clip_id"]),
        ["ag0", "ag1"],
        rep_partial,
        rep_final,
        num_partitions,
    )
    out = keyed.join(
        reps, join_type="inner", on=("ag0", "ag1"), num_partitions=np_parts
    )

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "clip_id": batch.column("clip_id"),
                "rep_clip_id": batch.column("rep_clip_id"),
                "group_size": batch.column("group_size"),
            }
        )

    return out.map_batches(slim, batch_format="pyarrow")


def audio_stats(clips):
    """Per-(codec, sr_hz): clip count, total payload bytes, total/min/max
    duration — vectorized per-batch partials (Arrow ``group_by`` inside the
    map task) folded by a tiny final groupby, so the shuffle moves one row
    per (batch, codec, sr) instead of one per clip."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "codec": batch.column("codec"),
                # int64 key: Ray's hash aggregate widens key columns anyway,
                # so pin the type explicitly (oracle CASTs to BIGINT)
                "sr_hz": pc.cast(batch.column("sr_hz"), pa.int64()),
                "nb": pc.binary_length(_combined(batch.column("bytes"))).cast(pa.int64()),
                "dur": pc.cast(batch.column("dur_ms"), pa.int64()),
            }
        )
        g = t.group_by(["codec", "sr_hz"]).aggregate(
            [("nb", "count"), ("nb", "sum"), ("dur", "sum"), ("dur", "min"), ("dur", "max")]
        )
        return g

    parts = clips.map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby(["codec", "sr_hz"]).aggregate(
        Sum("nb_count", alias_name="n_clips"),
        Sum("nb_sum", alias_name="total_bytes"),
        Sum("dur_sum", alias_name="total_dur_ms"),
        Min("dur_min", alias_name="min_dur_ms"),
        Max("dur_max", alias_name="max_dur_ms"),
    )

    def order(batch: pa.Table) -> pa.Table:
        return batch.select(
            ["codec", "sr_hz", "n_clips", "total_bytes",
             "total_dur_ms", "min_dur_ms", "max_dur_ms"]
        )

    return agg.map_batches(order, batch_format="pyarrow")


def audio_energy_stats(clips, silence_abs: int = 512):
    """Per-clip decoded-sample QC stats, ALL exact integers: ``(clip_id,
    n_samples, energy, peak_abs, n_clipped, n_silent, decode_ok)`` —
    the audio-payload quality gate of a speech-corpus run (dead/near-
    silent uploads, clipped recordings, truncated payloads).

    * ``energy`` = Σ s² over int16 samples (≤ 2³⁰ per sample — int64-exact
      for clips up to ~2¹⁷ seconds, no float anywhere);
    * ``peak_abs`` = max |s| (32768 for a full-scale negative sample);
    * ``n_clipped`` = samples at digital full scale (s = 32767 or −32768);
    * ``n_silent`` = samples with |s| <= ``silence_abs``;
    * ``decode_ok`` = 0 for non-``pcm_s16le`` codecs (stub boundary, cf.
      :mod:`minhash_ray.functions.audio`); their stat columns are 0.

    Scale shape: a pure map over zero-copy Arrow payload buffers — per
    batch the pcm rows' payloads are packed once (odd trailing bytes
    trimmed, the signature stage's alignment rule, stages/signature.py)
    and every stat is a segment fold over ONE int16 view (cumsum
    difference — empty-row safe), never a per-sample Python loop.  The
    payload never crosses the object store: stats ride out, bytes stay in
    the read task."""

    def fn(batch: pa.Table) -> pa.Table:
        flat, offs = binary_flat_offsets(_combined(batch.column("bytes")))
        codecs = batch.column("codec").to_pylist()
        n = batch.num_rows
        lens = offs[1:] - offs[:-1]
        ok = np.array([c == "pcm_s16le" for c in codecs], dtype=bool)
        usable = np.where(ok, lens - (lens % 2), 0)
        # pack pcm payloads contiguously (even-aligned by construction)
        segs = [flat[int(offs[i]): int(offs[i]) + int(usable[i])] for i in range(n)
                if usable[i] > 0]
        packed = np.concatenate(segs) if segs else np.empty(0, dtype=np.uint8)
        if packed.ctypes.data % 2:
            packed = packed.copy()
        w16 = packed.view("<i2").astype(np.int64)
        n_samp = (usable // 2).astype(np.int64)
        ends = np.cumsum(n_samp)
        starts = ends - n_samp
        cs_e = np.concatenate(([0], np.cumsum(w16 * w16)))
        energy = cs_e[ends] - cs_e[starts]
        absw = np.abs(w16)
        cs_c = np.concatenate(
            ([0], np.cumsum(((w16 == 32767) | (w16 == -32768)).astype(np.int64)))
        )
        n_clipped = cs_c[ends] - cs_c[starts]
        cs_s = np.concatenate(([0], np.cumsum((absw <= silence_abs).astype(np.int64))))
        n_silent = cs_s[ends] - cs_s[starts]
        # segment max via maximum.reduceat on the contiguous packing
        # (pad one 0 so trailing empty rows can't index past the end),
        # then zero out empty rows (reduceat returns the NEXT row's head)
        padded = np.concatenate((absw, [0]))
        peak = np.maximum.reduceat(padded, np.minimum(starts, len(padded) - 1))
        peak[n_samp == 0] = 0
        return pa.table(
            {
                "clip_id": batch.column("clip_id"),
                "n_samples": pa.array(n_samp, pa.int64()),
                "energy": pa.array(energy, pa.int64()),
                "peak_abs": pa.array(peak, pa.int64()),
                "n_clipped": pa.array(n_clipped, pa.int64()),
                "n_silent": pa.array(n_silent, pa.int64()),
                "decode_ok": pa.array(ok.astype(np.int64), pa.int64()),
            }
        )

    return clips.map_batches(fn, batch_format="pyarrow")


def audio_dup_pairs(clips, cfg=None, tau: float = 0.6, num_partitions: int = 8):
    """Audio-channel-only near-duplicate pairs: (clip_id_a, clip_id_b,
    audio_sim) with ``audio_similarity >= tau`` — the standalone audio
    twin of the joint flagship (re-encoded / re-uploaded audio whose
    transcript may differ entirely).

    Scale shape: the fused read+signature task pool computes the byte-OPH
    sketch (payload never crosses the object store), the audio LSH band
    map + salted bucket shuffle produce candidates exactly as in the
    flagship, and verification attaches each side's ``audio_sig`` by two
    slim partitioned joins (sketches packed as large_binary, the
    join-attach pattern) — nothing driver-resident, no broadcast of the
    corpus.  The estimator is the reference query semantics
    (src/serial/minhash-serial.c:16-26) with OPH empty-slot hygiene
    (functions/audio.audio_similarity)."""
    from minhash_ray.config import PipelineConfig
    from minhash_ray.functions.audio import audio_similarity
    from minhash_ray.stages.banding import make_audio_band_fn
    from minhash_ray.stages.candidates import candidate_pairs
    from minhash_ray.stages.signature import make_signature_fn
    from minhash_ray.stages.verify import _pack_u64_column, _unpack_u64_column
    from minhash_ray.util import clamp_partitions, strip_empty_blocks

    cfg = cfg or PipelineConfig()
    np_parts = clamp_partitions(num_partitions)
    signatures = clips.map_batches(
        make_signature_fn(cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_size or None,
    ).materialize()

    band_rows = signatures.map_batches(
        make_audio_band_fn(
            cfg.audio_bands, cfg.audio_rows_per_band, cfg.audio_num_perm,
            min_filled=cfg.audio_min_filled,
        ),
        batch_format="pyarrow",
    )
    pairs = candidate_pairs(band_rows, cfg, num_partitions=np_parts).materialize()

    def side(suffix: str):
        def pack(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "clip_id": batch.column("clip_id"),
                    f"as_{suffix}": _pack_u64_column(batch.column("audio_sig")),
                }
            )

        return signatures.map_batches(pack, batch_format="pyarrow")

    with_a = pairs.join(
        side("a"), join_type="inner", on=("clip_id_a",), right_on=("clip_id",),
        num_partitions=np_parts,
    )
    with_ab = strip_empty_blocks(with_a).join(
        side("b"), join_type="inner", on=("clip_id_b",), right_on=("clip_id",),
        num_partitions=np_parts,
    )

    k = cfg.audio_num_perm
    min_filled = cfg.audio_min_filled

    def verify(batch: pa.Table) -> pa.Table:
        fa, oa = _unpack_u64_column(batch.column("as_a"))
        fb, ob = _unpack_u64_column(batch.column("as_b"))
        a = fa.reshape(-1, k)
        b = fb.reshape(-1, k)
        sim = audio_similarity(a, b, min_filled=min_filled)
        keep = sim >= tau
        sel = pa.array(np.flatnonzero(keep))
        return pa.table(
            {
                "clip_id_a": pc.take(batch.column("clip_id_a"), sel),
                "clip_id_b": pc.take(batch.column("clip_id_b"), sel),
                "audio_sim": pa.array(sim[keep], pa.float64()),
            }
        )

    return with_ab.map_batches(verify, batch_format="pyarrow", batch_size=8192)


def transcript_rate_flags(clips, min_tps: int = 10, max_tps: int = 100):
    """(clip_id, n_tokens, dur_ms, rate_flag): speaking-rate QC over the
    audio + transcript pairs — flags clips whose whitespace-token rate
    falls outside [min_tps, max_tps] tokens/second, the ASR-corpus
    hygiene gate (rate outliers are alignment or transcription errors;
    cf. the duration/char-rate filters of speech-corpus toolkits).

    All gates are INTEGER cross-products (``n_tokens * 1000`` vs
    ``bound * dur_ms``) so the oracle compare is bit-stable; a zero
    duration with a non-empty transcript flags fast (undefined rate =
    suspect).  ``rate_flag``: -1 slow, 0 in-range, 1 fast.  The default
    bounds are calibrated to the synthetic fixture's rate distribution
    (median ≈ 45 tok/s — not real speech, where ~2-4 words/s applies);
    a real corpus passes its own bounds."""

    def fn(batch: pa.Table) -> pa.Table:
        tr = batch.column("transcript")
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(tr))
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        n[pc.equal(pc.utf8_trim_whitespace(tr), "").to_numpy(zero_copy_only=False)] = 0
        dur = pc.cast(batch.column("dur_ms"), pa.int64()).to_numpy(zero_copy_only=False)
        ms = n * 1000
        flag = np.zeros(len(n), dtype=np.int64)
        flag[ms > max_tps * dur] = 1
        flag[ms < min_tps * dur] = -1
        return pa.table(
            {
                "clip_id": batch.column("clip_id"),
                "n_tokens": pa.array(n, pa.int64()),
                "dur_ms": pa.array(dur, pa.int64()),
                "rate_flag": pa.array(flag, pa.int64()),
            }
        )

    return clips.map_batches(fn, batch_format="pyarrow")


def pair_snr(clips, edges, min_snr_db: float = 30.0, num_partitions: int = 8):
    """(clip_id_a, clip_id_b, channel, snr_db, snr_ok): the NORTH-RULE
    per-row invariant — decoded-PCM SNR of every verified dup edge — as a
    queryable relation (BASELINE.json input_hint: "decoded-PCM allclose
    (SNR>=30dB) + transcript equality").  ``snr_db`` is the SNR of clip B
    against clip A as reference (lengths truncated to the shorter, the
    fixture's own gate), ``snr_ok`` gates at ``min_snr_db``.  Text-channel
    edges (same transcript, unrelated audio) legitimately score low — the
    ``channel`` column rides along so the audit reads per channel.

    Scale shape: edges are metadata-scale; the heavy byte payloads attach
    through TWO partitioned ``Dataset.join``s (payload side streams, edge
    side is slim — the verify_shuffle join-attach pattern), and the SNR
    kernel runs per edge (numpy decode + one dot per pair; edge-scale,
    never corpus-scale).  Nothing is driver-resident."""
    import pyarrow.compute as pc2

    def slim(batch: pa.Table) -> pa.Table:
        cols = {"clip_id_a": batch.column("clip_id_a"),
                "clip_id_b": batch.column("clip_id_b")}
        if "channel" in batch.schema.names:
            cols["channel"] = batch.column("channel")
        else:
            cols["channel"] = pa.array(["?"] * batch.num_rows, pa.string())
        return pa.table(cols)

    e = edges.map_batches(slim, batch_format="pyarrow")
    payload = clips.select_columns(["clip_id", "bytes", "codec"])

    a = e.join(
        payload.rename_columns(
            {"clip_id": "clip_id_a", "bytes": "bytes_a", "codec": "codec_a"}
        ),
        join_type="inner", on=("clip_id_a",), num_partitions=num_partitions,
    )
    ab = a.join(
        payload.rename_columns(
            {"clip_id": "clip_id_b", "bytes": "bytes_b", "codec": "codec_b"}
        ),
        join_type="inner", on=("clip_id_b",), num_partitions=num_partitions,
    )

    def score(batch: pa.Table) -> pa.Table:
        from minhash_ray.functions.audio import (
            UnsupportedCodecError,
            decode_pcm,
            snr_db,
        )

        ba = _combined(batch.column("bytes_a"))
        bb = _combined(batch.column("bytes_b"))
        ca = _combined(batch.column("codec_a"))
        cb = _combined(batch.column("codec_b"))
        n = batch.num_rows
        snr = np.empty(n, dtype=np.float64)
        for i in range(n):  # edge-scale loop (pairs, not corpus rows)
            try:
                snr[i] = snr_db(
                    decode_pcm(ba[i].as_py(), ca[i].as_py()),
                    decode_pcm(bb[i].as_py(), cb[i].as_py()),
                )
            except UnsupportedCodecError:
                # honest stub boundary: undecodable codec → NaN (never ok)
                snr[i] = float("nan")
        return pa.table(
            {
                "clip_id_a": batch.column("clip_id_a"),
                "clip_id_b": batch.column("clip_id_b"),
                "channel": batch.column("channel"),
                "snr_db": pa.array(snr, pa.float64()),
                "snr_ok": pa.array(
                    (snr >= min_snr_db).astype(np.int64), pa.int64()
                ),
            }
        )

    return ab.map_batches(score, batch_format="pyarrow")


def _repack_chunk_bytes(
    buf: np.ndarray,
    row: np.ndarray,
    byte_start: np.ndarray,
    byte_len: np.ndarray,
    contiguous: bool,
):
    """Pack per-chunk byte ranges of ``buf`` into one flat uint8 buffer
    (chunks arrive row-major: ascending ``row``, ascending position
    within a row).  Returns ``(values, out_off)``.

    ``contiguous=True`` (hop == window geometry: within a clip, chunk k
    ends exactly where chunk k+1 starts) collapses the repack to ONE
    slice-copy per CLIP; the general gather below materializes an int64
    index per payload byte — 8 B of index writes + a random read per
    byte, ~9x the DRAM traffic (measured ~8 s of the 10 s chunk front
    half at sf0.1 / 122k chunks).  Both paths are proven byte-identical
    in test_repack_chunk_bytes_contiguous_equals_gather."""
    out_off = np.zeros(len(row) + 1, dtype=np.int64)
    np.cumsum(byte_len, out=out_off[1:])
    if contiguous:
        values = np.empty(int(out_off[-1]), dtype=np.uint8)
        new_clip = np.ones(len(row), dtype=bool)
        if len(row):
            new_clip[1:] = row[1:] != row[:-1]
            c_first = np.flatnonzero(new_clip)
            c_last = np.concatenate([c_first[1:] - 1, [len(row) - 1]])
            src_s = byte_start[c_first]
            src_e = byte_start[c_last] + byte_len[c_last]
            dst_s = out_off[:-1][c_first]
            for s, e, d in zip(src_s, src_e, dst_s):   # one slice per CLIP
                values[d : d + (e - s)] = buf[s:e]
        return values, out_off
    idx = np.repeat(byte_start - out_off[:-1], byte_len) + np.arange(
        int(out_off[-1]), dtype=np.int64
    )
    return np.ascontiguousarray(buf[idx]), out_off


def _chunk_matches(
    clips,
    cfg,
    window_ms: int,
    hop_ms: int,
    tau: float,
    np_parts: int,
):
    """Shared chunk-LSH front half of :func:`audio_containment_pairs` and
    :func:`audio_dup_regions`: segment clips into (window, hop) pcm
    chunks, byte-OPH sketch every chunk straight off a re-packed
    contiguous buffer, run the chunks through the UNCHANGED production
    LSH machinery under composite ``clip#chunk`` ids, and verify
    candidates with the OPH estimator.

    Returns ``(sigs, matches)``: ``sigs`` = (clip_id, chunk_id,
    start_smp, end_smp, audio_sig) one row per chunk, ``matches`` =
    (clip_id_a, ka, clip_id_b, kb) verified cross-clip chunk matches in
    canonical (clip_id_a < clip_id_b) order.

    Contract: ``#`` must not appear in clip ids (composite id separator;
    the id is recovered with an anchored RE2 split on the LAST ``#``)."""
    from minhash_ray.functions.audio import (
        audio_similarity,
        byte_oph_signatures_flat,
    )
    from minhash_ray.pipelines.multimodal import _chunk_geometry
    from minhash_ray.stages.banding import make_audio_band_fn
    from minhash_ray.stages.candidates import candidate_pairs
    from minhash_ray.stages.verify import _pack_u64_column, _unpack_u64_column
    from minhash_ray.util import strip_empty_blocks

    k = cfg.audio_num_perm

    def chunk_sigs(batch: pa.Table) -> pa.Table:
        payload, _, row, kk, start, end = _chunk_geometry(batch, window_ms, hop_ms)
        ids = batch.column("clip_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if len(row) == 0:
            return pa.table(
                {
                    "clip_id": pa.array([], pa.string()),
                    "chunk_id": pa.array([], pa.string()),
                    "start_smp": pa.array([], pa.int64()),
                    "end_smp": pa.array([], pa.int64()),
                    "audio_sig": pa.array(
                        [], pa.list_(pa.uint64(), cfg.audio_num_perm)
                    ),
                }
            )
        buf = np.frombuffer(payload.buffers()[2], dtype=np.uint8)
        off_buf = np.frombuffer(payload.buffers()[1], dtype=np.int32)
        val_off = off_buf[payload.offset: payload.offset + len(payload) + 1].astype(
            np.int64
        )
        byte_start = val_off[:-1][row] + 2 * start
        byte_len = 2 * (end - start)
        values, out_off = _repack_chunk_bytes(
            buf, row, byte_start, byte_len, contiguous=(hop_ms == window_ms)
        )
        sig = byte_oph_signatures_flat(
            values, out_off, cfg.audio_num_perm, cfg.audio_ngram, cfg.seed
        )
        clip = ids.take(pa.array(row, pa.int64()))
        chunk_id = pc.binary_join_element_wise(
            clip, pc.cast(pa.array(kk, pa.int64()), pa.string()), "#"
        )
        return pa.table(
            {
                "clip_id": clip,
                "chunk_id": chunk_id,
                "start_smp": pa.array(start, pa.int64()),
                "end_smp": pa.array(end, pa.int64()),
                "audio_sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sig.reshape(-1), pa.uint64()), cfg.audio_num_perm
                ),
            }
        )

    sigs = clips.map_batches(
        chunk_sigs, batch_format="pyarrow", batch_size=cfg.batch_size or None
    ).materialize()

    band_rows = sigs.map_batches(
        lambda b: pa.table(
            {"clip_id": b.column("chunk_id"), "audio_sig": b.column("audio_sig")}
        ),
        batch_format="pyarrow",
    ).map_batches(
        make_audio_band_fn(
            cfg.audio_bands, cfg.audio_rows_per_band, cfg.audio_num_perm,
            min_filled=cfg.audio_min_filled,
        ),
        batch_format="pyarrow",
    )
    pairs = candidate_pairs(band_rows, cfg, num_partitions=np_parts).materialize()

    def side(suffix: str):
        def pack(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "chunk_id": batch.column("chunk_id"),
                    f"as_{suffix}": _pack_u64_column(batch.column("audio_sig")),
                }
            )

        return sigs.map_batches(pack, batch_format="pyarrow")

    with_a = pairs.join(
        side("a"), join_type="inner", on=("clip_id_a",), right_on=("chunk_id",),
        num_partitions=np_parts,
    )
    with_ab = strip_empty_blocks(with_a).join(
        side("b"), join_type="inner", on=("clip_id_b",), right_on=("chunk_id",),
        num_partitions=np_parts,
    )

    min_filled = cfg.audio_min_filled
    split_pat = "^(?P<clip>.*)#(?P<idx>[0-9]+)$"

    def verify(batch: pa.Table) -> pa.Table:
        fa, _ = _unpack_u64_column(batch.column("as_a"))
        fb, _ = _unpack_u64_column(batch.column("as_b"))
        sim = audio_similarity(
            fa.reshape(-1, k), fb.reshape(-1, k), min_filled=min_filled
        )
        keep = pa.array(sim >= tau)
        ca = pc.extract_regex(batch.column("clip_id_a"), split_pat)
        cb = pc.extract_regex(batch.column("clip_id_b"), split_pat)
        t = pa.table(
            {
                "clip_a": pc.struct_field(ca, "clip"),
                "ka": pc.cast(pc.struct_field(ca, "idx"), pa.int64()),
                "clip_b": pc.struct_field(cb, "clip"),
                "kb": pc.cast(pc.struct_field(cb, "idx"), pa.int64()),
            }
        ).filter(keep)
        # drop same-clip chunk matches, canonicalize clip order
        t = t.filter(pc.not_equal(t.column("clip_a"), t.column("clip_b")))
        swap = pc.greater(t.column("clip_a"), t.column("clip_b")).to_numpy(
            zero_copy_only=False
        )
        sw = pa.array(swap)
        return pa.table(
            {
                "clip_id_a": pc.if_else(sw, t.column("clip_b"), t.column("clip_a")),
                "ka": pc.if_else(sw, t.column("kb"), t.column("ka")),
                "clip_id_b": pc.if_else(sw, t.column("clip_a"), t.column("clip_b")),
                "kb": pc.if_else(sw, t.column("ka"), t.column("kb")),
            }
        )

    matches = with_ab.map_batches(verify, batch_format="pyarrow", batch_size=8192)
    return sigs, matches


def audio_containment_pairs(
    clips,
    cfg=None,
    window_ms: int = 250,
    hop_ms: int = 250,
    tau: float | None = None,
    containment_pct: int = 60,
    num_partitions: int = 8,
):
    """Partial-overlap (containment) audio near-dup pairs: (clip_id_a,
    clip_id_b, n_matched_a, n_chunks_a, n_matched_b, n_chunks_b) where at
    least ``containment_pct`` percent of ONE side's chunks near-match a
    chunk of the other — the trims / excerpts / concatenations that
    whole-clip fingerprints structurally miss (a clip embedded in a 2x
    longer one shares only ~half its grams, far below ``audio_tau``).

    How: the shared chunk-LSH front half (:func:`_chunk_matches` — chunk
    geometry, per-chunk byte-OPH sketches, the unchanged band / salted
    bucket / join-attach verify machinery under composite clip#chunk
    ids), then matched chunk pairs fold to clip pairs: DISTINCT matched
    chunks per side over a pair-key hash partition, two slim joins attach
    per-clip chunk totals, and the directional gate is exact integer
    cross-multiplication.  Nothing is driver-resident; every stage is the
    flagship's scale shape."""
    from minhash_ray.config import PipelineConfig
    from minhash_ray.util import clamp_partitions, fold_by_str_key, strip_empty_blocks

    cfg = cfg or PipelineConfig()
    tau = cfg.audio_tau if tau is None else tau
    np_parts = clamp_partitions(num_partitions)

    sigs, matches = _chunk_matches(clips, cfg, window_ms, hop_ms, tau, np_parts)

    # per-clip chunk totals (slim fold: chunk counts, never payloads)
    def cnt_partial(batch: pa.Table) -> pa.Table:
        agg = (
            batch.select(["clip_id"])
            .group_by("clip_id")
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "clip_id": agg.column("clip_id"),
                "n_chunks": pc.cast(agg.column("count_all"), pa.int64()),
            }
        )

    def cnt_final(t: pa.Table) -> pa.Table:
        agg = t.group_by("clip_id").aggregate([("n_chunks", "sum")])
        return pa.table(
            {
                "clip_id": agg.column("clip_id"),
                "n_chunks": pc.cast(agg.column("n_chunks_sum"), pa.int64()),
            }
        )

    chunk_counts = fold_by_str_key(sigs, "clip_id", cnt_partial, cnt_final, np_parts)

    # fold matched chunk pairs -> per-pair DISTINCT matched chunks per side.
    # pair co-location only needs ONE side's key: hashing clip_id_a puts
    # every (a, *) pair in one partition, where the (a, b) group is whole.
    def pair_partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(
            ["clip_id_a", "clip_id_b", "ka", "kb"]
        ).aggregate([])

    def pair_final(t: pa.Table) -> pa.Table:
        da = (
            t.select(["clip_id_a", "clip_id_b", "ka"])
            .group_by(["clip_id_a", "clip_id_b", "ka"]).aggregate([])
            .group_by(["clip_id_a", "clip_id_b"]).aggregate([([], "count_all")])
        )
        db = (
            t.select(["clip_id_a", "clip_id_b", "kb"])
            .group_by(["clip_id_a", "clip_id_b", "kb"]).aggregate([])
            .group_by(["clip_id_a", "clip_id_b"]).aggregate([([], "count_all")])
        )
        j = da.join(
            db, keys=["clip_id_a", "clip_id_b"], join_type="inner",
            right_suffix="_b",
        )
        return pa.table(
            {
                "clip_id_a": j.column("clip_id_a"),
                "clip_id_b": j.column("clip_id_b"),
                "n_matched_a": pc.cast(j.column("count_all"), pa.int64()),
                "n_matched_b": pc.cast(j.column("count_all_b"), pa.int64()),
            }
        )

    pair_stats = fold_by_str_key(
        matches, "clip_id_a", pair_partial, pair_final, np_parts
    )

    with_na = strip_empty_blocks(pair_stats).join(
        chunk_counts, join_type="inner", on=("clip_id_a",), right_on=("clip_id",),
        num_partitions=np_parts,
    )

    def rename_na(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            ["n_chunks_a" if c == "n_chunks" else c for c in b.column_names]
        )

    with_nab = strip_empty_blocks(with_na.map_batches(rename_na, batch_format="pyarrow")).join(
        chunk_counts, join_type="inner", on=("clip_id_b",), right_on=("clip_id",),
        num_partitions=np_parts,
    )

    pct = int(containment_pct)

    def gate(b: pa.Table) -> pa.Table:
        ma = b.column("n_matched_a").to_numpy()
        mb = b.column("n_matched_b").to_numpy()
        na = b.column("n_chunks_a").to_numpy()
        nb = b.column("n_chunks").to_numpy()
        keep = (100 * ma >= pct * na) | (100 * mb >= pct * nb)
        t = b.filter(pa.array(keep))
        return pa.table(
            {
                "clip_id_a": t.column("clip_id_a"),
                "clip_id_b": t.column("clip_id_b"),
                "n_matched_a": t.column("n_matched_a"),
                "n_chunks_a": t.column("n_chunks_a"),
                "n_matched_b": t.column("n_matched_b"),
                "n_chunks_b": t.column("n_chunks"),
            }
        )

    return with_nab.map_batches(gate, batch_format="pyarrow")


def audio_dup_regions(
    clips,
    cfg=None,
    window_ms: int = 250,
    hop_ms: int = 250,
    tau: float | None = None,
    num_partitions: int = 8,
):
    """(clip_id, other_clip_id, start_smp, end_smp): the duplicated SAMPLE
    RANGES of every clip — matched chunks merged into maximal contiguous
    spans, per counterpart clip.  Where :func:`audio_containment_pairs`
    answers "are these clips partial dups", this answers "WHICH samples
    are duplicated" — the surgical-excision form (cf. the text side's
    ``repeated_ngram_scrub``: remove the repeated region, keep the rest).

    Scale shape: the shared chunk-LSH front half, then matched chunk
    pairs become directional (clip, chunk, other) rows, one slim join
    attaches each chunk's exact (start_smp, end_smp) from the signature
    table, and a clip-hash partition fold lexsorts each (clip, other)
    group and merges overlapping/adjacent intervals with a vectorized
    running-max pass.  Output rows = merged spans; nothing driver-
    resident."""
    from minhash_ray.config import PipelineConfig
    from minhash_ray.util import clamp_partitions, fold_by_str_key, strip_empty_blocks

    cfg = cfg or PipelineConfig()
    tau = cfg.audio_tau if tau is None else tau
    np_parts = clamp_partitions(num_partitions)

    sigs, matches = _chunk_matches(clips, cfg, window_ms, hop_ms, tau, np_parts)

    def directional(batch: pa.Table) -> pa.Table:
        a = pa.table(
            {
                "clip_id": batch.column("clip_id_a"),
                "k": batch.column("ka"),
                "other_clip_id": batch.column("clip_id_b"),
            }
        )
        b = pa.table(
            {
                "clip_id": batch.column("clip_id_b"),
                "k": batch.column("kb"),
                "other_clip_id": batch.column("clip_id_a"),
            }
        )
        both = pa.concat_tables([a, b]).combine_chunks()
        both = both.append_column(
            "chunk_id",
            pc.binary_join_element_wise(
                both.column("clip_id"), pc.cast(both.column("k"), pa.string()), "#"
            ),
        )
        return both.group_by(
            ["clip_id", "other_clip_id", "chunk_id"]
        ).aggregate([])

    spans_in = strip_empty_blocks(
        matches.map_batches(directional, batch_format="pyarrow")
    ).join(
        sigs.map_batches(
            lambda b: b.select(["chunk_id", "start_smp", "end_smp"]),
            batch_format="pyarrow",
        ),
        join_type="inner",
        on=("chunk_id",),
        num_partitions=np_parts,
    )

    def span_partial(batch: pa.Table) -> pa.Table:
        return batch.select(
            ["clip_id", "other_clip_id", "start_smp", "end_smp"]
        )

    def span_final(t: pa.Table) -> pa.Table:
        clip = t.column("clip_id")
        if isinstance(clip, pa.ChunkedArray):
            clip = clip.combine_chunks()
        other = t.column("other_clip_id")
        if isinstance(other, pa.ChunkedArray):
            other = other.combine_chunks()
        ge = clip.dictionary_encode()
        oe = other.dictionary_encode()
        gc = np.asarray(ge.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
        oc = np.asarray(oe.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
        s = t.column("start_smp").to_numpy()
        e = t.column("end_smp").to_numpy()
        o = np.lexsort((s, oc, gc))
        gc_s, oc_s, s_s, e_s = gc[o], oc[o], s[o], e[o]
        n = len(o)
        new_grp = np.ones(n, dtype=bool)
        if n > 1:
            new_grp[1:] = (gc_s[1:] != gc_s[:-1]) | (oc_s[1:] != oc_s[:-1])
        # merge overlapping/adjacent intervals: a new span starts where
        # the group changes or start > previous end.  All intervals in a
        # group come from ONE clip's chunk grid (constant window, tail
        # clamped to the payload end), so sorted by start their ends are
        # non-decreasing and the previous end IS the running max.
        new_span = new_grp.copy()
        if n > 1:
            new_span[1:] |= s_s[1:] > e_s[:-1]
        span_id = np.cumsum(new_span) - 1
        m = int(span_id[-1]) + 1
        span_start = s_s[new_span]
        span_end = np.zeros(m, dtype=np.int64)
        np.maximum.at(span_end, span_id, e_s)
        first_idx = np.flatnonzero(new_span)
        return pa.table(
            {
                "clip_id": ge.dictionary.take(pa.array(gc_s[first_idx], pa.int64())),
                "other_clip_id": oe.dictionary.take(
                    pa.array(oc_s[first_idx], pa.int64())
                ),
                "start_smp": pa.array(span_start, pa.int64()),
                "end_smp": pa.array(span_end, pa.int64()),
            }
        )

    return fold_by_str_key(spans_in, "clip_id", span_partial, span_final, np_parts)


def audio_phash_pairs(
    clips,
    max_hamming: int = 3,
    n_frames: int = 64,
    num_partitions: int = 8,
):
    """Perceptual-hash near-duplicate audio pairs: (clip_id_a, clip_id_b,
    hamming) for clip pairs whose 64-bit energy-delta fingerprints
    (Haitsma & Kalker 2002 sign-of-energy-delta coding,
    functions/audio.energy_delta_fingerprint_i16) differ in at most
    ``max_hamming`` bits.  Complements :func:`audio_dup_pairs` (byte-OPH
    MinHash): the byte sketch finds re-uploads sharing raw byte runs,
    the perceptual hash finds re-encoded / re-gained copies whose bytes
    all changed but whose coarse energy envelope survived — it is exactly
    gain-invariant, so a volume-normalized copy matches at Hamming 0.

    EXACT recall within the radius: pigeonhole chunk banding (any pair
    with ≤ d of 64 bits differing agrees on ≥ 1 of d+1 bit-chunks —
    stages/banding.make_simhash_band_fn, the SimHash machinery reused
    verbatim on the audio channel), then an exact Hamming verification.
    Radius vs corpus size (the multi-index Hamming bound): each of the
    d+1 chunks carries ~64/(d+1) bits, and CHANCE chunk collisions stay
    sub-quadratic only while that exceeds log2(n) — so d=3 (16-bit
    chunks) is safe to ~10^4-10^5 distinct fingerprints and the default;
    wider radii on large corpora need a wider fingerprint (concatenate
    per-segment fingerprints), not more chunks of a 64-bit one (measured:
    d=6 at 30k clips spends 10x the wall time on chance candidates).

    Scale shape: the fingerprint stage is a task-pool pass over the
    payload (one int16 view + cache-chunked energy accumulation per clip,
    payload dropped at the stage boundary — 8 B/clip leaves the stage);
    candidates ride the production band-shuffle with its global distinct;
    verification attaches each side's fingerprint by two slim partitioned
    ``Dataset.join``\\ s (the join-attach pattern, never a corpus
    broadcast).  Undecodable codecs (stub boundary) and clips shorter
    than ``n_frames + 1`` samples never band: their fingerprints are not
    meaningful and an all-zero default would cross-link unrelated clips.
    Identical digital silence *does* pair (all-delta-zero fingerprints
    match) — that is the perceptual semantics, and the exact-byte tier
    upstream already collapses those in the production pipelines."""
    from minhash_ray.config import PipelineConfig
    from minhash_ray.functions.audio import energy_delta_fingerprint_i16
    from minhash_ray.functions.simhash import hamming_distance
    from minhash_ray.stages.banding import make_simhash_band_fn
    from minhash_ray.stages.candidates import candidate_pairs
    from minhash_ray.util import binary_flat_offsets, clamp_partitions, strip_empty_blocks

    np_parts = clamp_partitions(num_partitions)

    def fingerprint(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        bcol = batch.column("bytes")
        if isinstance(bcol, pa.ChunkedArray):
            bcol = bcol.combine_chunks()
        p_flat, p_offs = binary_flat_offsets(bcol)
        codecs = batch.column("codec").to_pylist()
        fp = np.zeros(n, dtype=np.uint64)
        valid = np.zeros(n, dtype=np.int64)
        i2 = np.dtype("<i2")
        for i in range(n):
            if codecs[i] != "pcm_s16le":       # honest stub boundary
                continue
            o0, o1 = int(p_offs[i]), int(p_offs[i + 1])
            usable = (o1 - o0) - ((o1 - o0) % 2)
            seg = p_flat[o0 : o0 + usable]
            if o0 % 2:                          # int16 view needs alignment
                seg = seg.copy()
            w16 = seg.view(i2)
            if len(w16) < n_frames + 1:
                continue
            fp[i] = energy_delta_fingerprint_i16(w16, n_frames)
            valid[i] = 1
        return pa.table(
            {
                "clip_id": batch.column("clip_id"),
                "simhash": pa.array(fp, pa.uint64()),
                "n_shingles": pa.array(valid, pa.int64()),  # band gate
            }
        )

    fps = clips.select_columns(["clip_id", "bytes", "codec"]).map_batches(
        fingerprint, batch_format="pyarrow"
    ).materialize()                              # 8 B/clip, reused 3×

    band_rows = fps.map_batches(
        make_simhash_band_fn(max_hamming + 1), batch_format="pyarrow"
    )
    exact_cfg = PipelineConfig().with_(salt_hot_bands=False, band_group_cap=1_000_000_000)
    pairs = candidate_pairs(band_rows, exact_cfg, num_partitions=np_parts)

    def side(suffix: str):
        def pack(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "clip_id": batch.column("clip_id"),
                    f"fp_{suffix}": batch.column("simhash"),
                }
            )

        return fps.map_batches(pack, batch_format="pyarrow")

    with_a = strip_empty_blocks(pairs).join(
        side("a"), join_type="inner", on=("clip_id_a",), right_on=("clip_id",),
        num_partitions=np_parts,
    )
    with_ab = strip_empty_blocks(with_a).join(
        side("b"), join_type="inner", on=("clip_id_b",), right_on=("clip_id",),
        num_partitions=np_parts,
    )

    def ham_gate(batch: pa.Table) -> pa.Table:
        fa = np.ascontiguousarray(batch.column("fp_a").to_numpy(), dtype=np.uint64)
        fb = np.ascontiguousarray(batch.column("fp_b").to_numpy(), dtype=np.uint64)
        d = hamming_distance(fa, fb).astype(np.int64)
        keep = d <= max_hamming
        sel = pa.array(np.flatnonzero(keep))
        return pa.table(
            {
                "clip_id_a": pc.take(batch.column("clip_id_a"), sel),
                "clip_id_b": pc.take(batch.column("clip_id_b"), sel),
                "hamming": pa.array(d[keep], pa.int64()),
            }
        )

    return with_ab.map_batches(ham_gate, batch_format="pyarrow")


def audio_trim_plan(clips, silence_abs: int = 512):
    """(clip_id, n_samples, trim_start_smp, trim_end_smp, decode_ok):
    leading/trailing-silence trim points per clip — the standard audio
    preprocessing step before chunking/packing.  A sample is silent when
    ``|s| <= silence_abs`` (int16 domain); ``[trim_start_smp,
    trim_end_smp)`` is the span from the first to the last loud sample
    (empty span, ``trim_start_smp == trim_end_smp == 0``, for all-silent
    or undecodable clips — ``decode_ok`` distinguishes the two).  A plan,
    not a rewrite: at 100 TB the cut is applied by the downstream
    chunk/pack stage reading these offsets, never by rewriting payloads
    twice.

    Scale shape: one batch pass — the payload rides as a zero-copy int16
    view; loud positions come from ONE ``flatnonzero`` over the batch's
    flat sample buffer and per-clip first/last via two ``searchsorted``
    probes against the clip offsets (no per-sample Python, no per-clip
    scan).  Odd-length payloads ignore the dangling byte (the
    ``audio_energy_stats`` convention); non-pcm codecs are the honest
    stub boundary."""
    from minhash_ray.util import binary_flat_offsets

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        bcol = batch.column("bytes")
        if isinstance(bcol, pa.ChunkedArray):
            bcol = bcol.combine_chunks()
        p_flat, p_offs = binary_flat_offsets(bcol)
        codecs = batch.column("codec").to_pylist()
        ok = np.array([c == "pcm_s16le" for c in codecs], dtype=bool)

        # even-aligned int16 view of the whole batch buffer; per-clip
        # sample offsets derived from the byte offsets
        smp_count = np.maximum((p_offs[1:] - p_offs[:-1]) // 2, 0)
        usable = len(p_flat) - (len(p_flat) % 2)
        w16 = p_flat[:usable].view(np.dtype("<i2"))
        # clip starts at byte p_offs[i]; if odd, its samples are NOT
        # aligned in the shared view — fall back per clip (rare: parquet
        # binary values are packed back-to-back, odd payloads shift
        # successors).  Detect once per batch.
        aligned = (p_offs[:-1] % 2 == 0).all()

        t_start = np.zeros(n, dtype=np.int64)
        t_end = np.zeros(n, dtype=np.int64)
        if aligned and usable:
            loud = np.flatnonzero(np.abs(w16) > silence_abs)
            if len(loud):
                seg_lo = p_offs[:-1] // 2
                seg_hi = seg_lo + smp_count
                first = np.searchsorted(loud, seg_lo, side="left")
                last = np.searchsorted(loud, seg_hi, side="left") - 1
                has = (first < len(loud)) & (last >= 0) & (last >= first)
                has &= ok & (smp_count > 0)
                fi = np.where(has, loud[np.minimum(first, len(loud) - 1)] - seg_lo, 0)
                la = np.where(has, loud[np.maximum(last, 0)] - seg_lo + 1, 0)
                t_start = np.where(has, fi, 0).astype(np.int64)
                t_end = np.where(has, la, 0).astype(np.int64)
        else:
            for i in range(n):
                if not ok[i]:
                    continue
                o0, o1 = int(p_offs[i]), int(p_offs[i + 1])
                seg = p_flat[o0 : o1 - ((o1 - o0) % 2)]
                if o0 % 2:
                    seg = seg.copy()
                s16 = seg.view(np.dtype("<i2"))
                loud_i = np.flatnonzero(np.abs(s16) > silence_abs)
                if len(loud_i):
                    t_start[i] = int(loud_i[0])
                    t_end[i] = int(loud_i[-1]) + 1
        return pa.table(
            {
                "clip_id": batch.column("clip_id"),
                "n_samples": pa.array(smp_count.astype(np.int64), pa.int64()),
                "trim_start_smp": pa.array(t_start, pa.int64()),
                "trim_end_smp": pa.array(t_end, pa.int64()),
                "decode_ok": pa.array(ok, pa.bool_()),
            }
        )

    return clips.select_columns(["clip_id", "bytes", "codec"]).map_batches(
        fn, batch_format="pyarrow"
    )


class AudioClipEmbedding:
    """Actor-pool stage: decode → per-frame log-band energies (the same
    math as the ``AudioFrameFeatures`` kernel, vectorized across the
    whole batch) → temporal mean+std pool → unit-norm 2*n_bands-dim (default 64) clip
    embedding.

    Vectorization shape: decode stays per-row (the codec stub is
    inherently per-payload, one cheap ``frombuffer`` each), but every
    frame in the batch is stacked into ONE (n_frames, frame_len) matrix
    per sample-rate group — a single batched ``rfft`` replaces 16 small
    Python-loop FFTs per clip (the loop form measured minutes at 30k
    clips; this form seconds) — band energies are two ``add.reduceat``
    passes (bands within frames, frames within clips) and the mean/std
    pool is the sum/sumsq reduceat pair.  Waves are RMS-normalized BEFORE
    the log1p band kernel so gain-shifted copies embed identically
    (log1p energies are not scale-invariant).

    Emits (vec_id, clip_id, embedding): ``vec_id`` is the splitmix64 FNV
    hash of the clip id viewed as int64 — the integer key the generic
    embedding-LSH machinery shuffles on (collision odds n^2/2^64; a
    collision can only merge two clips into one vec and is detected by
    the planted-recall pytest).  Non-decodable codecs are DROPPED here:
    this feeds a dedup candidate stage, not an audit pass —
    ``audio_frame_features`` / ``resample_stub`` are the poison-row
    surfaces."""

    def __init__(self, frame_ms: int = 250, max_frames: int = 8, n_bands: int = 32):
        self.frame_ms = frame_ms
        self.max_frames = max_frames
        # 32 geomspace bands (vs AudioFrameFeatures' coarse 8): ~18%-wide
        # log bins, enough frequency resolution that two UNRELATED tone
        # mixes rarely share a band pattern — with 8 bands the synthetic
        # corpus collapsed to 47 LSH buckets / 1.45e9 join rows at 30k
        # clips; at 32 bands random-pair cosine drops below the LSH knee
        self.n_bands = n_bands
        self._edges_cache: dict = {}

    def _edges(self, frame_len: int) -> np.ndarray:
        e = self._edges_cache.get(frame_len)
        if e is None:
            n_spec = frame_len // 2 + 1
            e = np.unique(
                np.geomspace(
                    max(2, n_spec // 256), max(3, n_spec - 1), self.n_bands + 1
                ).astype(np.int64)
            )
            # pathological frame lengths (sr_hz <= 23 Hz -> n_spec <= 3)
            # produce edges past the spectrum: clamp so reduceat stays in
            # bounds — a row whose every band vanishes drops via the
            # zero-norm mask, the same poison-row contract as decode
            e = e[e < n_spec]
            self._edges_cache[frame_len] = e
        return e

    def __call__(self, batch: pa.Table) -> pa.Table:
        from minhash_ray.functions.audio import UnsupportedCodecError, decode_pcm
        from minhash_ray.functions.hashing import hash_str_array
        from minhash_ray.stages.banding import splitmix64

        ids: list = []
        waves: list = []
        rates: list = []
        for cid, payload, codec, sr in zip(
            batch.column("clip_id").to_pylist(),
            batch.column("bytes").to_pylist(),
            batch.column("codec").to_pylist(),
            batch.column("sr_hz").to_pylist(),
        ):
            try:
                wave = decode_pcm(payload or b"", codec)
            except UnsupportedCodecError:
                continue
            if len(wave) == 0:
                continue
            rms = float(np.sqrt((wave * wave).mean()))
            if rms == 0.0:
                continue
            sr_i = int(sr) if sr else 16000
            if sr_i <= 0:                    # malformed metadata: poison row
                continue
            ids.append(cid)
            waves.append(wave / rms)
            rates.append(sr_i)

        out_ids: list = []
        out_vecs: list = []
        rates_np = np.asarray(rates, dtype=np.int64)
        for sr in np.unique(rates_np):
            frame_len = max(1, int(sr) * self.frame_ms // 1000)
            sel = np.flatnonzero(rates_np == sr)
            nf = np.array(
                [
                    min(self.max_frames, max(1, len(waves[i]) // frame_len))
                    for i in sel
                ],
                dtype=np.int64,
            )
            # stack every frame of every clip: one memcpy per clip, one
            # batched rfft for the whole group
            mats = []
            for i, k in zip(sel, nf):
                w = waves[i]
                used = int(k) * frame_len
                if len(w) < used:                 # single short frame
                    pad = np.zeros(frame_len, dtype=np.float64)
                    pad[: len(w)] = w
                    mats.append(pad[None, :])
                else:
                    mats.append(w[:used].reshape(int(k), frame_len))
            frames = np.vstack(mats)
            spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
            edges = self._edges(frame_len)
            nb = max(0, min(self.n_bands, len(edges) - 1))
            bands = np.zeros((len(frames), self.n_bands), dtype=np.float64)
            if nb > 0:
                bands[:, :nb] = np.log1p(
                    np.add.reduceat(spec, edges[: nb + 1], axis=1)[:, :nb]
                )
            # pool frames per clip: sum + sumsq reduceat at clip starts
            starts = np.concatenate(([0], np.cumsum(nf)[:-1]))
            ssum = np.add.reduceat(bands, starts, axis=0)
            ssq = np.add.reduceat(bands * bands, starts, axis=0)
            mean = ssum / nf[:, None]
            var = np.maximum(ssq / nf[:, None] - mean * mean, 0.0)
            v = np.concatenate([mean, np.sqrt(var)], axis=1)
            norms = np.linalg.norm(v, axis=1)
            keep = norms > 0
            v = v[keep] / norms[keep, None]
            for j, i in enumerate(sel[keep]):
                out_ids.append(ids[i])
                out_vecs.append(v[j])

        vid = (
            splitmix64(hash_str_array(out_ids, 0)).view(np.int64)
            if out_ids
            else np.empty(0, dtype=np.int64)
        )
        flat = (
            np.concatenate(out_vecs) if out_vecs else np.empty(0, dtype=np.float64)
        )
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(flat, pa.float64()), 2 * self.n_bands
        )
        return pa.table(
            {
                "vec_id": pa.array(vid, pa.int64()),
                "clip_id": pa.array(out_ids, pa.string()),
                "embedding": emb,
            }
        )


def audio_embedding_dup_pairs(
    clips,
    threshold: float = 0.99,
    frame_ms: int = 250,
    max_frames: int = 8,
    n_planes: int = 64,
    n_chunks: int = 4,
    seed: int = 42,
    num_partitions: int = 8,
    concurrency: int = 4,
):
    """(clip_id_a, clip_id_b, cos): SemDeDup-for-audio — near-duplicate
    clips by cosine of pooled spectral embeddings, found with the SAME
    hyperplane-LSH + exact-verify machinery as the embeddings table
    (``ann.embedding_dup_pairs`` with ``embs=`` override), then clip ids
    re-attached by two slim partitioned joins on the int64 vec key.

    This is the multimodal composition a production curation stack runs
    next to byte/sketch dedup: embeddings catch re-encoded / gain-shifted
    copies the byte channels miss, and the LSH path is the 10^12-clip
    scale answer (never all-pairs).  Rows-only op (FFT is not
    SQL-expressible); recall on planted duplicate audio is
    pytest-asserted."""
    from minhash_ray.pipelines.ann import embedding_dup_pairs
    from minhash_ray.util import (
        clamp_concurrency,
        clamp_partitions,
        strip_empty_blocks,
    )

    np_parts = clamp_partitions(num_partitions)
    emb = clips.map_batches(
        AudioClipEmbedding,
        fn_constructor_kwargs={"frame_ms": frame_ms, "max_frames": max_frames},
        batch_format="pyarrow",
        batch_size=64,
        # never let the actor pool hold every CPU: the downstream join
        # aggregators need slots to schedule (4-CPU test session deadlock)
        concurrency=clamp_concurrency(concurrency),
    ).materialize()

    if emb.count() == 0:
        # no decodable clips: typed empty result (take(1)/concat on an
        # empty embeddings table would throw downstream)
        import ray.data as rd

        return rd.from_arrow(pa.table(
            {
                "clip_id_a": pa.array([], pa.string()),
                "clip_id_b": pa.array([], pa.string()),
                "cos": pa.array([], pa.float64()),
            }
        ))

    pairs = embedding_dup_pairs(
        "",                                   # unused with embs=
        threshold=threshold,
        n_planes=n_planes,
        n_chunks=n_chunks,
        seed=seed,
        num_partitions=num_partitions,
        embs=emb.select_columns(["vec_id", "embedding"]),
    )

    names = emb.select_columns(["vec_id", "clip_id"])

    def side(suffix: str):
        return names.map_batches(
            lambda b, s=suffix: pa.table(
                {"vec_id": b.column("vec_id"), f"clip_id_{s}": b.column("clip_id")}
            ),
            batch_format="pyarrow",
        )

    with_a = strip_empty_blocks(pairs).join(
        side("a"), join_type="inner", on=("vec_id_a",), right_on=("vec_id",),
        num_partitions=np_parts,
    )
    with_ab = strip_empty_blocks(with_a).join(
        side("b"), join_type="inner", on=("vec_id_b",), right_on=("vec_id",),
        num_partitions=np_parts,
    )

    def finish(batch: pa.Table) -> pa.Table:
        a = batch.column("clip_id_a").to_numpy(zero_copy_only=False)
        b = batch.column("clip_id_b").to_numpy(zero_copy_only=False)
        swap = a > b                       # vec-hash order != clip-id order
        lo = np.where(swap, b, a)
        hi = np.where(swap, a, b)
        return pa.table(
            {
                "clip_id_a": pa.array(lo, pa.string()),
                "clip_id_b": pa.array(hi, pa.string()),
                "cos": batch.column("cos"),
            }
        )

    return with_ab.map_batches(finish, batch_format="pyarrow")


def audio_semantic_dedup(
    clips,
    threshold: float = 0.99,
    n_centroids: int = 16,
    frame_ms: int = 250,
    max_frames: int = 8,
    seed: int = 42,
    num_partitions: int = 8,
    concurrency: int = 4,
):
    """(clip_id, cluster_id_clip, keep): SemDeDup applied to audio —
    pooled spectral clip embeddings through ``ann.semantic_dedup``'s
    IVF-cell + within-cell-components machinery (``embs=`` override),
    keep-one-per-component, clip ids re-attached by slim joins.

    This is the DENSE-corpus shape: on a corpus whose embeddings cluster
    heavily (synthetic tone families here; screenshot/boilerplate audio
    in production), emitting all near-dup PAIRS is inherently quadratic —
    measured 1.45e9 LSH-join rows at 30k clips with the coarse 8-band
    features.  Cell-partitioned components never materialize pairs: the
    per-cell gram matmul happens inside one map task and only
    assignments (corpus-width) leave it.  Use
    :func:`audio_embedding_dup_pairs` when the pair list itself is the
    product and dup density is bounded."""
    from minhash_ray.pipelines.ann import semantic_dedup
    from minhash_ray.util import (
        clamp_concurrency,
        clamp_partitions,
        strip_empty_blocks,
    )

    np_parts = clamp_partitions(num_partitions)
    emb = clips.map_batches(
        AudioClipEmbedding,
        fn_constructor_kwargs={"frame_ms": frame_ms, "max_frames": max_frames},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=clamp_concurrency(concurrency),
    ).materialize()

    if emb.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table(
            {
                "clip_id": pa.array([], pa.string()),
                "cluster_id_clip": pa.array([], pa.string()),
                "keep": pa.array([], pa.int64()),
            }
        ))

    assign = semantic_dedup(
        "", n_centroids=n_centroids, threshold=threshold, seed=seed,
        embs=emb.select_columns(["vec_id", "embedding"]),
    )

    names = emb.select_columns(["vec_id", "clip_id"])
    with_name = strip_empty_blocks(assign).join(
        names, join_type="inner", on=("vec_id",), num_partitions=np_parts
    )
    cluster_names = names.map_batches(
        lambda b: pa.table(
            {"cluster_id": b.column("vec_id"), "cluster_id_clip": b.column("clip_id")}
        ),
        batch_format="pyarrow",
    )
    out = strip_empty_blocks(with_name).join(
        cluster_names, join_type="inner", on=("cluster_id",), num_partitions=np_parts
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "clip_id": batch.column("clip_id"),
                "cluster_id_clip": batch.column("cluster_id_clip"),
                "keep": batch.column("keep"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")

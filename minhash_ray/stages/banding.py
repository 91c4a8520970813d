"""Stage B — LSH banding: signatures → (bucket, clip_id) band rows.

The signature of k = B*R slots is split into B bands of R rows; each band's
R values are folded into one 64-bit bucket key (polynomial combine + a
splitmix64 finalizer, namespaced by band id).  Two clips collide in a band
bucket iff their R band slots are all equal — the standard MinHash-LSH
construction (Broder 1997; Leskovec/Rajaraman/Ullman, "Mining of Massive
Datasets" ch.3).  The reference provides only the sketch primitive; banding
is engine-new (SURVEY.md §2.6).

Zero-shingle rows (all-INFTY signatures, reference INFTY semantics
src/configuration/configuration.c:143-148) are **excluded** here so empty
transcripts never band-match each other; they are covered by the exact
content-hash channel instead.

An optional SimHash chunk channel (4 × 16-bit chunks — pigeonhole: any two
fingerprints within Hamming distance 3 share a chunk) emits extra band rows
in a separate bucket namespace.  NOTE: at extreme corpus sizes 16-bit
chunks saturate (expected bucket size n/2^16); the channel is config-gated
and intended as a recall booster at ≤10^8 rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from minhash_ray.functions.simhash import simhash_bands

U64 = np.uint64

# bucket keys are int64 (top bit masked off): Ray's hash aggregates and
# joins normalize integer keys to int64, and a uint64 >= 2^63 would be
# silently reinterpreted — 63 bits of splitmix64 output is collision-safe
BAND_SCHEMA = pa.schema([("bucket", pa.int64()), ("clip_id", pa.string())])

_MINHASH_NS = U64(0x9E3779B97F4A7C15)
_SIMHASH_NS = U64(0xC2B2AE3D27D4EB4F)
_AUDIO_NS = U64(0xD6E8FEB86659FD93)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain, Vigna 2015)."""
    x = x + U64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> U64(30))) * U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> U64(27))) * U64(0x94D049BB133111EB)
    return x ^ (x >> U64(31))


def band_buckets(sigs: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """(n, k) signatures → (n, B) int64 bucket keys (63-bit)."""
    n = sigs.shape[0]
    grouped = sigs.reshape(n, bands, rows_per_band)
    P = U64(0x100000001B3)
    h = np.full((n, bands), _MINHASH_NS, dtype=np.uint64)
    # fold the band id in so identical row-values in different bands differ
    h = h + np.arange(bands, dtype=np.uint64)[None, :]
    for r in range(rows_per_band):
        h = h * P + grouped[:, :, r]
    return (splitmix64(h) >> U64(1)).astype(np.int64)


def make_minhash_band_fn(bands: int, rows_per_band: int, num_perm: int):
    """flat-map batches of signatures → band rows, skipping zero-shingle rows."""

    def explode(batch: pa.Table) -> pa.Table:
        from minhash_ray.stages.signature import signature_matrix

        n_shingles = batch.column("n_shingles").to_numpy()
        keep = n_shingles > 0
        sigs = signature_matrix(batch, num_perm)[keep]
        clip_ids = batch.column("clip_id").filter(pa.array(keep))
        buckets = band_buckets(sigs, bands, rows_per_band)          # (m, B)
        m = sigs.shape[0]
        out_ids = pa.concat_arrays(
            [clip_ids.combine_chunks() if isinstance(clip_ids, pa.ChunkedArray) else clip_ids]
            * bands
        ) if m else pa.array([], pa.string())
        # column-major flatten so clip ids repeat per band cheaply
        out_buckets = buckets.T.reshape(-1) if m else np.empty(0, dtype=np.int64)
        return pa.table(
            {"bucket": pa.array(out_buckets, pa.int64()), "clip_id": out_ids},
            schema=BAND_SCHEMA,
        )

    return explode


def make_audio_band_fn(
    bands: int, rows_per_band: int, audio_num_perm: int, min_filled: int = 0
):
    """Byte-level audio MinHash LSH channel (separate bucket namespace).

    Empty-sketch hygiene (same spirit as the transcript channel's
    zero-shingle exclusion): rows with fewer than ``min_filled`` non-INFTY
    OPH slots emit no audio band rows (short payloads fill few slots and
    would band-collide on shared emptiness), and any individual band row
    whose R-slot window is entirely INFTY is dropped — two sketches must
    agree on at least one *filled* slot to meet in a bucket."""

    def explode(batch: pa.Table) -> pa.Table:
        INF = np.uint64(2**64 - 1)
        col = batch.column("audio_sig")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sigs = col.flatten().to_numpy(zero_copy_only=False).reshape(-1, audio_num_perm)
        filled = (sigs != INF).sum(axis=1)
        keep = filled >= max(min_filled, 1)
        sigs = np.ascontiguousarray(sigs[keep], dtype=np.uint64)
        clip_ids = batch.column("clip_id").filter(pa.array(keep))
        m = sigs.shape[0]
        if m == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "clip_id": pa.array([], pa.string())},
                schema=BAND_SCHEMA,
            )
        grouped = sigs.reshape(m, bands, rows_per_band)
        P = U64(0x100000001B3)
        h = np.full((m, bands), _AUDIO_NS, dtype=np.uint64)
        h = h + np.arange(bands, dtype=np.uint64)[None, :]
        for r in range(rows_per_band):
            h = h * P + grouped[:, :, r]
        buckets = (splitmix64(h) >> U64(1)).astype(np.int64)
        window_ok = ~(grouped == INF).all(axis=2)          # (m, bands)
        out_ids = pa.concat_arrays(
            [clip_ids.combine_chunks() if isinstance(clip_ids, pa.ChunkedArray) else clip_ids]
            * bands
        )
        # column-major flatten matches buckets.T layout below
        flat_ok = window_ok.T.reshape(-1)
        out_buckets = buckets.T.reshape(-1)[flat_ok]
        out_ids = out_ids.filter(pa.array(flat_ok))
        return pa.table(
            {"bucket": pa.array(out_buckets, pa.int64()), "clip_id": out_ids},
            schema=BAND_SCHEMA,
        )

    return explode


def make_fused_band_fn(cfg, n_rows: int | None = None):
    """ALL enabled band channels (minhash + simhash chunks + audio OPH) in
    ONE flat-map over the signature blocks — the r4 form ran three
    map_batches pipelines unioned, so every signature block (with its wide
    shingle/signature columns) was scheduled and scanned three times; one
    fused pass emits the identical multiset of band rows with a third of
    the task launches and block reads (VERDICT r5 item 7).

    ``n_rows`` (when the caller knows the corpus size) gates the simhash
    chunk channel by its SATURATION bound: 16-bit chunks collide randomly
    at expected bucket size n/2^16, so accidental pairs grow ~n²/2^15 —
    measured at 1M clips the channel emitted ~27M of the 33.8M candidate
    pairs (7-8 s of candidates+verify) while moving recall by 1e-4 (the
    32-band minhash channel already catches near-exact pairs).  Above
    ``cfg.simhash_channel_max_rows`` the booster is dropped; None keeps
    the configured behavior (fixture-scale callers)."""
    use_simhash = cfg.use_simhash_channel and (
        n_rows is None or n_rows <= cfg.simhash_channel_max_rows
    )
    fns = [make_minhash_band_fn(cfg.bands, cfg.rows_per_band, cfg.num_perm)]
    if use_simhash:
        fns.append(make_simhash_band_fn(cfg.simhash_max_hamming + 1))
    if cfg.use_audio_channel:
        fns.append(
            make_audio_band_fn(
                cfg.audio_bands, cfg.audio_rows_per_band, cfg.audio_num_perm,
                min_filled=cfg.audio_min_filled,
            )
        )

    def explode(batch: pa.Table) -> pa.Table:
        return pa.concat_tables([fn(batch) for fn in fns]).combine_chunks()

    return explode


def make_simhash_band_fn(n_chunks: int = 4):
    """flat-map batches of signatures → simhash-chunk band rows."""

    def explode(batch: pa.Table) -> pa.Table:
        n_shingles = batch.column("n_shingles").to_numpy()
        keep = n_shingles > 0
        sims = batch.column("simhash").to_numpy()[keep]
        clip_ids = batch.column("clip_id").filter(pa.array(keep))
        m = len(sims)
        chunks = simhash_bands(np.ascontiguousarray(sims, dtype=np.uint64), n_chunks)
        h = _SIMHASH_NS + np.arange(n_chunks, dtype=np.uint64)[None, :]
        buckets = (splitmix64(h * U64(0x100000001B3) + chunks) >> U64(1)).astype(np.int64)
        out_ids = pa.concat_arrays(
            [clip_ids.combine_chunks() if isinstance(clip_ids, pa.ChunkedArray) else clip_ids]
            * n_chunks
        ) if m else pa.array([], pa.string())
        out_buckets = buckets.T.reshape(-1) if m else np.empty(0, dtype=np.int64)
        return pa.table(
            {"bucket": pa.array(out_buckets, pa.int64()), "clip_id": out_ids},
            schema=BAND_SCHEMA,
        )

    return explode

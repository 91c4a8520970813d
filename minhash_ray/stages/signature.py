"""Stage S — MinHash + SimHash signatures.

A **stateful stage**: the hash-coefficient tables are built once per worker
(the Ray re-expression of the reference's shared ``hash_functions`` array,
src/configuration/configuration.c:97-140 — the reference shares one table
across sketches in memory, we rebuild an identical table from the config
seed in every worker), and every batch is a vectorized numpy fold
(reference ``basic_insert`` min-update semantics, src/utils/utils.c:3-33,
collapsed to one segmented min per row).

Two execution forms, same kernel:

- ``make_signature_fn(cfg)`` (default in ``run_dedup``): a plain function
  for a TASK-pool ``map_batches`` with the stage state cached per worker
  process.  Ray Data fuses adjacent task operators, so the parquet read
  and the signature pass run in the SAME task — the (wide) payload column
  never crosses the object store, and no CPUs are pinned idle while the
  scan catches up.  The state here is small (coefficient tables, ~KBs),
  so per-worker rebuild-once costs microseconds; fusion is worth far more.
- ``ValidateSignatureStage`` as a callable class for an ACTOR-pool
  ``map_batches(..., concurrency=N)`` (``cfg.signature_concurrency > 0``):
  the right form when stage state is too heavy to build per worker (a
  model, a big index) — kept wired and tested as the template for such
  stages, but measured SLOWER here: a fixed actor pool reserves CPUs that
  then starve the upstream read tasks feeding it (129 s vs ~25 s for the
  same 10.9 GB corpus at 16 CPUs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from minhash_ray.config import PipelineConfig
from minhash_ray.functions.hashing import HashTables
from minhash_ray.functions.minhash import signatures_from_shingles
from minhash_ray.functions.shingles import shingles_for_config
from minhash_ray.functions.simhash import simhash_from_shingles


def full_signatures_schema(num_perm: int, audio_num_perm: int) -> pa.Schema:
    """Combined validate+signature stage output: sketches plus the
    validate-stage columns (transcript kept for invariant checks and
    checkpoint completeness — it never enters a shuffle; band rows are
    projected before the wide stages)."""
    return pa.schema(
        [
            ("clip_id", pa.string()),
            ("transcript", pa.string()),
            ("signature", pa.list_(pa.uint64(), num_perm)),
            ("simhash", pa.uint64()),
            ("audio_fp", pa.uint64()),
            ("audio_sig", pa.list_(pa.uint64(), audio_num_perm)),
            ("content_hash", pa.string()),
            ("n_shingles", pa.int64()),
            ("n_samples", pa.int64()),
            ("decode_ok", pa.bool_()),
            # sorted-unique shingle set per row (variable length): computed
            # once here in parallel, consumed by exact verification
            ("shingles", pa.list_(pa.uint64())),
        ]
    )


class ValidateSignatureStage:
    """Stage V+S fused: one actor-pool pass over the raw clips batch does
    validation, content hashing, audio fingerprints AND the sketch
    construction — one traversal of the (wide) payload column, one stage of
    orchestration instead of two, and the payload is dropped at the same
    boundary.  The hash-coefficient tables are actor state
    (reference hash_functions sharing, src/configuration/configuration.c:97-140).
    """

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.tables = HashTables.from_config(cfg)
        self.schema = full_signatures_schema(cfg.num_perm, cfg.audio_num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from minhash_ray.functions.audio import (
            UnsupportedCodecError,
            byte_oph_signatures_flat,
            decode_pcm,
            energy_delta_fingerprint,
            energy_delta_fingerprint_i16,
        )
        from minhash_ray.util import (
            DIGEST_PARAMS,
            binary_flat_offsets,
            string_flat_offsets,
            wordpoly_digest_rows_multi,
        )

        cfg = self.cfg
        n = batch.num_rows
        bcol = batch.column("bytes")
        if isinstance(bcol, pa.ChunkedArray):
            bcol = bcol.combine_chunks()
        p_flat, p_offs = binary_flat_offsets(bcol)     # zero-copy payload view
        codecs = batch.column("codec").to_pylist()
        texts_col = batch.column("transcript")
        if isinstance(texts_col, pa.ChunkedArray):
            texts_col = texts_col.combine_chunks()

        # OPH byte sketches for the whole batch straight off the Arrow
        # buffer — the payload is never copied into python objects
        audio_sig = byte_oph_signatures_flat(
            p_flat, p_offs, cfg.audio_num_perm, cfg.audio_ngram, cfg.seed
        )

        # content hash: 128-bit word-polynomial digest of (transcript,
        # payload) — two independent 64-bit channels (minhash_ray/util.py),
        # each folding the length-tagged word digests of both parts:
        # h = (seed·M + d_t)·M + d_p.  Replaces a per-row md5 that streamed
        # every payload byte through a ~0.6 GB/s serial hash (~3.7x).
        t_flat, t_offs = string_flat_offsets(texts_col)
        mults = [m for _, m in DIGEST_PARAMS]
        # both channels in ONE pass over the (wide) payload — the scratch
        # chunk is cache-hot for the second multiplier
        dts = wordpoly_digest_rows_multi(t_flat, t_offs, mults)
        dps = wordpoly_digest_rows_multi(p_flat, p_offs, mults)
        chans = []
        with np.errstate(over="ignore"):
            for (seed_c, mult), dt, dp in zip(DIGEST_PARAMS, dts, dps):
                M = np.uint64(mult)
                chans.append((np.uint64(seed_c) * M + dt) * M + dp)
        content_hash = [f"{a:016x}{b:016x}" for a, b in zip(chans[0], chans[1])]

        audio_fp = np.zeros(n, dtype=np.uint64)
        n_samples = np.zeros(n, dtype=np.int64)
        decode_ok = np.zeros(n, dtype=bool)
        i2 = np.dtype("<i2")
        for i in range(n):
            o0, o1 = int(p_offs[i]), int(p_offs[i + 1])
            if codecs[i] == "pcm_s16le":
                # zero-copy int16 fast path (no float widening)
                usable = (o1 - o0) - ((o1 - o0) % 2)
                seg = p_flat[o0 : o0 + usable]
                if o0 % 2:                 # int16 view needs 2-byte alignment
                    seg = seg.copy()
                w16 = seg.view(i2)
                n_samples[i] = len(w16)
                audio_fp[i] = energy_delta_fingerprint_i16(w16, cfg.audio_fp_frames)
                decode_ok[i] = True
            else:
                # decoder registry (built-in G.711 µ-law/A-law; external
                # libs when importable) — energy-delta fingerprints are
                # companding-robust, so a µ-law copy of a pcm clip lands
                # on the same audio_fp; unregistered codecs stay typed
                # poison rows (decode_ok = False)
                try:
                    wave = decode_pcm(
                        p_flat[o0:o1].tobytes(), codecs[i]
                    )
                except UnsupportedCodecError:
                    continue
                n_samples[i] = len(wave)
                audio_fp[i] = energy_delta_fingerprint(wave, cfg.audio_fp_frames)
                decode_ok[i] = True

        shingles, counts = shingles_for_config(texts_col, cfg)
        # SimHash votes over the shingle MULTISET (oracle parity)...
        simhash = simhash_from_shingles(shingles, counts)
        # ...while MinHash is duplicate-invariant (min-fold idempotence,
        # reference src/utils/utils.c:3-33): dedupe per row first — less
        # hashing, and the sorted-unique sets feed exact verification
        row_ids = np.repeat(np.arange(n, dtype=np.int64), counts)
        o = np.lexsort((shingles, row_ids))
        rs, ss = row_ids[o], shingles[o]
        uniq = np.ones(len(rs), dtype=bool)
        if len(rs) > 1:
            uniq[1:] = (rs[1:] != rs[:-1]) | (ss[1:] != ss[:-1])
        rs_u, ss_u = rs[uniq], ss[uniq]
        ucounts = np.bincount(rs_u, minlength=n).astype(np.int64)
        sigs = signatures_from_shingles(ss_u, ucounts, self.tables)
        shingle_col = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(ucounts)]), pa.int32()),
            pa.array(ss_u, pa.uint64()),
        )

        return pa.table(
            {
                "clip_id": batch.column("clip_id"),
                "transcript": texts_col,
                "signature": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1), pa.uint64()), cfg.num_perm
                ),
                "simhash": pa.array(simhash, pa.uint64()),
                "audio_fp": pa.array(audio_fp, pa.uint64()),
                "audio_sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(audio_sig.reshape(-1), pa.uint64()), cfg.audio_num_perm
                ),
                "content_hash": pa.array(content_hash, pa.string()),
                "n_shingles": pa.array(counts.astype(np.int64), pa.int64()),
                "n_samples": pa.array(n_samples, pa.int64()),
                "decode_ok": pa.array(decode_ok, pa.bool_()),
                "shingles": shingle_col,
            },
            schema=self.schema,
        )


def signature_matrix(table: pa.Table, num_perm: int) -> np.ndarray:
    """(n, k) uint64 view of a signatures column (zero-copy when possible)."""
    col = table.column("signature")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    return flat.to_numpy(zero_copy_only=False).reshape(-1, num_perm)


# per-worker-process stage cache for the task-pool form: Ray reuses worker
# processes across map tasks, so the coefficient tables are built once per
# worker (actor-`__init__` amortization) while the operator itself stays a
# fusable task pool
_STAGE_CACHE: dict = {}


def make_signature_fn(cfg: PipelineConfig):
    """Task-pool form of the fused validate+signature stage (see module
    docstring): a plain batch function whose ``ValidateSignatureStage``
    state is cached per worker process keyed by the (frozen, hashable)
    config."""

    def signature_fn(batch: pa.Table) -> pa.Table:
        stage = _STAGE_CACHE.get(cfg)
        if stage is None:
            stage = ValidateSignatureStage(cfg)
            _STAGE_CACHE[cfg] = stage
        return stage(batch)

    return signature_fn

"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported — nothing
here (or in the library) calls ``ray.init`` / ``ray.shutdown``.

* ``entry()`` — flagship near-dup pipeline over a clips table synthesized
  deterministically from /root/testdata/sf0.001 documents text (the
  clips-shaped input mandated by BASELINE.json.input_hint does not exist in
  the testdata, so it is derived from it; see minhash_ray/sources/synth.py).
* ``queries()`` — one callable per implemented operator/pipeline
  (SURVEY.md §2 + the training-data ops), each taking ``sf_dir``.
* ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query
  (identical column names/types; integer cents instead of float sums so the
  value-hash compare is bit-stable).  Sketch/LSH/clip pipelines are
  non-SQL-expressible → rows-only checks.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"

# The driver runs oracle_sql() against the sf0.01 tables.  Two oracles
# (embedding LSH, IVF top-k) embed DATA-DERIVED literals (hyperplane dim,
# k-means centroids, probe cells) computed deterministically from this
# directory with the same seeded numpy procedures the engine uses — an
# independent SQL replay of bucketing/assignment/scoring, parameterized by
# the same index constants.  Point GRAFT_ORACLE_SF_DIR elsewhere to
# oracle-check another scale (tests set it to sf0.001).
ORACLE_SF_DIR = lambda: os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")  # noqa: E731


def _clips_ds(sf_dir: str):
    from minhash_ray.sources.clips import read_clips
    from minhash_ray.sources.synth import clips_dir_for

    d = clips_dir_for(sf_dir)
    return read_clips(os.path.join(d, "clips.parquet")), d


def entry() -> Any:
    """Flagship pipeline on sf0.001-derived clips; returns assignments."""
    from minhash_ray.config import PipelineConfig
    from minhash_ray.pipelines.dedup import run_dedup

    clips, _ = _clips_ds(SF0001)
    cfg = PipelineConfig()
    res = run_dedup(clips, cfg, num_partitions=8)
    return res.assignments


# ---------------------------------------------------------------------------


def _clips_dedup(sf_dir: str):
    from minhash_ray.config import PipelineConfig
    from minhash_ray.pipelines.dedup import run_dedup

    clips, _ = _clips_ds(sf_dir)
    return run_dedup(clips, PipelineConfig(), num_partitions=8)


def clips_dedup_assignments(sf_dir: str):
    return _clips_dedup(sf_dir).assignments


def clips_dedup_edges(sf_dir: str):
    return _clips_dedup(sf_dir).edges


def clips_dedup_keep_best(sf_dir: str):
    """(clip_id, cluster_id, keep_first, keep_best) — both canonical-rep
    policies over the flagship clusters (largest-payload member wins
    keep_best, tie min clip_id); rows-only, planted-policy
    pytest-asserted."""
    from minhash_ray.pipelines.dedup import keep_best_assignments

    clips, _ = _clips_ds(sf_dir)
    return keep_best_assignments(_clips_dedup(sf_dir).assignments, clips)


def clips_modality_agreement(sf_dir: str):
    """(clip_id_a, clip_id_b, text_dup, audio_dup, modality) — cross-modal
    classification of every verified dup edge (re-record vs re-transcribe
    vs true re-upload); rows-only, planted-kind accuracy is
    pytest-asserted."""
    from minhash_ray.pipelines.dedup import modality_agreement

    return modality_agreement(_clips_dedup(sf_dir).edges)


def clips_pair_snr(sf_dir: str):
    """(clip_id_a, clip_id_b, channel, snr_db, snr_ok) — the north-rule
    per-row invariant (decoded-PCM SNR of every verified dup edge, gate
    at 30 dB) as a relation; rows-only (binary payloads), gate semantics
    pytest-asserted against the fixture's planted truth kinds."""
    from minhash_ray.pipelines.audio import pair_snr

    clips, _ = _clips_ds(sf_dir)
    return pair_snr(clips, _clips_dedup(sf_dir).edges)


def clips_dedup_tiered(sf_dir: str):
    """(clip_id, cluster_id, keep, tier) — tiered flagship: exact content
    tier → LSH over exact representatives → components (rows-only: sketch/
    LSH semantics; partition-equality with run_dedup is pytest-asserted)."""
    from minhash_ray.pipelines.dedup import run_dedup_tiered

    clips, _ = _clips_ds(sf_dir)
    from minhash_ray.config import PipelineConfig

    return run_dedup_tiered(clips, PipelineConfig(), num_partitions=8)


def clips_signatures(sf_dir: str):
    """clip_id, simhash+audio_fp (as int64), n_shingles — the signature
    stage output in SQL-friendly dtypes (full list<u64> signatures are
    exercised in pytest; rows-only here)."""
    import numpy as np
    import pyarrow as pa

    res = _clips_dedup(sf_dir)

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "clip_id": batch.column("clip_id"),
                "simhash": pa.array(
                    np.ascontiguousarray(batch.column("simhash").to_numpy()).view(np.int64),
                    pa.int64(),
                ),
                "audio_fp": pa.array(
                    np.ascontiguousarray(batch.column("audio_fp").to_numpy()).view(np.int64),
                    pa.int64(),
                ),
                "n_shingles": batch.column("n_shingles"),
            }
        )

    return res.signatures.map_batches(slim, batch_format="pyarrow")


def clips_minhash_slots(sf_dir: str, n_perms: int = 8):
    """(clip_id, perm, slot): the FLAGSHIP's text-channel sketch exploded
    long-form for the first ``n_perms`` permutations — the same end-to-end
    HUGEINT DuckDB replay that checks ``doc_minhash_slots``
    (``_minhash_slots_sql``) pointed at the synthesized clips corpus, so
    the flagship's sketch chain (tokenize → FNV-1a → w-gram poly →
    pairwise min-fold, reference src/utils/utils.c:3-33 +
    src/utils/hash.c:6-9) is SQL-oracle-checked, not just pytest-checked.
    Slots are int64-reinterpreted (INFTY → -1)."""
    import numpy as np
    import pyarrow as pa

    from minhash_ray.config import PipelineConfig

    num_perm = PipelineConfig().num_perm
    res = _clips_dedup(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        col = batch.column("signature")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = col.flatten().to_numpy(zero_copy_only=False).reshape(-1, num_perm)
        sub = np.ascontiguousarray(mat[:, :n_perms]).view(np.int64)
        ids = batch.column("clip_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n = batch.num_rows
        idx = np.repeat(np.arange(n, dtype=np.int64), n_perms)
        return pa.table(
            {
                "clip_id": ids.take(pa.array(idx)),
                "perm": pa.array(np.tile(np.arange(n_perms, dtype=np.int64), n), pa.int64()),
                "slot": pa.array(sub.reshape(-1), pa.int64()),
            }
        )

    return res.signatures.map_batches(explode, batch_format="pyarrow")


def _clips_minhash_slots_sql() -> str:
    """Oracle for ``clips_minhash_slots``: retarget the doc slots chain at
    the deterministic synthesized clips parquet (``clips_dir_for`` is
    seed-keyed and synthesizes on miss without Ray, so the path exists by
    the time DuckDB runs)."""
    from minhash_ray.sources.synth import clips_dir_for

    path = os.path.join(clips_dir_for(ORACLE_SF_DIR()), "clips.parquet")
    return _minhash_slots_sql(
        source=f"read_parquet('{path}')", id_col="clip_id", text_col="transcript"
    )


def _clips_parquet_path() -> str:
    from minhash_ray.sources.synth import clips_dir_for

    return os.path.join(clips_dir_for(ORACLE_SF_DIR()), "clips.parquet")


def _audio_stats_sql() -> str:
    path = _clips_parquet_path()
    return (
        "SELECT codec, CAST(sr_hz AS BIGINT) AS sr_hz, count(*) AS n_clips, "
        "CAST(sum(octet_length(bytes)) AS BIGINT) AS total_bytes, "
        "CAST(sum(dur_ms) AS BIGINT) AS total_dur_ms, "
        "CAST(min(dur_ms) AS BIGINT) AS min_dur_ms, "
        "CAST(max(dur_ms) AS BIGINT) AS max_dur_ms "
        f"FROM read_parquet('{path}') GROUP BY codec, sr_hz"
    )


def _audio_exact_dedup_sql() -> str:
    path = _clips_parquet_path()
    return (
        "SELECT clip_id, "
        "min(clip_id) OVER (PARTITION BY bytes) AS rep_clip_id, "
        "count(*) OVER (PARTITION BY bytes) AS group_size "
        f"FROM read_parquet('{path}')"
    )


def audio_chunk_plan(sf_dir: str):
    """Fixed-duration chunk boundaries (samples) for every clip, derived
    from the pcm_s16le payload length (pipelines/multimodal.py)."""
    from minhash_ray.pipelines.multimodal import audio_chunk_plan as fn
    from minhash_ray.sources.clips import read_clips
    from minhash_ray.sources.synth import clips_dir_for

    d = clips_dir_for(sf_dir)
    clips = read_clips(
        os.path.join(d, "clips.parquet"), columns=["clip_id", "sr_hz", "bytes"]
    )
    return fn(clips)


def _audio_chunk_plan_sql(window_ms: int = 250, hop_ms: int = 250) -> str:
    path = _clips_parquet_path()
    return (
        "WITH c AS (SELECT clip_id, "
        "CAST(octet_length(bytes) // 2 AS BIGINT) AS n_smp, "
        f"CAST(greatest(({window_ms} * sr_hz) // 1000, 1) AS BIGINT) AS win, "
        f"CAST(greatest(({hop_ms} * sr_hz) // 1000, 1) AS BIGINT) AS hop "
        f"FROM read_parquet('{path}')) "
        ", ks AS (SELECT unnest(generate_series(0, "
        "(SELECT max((n_smp + hop - 1) // hop) FROM c) - 1)) AS k) "
        "SELECT clip_id, CAST(k AS BIGINT) AS chunk_idx, "
        "CAST(k * hop AS BIGINT) AS start_smp, "
        "CAST(least(k * hop + win, n_smp) AS BIGINT) AS end_smp "
        "FROM c JOIN ks ON ks.k < (c.n_smp + c.hop - 1) // c.hop"
    )


def audio_frame_features(sf_dir: str):
    from minhash_ray.pipelines.multimodal import audio_frame_features as affn

    clips, _ = _clips_ds(sf_dir)
    return affn(clips.limit(200))


def audio_resample(sf_dir: str):
    """Rate-normalize a clip sample to 16 kHz (multimodal plumbing op);
    returns clip_id, sr_hz, n_bytes."""
    import pyarrow as pa

    from minhash_ray.pipelines.multimodal import resample_stub

    clips, _ = _clips_ds(sf_dir)
    out = resample_stub(clips.limit(100), 16000)

    def slim(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "clip_id": batch.column("clip_id"),
                "sr_hz": batch.column("sr_hz"),
                "n_bytes": pc.binary_length(batch.column("bytes")),
            }
        )

    return out.map_batches(slim, batch_format="pyarrow")


def audio_stats(sf_dir: str):
    """Per-(codec, sr_hz) storage/duration aggregate over the audio
    payloads (pipelines/audio.py)."""
    from minhash_ray.pipelines.audio import audio_stats as fn
    from minhash_ray.sources.clips import read_clips
    from minhash_ray.sources.synth import clips_dir_for

    d = clips_dir_for(sf_dir)
    clips = read_clips(
        os.path.join(d, "clips.parquet"),
        columns=["codec", "sr_hz", "dur_ms", "bytes"],
    )
    return fn(clips)


def audio_energy_stats(sf_dir: str):
    """Per-clip decoded-sample QC stats (exact integers: energy, peak,
    clipping/silence counts) over the synthesized clips corpus
    (pipelines/audio.audio_energy_stats).  Rows-only: SQL cannot decode
    PCM16 payloads; exactness is covered by the planted-waveform and
    fixture numpy-mirror pytests."""
    from minhash_ray.pipelines.audio import audio_energy_stats as fn
    from minhash_ray.sources.clips import read_clips
    from minhash_ray.sources.synth import clips_dir_for

    d = clips_dir_for(sf_dir)
    clips = read_clips(
        os.path.join(d, "clips.parquet"),
        columns=["clip_id", "bytes", "codec"],
    )
    return fn(clips)


def clips_rate_outliers(sf_dir: str):
    """Speaking-rate QC flags over the synthesized clips corpus
    (pipelines/audio.transcript_rate_flags) — integer-exact gates."""
    from minhash_ray.pipelines.audio import transcript_rate_flags
    from minhash_ray.sources.clips import read_clips
    from minhash_ray.sources.synth import clips_dir_for

    d = clips_dir_for(sf_dir)
    clips = read_clips(
        os.path.join(d, "clips.parquet"),
        columns=["clip_id", "transcript", "dur_ms"],
    )
    return transcript_rate_flags(clips)


def _rate_outliers_sql(min_tps: int = 10, max_tps: int = 100) -> str:
    path = _clips_parquet_path()
    n_tokens = (
        "CASE WHEN trim(transcript) = '' THEN 0 "
        "ELSE CAST(len(regexp_split_to_array(trim(transcript), '\\s+')) AS BIGINT) END"
    )
    return (
        f"WITH c AS (SELECT clip_id, {n_tokens} AS n_tokens, "
        f"CAST(dur_ms AS BIGINT) AS dur_ms FROM read_parquet('{path}')) "
        "SELECT clip_id, n_tokens, dur_ms, "
        f"CAST(CASE WHEN n_tokens * 1000 > {max_tps} * dur_ms THEN 1 "
        f"WHEN n_tokens * 1000 < {min_tps} * dur_ms THEN -1 "
        "ELSE 0 END AS BIGINT) AS rate_flag FROM c"
    )


def audio_semantic_dedup_q(sf_dir: str):
    """(clip_id, cluster_id_clip, keep) — SemDeDup-for-audio: pooled
    spectral embeddings through the IVF-cell components machinery
    (rows-only: FFT features; planted recall is pytest-asserted)."""
    from minhash_ray.pipelines.audio import audio_semantic_dedup

    clips, _ = _clips_ds(sf_dir)
    return audio_semantic_dedup(clips)


def audio_embedding_dup_pairs_q(sf_dir: str):
    """(clip_id_a, clip_id_b, cos) — SemDeDup-for-audio: pooled spectral
    embeddings through the generic hyperplane-LSH dedup (rows-only: FFT
    features; planted recall is pytest-asserted)."""
    from minhash_ray.pipelines.audio import audio_embedding_dup_pairs

    clips, _ = _clips_ds(sf_dir)
    return audio_embedding_dup_pairs(clips)


def audio_dup_pairs_q(sf_dir: str):
    """(clip_id_a, clip_id_b, audio_sim) — audio-channel-only near-dup
    pairs over the synthesized clips corpus (rows-only: OPH sketch
    estimator; recall vs planted truth is pytest-asserted)."""
    from minhash_ray.pipelines.audio import audio_dup_pairs

    clips, _ = _clips_ds(sf_dir)
    return audio_dup_pairs(clips)


def audio_trim_plan_q(sf_dir: str):
    """(clip_id, n_samples, trim_start_smp, trim_end_smp, decode_ok) —
    leading/trailing-silence trim points per clip (rows-only: binary
    payload; planted silence shapes are pytest-asserted)."""
    from minhash_ray.pipelines.audio import audio_trim_plan

    clips, _ = _clips_ds(sf_dir)
    return audio_trim_plan(clips)


def audio_phash_pairs_q(sf_dir: str):
    """(clip_id_a, clip_id_b, hamming) — perceptual-hash near-dup audio
    pairs: 64-bit energy-delta fingerprints (Haitsma-Kalker sign coding)
    within Hamming ≤ 6, exact-recall pigeonhole banding + Hamming verify
    (rows-only: binary payload; gain-invariance, planted-dup recovery and
    radius exactness are pytest-asserted)."""
    from minhash_ray.pipelines.audio import audio_phash_pairs

    clips, _ = _clips_ds(sf_dir)
    return audio_phash_pairs(clips)


def audio_containment_pairs_q(sf_dir: str):
    """(clip_id_a, clip_id_b, n_matched_a, n_chunks_a, n_matched_b,
    n_chunks_b) — chunk-level partial-overlap (containment) audio pairs
    (rows-only: OPH/LSH estimator; planted half-clip containment is
    pytest-asserted)."""
    from minhash_ray.pipelines.audio import audio_containment_pairs

    clips, _ = _clips_ds(sf_dir)
    return audio_containment_pairs(clips)


def audio_dup_regions_q(sf_dir: str):
    """(clip_id, other_clip_id, start_smp, end_smp) — merged duplicated
    sample spans per counterpart clip (rows-only: LSH/OPH; exact planted
    spans are pytest-asserted)."""
    from minhash_ray.pipelines.audio import audio_dup_regions

    clips, _ = _clips_ds(sf_dir)
    return audio_dup_regions(clips)


def audio_exact_dedup(sf_dir: str):
    """Exact byte-identical audio dedup: (clip_id, rep_clip_id,
    group_size) — the audio exact tier (pipelines/audio.py)."""
    from minhash_ray.pipelines.audio import audio_exact_dedup as fn
    from minhash_ray.sources.clips import read_clips
    from minhash_ray.sources.synth import clips_dir_for

    d = clips_dir_for(sf_dir)
    clips = read_clips(
        os.path.join(d, "clips.parquet"), columns=["clip_id", "bytes"]
    )
    return fn(clips)


def substring_pairs(sf_dir: str, broadcast_max_rows: int = 2_000_000):
    """Longest-common-substring ratio for MinHash candidate doc pairs
    (suffix-automaton channel).  The per-pair LCS — inherently a per-pair
    kernel — runs distributed in ``map_batches`` over the pair list.

    Text attachment auto-switches like every other verifier: corpora up to
    ``broadcast_max_rows`` docs broadcast the texts ONCE as a sorted-id
    numpy pack (zero-copy plasma views per worker); beyond it the two
    transcripts ride to each pair through two partitioned hash joins —
    nothing driver-resident (proven identical in
    ``test_substring_join_attach_path_matches_broadcast``)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray
    import ray.data as rd

    from minhash_ray.pipelines.dedup_text import minhash_dup_pairs
    from minhash_ray.util import clamp_partitions

    pairs = rd.from_arrow(minhash_dup_pairs(sf_dir))
    doc_path = os.path.join(sf_dir, "documents.parquet")

    n_docs = pq.ParquetFile(doc_path).metadata.num_rows
    if n_docs > broadcast_max_rows:
        # scale path: attach each side's text via partitioned hash joins
        docs = rd.read_parquet(doc_path, columns=["doc_id", "text"])

        def side(suffix: str):
            return docs.map_batches(
                lambda b, s=suffix: pa.table(
                    {"doc_id": b.column("doc_id"), f"text_{s}": b.column("text")}
                ),
                batch_format="pyarrow",
            )

        np_parts = clamp_partitions(8)
        with_a = pairs.join(
            side("a"), join_type="inner", on=("doc_id_a",), right_on=("doc_id",),
            num_partitions=np_parts,
        )
        with_ab = with_a.join(
            side("b"), join_type="inner", on=("doc_id_b",), right_on=("doc_id",),
            num_partitions=np_parts,
        )

        def add_lcs_join(batch: pa.Table) -> pa.Table:
            from minhash_ray.functions.substring import lcs_ratio

            ratios = [
                lcs_ratio(x or "", y or "")
                for x, y in zip(
                    batch.column("text_a").to_pylist(),
                    batch.column("text_b").to_pylist(),
                )
            ]
            return pa.table(
                {
                    "doc_id_a": batch.column("doc_id_a"),
                    "doc_id_b": batch.column("doc_id_b"),
                    "sim": batch.column("sim"),
                    "lcs_ratio": pa.array(ratios, pa.float64()),
                }
            )

        return with_ab.map_batches(add_lcs_join, batch_format="pyarrow")

    t = pq.read_table(doc_path, columns=["doc_id", "text"])
    ids = np.asarray(t.column("doc_id").to_numpy(), dtype=np.int64)
    order = np.argsort(ids)
    pack_ref = [ray.put({
        "ids": ids[order],
        "texts": np.array(t.column("text").to_pylist(), dtype=object)[order],
    })]

    def add_lcs(batch: pa.Table) -> pa.Table:
        from minhash_ray.functions.substring import lcs_ratio
        from minhash_ray.util import cached_get

        pack = cached_get(pack_ref[0])
        idx_a = np.searchsorted(pack["ids"], batch.column("doc_id_a").to_numpy())
        idx_b = np.searchsorted(pack["ids"], batch.column("doc_id_b").to_numpy())
        ratios = [
            lcs_ratio(pack["texts"][i] or "", pack["texts"][j] or "")
            for i, j in zip(idx_a, idx_b)
        ]
        return batch.append_column("lcs_ratio", pa.array(ratios, pa.float64()))

    return pairs.map_batches(add_lcs, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    from minhash_ray.pipelines import (
        ann,
        curation,
        dedup_text,
        events,
        relational,
        spans,
        text,
    )

    return {
        # --- text analysis (SQL-checked) ---
        "token_counts": text.token_counts,
        # exact distributed quantiles via (value, count) partial histograms
        # — no global sort; SQL-checked against a row_number join
        "token_quantiles": text.token_quantiles,
        # BPE-ish regex token counting (RE2 pattern, identical engine on
        # both sides) — SQL-checked
        "bpe_token_counts": text.bpe_token_counts,
        # grouped exact order statistics (per-lang histogram fold)
        "lang_token_quantiles": text.lang_token_quantiles,
        # tf-idf-shaped salient-term extraction (two-pass composite:
        # vocabulary df aggregate -> broadcast -> per-doc segmented top-k)
        "salient_terms": text.salient_terms,
        "text_quality": text.text_quality,
        # exact global percentile-rank annotate (adaptive-cutoff primitive:
        # two slim passes + a histogram exchange, no global row sort)
        "token_percent_rank": text.token_percent_rank,
        # deterministic splitmix64 train/val/test assignment (SQL-checked)
        "assign_splits": text.assign_splits,
        # token-budget sequence packing via a distributed ordered prefix
        # scan (range-partition on hash top bits + offset fold, no global
        # row sort) — SQL-checked against a window running sum
        "pack_sequences": text.pack_sequences,
        # deterministic global pseudo-shuffle rank (training order) —
        # SQL-checked against row_number over the splitmix64 order
        "global_shuffle_order": text.global_shuffle_order,
        "doc_fingerprints": text.doc_fingerprints,
        "lang_stats": text.lang_stats,
        # --- dedup over documents ---
        "exact_dedup_docs": dedup_text.exact_dedup,          # SQL-checked
        "simhash_fingerprints": dedup_text.simhash_fingerprints,   # SQL-checked
        # exact-recall SimHash near-dup pairs (pigeonhole chunk banding +
        # Hamming verify) — SQL-checked against an O(n²) bit_count oracle
        "simhash_dup_pairs": dedup_text.simhash_dup_pairs,
        # the full LSH pipeline, oracle-checked: sketch + banding +
        # candidate join + estimator gate replayed in DuckDB
        "minhash_dup_pairs": dedup_text.minhash_dup_pairs,
        # b-bit MinHash (Li-König): low-8-bit slots through the SAME LSH
        # machinery, collision-corrected gate + unbiased estimate —
        # SQL-checked end-to-end via the masked sims chain
        "bbit_minhash_pairs": dedup_text.bbit_minhash_pairs,
        # one-permutation-hashing sketch (Li-Owen-Zhang): one hash per
        # gram, min per bin — SQL-checked via the gram chain + emulated
        # splitmix64 + min-per-bin replay
        "oph_minhash_slots": dedup_text.oph_minhash_slots,
        # densified OPH (Shrivastava-Li rotation): empty bins borrow the
        # nearest occupied cyclic-right bin — SQL-checked incl. the
        # borrow distance itself
        "oph_dense_slots": dedup_text.oph_dense_slots,
        # END-TO-END OPH near-dup pipeline (dense bins through the
        # production LSH band/verify machinery) — SQL-checked
        "oph_dup_pairs": dedup_text.oph_dup_pairs,
        # exact prefix-filtered similarity self-join — SQL-checked
        "ngram_jaccard_pairs": dedup_text.ngram_jaccard_pairs,
        # exact weighted (multiset) Jaccard via occurrence-indexed tokens
        "weighted_jaccard_pairs": dedup_text.weighted_jaccard_pairs,
        # exact DIRECTED containment |A∩B|/|A| (subset/quote detector):
        # probe-prefix × full-index join, SQL-checked
        "containment_pairs": dedup_text.containment_pairs,
        # cross-corpus fuzzy dedup vs a reference subset (incremental
        # ingestion): thresholded exact Jaccard, ref pack broadcast once,
        # corpus streams — SQL-checked
        "near_dup_vs_reference": dedup_text.near_dup_vs_reference,
        # exact heavy hitters (Misra-Gries candidate pass + exact re-count)
        "frequent_terms": text.frequent_terms,
        # TIERED dedup: exact digest tier → LSH near tier over survivors →
        # connected-components cluster tier → per-doc keep flag.  The
        # clustering itself is SQL-checked (recursive reachability CTE)
        "doc_dedup_tiered": dedup_text.doc_dedup_tiered,
        # tiered clusters with BOTH keep policies: keep-first (min doc_id)
        # and keep-best (max token count, tiebreak min doc_id) — the
        # per-cluster argmax rides one packed-int64 max aggregate
        "doc_dedup_keep_best": dedup_text.doc_dedup_keep_best,
        # near-dup fan-out per doc (boilerplate/skew diagnostic) and the
        # estimator's equal-slot histogram (threshold tuning) — both are
        # hash aggregates over the metadata-scale verified pair table
        "dup_graph_degrees": dedup_text.dup_graph_degrees,
        # iterative distributed PageRank over the dup graph in exact
        # fixed-point int64 (per-round partitioned join + per-dst fold);
        # SQL-checked — the oracle replays the identical floor arithmetic
        # through chained CTEs
        "dup_graph_pagerank": dedup_text.dup_graph_pagerank,
        # near-dup contamination matrix per unordered source pair —
        # SQL-checked (sims chain + two label joins)
        "cross_source_dups": dedup_text.cross_source_dups,
        # connected components of the dup graph via the DISTRIBUTED
        # label-propagation path — SQL-checked (recursive reachability)
        "dup_graph_components": dedup_text.dup_graph_components,
        # per-doc top-k dup neighbors (k-NN similarity graph) —
        # SQL-checked (row_number window over the sims chain)
        "dup_knn_graph": dedup_text.dup_knn_graph,
        # per-node triangle counts (clustering-coefficient numerator) —
        # SQL-checked (three-way self-join over the sims-chain edges)
        "dup_graph_triangles": dedup_text.dup_graph_triangles,
        "minhash_sim_histogram": dedup_text.minhash_sim_histogram,
        # scope-partitioned near-dup pairs (per-language dedup): the scope
        # is XOR-folded into the LSH bucket key so cross-scope candidates
        # never reach the pair shuffle or the verify gather
        "scoped_dup_pairs": dedup_text.scoped_dup_pairs,
        # sorted-neighborhood (merge/purge) dedup: global order by a
        # normalized key prefix via a distributed ordered prefix count,
        # rank-banded neighbor candidates, exact-Jaccard gate
        "snm_dup_pairs": dedup_text.snm_dup_pairs,
        # dup-cluster size histogram (the end-of-run dedup report)
        "dedup_cluster_sizes": dedup_text.dedup_cluster_sizes,
        # CCNet-style corpus-wide chunk (pseudo-paragraph) dedup: keep-first
        # over fixed word windows, docs reassembled from surviving chunks
        # (SQL-checked: DuckDB replays chunking + row_number keep-first)
        "chunk_dedup_docs": dedup_text.chunk_dedup_docs,
        "rolling_fingerprints": dedup_text.rolling_fingerprints,   # SQL-checked
        # winnowing fingerprint sets (Schleimer et al. 2003 / MOSS):
        # sliding-window min over the rolling gram hashes — SQL-checked
        "winnowing_fingerprints": dedup_text.winnowing_fingerprints,
        # MOSS match detection over the winnowing sets (SQL-checked)
        "winnowing_dup_pairs": dedup_text.winnowing_dup_pairs,
        # ExactSubstr dup spans (Lee et al. 2021): maximal cross-doc
        # duplicated character spans + the all-occurrence scrub
        # (SQL-checked: substr-window + gaps-and-islands oracle)
        "dup_spans": spans.dup_span_extract,
        "dup_span_scrub": spans.dup_span_scrub,
        # composite training-data pipeline: dedup keep flag + lang ID +
        # quality gates → curated corpus manifest (SQL-checked via a
        # WITH-composition of the three sub-oracles)
        "corpus_curation": curation.corpus_curation,
        # per-(source, lang) curation yield report — SQL-checked
        # (curation sub-oracle LEFT JOINed onto per-doc token counts)
        "curation_report": curation.curation_report,
        # end-to-end manifest: curation keep x hash split x per-split
        # token-budget sequence packing (SQL-checked, one WITH-composed
        # oracle over the three sub-recipes)
        "training_manifest": curation.training_manifest,
        # sampled exact-verify spot check of the curation output (rows-only:
        # Ray RNG sampling; the full-fraction path is pytest-asserted empty)
        "curation_audit": curation.curation_audit,
        # the CORE sketch algebra, oracle-checked: (doc_id, perm, slot)
        # minhash values replayed bit-for-bit by a DuckDB HUGEINT oracle
        "doc_minhash_slots": dedup_text.doc_minhash_slots,
        # test-set decontamination: corpus docs sharing any token w-gram
        # with a benchmark subset (small-side broadcast of the benchmark's
        # distinct gram hashes) — SQL-checked via the HUGEINT gram chain
        "decontaminate": dedup_text.decontaminate,
        # corpus-level repeated n-gram scrub (boilerplate removal): every
        # token covered by a w-gram occurring in >= min_df distinct docs
        # is deleted and the doc reassembled — SQL-checked byte-for-byte
        # via the HUGEINT gram chain + interval coverage replay
        "repeated_ngram_scrub": dedup_text.repeated_ngram_scrub,
        # corpus-statistics LM familiarity score (perplexity-proxy quality
        # filter) — SQL-checked (full HUGEINT gram-chain replay)
        "bigram_familiarity": text.bigram_familiarity,
        # constant-space Bloom-filter decontamination (rows-only: false
        # positives are inherent to the sketch, so no SQL oracle — the
        # no-false-negative and FP-envelope guarantees are pytest-proven,
        # as is the OR-fold partitioned==serial merge algebra)
        "bloom_decontaminate": dedup_text.bloom_decontaminate,
        # exact tf-cosine all-pairs self-join (Bayardo's cosine AllPairs):
        # all-integer output, exact cross-product gate — SQL-checked
        "tf_cosine_pairs": dedup_text.tf_cosine_pairs,
        # count-min-sketch term frequencies (approximate heavy hitters,
        # constant space) — deterministic integer sketch, so the DuckDB
        # oracle replays the full probe/bucket/min chain and hash-matches
        "cms_term_counts": text.cms_term_counts,
        # keep-first exact repeated n-gram dedup (Lee et al. 2021
        # substring-dedup semantics at w-gram granularity) — SQL-checked
        # byte-for-byte incl. the packed (doc_id, start) winner argmin
        "repeated_ngram_dedup": dedup_text.repeated_ngram_dedup,
        # overlapping sliding-window chunking (RAG/pretraining
        # segmentation) — pure map, SQL-checked byte-for-byte
        "chunk_documents": text.chunk_documents,
        # Okapi BM25 top-k lexical retrieval (rows-only: ln() is not
        # bit-reproducible across engines; exactness covered by the
        # numpy-mirror pytest)
        "bm25_topk": text.bm25_topk,
        # inverted-index document frequencies (per-batch (doc,term) dedup
        # partial + groupby-sum final) — SQL-checked against unnest
        "term_doc_freq": text.term_doc_freq,
        # adjacent-token-pair counts (the BPE merge-round counting step) —
        # SQL-checked against an unnest bigram oracle
        "token_bigram_counts": text.token_bigram_counts,
        # exact corpus-wide term frequencies via the term-hash fold —
        # SQL-checked against an unnest GROUP BY oracle
        "word_counts": text.word_counts,
        # iterative BPE merge-table learning over the word histogram
        # (rows-only: the merge loop is iterative, not SQL; exactness
        # covered by the naive-reference pytest)
        "bpe_train": text.bpe_train,
        # deterministic per-stratum quota sample by smallest
        # splitmix64(doc_id) — SQL-checked (row_number over the emulated
        # splitmix64 hash); doc_sample stays the RNG fraction sampler
        "stratified_sample_docs": text.stratified_sample_docs,
        # per-source downsample to a target mixture: integer quotas from
        # corpus stats + weights, kept docs = smallest splitmix64(doc_id)
        # per source — SQL-checked (row_number vs the quota CTE)
        "mixture_sample": text.mixture_sample,
        # Gopher-style repetition quality signals (SQL-checked)
        "doc_repetition": text.doc_repetition,
        # C4-style intra-document line dedup (keep first occurrence,
        # order preserved) — purely per-row, SQL-checked
        "dedup_lines": text.dedup_lines,
        # --- similarity search ---
        "ann_topk": ann.ann_topk,                            # SQL-checked
        "embedding_pairs_exact": ann.embedding_pairs_exact,  # SQL-checked
        # LSH scale path, loose threshold so the random test embeddings
        # yield candidates (near-dup regime is covered in pytest).
        # SQL-checked: the hyperplane matrix is embedded as literals and
        # DuckDB replays sign-chunk buckets + cosine verification (ids
        # only — float cos values are order-of-summation sensitive)
        "embedding_dup_pairs": lambda sf: ann.embedding_dup_pairs(
            sf, threshold=0.3, n_planes=16, n_chunks=8
        ).select_columns(["vec_id_a", "vec_id_b"]),
        # IVF coarse-quantizer ANN — SQL-checked: the seeded k-means
        # centroids + probe cells are embedded as literals, DuckDB replays
        # cell assignment (argmax as ORDER BY ... LIMIT 1) and probed
        # scoring end-to-end
        "ann_topk_ivf": ann.ann_topk_ivf,
        # SemDeDup-style semantic dedup: IVF cell assign → within-cell
        # cosine pairs → per-cell components → min-id keep flag.
        # SQL-checked end-to-end (centroid literals + recursive
        # reachability CTE, the _tiered_dedup_sql cluster pattern)
        "semantic_dedup": ann.semantic_dedup,
        # distributed Lloyd k-means training (iterative streaming passes;
        # rows-only: float sums are not bit-reproducible across batch
        # orders — planted-cluster pytest covers exactness)
        "kmeans_train": ann.kmeans_train,
        # --- relational engine surface (SQL-checked) ---
        "lineitem_agg": relational.lineitem_agg,
        "orders_by_segment": relational.orders_by_segment,
        "top_customers": relational.top_customers,
        # per-group top-k (windowed row_number shape; two-level exact top-k)
        "top_orders_per_customer": relational.top_orders_per_customer,
        # partitioned anti-join (NOT EXISTS), both sides large
        "customers_without_orders": relational.customers_without_orders,
        # semi-join (EXISTS) twin of the anti-join above (SQL-checked)
        "customers_with_orders": relational.customers_with_orders,
        # unicode NFC + lower + whitespace-collapse normalization
        # (SQL-checked: DuckDB nfc_normalize/lower/regexp_replace)
        "normalize_text": text.normalize_text,
        # left-outer join (zero-order customers included)
        "customer_order_counts": relational.customer_order_counts,
        # FULL OUTER join shape: per-nation segment-customer vs supplier
        # counts, zero-filled on both sides
        "nation_segment_balance": relational.nation_segment_balance,
        # PII/denylist scrubbing (vectorized RE2 replace + count)
        "scrub_terms": text.scrub_terms,
        # typed structured-PII redaction (email/phone/IP, sequenced
        # count+replace — SQL-checked, both engines RE2)
        "pii_scrub": text.pii_scrub,
        "supplier_regions": relational.supplier_regions,
        "events_by_type": relational.events_by_type,
        "filtered_lineitem": relational.filtered_lineitem,
        "part_brand_stats": relational.part_brand_stats,
        "nation_revenue": relational.nation_revenue,
        # TPC-H Q5 shape: join-equality predicate across two dimension
        # paths (c_nationkey = s_nationkey) — both lookups must be
        # attached before the filter can run (SQL-checked)
        "local_supplier_volume": relational.local_supplier_volume,
        # ROLLUP(region, nation) multi-level aggregate: coarser levels
        # derive from the fine partials, never a re-scan (SQL-checked
        # against GROUP BY ROLLUP)
        "revenue_rollup": relational.revenue_rollup,
        # --- event-stream window operators (SQL-checked: DuckDB window
        # functions replay tumbling windows, gap sessions and the per-user
        # as-of join exactly) ---
        # exact per-group COUNT(DISTINCT) via two-level pair dedup
        "distinct_users_per_type": events.distinct_users_per_type,
        # mergeable HyperLogLog sketch (max-fold algebra = the reference's
        # min-fold contract): deterministic but approximate by design →
        # rows-only here; pytest gates the estimate vs the exact count and
        # asserts partitioned == serial (test_hll_*)
        "approx_distinct_users_per_type": events.approx_distinct_users_per_type,
        # bottom-k (KMV) sketch quantiles over the float value column —
        # deterministic hash sample (set-min fold, partition-invariant by
        # pytest) but approximate by design → rows-only
        "approx_value_quantiles": events.approx_value_quantiles,
        # set intersection (INTERSECT shape) via per-batch distinct + flag max
        "users_with_both": events.users_with_both,
        "window_counts": events.window_counts,
        # per-window top-k event types (grouped exact top-k over time
        # buckets) — SQL-checked against a row_number oracle
        "window_top_events": events.window_top_events,
        "sliding_window_counts": events.sliding_window_counts,
        # sliding windows × exact distinct: per-(window,user) pair fold
        # through the key-hash partition, per-partition partial counts,
        # metadata-scale final sum (SQL-checked)
        "sliding_window_distinct_users": events.sliding_window_distinct_users,
        # interval → window expansion: sessions overlapping each tumbling
        # window (SQL-checked)
        "active_sessions_per_window": events.active_sessions_per_window,
        "sessionize": events.sessionize,
        # per-session length/dwell summary computed inside the same
        # user-hash partition scan as sessionize (no second shuffle)
        "session_stats": events.session_stats,
        # per-user event-type bigram counts (lag() window shape) —
        # SQL-checked against a DuckDB lag() oracle
        "event_type_transitions": events.event_type_transitions,
        # ordered-funnel depth counts (sequential-pattern shape) —
        # SQL-checked against a chained min-after-min oracle
        "funnel_counts": events.funnel_counts,
        "asof_prior": events.asof_prior,
        # retention / cohort matrix (first-period cohort × active period)
        # — SQL-checked (distinct-activity + min-period oracle)
        "retention_cohorts": events.retention_cohorts,
        # per-user z-score outlier flags, all-integer cross-product gate
        # — SQL-checked (HUGEINT moment oracle)
        "value_outliers": events.value_outliers,
        # banded time-range join (interval semantics Ray Data lacks
        # natively) — SQL-checked against a correlated-count oracle
        "range_join_recent": events.range_join_recent,
        # exact per-type inter-arrival stats (per-(user,type) LAG deltas)
        # — SQL-checked against a DuckDB lag() oracle
        "interarrival_stats": events.interarrival_stats,
        # cumulative per-user running value total (SUM OVER window shape)
        # — SQL-checked against a DuckDB sum()-over-window oracle
        "cumulative_user_value": events.cumulative_user_value,
        # trailing ROWS-frame window sum (moving window of last N rows)
        # — SQL-checked against a ROWS BETWEEN oracle
        "trailing_value_sum": events.trailing_value_sum,
        # schema-on-read JSON property extraction + per-type stats
        # — SQL-checked against a DuckDB json_extract_string oracle
        "props_field_stats": events.props_field_stats,
        # CUBE(segment, priority) grouping sets: coarser sets derive from
        # the fine cells (SQL-checked against GROUP BY CUBE)
        "segment_priority_cube": relational.segment_priority_cube,
        # TPC-H Q3 shape: 3-table join + corpus-width revenue fold +
        # exact top-k — SQL-checked against the classic Q3 oracle
        "shipping_priority": relational.shipping_priority,
        # TPC-H Q10 shape: top returned-item revenue customers (SQL-checked)
        "returned_item_revenue": relational.returned_item_revenue,
        # TPC-H Q18 shape: HAVING-gated large-volume orders (SQL-checked)
        "large_volume_customers": relational.large_volume_customers,
        # percentile-gated length filter (exact global q-quantile cut)
        # — SQL-checked against a row_number quantile + filter oracle
        "length_gate_docs": text.length_gate_docs,
        # Gopher-rules composite quality gate (exact integer rule forms)
        # — SQL-checked against an unnest-token aggregate oracle
        "gopher_quality_gate": text.gopher_quality_gate,
        # inverted-index sample: k smallest doc_ids per term — SQL-checked
        # against a row_number-over-distinct-postings oracle
        "posting_lists": text.posting_lists,
        # language × source crosstab (fixed-schema pivot inside the
        # source-hash fold) — SQL-checked against a CASE-sum oracle
        "lang_source_pivot": text.lang_source_pivot,
        # fixed-width integer-cents value histogram — SQL-checked against
        # a floor-division bucket oracle
        "value_histogram": events.value_histogram,
        # exact-percentile winsorization (data-driven outlier clamp —
        # SQL-checked via a row_number order-statistic replay)
        "value_winsorize": events.value_winsorize,
        # event-type co-occurrence (market-basket users-who-did-both)
        # — SQL-checked against a distinct self-join oracle
        "type_cooccurrence": events.type_cooccurrence,
        # DISTINCT ON (user) ORDER BY ts DESC: current-state snapshot
        # — SQL-checked against a row_number oracle
        "latest_event_per_user": events.latest_event_per_user,
        # collect-list + string_agg journey paths — SQL-checked against
        # an ordered string_agg oracle
        "user_event_paths": events.user_event_paths,
        # PQ asymmetric-distance top-k over 8-byte codes — SQL-checked:
        # codebook/half-norm/query-table literals, code argmax as
        # VALUES + ORDER BY LIMIT 1, ADC as a CASE-lookup chain
        # (_pq_topk_sql); cluster recall additionally pytest-pinned
        "ann_topk_pq": ann.ann_topk_pq,
        # IVF+PQ: probe coarse cells, score survivors by ADC (rows-only;
        # full-probe == PQ-only proven in pytest)
        "ann_topk_ivfpq": ann.ann_topk_ivfpq,
        # deterministic weight-proportional sample (A-ES, splitmix keys;
        # rows-only: float pow keys — determinism + size bias pytest-pinned)
        "weighted_sample_docs": text.weighted_sample_docs,
        # --- multimodal resample plumbing (rows-only: binary payload op) ---
        "audio_resample": audio_resample,
        # --- language ID heuristic (SQL-checked: profile-gram presence) ---
        "lang_id": text.lang_id,
        # declared x predicted language confusion matrix (label-noise QC)
        "lang_confusion": text.lang_confusion,
        # --- seeded sampling op (rows-only: Ray RNG) ---
        "doc_sample": text.doc_sample,
        # --- flagship clips pipelines (rows-only: sketch/LSH semantics) ---
        "clips_dedup_assignments": clips_dedup_assignments,
        "clips_dedup_edges": clips_dedup_edges,
        "clips_modality_agreement": clips_modality_agreement,
        "clips_dedup_keep_best": clips_dedup_keep_best,
        # rows-only: the north-rule per-row invariant (decoded-PCM SNR of
        # every verified dup edge, 30 dB gate) as a relation
        "clips_pair_snr": clips_pair_snr,
        # rows-only: tiered flagship (exact tier -> LSH over reps);
        # partition-equality with run_dedup proven in pytest
        "clips_dedup_tiered": clips_dedup_tiered,
        "clips_signatures": clips_signatures,
        # SQL-checked: the flagship text sketch chain replayed in HUGEINT
        "clips_minhash_slots": clips_minhash_slots,
        "audio_frame_features": audio_frame_features,
        "substring_pairs": substring_pairs,
        # --- audio-payload ops (SQL-checked: oracle groups by the raw
        # BLOB, engine by its 128-bit payload digest) ---
        "audio_stats": audio_stats,
        # windowed segmentation plan over the pcm payloads — SQL-checked
        # against a generate_series oracle on the same clips parquet
        "audio_chunk_plan": audio_chunk_plan,
        # per-clip decoded-sample QC (exact-integer energy/peak/clipping/
        # silence) — rows-only: SQL cannot decode PCM16; pytest-mirrored
        "audio_energy_stats": audio_energy_stats,
        # speaking-rate QC over audio+transcript pairs (integer gates)
        "clips_rate_outliers": clips_rate_outliers,
        "audio_exact_dedup": audio_exact_dedup,
        # audio-channel-only near-dup pairs (byte-OPH LSH + estimator
        # gate; rows-only — float sketch semantics, pytest-covered
        # against the fixture's planted near_audio truth pairs)
        "audio_dup_pairs": audio_dup_pairs_q,
        "audio_embedding_dup_pairs": audio_embedding_dup_pairs_q,
        "audio_semantic_dedup": audio_semantic_dedup_q,
        # chunk-level partial-overlap containment pairs (rows-only:
        # LSH/OPH; planted containment pytest-asserted)
        "audio_containment_pairs": audio_containment_pairs_q,
        "audio_phash_pairs": audio_phash_pairs_q,
        "audio_trim_plan": audio_trim_plan_q,
        # duplicated sample spans, merged (rows-only: LSH/OPH; exact
        # planted spans pytest-asserted)
        "audio_dup_regions": audio_dup_regions_q,
    }


def _minhash_slots_sql(n_perms: int = 8, seed: int = 42, source: str = "documents",
                       id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB replay of the ENTIRE reference sketch hash chain for the
    ``doc_minhash_slots`` query: FNV-1a 64 token hash (list_reduce fold in
    HUGEINT with xor on the low byte), polynomial w-gram combine, and the
    reference pairwise family ``((a·x mod 2^64) mod M + b) mod M``
    (src/utils/hash.c:6-9) min-folded per permutation
    (src/utils/utils.c:3-33) — the seeded coefficient table is embedded
    as literals, so the core sketch algebra is oracle-checked end-to-end,
    with INFTY (zero-shingle docs) reinterpreted as -1.

    ``source``/``id_col``/``text_col`` retarget the same chain at any
    relation with an id + text column (``clips_minhash_slots`` points it
    at the synthesized clips corpus to oracle-check the FLAGSHIP's text
    sketch channel)."""
    from minhash_ray.functions.hashing import (
        FNV_OFFSET,
        FNV_PRIME,
        make_pairwise_coefficients,
    )

    m64 = 1 << 64
    m_mod = 2**31 - 1
    init = FNV_OFFSET ^ seed
    a, b = make_pairwise_coefficients(seed, 128, m_mod)
    coeff_rows = ", ".join(f"({i}, {int(a[i])}, {int(b[i])})" for i in range(n_perms))
    p = FNV_PRIME
    return (
        "WITH toks AS ("
        f"  SELECT {id_col} AS doc_id, CASE WHEN trim(lower({text_col})) = ''"
        "         THEN CAST([] AS VARCHAR[])"
        f"         ELSE regexp_split_to_array(trim(lower({text_col})), '\\s+') END AS t"
        f"  FROM {source}"
        "), thash AS ("
        "  SELECT doc_id, list_transform(t, s -> list_reduce("
        f"      list_prepend(CAST({init} AS HUGEINT),"
        "        list_transform(range(1, length(s)+1),"
        "                       i -> CAST(ascii(substr(s, i, 1)) AS HUGEINT))),"
        "      (h, byte) -> ((xor(CAST(h % 256 AS BIGINT), CAST(byte AS BIGINT))"
        f"                    + (h // 256) * 256) * {p}) % {m64}"
        "  )) AS th FROM toks"
        "), grams AS ("
        "  SELECT doc_id,"
        f"    ((th[i] * {p} + th[i+1]) % {m64} * {p} + th[i+2]) % {m64} AS g"
        "  FROM thash, UNNEST(range(1, len(th) - 1)) AS r(i)"
        "  WHERE len(th) >= 3"
        f"), perms(perm, a, b) AS (VALUES {coeff_rows}),"
        "slots AS ("
        "  SELECT g.doc_id AS doc_id, p.perm AS perm,"
        f"    min((((p.a * g.g) % {m64}) % {m_mod} + p.b) % {m_mod}) AS slot"
        "  FROM grams g CROSS JOIN perms p GROUP BY g.doc_id, p.perm"
        ") "
        f"SELECT d.{id_col} AS {id_col}, CAST(p.perm AS BIGINT) AS perm, "
        "CAST(COALESCE(s.slot, -1) AS BIGINT) AS slot "
        f"FROM {source} d CROSS JOIN perms p "
        f"LEFT JOIN slots s ON s.doc_id = d.{id_col} AND s.perm = p.perm"
    )


def _oph_binned_ctes(k: int = 16, seed: int = 42) -> str:
    """Shared CTE chain (no WITH, no final SELECT) for the OPH oracles:
    the FNV-1a → polynomial w-gram chain of ``_minhash_slots_sql``, ONE
    splitmix64 per gram (emulated in HUGEINT), min per (doc, h % k) bin
    in ``binned(doc_id, bin, mh)``."""
    from minhash_ray.functions.hashing import FNV_OFFSET, FNV_PRIME

    m64 = 1 << 64
    init = FNV_OFFSET ^ seed
    p = FNV_PRIME
    ns = 0x9E3779B97F4A7C15
    k1, k2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    return (
        "toks AS ("
        "  SELECT doc_id, CASE WHEN trim(lower(text)) = ''"
        "         THEN CAST([] AS VARCHAR[])"
        "         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t"
        "  FROM documents"
        "), thash AS ("
        "  SELECT doc_id, list_transform(t, s -> list_reduce("
        f"      list_prepend(CAST({init} AS HUGEINT),"
        "        list_transform(range(1, length(s)+1),"
        "                       i -> CAST(ascii(substr(s, i, 1)) AS HUGEINT))),"
        "      (h, byte) -> ((xor(CAST(h % 256 AS BIGINT), CAST(byte AS BIGINT))"
        f"                    + (h // 256) * 256) * {p}) % {m64}"
        "  )) AS th FROM toks"
        "), grams AS ("
        f"  SELECT doc_id, ((th[i] * {p} + th[i+1]) % {m64} * {p} + th[i+2]) % {m64} AS g"
        "  FROM thash, UNNEST(range(1, len(th) - 1)) AS r(i) WHERE len(th) >= 3"
        f"), sm1 AS (SELECT doc_id, ((g + {ns}) % {m64}) AS x1 FROM grams),"
        f"sm2 AS (SELECT doc_id, {_modmul64(_xor64('x1', 'x1 // 1073741824'), k1)} AS x2 FROM sm1),"
        f"sm3 AS (SELECT doc_id, {_modmul64(_xor64('x2', 'x2 // 134217728'), k2)} AS x3 FROM sm2),"
        f"hv AS (SELECT doc_id, {_xor64('x3', 'x3 // 2147483648')} AS h FROM sm3),"
        f"binned AS (SELECT doc_id, CAST(h % {k} AS BIGINT) AS bin, min(h) AS mh"
        "           FROM hv GROUP BY doc_id, bin)"
    )


def _oph_reint(col: str) -> str:
    """HUGEINT uint64 → BIGINT bit-reinterpret expression."""
    return (
        f"CAST(CASE WHEN {col} IS NULL THEN -1 "
        f"WHEN {col} >= {1 << 63} THEN {col} - {1 << 64} "
        f"ELSE {col} END AS BIGINT)"
    )


def _oph_pairs_sql(k: int = 16, bands: int = 8, seed: int = 42) -> str:
    """DuckDB replay of ``oph_dup_pairs`` END-TO-END: gram chain →
    splitmix64 → min-per-bin → rotation-borrow densification → the
    production band fold (bands × k/bands rows over the dense bins) →
    splitmix64 bucket keys → bucket self-join candidates → dense-bin
    fraction-equal estimator gated at tau - margin."""
    from minhash_ray.pipelines.dedup_text import DOC_CFG

    rows = k // bands
    m64 = 1 << 64
    p = 0x100000001B3
    ns = 0x9E3779B97F4A7C15
    k1, k2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    threshold = DOC_CFG.tau - DOC_CFG.verify_margin
    fold = f"((({ns} + band) * {p} + sl[{rows}*band + 1]) % {m64})"
    for r in range(2, rows + 1):
        fold = f"(({fold}) * {p} + sl[{rows}*band + {r}]) % {m64}"
    return (
        f"WITH {_oph_binned_ctes(k, seed)}, "
        # densified bins for docs with >= 1 occupied bin (zero-shingle
        # docs are excluded from banding, INFTY semantics)
        "base AS (SELECT d.doc_id AS doc_id, CAST(b.bin AS BIGINT) AS bin, bn.mh AS mh "
        f"FROM (SELECT DISTINCT doc_id FROM binned) d "
        f"CROSS JOIN (SELECT unnest(range({k})) AS bin) b "
        "LEFT JOIN binned bn ON bn.doc_id = d.doc_id AND bn.bin = b.bin), "
        "borrow AS (SELECT x.doc_id AS doc_id, x.bin AS bin, "
        f"min((y.bin - x.bin + {k}) % {k}) AS t "
        "FROM base x JOIN base y ON y.doc_id = x.doc_id AND y.mh IS NOT NULL "
        "GROUP BY x.doc_id, x.bin), "
        "densed AS (SELECT base.doc_id AS doc_id, base.bin AS bin, donor.mh AS dmh "
        "FROM base "
        "JOIN borrow br ON br.doc_id = base.doc_id AND br.bin = base.bin "
        "JOIN base donor ON donor.doc_id = base.doc_id "
        f"AND donor.bin = (base.bin + br.t) % {k}), "
        "sigl AS (SELECT doc_id, list(dmh ORDER BY bin) AS sl FROM densed GROUP BY doc_id), "
        f"bands0 AS (SELECT doc_id, band, {fold} AS x0"
        f"           FROM sigl, UNNEST(range(0, {bands})) AS rb(band)),"
        f"bm1 AS (SELECT doc_id, ((x0 + {ns}) % {m64}) AS x1 FROM bands0),"
        f"bm2 AS (SELECT doc_id, {_modmul64(_xor64('x1', 'x1 // 1073741824'), k1)} AS x2 FROM bm1),"
        f"bm3 AS (SELECT doc_id, {_modmul64(_xor64('x2', 'x2 // 134217728'), k2)} AS x3 FROM bm2),"
        f"buckets AS (SELECT doc_id, ({_xor64('x3', 'x3 // 2147483648')}) // 2 AS bucket FROM bm3),"
        "cands AS ("
        "  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db"
        "  FROM buckets x JOIN buckets y ON x.bucket = y.bucket AND x.doc_id < y.doc_id"
        "), sims AS ("
        "  SELECT c.da AS da, c.db AS db,"
        f"    CAST(sum(CASE WHEN sa.dmh = sb.dmh THEN 1 ELSE 0 END) AS DOUBLE) / {k} AS sim"
        "  FROM cands c"
        "  JOIN densed sa ON sa.doc_id = c.da"
        "  JOIN densed sb ON sb.doc_id = c.db AND sb.bin = sa.bin"
        "  GROUP BY c.da, c.db"
        ") "
        f"SELECT da AS doc_id_a, db AS doc_id_b, sim FROM sims WHERE sim >= {threshold}"
    )


def _oph_slots_sql(k: int = 16, seed: int = 42) -> str:
    """DuckDB replay of ``oph_minhash_slots`` (see ``_oph_binned_ctes``):
    empty bins -1, slot bit-reinterpreted to BIGINT."""
    return (
        f"WITH {_oph_binned_ctes(k, seed)} "
        "SELECT d.doc_id AS doc_id, CAST(b.bin AS BIGINT) AS bin, "
        f"{_oph_reint('bn.mh')} AS slot "
        f"FROM documents d CROSS JOIN (SELECT unnest(range({k})) AS bin) b "
        "LEFT JOIN binned bn ON bn.doc_id = d.doc_id AND bn.bin = b.bin"
    )


def _oph_dense_sql(k: int = 16, seed: int = 42) -> str:
    """DuckDB replay of ``oph_dense_slots``: each (doc, bin) borrows the
    value of the nearest occupied bin at cyclic distance t = min over
    occupied bins y of (y - bin + k) % k; all-empty docs keep -1/t=0."""
    return (
        f"WITH {_oph_binned_ctes(k, seed)}, "
        "base AS (SELECT d.doc_id AS doc_id, CAST(b.bin AS BIGINT) AS bin, bn.mh AS mh "
        f"FROM documents d CROSS JOIN (SELECT unnest(range({k})) AS bin) b "
        "LEFT JOIN binned bn ON bn.doc_id = d.doc_id AND bn.bin = b.bin), "
        "borrow AS (SELECT x.doc_id AS doc_id, x.bin AS bin, "
        f"min((y.bin - x.bin + {k}) % {k}) AS t "
        "FROM base x JOIN base y ON y.doc_id = x.doc_id AND y.mh IS NOT NULL "
        "GROUP BY x.doc_id, x.bin) "
        "SELECT base.doc_id AS doc_id, base.bin AS bin, "
        f"{_oph_reint('donor.mh')} AS slot, "
        "CAST(COALESCE(br.t, 0) AS BIGINT) AS borrowed "
        "FROM base "
        "LEFT JOIN borrow br ON br.doc_id = base.doc_id AND br.bin = base.bin "
        "LEFT JOIN base donor ON donor.doc_id = base.doc_id "
        f"AND donor.bin = (base.bin + br.t) % {k}"
    )


def _xor64(x: str, y: str) -> str:
    """64-bit xor of two HUGEINT expressions via 32-bit halves (DuckDB's
    xor() is BIGINT-only)."""
    return (
        f"(CAST(xor(CAST(({x}) % 4294967296 AS BIGINT),"
        f" CAST(({y}) % 4294967296 AS BIGINT)) AS HUGEINT)"
        f" + CAST(xor(CAST(({x}) // 4294967296 AS BIGINT),"
        f" CAST(({y}) // 4294967296 AS BIGINT)) AS HUGEINT) * 4294967296)"
    )


def _modmul64(x: str, k: int) -> str:
    """(x * k) mod 2^64 without INT128 overflow: split k into 32-bit
    halves (x*k_lo <= 2^96 and x*k_hi <= 2^96 both fit HUGEINT)."""
    lo, hi = k % (1 << 32), k >> 32
    return (
        f"((({x}) * {lo} + ((({x}) * {hi}) % 4294967296) * 4294967296)"
        f" % 18446744073709551616)"
    )


def _lsh_sims_ctes(seed: int = 42, source: str = "documents",
                   bbits: int | None = None) -> str:
    """CTE chain (no ``WITH``, no final SELECT) replaying the MinHash-LSH
    near-dup pipeline over ``source`` (any relation with doc_id + text):
    the full 128-permutation sketch (same chain as ``_minhash_slots_sql``),
    32-band/4-row bucket keys including the splitmix64 finalizer (emulated
    with 32-bit-half xor and overflow-safe modular multiplies), the bucket
    self-join candidate step, and per-candidate estimator similarity in
    ``sims(da, db, sim)``.  Shared by ``_lsh_pairs_sql`` (source =
    documents) and ``_tiered_dedup_sql`` (source = exact-tier survivors).
    Valid while no bucket exceeds band_group_cap and no bucket is hot
    (true at test scale; the engine's salting/cap paths are covered by
    dedicated pytest instead)."""
    from minhash_ray.functions.hashing import (
        FNV_OFFSET,
        FNV_PRIME,
        make_pairwise_coefficients,
    )
    from minhash_ray.pipelines.dedup_text import DOC_CFG

    m64 = 1 << 64
    m_mod = DOC_CFG.modulus
    init = FNV_OFFSET ^ seed
    p = FNV_PRIME
    ns = 0x9E3779B97F4A7C15
    k1, k2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    num_perm, bands, rows = DOC_CFG.num_perm, DOC_CFG.bands, DOC_CFG.rows_per_band
    slot_mask = f" % {1 << bbits}" if bbits is not None else ""
    a, b = make_pairwise_coefficients(seed, num_perm, m_mod)
    coeff_rows = ", ".join(f"({i}, {int(a[i])}, {int(b[i])})" for i in range(num_perm))
    fold = f"((({ns} + band) * {p} + sl[{rows}*band + 1]) % {m64})"
    for r in range(2, rows + 1):
        fold = f"(({fold}) * {p} + sl[{rows}*band + {r}]) % {m64}"
    return (
        "toks AS ("
        "  SELECT doc_id, CASE WHEN trim(lower(text)) = ''"
        "         THEN CAST([] AS VARCHAR[])"
        "         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t"
        f"  FROM {source}"
        "), thash AS ("
        "  SELECT doc_id, list_transform(t, s -> list_reduce("
        f"      list_prepend(CAST({init} AS HUGEINT),"
        "        list_transform(range(1, length(s)+1),"
        "                       i -> CAST(ascii(substr(s, i, 1)) AS HUGEINT))),"
        "      (h, byte) -> ((xor(CAST(h % 256 AS BIGINT), CAST(byte AS BIGINT))"
        f"                    + (h // 256) * 256) * {p}) % {m64}"
        "  )) AS th FROM toks"
        "), grams AS ("
        f"  SELECT doc_id, ((th[i] * {p} + th[i+1]) % {m64} * {p} + th[i+2]) % {m64} AS g"
        "  FROM thash, UNNEST(range(1, len(th) - 1)) AS r(i) WHERE len(th) >= 3"
        f"), perms(perm, pa, pb) AS (VALUES {coeff_rows}),"
        "slots AS ("
        "  SELECT g.doc_id AS doc_id, p.perm AS perm,"
        f"    min((((p.pa * g.g) % {m64}) % {m_mod} + p.pb) % {m_mod}) AS slot"
        "  FROM grams g CROSS JOIN perms p GROUP BY g.doc_id, p.perm"
        # bbits: band + estimate over the LOW b BITS of each slot
        # (b-bit MinHash; slot values are nonnegative so % is the mask)
        f"), sigl AS (SELECT doc_id, list(slot{slot_mask} ORDER BY perm) AS sl"
        " FROM slots GROUP BY doc_id),"
        f"bands0 AS (SELECT doc_id, band, {fold} AS x0"
        f"           FROM sigl, UNNEST(range(0, {bands})) AS rb(band)),"
        f"sm1 AS (SELECT doc_id, ((x0 + 11400714819323198485) % {m64}) AS x1 FROM bands0),"
        f"sm2 AS (SELECT doc_id, {_modmul64(_xor64('x1', 'x1 // 1073741824'), k1)} AS x2 FROM sm1),"
        f"sm3 AS (SELECT doc_id, {_modmul64(_xor64('x2', 'x2 // 134217728'), k2)} AS x3 FROM sm2),"
        f"buckets AS (SELECT doc_id, ({_xor64('x3', 'x3 // 2147483648')}) // 2 AS bucket FROM sm3),"
        "cands AS ("
        "  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db"
        "  FROM buckets x JOIN buckets y ON x.bucket = y.bucket AND x.doc_id < y.doc_id"
        "), sims AS ("
        "  SELECT c.da AS da, c.db AS db,"
        f"    CAST(sum(CASE WHEN sa.slot{slot_mask} = sb.slot{slot_mask}"
        f" THEN 1 ELSE 0 END) AS DOUBLE) / {num_perm} AS sim"
        "  FROM cands c"
        "  JOIN slots sa ON sa.doc_id = c.da"
        "  JOIN slots sb ON sb.doc_id = c.db AND sb.perm = sa.perm"
        "  GROUP BY c.da, c.db"
        ")"
    )


def _lsh_pairs_sql(seed: int = 42) -> str:
    """DuckDB replay of the full MinHash-LSH near-dup pipeline over the
    documents table (see ``_lsh_sims_ctes``) with the fraction-of-equal-
    slots estimator gate at tau - verify_margin."""
    from minhash_ray.pipelines.dedup_text import DOC_CFG

    threshold = DOC_CFG.tau - DOC_CFG.verify_margin
    return (
        f"WITH {_lsh_sims_ctes(seed)} "
        f"SELECT da AS doc_id_a, db AS doc_id_b, sim FROM sims WHERE sim >= {threshold}"
    )


def _bbit_pairs_sql(b: int = 8, seed: int = 42) -> str:
    """DuckDB replay of ``bbit_minhash_pairs``: the LSH sims chain with
    every slot masked to its low b bits (band fold AND estimator), gated
    at the collision-corrected threshold, plus the unbiased Li-König
    Jaccard estimate — exact-integer operands and a single IEEE division,
    so the DOUBLE hash-matches the engine bit-for-bit."""
    from minhash_ray.pipelines.dedup_text import DOC_CFG, bbit_threshold

    thr = bbit_threshold(DOC_CFG.tau - DOC_CFG.verify_margin, b)
    k = DOC_CFG.num_perm
    num = 1 << b
    return (
        f"WITH {_lsh_sims_ctes(seed, bbits=b)} "
        "SELECT da AS doc_id_a, db AS doc_id_b, sim, "
        f"(sim * {k} * {num} - {k}) / {k * (num - 1)} AS est_jaccard "
        f"FROM sims WHERE sim >= {thr!r}"
    )


def _tiered_dedup_sql(seed: int = 42) -> str:
    """DuckDB replay of the FULL tiered dedup chain for ``doc_dedup_tiered``
    — the first round in which the clustering tier itself is oracle-checked:

    1. exact tier: ``GROUP BY text`` → min doc_id representative (the Ray
       side keys the shuffle on a 128-bit text digest; digest equality ==
       text equality absent collisions, which ``exact_dedup_docs``'s own
       hash-match already evidences at test scale);
    2. near tier: the LSH sims chain (``_lsh_sims_ctes``) over the
       exact-tier survivors only, gated at tau - verify_margin;
    3. cluster tier: connected components over the verified pairs as a
       recursive label-reachability CTE — each representative's cluster id
       is min(doc_id) over every rep reachable through undirected dup
       edges, exactly the scatter-min union-find / min-label-propagation
       fixpoint of ``stages/cluster.assign_clusters``;
    4. routing: every doc joins through its exact rep to its cluster root;
       ``keep = 1`` iff the doc IS the root."""
    from minhash_ray.pipelines.dedup_text import DOC_CFG

    threshold = DOC_CFG.tau - DOC_CFG.verify_margin
    return (
        "WITH RECURSIVE "
        "rep_map AS (SELECT text, min(doc_id) AS rep_id FROM documents GROUP BY text), "
        "reps AS (SELECT rep_id AS doc_id, text FROM rep_map), "
        f"{_lsh_sims_ctes(seed, source='reps')}, "
        f"pairs AS (SELECT da, db FROM sims WHERE sim >= {threshold}), "
        "edges AS (SELECT da AS a, db AS b FROM pairs"
        "          UNION ALL SELECT db AS a, da AS b FROM pairs), "
        "walk(node, label) AS ("
        "  SELECT rep_id, rep_id FROM rep_map"
        "  UNION"
        "  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node"
        "), "
        "comp AS (SELECT node, min(label) AS cluster_id FROM walk GROUP BY node) "
        "SELECT d.doc_id AS doc_id, CAST(c.cluster_id AS BIGINT) AS cluster_id, "
        "CAST(CASE WHEN d.doc_id = c.cluster_id THEN 1 ELSE 0 END AS BIGINT) AS keep "
        "FROM documents d "
        "JOIN rep_map rm ON rm.text = d.text "
        "JOIN comp c ON c.node = rm.rep_id"
    )


def _simhash_sql(seed: int = 42, only_nonzero: bool = False) -> str:
    """DuckDB replay of the SimHash channel (Charikar 2002 sign-of-vote
    over the token-trigram MULTISET): shares the token-hash/gram chain of
    ``_minhash_slots_sql``, expands 64 bit positions from a literal
    power-of-two table, votes ±1 per gram per bit, reassembles the
    fingerprint in HUGEINT and reinterprets to int64.  Zero-shingle docs
    get simhash 0 (matching ``simhash_from_shingles``)."""
    from minhash_ray.functions.hashing import FNV_OFFSET, FNV_PRIME

    m64 = 1 << 64
    init = FNV_OFFSET ^ seed
    p = FNV_PRIME
    bit_rows = ", ".join(f"({i}, {1 << i})" for i in range(64))
    return (
        "WITH toks AS ("
        "  SELECT doc_id, CASE WHEN trim(lower(text)) = ''"
        "         THEN CAST([] AS VARCHAR[])"
        "         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t"
        "  FROM documents"
        "), thash AS ("
        "  SELECT doc_id, list_transform(t, s -> list_reduce("
        f"      list_prepend(CAST({init} AS HUGEINT),"
        "        list_transform(range(1, length(s)+1),"
        "                       i -> CAST(ascii(substr(s, i, 1)) AS HUGEINT))),"
        "      (h, byte) -> ((xor(CAST(h % 256 AS BIGINT), CAST(byte AS BIGINT))"
        f"                    + (h // 256) * 256) * {p}) % {m64}"
        "  )) AS th FROM toks"
        "), grams AS ("
        "  SELECT doc_id,"
        f"    ((th[i] * {p} + th[i+1]) % {m64} * {p} + th[i+2]) % {m64} AS g"
        "  FROM thash, UNNEST(range(1, len(th) - 1)) AS r(i)"
        "  WHERE len(th) >= 3"
        f"), bits(bit, pw) AS (VALUES {bit_rows}),"
        "votes AS ("
        "  SELECT g.doc_id AS doc_id, b.pw AS pw,"
        "    sum(CASE WHEN (g.g // b.pw) % 2 = 1 THEN 1 ELSE -1 END) AS v"
        "  FROM grams g CROSS JOIN bits b GROUP BY g.doc_id, b.pw"
        "), sims AS ("
        "  SELECT doc_id, sum(CASE WHEN v > 0 THEN CAST(pw AS HUGEINT) ELSE 0 END) AS sh"
        "  FROM votes GROUP BY doc_id"
        ") "
        + (
            # only docs with >= 1 gram (``sims`` membership): the banding
            # stage excludes zero-shingle rows, so the pairs oracle must too
            "SELECT s.doc_id AS doc_id, "
            "CAST(CASE WHEN s.sh >= 9223372036854775808::HUGEINT "
            "THEN s.sh - 18446744073709551616 "
            "ELSE s.sh END AS BIGINT) AS simhash "
            "FROM sims s"
            if only_nonzero
            else
            "SELECT d.doc_id AS doc_id, "
            "CAST(CASE WHEN COALESCE(s.sh, 0) >= 9223372036854775808::HUGEINT "
            "THEN COALESCE(s.sh, 0) - 18446744073709551616 "
            "ELSE COALESCE(s.sh, 0) END AS BIGINT) AS simhash "
            "FROM documents d LEFT JOIN sims s ON s.doc_id = d.doc_id"
        )
    )


def _simhash_pairs_sql(max_hamming: int = 8, seed: int = 42) -> str:
    """All doc pairs within ``max_hamming`` SimHash bits — exact O(n²)
    replay (the Ray side's (d+1)-chunk pigeonhole banding is exact-recall,
    so the two must agree bit-for-bit)."""
    return (
        f"WITH fp AS ({_simhash_sql(seed, only_nonzero=True)}) "
        "SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, "
        "CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming "
        "FROM fp a JOIN fp b ON a.doc_id < b.doc_id "
        f"WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"
    )


def _lang_id_sql() -> str:
    """DuckDB replica of the language-ID heuristic (LangIdStage): CJK
    codepoint check on the first 200 chars, then per-language profile-gram
    presence counts with the stage's first-wins tie rule (a later language
    needs a STRICTLY greater score to displace an earlier one)."""
    from minhash_ray.pipelines.text import _LANG_PROFILES

    def esc(s):
        return s.replace("'", "''")

    scores = {
        lang: " + ".join(
            f"(CASE WHEN position('{esc(g)}' IN lt) > 0 THEN 1 ELSE 0 END)"
            for g in _LANG_PROFILES[lang]
        )
        for lang in ("en", "es", "fr")
    }
    return (
        "WITH base AS ("
        "  SELECT doc_id, lower(COALESCE(text, '')) AS lt FROM documents"
        "), sc AS ("
        "  SELECT doc_id, lt,"
        f"    {scores['en']} AS s_en,"
        f"    {scores['es']} AS s_es,"
        f"    {scores['fr']} AS s_fr"
        "  FROM base"
        ") "
        "SELECT doc_id, CASE "
        "WHEN regexp_matches(substr(lt, 1, 200), '[\\x{2E80}-\\x{10FFFF}]') THEN 'zh' "
        "WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_fr THEN 'en' "
        "WHEN s_es > 0 AND s_es > s_en AND s_es >= s_fr THEN 'es' "
        "WHEN s_fr > 0 AND s_fr > s_en AND s_fr > s_es THEN 'fr' "
        "ELSE 'unknown' END AS lang_pred "
        "FROM sc"
    )


def _rolling_fp_sql(window: int = 16, seed: int = 42) -> str:
    """DuckDB replica of the engine's rolling char-w-gram fingerprint: the
    same byte-xor-seed + mod-2^64 polynomial (FNV prime) fold, computed in
    HUGEINT with an explicit mod at every step, min-folded per doc (the
    1-perm MinHash semantics of minhash_ray.pipelines.dedup_text.
    rolling_fingerprints).  Valid while the corpus text is ASCII (byte ==
    char); the engine side hashes UTF-8 bytes."""
    expr = f"CAST(xor(ascii(substr(norm, i, 1)), {seed}) AS HUGEINT)"
    for j in range(1, window):
        expr = (
            f"((({expr}) * 1099511628211 + xor(ascii(substr(norm, i+{j}, 1)), {seed}))"
            " % 18446744073709551616)"
        )
    return (
        "WITH norms AS ("
        "  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm"
        "  FROM documents"
        "), stats AS ("
        f"  SELECT doc_id, norm, greatest(length(norm) - {window - 1}, 0) AS n_grams"
        "  FROM norms"
        "), mins AS ("
        f"  SELECT s.doc_id, min({expr}) AS m"
        "  FROM stats s, UNNEST(range(1, s.n_grams + 1)) AS r(i)"
        "  GROUP BY s.doc_id"
        ") "
        "SELECT st.doc_id, CAST(st.n_grams AS BIGINT) AS n_grams, "
        "CAST(CASE WHEN m IS NULL THEN 0 WHEN m >= 9223372036854775808::HUGEINT "
        "THEN m - 18446744073709551616 ELSE m END AS BIGINT) AS min_gram_hash "
        "FROM stats st LEFT JOIN mins USING(doc_id)"
    )


def _winnowing_sql(window: int = 16, win: int = 8, seed: int = 42) -> str:
    """DuckDB replay of ``winnowing_fingerprints``: the same HUGEINT
    rolling-hash chain as ``_rolling_fp_sql``, then a per-doc sliding
    window MIN (frame truncates at the partition end, which realizes the
    short-doc truncated-window rule) and DISTINCT (doc, fingerprint)."""
    expr = f"CAST(xor(ascii(substr(norm, i, 1)), {seed}) AS HUGEINT)"
    for j in range(1, window):
        expr = (
            f"((({expr}) * 1099511628211 + xor(ascii(substr(norm, i+{j}, 1)), {seed}))"
            " % 18446744073709551616)"
        )
    return (
        "WITH norms AS ("
        "  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm"
        "  FROM documents"
        "), stats AS ("
        f"  SELECT doc_id, norm, greatest(length(norm) - {window - 1}, 0) AS n_grams"
        "  FROM norms"
        "), hs AS ("
        f"  SELECT s.doc_id, s.n_grams, CAST(r.i AS BIGINT) AS i, {expr} AS h"
        "  FROM stats s, UNNEST(range(1, s.n_grams + 1)) AS r(i)"
        "), wm AS ("
        "  SELECT doc_id, n_grams, i, min(h) OVER ("
        "    PARTITION BY doc_id ORDER BY i"
        f"    ROWS BETWEEN CURRENT ROW AND {win - 1} FOLLOWING) AS m"
        "  FROM hs"
        ") "
        "SELECT DISTINCT doc_id, "
        "CAST(CASE WHEN m >= 9223372036854775808::HUGEINT "
        "THEN m - 18446744073709551616 ELSE m END AS BIGINT) AS fp_hash "
        f"FROM wm WHERE i <= greatest(n_grams - {win} + 1, 1)"
    )


def _emb_dim(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"])
    return len(t.column("embedding")[0])


def _embedding_lsh_sql(threshold: float = 0.3, n_planes: int = 16, n_chunks: int = 8,
                       seed: int = 42) -> str:
    """DuckDB replay of the hyperplane-LSH near-dup pipeline
    (``embedding_dup_pairs``): the seeded random hyperplane matrix is
    embedded as literals, sign bits fold into per-chunk bucket values
    (explicit left-to-right sums — deterministic), candidates come from a
    (chunk, value) self-join, and verification is exact float64 cosine >=
    threshold — the whole LSH-for-vectors semantics adversarially checked
    by an independent engine.  Output is the id pairs (cos values are
    summation-order-sensitive across engines and are not part of the
    oracle contract)."""
    import numpy as np

    dim = _emb_dim(ORACLE_SF_DIR())
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))   # same ctor as _HyperplaneBucketer
    w = n_planes // n_chunks
    d_exprs = ", ".join(
        "("
        + " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE)*{planes[i, p]!r}" for i in range(dim)
        )
        + f") AS d{p}"
        for p in range(n_planes)
    )
    ch_exprs = ", ".join(
        "("
        + " + ".join(
            f"(CASE WHEN d{c * w + j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(w)
        )
        + f") AS ch{c}"
        for c in range(n_chunks)
    )
    unions = " UNION ALL ".join(
        f"SELECT vec_id, {c} AS c, ch{c} AS val FROM ch" for c in range(n_chunks)
    )
    return (
        f"WITH d AS (SELECT vec_id, {d_exprs} FROM embeddings), "
        f"ch AS (SELECT vec_id, {ch_exprs} FROM d), "
        f"b AS ({unions}), "
        "cands AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b "
        "FROM b x JOIN b y ON x.c = y.c AND x.val = y.val AND x.vec_id < y.vec_id), "
        "ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
        "FROM embeddings) "
        "SELECT c.a AS vec_id_a, c.b AS vec_id_b FROM cands c "
        "JOIN ev x ON x.vec_id = c.a JOIN ev y ON y.vec_id = c.b "
        f"WHERE list_cosine_similarity(x.v, y.v) >= {threshold}"
    )


def _ivf_topk_sql(query_vec_id: int = 0, k: int = 10, n_centroids: int = 16,
                  n_probe: int = 4, seed: int = 42, sample: int = 8192) -> str:
    """DuckDB replay of the IVF probed top-k (``ann_topk_ivf``): the
    seeded k-means centroids (ivf_centroids — shared pure-numpy code) and
    the query's probe cells are embedded as literals; cell assignment is
    argmax-over-centroid-dots (norms cancel, so raw dots suffice) replayed
    as a correlated ORDER BY ... LIMIT 1, and scoring/ranking run only
    over the probed cells exactly like the engine."""
    import numpy as np
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.ann import ivf_centroids

    sf_dir = ORACLE_SF_DIR()
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    col = t.column("embedding").combine_chunks()
    n = len(col)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    mat = flat.reshape(n, -1)
    sub = mat[:sample]
    norms = np.linalg.norm(sub, axis=1)
    norms[norms == 0] = 1.0
    cents = ivf_centroids(sub / norms[:, None], n_centroids, seed)
    nc = len(cents)
    ids = np.asarray(t.column("vec_id").to_numpy(), dtype=np.int64)
    qrow = mat[int(np.flatnonzero(ids == query_vec_id)[0])]
    qn = qrow / np.linalg.norm(qrow)
    probe = np.sort(np.argsort(-(cents @ qn))[: min(n_probe, nc)])
    probe_lits = ", ".join(str(int(c)) for c in probe)
    d_exprs = ", ".join(
        "("
        + " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE)*{cents[c, i]!r}"
            for i in range(cents.shape[1])
        )
        + f") AS d{c}"
        for c in range(nc)
    )
    vals = ", ".join(f"({c}, d{c})" for c in range(nc))
    return (
        f"WITH d AS (SELECT vec_id, embedding, {d_exprs} FROM embeddings), "
        "cells AS (SELECT vec_id, embedding, "
        f"(SELECT c FROM (VALUES {vals}) AS t(c, dd) ORDER BY dd DESC, c LIMIT 1) AS cell "
        "FROM d), "
        "ev AS (SELECT vec_id, cell, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
        "FROM cells), "
        f"q AS (SELECT v FROM ev WHERE vec_id = {query_vec_id}) "
        "SELECT vec_id, CAST(row_number() OVER (ORDER BY "
        "list_cosine_similarity(v, (SELECT v FROM q)) DESC, vec_id) AS BIGINT) AS rank "
        f"FROM ev WHERE cell IN ({probe_lits}) AND vec_id <> {query_vec_id} "
        f"ORDER BY rank LIMIT {k}"
    )


def _pq_topk_sql(query_vec_id: int = 0, k: int = 10, m_sub: int = 8,
                 n_codes: int = 16, seed: int = 42, sample: int = 8192) -> str:
    """DuckDB replay of the PQ asymmetric-distance top-k (``ann_topk_pq``,
    VERDICT r4 item 8): once the seeded codebooks are fixed, the CODE
    ASSIGNMENT is an integer argmax and the ADC score a lookup-table sum,
    so the whole chain is SQL-expressible with the codebooks, the per-code
    half-norm constants and the query's (m_sub × n_codes) inner-product
    table embedded as literals (the ``_ivf_topk_sql`` pattern):

    1. each vector normalizes (explicit sqrt-of-squares chain, zero-norm
       → 1.0 like the engine),
    2. per subspace s the code is ``argmax_c (sub·b_c − ||b_c||²/2)``,
       replayed as a VALUES + ORDER BY score DESC, c LIMIT 1 (ties → the
       smallest code, numpy argmax semantics),
    3. ADC = left-to-right sum of m_sub CASE lookups into the query
       table literals (numpy's sequential small-array sum order),
    4. rank by (adc DESC, vec_id), query row excluded.
    """
    import numpy as np
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.ann import ivf_centroids

    sf_dir = ORACLE_SF_DIR()
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    col = t.column("embedding").combine_chunks()
    n = len(col)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    mat = flat.reshape(n, -1)
    dim = mat.shape[1]
    d_sub = dim // m_sub
    # codebook training — byte-for-byte the build_pq_index procedure
    m = mat[:sample]
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    m = m / norms[:, None]
    books = np.stack(
        [
            ivf_centroids(
                np.ascontiguousarray(m[:, s * d_sub: (s + 1) * d_sub]),
                n_codes, seed + s, 8,
            )
            for s in range(m_sub)
        ]
    )
    half_norms = 0.5 * (books ** 2).sum(axis=2)          # (m_sub, n_codes)
    ids = np.asarray(t.column("vec_id").to_numpy(), dtype=np.int64)
    qrow = mat[int(np.flatnonzero(ids == query_vec_id)[0])]
    qn = qrow / np.linalg.norm(qrow)
    qtable = np.stack(
        [books[s] @ qn[s * d_sub: (s + 1) * d_sub] for s in range(m_sub)]
    )                                                    # (m_sub, n_codes)

    nrm_chain = " + ".join(f"v[{i + 1}]*v[{i + 1}]" for i in range(dim))
    score_exprs = []
    for s in range(m_sub):
        for c in range(n_codes):
            dot = " + ".join(
                f"(v[{s * d_sub + i + 1}]/nrm)*{books[s, c, i]!r}"
                for i in range(d_sub)
            )
            score_exprs.append(f"(({dot}) - {half_norms[s, c]!r}) AS s{s}c{c}")
    code_exprs = []
    for s in range(m_sub):
        vals = ", ".join(f"({c}, s{s}c{c})" for c in range(n_codes))
        code_exprs.append(
            f"(SELECT c FROM (VALUES {vals}) AS t(c, sc) "
            f"ORDER BY sc DESC, c LIMIT 1) AS code{s}"
        )
    adc_terms = []
    for s in range(m_sub):
        whens = " ".join(
            f"WHEN {c} THEN {qtable[s, c]!r}" for c in range(n_codes)
        )
        adc_terms.append(f"(CASE code{s} {whens} END)")
    adc_expr = " + ".join(adc_terms)
    return (
        "WITH ev AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
        f"nv AS (SELECT vec_id, v, CASE WHEN sqrt({nrm_chain}) = 0 THEN 1.0 "
        f"ELSE sqrt({nrm_chain}) END AS nrm FROM ev), "
        f"sc AS (SELECT vec_id, {', '.join(score_exprs)} FROM nv), "
        f"cd AS (SELECT vec_id, {', '.join(code_exprs)} FROM sc), "
        f"adc AS (SELECT vec_id, {adc_expr} AS adc FROM cd) "
        "SELECT vec_id, CAST(row_number() OVER (ORDER BY adc DESC, vec_id) "
        "AS BIGINT) AS rank "
        f"FROM adc WHERE vec_id <> {query_vec_id} ORDER BY rank LIMIT {k}"
    )


def _semantic_dedup_sql(n_centroids: int = 16, threshold: float = 0.3,
                        seed: int = 42, sample: int = 8192) -> str:
    """DuckDB replay of ``ann.semantic_dedup`` (SemDeDup): the seeded
    k-means centroids are embedded as literals (shared pure-numpy
    ``ivf_centroids``), cell assignment is argmax-over-centroid-dots
    (norms cancel) replayed as a correlated ORDER BY ... LIMIT 1,
    within-cell pairs are an O(cell^2) self-join gated at exact float64
    cosine >= threshold, and the per-cell connected components + min-id
    keep flag are a recursive label-reachability CTE — the same fixpoint
    as ``_tiered_dedup_sql``'s cluster tier, over the embedding modality."""
    import numpy as np
    import pyarrow.parquet as pq

    from minhash_ray.pipelines.ann import ivf_centroids

    sf_dir = ORACLE_SF_DIR()
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    col = t.column("embedding").combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    mat = flat.reshape(len(col), -1)
    sub = mat[:sample]
    norms = np.linalg.norm(sub, axis=1)
    norms[norms == 0] = 1.0
    cents = ivf_centroids(sub / norms[:, None], n_centroids, seed)
    nc = len(cents)
    d_exprs = ", ".join(
        "("
        + " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE)*{cents[c, i]!r}"
            for i in range(cents.shape[1])
        )
        + f") AS d{c}"
        for c in range(nc)
    )
    vals = ", ".join(f"({c}, d{c})" for c in range(nc))
    return (
        f"WITH RECURSIVE d AS (SELECT vec_id, embedding, {d_exprs} FROM embeddings), "
        "cells AS (SELECT vec_id, embedding, "
        f"(SELECT c FROM (VALUES {vals}) AS t(c, dd) ORDER BY dd DESC, c LIMIT 1) AS cell "
        "FROM d), "
        "ev AS (SELECT vec_id, cell, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
        "FROM cells), "
        "pairs AS (SELECT x.vec_id AS a, y.vec_id AS b "
        "FROM ev x JOIN ev y ON x.cell = y.cell AND x.vec_id < y.vec_id "
        f"WHERE list_cosine_similarity(x.v, y.v) >= {threshold}), "
        "edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs), "
        "walk(node, label) AS ("
        "  SELECT vec_id, vec_id FROM ev"
        "  UNION"
        "  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node"
        "), "
        "comp AS (SELECT node, min(label) AS cluster_id FROM walk GROUP BY node) "
        "SELECT c.node AS vec_id, CAST(c.cluster_id AS BIGINT) AS cluster_id, "
        "CAST(CASE WHEN c.node = c.cluster_id THEN 1 ELSE 0 END AS BIGINT) AS keep "
        "FROM comp c"
    )


def _curation_sql(min_tokens: int = 10, punct_denom: int = 20) -> str:
    """WITH-composition of the three independently-verified sub-oracles
    (tiered dedup, language ID, quality counts) plus the same integer
    gates and inner joins as ``pipelines/curation.corpus_curation``."""
    n_tokens = (
        "CASE WHEN trim(text) = '' THEN 0 "
        "ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) END"
    )
    return (
        f"WITH tiered AS ({_tiered_dedup_sql()}), "
        f"lang AS ({_lang_id_sql()}), "
        "q AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
        f"{n_tokens} AS n_tokens, "
        "CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT)"
        " AS n_punct FROM documents) "
        "SELECT t.doc_id AS doc_id, q.n_tokens AS n_tokens, l.lang_pred AS lang_pred "
        "FROM tiered t JOIN q ON q.doc_id = t.doc_id "
        "JOIN lang l ON l.doc_id = t.doc_id "
        f"WHERE t.keep = 1 AND q.n_tokens >= {min_tokens} "
        f"AND q.n_punct * {punct_denom} <= q.n_chars"
    )


def _curation_report_sql(min_tokens: int = 10, punct_denom: int = 20) -> str:
    """Per-(source, lang) yield report: the curation sub-oracle LEFT JOINs
    onto every document's (source, lang, token count)."""
    n_tokens = (
        "CASE WHEN trim(text) = '' THEN 0 "
        "ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) END"
    )
    return (
        f"WITH cur AS ({_curation_sql(min_tokens, punct_denom)}), "
        f"base AS (SELECT doc_id, source, lang, {n_tokens} AS n_tokens "
        "FROM documents) "
        "SELECT b.source AS source, b.lang AS lang, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(b.n_tokens) AS BIGINT) AS tokens_total, "
        "CAST(count(c.doc_id) AS BIGINT) AS n_kept, "
        "CAST(coalesce(sum(CASE WHEN c.doc_id IS NOT NULL THEN b.n_tokens END), 0)"
        " AS BIGINT) AS tokens_kept "
        "FROM base b LEFT JOIN cur c ON c.doc_id = b.doc_id "
        "GROUP BY 1, 2"
    )


def _training_manifest_sql(budget: int = 256) -> str:
    """WITH-composition: the curation sub-oracle feeds the HUGEINT
    splitmix64 chain (split assignment) and a per-split window running
    sum (the packing scan) — one SQL replay of the full manifest."""
    m64 = 1 << 64
    ns = 0x9E3779B97F4A7C15
    k1, k2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    split_expr = (
        "CASE WHEN h % 100 < 90 THEN 'train' "
        "WHEN h % 100 < 95 THEN 'val' ELSE 'test' END"
    )
    return (
        f"WITH cur AS ({_curation_sql()}), "
        f"sm1 AS (SELECT doc_id, n_tokens, lang_pred, "
        f"(CAST(doc_id AS HUGEINT) + {ns}) % {m64} AS x1 FROM cur), "
        f"sm2 AS (SELECT doc_id, n_tokens, lang_pred, "
        f"{_modmul64(_xor64('x1', 'x1 // 1073741824'), k1)} AS x2 FROM sm1), "
        f"sm3 AS (SELECT doc_id, n_tokens, lang_pred, "
        f"{_modmul64(_xor64('x2', 'x2 // 134217728'), k2)} AS x3 FROM sm2), "
        f"hv AS (SELECT doc_id, n_tokens, lang_pred, "
        f"{_xor64('x3', 'x3 // 2147483648')} AS h FROM sm3) "
        f"SELECT doc_id, n_tokens, lang_pred, {split_expr} AS split, "
        f"CAST((sum(n_tokens) OVER (PARTITION BY {split_expr} "
        "ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) - n_tokens) "
        f"// {budget} AS BIGINT) AS seq_id FROM hv"
    )


def _dup_degrees_sql(seed: int = 42) -> str:
    """Degrees over the gated LSH pair graph: both directions unioned,
    one GROUP BY — composed from the same sims chain as
    ``_lsh_pairs_sql``."""
    from minhash_ray.pipelines.dedup_text import DOC_CFG

    threshold = DOC_CFG.tau - DOC_CFG.verify_margin
    return (
        f"WITH {_lsh_sims_ctes(seed)}, "
        f"pairs AS (SELECT da, db FROM sims WHERE sim >= {threshold}), "
        "ends AS (SELECT da AS doc_id FROM pairs "
        "UNION ALL SELECT db FROM pairs) "
        "SELECT doc_id, count(*) AS n_dups FROM ends GROUP BY doc_id"
    )


def _dup_pagerank_sql(seed: int = 42, iterations: int = 3) -> str:
    """Fixed-point PageRank over the gated LSH pair graph: the SAME
    int64 floor arithmetic as ``dedup_text.dup_graph_pagerank`` replayed
    through ``iterations`` chained CTEs (DuckDB ``//`` is exact integer
    division; all values are positive so floor == truncate, and BIGINT
    sums widen to HUGEINT without changing the quotients)."""
    from minhash_ray.pipelines.dedup_text import DOC_CFG

    threshold = DOC_CFG.tau - DOC_CFG.verify_margin
    scale = 1_000_000_000
    tele = (15 * scale) // 100
    sql = (
        f"WITH {_lsh_sims_ctes(seed)}, "
        f"prpairs AS (SELECT da, db FROM sims WHERE sim >= {threshold}), "
        "edges AS (SELECT da AS src, db AS dst FROM prpairs "
        "UNION ALL SELECT db, da FROM prpairs), "
        "deg AS (SELECT src AS doc_id, count(*) AS d FROM edges GROUP BY src), "
        f"pr0 AS (SELECT doc_id, CAST({scale} AS BIGINT) AS pr FROM deg)"
    )
    prev = "pr0"
    for i in range(1, iterations + 1):
        sql += (
            f", pr{i} AS (SELECT e.dst AS doc_id, "
            f"CAST({tele} + (85 * sum(p.pr // g.d)) // 100 AS BIGINT) AS pr "
            f"FROM edges e JOIN {prev} p ON e.src = p.doc_id "
            "JOIN deg g ON e.src = g.doc_id GROUP BY e.dst)"
        )
        prev = f"pr{i}"
    return sql + f" SELECT doc_id, pr AS pr_fx FROM {prev}"


def _dup_components_sql(seed: int = 42) -> str:
    """Connected components over the gated LSH pair graph as a recursive
    label-reachability CTE (the ``_tiered_dedup_sql`` cluster-tier shape,
    restricted to graph nodes)."""
    from minhash_ray.pipelines.dedup_text import DOC_CFG

    threshold = DOC_CFG.tau - DOC_CFG.verify_margin
    return (
        "WITH RECURSIVE "
        f"{_lsh_sims_ctes(seed)}, "
        f"pairs AS (SELECT da, db FROM sims WHERE sim >= {threshold}), "
        "edges AS (SELECT da AS a, db AS b FROM pairs"
        "          UNION ALL SELECT db AS a, da AS b FROM pairs), "
        "nodes AS (SELECT DISTINCT a AS node FROM edges), "
        "walk(node, label) AS ("
        "  SELECT node, node FROM nodes"
        "  UNION"
        "  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node"
        ") "
        "SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS component_id "
        "FROM walk GROUP BY node"
    )


def _dup_knn_sql(k: int = 3, seed: int = 42) -> str:
    """Per-doc top-k dup neighbors: both edge directions + row_number
    window over the sims chain."""
    from minhash_ray.pipelines.dedup_text import DOC_CFG

    threshold = DOC_CFG.tau - DOC_CFG.verify_margin
    return (
        f"WITH {_lsh_sims_ctes(seed)}, "
        f"pairs AS (SELECT da, db, sim FROM sims WHERE sim >= {threshold}), "
        "edges AS (SELECT da AS doc_id, db AS neighbor_id, sim FROM pairs "
        "UNION ALL SELECT db, da, sim FROM pairs), "
        "r AS (SELECT doc_id, neighbor_id, sim, row_number() OVER ("
        "PARTITION BY doc_id ORDER BY sim DESC, neighbor_id) AS rnk FROM edges) "
        "SELECT doc_id, neighbor_id, sim, CAST(rnk AS BIGINT) AS rnk "
        f"FROM r WHERE rnk <= {k}"
    )


def _dup_triangles_sql(seed: int = 42) -> str:
    """Per-node triangle counts: with edges canonical (da < db), each
    triangle {u < v < w} appears exactly once in the three-way self-join
    e1=(u,v) ⋈ e2=(v,w) ⋈ e3=(u,w); every graph node appears in the
    output (zero-filled)."""
    from minhash_ray.pipelines.dedup_text import DOC_CFG

    threshold = DOC_CFG.tau - DOC_CFG.verify_margin
    return (
        f"WITH {_lsh_sims_ctes(seed)}, "
        f"pairs AS (SELECT da, db FROM sims WHERE sim >= {threshold}), "
        "e AS (SELECT da AS a, db AS b FROM pairs), "
        "tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w "
        "FROM e e1 JOIN e e2 ON e2.a = e1.b "
        "JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b), "
        "nodes AS (SELECT a AS doc_id FROM e UNION SELECT b FROM e), "
        "tc AS (SELECT u AS doc_id FROM tri UNION ALL SELECT v FROM tri "
        "UNION ALL SELECT w FROM tri), "
        "cnt AS (SELECT doc_id, count(*) AS c FROM tc GROUP BY 1) "
        "SELECT n.doc_id, CAST(coalesce(cnt.c, 0) AS BIGINT) AS n_triangles "
        "FROM nodes n LEFT JOIN cnt ON cnt.doc_id = n.doc_id"
    )


def _cross_source_dups_sql(seed: int = 42) -> str:
    """Cross-source contamination matrix over the gated LSH pair graph:
    the ``_lsh_sims_ctes`` chain + two source-label joins + least/greatest
    pair normalization."""
    from minhash_ray.pipelines.dedup_text import DOC_CFG

    threshold = DOC_CFG.tau - DOC_CFG.verify_margin
    return (
        f"WITH {_lsh_sims_ctes(seed)}, "
        f"pairs AS (SELECT da, db FROM sims WHERE sim >= {threshold}), "
        "lab AS (SELECT a.source AS sa, b.source AS sb FROM pairs p "
        "JOIN documents a ON a.doc_id = p.da "
        "JOIN documents b ON b.doc_id = p.db) "
        "SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b, "
        "CAST(count(*) AS BIGINT) AS n_pairs FROM lab GROUP BY 1, 2"
    )


def _snm_pairs_sql(window: int = 8, key_chars: int = 24, threshold: float = 0.3) -> str:
    """DuckDB replay of ``snm_dup_pairs``: row_number over the normalized
    key order (binary collation = the engine's bytewise 'S' order),
    rank-distance <= window candidate join, and the exact trigram-set
    Jaccard gate shared with the ``ngram_jaccard_pairs`` oracle."""
    return (
        "WITH keyed AS (SELECT doc_id, "
        f"substr(lower(trim(text)), 1, {key_chars}) AS k FROM documents), "
        "ranked AS (SELECT doc_id, row_number() OVER (ORDER BY k, doc_id) AS r "
        "FROM keyed), "
        "cand AS (SELECT a.doc_id AS da, b.doc_id AS db FROM ranked a "
        f"JOIN ranked b ON b.r > a.r AND b.r <= a.r + {window}), "
        "toks AS (SELECT doc_id, CASE WHEN trim(lower(text)) = '' "
        "THEN CAST([] AS VARCHAR[]) "
        "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t "
        "FROM documents), "
        "grams AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g "
        "FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i) WHERE len(t) >= 3), "
        "sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
        "inter AS (SELECT c.da, c.db, count(*) AS c FROM cand c "
        "JOIN grams ga ON ga.doc_id = c.da "
        "JOIN grams gb ON gb.doc_id = c.db AND gb.g = ga.g GROUP BY c.da, c.db) "
        "SELECT least(i.da, i.db) AS doc_id_a, greatest(i.da, i.db) AS doc_id_b, "
        "CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) AS jaccard "
        "FROM inter i JOIN sizes sa ON i.da = sa.doc_id "
        "JOIN sizes sb ON i.db = sb.doc_id "
        f"WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= {threshold}"
    )


def _scoped_pairs_sql(seed: int = 42) -> str:
    """Scope-restricted LSH pairs: the unscoped sims chain joined back to
    ``documents`` for each side's lang, kept only when the langs agree —
    equivalent to the engine's bucket-key salting because a same-scope
    pair collides in salted buckets iff it collides unsalted, and a
    cross-scope pair never survives either side."""
    from minhash_ray.pipelines.dedup_text import DOC_CFG

    threshold = DOC_CFG.tau - DOC_CFG.verify_margin
    return (
        f"WITH {_lsh_sims_ctes(seed)}, "
        f"pairs AS (SELECT da, db, sim FROM sims WHERE sim >= {threshold}) "
        "SELECT x.lang AS lang, p.da AS doc_id_a, p.db AS doc_id_b, p.sim AS sim "
        "FROM pairs p JOIN documents x ON x.doc_id = p.da "
        "JOIN documents y ON y.doc_id = p.db WHERE x.lang = y.lang"
    )


def _sim_histogram_sql(seed: int = 42) -> str:
    """Equal-slot histogram over the gated pairs: sim is always
    n/num_perm with a power-of-two denominator, so floor(sim*k + 0.5)
    recovers the integer slot count float-exactly in both engines."""
    from minhash_ray.pipelines.dedup_text import DOC_CFG

    threshold = DOC_CFG.tau - DOC_CFG.verify_margin
    k = DOC_CFG.num_perm
    return (
        f"WITH {_lsh_sims_ctes(seed)} "
        f"SELECT CAST(floor(sim * {k} + 0.5) AS BIGINT) AS n_eq_slots, "
        f"count(*) AS n_pairs FROM sims WHERE sim >= {threshold} "
        "GROUP BY 1"
    )


def _keep_best_sql() -> str:
    """WITH-composition for ``doc_dedup_keep_best``: the tiered-dedup
    sub-oracle joined to whitespace token counts, per-cluster winner by
    the SAME packed-int64 max the Ray aggregate computes (max tokens,
    then min doc_id — one integer order, no row_number ties to argue
    about)."""
    hi = 1 << 32
    n_tokens = (
        "CASE WHEN trim(text) = '' THEN 0 "
        "ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) END"
    )
    return (
        f"WITH tiered AS ({_tiered_dedup_sql()}), "
        f"tok AS (SELECT doc_id, {n_tokens} AS n_tokens FROM documents), "
        "j AS (SELECT t.doc_id AS doc_id, t.cluster_id AS cluster_id, "
        "t.keep AS keep_first, "
        f"q.n_tokens * {hi} + ({hi - 1} - t.doc_id) AS packed "
        "FROM tiered t JOIN tok q ON q.doc_id = t.doc_id), "
        "best AS (SELECT cluster_id, max(packed) AS bp FROM j GROUP BY cluster_id) "
        "SELECT j.doc_id AS doc_id, j.cluster_id AS cluster_id, "
        "j.keep_first AS keep_first, "
        "CAST(CASE WHEN j.packed = b.bp THEN 1 ELSE 0 END AS BIGINT) AS keep_best "
        "FROM j JOIN best b ON b.cluster_id = j.cluster_id"
    )


def _funnel_sql(steps: tuple | None = None) -> str:
    """DuckDB replay of ``funnel_counts``: chained min-after-min CTEs —
    step s's CTE is each surviving user's earliest step-s event STRICTLY
    after their step-(s-1) time (the greedy-earliest chain the Ray scan
    computes with ``minimum.reduceat``)."""
    if steps is None:
        from minhash_ray.pipelines.events import FUNNEL_STEPS

        steps = FUNNEL_STEPS
    ctes = [
        "s0 AS (SELECT user_id, min(ts) AS t FROM events "
        f"WHERE event_type = '{steps[0]}' GROUP BY user_id)"
    ]
    for i in range(1, len(steps)):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            f"JOIN s{i - 1} p ON p.user_id = e.user_id AND e.ts > p.t "
            f"WHERE e.event_type = '{steps[i]}' GROUP BY e.user_id)"
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, '{steps[i]}' AS event_type, "
        f"count(*) AS n_users FROM s{i}"
        for i in range(len(steps))
    )
    return "WITH " + ", ".join(ctes) + " " + selects


def _decontaminate_sql(bench_mod: int = 43, seed: int = 42, w: int | None = None) -> str:
    """DuckDB replay of ``decontaminate``: the same FNV-1a token hash +
    w-gram polynomial chain as ``_minhash_slots_sql`` (general w), a
    DISTINCT gram set over the benchmark subset (doc_id % bench_mod = 0),
    and a per-doc count of DISTINCT shared grams."""
    from minhash_ray.functions.hashing import FNV_OFFSET, FNV_PRIME
    from minhash_ray.pipelines.dedup_text import DOC_CFG

    w = DOC_CFG.shingle_w if w is None else w
    m64 = 1 << 64
    p = FNV_PRIME
    init = FNV_OFFSET ^ seed
    gram = "th[i]"
    for r in range(2, w + 1):
        gram = f"(({gram}) * {p} + th[i+{r - 1}]) % {m64}"
    return (
        "WITH toks AS ("
        "  SELECT doc_id, CASE WHEN trim(lower(text)) = ''"
        "         THEN CAST([] AS VARCHAR[])"
        "         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t"
        "  FROM documents"
        "), thash AS ("
        "  SELECT doc_id, list_transform(t, s -> list_reduce("
        f"      list_prepend(CAST({init} AS HUGEINT),"
        "        list_transform(range(1, length(s)+1),"
        "                       i -> CAST(ascii(substr(s, i, 1)) AS HUGEINT))),"
        "      (h, byte) -> ((xor(CAST(h % 256 AS BIGINT), CAST(byte AS BIGINT))"
        f"                    + (h // 256) * 256) * {p}) % {m64}"
        "  )) AS th FROM toks"
        "), grams AS ("
        f"  SELECT doc_id, {gram} AS g"
        f"  FROM thash, UNNEST(range(1, len(th) - {w} + 2)) AS r(i)"
        f"  WHERE len(th) >= {w}"
        "), bench AS ("
        f"  SELECT DISTINCT g FROM grams WHERE doc_id % {bench_mod} = 0"
        "), hits AS ("
        "  SELECT g.doc_id, count(DISTINCT g.g) AS n_hits"
        "  FROM grams g JOIN bench b ON b.g = g.g GROUP BY g.doc_id"
        ") "
        "SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, "
        "COALESCE(h.n_hits, 0) > 0 AS contaminated "
        "FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id"
    )


def _repeated_scrub_sql(min_df: int = 4, seed: int = 42, w: int | None = None) -> str:
    """DuckDB replay of ``repeated_ngram_scrub``: the same FNV-1a token
    hash + w-gram polynomial chain as ``_decontaminate_sql``, corpus-wide
    distinct-doc frequency per gram, interval coverage of token positions
    by >=min_df grams, and byte-for-byte reassembly of the surviving
    normalized tokens."""
    from minhash_ray.functions.hashing import FNV_OFFSET, FNV_PRIME
    from minhash_ray.pipelines.dedup_text import DOC_CFG

    w = DOC_CFG.shingle_w if w is None else w
    m64 = 1 << 64
    p = FNV_PRIME
    init = FNV_OFFSET ^ seed
    gram = "th[i]"
    for r in range(2, w + 1):
        gram = f"(({gram}) * {p} + th[i+{r - 1}]) % {m64}"
    return (
        "WITH toks AS ("
        "  SELECT doc_id, CASE WHEN trim(lower(text)) = ''"
        "         THEN CAST([] AS VARCHAR[])"
        "         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t"
        "  FROM documents"
        "), thash AS ("
        "  SELECT doc_id, t, list_transform(t, s -> list_reduce("
        f"      list_prepend(CAST({init} AS HUGEINT),"
        "        list_transform(range(1, length(s)+1),"
        "                       i -> CAST(ascii(substr(s, i, 1)) AS HUGEINT))),"
        "      (h, byte) -> ((xor(CAST(h % 256 AS BIGINT), CAST(byte AS BIGINT))"
        f"                    + (h // 256) * 256) * {p}) % {m64}"
        "  )) AS th FROM toks"
        "), grams AS ("
        f"  SELECT doc_id, i, {gram} AS g"
        f"  FROM thash, UNNEST(range(1, len(th) - {w} + 2)) AS r(i)"
        f"  WHERE len(th) >= {w}"
        "), hot AS ("
        f"  SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= {min_df}"
        "), cov AS ("
        "  SELECT DISTINCT gr.doc_id, pp.p"
        "  FROM grams gr JOIN hot h ON h.g = gr.g,"
        f"       UNNEST(range(gr.i, gr.i + {w})) AS pp(p)"
        "), pos AS ("
        "  SELECT doc_id, pi.i AS pos, t[pi.i] AS tok"
        "  FROM thash, UNNEST(range(1, len(t) + 1)) AS pi(i)"
        "), scrubbed AS ("
        "  SELECT p.doc_id,"
        "    COALESCE(string_agg(p.tok, ' ' ORDER BY p.pos)"
        "             FILTER (WHERE c.p IS NULL), '') AS text_scrubbed,"
        "    count(c.p) AS n_removed"
        "  FROM pos p LEFT JOIN cov c ON c.doc_id = p.doc_id AND c.p = p.pos"
        "  GROUP BY p.doc_id"
        ") "
        "SELECT d.doc_id, COALESCE(s.text_scrubbed, '') AS text_scrubbed, "
        "CAST(COALESCE(s.n_removed, 0) AS BIGINT) AS n_removed "
        "FROM documents d LEFT JOIN scrubbed s ON s.doc_id = d.doc_id"
    )


def _familiarity_sql(min_count: int = 10, seed: int = 42, w: int = 2) -> str:
    """DuckDB replay of ``bigram_familiarity``: the same FNV-1a token
    hash + w-gram polynomial chain as ``_repeated_scrub_sql``, corpus-wide
    gram OCCURRENCE counts, the >=min_count frequent gate, and the
    integer basis-point score ``n_frequent * 10000 // n_grams``."""
    from minhash_ray.functions.hashing import FNV_OFFSET, FNV_PRIME

    m64 = 1 << 64
    p = FNV_PRIME
    init = FNV_OFFSET ^ seed
    gram = "th[i]"
    for r in range(2, w + 1):
        gram = f"(({gram}) * {p} + th[i+{r - 1}]) % {m64}"
    return (
        "WITH toks AS ("
        "  SELECT doc_id, CASE WHEN trim(lower(text)) = ''"
        "         THEN CAST([] AS VARCHAR[])"
        "         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t"
        "  FROM documents"
        "), thash AS ("
        "  SELECT doc_id, list_transform(t, s -> list_reduce("
        f"      list_prepend(CAST({init} AS HUGEINT),"
        "        list_transform(range(1, length(s)+1),"
        "                       i -> CAST(ascii(substr(s, i, 1)) AS HUGEINT))),"
        "      (h, byte) -> ((xor(CAST(h % 256 AS BIGINT), CAST(byte AS BIGINT))"
        f"                    + (h // 256) * 256) * {p}) % {m64}"
        "  )) AS th FROM toks"
        "), grams AS ("
        f"  SELECT doc_id, {gram} AS g"
        f"  FROM thash, UNNEST(range(1, len(th) - {w} + 2)) AS r(i)"
        f"  WHERE len(th) >= {w}"
        "), hot AS ("
        f"  SELECT g FROM grams GROUP BY g HAVING count(*) >= {min_count}"
        "), per AS ("
        "  SELECT gr.doc_id, count(*) AS n_grams, count(h.g) AS n_frequent"
        "  FROM grams gr LEFT JOIN hot h ON h.g = gr.g GROUP BY 1"
        ") "
        "SELECT d.doc_id, "
        "CAST(coalesce(p2.n_grams, 0) AS BIGINT) AS n_grams, "
        "CAST(coalesce(p2.n_frequent, 0) AS BIGINT) AS n_frequent, "
        "CAST(CASE WHEN coalesce(p2.n_grams, 0) > 0 "
        "THEN (p2.n_frequent * 10000) // p2.n_grams ELSE 0 END AS BIGINT) "
        "AS familiar_bp "
        "FROM documents d LEFT JOIN per p2 ON p2.doc_id = d.doc_id"
    )


def _retention_sql(bucket_days: int = 7) -> str:
    """DuckDB replay of ``retention_cohorts``: distinct (user, period)
    activity, per-user min period as the cohort, and the (cohort, period)
    user-count matrix."""
    b = bucket_days * 86_400_000_000
    return (
        f"WITH uw AS (SELECT DISTINCT user_id, "
        f"(epoch_us(ts) // {b}) * {b} AS period_us FROM events), "
        "fw AS (SELECT user_id, min(period_us) AS cohort_us "
        "FROM uw GROUP BY 1) "
        "SELECT CAST(f.cohort_us AS BIGINT) AS cohort_us, "
        "CAST(u.period_us AS BIGINT) AS period_us, "
        "CAST(count(*) AS BIGINT) AS n_users "
        "FROM uw u JOIN fw f ON f.user_id = u.user_id GROUP BY 1, 2"
    )


def _tf_cosine_sql(threshold: float = 0.9, seed: int = 42) -> str:
    """DuckDB replay of ``tf_cosine_pairs``: the FNV-1a token hash chain
    (w=1 — the per-token hash itself), exact HUGEINT term-frequency dot
    products and squared norms, and the same integer cross-product gate
    ``dot²·den² >= num²·na2·nb2`` with threshold = num/den from the
    decimal literal."""
    from fractions import Fraction

    from minhash_ray.functions.hashing import FNV_OFFSET, FNV_PRIME

    frac = Fraction(str(threshold))
    t2n, t2d = frac.numerator**2, frac.denominator**2
    m64 = 1 << 64
    p = FNV_PRIME
    init = FNV_OFFSET ^ seed
    return (
        "WITH toks AS ("
        "  SELECT doc_id, CASE WHEN trim(lower(text)) = ''"
        "         THEN CAST([] AS VARCHAR[])"
        "         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t"
        "  FROM documents"
        "), thash AS ("
        "  SELECT doc_id, list_transform(t, s -> list_reduce("
        f"      list_prepend(CAST({init} AS HUGEINT),"
        "        list_transform(range(1, length(s)+1),"
        "                       i -> CAST(ascii(substr(s, i, 1)) AS HUGEINT))),"
        "      (h, byte) -> ((xor(CAST(h % 256 AS BIGINT), CAST(byte AS BIGINT))"
        f"                    + (h // 256) * 256) * {p}) % {m64}"
        "  )) AS th FROM toks"
        "), tf AS ("
        "  SELECT doc_id, u.h AS h, CAST(count(*) AS HUGEINT) AS tf"
        "  FROM thash, UNNEST(th) AS u(h) GROUP BY doc_id, u.h"
        "), norm AS ("
        "  SELECT doc_id, CAST(sum(tf * tf) AS HUGEINT) AS n2 FROM tf GROUP BY doc_id"
        "), dots AS ("
        "  SELECT a.doc_id AS da, b.doc_id AS db,"
        "         CAST(sum(a.tf * b.tf) AS HUGEINT) AS dot"
        "  FROM tf a JOIN tf b ON a.h = b.h AND a.doc_id < b.doc_id"
        "  GROUP BY 1, 2"
        ") "
        "SELECT da AS doc_id_a, db AS doc_id_b, CAST(dot AS BIGINT) AS dot, "
        "CAST(na.n2 AS BIGINT) AS na2, CAST(nb.n2 AS BIGINT) AS nb2 "
        "FROM dots JOIN norm na ON na.doc_id = da JOIN norm nb ON nb.doc_id = db "
        f"WHERE dot > 0 AND dot * dot * {t2d} >= {t2n} * na.n2 * nb.n2"
    )


def _chunk_documents_sql(words_per_chunk: int = 20, stride: int = 10) -> str:
    """DuckDB replay of ``chunk_documents``: same tokenizer, start
    positions every ``stride`` tokens, 1-based inclusive list slices,
    space-joined — byte-for-byte chunk text."""
    W, S = words_per_chunk, stride
    return (
        "WITH toks AS ("
        "  SELECT doc_id, CASE WHEN trim(lower(text)) = ''"
        "         THEN CAST([] AS VARCHAR[])"
        "         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t"
        "  FROM documents"
        "), meta AS ("
        "  SELECT doc_id, t, len(t) AS n FROM toks"
        "), chunks AS ("
        "  SELECT doc_id, t, n, c.c AS cidx"
        "  FROM meta, UNNEST(range(CASE WHEN n > 0"
        f"       THEN 1 + (greatest(n - {W}, 0) + {S} - 1) // {S}"
        "        ELSE 0 END)) AS c(c)"
        ") "
        "SELECT doc_id, CAST(cidx AS BIGINT) AS cidx, "
        f"array_to_string(t[cidx * {S} + 1 : least(cidx * {S} + {W}, n)], ' ')"
        " AS chunk, "
        f"CAST(least(n - cidx * {S}, {W}) AS BIGINT) AS n_tokens "
        "FROM chunks"
    )


def _repeated_dedup_sql(seed: int = 42, w: int | None = None) -> str:
    """DuckDB replay of ``repeated_ngram_dedup``: the scrub oracle's gram
    chain, per-gram occurrence counts with the min packed
    (doc_id << 20 | start) winner, coverage of every NON-winner
    occurrence, and byte-for-byte reassembly."""
    from minhash_ray.functions.hashing import FNV_OFFSET, FNV_PRIME
    from minhash_ray.pipelines.dedup_text import _POS_BITS, DOC_CFG

    w = DOC_CFG.shingle_w if w is None else w
    m64 = 1 << 64
    p = FNV_PRIME
    init = FNV_OFFSET ^ seed
    mult = 1 << _POS_BITS
    gram = "th[i]"
    for r in range(2, w + 1):
        gram = f"(({gram}) * {p} + th[i+{r - 1}]) % {m64}"
    return (
        "WITH toks AS ("
        "  SELECT doc_id, CASE WHEN trim(lower(text)) = ''"
        "         THEN CAST([] AS VARCHAR[])"
        "         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t"
        "  FROM documents"
        "), thash AS ("
        "  SELECT doc_id, t, list_transform(t, s -> list_reduce("
        f"      list_prepend(CAST({init} AS HUGEINT),"
        "        list_transform(range(1, length(s)+1),"
        "                       i -> CAST(ascii(substr(s, i, 1)) AS HUGEINT))),"
        "      (h, byte) -> ((xor(CAST(h % 256 AS BIGINT), CAST(byte AS BIGINT))"
        f"                    + (h // 256) * 256) * {p}) % {m64}"
        "  )) AS th FROM toks"
        "), grams AS ("
        f"  SELECT doc_id, i, doc_id * {mult} + (i - 1) AS pack, {gram} AS g"
        f"  FROM thash, UNNEST(range(1, len(th) - {w} + 2)) AS r(i)"
        f"  WHERE len(th) >= {w}"
        "), winners AS ("
        "  SELECT g, min(pack) AS winner FROM grams GROUP BY g"
        "  HAVING count(*) >= 2"
        "), cov AS ("
        "  SELECT DISTINCT gr.doc_id, pp.p"
        "  FROM grams gr JOIN winners wn ON wn.g = gr.g AND gr.pack <> wn.winner,"
        f"       UNNEST(range(gr.i, gr.i + {w})) AS pp(p)"
        "), pos AS ("
        "  SELECT doc_id, pi.i AS pos, t[pi.i] AS tok"
        "  FROM thash, UNNEST(range(1, len(t) + 1)) AS pi(i)"
        "), dedup AS ("
        "  SELECT p.doc_id,"
        "    COALESCE(string_agg(p.tok, ' ' ORDER BY p.pos)"
        "             FILTER (WHERE c.p IS NULL), '') AS text_dedup,"
        "    count(c.p) AS n_removed"
        "  FROM pos p LEFT JOIN cov c ON c.doc_id = p.doc_id AND c.p = p.pos"
        "  GROUP BY p.doc_id"
        ") "
        "SELECT d.doc_id, COALESCE(s.text_dedup, '') AS text_dedup, "
        "CAST(COALESCE(s.n_removed, 0) AS BIGINT) AS n_removed "
        "FROM documents d LEFT JOIN dedup s ON s.doc_id = d.doc_id"
    )


def _cms_counts_sql(
    width: int = 1 << 16, depth: int = 4, min_count: int = 800, seed: int = 42
) -> str:
    """DuckDB replay of ``cms_term_counts``: FNV-1a token hashes, the
    splitmix64 double-hash probe chain (h1 + d·h2 with h2 forced odd)
    emulated in HUGEINT, per-(row, bucket) sums and the min-over-depth
    estimate — the full count-min sketch, exactly."""
    from minhash_ray.functions.cms import _H2_SALT
    from minhash_ray.functions.hashing import FNV_OFFSET, FNV_PRIME

    m64 = 1 << 64
    p = FNV_PRIME
    init = FNV_OFFSET ^ seed
    ns = 0x9E3779B97F4A7C15
    k1, k2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB

    def smix(col: str, out: str) -> str:
        """CTE column chain computing splitmix64(col) AS out (inline
        nested expression — exact 2^64 wraparound via the shared
        modmul/xor helpers)."""
        x1 = f"((({col}) + {ns}) % {m64})"
        x2 = _modmul64(_xor64(x1, f"{x1} // 1073741824"), k1)
        x3 = _modmul64(_xor64(x2, f"{x2} // 134217728"), k2)
        return f"{_xor64(x3, f'{x3} // 2147483648')} AS {out}"

    return (
        "WITH toks AS ("
        "  SELECT doc_id, CASE WHEN trim(lower(text)) = ''"
        "         THEN CAST([] AS VARCHAR[])"
        "         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t"
        "  FROM documents"
        "), thash AS ("
        "  SELECT doc_id, t, list_transform(t, s -> list_reduce("
        f"      list_prepend(CAST({init} AS HUGEINT),"
        "        list_transform(range(1, length(s)+1),"
        "                       i -> CAST(ascii(substr(s, i, 1)) AS HUGEINT))),"
        "      (h, byte) -> ((xor(CAST(h % 256 AS BIGINT), CAST(byte AS BIGINT))"
        f"                    + (h // 256) * 256) * {p}) % {m64}"
        "  )) AS th FROM toks"
        "), occ AS ("
        "  SELECT unnest(t) AS tok, unnest(th) AS h FROM thash"
        "), terms AS ("
        "  SELECT tok, h, CAST(count(*) AS HUGEINT) AS c FROM occ GROUP BY tok, h"
        "), hv AS ("
        f"  SELECT tok, h, c, {smix('h', 'h1')},"
        f"         {smix(_xor64('h', str(int(_H2_SALT))), 'h2raw')}"
        "  FROM terms"
        "), hv2 AS ("
        "  SELECT tok, h, c, h1, (h2raw // 2) * 2 + 1 AS h2 FROM hv"
        "), probes AS ("
        f"  SELECT tok, c, dd.d AS d, ((h1 + dd.d * h2) % {m64}) % {width} AS idx"
        f"  FROM hv2, UNNEST(range({depth})) AS dd(d)"
        "), buckets AS ("
        "  SELECT d, idx, sum(c) AS s FROM probes GROUP BY d, idx"
        "), est AS ("
        "  SELECT p.tok, min(b.s) AS est"
        "  FROM probes p JOIN buckets b ON b.d = p.d AND b.idx = p.idx"
        "  GROUP BY p.tok"
        ") "
        "SELECT tok AS term, CAST(est AS BIGINT) AS est_count FROM est "
        f"WHERE est >= {min_count}"
    )


def _scrub_terms_sql() -> str:
    """DuckDB replay of ``scrub_terms`` — same RE2 pattern on both sides
    (pyarrow and DuckDB both compile RE2), global replace + match count."""
    from minhash_ray.pipelines.text import SCRUB_PATTERN, SCRUB_TOKEN

    return (
        "SELECT doc_id, "
        f"CAST(len(regexp_extract_all(text, '{SCRUB_PATTERN}')) AS BIGINT)"
        " AS n_scrubbed, "
        f"regexp_replace(text, '{SCRUB_PATTERN}', '{SCRUB_TOKEN}', 'g')"
        " AS text_scrubbed FROM documents"
    )


def _stratified_sample_sql(k: int = 20) -> str:
    """DuckDB replay of ``stratified_sample_docs``: splitmix64(doc_id)
    emulated with 32-bit-half xor + overflow-safe modular multiplies
    (same technique as the LSH band-key oracle), then a per-lang
    row_number over the hash."""
    m64 = 1 << 64
    ns = 0x9E3779B97F4A7C15
    k1, k2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    return (
        f"WITH sm1 AS (SELECT lang, doc_id, "
        f"(CAST(doc_id AS HUGEINT) + {ns}) % {m64} AS x1 FROM documents), "
        f"sm2 AS (SELECT lang, doc_id, "
        f"{_modmul64(_xor64('x1', 'x1 // 1073741824'), k1)} AS x2 FROM sm1), "
        f"sm3 AS (SELECT lang, doc_id, "
        f"{_modmul64(_xor64('x2', 'x2 // 134217728'), k2)} AS x3 FROM sm2), "
        f"hv AS (SELECT lang, doc_id, {_xor64('x3', 'x3 // 2147483648')} AS h "
        "FROM sm3), "
        "r AS (SELECT lang, doc_id, row_number() OVER ("
        "PARTITION BY lang ORDER BY h, doc_id) AS rnk FROM hv) "
        f"SELECT lang, doc_id, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= {k}"
    )


def _mixture_sample_sql() -> str:
    """DuckDB replay of ``mixture_sample``: per-source integer quotas
    quota_s = min_t floor(w_s * n_t / w_t) with the demo weight
    w = 1 + (first digit run of the source name mod 3)
    (``text.default_mixture_weight``), then a per-source row_number over
    the emulated splitmix64(doc_id) hash gated at the quota."""
    m64 = 1 << 64
    ns = 0x9E3779B97F4A7C15
    k1, k2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    return (
        "WITH wt AS (SELECT source, 1 + (CAST(COALESCE(NULLIF("
        "regexp_extract(source, '[0-9]+'), ''), '0') AS HUGEINT) % 3) AS wgt "
        "FROM (SELECT DISTINCT source FROM documents)), "
        "n AS (SELECT source, CAST(count(*) AS HUGEINT) AS n_s "
        "FROM documents GROUP BY source), "
        "q AS (SELECT wt.source, "
        "(SELECT min((wt.wgt * n2.n_s) // w2.wgt) FROM n n2 "
        " JOIN wt w2 ON w2.source = n2.source WHERE w2.wgt > 0) AS quota "
        "FROM wt JOIN n ON n.source = wt.source WHERE wt.wgt > 0), "
        f"sm1 AS (SELECT source, doc_id, "
        f"(CAST(doc_id AS HUGEINT) + {ns}) % {m64} AS x1 FROM documents), "
        f"sm2 AS (SELECT source, doc_id, "
        f"{_modmul64(_xor64('x1', 'x1 // 1073741824'), k1)} AS x2 FROM sm1), "
        f"sm3 AS (SELECT source, doc_id, "
        f"{_modmul64(_xor64('x2', 'x2 // 134217728'), k2)} AS x3 FROM sm2), "
        f"hv AS (SELECT source, doc_id, {_xor64('x3', 'x3 // 2147483648')} AS h "
        "FROM sm3), "
        "r AS (SELECT source, doc_id, row_number() OVER ("
        "PARTITION BY source ORDER BY h, doc_id) AS rnk FROM hv) "
        "SELECT r.source, r.doc_id FROM r JOIN q ON q.source = r.source "
        "WHERE r.rnk <= q.quota"
    )


def _assign_splits_sql(pct_train: int = 90, pct_val: int = 5) -> str:
    """DuckDB replay of ``assign_splits``: the splitmix64(doc_id) HUGEINT
    emulation of ``_stratified_sample_sql``, bucketed mod 100."""
    m64 = 1 << 64
    ns = 0x9E3779B97F4A7C15
    k1, k2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    lo_val, lo_test = pct_train, pct_train + pct_val
    return (
        f"WITH sm1 AS (SELECT doc_id, "
        f"(CAST(doc_id AS HUGEINT) + {ns}) % {m64} AS x1 FROM documents), "
        f"sm2 AS (SELECT doc_id, "
        f"{_modmul64(_xor64('x1', 'x1 // 1073741824'), k1)} AS x2 FROM sm1), "
        f"sm3 AS (SELECT doc_id, "
        f"{_modmul64(_xor64('x2', 'x2 // 134217728'), k2)} AS x3 FROM sm2), "
        f"hv AS (SELECT doc_id, {_xor64('x3', 'x3 // 2147483648')} AS h FROM sm3) "
        "SELECT doc_id, CAST(h % 100 AS BIGINT) AS bucket, "
        f"CASE WHEN h % 100 < {lo_val} THEN 'train' "
        f"WHEN h % 100 < {lo_test} THEN 'val' ELSE 'test' END AS split "
        "FROM hv"
    )


def _pii_scrub_sql() -> str:
    """Replays pii_scrub's sequenced count+replace chain: each category is
    counted on the previous category's redacted text (both engines RE2)."""
    from minhash_ray.pipelines.text import PII_EMAIL, PII_IP, PII_PHONE

    def esc(p: str) -> str:
        # DuckDB standard string literals are escape-free: only quotes
        # need doubling; backslashes pass through to RE2 verbatim
        return p.replace("'", "''")

    e, ph, ip = esc(PII_EMAIL), esc(PII_PHONE), esc(PII_IP)
    return (
        "WITH s1 AS (SELECT doc_id, text AS t0, "
        f"CAST(len(regexp_extract_all(text, '{e}')) AS BIGINT) AS n_emails, "
        f"regexp_replace(text, '{e}', '<EMAIL>', 'g') AS t1 FROM documents), "
        "s2 AS (SELECT doc_id, n_emails, "
        f"CAST(len(regexp_extract_all(t1, '{ph}')) AS BIGINT) AS n_phones, "
        f"regexp_replace(t1, '{ph}', '<PHONE>', 'g') AS t2 FROM s1) "
        "SELECT doc_id, "
        f"regexp_replace(t2, '{ip}', '<IP>', 'g') AS text_redacted, "
        "n_emails, n_phones, "
        f"CAST(len(regexp_extract_all(t2, '{ip}')) AS BIGINT) AS n_ips FROM s2"
    )


def _dup_spans_cte(L: int = 24) -> str:
    """Shared CTE body for the ExactSubstr dup-span oracles: every L-char
    window whose literal substring occurs >= 2 times corpus-wide, merged
    into maximal per-doc gaps-and-islands spans (windows chain while the
    start-to-start gap is <= L).  Character-based (engine is byte-based;
    identical on the ASCII corpus — same contract as ``_rolling_fp_sql``)."""
    return (
        f"w AS (SELECT doc_id, unnest(generate_series(0, length(text) - {L})) AS p, "
        f"text FROM documents WHERE length(text) >= {L}), "
        f"wg AS (SELECT doc_id, p, substr(text, CAST(p + 1 AS BIGINT), {L}) AS g FROM w), "
        "dg AS (SELECT g FROM wg GROUP BY g HAVING count(*) >= 2), "
        "dw AS (SELECT doc_id, p FROM wg JOIN dg USING (g)), "
        "isl AS (SELECT doc_id, p, CASE WHEN p - lag(p) OVER "
        f"(PARTITION BY doc_id ORDER BY p) <= {L} THEN 0 ELSE 1 END AS brk FROM dw), "
        "grp AS (SELECT doc_id, p, sum(brk) OVER (PARTITION BY doc_id ORDER BY p "
        "ROWS UNBOUNDED PRECEDING) AS gid FROM isl), "
        "spans AS (SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start, "
        f"CAST(max(p) + {L} AS BIGINT) AS span_end, "
        f"CAST(max(p) + {L} - min(p) AS BIGINT) AS span_len "
        "FROM grp GROUP BY doc_id, gid)"
    )


def _dup_spans_sql(L: int = 24) -> str:
    return (
        f"WITH {_dup_spans_cte(L)} "
        "SELECT doc_id, span_start, span_end, span_len FROM spans"
    )


def _dup_span_scrub_sql(L: int = 24) -> str:
    """Scrub oracle: complement intervals per doc (lag(span_end) chains
    the kept segments; one trailing segment past the last span), rebuilt
    with an ordered string_agg."""
    return (
        f"WITH {_dup_spans_cte(L)}, "
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans, "
        "CAST(sum(span_len) AS BIGINT) AS n_dup_chars, "
        "max(span_end) AS last_end FROM spans GROUP BY doc_id), "
        "seg AS (SELECT doc_id, coalesce(lag(span_end) OVER "
        "(PARTITION BY doc_id ORDER BY span_start), 0) AS s, span_start AS e "
        "FROM spans "
        "UNION ALL SELECT doc_id, last_end AS s, NULL AS e FROM agg), "
        "clean AS (SELECT seg.doc_id, string_agg("
        "substr(d.text, CAST(seg.s + 1 AS BIGINT), "
        "CAST(coalesce(seg.e, length(d.text)) - seg.s AS BIGINT)), '' "
        "ORDER BY seg.s) AS clean_text "
        "FROM seg JOIN documents d USING (doc_id) "
        "WHERE coalesce(seg.e, length(d.text)) > seg.s GROUP BY seg.doc_id) "
        "SELECT d.doc_id, "
        "coalesce(c.clean_text, CASE WHEN a.doc_id IS NULL THEN d.text ELSE '' END) "
        "AS clean_text, coalesce(a.n_spans, 0) AS n_spans, "
        "coalesce(a.n_dup_chars, 0) AS n_dup_chars "
        "FROM documents d LEFT JOIN agg a USING (doc_id) "
        "LEFT JOIN clean c USING (doc_id)"
    )


def oracle_sql() -> dict[str, str]:
    n_tokens = (
        "CASE WHEN trim(text) = '' THEN 0 "
        "ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) END"
    )
    return {
        "token_counts": f"SELECT doc_id, {n_tokens} AS n_tokens FROM documents",
        # exact global percent_rank of the token count: both sides compute
        # (#strictly smaller)/(N-1) as an IEEE double of exact int64s
        "token_percent_rank": (
            f"WITH n AS (SELECT doc_id, {n_tokens} AS n_tokens FROM documents) "
            "SELECT doc_id, n_tokens, "
            "percent_rank() OVER (ORDER BY n_tokens) AS pct_rank FROM n"
        ),
        # deterministic hash split: splitmix64(doc_id) emulated in HUGEINT
        # (the _stratified_sample_sql chain), bucket = h mod 100
        "assign_splits": _assign_splits_sql(),
        # sequence packing: running token sum over the splitmix64 order
        # (window fn) // budget — same integer arithmetic as the engine's
        # partitioned prefix scan
        "pack_sequences": (
            "WITH sm1 AS (SELECT doc_id, "
            f"{n_tokens} AS n_tokens, "
            f"(CAST(doc_id AS HUGEINT) + {0x9E3779B97F4A7C15}) % {1 << 64} AS x1 "
            "FROM documents), "
            f"sm2 AS (SELECT doc_id, n_tokens, "
            f"{_modmul64(_xor64('x1', 'x1 // 1073741824'), 0xBF58476D1CE4E5B9)} AS x2 FROM sm1), "
            f"sm3 AS (SELECT doc_id, n_tokens, "
            f"{_modmul64(_xor64('x2', 'x2 // 134217728'), 0x94D049BB133111EB)} AS x3 FROM sm2), "
            f"hv AS (SELECT doc_id, n_tokens, {_xor64('x3', 'x3 // 2147483648')} AS h FROM sm3) "
            "SELECT doc_id, n_tokens, CAST(("
            "  sum(n_tokens) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING)"
            "  - n_tokens) // 256 AS BIGINT) AS seq_id "
            "FROM hv"
        ),
        # adjacent-token bigram counts: unnest consecutive positions of the
        # lowercased whitespace token lists, HAVING-gated
        "token_bigram_counts": (
            "WITH toks AS ("
            "  SELECT CASE WHEN trim(lower(text)) = ''"
            "         THEN CAST([] AS VARCHAR[])"
            "         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t"
            "  FROM documents"
            "), pairs AS ("
            "  SELECT t[i] AS tok_a, t[i+1] AS tok_b"
            "  FROM toks, UNNEST(range(1, length(t))) AS r(i)"
            ") "
            "SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS cnt FROM pairs "
            "GROUP BY tok_a, tok_b HAVING count(*) >= 10"
        ),
        # exact corpus-wide term frequencies (the BPE trainer's corpus pass)
        "word_counts": (
            "WITH toks AS ("
            "  SELECT CASE WHEN trim(lower(text)) = ''"
            "         THEN CAST([] AS VARCHAR[])"
            "         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t"
            "  FROM documents"
            "), occ AS (SELECT unnest(t) AS word FROM toks) "
            "SELECT word, CAST(count(*) AS BIGINT) AS c FROM occ GROUP BY word"
        ),
        # global pseudo-shuffle: row_number over the splitmix64(doc_id)
        # order (same HUGEINT hash chain as assign_splits)
        "global_shuffle_order": (
            "WITH sm1 AS (SELECT doc_id, "
            f"(CAST(doc_id AS HUGEINT) + {0x9E3779B97F4A7C15}) % {1 << 64} AS x1 "
            "FROM documents), "
            f"sm2 AS (SELECT doc_id, "
            f"{_modmul64(_xor64('x1', 'x1 // 1073741824'), 0xBF58476D1CE4E5B9)} AS x2 FROM sm1), "
            f"sm3 AS (SELECT doc_id, "
            f"{_modmul64(_xor64('x2', 'x2 // 134217728'), 0x94D049BB133111EB)} AS x3 FROM sm2), "
            f"hv AS (SELECT doc_id, {_xor64('x3', 'x3 // 2147483648')} AS h FROM sm3) "
            "SELECT doc_id, CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT)"
            " AS pos FROM hv"
        ),
        # inverted-index document frequencies: distinct (doc, term) pairs
        # then count per term (lowercased whitespace tokens, df >= 5)
        "term_doc_freq": (
            "SELECT term, CAST(count(*) AS BIGINT) AS df FROM ("
            "  SELECT DISTINCT doc_id, term FROM ("
            "    SELECT doc_id, unnest(regexp_split_to_array("
            "        trim(lower(text)), '\\s+')) AS term"
            "    FROM documents WHERE trim(text) <> ''"
            "  ) WHERE term <> ''"
            ") GROUP BY term HAVING count(*) >= 5"
        ),
        # the Ray side's Misra-Gries pass only PRUNES candidates (with a
        # deterministic superset guarantee); the final gate is exact, so
        # the oracle is a plain count-all HAVING
        "frequent_terms": (
            "WITH tok AS ("
            "  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term"
            "  FROM documents WHERE trim(text) <> ''"
            "), tok2 AS (SELECT term FROM tok WHERE term <> ''),"
            "tot AS (SELECT count(*) AS n FROM tok2) "
            "SELECT term, count(*) AS n_occurrences FROM tok2 GROUP BY term "
            "HAVING count(*) >= (SELECT CAST(ceil(0.002 * n) AS BIGINT) FROM tot)"
        ),
        "stratified_sample_docs": _stratified_sample_sql(),
        "mixture_sample": _mixture_sample_sql(),
        # Gopher-style repetition signals: exact (doc, gram) counts for
        # tokens / adjacent 2-grams / 3-grams plus integer-cross-product
        # gates — engine groups with Arrow group_by, oracle with UNNEST
        "dedup_lines": (
            "WITH ls AS (SELECT doc_id, string_split(text, chr(10)) AS l "
            "FROM documents), "
            "mx AS (SELECT max(len(l)) AS m FROM ls), "
            "ex AS (SELECT doc_id, l[i.k] AS line, i.k AS p "
            "FROM ls, (SELECT unnest(generate_series(1, (SELECT m FROM mx))) AS k) i "
            "WHERE i.k <= len(l)), "
            "f AS (SELECT doc_id, line, min(p) AS fp FROM ex GROUP BY doc_id, line), "
            "agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY fp) "
            "AS text_dedup, count(*) AS n_kept FROM f GROUP BY doc_id), "
            "tot AS (SELECT doc_id, len(l) AS n_lines FROM ls) "
            "SELECT t.doc_id, COALESCE(a.text_dedup, '') AS text_dedup, "
            "CAST(t.n_lines AS BIGINT) AS n_lines, "
            "CAST(t.n_lines - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed "
            "FROM tot t LEFT JOIN agg a USING (doc_id)"
        ),
        "doc_repetition": (
            "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)),"
            " '\\s+') AS t FROM documents WHERE trim(text) <> ''), "
            "tok AS (SELECT doc_id, unnest(t) AS g FROM toks), "
            "t1 AS (SELECT doc_id, count(*) AS n_tokens,"
            " count(DISTINCT g) AS n_distinct FROM tok GROUP BY doc_id), "
            "bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g"
            " FROM toks, UNNEST(range(1, len(t))) AS r(i) WHERE len(t) >= 2), "
            "bgc AS (SELECT doc_id, g, count(*) AS cnt FROM bg GROUP BY doc_id, g), "
            "b1 AS (SELECT doc_id, sum(cnt) AS n_bigrams,"
            " max(cnt) AS top_bigram FROM bgc GROUP BY doc_id), "
            "tg AS (SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g"
            " FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i) WHERE len(t) >= 3), "
            "tgc AS (SELECT doc_id, g, count(*) AS cnt FROM tg GROUP BY doc_id, g), "
            "t3 AS (SELECT doc_id, sum(cnt) AS n_trigrams,"
            " sum(cnt - 1) AS dup_trigrams FROM tgc GROUP BY doc_id) "
            "SELECT d.doc_id AS doc_id, "
            "CAST(COALESCE(t1.n_tokens, 0) AS BIGINT) AS n_tokens, "
            "CAST(COALESCE(t1.n_distinct, 0) AS BIGINT) AS n_distinct_tokens, "
            "CAST(COALESCE(b1.n_bigrams, 0) AS BIGINT) AS n_bigrams, "
            "CAST(COALESCE(b1.top_bigram, 0) AS BIGINT) AS top_bigram_count, "
            "CAST(COALESCE(t3.n_trigrams, 0) AS BIGINT) AS n_trigrams, "
            "CAST(COALESCE(t3.dup_trigrams, 0) AS BIGINT) AS dup_trigram_count, "
            "CAST(CASE WHEN COALESCE(b1.top_bigram, 0) * 100 >"
            " COALESCE(b1.n_bigrams, 0) * 18"
            " OR COALESCE(t3.dup_trigrams, 0) * 100 >"
            " COALESCE(t3.n_trigrams, 0) * 16"
            " THEN 1 ELSE 0 END AS BIGINT) AS flagged "
            "FROM documents d LEFT JOIN t1 USING (doc_id) "
            "LEFT JOIN b1 USING (doc_id) LEFT JOIN t3 USING (doc_id)"
        ),
        "decontaminate": _decontaminate_sql(),
        "repeated_ngram_scrub": _repeated_scrub_sql(),
        "dup_spans": _dup_spans_sql(),
        "dup_span_scrub": _dup_span_scrub_sql(),
        "pii_scrub": _pii_scrub_sql(),
        "bigram_familiarity": _familiarity_sql(),
        "tf_cosine_pairs": _tf_cosine_sql(),
        "cms_term_counts": _cms_counts_sql(),
        "repeated_ngram_dedup": _repeated_dedup_sql(),
        "chunk_documents": _chunk_documents_sql(),
        "scrub_terms": _scrub_terms_sql(),
        "customers_without_orders": (
            "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS "
            "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            "AND o.o_totalprice > 400000.0)"
        ),
        "customers_with_orders": (
            "SELECT c_custkey, c_name FROM customer c WHERE EXISTS "
            "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            "AND o.o_totalprice > 400000.0)"
        ),
        "normalize_text": (
            "SELECT doc_id, trim(regexp_replace(lower(nfc_normalize(text)),"
            " '\\s+', ' ', 'g')) AS text_norm FROM documents"
        ),
        "distinct_users_per_type": (
            "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY event_type"
        ),
        "customer_order_counts": (
            "SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders "
            "FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
            "GROUP BY c.c_custkey, c.c_name"
        ),
        "nation_segment_balance": (
            "WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS k, "
            "count(*) AS n_customers FROM customer "
            "WHERE c_mktsegment = 'AUTOMOBILE' GROUP BY 1), "
            "s AS (SELECT CAST(s_nationkey AS BIGINT) AS k, "
            "count(*) AS n_suppliers FROM supplier GROUP BY 1) "
            "SELECT COALESCE(c.k, s.k) AS nationkey, "
            "COALESCE(c.n_customers, 0) AS n_customers, "
            "COALESCE(s.n_suppliers, 0) AS n_suppliers "
            "FROM c FULL OUTER JOIN s ON s.k = c.k"
        ),
        "users_with_both": (
            "SELECT user_id FROM events WHERE event_type = 'click' "
            "INTERSECT "
            "SELECT user_id FROM events WHERE event_type = 'purchase'"
        ),
        # exact 'lower' order statistics: value at sorted index
        # floor((n-1)·q) — same definition the Ray histogram fold uses
        "bpe_token_counts": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, "
            "'''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+'"
            ")) AS BIGINT) AS n_bpe_tokens FROM documents"
        ),
        # integer-exact tf-idf ordering: tf DESC, df ASC, term ASC
        "salient_terms": (
            "WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array("
            "trim(lower(text)), '\\s+')) AS term FROM documents "
            "WHERE trim(text) <> ''), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok "
            "WHERE term <> '' GROUP BY doc_id, term), "
            "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok "
            "WHERE term <> '' GROUP BY term), "
            "r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df, "
            "row_number() OVER (PARTITION BY tf.doc_id "
            "ORDER BY tf.tf DESC, df.df ASC, tf.term) AS rnk "
            "FROM tf JOIN df USING (term)) "
            "SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, "
            "CAST(df AS BIGINT) AS df, CAST(rnk AS BIGINT) AS rnk "
            "FROM r WHERE rnk <= 3"
        ),
        "lang_token_quantiles": (
            f"WITH c AS (SELECT lang, {n_tokens} AS v FROM documents), "
            "o AS (SELECT lang, v, row_number() OVER (PARTITION BY lang ORDER BY v)"
            " - 1 AS r, count(*) OVER (PARTITION BY lang) AS n FROM c) "
            "SELECT o.lang AS lang, qq.q AS q, o.v AS n_tokens "
            "FROM (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)) qq(q) "
            "JOIN o ON o.r = CAST(floor((o.n - 1) * qq.q) AS BIGINT)"
        ),
        "token_quantiles": (
            f"WITH c AS (SELECT {n_tokens} AS v FROM documents), "
            "o AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS r, "
            "count(*) OVER () AS n FROM c) "
            "SELECT qq.q AS q, o.v AS n_tokens "
            "FROM (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)) qq(q) "
            "JOIN o ON o.r = CAST(floor((o.n - 1) * qq.q) AS BIGINT)"
        ),
        "text_quality": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_measured, "
            f"{n_tokens} AS n_tokens, "
            "CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT)"
            " AS n_punct FROM documents"
        ),
        "doc_fingerprints": "SELECT doc_id, md5(text) AS fp FROM documents",
        "rolling_fingerprints": _rolling_fp_sql(),
        "winnowing_fingerprints": _winnowing_sql(),
        "winnowing_dup_pairs": (
            f"WITH w AS ({_winnowing_sql()}) "
            "SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, "
            "count(*) AS n_shared "
            "FROM w a JOIN w b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id "
            "GROUP BY doc_id_a, doc_id_b HAVING count(*) >= 2"
        ),
        "doc_minhash_slots": _minhash_slots_sql(),
        "clips_minhash_slots": _clips_minhash_slots_sql(),
        # audio-payload ops: the oracle groups/partitions by the raw BLOB;
        # the engine shuffles a 128-bit payload digest instead — an
        # independent identity check of the digest channel
        "audio_stats": _audio_stats_sql(),
        "audio_chunk_plan": _audio_chunk_plan_sql(),
        "clips_rate_outliers": _rate_outliers_sql(),
        "audio_exact_dedup": _audio_exact_dedup_sql(),
        "simhash_fingerprints": _simhash_sql(),
        "simhash_dup_pairs": _simhash_pairs_sql(),
        "minhash_dup_pairs": _lsh_pairs_sql(),
        "bbit_minhash_pairs": _bbit_pairs_sql(),
        "oph_minhash_slots": _oph_slots_sql(),
        "oph_dense_slots": _oph_dense_sql(),
        "oph_dup_pairs": _oph_pairs_sql(),
        "doc_dedup_tiered": _tiered_dedup_sql(),
        "doc_dedup_keep_best": _keep_best_sql(),
        "dup_graph_degrees": _dup_degrees_sql(),
        "dup_graph_pagerank": _dup_pagerank_sql(),
        "cross_source_dups": _cross_source_dups_sql(),
        "dup_graph_components": _dup_components_sql(),
        "dup_knn_graph": _dup_knn_sql(),
        "dup_graph_triangles": _dup_triangles_sql(),
        "minhash_sim_histogram": _sim_histogram_sql(),
        "scoped_dup_pairs": _scoped_pairs_sql(),
        "snm_dup_pairs": _snm_pairs_sql(),
        "dedup_cluster_sizes": (
            f"WITH tiered AS ({{TIERED}}), "
            "sizes AS (SELECT cluster_id, count(*) AS cluster_size "
            "FROM tiered GROUP BY cluster_id) "
            "SELECT cluster_size, count(*) AS n_clusters "
            "FROM sizes GROUP BY cluster_size"
        ).format(TIERED=_tiered_dedup_sql()),
        "corpus_curation": _curation_sql(),
        "curation_report": _curation_report_sql(),
        "training_manifest": _training_manifest_sql(),
        "lang_id": _lang_id_sql(),
        "lang_confusion": (
            f"WITH li AS ({_lang_id_sql()}) "
            "SELECT d.lang AS lang, li.lang_pred AS lang_pred, "
            "count(*) AS n_docs FROM documents d "
            "JOIN li ON li.doc_id = d.doc_id GROUP BY 1, 2"
        ),
        "lang_stats": (
            "SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars "
            "FROM documents GROUP BY lang"
        ),
        "exact_dedup_docs": "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text",
        # exact token-trigram set Jaccard >= 0.3, all pairs (the Ray side
        # uses AllPairs prefix filtering over 64-bit shingle hashes; the
        # hash is injective on the corpus so set sizes agree, and both
        # sides compute jaccard as int64/int64 IEEE double division)
        # weighted (multiset) Jaccard >= 0.7 over whitespace tokens: the
        # oracle computes the min/max-of-tf formula directly (sum max =
        # tot_a + tot_b - sum min); the Ray side runs set Jaccard over
        # occurrence-indexed 64-bit token hashes — equality holds by the
        # same hash-injectivity assumption as the ngram oracle, and both
        # sides divide the identical int64s as IEEE doubles
        "weighted_jaccard_pairs": (
            "WITH toks AS ("
            "  SELECT doc_id, CASE WHEN trim(lower(text)) = ''"
            "         THEN CAST([] AS VARCHAR[])"
            "         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t"
            "  FROM documents"
            "), tf AS ("
            "  SELECT doc_id, u.term AS term, count(*) AS tf"
            "  FROM toks, UNNEST(t) AS u(term) GROUP BY doc_id, u.term"
            "), tot AS (SELECT doc_id, sum(tf) AS tot FROM tf GROUP BY doc_id),"
            "inter AS ("
            "  SELECT a.doc_id AS da, b.doc_id AS db, sum(least(a.tf, b.tf)) AS smin"
            "  FROM tf a JOIN tf b ON a.term = b.term AND a.doc_id < b.doc_id"
            "  GROUP BY da, db"
            ") SELECT i.da AS doc_id_a, i.db AS doc_id_b, "
            "CAST(i.smin AS DOUBLE) / CAST(ta.tot + tb.tot - i.smin AS DOUBLE)"
            " AS wjaccard "
            "FROM inter i JOIN tot ta ON ta.doc_id = i.da "
            "JOIN tot tb ON tb.doc_id = i.db "
            "WHERE CAST(i.smin AS DOUBLE) / CAST(ta.tot + tb.tot - i.smin AS DOUBLE)"
            " >= 0.7"
        ),
        # CCNet-style chunk dedup: DuckDB rebuilds the same fixed 20-word
        # chunks (single-space split, so the oracle splits on ' ' too, NOT
        # \\s+ — chunk boundaries are token-index-exact), keeps the
        # corpus-wide first occurrence of each distinct chunk string
        # (row_number over (doc_id, cidx) — the engine's packed min key),
        # and reassembles per doc in chunk order.  The engine groups by a
        # 128-bit content digest instead of the string; equality holds by
        # digest injectivity on the corpus (same assumption as
        # exact_dedup_docs / the tiered exact tier)
        "chunk_dedup_docs": (
            "WITH toks AS ("
            "  SELECT doc_id, L, CAST(i AS BIGINT) AS i,"
            "         CAST((i - 1) // 20 AS BIGINT) AS cidx"
            "  FROM (SELECT doc_id, string_split(text, ' ') AS L FROM documents) t,"
            "       UNNEST(range(1, len(L) + 1)) AS r(i)"
            "), chunks AS ("
            "  SELECT doc_id, cidx, string_agg(L[i], ' ' ORDER BY i) AS chunk"
            "  FROM toks GROUP BY doc_id, cidx"
            "), ranked AS ("
            "  SELECT doc_id, cidx, chunk, row_number() OVER ("
            "    PARTITION BY chunk ORDER BY doc_id, cidx) AS rn"
            "  FROM chunks"
            ") "
            "SELECT doc_id, "
            "coalesce(string_agg(chunk, ' ' ORDER BY cidx) FILTER (WHERE rn = 1), '')"
            " AS clean_text, "
            "count(*) AS n_chunks, "
            "count(*) FILTER (WHERE rn = 1) AS n_kept "
            "FROM ranked GROUP BY doc_id"
        ),
        # directed containment |A∩B|/|A| >= 0.8 over the same distinct
        # trigram sets as ngram_jaccard_pairs (both sides gate on the
        # IEEE double division of the identical exact int64 counts)
        "containment_pairs": (
            "WITH toks AS ("
            "  SELECT doc_id, CASE WHEN trim(lower(text)) = ''"
            "         THEN CAST([] AS VARCHAR[])"
            "         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t"
            "  FROM documents"
            "), grams AS ("
            "  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g"
            "  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)"
            "  WHERE len(t) >= 3"
            "), sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),"
            "inter AS ("
            "  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c"
            "  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id <> b.doc_id"
            "  GROUP BY da, db"
            ") "
            "SELECT i.da AS doc_id_a, i.db AS doc_id_b, "
            "CAST(i.c AS DOUBLE) / sa.n AS containment "
            "FROM inter i JOIN sizes sa ON i.da = sa.doc_id "
            "WHERE CAST(i.c AS DOUBLE) / sa.n >= 0.8"
        ),
        # cross-corpus dedup: corpus (doc_id % 43 != 0) docs vs the
        # reference subset (doc_id % 43 == 0), exact trigram Jaccard
        "near_dup_vs_reference": (
            "WITH toks AS ("
            "  SELECT doc_id, CASE WHEN trim(lower(text)) = ''"
            "         THEN CAST([] AS VARCHAR[])"
            "         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t"
            "  FROM documents"
            "), grams AS ("
            "  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g"
            "  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)"
            "  WHERE len(t) >= 3"
            "), sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),"
            "inter AS ("
            "  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c"
            "  FROM grams a JOIN grams b ON a.g = b.g"
            "  WHERE a.doc_id % 43 <> 0 AND b.doc_id % 43 = 0"
            "  GROUP BY da, db"
            ") "
            "SELECT i.da AS doc_id, i.db AS ref_doc_id, "
            "CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) AS jaccard "
            "FROM inter i JOIN sizes sa ON i.da = sa.doc_id "
            "JOIN sizes sb ON i.db = sb.doc_id "
            "WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.3"
        ),
        "ngram_jaccard_pairs": (
            "WITH toks AS ("
            "  SELECT doc_id, CASE WHEN trim(lower(text)) = ''"
            "         THEN CAST([] AS VARCHAR[])"
            "         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t"
            "  FROM documents"
            "), grams AS ("
            "  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g"
            "  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)"
            "  WHERE len(t) >= 3"
            "), sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),"
            "inter AS ("
            "  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c"
            "  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id"
            "  GROUP BY da, db"
            ") "
            "SELECT i.da AS doc_id_a, i.db AS doc_id_b, "
            "CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) AS jaccard "
            "FROM inter i JOIN sizes sa ON i.da = sa.doc_id "
            "JOIN sizes sb ON i.db = sb.doc_id "
            "WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.3"
        ),
        "embedding_pairs_exact": (
            "SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35"
        ),
        "embedding_dup_pairs": _embedding_lsh_sql(),
        "ann_topk_ivf": _ivf_topk_sql(),
        "ann_topk_pq": _pq_topk_sql(),
        "semantic_dedup": _semantic_dedup_sql(),
        "ann_topk": (
            "SELECT vec_id, CAST(row_number() OVER ("
            "ORDER BY list_cosine_similarity(embedding, "
            "(SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC, vec_id) AS BIGINT)"
            " AS rank FROM embeddings WHERE vec_id <> 0 "
            "ORDER BY rank LIMIT 10"
        ),
        "lineitem_agg": (
            "SELECT l_returnflag, l_linestatus, count(*) AS n_rows, "
            "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS revenue_cents "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "orders_by_segment": (
            "SELECT c_mktsegment, count(*) AS n_orders, "
            "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents "
            "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"
        ),
        "top_customers": (
            "SELECT o_custkey AS c_custkey, count(*) AS n_orders FROM orders "
            "GROUP BY o_custkey ORDER BY n_orders DESC, c_custkey LIMIT 10"
        ),
        # per-group top-k: row_number() OVER (PARTITION BY ...) <= k,
        # deterministic tie-break on o_orderkey
        "top_orders_per_customer": (
            "SELECT o_custkey, o_orderkey, price_cents, rnk FROM ("
            "  SELECT o_custkey, o_orderkey, "
            "         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents, "
            "         row_number() OVER (PARTITION BY o_custkey "
            "           ORDER BY floor(o_totalprice * 100 + 0.5) DESC, o_orderkey"
            "         ) AS rnk FROM orders"
            ") WHERE rnk <= 3"
        ),
        "supplier_regions": (
            "SELECT r_name, count(*) AS n_suppliers FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
        ),
        # --- event-stream window operators (minhash_ray/pipelines/events.py)
        # window_us is the tumbling-window start in int64 epoch-us; value
        # sums in integer cents so float order can't flip a bit
        "retention_cohorts": _retention_sql(),
        # per-user z-outliers: HUGEINT replay of the integer moment gate
        "value_outliers": (
            "WITH ev AS (SELECT event_id, user_id, "
            "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc FROM events), "
            "st AS (SELECT user_id, CAST(count(*) AS HUGEINT) AS n, "
            "CAST(sum(vc) AS HUGEINT) AS s, "
            "CAST(sum(CAST(vc AS HUGEINT) * vc) AS HUGEINT) AS s2 "
            "FROM ev GROUP BY 1) "
            "SELECT e.event_id, e.user_id, e.vc AS value_cents "
            "FROM ev e JOIN st ON st.user_id = e.user_id "
            "WHERE (e.vc * st.n - st.s) * (e.vc * st.n - st.s) "
            "> 9 * (st.n * st.s2 - st.s * st.s)"
        ),
        # per-window top-k event types by count, ties by type asc
        "window_top_events": (
            f"WITH wc AS (SELECT (epoch_us(ts) // {3_600_000_000}) * {3_600_000_000}"
            " AS window_us, event_type, COUNT(*) AS n_events FROM events GROUP BY 1, 2), "
            "r AS (SELECT window_us, event_type, n_events, row_number() OVER ("
            "PARTITION BY window_us ORDER BY n_events DESC, event_type) AS rnk FROM wc) "
            "SELECT window_us, event_type, CAST(n_events AS BIGINT) AS n_events, "
            "CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 3"
        ),
        "window_counts": (
            f"SELECT (epoch_us(ts) // {3_600_000_000}) * {3_600_000_000} AS window_us, "
            "event_type, COUNT(*) AS n_events, "
            "CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents "
            "FROM events GROUP BY 1, 2"
        ),
        # sliding windows: each event joins every hop-aligned window start
        # in (ts - window, ts] via generate_series over hop indices
        "sliding_window_distinct_users": (
            "WITH ev AS (SELECT epoch_us(ts) AS tsu, user_id FROM events) "
            f"SELECT s.k * {900_000_000} AS window_us, "
            "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM ev, UNNEST(generate_series("
            f"  (tsu - {3_600_000_000}) // {900_000_000} + 1, tsu // {900_000_000}"
            ")) AS s(k) GROUP BY 1"
        ),
        "sliding_window_counts": (
            "WITH ev AS (SELECT epoch_us(ts) AS tsu, event_type, "
            "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc FROM events) "
            f"SELECT s.k * {900_000_000} AS window_us, event_type, "
            "COUNT(*) AS n_events, CAST(SUM(vc) AS BIGINT) AS value_cents "
            "FROM ev, UNNEST(generate_series("
            f"  (tsu - {3_600_000_000}) // {900_000_000} + 1, tsu // {900_000_000}"
            ")) AS s(k) GROUP BY 1, 2"
        ),
        "sessionize": (
            "WITH g AS (SELECT event_id, user_id, ts, "
            f"CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {1_800_000_000} "
            "THEN 1 ELSE 0 END AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT event_id, user_id, "
            "CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) "
            "AS session_seq FROM g"
        ),
        # per-session stats: the sessionize window chain + one GROUP BY
        "active_sessions_per_window": (
            "WITH g AS (SELECT event_id, user_id, epoch_us(ts) AS tsu, "
            f"CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {1_800_000_000} "
            "THEN 1 ELSE 0 END AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT user_id, tsu, "
            "CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS BIGINT) "
            "AS session_seq FROM g), "
            "ses AS (SELECT user_id, session_seq, min(tsu) AS st, max(tsu) AS en "
            "FROM s GROUP BY user_id, session_seq) "
            f"SELECT t.k * {3_600_000_000} AS window_us, "
            "CAST(count(*) AS BIGINT) AS n_sessions "
            "FROM ses, UNNEST(generate_series("
            f"st // {3_600_000_000}, en // {3_600_000_000}"
            ")) AS t(k) GROUP BY 1"
        ),
        "session_stats": (
            "WITH g AS (SELECT event_id, user_id, epoch_us(ts) AS tsu, "
            f"CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {1_800_000_000} "
            "THEN 1 ELSE 0 END AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT user_id, tsu, "
            "CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS BIGINT) "
            "AS session_seq FROM g) "
            "SELECT user_id, session_seq, count(*) AS n_events, "
            "CAST(max(tsu) - min(tsu) AS BIGINT) AS duration_us "
            "FROM s GROUP BY user_id, session_seq"
        ),
        "event_type_transitions": (
            "WITH lagged AS ("
            "  SELECT user_id, event_type, lag(event_type) OVER ("
            "    PARTITION BY user_id ORDER BY ts, event_id) AS prev_type"
            "  FROM events"
            ") "
            "SELECT prev_type, event_type, count(*) AS n_transitions "
            "FROM lagged WHERE prev_type IS NOT NULL "
            "GROUP BY prev_type, event_type"
        ),
        # ordered funnel: min-ts chain, each step strictly after the prior
        # step's earliest feasible time (greedy-earliest is optimal) —
        # generated from the SAME steps tuple the Ray operator defaults to
        "funnel_counts": _funnel_sql(),
        "interarrival_stats": (
            "WITH d AS (SELECT event_type, "
            "epoch_us(ts) - lag(epoch_us(ts)) OVER ("
            "  PARTITION BY user_id, event_type ORDER BY ts, event_id) AS delta "
            "FROM events) "
            "SELECT event_type, count(*) AS n_deltas, "
            "CAST(sum(delta) AS BIGINT) AS sum_delta_us, "
            "CAST(min(delta) AS BIGINT) AS min_delta_us, "
            "CAST(max(delta) AS BIGINT) AS max_delta_us "
            "FROM d WHERE delta IS NOT NULL GROUP BY event_type"
        ),
        "user_event_paths": (
            "WITH p AS (SELECT user_id, "
            "string_agg(event_type, '>' ORDER BY ts, event_id) AS path "
            "FROM events GROUP BY user_id) "
            "SELECT path, count(*) AS n_users FROM p GROUP BY path"
        ),
        "latest_event_per_user": (
            "WITH r AS (SELECT user_id, event_id, event_type, "
            "epoch_us(ts) AS ts_us, row_number() OVER ("
            "  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
            "FROM events) "
            "SELECT user_id, event_id, event_type, ts_us FROM r WHERE rn = 1"
        ),
        "type_cooccurrence": (
            "WITH d AS (SELECT DISTINCT user_id, event_type FROM events) "
            "SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "count(*) AS n_users FROM d a JOIN d b "
            "ON a.user_id = b.user_id AND a.event_type < b.event_type "
            "GROUP BY 1, 2"
        ),
        "lang_source_pivot": (
            "SELECT source, "
            + ", ".join(
                f"CAST(sum(CASE WHEN lang = '{l}' THEN 1 ELSE 0 END) AS BIGINT)"
                f" AS n_{l}"
                for l in ("de", "en", "es", "fr", "zh")
            )
            + ", CAST(sum(CASE WHEN lang NOT IN "
            "('de','en','es','fr','zh') THEN 1 ELSE 0 END) AS BIGINT) AS n_other "
            "FROM documents GROUP BY source"
        ),
        "value_winsorize": (
            "WITH c AS (SELECT event_id, "
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc FROM events), "
            "o AS (SELECT vc, row_number() OVER (ORDER BY vc) - 1 AS r, "
            "count(*) OVER () AS n FROM c), "
            "lo AS (SELECT vc FROM o "
            "WHERE r = CAST(floor((n - 1) * 0.01) AS BIGINT) LIMIT 1), "
            "hi AS (SELECT vc FROM o "
            "WHERE r = CAST(floor((n - 1) * 0.99) AS BIGINT) LIMIT 1) "
            "SELECT c.event_id, c.vc AS value_cents, "
            "CAST(least(greatest(c.vc, lo.vc), hi.vc) AS BIGINT) "
            "AS value_cents_w FROM c, lo, hi"
        ),
        "value_histogram": (
            "WITH c AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents "
            "FROM events) "
            "SELECT CAST(floor(cents / 500.0) AS BIGINT) * 500 AS bin_lo_cents, "
            "count(*) AS n_events FROM c GROUP BY 1"
        ),
        "posting_lists": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(string_split_regex(trim(text), '\\s+')) AS term "
            "FROM documents WHERE trim(text) <> ''), "
            "d AS (SELECT DISTINCT term, doc_id FROM tok), "
            "r AS (SELECT term, doc_id, row_number() OVER ("
            "  PARTITION BY term ORDER BY doc_id) AS rank FROM d) "
            "SELECT term, CAST(rank AS BIGINT) AS rank, doc_id "
            "FROM r WHERE rank <= 5"
        ),
        "gopher_quality_gate": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(string_split_regex(trim(text), '\\s+')) AS w "
            "FROM documents WHERE trim(text) <> ''), "
            "agg AS (SELECT doc_id, count(*) AS n_tokens, "
            "CAST(sum(length(w)) AS BIGINT) AS tok_chars, "
            "CAST(sum(CASE WHEN regexp_matches(w, '[A-Za-z]') THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_alpha_tokens, "
            "CAST(count(DISTINCT CASE WHEN w IN "
            "('the','a','of','to','and','in') THEN w END) AS BIGINT) "
            "AS n_stopwords FROM tok GROUP BY doc_id), "
            "f AS (SELECT d.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens, "
            "COALESCE(a.tok_chars, 0) AS tok_chars, "
            "COALESCE(a.n_alpha_tokens, 0) AS n_alpha_tokens, "
            "COALESCE(a.n_stopwords, 0) AS n_stopwords "
            "FROM documents d LEFT JOIN agg a USING (doc_id)) "
            "SELECT doc_id, n_tokens, tok_chars, n_alpha_tokens, n_stopwords, "
            "(n_tokens >= 10 AND n_tokens <= 100000 "
            "AND 10 * tok_chars >= 20 * n_tokens "
            "AND 10 * tok_chars <= 120 * n_tokens "
            "AND 100 * n_alpha_tokens >= 80 * n_tokens "
            "AND n_stopwords >= 2) AS keep FROM f"
        ),
        "props_field_stats": (
            "WITH x AS (SELECT event_type, "
            "CAST(json_extract_string(props, '$.k') AS BIGINT) AS v "
            "FROM events) "
            "SELECT event_type, count(*) AS n_with_field, "
            "CAST(sum(v) AS BIGINT) AS sum_v, "
            "CAST(min(v) AS BIGINT) AS min_v, "
            "CAST(max(v) AS BIGINT) AS max_v "
            "FROM x WHERE v IS NOT NULL GROUP BY event_type"
        ),
        "trailing_value_sum": (
            "SELECT event_id, user_id, "
            "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER ("
            "  PARTITION BY user_id ORDER BY ts, event_id "
            "  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) "
            "AS trail_cents FROM events"
        ),
        "cumulative_user_value": (
            "SELECT event_id, user_id, "
            "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER ("
            "  PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) "
            "AS cum_cents FROM events"
        ),
        "shipping_priority": (
            "WITH li AS (SELECT l_orderkey AS o_orderkey, "
            "CAST(sum(CAST(floor(((l_extendedprice * (1 - l_discount)) * 100) "
            "+ 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents "
            "FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-06-15' "
            "GROUP BY l_orderkey), "
            "o AS (SELECT o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us, "
            "o_orderpriority FROM orders JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND o_orderdate < TIMESTAMP '1998-06-15') "
            "SELECT li.o_orderkey, li.revenue_cents, o.o_orderdate_us, "
            "o.o_orderpriority FROM li JOIN o USING (o_orderkey) "
            "ORDER BY revenue_cents DESC, o_orderkey LIMIT 10"
        ),
        "returned_item_revenue": (
            "WITH li AS (SELECT l_orderkey AS o_orderkey, "
            "CAST(sum(CAST(floor(((l_extendedprice * (1 - l_discount)) * 100) "
            "+ 0.5) AS BIGINT)) AS BIGINT) AS rev FROM lineitem "
            "WHERE l_returnflag = 'R' GROUP BY l_orderkey), "
            "o AS (SELECT o_orderkey, o_custkey FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '1995-07-01' "
            "AND o_orderdate < TIMESTAMP '1995-10-01'), "
            "cr AS (SELECT o.o_custkey AS c_custkey, "
            "CAST(sum(li.rev) AS BIGINT) AS revenue_cents "
            "FROM li JOIN o USING (o_orderkey) GROUP BY o.o_custkey) "
            "SELECT cr.c_custkey, c.c_name, n.n_name, cr.revenue_cents "
            "FROM cr JOIN customer c ON cr.c_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "ORDER BY cr.revenue_cents DESC, cr.c_custkey LIMIT 20"
        ),
        "large_volume_customers": (
            "WITH q AS (SELECT l_orderkey AS o_orderkey, "
            "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty "
            "FROM lineitem GROUP BY l_orderkey HAVING "
            "sum(CAST(l_quantity AS BIGINT)) > 250) "
            "SELECT o.o_custkey AS c_custkey, c.c_name, q.o_orderkey, "
            "epoch_us(o.o_orderdate) AS o_orderdate_us, q.total_qty "
            "FROM q JOIN orders o USING (o_orderkey) "
            "JOIN customer c ON o.o_custkey = c.c_custkey"
        ),
        "segment_priority_cube": (
            "SELECT COALESCE(c_mktsegment, '<all>') AS c_mktsegment, "
            "COALESCE(o_orderpriority, '<all>') AS o_orderpriority, "
            "count(*) AS n_orders, "
            "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS total_cents "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY CUBE(c_mktsegment, o_orderpriority)"
        ),
        "length_gate_docs": (
            f"WITH c AS (SELECT doc_id, {n_tokens} AS v FROM documents), "
            "o AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS r, "
            "count(*) OVER () AS n FROM c), "
            "cut AS (SELECT v FROM o "
            "WHERE r = CAST(floor((n - 1) * 0.1) AS BIGINT) LIMIT 1) "
            "SELECT c.doc_id AS doc_id, c.v AS n_tokens "
            "FROM c, cut WHERE c.v >= cut.v"
        ),
        "range_join_recent": (
            "SELECT e.event_id, CAST((SELECT count(*) FROM events c "
            "WHERE c.event_type = 'click' "
            "AND c.ts > e.ts - INTERVAL 5 MINUTE AND c.ts <= e.ts) AS BIGINT) "
            "AS n_recent FROM events e WHERE e.event_type = 'error'"
        ),
        "asof_prior": (
            "SELECT event_id, user_id, prior_event_id FROM ("
            "SELECT event_id, user_id, event_type, "
            "COALESCE(LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END "
            "IGNORE NULLS) OVER w, -1) AS prior_event_id FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
            ") WHERE event_type = 'purchase'"
        ),
        "events_by_type": (
            "SELECT event_type, count(*) AS n_events, "
            "count(DISTINCT user_id) AS n_users, "
            "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents "
            "FROM events GROUP BY event_type"
        ),
        "filtered_lineitem": (
            "SELECT l_returnflag, count(*) AS n_items, "
            "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01' "
            "GROUP BY l_returnflag"
        ),
        "part_brand_stats": (
            "SELECT p_brand, count(*) AS n_parts, "
            "CAST(sum(CAST(p_size AS BIGINT)) AS BIGINT) AS total_size "
            "FROM part GROUP BY p_brand"
        ),
        "revenue_rollup": (
            "WITH base AS ("
            "  SELECT r_name, n_name, "
            "  CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS rc"
            "  FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
            "  JOIN customer ON o_custkey = c_custkey"
            "  JOIN nation ON c_nationkey = n_nationkey"
            "  JOIN region ON n_regionkey = r_regionkey"
            ") "
            "SELECT COALESCE(r_name, '<all>') AS r_name, "
            "COALESCE(n_name, '<all>') AS n_name, "
            "count(*) AS n_items, CAST(sum(rc) AS BIGINT) AS revenue_cents "
            "FROM base GROUP BY ROLLUP(r_name, n_name)"
        ),
        "local_supplier_volume": (
            "SELECT n_name, count(*) AS n_items, "
            "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS revenue_cents "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE c_nationkey = s_nationkey AND r_name = 'ASIA' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' "
            "GROUP BY n_name"
        ),
        "nation_revenue": (
            "SELECT n_name, count(*) AS n_items, "
            "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS revenue_cents "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        ),
    }

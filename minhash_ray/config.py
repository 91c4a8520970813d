"""Frozen pipeline configuration.

Mirrors the reference's ``configuration`` struct (reference:
include/configuration.h:13-23 — sketch_size, prime_modulus, hash_type,
init_size, k, N, b) extended with the engine-level knobs the reference
leaves implicit: shingling, LSH banding, salting, verification thresholds.

The config hash keys every checkpoint so a resume only reuses state
produced under identical semantics.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field, replace

# Largest prime representable in 31 bits; the reference's default modulus
# (reference: test/test_serial.c:10, src/configuration/configuration.c:133).
MERSENNE_31 = 2**31 - 1

# Sentinel for an empty sketch slot (reference INFTY = UINT64_MAX,
# include/minhash.h:23, src/configuration/configuration.c:143-148).
INFTY = 2**64 - 1


@dataclass(frozen=True)
class PipelineConfig:
    """All semantic knobs of the dedup pipeline. Frozen → hashable → lineage."""

    # --- sketch algebra (must match the reference bit-for-bit) ---
    seed: int = 42
    num_perm: int = 128                  # k = sketch_size (reference default 128, test/test_serial.c:9)
    hash_family: str = "pairwise"        # "pairwise" | "kwise" (reference hash_type 0 | 1)
    kwise_degree: int = 2                # polynomial degree for the k-wise family
    modulus: int = MERSENNE_31

    # --- shingling (engine-level; the reference hashes bare uint64 elements) ---
    shingle_mode: str = "token"          # "token" | "char"
    shingle_w: int = 3                   # w-gram width

    # --- LSH banding ---
    bands: int = 32                      # B
    rows_per_band: int = 4               # R; B * R must equal num_perm
    band_group_cap: int = 256            # all-pairs emission cap per band bucket
    salt_hot_bands: bool = True          # detect over-cap buckets and salt their keys
                                         # (sub-bucket count derives from band_group_cap)
    hot_band_threshold: int = 1024       # bucket size above which salting kicks in
    max_hot_buckets: int = 4_000_000     # cap on the driver-resident hot-bucket list;
                                         # beyond it (pathological all-boilerplate
                                         # corpora) candidate generation degrades to
                                         # GLOBAL salting: every bucket is salted and
                                         # connectivity is restored via a star over
                                         # per-(bucket,salt) representatives

    # --- candidate channels ---
    use_simhash_channel: bool = True     # add SimHash chunk-LSH candidates
    simhash_max_hamming: int = 3         # guaranteed recall distance of the simhash
                                         # channel: fingerprints are split into
                                         # (d+1) chunks, so any pair within Hamming
                                         # distance d shares a chunk (pigeonhole)
                                         # and becomes a candidate
    use_exact_channel: bool = True       # content-hash exact-duplicate channel

    # --- verification ---
    tau: float = 0.5                     # similarity threshold defining a duplicate
    verify_margin: float = 0.10          # keep edges with est_sim >= tau - margin:
                                         # the k-slot estimator has std ~ sqrt(j(1-j)/k)
                                         # (~0.044 at j=0.5, k=128); without the margin,
                                         # true pairs at j ~= tau are rejected ~50% of
                                         # the time.  Edges carry `sim`, so consumers
                                         # can re-filter at exactly tau.
    substring_check: bool = False        # compute suffix-automaton LCS ratio for
                                         # text edges that pass the jaccard gate
                                         # (reported in the edges `lcs_ratio` column)
                                         # and additionally require
                                         # lcs_ratio >= substring_min_ratio
    substring_min_ratio: float = 0.0     # LCS gate threshold (0.0 = report-only)
    exact_verify: bool = True            # gate text edges on the TRUE shingle-set
                                         # jaccard (standard LSH verify step); the
                                         # sketch estimator is always reported in
                                         # the edge table.  BOTH verify paths apply
                                         # it identically (shingle sets ride the
                                         # shuffle joins as packed binary), proven
                                         # bit-identical in
                                         # test_shuffle_verify_path_is_bit_identical_to_broadcast.
    exact_verify_pregate: float = -1.0   # estimator floor below which the exact-
                                         # jaccard shingle gather is SKIPPED (the
                                         # pair can then only survive via the audio
                                         # channel).  <0 → auto: max(0, tau -
                                         # 2*verify_margin) ≈ 4.5σ below j=tau at
                                         # k=128, so P(true dup filtered) < 1e-5;
                                         # 0.0 disables the pregate entirely.
                                         # Cuts the gather-bound verify work on
                                         # low-sim candidates (salting star/chain
                                         # pairs, cross-band collisions).  Applied
                                         # identically by both verify paths.

    # --- audio fingerprint ---
    audio_fp_frames: int = 64            # energy-delta frames → 64-bit fingerprint
    use_audio_channel: bool = True       # byte-level audio MinHash LSH channel
    audio_num_perm: int = 64             # OPH slots of the byte-ngram signature
    audio_ngram: int = 4                 # byte w-grams
    audio_bands: int = 16                # audio LSH: 16 bands × 4 rows = 64
    audio_rows_per_band: int = 4
    audio_tau: float = 0.85              # byte-channel edge threshold (near-exact)
    audio_min_filled: int = 24           # OPH slots that must be non-INFTY on both
                                         # sides before the byte channel may gate an
                                         # edge (short payloads fill few slots; shared
                                         # emptiness is not similarity) — and before a
                                         # row emits audio band rows at all

    # --- execution ---
    batch_size: int = 0                  # rows per signature batch; 0 = block
                                         # granularity (batch_size=None), which
                                         # lets Ray Data FUSE the stage with the
                                         # upstream read — payload blocks never
                                         # cross the object store
    signature_concurrency: int = 0       # actor-pool size for the fused
                                         # validate+signature stage; 0 = auto
                                         # (cluster CPUs - 2: it is the heaviest
                                         # compute stage and runs in its own graph)
    broadcast_verify_max_rows: int = 2_000_000   # ≤ this many clips → broadcast-join verify
    driver_uf_max_edges: int = 10_000_000        # ≤ this many edges → driver union-find
    driver_agg_max_rows: int = 50_000_000        # ≤ this many rows → driver-side streaming
                                                 # aggregation for metadata-scale reductions
                                                 # (bucket counts, exact-dup reps); beyond it
                                                 # the distributed groupby paths take over
    pair_dedupe: str = "auto"                    # "auto": global distinct via raw-task hash
                                                 # partition below driver_agg_max_rows, Dataset
                                                 # groupby above (one dup pair hits MANY bands →
                                                 # ~6x duplicate verify+UF work without this);
                                                 # "global": force the groupby path; "local":
                                                 # per-batch dedupe only, duplicate edges
                                                 # tolerated by union-find
    candidate_backend: str = "auto"              # "local": raw-task hash-partition reducers
                                                 # (explicit star+chain caps); "join":
                                                 # Dataset.join self-join (the 10^12 path);
                                                 # "auto" picks by band-row count
    simhash_channel_max_rows: int = 200_000      # simhash chunk channel saturation gate:
                                                 # 16-bit chunks collide at expected bucket
                                                 # size n/2^16 (accidental pairs ~n²/2^15 —
                                                 # quadratic), so above this corpus size the
                                                 # recall booster is dropped where the caller
                                                 # knows n (run_dedup / tiered / append);
                                                 # measured at 1M clips: 27M of 33.8M
                                                 # candidates from this channel, recall
                                                 # delta 1e-4
    candidate_local_max_rows: int = 500_000_000  # "auto" backend switch: ≤ this many band
                                                 # rows → the raw-task reducers (NOT a
                                                 # driver bound — the reducers are fully
                                                 # distributed; ~30 B/row → ≤ ~15 GB
                                                 # exchange, well inside one box or a small
                                                 # cluster's object store).  Beyond it the
                                                 # Dataset.join path takes over (r5: at 1M
                                                 # clips = 52M band rows the join's
                                                 # HashShuffleAggregator OOMed on quadratic
                                                 # sub-threshold bucket groups the reducers'
                                                 # star+chain cap bounds by construction —
                                                 # the old gate driver_agg_max_rows=50M was
                                                 # conflating a driver bound with this
                                                 # backend choice)

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError(
                f"bands*rows_per_band ({self.bands}*{self.rows_per_band}) "
                f"must equal num_perm ({self.num_perm})"
            )
        if self.hash_family not in ("pairwise", "kwise"):
            raise ValueError(f"unknown hash_family {self.hash_family!r}")
        if self.shingle_mode not in ("token", "char"):
            raise ValueError(f"unknown shingle_mode {self.shingle_mode!r}")

    # Only semantic fields participate in the lineage hash — execution knobs
    # (batch size, concurrency, thresholds for broadcast-vs-shuffle) don't
    # change results, so a resume across them is safe.
    _EXEC_FIELDS = (
        "batch_size",
        "signature_concurrency",
        "broadcast_verify_max_rows",
        "driver_uf_max_edges",
        "driver_agg_max_rows",
    )

    def semantic_dict(self) -> dict:
        d = asdict(self)
        for k in self._EXEC_FIELDS:
            d.pop(k, None)
        return d

    def config_hash(self) -> str:
        payload = json.dumps(self.semantic_dict(), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]

    def with_(self, **kw) -> "PipelineConfig":
        return replace(self, **kw)


DEFAULT_CONFIG = PipelineConfig()

"""End-to-end corpus curation — the composite pipeline a training-data
run actually executes, built entirely from the engine's own operators:

    documents ──tiered dedup (exact digest tier → LSH near tier →
                 connected components, per-doc keep flag)
              ──language ID (profile-gram heuristic)
              ──quality features (token / char / punctuation counts)
    → keep == 1  AND  n_tokens ≥ min_tokens  AND  punct ratio bound
    → (doc_id, n_tokens, lang_pred)  — the curated corpus manifest

Everything is a partitioned hash join over slim int64-keyed rows; the
only corpus-width data ever touched is inside the component pipelines,
each of which is independently DuckDB-oracle-checked — and so is this
composition (the oracle WITH-composes the three sub-oracles and replays
the same joins and integer gates).

The punctuation gate is integer-exact (``n_punct · punct_denom ≤
n_chars``) so no float ratio can flip a row between engines.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from minhash_ray.config import PipelineConfig
from minhash_ray.pipelines.dedup_text import DOC_CFG, doc_dedup_tiered
from minhash_ray.pipelines.text import lang_id, text_quality


def corpus_curation(
    sf_dir: str,
    cfg: PipelineConfig = DOC_CFG,
    min_tokens: int = 10,
    punct_denom: int = 20,
    num_partitions: int = 8,
    ckpt_root: str | None = None,
):
    """(doc_id, n_tokens, lang_pred) for every document that survives
    dedup (its cluster's canonical representative), has at least
    ``min_tokens`` tokens, and whose punctuation count satisfies
    ``n_punct * punct_denom <= n_chars`` (≤ 1/punct_denom of chars).

    ``ckpt_root`` enables per-tier checkpoints in the dedup stage (see
    :func:`doc_dedup_tiered`); a rerun resumes from completed tiers."""
    from minhash_ray.util import clamp_partitions, strip_empty_blocks

    np_parts = clamp_partitions(num_partitions)

    kept = doc_dedup_tiered(
        sf_dir, cfg, num_partitions=num_partitions, ckpt_root=ckpt_root
    ).filter(expr="keep == 1")

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id")})

    kept_ids = kept.map_batches(slim, batch_format="pyarrow")

    quality = text_quality(sf_dir)

    def quality_gate(batch: pa.Table) -> pa.Table:
        n_tok = batch.column("n_tokens")
        n_chars = batch.column("n_chars_measured")
        n_punct = batch.column("n_punct")
        ok = pc.and_(
            pc.greater_equal(n_tok, min_tokens),
            pc.less_equal(pc.multiply(n_punct, punct_denom), n_chars),
        )
        t = batch.filter(ok)
        return pa.table({"doc_id": t.column("doc_id"), "n_tokens": t.column("n_tokens")})

    good = quality.map_batches(quality_gate, batch_format="pyarrow")

    with_q = kept_ids.join(
        good, join_type="inner", on=("doc_id",), num_partitions=np_parts
    )
    # mandatory barrier between chained Dataset.joins (util.strip_empty_blocks)
    out = strip_empty_blocks(with_q).join(
        lang_id(sf_dir), join_type="inner", on=("doc_id",), num_partitions=np_parts
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "n_tokens": pc.cast(batch.column("n_tokens"), pa.int64()),
                "lang_pred": batch.column("lang_pred"),
            }
        )

    return out.map_batches(project, batch_format="pyarrow")


def curation_audit(
    sf_dir: str,
    cfg: PipelineConfig = DOC_CFG,
    fraction: float = 0.25,
    seed: int = 42,
    num_partitions: int = 8,
    ckpt_root: str | None = None,
):
    """The spot-check loop a real curation run ships with: sample the
    dedup-KEPT documents and re-verify them against each other with the
    EXACT n-gram Jaccard path (:func:`ngram_jaccard_pairs` — PPJoin prefix
    filter + true shingle-set Jaccard, no sketch approximation) at the
    dedup threshold ``cfg.tau``.

    Every returned row ``(doc_id_a, doc_id_b, jaccard)`` is a MISSED
    near-duplicate: two docs the tiered dedup kept as distinct canonical
    representatives whose TRUE Jaccard is >= tau.  An empty result is the
    audit passing.  Scale shape: the sample is a slim id list joined back
    to the documents table (partitioned hash join), and the exact verifier
    runs only over the sampled subset — audit cost is tunable by
    ``fraction`` independent of corpus size."""
    from minhash_ray.pipelines.dedup_text import _docs, ngram_jaccard_pairs
    from minhash_ray.util import clamp_partitions

    np_parts = clamp_partitions(num_partitions)
    kept = doc_dedup_tiered(
        sf_dir, cfg, num_partitions=num_partitions, ckpt_root=ckpt_root
    ).filter(expr="keep == 1")

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id")})

    sampled = kept.map_batches(slim, batch_format="pyarrow").random_sample(
        fraction, seed=seed
    )
    sample_docs = _docs(sf_dir, ["doc_id", "text"]).join(
        sampled, join_type="inner", on=("doc_id",), num_partitions=np_parts
    )
    return ngram_jaccard_pairs(
        sf_dir, cfg, threshold=cfg.tau, num_partitions=num_partitions,
        docs=sample_docs,
    )

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


def curation_report(
    sf_dir: str,
    cfg: PipelineConfig = DOC_CFG,
    min_tokens: int = 10,
    punct_denom: int = 20,
    num_partitions: int = 8,
    ckpt_root: str | None = None,
):
    """(source, lang, n_docs, tokens_total, n_kept, tokens_kept): the
    per-(source, declared-lang) yield report a curation run ships to its
    operators — how many documents/tokens each dump contributed and how
    many survived dedup + quality gates (low-yield sources are the first
    thing a data owner investigates).

    Scale shape: one map pass annotates every doc with its token count,
    the curated id set attaches by ONE slim left-outer partitioned join
    (keep flag, zero-filled), and the report itself is
    |sources|×|langs| rows — per-batch Arrow partials through a tiny
    final groupby."""
    from minhash_ray.pipelines.text import _docs
    from minhash_ray.util import clamp_partitions, strip_empty_blocks

    np_parts = clamp_partitions(num_partitions)

    kept = corpus_curation(
        sf_dir, cfg, min_tokens=min_tokens, punct_denom=punct_denom,
        num_partitions=num_partitions, ckpt_root=ckpt_root,
    ).map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
             "kept": pa.array([1] * t.num_rows, pa.int64())}
        ),
        batch_format="pyarrow",
    )

    def base_fn(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc2

        toks = pc2.utf8_split_whitespace(pc2.utf8_trim_whitespace(batch.column("text")))
        n = pc2.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        empties = pc2.equal(
            pc2.utf8_trim_whitespace(batch.column("text")), ""
        ).to_numpy(zero_copy_only=False)
        n[empties] = 0
        return pa.table(
            {
                "doc_id": pc2.cast(batch.column("doc_id"), pa.int64()),
                "source": batch.column("source"),
                "lang": batch.column("lang"),
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    base = _docs(sf_dir, ["doc_id", "text", "source", "lang"]).map_batches(
        base_fn, batch_format="pyarrow"
    )
    joined = strip_empty_blocks(base).join(
        strip_empty_blocks(kept),
        join_type="left_outer",
        on=("doc_id",),
        num_partitions=np_parts,
    )

    def partial(batch: pa.Table) -> pa.Table:
        k = pc.fill_null(batch.column("kept"), 0)
        t = pa.table(
            {
                "source": batch.column("source"),
                "lang": batch.column("lang"),
                "one": pc.cast(pa.array([1] * batch.num_rows), pa.int64()),
                "n_tokens": batch.column("n_tokens"),
                "kept": pc.cast(k, pa.int64()),
                "tok_kept": pc.multiply(
                    pc.cast(k, pa.int64()), batch.column("n_tokens")
                ),
            }
        )
        agg = t.group_by(["source", "lang"]).aggregate(
            [("one", "sum"), ("n_tokens", "sum"), ("kept", "sum"), ("tok_kept", "sum")]
        )
        return agg

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .sum(["one_sum", "n_tokens_sum", "kept_sum", "tok_kept_sum"])
    )

    def project(batch: pa.Table) -> pa.Table:
        def c(name):
            return pc.cast(batch.column(name), pa.int64())

        return pa.table(
            {
                "source": batch.column("source"),
                "lang": batch.column("lang"),
                "n_docs": c("sum(one_sum)"),
                "tokens_total": c("sum(n_tokens_sum)"),
                "n_kept": c("sum(kept_sum)"),
                "tokens_kept": c("sum(tok_kept_sum)"),
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


def training_manifest(
    sf_dir: str,
    budget_tokens: int = 256,
    cfg: PipelineConfig = DOC_CFG,
    min_tokens: int = 10,
    punct_denom: int = 20,
    num_partitions: int = 8,
    ckpt_root: str | None = None,
):
    """(doc_id, n_tokens, lang_pred, split, seq_id): the END-TO-END
    training-data manifest — every curated document (dedup keep ×
    quality gates × language ID, :func:`corpus_curation`), assigned a
    deterministic train/val/test split (splitmix64(doc_id) mod 100) and
    packed into fixed-token-budget training sequences WITHIN its split
    (the ``pack_sequences`` ordered-prefix-scan, partitioned by split).

    This is the pipeline a user actually ships: curation feeds packing,
    seq_id is stable across reruns/machines, and the whole composite is
    replayed by ONE WITH-composed DuckDB oracle (curation sub-oracle →
    HUGEINT splitmix chain → per-split window running sum).

    Scale shape: curation's own three wide stages, then one slim
    (doc_id, n_tokens) exchange range-partitioned on (split, hash top
    bits) — partition order agrees with the packing order by
    construction — with a metadata-scale per-(split, part) token-total
    fold; no global row sort."""
    import numpy as np
    import ray

    from minhash_ray.stages.banding import splitmix64
    from minhash_ray.util import cached_get, clamp_partitions

    B = int(budget_tokens)
    np_parts = clamp_partitions(num_partitions)
    k = max(1, int(np.ceil(np.log2(max(2, np_parts)))))
    P = 1 << k
    shift = np.uint64(64 - k)

    curated = corpus_curation(
        sf_dir, cfg, min_tokens=min_tokens, punct_denom=punct_denom,
        num_partitions=num_partitions, ckpt_root=ckpt_root,
    ).materialize()

    def widen(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(ids.astype(np.uint64))
        b = (h % np.uint64(100)).astype(np.int64)
        split_code = np.where(b < 90, 0, np.where(b < 95, 1, 2)).astype(np.int64)
        part = (h >> shift).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": batch.column("n_tokens"),
                "lang_pred": batch.column("lang_pred"),
                "h": pa.array(h.view(np.int64), pa.int64()),
                "spart": pa.array(split_code * P + part, pa.int64()),
            }
        )

    slim = curated.map_batches(widen, batch_format="pyarrow").materialize()

    totals = slim.groupby("spart").sum("n_tokens")
    tt = pa.concat_tables(
        list(totals.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    )
    import numpy as np

    scol = [c for c in tt.column_names if c != "spart"][0]
    sp = tt.column("spart").to_numpy().astype(np.int64)
    sums = tt.column(scol).to_numpy().astype(np.int64)
    per = np.zeros(3 * P, dtype=np.int64)
    per[sp] = sums
    offsets = np.zeros(3 * P, dtype=np.int64)
    for s in range(3):                       # offsets reset per split
        seg = per[s * P : (s + 1) * P]
        offsets[s * P : (s + 1) * P] = np.concatenate(([0], np.cumsum(seg)[:-1]))
    off_ref = [ray.put(offsets)]
    split_names = np.array(["train", "val", "test"])

    def scan(batch: pa.Table) -> pa.Table:
        import numpy as np

        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "lang_pred": pa.array([], pa.string()),
                    "split": pa.array([], pa.string()),
                    "seq_id": pa.array([], pa.int64()),
                }
            )
        offs = cached_get(off_ref[0])
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        h = batch.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
        spart = int(batch.column("spart")[0].as_py())
        order = np.lexsort((ids, h))
        cum_before = offs[spart] + np.cumsum(n[order]) - n[order]
        seq = cum_before // B
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "lang_pred": batch.column("lang_pred"),
                "split": pa.array(split_names[np.full(len(ids), spart // P)], pa.string()),
                "seq_id": pa.array(seq[inv], pa.int64()),
            }
        )

    return slim.groupby("spart").map_groups(scan, batch_format="pyarrow")

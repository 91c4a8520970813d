"""Text-analysis operators over a documents table (doc_id, text, lang,
source, n_chars) — the large-scale training-data-pipeline ops the engine
adds beyond the reference's sketch algebra (SURVEY.md §2.6): token
counting, quality scoring, content fingerprinting, language-ID heuristics.

Every op is a vectorized ``map_batches`` transform; column names are chosen
to match the DuckDB oracle SQL in ``__ray_entry__.oracle_sql`` exactly.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PUNCT = ".,!?;:"


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def token_counts(sf_dir: str):
    """doc_id, n_tokens (whitespace tokenization, empty text → 0)."""

    def fn(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(batch.column("text")))
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        # trim+split leaves [''] for empty strings → count 0
        empties = pc.equal(pc.utf8_trim_whitespace(batch.column("text")), "").to_numpy(
            zero_copy_only=False
        )
        n[empties] = 0
        return pa.table({"doc_id": batch.column("doc_id"), "n_tokens": pa.array(n, pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


# BPE-ish pre-tokenizer pattern (GPT-2-style contraction / letter-run /
# digit-run / punctuation-run classes, lookahead-free so it runs under
# RE2 — BOTH pyarrow and DuckDB compile regexes with RE2, so the two
# engines count identically by construction)
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_counts(sf_dir: str):
    """doc_id, n_bpe_tokens — subword-style token counting via the
    BPE-ish pre-tokenizer regex (the cost-estimation counter of a
    training-data pipeline; whitespace counting is ``token_counts``).
    One vectorized ``count_substring_regex`` kernel per batch."""

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column("text"), BPE_SPLIT_PATTERN)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe_tokens": pc.cast(n, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def token_quantiles(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.9, 0.99)):
    """(q, n_tokens): EXACT discrete quantiles of the per-doc token count —
    the distribution-statistics operator of a corpus-curation pipeline
    (pick length cutoffs from the tails).

    Scale shape: exact quantiles over N rows without a global sort — each
    batch pre-aggregates to (value, count) pairs (``np.unique``), a tiny
    ``groupby(value).sum`` merges the partials, and the driver folds the
    metadata-scale histogram (distinct token counts ≪ docs) into exact
    order statistics: quantile q = the value at sorted index
    ``floor((n-1)·q)`` (numpy 'lower' semantics, replayed exactly by the
    DuckDB oracle's row_number join)."""

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(batch.column("text")))
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        empties = pc.equal(pc.utf8_trim_whitespace(batch.column("text")), "").to_numpy(
            zero_copy_only=False
        )
        n[empties] = 0
        v, c = np.unique(n, return_counts=True)
        return pa.table(
            {"v": pa.array(v, pa.int64()), "c": pa.array(c.astype(np.int64), pa.int64())}
        )

    hist = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .sum("c")
    )
    t = pa.concat_tables(
        list(hist.iter_batches(batch_size=1_048_576, batch_format="pyarrow"))
    )
    ccol = [c for c in t.column_names if c != "v"][0]
    v = t.column("v").to_numpy()
    c = t.column(ccol).to_numpy()
    o = np.argsort(v)
    v, c = v[o], c[o]
    cum = np.cumsum(c)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            continue
        idx = int(np.floor((n - 1) * q))
        out_q.append(float(q))
        out_v.append(int(v[np.searchsorted(cum, idx, side="right")]))
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "n_tokens": pa.array(out_v, pa.int64())}
    )


def text_quality(sf_dir: str):
    """doc_id, n_chars_measured, n_tokens, n_punct — quality-scoring
    features (length / token / punctuation counts), all exact integers so
    the oracle compare is bit-stable."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(text))
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        empties = pc.equal(pc.utf8_trim_whitespace(text), "").to_numpy(zero_copy_only=False)
        n_tok[empties] = 0
        stripped = pc.replace_substring_regex(text, f"[{PUNCT}]", "")
        n_punct = n_chars - pc.utf8_length(stripped).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars_measured": pa.array(n_chars, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_punct": pa.array(n_punct.astype(np.int64), pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def doc_fingerprints(sf_dir: str):
    """doc_id, fp — md5 content fingerprint (exact-dedup key; md5 chosen so
    the DuckDB oracle can reproduce it byte-for-byte)."""

    def fn(batch: pa.Table) -> pa.Table:
        fps = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in
               batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"), "fp": pa.array(fps, pa.string())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def lang_stats(sf_dir: str):
    """lang, n_docs, total_chars — grouped aggregate (partial per block +
    shuffle of partials via Ray's hash aggregation)."""
    from ray.data.aggregate import Count, Sum

    ds = _docs(sf_dir, ["lang", "n_chars"])
    return ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars")
    )


# --- language-ID heuristic (no SQL oracle: model-style scoring) -----------

_LANG_PROFILES = {
    # tiny seeded character-trigram profiles; a real deployment swaps in
    # fastText/CLD3 — the Ray plumbing (stateful actor pool) is identical
    "en": ["the", "and", "ing", " th", "he "],
    "es": ["de ", " de", "os ", "la ", " la"],
    "fr": ["es ", " le", "le ", "de ", " de"],
    "zh": [],
}


# per-worker cache (task-pool form — the profile state is a few dozen
# strings; an actor pool paid ~1-2 s spin-up per query for it)
_LANGID_CACHE: list = []


def _lang_id_fn(batch: pa.Table) -> pa.Table:
    if not _LANGID_CACHE:
        _LANGID_CACHE.append(LangIdStage())
    return _LANGID_CACHE[0](batch)


class LangIdStage:
    """Language-ID heuristic; profile state built once per worker via
    ``_lang_id_fn``."""

    def __init__(self):
        self.profiles = {k: set(v) for k, v in _LANG_PROFILES.items() if v}

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column("text").to_pylist():
            t = (t or "").lower()
            if any(ord(c) > 0x2E80 for c in t[:200]):
                out.append("zh")
                continue
            grams = {t[i : i + 3] for i in range(len(t) - 2)}
            best, score = "unknown", 0
            for lang, prof in self.profiles.items():
                s = len(grams & prof)
                if s > score:
                    best, score = lang, s
            out.append(best)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "lang_pred": pa.array(out, pa.string())}
        )


def lang_id(sf_dir: str):
    """doc_id, lang_pred — n-gram heuristic language ID (worker-cached
    task pool; a real model would flip this back to an actor pool via
    ``map_batches(Cls, concurrency=N)``)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _lang_id_fn, batch_format="pyarrow"
    )


def doc_sample(sf_dir: str, fraction: float = 0.1, seed: int = 42):
    """Seeded sampling operator (``ds.random_sample``, SURVEY §2.6): a
    deterministic random sample of documents with quality columns — the
    spot-check input for recall/precision audits (sample → re-verify by
    exact methods).  Deterministic for a fixed seed + input layout; no SQL
    oracle (the sampling RNG is Ray's)."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(text))
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        empties = pc.equal(pc.utf8_trim_whitespace(text), "").to_numpy(zero_copy_only=False)
        n_tok[empties] = 0
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars_measured": pa.array(n_chars, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .random_sample(fraction, seed=seed)
        .map_batches(fn, batch_format="pyarrow")
    )

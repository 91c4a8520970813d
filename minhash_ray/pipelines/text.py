"""Text-analysis operators over a documents table (doc_id, text, lang,
source, n_chars) — the large-scale training-data-pipeline ops the engine
adds beyond the reference's sketch algebra (SURVEY.md §2.6): token
counting, quality scoring, content fingerprinting, language-ID heuristics.

Every op is a vectorized ``map_batches`` transform; column names are chosen
to match the DuckDB oracle SQL in ``__ray_entry__.oracle_sql`` exactly.
"""

from __future__ import annotations

import hashlib
import logging
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_log = logging.getLogger(__name__)

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


def term_doc_freq(sf_dir: str, min_df: int = 5):
    """(term, df): inverted-index document frequencies — for each distinct
    lowercase whitespace token, the number of documents containing it,
    kept where df >= min_df (the vocabulary/IDF table of a training-data
    pipeline, and the posting-list size profile of an inverted index).

    Scale shape (partial + final, same as every aggregate here): each
    batch dedups (doc, term) pairs on dictionary codes and emits one
    (term, partial_df) row per distinct term IN THE BATCH — so the
    groupby shuffle moves at most |vocab_batch| rows per batch, never the
    corpus' token stream.  Zipf makes the head terms hot, but the partial
    combine has already collapsed them to one row per (term, batch); the
    final fold rides a term-hash partition (the vocabulary is
    corpus-width — never Ray-aggregate groups).
    """

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.utf8_lower(pc.fill_null(texts, ""))
        toks = pc.utf8_split_whitespace(texts)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        # defensive trim: no-op on a correct split; under Ray workers the
        # split kernel rarely emits a final token WITH its trailing space
        # (see functions/shingles.tokenize_with_strings), which would
        # silently fork that token's identity in every downstream count
        flat = pc.utf8_trim_whitespace(flat)
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        row_ids = np.repeat(np.arange(len(toks), dtype=np.int64), np.diff(offsets))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, row_ids = flat.filter(pa.array(keep)), row_ids[keep]
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(codes) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        # distinct (doc, term-code) pairs, then per-code doc counts
        o = np.lexsort((codes, row_ids))
        rs, cs = row_ids[o], codes[o]
        first = np.ones(len(rs), dtype=bool)
        first[1:] = (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])
        df_partial = np.bincount(cs[first], minlength=len(enc.dictionary))
        present = np.flatnonzero(df_partial)
        return pa.table(
            {
                "term": enc.dictionary.take(pa.array(present, pa.int64())),
                "df": pa.array(df_partial[present], pa.int64()),
            }
        )

    from minhash_ray.util import fold_by_str_key

    def final(t: pa.Table) -> pa.Table:
        agg = t.group_by("term").aggregate([("df", "sum")])
        out = pa.table(
            {"term": agg.column("term"), "df": pc.cast(agg.column("df_sum"), pa.int64())}
        )
        return out.filter(pc.greater_equal(out.column("df"), min_df))

    return fold_by_str_key(
        _docs(sf_dir, ["text"]), "term", fn, final, num_partitions=8
    )


def stratified_sample_docs(sf_dir: str, k: int = 20, num_partitions: int = 32):
    """(lang, doc_id, rnk): deterministic per-stratum fixed-quota sample —
    the k documents per language with the smallest ``splitmix64(doc_id)``.
    Hash-ordering makes the sample uniform-at-random w.r.t. any content
    correlate, yet reproducible and SQL-oracle-exact (``doc_sample`` is
    the RNG fraction sampler; this is the quota shape used for eval-set
    carving and per-language audit pools).

    Scale shape: identical two-level exact top-k as
    ``relational.top_orders_per_customer`` — per-batch prune to k rows per
    stratum (vectorized lexsort + segmented rank), hash shuffle of the
    pruned rows only, per-partition exact final pass.  splitmix64 is a
    bijection on uint64, so ranks are tie-free and the oracle can order by
    the hash alone."""
    import ray.data as rd  # noqa: F401  (Dataset comes from _docs)

    from minhash_ray.stages.banding import splitmix64
    from minhash_ray.util import clamp_partitions

    P = np.uint64(max(2, clamp_partitions(num_partitions)))

    def _topk(lang_codes, doc_ids, hv, k):
        order = np.lexsort((doc_ids, hv, lang_codes))
        ls = lang_codes[order]
        n = len(order)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = ls[1:] != ls[:-1]
        idx = np.arange(n, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new, idx, 0))
        r = idx - start
        keep = r < k
        return order[keep], r[keep]

    def local_prune(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        enc = lang.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch.column("doc_id").to_numpy()
        hv = splitmix64(ids.astype(np.uint64))
        sel, _ = _topk(codes, ids, hv, k)
        # partition on the stratum so one task sees a stratum's pruned rows
        lang_sel = lang.take(pa.array(sel, pa.int64()))
        from minhash_ray.functions.hashing import hash_str_array

        uniq_h = hash_str_array(enc.dictionary.to_pylist(), 7)
        pkey = (uniq_h[codes[sel]] % P).astype(np.int64)
        return pa.table(
            {
                "lang": lang_sel,
                "doc_id": pa.array(ids[sel], pa.int64()),
                "hu": pa.array(hv[sel], pa.uint64()),   # payload; ranking key
                "pkey": pa.array(pkey, pa.int64()),
            }
        )

    def final_topk(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        enc = lang.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch.column("doc_id").to_numpy()
        hv = batch.column("hu").to_numpy()
        sel, r = _topk(codes, ids, hv, k)
        return pa.table(
            {
                "lang": lang.take(pa.array(sel, pa.int64())),
                "doc_id": pa.array(ids[sel], pa.int64()),
                "rnk": pa.array(r + 1, pa.int64()),
            }
        )

    pruned = _docs(sf_dir, ["doc_id", "lang"]).map_batches(
        local_prune, batch_format="pyarrow"
    )
    return pruned.groupby("pkey").map_groups(final_topk, batch_format="pyarrow")


def default_mixture_weight(source: str) -> int:
    """Demo per-source target weight: 1 + (first digit run of the name
    mod 3) — mirrored exactly by the DuckDB oracle's
    ``regexp_extract(source, '[0-9]+')`` expression."""
    import re

    m = re.search(r"[0-9]+", source)
    return 1 + (int(m.group(0)) if m else 0) % 3


def mixture_sample(
    sf_dir: str,
    weights=default_mixture_weight,
    bucket_bits: int = 16,
    num_partitions: int = 32,
    docs=None,
):
    """(source, doc_id): downsample every source to a target MIXTURE —
    the per-source reweighting pass a training-data pipeline runs after
    curation so over-represented sources (crawl dumps) don't drown
    curated ones.  ``weights`` maps a source to an integer target weight
    (dict or callable); the kept corpus is the largest one whose
    per-source doc counts are exactly proportional to the weights
    without oversampling any source:

        quota_s = min_t floor(w_s * n_t / w_t)        (pure integers —
                  floor and min commute with the monotone scaling by
                  w_s, so this equals floor(w_s * min_t(n_t / w_t)))

    and each source keeps its quota_s docs with the smallest
    ``splitmix64(doc_id)`` — content-independent, reproducible, and
    SQL-replayable (splitmix64 is a bijection on uint64 so ranks are
    tie-free).

    Scale shape (nothing corpus-width ever sits on the driver):
      1. histogram pass — per-batch partial counts per (source, top
         ``bucket_bits`` bits of the hash) fold through
         ``fold_by_int_keys``; the driver reads ≤ S·2^bits rows
         (metadata-scale: 65k buckets/source at the default) and picks
         per-source cutoff buckets b_s with cum_below(b_s) ≤ quota_s.
      2. tag pass — rows with bucket < b_s are kept outright and spread
         across partitions; ONLY the boundary bucket (≈ n_s / 2^bits
         rows, ~15M at 10^12 docs) is routed to a per-source partition
         for the exact top-``need_s`` rank fix.  One slim shuffle of
         (source, doc_id, h) at output width; text never moves.

    ``stratified_sample_docs`` is the fixed-quota-per-stratum special
    case; this op derives the quotas from corpus statistics + targets."""
    from minhash_ray.functions.hashing import hash_str_array
    from minhash_ray.stages.banding import splitmix64
    from minhash_ray.util import clamp_partitions, fold_by_int_keys

    if bucket_bits < 1 or bucket_bits > 32:
        raise ValueError("bucket_bits must be in [1, 32]")
    shift = np.uint64(64 - bucket_bits)
    n_buckets = 1 << bucket_bits
    ds = docs if docs is not None else _docs(sf_dir, ["doc_id", "source"])

    def _src_codes(batch: pa.Table):
        src = batch.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = enc.dictionary.to_pylist()
        return src, codes, uniq

    def hist_partial(batch: pa.Table) -> pa.Table:
        _, codes, uniq = _src_codes(batch)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.int64).view(np.uint64))
        b = (h >> shift).astype(np.int64)
        order = np.lexsort((b, codes))
        cs, bs = codes[order], b[order]
        first = np.ones(len(cs), dtype=bool)
        if len(cs) > 1:
            first[1:] = (cs[1:] != cs[:-1]) | (bs[1:] != bs[:-1])
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(cs)))
        srch = hash_str_array(uniq, 7).view(np.int64)
        return pa.table(
            {
                "srch": pa.array(srch[cs[starts]], pa.int64()),
                "bucket": pa.array(bs[starts], pa.int64()),
                "source": pa.array([uniq[c] for c in cs[starts]], pa.string()),
                "c": pa.array(counts, pa.int64()),
            }
        )

    def hist_final(t: pa.Table) -> pa.Table:
        sh = t.column("srch").to_numpy(zero_copy_only=False)
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, sh))
        sh, b, c = sh[order], b[order], c[order]
        first = np.ones(len(sh), dtype=bool)
        if len(sh) > 1:
            first[1:] = (sh[1:] != sh[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(c, starts) if len(starts) else np.array([], np.int64)
        src = t.column("source").take(pa.array(order[starts], pa.int64()))
        return pa.table(
            {
                "source": src,
                "bucket": pa.array(b[starts], pa.int64()),
                "c": pa.array(sums.astype(np.int64), pa.int64()),
            }
        )

    hist = fold_by_int_keys(
        ds, ["srch", "bucket"], hist_partial, hist_final, num_partitions
    ).take_all()  # ≤ S · 2^bucket_bits rows — metadata-scale by design

    per_src: dict[str, dict[int, int]] = {}
    for row in hist:
        per_src.setdefault(row["source"], {})[row["bucket"]] = row["c"]
    n_by_src = {s: sum(bc.values()) for s, bc in per_src.items()}
    if callable(weights):
        w_by_src = {s: int(weights(s)) for s in n_by_src}
    else:
        w_by_src = {s: int(weights.get(s, 0)) for s in n_by_src}
    pos = [(n_by_src[t], w_by_src[t]) for t in n_by_src if w_by_src[t] > 0]

    # (cutoff bucket, exact need within it) per source
    cut: dict[str, tuple[int, int]] = {}
    for s, bc in per_src.items():
        w_s = w_by_src[s]
        quota = min((w_s * n_t) // w_t for n_t, w_t in pos) if (w_s > 0 and pos) else 0
        if quota >= n_by_src[s]:
            cut[s] = (n_buckets, 0)
            continue
        cum = 0
        b_cut, need = 0, quota
        for b in sorted(bc):
            if cum + bc[b] > quota:
                b_cut, need = b, quota - cum
                break
            cum += bc[b]
        else:  # pragma: no cover — quota < n_s guarantees a break
            b_cut, need = n_buckets, 0
        cut[s] = (b_cut, need)

    P = np.uint64(max(2, clamp_partitions(num_partitions)))
    PB = np.uint64(max(2, clamp_partitions(num_partitions)))

    def tag(batch: pa.Table) -> pa.Table:
        src, codes, uniq = _src_codes(batch)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.int64).view(np.uint64))
        b = (h >> shift).astype(np.int64)
        b_cut = np.array([cut.get(u, (0, 0))[0] for u in uniq], dtype=np.int64)
        below = b < b_cut[codes]
        boundary = b == b_cut[codes]
        keep = below | boundary
        srch = hash_str_array(uniq, 7)
        pkey = np.where(
            below,
            (h % P).astype(np.int64),
            (P + srch[codes] % PB).astype(np.int64),
        )[keep]
        sel = pa.array(np.flatnonzero(keep), pa.int64())
        return pa.table(
            {
                "source": src.take(sel),
                "doc_id": pa.array(ids[keep], pa.int64()),
                "h": pa.array(h[keep], pa.uint64()),
                "pkey": pa.array(pkey, pa.int64()),
            }
        )

    def resolve(t: pa.Table) -> pa.Table:
        out_cols = ["source", "doc_id"]
        if t.num_rows == 0:
            return t.select(out_cols)
        if t.column("pkey")[0].as_py() < int(P):  # below-cutoff: pass through
            return t.select(out_cols)
        # boundary bucket(s): exact top-need_s per source by (h, doc_id)
        _, codes, uniq = _src_codes(t)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = t.column("h").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h, codes))
        cs = codes[order]
        n = len(cs)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = cs[1:] != cs[:-1]
        idx = np.arange(n, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new, idx, 0))
        rank = idx - start
        need = np.array([cut.get(u, (0, 0))[1] for u in uniq], dtype=np.int64)
        sel = order[rank < need[cs]]
        return pa.table(
            {
                "source": t.column("source").take(pa.array(sel, pa.int64())),
                "doc_id": pa.array(ids[sel], pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(resolve, batch_format="pyarrow")
    )


# denylist-scrub pattern: the PII-scrub shape (emails / long digit runs /
# denylisted entity terms) restricted to classes that actually occur in the
# synthetic corpus so the op is exercised, plus the PII classes for real
# inputs.  RE2-safe (no lookarounds) — pyarrow and DuckDB both compile RE2,
# so replace/count semantics match by construction.
SCRUB_PATTERN = (
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"   # email-shaped
    r"|[0-9]{6,}"                          # long digit runs (ids, phones)
    r"|\b(?:customer|key|window)\b"        # denylisted entity terms
)
SCRUB_TOKEN = "[SCRUBBED]"


def scrub_terms(sf_dir: str):
    """(doc_id, n_scrubbed, text_scrubbed): PII/denylist scrubbing — every
    match of ``SCRUB_PATTERN`` replaced by a fixed token, with a per-doc
    match count (the redaction pass a training-data pipeline runs before
    anything leaves the trust boundary).  One vectorized RE2 replace + one
    count kernel per batch; no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n = pc.count_substring_regex(text, SCRUB_PATTERN)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_scrubbed": pc.cast(n, pa.int64()),
                "text_scrubbed": pc.replace_substring_regex(
                    text, SCRUB_PATTERN, SCRUB_TOKEN
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def lang_token_quantiles(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.9, 0.99)):
    """(lang, q, n_tokens): EXACT per-language quantiles of the per-doc
    token count — the grouped order-statistics operator (length cutoffs
    per stratum, the per-language analog of ``token_quantiles``).

    Scale shape: same histogram trick, grouped — each batch pre-aggregates
    to distinct (lang, value, count) triples, one hash shuffle on lang
    delivers a language's partial histograms to one task (histogram rows ≈
    distinct values × batches, metadata-scale — NOT doc rows), and the
    per-group fold merges counts and reads exact 'lower' order statistics
    at ``floor((n-1)·q)``.  No global sort and nothing corpus-width."""

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(text))
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        empties = pc.equal(pc.utf8_trim_whitespace(text), "").to_numpy(
            zero_copy_only=False
        )
        n[empties] = 0
        lang = batch.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        enc = lang.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((n, codes))
        cs, vs = codes[o], n[o]
        first = np.ones(len(cs), dtype=bool)
        if len(cs) > 1:
            first[1:] = (cs[1:] != cs[:-1]) | (vs[1:] != vs[:-1])
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(cs)))
        return pa.table(
            {
                "lang": enc.dictionary.take(pa.array(cs[starts], pa.int64())),
                "v": pa.array(vs[starts], pa.int64()),
                "c": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    def fold(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang")[0].as_py()
        v = batch.column("v").to_numpy()
        c = batch.column("c").to_numpy()
        o = np.argsort(v, kind="stable")
        v, c = v[o], c[o]
        # merge duplicate values across batches
        first = np.ones(len(v), dtype=bool)
        if len(v) > 1:
            first[1:] = v[1:] != v[:-1]
        vv = v[first]
        cc = np.add.reduceat(c, np.flatnonzero(first)) if len(v) else c
        cum = np.cumsum(cc)
        n = int(cum[-1]) if len(cum) else 0
        out_q, out_v = [], []
        for q in qs:
            if n == 0:
                continue
            idx = int(np.floor((n - 1) * q))
            out_q.append(float(q))
            out_v.append(int(vv[np.searchsorted(cum, idx, side="right")]))
        return pa.table(
            {
                "lang": pa.array([lang] * len(out_q), pa.string()),
                "q": pa.array(out_q, pa.float64()),
                "n_tokens": pa.array(out_v, pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(fold, batch_format="pyarrow")
    )


def salient_terms(sf_dir: str, k: int = 3):
    """(doc_id, term, tf, df, rnk): the k most salient terms per document —
    ranked by term frequency DESC, corpus document-frequency ASC, term ASC
    (the integer-exact tf-idf ordering: most frequent in the doc, rarest
    in the corpus; float idf = ln(N/df) would rank identically for fixed
    tf but is libm-dependent, so the engine and the SQL oracle both use
    the exact integer ordering).

    Scale shape: a two-pass composite.  Pass 1 is ``term_doc_freq``'s
    partial+final df aggregate; the resulting VOCABULARY-scale table
    (Zipf-bounded, ≪ corpus) is collected once, sorted, and broadcast via
    ``ray.put`` — the same derived-small-side pattern as
    ``orders_by_segment``'s dimension table.  Pass 2 streams the corpus:
    per-batch (doc, term) counts via one lexsort, df attach via
    searchsorted into the broadcast pack, and a segmented top-k per doc.
    Contract: the min_df-gated vocabulary must fit worker memory (a
    10^8-term vocab at ~20 B/term is 2 GB — above that, swap pass 2's
    attach for a partitioned join on term, the ``_ngram_verify_join``
    pattern)."""
    import ray

    def df_partial(batch: pa.Table) -> pa.Table:
        # distinct terms per doc, then per-term doc counts (same kernel
        # as term_doc_freq, kept local so the two ops stay independent)
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.utf8_split_whitespace(pc.utf8_lower(pc.fill_null(texts, "")))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        # defensive trim: no-op on a correct split; under Ray workers the
        # split kernel rarely emits a final token WITH its trailing space
        # (see functions/shingles.tokenize_with_strings), which would
        # silently fork that token's identity in every downstream count
        flat = pc.utf8_trim_whitespace(flat)
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        row_ids = np.repeat(np.arange(len(toks), dtype=np.int64), np.diff(offsets))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, row_ids = flat.filter(pa.array(keep)), row_ids[keep]
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(codes) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        o = np.lexsort((codes, row_ids))
        rs, cs = row_ids[o], codes[o]
        first = np.ones(len(rs), dtype=bool)
        first[1:] = (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])
        dfp = np.bincount(cs[first], minlength=len(enc.dictionary))
        present = np.flatnonzero(dfp)
        return pa.table(
            {
                "term": enc.dictionary.take(pa.array(present, pa.int64())),
                "df": pa.array(dfp[present], pa.int64()),
            }
        )

    from minhash_ray.util import fold_by_str_key

    def df_final(t: pa.Table) -> pa.Table:
        agg = t.group_by("term").aggregate([("df", "sum")])
        return pa.table(
            {"term": agg.column("term"), "df": pc.cast(agg.column("df_sum"), pa.int64())}
        )

    df_tbl = pa.concat_tables(
        list(
            fold_by_str_key(
                _docs(sf_dir, ["text"]), "term", df_partial, df_final, 8
            ).iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
    )
    vocab = df_tbl.column("term").to_numpy(zero_copy_only=False).astype("U")
    dfs = df_tbl.column("df").to_numpy()
    o = np.argsort(vocab, kind="stable")     # codepoint order == SQL binary collation
    vocab, dfs = vocab[o], dfs[o]
    pack_ref = ray.put((vocab, dfs))

    def per_doc_topk(batch: pa.Table) -> pa.Table:
        voc, dfv = ray.get(pack_ref)
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.utf8_split_whitespace(pc.utf8_lower(pc.fill_null(texts, "")))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        # defensive trim: no-op on a correct split; under Ray workers the
        # split kernel rarely emits a final token WITH its trailing space
        # (see functions/shingles.tokenize_with_strings), which would
        # silently fork that token's identity in every downstream count
        flat = pc.utf8_trim_whitespace(flat)
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        row_ids = np.repeat(np.arange(len(toks), dtype=np.int64), np.diff(offsets))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, row_ids = flat.filter(pa.array(keep)), row_ids[keep]
        if len(row_ids) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "rnk": pa.array([], pa.int64()),
                }
            )
        # global vocab index = lexicographic rank (doubles as the tie-break)
        vidx = np.searchsorted(voc, flat.to_numpy(zero_copy_only=False).astype("U"))
        # per-(doc, term) tf via one lexsort
        o = np.lexsort((vidx, row_ids))
        rs, vs = row_ids[o], vidx[o]
        first = np.ones(len(rs), dtype=bool)
        first[1:] = (rs[1:] != rs[:-1]) | (vs[1:] != vs[:-1])
        starts = np.flatnonzero(first)
        tf = np.diff(np.append(starts, len(rs))).astype(np.int64)
        drow, dterm = rs[starts], vs[starts]
        ddf = dfv[dterm]
        # segmented top-k per doc under (tf DESC, df ASC, term ASC)
        o2 = np.lexsort((dterm, ddf, -tf, drow))
        rs2 = drow[o2]
        n = len(o2)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = rs2[1:] != rs2[:-1]
        idx = np.arange(n, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new, idx, 0))
        r = idx - start
        sel = o2[r < k]
        rk = r[r < k]
        doc_ids = batch.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[drow[sel]], pa.int64()),
                "term": pa.array(voc[dterm[sel]], pa.string()),
                "tf": pa.array(tf[sel], pa.int64()),
                "df": pa.array(ddf[sel], pa.int64()),
                "rnk": pa.array(rk + 1, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        per_doc_topk, batch_format="pyarrow"
    )


def word_counts(sf_dir: str, num_partitions: int = 32, docs=None):
    """(word, c): exact corpus-wide term frequencies — per-batch bincount
    partials folded through a term-hash partition (``fold_by_str_key``),
    so Ray only ever shuffles (word, partial-count) rows and the full
    Zipf vocabulary never meets a sort-based aggregate."""
    from minhash_ray.util import fold_by_str_key

    ds = docs if docs is not None else _docs(sf_dir, ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        flat = _flat_tokens(batch)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64)
        return pa.table({"word": enc.dictionary, "c": pa.array(c, pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        enc = t.column("word").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        c = t.column("c").to_numpy(zero_copy_only=False)
        sums = np.bincount(codes, weights=c, minlength=len(enc.dictionary))
        return pa.table(
            {"word": enc.dictionary, "c": pa.array(sums.astype(np.int64), pa.int64())}
        )

    return fold_by_str_key(ds, "word", partial, final, num_partitions)


def _collect_histogram_bounded(hist_ds, max_vocab: int):
    """Stream the (word, c) histogram to the driver under a HARD row cap:
    batches accumulate in a buffer that is compacted to the ``max_vocab``
    heaviest words (ties → lexicographically smallest word, a total order,
    so the selection is independent of arrival order) whenever it exceeds
    ``2 * max_vocab`` rows.  Driver memory is therefore provably bounded
    at 2·max_vocab rows + one in-flight batch regardless of corpus
    vocabulary size — the fix for the round-4 ``take_all`` weak mark.

    Returns (words: object ndarray, counts: int64 ndarray,
    n_distinct_seen, n_kept)."""
    words = np.empty(0, dtype=object)
    counts = np.empty(0, dtype=np.int64)
    n_seen = 0

    def compact(w, c, cap):
        # primary: count desc, tie: word asc — two stable argsorts
        o = np.argsort(w, kind="stable")
        o = o[np.argsort(-c[o], kind="stable")]
        o = o[:cap]
        return w[o], c[o]

    for b in hist_ds.iter_batches(batch_format="pyarrow"):
        n_seen += b.num_rows
        bw = b.column("word").to_numpy(zero_copy_only=False)
        bc_ = b.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        words = np.concatenate([words, bw.astype(object)])
        counts = np.concatenate([counts, bc_])
        if len(words) > 2 * max_vocab:
            words, counts = compact(words, counts, max_vocab)
    if len(words) > max_vocab:
        words, counts = compact(words, counts, max_vocab)
    return words, counts, n_seen, len(words)


def _bpe_merge_table(words, counts, n_merges: int) -> "pa.Table":
    """Vectorized BPE merge loop over a (word, count) histogram — the
    driver-side training core of :func:`bpe_train`, O(n_merges · total
    symbols) in numpy instead of the round-4 pure-Python dict loop.

    Words live as ONE flat int64 symbol-id array with a parallel
    word-index array; each round is: adjacent-pair keying (``l * V + r``),
    ``np.unique`` + weighted ``bincount`` for the pair histogram,
    string-lexicographic tie-break among the max-count candidates, then a
    vectorized non-overlapping left-to-right merge (overlap is only
    possible when left == right; alternating positions within each
    consecutive-match run are kept).  Symbol ids are interned by string,
    so two merge paths yielding the same string (e.g. (a,bc) and (ab,c)
    → "abc") collapse to one symbol, exactly as the string-based naive
    reference does."""
    words = [str(w) for w in words]
    lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=len(words))
    wc = np.asarray(counts, dtype=np.int64)
    flat_chars = np.array([ch for w in words for ch in w] or [], dtype=object)
    if len(flat_chars):
        uniq, sym = np.unique(flat_chars, return_inverse=True)
        sym = sym.astype(np.int64)
        sym_strs = [str(s) for s in uniq]
    else:
        sym = np.empty(0, dtype=np.int64)
        sym_strs = []
    sym_index = {s: i for i, s in enumerate(sym_strs)}
    word_of = np.repeat(np.arange(len(words), dtype=np.int64), lens)

    ranks, lefts, rights, mergeds, pcounts = [], [], [], [], []
    for rank in range(n_merges):
        if len(sym) < 2:
            break
        adj = word_of[:-1] == word_of[1:]
        l_ = sym[:-1][adj]
        r_ = sym[1:][adj]
        if len(l_) == 0:
            break
        w_ = wc[word_of[:-1][adj]]
        V = np.int64(len(sym_strs))
        keys = l_ * V + r_
        uk, inv = np.unique(keys, return_inverse=True)
        cnt = np.bincount(inv, weights=w_).astype(np.int64)
        bc = int(cnt.max())
        if bc < 2:
            break
        cand = uk[cnt == bc]
        cl = (cand // V).astype(np.int64)
        cr = (cand % V).astype(np.int64)
        j = min(range(len(cand)), key=lambda i: (sym_strs[cl[i]], sym_strs[cr[i]]))
        la_id, rb_id = int(cl[j]), int(cr[j])
        la, rb = sym_strs[la_id], sym_strs[rb_id]
        merged = la + rb
        new_id = sym_index.get(merged)
        if new_id is None:
            new_id = len(sym_strs)
            sym_strs.append(merged)
            sym_index[merged] = new_id

        pos = np.flatnonzero(
            (sym[:-1] == la_id) & (sym[1:] == rb_id) & (word_of[:-1] == word_of[1:])
        )
        if la_id == rb_id and len(pos) > 1:
            # left-to-right non-overlap: keep alternating positions within
            # each run of consecutive matches (runs only arise when l == r)
            newrun = np.ones(len(pos), dtype=bool)
            newrun[1:] = np.diff(pos) != 1
            idx = np.arange(len(pos), dtype=np.int64)
            run_start = np.maximum.accumulate(np.where(newrun, idx, 0))
            pos = pos[((idx - run_start) % 2) == 0]
        sym[pos] = new_id
        delmask = np.zeros(len(sym), dtype=bool)
        delmask[pos + 1] = True
        sym = sym[~delmask]
        word_of = word_of[~delmask]
        ranks.append(rank)
        lefts.append(la)
        rights.append(rb)
        mergeds.append(merged)
        pcounts.append(bc)

    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
            "merged": pa.array(mergeds, pa.string()),
            "pair_count": pa.array(pcounts, pa.int64()),
        }
    )


def bpe_train(
    sf_dir: str,
    n_merges: int = 30,
    num_partitions: int = 32,
    docs=None,
    min_count: int = 1,
    max_vocab: int = 1_000_000,
):
    """(rank, left, right, merged, pair_count): learn a BPE merge table
    from the corpus — the tokenizer-induction step of a training-data
    pipeline (Sennrich et al. 2016), run the way scalable BPE trainers
    actually run: the CORPUS pass is one distributed word-frequency fold
    (:func:`word_counts`; ``token_bigram_counts`` is the corpus-wide form
    of a single counting round), after which training operates on the
    (word, count) histogram — merge decisions depend only on that
    histogram, so the iterative loop never rescans the corpus.

    Driver memory is HARD-BOUNDED: ``min_count > 1`` prunes rare words
    distributed (before any driver pull), and the streamed collection
    keeps at most ``max_vocab`` heaviest words (≤ 2·max_vocab rows ever
    buffered — :func:`_collect_histogram_bounded`) — the standard
    loss-bounded BPE prune (a dropped word of count c shifts any pair
    count by < c·len(word); at web scale the 10⁸–10⁹-distinct-word tail
    is count-1 noise).  A log line records how much was pruned.  The
    merge loop itself is the vectorized :func:`_bpe_merge_table` (flat
    symbol array + ``np.unique``/weighted ``bincount`` rounds), not a
    Python dict scan.

    Determinism: each round merges the (left, right) symbol pair with the
    highest weighted count, ties broken by the lexicographically smallest
    pair; occurrences merge left-to-right non-overlapping.  Stops early
    when no pair occurs twice.  Words are the lowercased whitespace
    tokens every term-level oracle replays; symbols start as single
    characters (no end-of-word marker — documented deviation from
    GPT-2-style byte-level pretokenization, whose regex is exercised by
    ``bpe_token_counts``)."""
    hist_ds = word_counts(sf_dir, num_partitions=num_partitions, docs=docs)
    if min_count > 1:
        mc = int(min_count)
        hist_ds = hist_ds.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("c"), mc)),
            batch_format="pyarrow",
        )
    w, c, n_seen, n_kept = _collect_histogram_bounded(hist_ds, int(max_vocab))
    if n_kept < n_seen:
        _log.info(
            "bpe_train: histogram pruned %d -> %d words (max_vocab=%d, min_count=%d)",
            n_seen, n_kept, max_vocab, min_count,
        )
    return _bpe_merge_table(w, c, n_merges)


def _flat_tokens(batch: pa.Table):
    """Lowercased whitespace tokens of a batch as a flat StringArray
    (empty tokens dropped) — the tokenization every term-level oracle
    replays with regexp_split_to_array(trim(lower(text)), '\\s+')."""
    texts = batch.column("text")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.utf8_lower(pc.fill_null(texts, "")))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    # defensive trim — see tokenize_with_strings (functions/shingles.py)
    flat = pc.utf8_trim_whitespace(flat)
    return flat.filter(pc.not_equal(flat, ""))


def frequent_terms(sf_dir: str, phi: float = 0.002):
    """(term, n_occurrences): every term whose global occurrence count is
    >= ceil(phi * total_tokens) — EXACT heavy hitters, computed with a
    mergeable Misra-Gries-style summary (Misra & Gries 1982) so no stage
    ever shuffles the full Zipf vocabulary:

    1. **Candidate pass**: each batch emits residual counts
       ``max(0, c_t - floor(n_batch/(k+1)))`` with ``k = ceil(2/phi)``
       counters — the batch form of a k-counter Misra-Gries summary
       (every term loses at most n_batch/(k+1)).  Summing residuals over
       batches undercounts any term by at most N/(k+1) <= phi*N/2, so
       ``sum >= phi*N/2`` is a DETERMINISTIC superset of the true heavy
       hitters; everything lighter is provably below phi*N.
    2. **Exact pass**: the candidate set (metadata-scale, ~2/phi terms)
       broadcasts once; batches re-count exactly for candidates only, a
       tiny groupby-sum finalizes, and the exact ceil(phi*N) gate is
       applied.  Output is exact — the sketch only pruned the candidate
       space, the same two-pass shape as ``salient_terms``.
    """
    import ray
    from ray.data.aggregate import Sum

    from minhash_ray.util import bytes_key_array, cached_get

    k = int(np.ceil(2.0 / phi))
    ds = _docs(sf_dir, ["text"]).materialize()

    def mg_partial(batch: pa.Table) -> pa.Table:
        flat = _flat_tokens(batch)
        n_b = len(flat)
        if n_b == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "r": pa.array([], pa.int64())}
            )
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64)
        resid = c - (n_b // (k + 1))
        pos = np.flatnonzero(resid > 0)
        terms = enc.dictionary.take(pa.array(pos, pa.int64()))
        # one sentinel row carries the batch's token total (the empty term
        # cannot occur: _flat_tokens drops empty tokens)
        return pa.table(
            {
                "term": pa.concat_arrays([terms, pa.array([""], pa.string())]),
                "r": pa.array(np.concatenate([resid[pos], [n_b]]), pa.int64()),
            }
        )

    from minhash_ray.util import fold_by_str_key

    def mg_final(t: pa.Table) -> pa.Table:
        agg = t.group_by("term").aggregate([("r", "sum")])
        return pa.table(
            {"term": agg.column("term"), "r": pc.cast(agg.column("r_sum"), pa.int64())}
        )

    summed = fold_by_str_key(ds, "term", mg_partial, mg_final, 8)
    st = pa.concat_tables(
        list(summed.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    )
    terms_all = st.column("term").combine_chunks()
    r_all = st.column("r").to_numpy()
    sentinel = pc.equal(terms_all, "").to_numpy(zero_copy_only=False)
    n_total = int(r_all[sentinel].sum())
    gate = int(np.ceil(phi * n_total))
    cand_mask = (~sentinel) & (r_all >= max(1, gate - n_total // (k + 1)))
    cand_keys = np.sort(bytes_key_array(terms_all.filter(pa.array(cand_mask))))
    cand_ref = [ray.put(cand_keys)]

    def exact_partial(batch: pa.Table) -> pa.Table:
        keys_s = cached_get(cand_ref[0])
        flat = _flat_tokens(batch)
        if len(flat) == 0 or len(keys_s) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
            )
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dk = bytes_key_array(enc.dictionary)
        pos = np.minimum(np.searchsorted(keys_s, dk), len(keys_s) - 1)
        is_cand = keys_s[pos] == dk
        c = np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64)
        sel = np.flatnonzero(is_cand & (c > 0))
        return pa.table(
            {
                "term": enc.dictionary.take(pa.array(sel, pa.int64())),
                "c": pa.array(c[sel], pa.int64()),
            }
        )

    exact = (
        ds.map_batches(exact_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c", alias_name="n_occurrences"))
    )

    def final_gate(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch.column("n_occurrences"), gate)
        return batch.filter(keep).select(["term", "n_occurrences"])

    return exact.map_batches(final_gate, batch_format="pyarrow")


def doc_repetition(sf_dir: str, docs=None):
    """Gopher-style repetition quality signals (Rae et al. 2021,
    arXiv:2112.11446 §A1.1) per document — the "is this doc degenerate
    boilerplate?" gate of a training-data pipeline:

    * ``n_tokens`` / ``n_distinct_tokens`` — type-token repetition
    * ``n_bigrams`` / ``top_bigram_count`` — fraction of the doc covered
      by its single most frequent 2-gram
    * ``n_trigrams`` / ``dup_trigram_count`` — occurrences beyond first of
      every 3-gram (Gopher's duplicate-n-gram fraction)
    * ``flagged`` — 1 iff top-2-gram fraction > 0.18 or dup-3-gram
      fraction > 0.16 (Gopher-shaped thresholds as integer cross-products
      so the gate is float-free and hash-stable)

    All counts are exact: one vectorized pass builds the token list array,
    adjacency within a doc gives 2/3-grams (no per-row Python), and Arrow
    ``group_by`` on (doc, gram) does the counting in C++.  Every doc emits
    a row (empty docs → all-zero counts)."""
    ds = docs if docs is not None else _docs(sf_dir, ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        nrows = len(text)
        toks = pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(pc.utf8_lower(text))
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        parents = toks.value_parent_indices()
        # trim+split leaves [''] for empty text: drop empty tokens
        mask = pc.not_equal(flat, "")
        flat = flat.filter(mask)
        parents = parents.filter(mask)
        p = parents.to_numpy(zero_copy_only=False).astype(np.int64)
        nt = len(flat)

        def scatter(idx, vals, op=np.add):
            out = np.zeros(nrows, np.int64)
            if len(idx):
                op.at(out, idx, vals)
            return out

        # token counts + distinct tokens per doc
        g1 = pa.table({"p": parents, "g": flat}).group_by(["p", "g"]).aggregate(
            [("g", "count")]
        )
        g1p = g1.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
        g1c = g1.column("g_count").to_numpy(zero_copy_only=False).astype(np.int64)
        n_tokens = scatter(g1p, g1c)
        n_distinct = scatter(g1p, np.ones(len(g1p), np.int64))

        # adjacent 2-grams / 3-grams within a doc (flatten preserves the
        # original token order, so adjacency in `flat` + same-parent masks
        # give the grams with two vectorized joins)
        if nt >= 2:
            same2 = p[1:] == p[:-1]
            bg = pc.binary_join_element_wise(
                flat.slice(0, nt - 1), flat.slice(1, nt - 1), " "
            ).filter(pa.array(same2))
            bp = pa.array(p[:-1][same2], pa.int64())
            g2 = pa.table({"p": bp, "g": bg}).group_by(["p", "g"]).aggregate(
                [("g", "count")]
            )
            g2p = g2.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
            g2c = g2.column("g_count").to_numpy(zero_copy_only=False).astype(np.int64)
            n_bigrams = scatter(g2p, g2c)
            top_bigram = scatter(g2p, g2c, op=np.maximum)
        else:
            n_bigrams = np.zeros(nrows, np.int64)
            top_bigram = np.zeros(nrows, np.int64)
        if nt >= 3:
            same3 = (p[2:] == p[:-2]) & (p[1:-1] == p[:-2])
            tg = pc.binary_join_element_wise(
                flat.slice(0, nt - 2), flat.slice(1, nt - 2), flat.slice(2, nt - 2), " "
            ).filter(pa.array(same3))
            tp = pa.array(p[:-2][same3], pa.int64())
            g3 = pa.table({"p": tp, "g": tg}).group_by(["p", "g"]).aggregate(
                [("g", "count")]
            )
            g3p = g3.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
            g3c = g3.column("g_count").to_numpy(zero_copy_only=False).astype(np.int64)
            n_trigrams = scatter(g3p, g3c)
            dup_trigrams = scatter(g3p, g3c - 1)
        else:
            n_trigrams = np.zeros(nrows, np.int64)
            dup_trigrams = np.zeros(nrows, np.int64)

        flagged = (
            (top_bigram * 100 > n_bigrams * 18)
            | (dup_trigrams * 100 > n_trigrams * 16)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_distinct_tokens": pa.array(n_distinct, pa.int64()),
                "n_bigrams": pa.array(n_bigrams, pa.int64()),
                "top_bigram_count": pa.array(top_bigram, pa.int64()),
                "n_trigrams": pa.array(n_trigrams, pa.int64()),
                "dup_trigram_count": pa.array(dup_trigrams, pa.int64()),
                "flagged": pa.array(flagged, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def normalize_text(sf_dir: str, docs=None):
    """(doc_id, text_norm) — canonical text normalization, the first stage
    of every curation pipeline (and the reason two byte-different documents
    can still be exact duplicates): unicode NFC, lowercase, whitespace
    runs collapsed to single spaces, ends trimmed.  One chain of four
    vectorized Arrow kernels per batch; the DuckDB oracle replays
    nfc_normalize + lower + regexp_replace with identical semantics (both
    engines implement Unicode NFC and RE2 '\\s+')."""
    ds = docs if docs is not None else _docs(sf_dir, ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        # NFC: pyarrow 16's utf8_normalize DECOMPOSES but never composes
        # (NFC output == NFD, verified against python unicodedata and
        # DuckDB utf8proc), so it cannot be used.  ASCII is NFC-invariant,
        # so the vectorized string_is_ascii mask skips the entire batch in
        # the common case; only the non-ASCII minority pays a per-string
        # unicodedata.normalize (inherently per-string work — there is no
        # vectorized NFC kernel available).
        ascii_mask = pc.string_is_ascii(t).to_numpy(zero_copy_only=False)
        if not ascii_mask.all():
            import unicodedata

            vals = t.to_pylist()
            for i in np.flatnonzero(~ascii_mask):
                if vals[i] is not None:
                    vals[i] = unicodedata.normalize("NFC", vals[i])
            t = pa.array(vals, pa.string())
        t = pc.utf8_lower(t)
        t = pc.replace_substring_regex(t, r"\s+", " ")
        t = pc.utf8_trim_whitespace(t)
        return pa.table({"doc_id": batch.column("doc_id"), "text_norm": t})

    return ds.map_batches(fn, batch_format="pyarrow")


def _ntokens_np(batch: pa.Table) -> np.ndarray:
    """Whitespace token counts (empty text → 0), int64 — the shared
    counting rule of token_counts / token_quantiles."""
    toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(batch.column("text")))
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    empties = pc.equal(pc.utf8_trim_whitespace(batch.column("text")), "").to_numpy(
        zero_copy_only=False
    )
    n[empties] = 0
    return n


def token_percent_rank(sf_dir: str):
    """(doc_id, n_tokens, pct_rank): the EXACT global percentile rank of
    every document's token count — ``percent_rank()`` window semantics,
    (#docs with a strictly smaller count) / (N - 1) — the adaptive-cutoff
    primitive of curation pipelines ("drop the shortest 10%", "keep below
    the p90 perplexity") where the threshold is a data-derived quantile,
    not a constant.

    Scale shape: NO global row sort.  Pass 1 folds per-batch (value,
    count) partials through a metadata-scale ``groupby(value).sum`` (the
    ``token_quantiles`` histogram); the driver prefix-sums the sorted
    histogram into a below-count table and broadcasts it once
    (``ray.put``, distinct values ≪ docs).  Pass 2 re-streams the corpus
    and annotates each row via one vectorized ``searchsorted`` against the
    broadcast table.  Ranks over N rows cost two slim passes + a
    histogram-sized exchange."""
    import ray

    from minhash_ray.util import cached_get

    def partial(batch: pa.Table) -> pa.Table:
        v, c = np.unique(_ntokens_np(batch), return_counts=True)
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
    below = np.concatenate(([0], np.cumsum(c)[:-1])).astype(np.int64)
    n_total = int(c.sum())
    pack_ref = ray.put((v, below, n_total))

    def annotate(batch: pa.Table) -> pa.Table:
        vs, bel, n = cached_get(pack_ref)
        nt = _ntokens_np(batch)
        idx = np.searchsorted(vs, nt)          # nt always present in vs
        pct = (
            bel[idx].astype(np.float64) / np.float64(n - 1)
            if n > 1
            else np.zeros(len(nt), dtype=np.float64)
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(nt, pa.int64()),
                "pct_rank": pa.array(pct, pa.float64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        annotate, batch_format="pyarrow"
    )


def assign_splits(sf_dir: str, pct_train: int = 90, pct_val: int = 5):
    """(doc_id, split): deterministic train/val/test assignment by
    ``splitmix64(doc_id) mod 100`` — the reproducible content-independent
    split every training pipeline needs (same doc always lands in the
    same split, across runs, machines and corpus growth; no RNG state,
    no shuffle, embarrassingly parallel).

    Buckets: [0, pct_train) → train, [pct_train, pct_train+pct_val) →
    val, the rest → test."""
    from minhash_ray.stages.banding import splitmix64

    lo_val = int(pct_train)
    lo_test = int(pct_train + pct_val)
    if not (0 < lo_val <= lo_test <= 100):
        raise ValueError("invalid split percentages")

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        b = (splitmix64(ids.astype(np.uint64)) % np.uint64(100)).astype(np.int64)
        split = np.where(b < lo_val, "train", np.where(b < lo_test, "val", "test"))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "bucket": pa.array(b, pa.int64()),
                "split": pa.array(split, pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id"]).map_batches(fn, batch_format="pyarrow")


def pack_sequences(sf_dir: str, budget_tokens: int = 256, num_partitions: int = 32):
    """(doc_id, n_tokens, seq_id): deterministic token-budget sequence
    packing — the pre-training batching step that concatenates documents
    into fixed-token-budget training sequences.  Global packing order is
    (splitmix64(doc_id), doc_id): content-independent, reproducible, and
    tie-free (splitmix64 is a bijection).  ``seq_id = tokens_before //
    budget`` in that order — contiguous greedy fill where a straddling
    doc joins the sequence its first token falls in (documented overflow
    rule; the token-level split happens in the loader).

    Scale shape — a distributed ORDERED PREFIX SCAN, the primitive this
    op adds to the engine: partition by the TOP BITS of the hash (range
    partitioning that agrees with the global order by construction),
    per-partition vectorized sort + cumsum, and a metadata-scale fold of
    per-partition token totals into starting offsets (P integers through
    the driver, never rows).  Two slim passes, one hash exchange; no
    global row sort."""
    import ray

    from minhash_ray.stages.banding import splitmix64
    from minhash_ray.util import cached_get, clamp_partitions

    B = int(budget_tokens)
    if B <= 0:
        raise ValueError("budget_tokens must be positive")
    np_parts = clamp_partitions(num_partitions)
    k = max(1, int(np.ceil(np.log2(max(2, np_parts)))))
    shift = np.uint64(64 - k)

    def widen(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(ids.astype(np.uint64))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(_ntokens_np(batch), pa.int64()),
                "h": pa.array(h.view(np.int64), pa.int64()),
                "part": pa.array((h >> shift).astype(np.int64), pa.int64()),
            }
        )

    slim = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        widen, batch_format="pyarrow"
    ).materialize()

    # metadata-scale offset fold: P (part, total) rows -> starting offsets
    totals = slim.groupby("part").sum("n_tokens")
    tt = pa.concat_tables(
        list(totals.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    )
    scol = [c for c in tt.column_names if c != "part"][0]
    parts_np = tt.column("part").to_numpy().astype(np.int64)
    sums_np = tt.column(scol).to_numpy().astype(np.int64)
    offsets = np.zeros(1 << k, dtype=np.int64)
    offsets[parts_np] = sums_np
    offsets = np.concatenate(([0], np.cumsum(offsets)[:-1]))
    off_ref = [ray.put(offsets)]

    def scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "seq_id": pa.array([], pa.int64()),
                }
            )
        offs = cached_get(off_ref[0])
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        h = batch.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
        part = int(batch.column("part")[0].as_py())   # one part per group
        order = np.lexsort((ids, h))
        cum_before = offs[part] + np.cumsum(n[order]) - n[order]
        seq = cum_before // B
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "seq_id": pa.array(seq[inv], pa.int64()),
            }
        )

    return slim.groupby("part").map_groups(scan, batch_format="pyarrow")


def token_bigram_counts(sf_dir: str, min_count: int = 10, num_partitions: int = 8):
    """(tok_a, tok_b, cnt): corpus-wide adjacent-token-pair counts kept
    where cnt >= min_count — the counting step of a BPE/WordPiece merge
    round (argmax over these counts IS the next merge) and the
    collocation table of corpus analytics.

    Scale shape: per-batch bigram partial counts (one vectorized
    dictionary-encode + bincount over "tok_a tok_b" join strings — tokens
    never contain whitespace, so the join key is injective), folded
    through a key-hash partition (:func:`minhash_ray.util.fold_by_str_key`
    — the distinct-bigram space is corpus-width, never Ray-aggregate
    groups).  The shuffle moves at most |batch bigram vocab| rows per
    batch, never the token stream."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.utf8_lower(pc.fill_null(texts, ""))
        toks = pc.utf8_split_whitespace(texts)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        # defensive trim: no-op on a correct split; under Ray workers the
        # split kernel rarely emits a final token WITH its trailing space
        # (see functions/shingles.tokenize_with_strings), which would
        # silently fork that token's identity in every downstream count
        flat = pc.utf8_trim_whitespace(flat)
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        row_ids = np.repeat(np.arange(len(toks), dtype=np.int64), np.diff(offsets))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, row_ids = flat.filter(pa.array(keep)), row_ids[keep]
        empty = pa.table(
            {
                "bigram": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if len(row_ids) < 2:
            return empty
        adj = row_ids[1:] == row_ids[:-1]          # next token in same doc
        if not adj.any():
            return empty
        idx = np.flatnonzero(adj)
        pairs = pc.binary_join_element_wise(
            flat.take(pa.array(idx, pa.int64())),
            flat.take(pa.array(idx + 1, pa.int64())),
            " ",
        )
        enc = pairs.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64)
        return pa.table({"bigram": enc.dictionary, "cnt": pa.array(c, pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        agg = t.group_by("bigram").aggregate([("cnt", "sum")])
        kept = agg.filter(pc.greater_equal(agg.column("cnt_sum"), min_count))
        if kept.num_rows == 0:
            return pa.table(
                {
                    "tok_a": pa.array([], pa.string()),
                    "tok_b": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        parts = pc.split_pattern(kept.column("bigram"), " ")  # exactly one space
        return pa.table(
            {
                "tok_a": pc.list_element(parts, 0),
                "tok_b": pc.list_element(parts, 1),
                "cnt": pc.cast(kept.column("cnt_sum"), pa.int64()),
            }
        )

    from minhash_ray.util import fold_by_str_key

    return fold_by_str_key(
        _docs(sf_dir, ["text"]), "bigram", partial, final, num_partitions
    )


def global_shuffle_order(sf_dir: str, num_partitions: int = 32, docs=None):
    """(doc_id, pos): deterministic global pseudo-shuffle — every doc's
    1-based position in the ``(splitmix64(doc_id), doc_id)`` order, the
    reproducible training-order shuffle a pre-training run needs
    (content-independent, stable across runs/machines, no RNG state; the
    deterministic stand-in for ``ds.random_shuffle`` whose output cannot
    be replayed).  Downstream loaders stream shards in ``pos`` order.

    Scale shape — the same distributed ordered prefix scan as
    :func:`pack_sequences`, counting ROWS instead of tokens: range
    partition on the hash's top bits (agrees with the global order by
    construction), per-partition vectorized lexsort + local rank, and a
    metadata-scale fold of per-partition row counts into starting
    offsets (P integers through the driver, never rows).  No global row
    sort, no shuffle of payloads — only (doc_id, h) ride the exchange."""
    import ray

    from minhash_ray.stages.banding import splitmix64
    from minhash_ray.util import cached_get, clamp_partitions

    np_parts = clamp_partitions(num_partitions)
    k = max(1, int(np.ceil(np.log2(max(2, np_parts)))))
    shift = np.uint64(64 - k)

    def widen(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(ids.astype(np.uint64))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "h": pa.array(h.view(np.int64), pa.int64()),
                "part": pa.array((h >> shift).astype(np.int64), pa.int64()),
            }
        )

    ds = docs if docs is not None else _docs(sf_dir, ["doc_id"])
    slim = ds.map_batches(widen, batch_format="pyarrow").materialize()

    # metadata-scale offset fold: P (part, rows) pairs -> starting offsets
    totals = slim.groupby("part").count()
    tt = pa.concat_tables(
        list(totals.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    )
    ccol = [c for c in tt.column_names if c != "part"][0]
    parts_np = tt.column("part").to_numpy().astype(np.int64)
    cnts_np = tt.column(ccol).to_numpy().astype(np.int64)
    offsets = np.zeros(1 << k, dtype=np.int64)
    offsets[parts_np] = cnts_np
    offsets = np.concatenate(([0], np.cumsum(offsets)[:-1]))
    off_ref = [ray.put(offsets)]

    def scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
            )
        offs = cached_get(off_ref[0])
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = batch.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
        part = int(batch.column("part")[0].as_py())   # one part per group
        order = np.lexsort((ids, h))
        pos = np.empty(len(order), dtype=np.int64)
        pos[order] = offs[part] + np.arange(1, len(order) + 1, dtype=np.int64)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "pos": pa.array(pos, pa.int64())}
        )

    return slim.groupby("part").map_groups(scan, batch_format="pyarrow")


def lang_confusion(sf_dir: str):
    """(lang, lang_pred, n_docs): declared-language × predicted-language
    confusion matrix — the QC cross-tab a corpus run uses to find
    mislabeled sources (off-diagonal mass = label noise or weak
    profiles).  One pass: the lang-ID kernel runs per batch with the
    declared label riding along, batch-local partial counts fold through
    a tiny groupby (the matrix is |langs|² rows)."""

    def fn(batch: pa.Table) -> pa.Table:
        pred = _lang_id_fn(
            pa.table({"doc_id": batch.column("doc_id"), "text": batch.column("text")})
        )
        t = pa.table(
            {"lang": batch.column("lang"), "lang_pred": pred.column("lang_pred")}
        )
        agg = t.group_by(["lang", "lang_pred"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": agg.column("lang"),
                "lang_pred": agg.column("lang_pred"),
                "c": pc.cast(agg.column("count_all"), pa.int64()),
            }
        )

    out = (
        _docs(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(fn, batch_format="pyarrow")
        .groupby(["lang", "lang_pred"])
        .sum("c")
    )

    def rename(batch: pa.Table) -> pa.Table:
        ccol = [c for c in batch.column_names if c.startswith("sum")][0]
        return pa.table(
            {
                "lang": batch.column("lang"),
                "lang_pred": batch.column("lang_pred"),
                "n_docs": pc.cast(batch.column(ccol), pa.int64()),
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")


def cms_term_counts(
    sf_dir: str,
    width: int = 1 << 16,
    depth: int = 4,
    min_count: int = 800,
    docs=None,
    num_partitions: int = 8,
):
    """Count-min-sketch term frequencies: (term, est_count) for every
    term whose CMS estimate reaches ``min_count`` — the approximate
    heavy-hitter report (estimates are overestimates, never under, so
    the output is a SUPERSET of the true >=min_count terms; compare
    :func:`frequent_terms` for the exact Misra-Gries variant).

    Why it exists next to the exact op: the sketch is ``depth·width``
    int64 cells REGARDLESS of vocabulary size — frequency estimation
    over a 10^9-term vocabulary in a few MB, broadcast once.  Build =
    per-batch partial sketches summed on the driver (constant-size
    merge); the sum-fold is the reference's mergeable-summary contract
    with + in place of min — commutative/associative but NOT idempotent,
    sound here because Ray Data batches partition rows exactly-once
    (``functions/cms.py`` docstring).  The probe pass re-streams the
    corpus, gates each batch-distinct term against the broadcast sketch,
    and dedups survivors through a term-key fold.

    Deterministic end-to-end (integer sums, seeded hashes), so the
    DuckDB oracle replays the full sketch — splitmix64 double-hash
    probes in HUGEINT, bucket sums, min-over-depth — and hash-matches.
    """
    import ray

    from minhash_ray.functions.cms import cms_empty, cms_insert, cms_query
    from minhash_ray.functions.shingles import tokenize_with_strings
    from minhash_ray.util import fold_by_str_key

    from minhash_ray.pipelines.dedup_text import DOC_CFG, _docs

    ds = docs if docs is not None else _docs(sf_dir, ["doc_id", "text"])
    seed = DOC_CFG.seed

    def partial_sketch(batch: pa.Table) -> pa.Table:
        flat, _counts, hashes = tokenize_with_strings(batch.column("text"), seed)
        u, c = np.unique(hashes, return_counts=True)
        sk = cms_insert(cms_empty(width, depth), u, c.astype(np.int64))
        return pa.table({"sk": pa.array([sk.tobytes()], pa.large_binary())})

    sketch = cms_empty(width, depth)
    for b in ds.map_batches(partial_sketch, batch_format="pyarrow").iter_batches(
        batch_size=64, batch_format="pyarrow"
    ):
        for blob in b.column("sk"):
            sketch += np.frombuffer(blob.as_py(), dtype=np.int64).reshape(
                depth, width
            )
    sk_ref = ray.put(sketch)

    def probe(batch: pa.Table) -> pa.Table:
        sk = ray.get(sk_ref)               # plasma-cached per worker
        flat, _counts, hashes = tokenize_with_strings(batch.column("text"), seed)
        dict_arr = flat.dictionary_encode()
        uniq_terms = dict_arr.dictionary
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # hash of each unique term = hash of its first occurrence
        first = np.full(len(uniq_terms), len(codes), dtype=np.int64)
        if len(codes):
            np.minimum.at(first, codes, np.arange(len(codes), dtype=np.int64))
        uniq_h = hashes[first] if len(codes) else np.empty(0, dtype=np.uint64)
        est = cms_query(sk, uniq_h)
        keep = est >= min_count
        return pa.table(
            {
                "term": uniq_terms.filter(pa.array(keep)),
                "est_count": pa.array(est[keep], pa.int64()),
            }
        )

    def dedup_partial(batch: pa.Table) -> pa.Table:
        return batch

    def dedup_final(t: pa.Table) -> pa.Table:
        agg = t.group_by("term").aggregate([("est_count", "max")])
        return pa.table(
            {"term": agg.column("term"), "est_count": agg.column("est_count_max")}
        )

    return fold_by_str_key(
        ds.map_batches(probe, batch_format="pyarrow"),
        "term",
        dedup_partial,
        dedup_final,
        num_partitions,
    )


def chunk_documents(
    sf_dir: str,
    words_per_chunk: int = 20,
    stride: int = 10,
    docs=None,
):
    """Overlapping sliding-window document chunking (the RAG/pretraining
    segmentation primitive): each doc explodes into windows of
    ``words_per_chunk`` normalized tokens starting every ``stride``
    tokens — start positions 0, stride, 2·stride, ... while the window
    still adds tokens (the final window is truncated; a doc shorter than
    one window yields exactly one chunk; an empty doc yields none).
    Output: (doc_id, cidx, chunk, n_tokens).

    Scale shape: a pure map — no shuffle, no state; the token buffer is
    flattened once per batch and every chunk is a re-offset LIST VIEW of
    that same buffer joined by ``pc.binary_join`` (the
    ``_explode_chunks`` idiom of the chunk dedup, generalized to
    stride < width).  Because windows overlap, the list-view trick needs
    one gather: values are token indices repeated per window, built with
    pure index arithmetic.
    """
    import pyarrow.compute as pc

    from minhash_ray.functions.shingles import _segmented_arange, tokenize_with_strings
    from minhash_ray.pipelines.dedup_text import DOC_CFG, _docs

    if stride < 1 or words_per_chunk < 1:
        raise ValueError("words_per_chunk and stride must be >= 1")
    W, S = int(words_per_chunk), int(stride)
    ds = docs if docs is not None else _docs(sf_dir, ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        flat, counts, _ = tokenize_with_strings(batch.column("text"), DOC_CFG.seed)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        tok_starts = np.cumsum(counts) - counts
        # chunks per doc: 1 + ceil(max(ntok - W, 0) / S); 0 for empty docs
        extra = np.maximum(counts - W, 0)
        nch = np.where(counts > 0, 1 + -(-extra // S), 0).astype(np.int64)
        cidx = _segmented_arange(nch)
        doc_rep = np.repeat(np.arange(len(counts), dtype=np.int64), nch)
        w_start = cidx * S
        w_len = np.minimum(counts[doc_rep] - w_start, W)
        # gather: values = token indices of every window, concatenated
        gidx = np.repeat(tok_starts[doc_rep] + w_start, w_len) + _segmented_arange(
            w_len
        )
        offsets = np.concatenate(([0], np.cumsum(w_len))).astype(np.int32)
        chunk_list = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            flat.take(pa.array(gidx, pa.int64())) if len(gidx) else flat.slice(0, 0),
        )
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_rep], pa.int64()),
                "cidx": pa.array(cidx, pa.int64()),
                "chunk": pc.binary_join(chunk_list, " "),
                "n_tokens": pa.array(w_len.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def bm25_topk(
    sf_dir: str,
    query: str = "table scan batch window",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    docs=None,
):
    """Okapi BM25 top-k retrieval over the documents table: rank docs by
    ``Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`` with
    ``idf = ln(1 + (N−df+0.5)/(df+0.5))`` (Robertson/Spärck Jones) — the
    classic lexical-retrieval scorer beside the ANN cosine family.
    Output: (rank, doc_id, score), rank 1..k, ties broken by doc_id.

    Scale shape — two streaming passes, nothing corpus-width anywhere:
      1. stats pass: each batch emits ONE row (n_docs, n_tokens, df per
         query term — the query is a handful of terms, so the row is
         fixed-width); the driver sums a per-batch table.  This is the
         canonical small-side aggregate: corpus stats + query-term dfs.
      2. score pass: batches score locally (tf via one searchsorted per
         batch against the sorted query-term hashes) and emit their
         LOCAL top-k; the driver folds batch-count × k rows.
    Scores are float64 but deterministic (fixed per-term accumulation
    order); registered rows-only (ln() is not bit-reproducible across
    engines), exactness covered by the numpy-mirror pytest.
    """
    import ray

    from minhash_ray.functions.shingles import tokenize_with_strings
    from minhash_ray.pipelines.dedup_text import DOC_CFG, _docs

    ds = docs if docs is not None else _docs(sf_dir, ["doc_id", "text"])
    seed = DOC_CFG.seed

    q_flat, _qc, q_hashes = tokenize_with_strings(
        pa.array([query], pa.string()), seed
    )
    q_terms = np.unique(q_hashes)
    m = len(q_terms)
    if m == 0:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )

    def _tf_matrix(hashes: np.ndarray, counts: np.ndarray):
        """(rows, m) int64 term frequencies of the query terms + dl."""
        n_rows = len(counts)
        tf = np.zeros((n_rows, m), dtype=np.int64)
        if len(hashes):
            pos = np.minimum(np.searchsorted(q_terms, hashes), m - 1)
            is_q = q_terms[pos] == hashes
            row = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
            np.add.at(tf, (row[is_q], pos[is_q]), 1)
        return tf

    def stats_partial(batch: pa.Table) -> pa.Table:
        _f, counts, hashes = tokenize_with_strings(batch.column("text"), seed)
        tf = _tf_matrix(hashes, counts)
        cols = {
            "n_docs": pa.array([len(counts)], pa.int64()),
            "n_tokens": pa.array([int(counts.sum())], pa.int64()),
        }
        for j in range(m):
            cols[f"df_{j}"] = pa.array([int((tf[:, j] > 0).sum())], pa.int64())
        return pa.table(cols)

    st = pa.concat_tables(
        list(
            ds.map_batches(stats_partial, batch_format="pyarrow").iter_batches(
                batch_size=1 << 16, batch_format="pyarrow"
            )
        )
    )
    N = int(pa.compute.sum(st.column("n_docs")).as_py() or 0)
    total_tokens = int(pa.compute.sum(st.column("n_tokens")).as_py() or 0)
    if N == 0:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
    avgdl = total_tokens / N
    df = np.array(
        [int(pa.compute.sum(st.column(f"df_{j}")).as_py() or 0) for j in range(m)],
        dtype=np.float64,
    )
    idf = np.log(1.0 + (N - df + 0.5) / (df + 0.5))
    params_ref = ray.put({"idf": idf, "avgdl": avgdl, "k1": float(k1), "b": float(b)})

    def score_topk(batch: pa.Table) -> pa.Table:
        p = ray.get(params_ref)
        _f, counts, hashes = tokenize_with_strings(batch.column("text"), seed)
        tf = _tf_matrix(hashes, counts).astype(np.float64)
        dl = counts.astype(np.float64)
        denom = tf + p["k1"] * (1.0 - p["b"] + p["b"] * dl[:, None] / p["avgdl"])
        with np.errstate(divide="ignore", invalid="ignore"):
            per_term = np.where(tf > 0, p["idf"][None, :] * tf * (p["k1"] + 1.0) / denom, 0.0)
        score = per_term.sum(axis=1)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        # local top-k (score desc, doc_id asc tiebreak)
        order = np.lexsort((ids, -score))[: min(k, len(ids))]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "score": pa.array(score[order], pa.float64()),
            }
        )

    parts = pa.concat_tables(
        list(
            ds.map_batches(score_topk, batch_format="pyarrow").iter_batches(
                batch_size=1 << 16, batch_format="pyarrow"
            )
        )
    )
    ids = parts.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    sc = np.asarray(parts.column("score").to_numpy(), dtype=np.float64)
    order = np.lexsort((ids, -sc))[: min(k, len(ids))]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64), pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64()),
            "score": pa.array(sc[order], pa.float64()),
        }
    )


def bigram_familiarity(
    sf_dir: str,
    min_count: int = 10,
    w: int = 2,
    num_partitions: int = 8,
    broadcast_max_rows: int = 2_000_000,
    docs=None,
):
    """(doc_id, n_grams, n_frequent, familiar_bp): a corpus-statistics
    language-model familiarity score — the fraction (in integer basis
    points, ``n_frequent * 10000 // n_grams``) of each document's token
    w-grams whose corpus-wide OCCURRENCE count is >= ``min_count``.  The
    integer-exact stand-in for n-gram-LM perplexity filtering (CCNet's
    quality dimension): gibberish and boilerplate-free rare text scores
    low, fluent in-distribution text scores high.  Uses the MinHash
    chain's tokenizer + w-gram polynomial (``token_shingles``) so the
    DuckDB oracle replays the full hash chain in HUGEINT SQL.

    Scale shape (the ``repeated_ngram_scrub`` two-pass pattern):
      1. count pass — per-batch gram occurrence counts fold through a
         gram-hash partition (``fold_by_int_keys``); the >=min_count gate
         keeps the FREQUENT set, which is vocabulary-scale, not
         corpus-scale (rare grams — the long tail — are dropped).
      2. score pass — if the frequent set fits (``broadcast_max_rows``,
         8 B/gram) it is broadcast once via ``ray.put`` and the corpus
         streams through one searchsorted membership probe + bincount.
         Above the limit nothing is driver-resident: gram occurrences
         join the frequent table on g, per-doc hit counts fold through a
         doc-hash partition, and ONE left-outer join carries them back
         onto the docs (bit-identical by the forced-path pytest).
    """
    import pyarrow.compute as pc2

    import ray
    from minhash_ray.functions.shingles import token_shingles
    from minhash_ray.pipelines.dedup_text import DOC_CFG
    from minhash_ray.util import (
        cached_get,
        clamp_partitions,
        fold_by_int_keys,
        strip_empty_blocks,
    )

    cfg = DOC_CFG
    np_parts = clamp_partitions(num_partitions)
    ds = docs if docs is not None else _docs(sf_dir, ["doc_id", "text"])

    def cnt_partial(batch: pa.Table) -> pa.Table:
        sh, _ = token_shingles(batch.column("text"), w, cfg.seed)
        ug, c = np.unique(sh, return_counts=True)
        return pa.table(
            {
                "g": pa.array(ug.view(np.int64), pa.int64()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def cnt_final(t: pa.Table) -> pa.Table:
        agg = t.group_by(["g"]).aggregate([("cnt", "sum")])
        keep = pc2.greater_equal(agg.column("cnt_sum"), min_count)
        return pa.table({"g": agg.column("g").filter(keep)})

    hot = strip_empty_blocks(
        fold_by_int_keys(ds, ["g"], cnt_partial, cnt_final, num_partitions)
    )
    n_hot = hot.count()

    def famil_table(ids, n_grams: np.ndarray, n_freq: np.ndarray) -> pa.Table:
        n_grams = n_grams.astype(np.int64)
        n_freq = n_freq.astype(np.int64)
        bp = np.zeros(len(n_grams), dtype=np.int64)
        nz = n_grams > 0
        bp[nz] = (n_freq[nz] * 10000) // n_grams[nz]
        return pa.table(
            {
                "doc_id": ids,
                "n_grams": pa.array(n_grams, pa.int64()),
                "n_frequent": pa.array(n_freq, pa.int64()),
                "familiar_bp": pa.array(bp, pa.int64()),
            }
        )

    if n_hot <= broadcast_max_rows:
        parts = [
            b.column("g").to_numpy().view(np.uint64)
            for b in hot.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        ]
        hs_sorted = (
            np.sort(np.concatenate(parts)) if parts else np.empty(0, dtype=np.uint64)
        )
        hot_ref = ray.put(hs_sorted)

        def score(batch: pa.Table) -> pa.Table:
            hs = cached_get(hot_ref)       # plasma-cached per worker
            sh, s_cnt = token_shingles(batch.column("text"), w, cfg.seed)
            if len(sh) and len(hs):
                pos = np.minimum(np.searchsorted(hs, sh), len(hs) - 1)
                hit = hs[pos] == sh
            else:
                hit = np.zeros(len(sh), dtype=bool)
            row = np.repeat(np.arange(len(s_cnt), dtype=np.int64), s_cnt)
            n_freq = np.bincount(row[hit], minlength=len(s_cnt))
            return famil_table(batch.column("doc_id"), s_cnt, n_freq)

        return ds.map_batches(score, batch_format="pyarrow")

    # join-attach path: nothing driver-resident
    def explode(batch: pa.Table) -> pa.Table:
        sh, s_cnt = token_shingles(batch.column("text"), w, cfg.seed)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, s_cnt), pa.int64()),
                "g": pa.array(sh.view(np.int64), pa.int64()),
            }
        )

    hits = strip_empty_blocks(
        ds.map_batches(explode, batch_format="pyarrow")
    ).join(hot, join_type="inner", on=("g",), num_partitions=np_parts)

    def hit_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ug, c = np.unique(ids, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(ug, pa.int64()),
                "n_frequent": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def hit_final(t: pa.Table) -> pa.Table:
        agg = t.group_by(["doc_id"]).aggregate([("n_frequent", "sum")])
        return pa.table(
            {
                "doc_id": agg.column("doc_id"),
                "n_frequent": pc2.cast(agg.column("n_frequent_sum"), pa.int64()),
            }
        )

    freq_ds = strip_empty_blocks(
        fold_by_int_keys(hits, ["doc_id"], hit_partial, hit_final, num_partitions)
    )
    joined = strip_empty_blocks(ds).join(
        freq_ds, join_type="left_outer", on=("doc_id",), num_partitions=np_parts
    )

    def score_joined(batch: pa.Table) -> pa.Table:
        _, s_cnt = token_shingles(batch.column("text"), w, cfg.seed)
        n_freq = (
            pc2.fill_null(batch.column("n_frequent"), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return famil_table(batch.column("doc_id"), s_cnt, n_freq)

    return joined.map_batches(score_joined, batch_format="pyarrow")


def length_gate_docs(sf_dir: str, q: float = 0.1):
    """(doc_id, n_tokens): documents whose whitespace token count is >=
    the corpus's EXACT q-quantile token count — percentile-gated length
    filtering, the data-driven form of the fixed ``min_tokens`` gate in
    :func:`minhash_ray.pipelines.curation.corpus_curation` (cut chosen
    from the corpus's own distribution instead of a config constant).

    Scale shape: pass 1 is the :func:`token_quantiles` histogram fold
    (per-batch (value, count) partials → tiny groupby → driver folds a
    metadata-scale histogram into the exact order statistic; no global
    sort); the scalar cut then rides into pass 2, a streaming
    filter-and-project scan.  Two corpus scans, zero wide shuffles, and
    the only driver-resident state is one integer."""
    qt = token_quantiles(sf_dir, qs=(q,))
    cut = int(qt.column("n_tokens")[0].as_py()) if qt.num_rows else 0

    def gate(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(batch.column("text")))
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        empties = pc.equal(
            pc.utf8_trim_whitespace(batch.column("text")), ""
        ).to_numpy(zero_copy_only=False)
        n[empties] = 0
        t = pa.table(
            {"doc_id": batch.column("doc_id"), "n_tokens": pa.array(n, pa.int64())}
        )
        return t.filter(pa.array(n >= cut))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(gate, batch_format="pyarrow")


GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in")


def gopher_quality_gate(
    sf_dir: str,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_len_x10: int = 20,
    max_mean_len_x10: int = 120,
    min_alpha_pct: int = 80,
    min_stopwords: int = 2,
):
    """(doc_id, n_tokens, tok_chars, n_alpha_tokens, n_stopwords, keep):
    a Gopher-rules-style composite quality gate (Rae et al. 2021, "Scaling
    Language Models", Appendix A) — token-count bounds, mean-word-length
    bounds, minimum alphabetic-token fraction, and a minimum number of
    DISTINCT stopwords present.  Every rule is decided in exact integer
    arithmetic by cross-multiplication (mean length bounds are supplied
    ×10, the alpha fraction as a percent), so the keep flag is
    bit-reproducible and the whole gate SQL-expressible.

    Scale shape: one streaming pass; per-token predicates run on the
    FLATTENED token array (``pc.list_flatten`` + one vectorized regex /
    equality scan each, folded back per doc with ``np.add.reduceat`` over
    the list offsets — never a Python loop over rows or tokens).  Rows
    out = rows in; the flag (not a filter) so downstream composites can
    route kept/dropped docs without a second scan."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        trimmed = pc.utf8_trim_whitespace(text)
        toks = pc.utf8_split_whitespace(trimmed).combine_chunks() \
            if isinstance(pc.utf8_split_whitespace(trimmed), pa.ChunkedArray) \
            else pc.utf8_split_whitespace(trimmed)
        n = len(text)
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        empties = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        n_tok[empties] = 0
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        flat = pc.list_flatten(toks)
        flat_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        flat_alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)

        def fold(per_tok: np.ndarray) -> np.ndarray:
            out = np.zeros(n, dtype=np.int64)
            has = np.flatnonzero(n_tok > 0)
            if len(has):
                sums = np.add.reduceat(per_tok, offsets[:-1][has])
                # reduceat with duplicate/trailing starts is avoided by
                # only reducing at docs that own >=1 token
                out[has] = sums
            return out

        tok_chars = fold(flat_len)
        n_alpha = fold(flat_alpha)
        n_stop = np.zeros(n, dtype=np.int64)
        for sw in GOPHER_STOPWORDS:
            present = fold(
                pc.equal(flat, sw).to_numpy(zero_copy_only=False).astype(np.int64)
            )
            n_stop += (present > 0).astype(np.int64)
        keep = (
            (n_tok >= min_tokens)
            & (n_tok <= max_tokens)
            & (10 * tok_chars >= min_mean_len_x10 * n_tok)
            & (10 * tok_chars <= max_mean_len_x10 * n_tok)
            & (100 * n_alpha >= min_alpha_pct * n_tok)
            & (n_stop >= min_stopwords)
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "tok_chars": pa.array(tok_chars, pa.int64()),
                "n_alpha_tokens": pa.array(n_alpha, pa.int64()),
                "n_stopwords": pa.array(n_stop, pa.int64()),
                "keep": pa.array(keep, pa.bool_()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def posting_lists(sf_dir: str, k: int = 5, num_partitions: int = 8):
    """(term, rank, doc_id): an inverted-index sample — for every
    vocabulary term, the ``k`` smallest doc_ids containing it, rank 1-based
    in doc_id order.  The index-construction primitive behind retrieval /
    exact-match decontamination lookups (posting lists, truncated to a
    bounded sample per term so the output is |vocab|·k no matter the
    corpus size).

    Scale shape: per batch, DISTINCT (term, doc) pairs via an Arrow
    group_by, then a vectorized per-term k-min selection (lexsort + run
    detection — each batch emits ≤ k rows per term it saw); partials fold
    through the term-hash partition (:func:`minhash_ray.util.fold_by_str_key`
    — vocabulary scales with the corpus, so terms must never become Ray
    aggregate groups) where the same k-min selection merges them.  The
    k-min statistic is mergeable, so no stage ever holds more than
    (terms-in-partition × k) rows."""

    def kmin(t: pa.Table) -> pa.Table:
        term = t.column("term")
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        enc = term.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
        docs = t.column("doc_id").to_numpy()
        o = np.lexsort((docs, codes))
        code_s, doc_s = codes[o], docs[o]
        n = len(o)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = code_s[1:] != code_s[:-1]
        idx = np.arange(n, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new, idx, 0))
        rank = idx - start + 1
        keep = rank <= k
        return pa.table(
            {
                "term": enc.dictionary.take(pa.array(code_s[keep], pa.int64())),
                "rank": pa.array(rank[keep], pa.int64()),
                "doc_id": pa.array(doc_s[keep], pa.int64()),
            }
        )

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        trimmed = pc.utf8_trim_whitespace(text)
        toks = pc.utf8_split_whitespace(trimmed)
        # true per-row list widths (an empty doc splits to [""], which
        # must not become a posting) — repeat by the raw width, then drop
        # empty tokens from BOTH columns with one mask
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        docs = np.repeat(batch.column("doc_id").to_numpy(), n_tok)
        nonempty = pc.not_equal(flat, "")
        pairs = (
            pa.table({"term": flat, "doc_id": pa.array(docs, pa.int64())})
            .filter(nonempty)
            .group_by(["term", "doc_id"])
            .aggregate([])
        )
        return kmin(pairs)

    def final(t: pa.Table) -> pa.Table:
        return kmin(t.drop_columns(["rank"]))

    from minhash_ray.util import fold_by_str_key

    return fold_by_str_key(
        _docs(sf_dir, ["doc_id", "text"]), "term", partial, final, num_partitions
    )


PIVOT_LANGS = ("de", "en", "es", "fr", "zh")


def lang_source_pivot(sf_dir: str, langs: tuple = PIVOT_LANGS, num_partitions: int = 8):
    """(source, n_de, n_en, n_es, n_fr, n_zh, n_other): the language ×
    source crosstab — one row per source, one count column per language in
    the FIXED ``langs`` list (pivot needs a static output schema; unseen
    languages fold into ``n_other``), the corpus-composition matrix every
    curation report opens with.

    Scale shape: sources scale with the corpus, so the pivot happens
    INSIDE the source-hash partition fold (never a driver crosstab): each
    batch pivots its (source, lang) counts into the fixed wide row via
    one dictionary-encode + bincount per batch, partials sum per source.
    Fixed width ⇒ every stage's output is |sources seen| rows."""
    W = len(langs) + 1  # + other
    names = [f"n_{l}" for l in langs] + ["n_other"]

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        s_codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
        hit = pc.index_in(batch.column("lang"), value_set=pa.array(list(langs)))
        l_codes = np.asarray(
            pc.fill_null(pc.cast(hit, pa.int64()), W - 1).to_numpy(
                zero_copy_only=False
            ),
            dtype=np.int64,
        )
        n_src = len(enc.dictionary)
        counts = np.bincount(s_codes * W + l_codes, minlength=n_src * W).reshape(
            n_src, W
        )
        cols = {"source": enc.dictionary}
        for j, nm in enumerate(names):
            cols[nm] = pa.array(counts[:, j], pa.int64())
        return pa.table(cols)

    def final(t: pa.Table) -> pa.Table:
        agg = t.group_by("source").aggregate([(nm, "sum") for nm in names])
        cols = {"source": agg.column("source")}
        for nm in names:
            cols[nm] = pc.cast(agg.column(f"{nm}_sum"), pa.int64())
        return pa.table(cols)

    from minhash_ray.util import fold_by_str_key

    return fold_by_str_key(
        _docs(sf_dir, ["source", "lang"]), "source", partial, final, num_partitions
    )


def weighted_sample_docs(sf_dir: str, k: int = 200, seed: int = 42):
    """(doc_id, n_chars): a deterministic weight-proportional sample
    WITHOUT replacement of ``k`` documents, weight = ``n_chars`` —
    Efraimidis-Spirakis A-ES (keys ``u^(1/w)``, top-k by key) with the
    uniform drawn from ``splitmix64(doc_id XOR seed)`` so the sample is a
    pure function of (corpus, seed): replayable across runs, appends and
    partitionings, unlike an RNG-stream sample.  The size-biased
    spot-check sampler (long docs carry more of the token mass an audit
    cares about).

    Scale shape: keys are one vectorized splitmix + pow per batch; each
    batch prunes to its local top-k, so the final exact sort+limit sees
    ≤ batches × k rows.  No SQL oracle (float pow keys are not
    bit-portable across engines); determinism and size bias are
    pytest-pinned."""
    from minhash_ray.stages.banding import splitmix64

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        w = batch.column("n_chars").to_numpy().astype(np.float64)
        u = (
            splitmix64(ids.astype(np.uint64) ^ np.uint64(seed)).astype(np.float64)
            + 0.5
        ) / float(2**64)
        key = np.power(u, 1.0 / np.maximum(w, 1.0))
        t = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": batch.column("n_chars"),
                "sample_key": pa.array(key, pa.float64()),
            }
        )
        if t.num_rows <= k:
            return t
        o = np.lexsort((ids, -key))[:k]
        return t.take(pa.array(np.sort(o)))

    return (
        _docs(sf_dir, ["doc_id", "n_chars"])
        .map_batches(keyed, batch_format="pyarrow")
        .sort(["sample_key", "doc_id"], descending=[True, False])
        .limit(k)
        .select_columns(["doc_id", "n_chars"])
    )


def dedup_lines(sf_dir: str, delimiter: str = "\n", docs=None):
    """(doc_id, text_dedup, n_lines, n_removed): C4-style INTRA-document
    line dedup — each document keeps only the FIRST occurrence of every
    exact line, order preserved (the "three occurrences of the same
    sentence" cleaner of Raffel et al. 2020 §2.2, applied per doc; the
    corpus-level twins are ``repeated_ngram_scrub``/``repeated_ngram_dedup``).

    Scale shape: purely per-row — one ``split_pattern``, a
    dictionary-encode of the batch's flat line values, two lexsorts over
    (row, code, position) to mark per-row first occurrences, and one
    ``binary_join`` to reassemble; no shuffle, no state, embarrassingly
    parallel.  SQL-checked: the DuckDB oracle replays
    split → first-position per (doc, line) → ordered string_agg (the
    testdata corpus is single-line so the hash-match pins the no-op
    path; the planted multi-line pytest pins the dedup semantics, the
    ``normalize_text`` precedent)."""
    if docs is None:
        docs = _docs(sf_dir, ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lines = pc.split_pattern(texts, delimiter)
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = lines.flatten()
        offs = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        n = batch.num_rows
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offs[:-1], counts)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # first occurrence per (row, line): sort by (row, code, pos),
        # mark group heads
        o = np.lexsort((pos, codes, rows))
        r_s, c_s, p_s = rows[o], codes[o], pos[o]
        first = np.ones(len(r_s), dtype=bool)
        if len(r_s) > 1:
            first[1:] = (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])
        kr, kp = r_s[first], p_s[first]
        src = o[first]                      # original flat index of keepers
        # back to document order
        o2 = np.lexsort((kp, kr))
        kr, src = kr[o2], src[o2]
        kept_counts = np.bincount(kr, minlength=n).astype(np.int64)
        kept_flat = flat.take(pa.array(src, pa.int64()))
        kept_lists = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(kept_counts)]), pa.int32()),
            kept_flat,
        )
        joined = pc.binary_join(kept_lists, delimiter)
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "text_dedup": joined,
                "n_lines": pa.array(counts, pa.int64()),
                "n_removed": pa.array(counts - kept_counts, pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")

# structured-PII patterns (RE2, identical dialect in Arrow and DuckDB —
# the email/phone/IP trio of the BigScience/BigCode PII redaction passes)
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?\d[\d\- ]{7,}\d"
PII_IP = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


def pii_scrub(sf_dir: str, docs=None):
    """(doc_id, text_redacted, n_emails, n_phones, n_ips): typed
    structured-PII redaction — emails, then phone-like digit runs, then
    IPv4 literals, each category counted on the text AS THE PREVIOUS
    REDACTIONS LEFT IT (the sequencing makes the counts well-defined when
    categories overlap, e.g. a digit-run local-part inside an email) and
    replaced with a typed token.  Complements :func:`scrub_terms` (flat
    denylist): this is the pass that knows WHAT it redacted, so
    downstream audits can gate on per-category counts.

    One chain of three vectorized RE2 count+replace kernel pairs per
    batch, no shuffle, embarrassingly parallel at any corpus size.  The
    DuckDB oracle replays the same patterns through nested
    regexp_replace/regexp_extract_all (both engines are RE2)."""
    ds = docs if docs is not None else _docs(sf_dir, ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        cols = {"doc_id": batch.column("doc_id")}
        counts = []
        for pat, tok in (
            (PII_EMAIL, "<EMAIL>"),
            (PII_PHONE, "<PHONE>"),
            (PII_IP, "<IP>"),
        ):
            counts.append(pc.cast(pc.count_substring_regex(text, pat), pa.int64()))
            text = pc.replace_substring_regex(text, pat, tok)
        cols["text_redacted"] = text
        cols["n_emails"], cols["n_phones"], cols["n_ips"] = counts
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")

"""ExactSubstr-style cross-document duplicate-span operators (Lee et al.
2021, "Deduplicating Training Data Makes Language Models Better"):
alignment-free extraction of maximal unions of duplicated L-byte windows
(each emitted span is the union of byte ranges covered by windows that
occur at least twice corpus-wide, with runs closer than L merged — the
merged span may bridge gaps whose own windows are unique), and the scrub
pass that removes those spans from the corpus.

This is the gap between the repo's chunk-aligned passes
(``chunk_dedup_docs``: fixed word chunks; ``repeated_ngram_scrub``:
intra-doc) and true suffix-array dedup: a copied paragraph is caught at
ANY byte offset, in ANY document, with no tokenizer and no alignment
assumption.  Lee et al. build one corpus-wide suffix array; the
distributed equivalent here is the classic window-hash inverted index:

  1. **windows** — one ``map_batches`` pass computes a 2x64-bit rolling
     polynomial hash of every L-byte window (O(bytes) per doc via
     prefix-product/prefix-sum identities mod 2^64 — NOT O(L x bytes);
     the odd base is invertible mod 2^64 so ``h(p) = (Q[p+L]-Q[p]) *
     B^(p+L-1)`` with both prefixes materialized once per batch; unlike
     the reference's kwise hash, which reduces mod a prime, this chain
     works mod 2^64 throughout).  Only (doc_id, p, h1, h2) leaves the
     task — 16 B/window, never the text.
  2. **candidate windows** — hash-partition on h1 (``groupby(pkey)``):
     equal hashes co-locate, so a single partition-local run-length pass
     over the lexsorted (h1, h2) pairs finds every window whose 128-bit
     key occurs >= 2 times corpus-wide.  No count-aggregate + join round
     trip.
  3. **exact verify** — candidates fold per doc into a packed
     large_binary payload (Acero rejects list join payloads), one
     partitioned join re-attaches each doc's text, the gram bytes are
     re-sliced for candidate positions only, and a second exchange keyed
     on the gram's own hash groups EXACT byte strings: survivors are
     windows whose literal L-byte gram occurs >= 2 times.  The 128-bit
     prefilter makes this exchange carry duplicated content only — the
     output of the operator, not the corpus.
  4. **spans** — doc-hash partition + per-partition vectorized
     gaps-and-islands: windows [p, p+L) merge while the gap to the
     previous start is <= L, emitting (doc_id, span_start, span_end,
     span_len).

``dup_span_scrub`` then removes every duplicated span (the Lee et al.
released tool's semantics: ALL occurrences are cut, which guarantees no
train/test leakage survives) with one left-outer join of packed span
intervals onto the docs and a fully vectorized byte-mask rebuild (one
diff-array + cumsum over the batch's concatenated bytes; no per-doc
Python).

Byte-vs-char caveat (same contract as ``_rolling_fp_sql``): the engine
works on UTF-8 bytes, the DuckDB oracle on characters — identical while
the corpus is ASCII; a multi-byte corpus shifts span offsets but not the
dup/clean decisions at window granularity.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from minhash_ray.functions.shingles import _segmented_arange
from minhash_ray.stages.banding import splitmix64
from minhash_ray.util import (
    binary_flat_offsets,
    clamp_partitions,
    fold_by_int_keys,
    string_flat_offsets,
    strip_empty_blocks,
)

U64 = np.uint64

# odd bases: invertible mod 2^64 (FNV-1a prime; splitmix64 multiplier)
_B1 = U64(0x100000001B3)
_B2 = U64(0xBF58476D1CE4E5B9)


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _modinv_u64(a: np.uint64) -> np.uint64:
    """Inverse of an odd ``a`` mod 2^64 (Newton's iteration doubles the
    number of correct low bits per step: 5 -> 10 -> 20 -> 40 -> 80)."""
    x = a
    with np.errstate(over="ignore"):
        for _ in range(6):
            x = x * (U64(2) - a * x)
    return x


_B1_INV = _modinv_u64(_B1)
_B2_INV = _modinv_u64(_B2)


def rolling_window_hashes(
    flat_u8: np.ndarray, offs: np.ndarray, L: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(h1, h2, starts, win_counts): two independent 64-bit polynomial
    hashes of every L-byte window inside each row, O(total bytes).

    ``h(p) = sum_j s[p+j] * B^(L-1-j) mod 2^64``, evaluated for all p at
    once as ``(Q[p+L] - Q[p]) * B^(p+L-1)`` with ``Q[j] = sum_{i<j} s[i]
    * B^(-i)`` — exact because the odd base is a unit mod 2^64.  Bytes
    are lifted by +1 so NUL runs don't annihilate, and the raw polynomial
    is finalized through splitmix64 so hash-partition keys derived from
    h1 spread uniformly.  ``starts`` indexes into ``flat_u8``;
    ``win_counts`` is per row (0 for rows shorter than L)."""
    counts = np.diff(offs).astype(np.int64)
    wc = np.maximum(counts - (L - 1), 0).astype(np.int64)
    starts = np.repeat(offs[:-1].astype(np.int64), wc) + _segmented_arange(wc)
    n = len(flat_u8)
    if n == 0 or len(starts) == 0:
        e = np.empty(0, dtype=np.uint64)
        return e, e.copy(), np.empty(0, dtype=np.int64), wc
    s = flat_u8.astype(np.uint64) + U64(1)
    out = []
    with np.errstate(over="ignore"):
        for B, Binv in ((_B1, _B1_INV), (_B2, _B2_INV)):
            pw_inv = np.full(n, Binv, dtype=np.uint64)
            pw_inv[0] = U64(1)
            np.cumprod(pw_inv, out=pw_inv)          # B^(-i), wraps mod 2^64
            Q = np.zeros(n + 1, dtype=np.uint64)
            np.cumsum(s * pw_inv, out=Q[1:])
            pw = np.full(n, B, dtype=np.uint64)
            pw[0] = U64(1)
            np.cumprod(pw, out=pw)                  # B^i
            out.append(splitmix64((Q[starts + L] - Q[starts]) * pw[starts + L - 1]))
    return out[0], out[1], starts, wc


def dup_span_extract(
    sf_dir: str,
    L: int = 24,
    num_partitions: int = 8,
    docs=None,
):
    """(doc_id, span_start, span_end, span_len): maximal unions of
    duplicated L-byte windows — the byte ranges covered by windows
    occurring >= 2 times corpus-wide, with runs closer than L merged
    (bridged gap bytes need not themselves start a duplicated window) —
    Lee et al. ExactSubstr duplicate detection, distributed as a
    window-hash inverted index (module docstring has the full stage
    map)."""
    np_parts = clamp_partitions(num_partitions)
    P = np.int64(max(2, 4 * np_parts))
    ds = docs if docs is not None else _docs(sf_dir, ["doc_id", "text"])

    def windows(batch: pa.Table) -> pa.Table:
        flat, offs = string_flat_offsets(pc.fill_null(batch.column("text"), ""))
        h1, h2, starts, wc = rolling_window_hashes(flat, offs, L)
        doc = np.repeat(
            batch.column("doc_id").to_numpy(zero_copy_only=False), wc
        ).astype(np.int64)
        p = starts - np.repeat(offs[:-1].astype(np.int64), wc)
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "p": pa.array(p, pa.int64()),
                "h1": pa.array(h1.view(np.int64), pa.int64()),
                "h2": pa.array(h2.view(np.int64), pa.int64()),
                "pkey": pa.array(
                    (h1 % U64(P)).astype(np.int64), pa.int64()
                ),
            }
        )

    def candidates(part: pa.Table) -> pa.Table:
        # all occurrences of a given h1 live in this partition, so a
        # lexsorted run-length pass IS the global >=2 count on (h1, h2)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "p": pa.array([], pa.int64()),
                "h1": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        h1 = part.column("h1").to_numpy(zero_copy_only=False)
        h2 = part.column("h2").to_numpy(zero_copy_only=False)
        o = np.lexsort((h2, h1))
        h1s, h2s = h1[o], h2[o]
        same = np.zeros(len(o), dtype=bool)
        if len(o) > 1:
            adj = (h1s[1:] == h1s[:-1]) & (h2s[1:] == h2s[:-1])
            same[1:] |= adj
            same[:-1] |= adj
        if not same.any():
            return empty
        keep = o[same]
        return pa.table(
            {
                "doc_id": part.column("doc_id").take(pa.array(keep)),
                "p": part.column("p").take(pa.array(keep)),
                "h1": part.column("h1").take(pa.array(keep)),
            }
        )

    cand = (
        ds.map_batches(windows, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(candidates, batch_format="pyarrow")
    )

    # ---- exact verify: re-slice candidate grams, group EXACT bytes ----
    def pack_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "p": batch.column("p"),
                "h1": batch.column("h1"),
            }
        )

    def pack_final(t: pa.Table) -> pa.Table:
        agg = t.group_by(["doc_id"]).aggregate([("p", "list"), ("h1", "list")])
        pl, hl = agg.column("p_list"), agg.column("h1_list")
        if isinstance(pl, pa.ChunkedArray):
            pl = pl.combine_chunks()
        if isinstance(hl, pa.ChunkedArray):
            hl = hl.combine_chunks()
        fp = pl.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        fh = hl.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offs = pl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        inter = np.empty(fp.size * 2, dtype=np.int64)
        inter[0::2] = fp
        inter[1::2] = fh
        pack = pa.Array.from_buffers(
            pa.large_binary(),
            len(pl),
            [None, pa.py_buffer((offs * 16).tobytes()), pa.py_buffer(inter.tobytes())],
        )
        return pa.table({"doc_id": agg.column("doc_id"), "cand_pack": pack})

    _EMPTY_SPANS = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "span_start": pa.array([], pa.int64()),
            "span_end": pa.array([], pa.int64()),
            "span_len": pa.array([], pa.int64()),
        }
    )

    packs = fold_by_int_keys(
        cand, ["doc_id"], pack_partial, pack_final, np_parts
    ).materialize()
    if packs.count() == 0:
        # duplicate-free corpus: an all-empty fold yields a schema-less
        # block that would poison the join's key resolution — short-circuit
        import ray.data as rd

        return rd.from_arrow(_EMPTY_SPANS)
    packs = strip_empty_blocks(packs)
    joined = strip_empty_blocks(
        ds.join(packs, join_type="inner", on=("doc_id",), num_partitions=np_parts)
    )

    def slice_grams(batch: pa.Table) -> pa.Table:
        pk = batch.column("cand_pack")
        if isinstance(pk, pa.ChunkedArray):
            pk = pk.combine_chunks()
        pflat, poffs = binary_flat_offsets(pk)
        inter = (
            np.frombuffer(np.ascontiguousarray(pflat).tobytes(), dtype=np.int64)
            if len(pflat)
            else np.empty(0, dtype=np.int64)
        )
        pos, h1 = inter[0::2], inter[1::2]
        n_per_row = (np.diff(poffs) // 16).astype(np.int64)
        row_of = np.repeat(np.arange(len(pk), dtype=np.int64), n_per_row)
        tflat, toffs = string_flat_offsets(pc.fill_null(batch.column("text"), ""))
        gstart = toffs[:-1].astype(np.int64)[row_of] + pos
        # gram bytes: one fancy-index gather (n_cand x L), then a flat
        # large_binary built straight from the buffer
        if len(gstart):
            grams_mat = tflat[gstart[:, None] + np.arange(L, dtype=np.int64)[None, :]]
            gvals = np.ascontiguousarray(grams_mat).reshape(-1)
        else:
            gvals = np.empty(0, dtype=np.uint8)
        goffs = np.arange(len(gstart) + 1, dtype=np.int64) * L
        grams = pa.Array.from_buffers(
            pa.large_binary(),
            len(gstart),
            [None, pa.py_buffer(goffs.tobytes()), pa.py_buffer(gvals.tobytes())],
        )
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)[row_of]
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "p": pa.array(pos, pa.int64()),
                "g": grams,
                "gpkey": pa.array(
                    (h1.view(np.uint64) % U64(P)).astype(np.int64), pa.int64()
                ),
            }
        )

    def verify_exact(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "p": pa.array([], pa.int64()),
                "dpkey": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        g = part.column("g")
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        si = pc.sort_indices(g)
        gs = g.take(si)
        n = len(gs)
        same = np.zeros(n, dtype=bool)
        if n > 1:
            adj = pc.equal(gs.slice(1), gs.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
            same[1:] |= adj
            same[:-1] |= adj
        if not same.any():
            return empty
        keep = si.to_numpy(zero_copy_only=False)[same]
        doc = part.column("doc_id").take(pa.array(keep))
        dpkey = (
            splitmix64(doc.to_numpy(zero_copy_only=False).view(np.uint64)) % U64(P)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": doc,
                "p": part.column("p").take(pa.array(keep)),
                "dpkey": pa.array(dpkey, pa.int64()),
            }
        )

    verified = (
        joined.map_batches(slice_grams, batch_format="pyarrow")
        .groupby("gpkey")
        .map_groups(verify_exact, batch_format="pyarrow")
    )

    def islands(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "span_start": pa.array([], pa.int64()),
                "span_end": pa.array([], pa.int64()),
                "span_len": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        doc = part.column("doc_id").to_numpy(zero_copy_only=False)
        p = part.column("p").to_numpy(zero_copy_only=False)
        o = np.lexsort((p, doc))
        doc, p = doc[o], p[o]
        brk = np.ones(len(p), dtype=bool)
        brk[1:] = (doc[1:] != doc[:-1]) | (p[1:] - p[:-1] > L)
        s_idx = np.flatnonzero(brk)
        e_idx = np.r_[s_idx[1:], len(p)] - 1
        return pa.table(
            {
                "doc_id": pa.array(doc[s_idx], pa.int64()),
                "span_start": pa.array(p[s_idx], pa.int64()),
                "span_end": pa.array(p[e_idx] + L, pa.int64()),
                "span_len": pa.array(p[e_idx] + L - p[s_idx], pa.int64()),
            }
        )

    return verified.groupby("dpkey").map_groups(islands, batch_format="pyarrow")


def dup_span_scrub(
    sf_dir: str,
    L: int = 24,
    num_partitions: int = 8,
    docs=None,
):
    """(doc_id, clean_text, n_spans, n_dup_chars): the corpus with every
    duplicated span (per :func:`dup_span_extract`) cut from every
    occurrence — Lee et al.'s released scrub semantics, the guarantee
    that no >= L-byte string survives twice.

    Scale shape: the span table (4 int64 columns, duplicated content
    only) folds per doc into a packed interval payload, one left-outer
    join re-attaches intervals to the docs, and the rebuild is a single
    diff-array + cumsum byte mask over the batch's concatenated UTF-8 —
    the clean strings are materialized straight from the kept-bytes
    buffer with recomputed offsets (no per-doc Python, no string
    concatenation loop)."""
    np_parts = clamp_partitions(num_partitions)
    ds = docs if docs is not None else _docs(sf_dir, ["doc_id", "text"])
    spans = dup_span_extract(sf_dir, L=L, num_partitions=num_partitions, docs=ds)

    def sp_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "s": batch.column("span_start"),
                "e": batch.column("span_end"),
            }
        )

    def sp_final(t: pa.Table) -> pa.Table:
        agg = t.group_by(["doc_id"]).aggregate([("s", "list"), ("e", "list")])
        sl, el = agg.column("s_list"), agg.column("e_list")
        if isinstance(sl, pa.ChunkedArray):
            sl = sl.combine_chunks()
        if isinstance(el, pa.ChunkedArray):
            el = el.combine_chunks()
        fs = sl.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        fe = el.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offs = sl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        inter = np.empty(fs.size * 2, dtype=np.int64)
        inter[0::2] = fs
        inter[1::2] = fe
        pack = pa.Array.from_buffers(
            pa.large_binary(),
            len(sl),
            [None, pa.py_buffer((offs * 16).tobytes()), pa.py_buffer(inter.tobytes())],
        )
        return pa.table({"doc_id": agg.column("doc_id"), "sp_pack": pack})

    packs = fold_by_int_keys(
        spans, ["doc_id"], sp_partial, sp_final, np_parts
    ).materialize()
    if packs.count() == 0:
        # duplicate-free corpus: every doc passes through unchanged (and
        # the schema-less empty fold block cannot enter a join anyway)
        def passthrough(batch: pa.Table) -> pa.Table:
            n = len(batch)
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "clean_text": pc.cast(
                        pc.fill_null(batch.column("text"), ""), pa.large_string()
                    ),
                    "n_spans": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
                    "n_dup_chars": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
                }
            )

        return ds.map_batches(passthrough, batch_format="pyarrow")
    packs = strip_empty_blocks(packs)
    joined = ds.join(
        packs, join_type="left_outer", on=("doc_id",), num_partitions=np_parts
    )

    def scrub(batch: pa.Table) -> pa.Table:
        pk = batch.column("sp_pack")
        if isinstance(pk, pa.ChunkedArray):
            pk = pk.combine_chunks()
        pflat, poffs = binary_flat_offsets(pc.fill_null(pk, b""))
        inter = (
            np.frombuffer(np.ascontiguousarray(pflat).tobytes(), dtype=np.int64)
            if len(pflat)
            else np.empty(0, dtype=np.int64)
        )
        s, e = inter[0::2], inter[1::2]
        n_per_row = (np.diff(poffs) // 16).astype(np.int64)
        row_of = np.repeat(np.arange(len(pk), dtype=np.int64), n_per_row)
        tflat, toffs = string_flat_offsets(pc.fill_null(batch.column("text"), ""))
        base = toffs[:-1].astype(np.int64)[row_of]
        nb = len(tflat)
        delta = np.zeros(nb + 1, dtype=np.int64)
        np.add.at(delta, base + s, 1)
        np.add.at(delta, base + e, -1)
        keep = np.cumsum(delta[:-1]) == 0
        kept = tflat[keep]
        ck = np.zeros(nb + 1, dtype=np.int64)
        np.cumsum(keep, out=ck[1:])
        new_offs = ck[toffs.astype(np.int64)]
        # spans are BYTE ranges: on a multi-byte corpus a duplicated
        # window can start/end mid-codepoint, so the kept bytes are
        # validated before being declared a string column — the common
        # (ASCII / codepoint-aligned) case is the zero-copy cast, and
        # only rows actually left with dangling partial codepoints pay
        # the per-row lossy re-decode (ADVICE r4)
        clean_bin = pa.Array.from_buffers(
            pa.large_binary(),
            len(batch),
            [None, pa.py_buffer(new_offs.tobytes()), pa.py_buffer(kept.tobytes())],
        )
        try:
            clean = clean_bin.cast(pa.large_string())
        except pa.ArrowInvalid:
            clean = pa.array(
                [
                    v.as_py().decode("utf-8", "ignore")
                    for v in clean_bin
                ],
                pa.large_string(),
            )
        n_spans = np.zeros(len(batch), dtype=np.int64)
        n_dup = np.zeros(len(batch), dtype=np.int64)
        if len(row_of):
            np.add.at(n_spans, row_of, 1)
            np.add.at(n_dup, row_of, e - s)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "clean_text": clean,
                "n_spans": pa.array(n_spans, pa.int64()),
                "n_dup_chars": pa.array(n_dup, pa.int64()),
            }
        )

    return joined.map_batches(scrub, batch_format="pyarrow")

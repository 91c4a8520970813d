"""Shingle extraction: text → flat uint64 shingle-hash array + row offsets.

The reference has no shingling (elements are bare uint64 loop counters,
reference: test/test_serial.c:66-68); this module defines the engine-level
mapping transcript → set of uint64 elements that then flow through the
reference's sketch algebra unchanged.

Normalization: unicode lowercase + whitespace fold (``str.split()``).
Token mode: w consecutive tokens combined with an order-sensitive
polynomial over per-token FNV-1a 64 hashes.  Char mode: w consecutive
bytes of the normalized text (spaces collapsed to single ' ').

Everything is vectorized: tokens are dictionary-encoded with pyarrow so the
python-level FNV loop only runs over *unique* tokens of a batch; w-gram
assembly is pure numpy index arithmetic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from minhash_ray.functions.hashing import combine_wgrams, hash_str_array

U64 = np.uint64


def _segmented_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated. counts: int64 (n,) → (sum,) int64."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(starts, counts)
    return out


def tokenize_with_strings(
    texts: pa.Array, seed: int
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Normalize + tokenize a string column, keeping the token strings.

    Returns (flat_tokens StringArray, token_counts int64 per row,
    flat_token_hashes uint64) — the strings are needed by operators that
    REASSEMBLE text from surviving tokens (e.g. ``repeated_ngram_scrub``);
    hash-only callers use :func:`tokenize_batch`.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lowered = pc.utf8_lower(texts)
    lowered = pc.fill_null(lowered, "")
    toks = pc.utf8_split_whitespace(lowered)          # ListArray<string>
    # split_whitespace can emit empty strings at the edges; drop them.
    flat = toks.flatten()
    # defensive trim (no-op on a correct split, where tokens never contain
    # whitespace): under Ray workers the split kernel was observed — rarely,
    # block-layout-dependently — emitting a row's final token WITH its
    # trailing space ('beta ' instead of 'beta' + ''), which silently
    # shifted that token's hash and every shingle containing it (r5: the
    # bigram_familiarity planted test flaked 10 vs 11 with a wrong last
    # shingle that inverted to combine(h('alpha'), h('beta '))).  Trimming
    # restores the canonical token regardless of the kernel's edge
    # behavior; edge-empties still drop via the filter below.
    flat = pc.utf8_trim_whitespace(flat)
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    # recompute per-row counts after the drop
    row_ids = np.repeat(np.arange(len(toks), dtype=np.int64), np.diff(offsets))
    row_ids = row_ids[keep_np]
    counts = np.bincount(row_ids, minlength=len(toks)).astype(np.int64)
    flat = flat.filter(keep)
    # dictionary-encode → hash only unique tokens
    dict_arr = flat.dictionary_encode()
    uniq = dict_arr.dictionary.to_pylist()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq_hashes = hash_str_array(uniq, seed)
    token_hashes = uniq_hashes[codes] if len(codes) else np.empty(0, dtype=np.uint64)
    return flat, counts, token_hashes


def tokenize_batch(texts: pa.Array, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Normalize + tokenize a string column.

    Returns (flat_token_hashes uint64, token_counts int64 per row).
    """
    _, counts, token_hashes = tokenize_with_strings(texts, seed)
    return token_hashes, counts


def token_shingles(
    texts: pa.Array, w: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Token w-gram shingle hashes.

    Returns (flat_shingle_hashes uint64, shingle_counts int64 per row).
    Rows with fewer than w tokens yield zero shingles (→ all-INFTY
    signature downstream, reference INFTY semantics
    src/configuration/configuration.c:143-148).
    """
    token_hashes, counts = tokenize_batch(texts, seed)
    s_counts = np.maximum(counts - (w - 1), 0).astype(np.int64)
    tok_starts = np.cumsum(counts) - counts
    local = _segmented_arange(s_counts)
    starts = np.repeat(tok_starts, s_counts) + local
    shingles = combine_wgrams(token_hashes, starts, w)
    return shingles, s_counts


def char_shingles(
    texts: pa.Array, w: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Byte w-gram shingle hashes over the normalized text (lowercased,
    whitespace collapsed to single spaces, stripped)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(pc.fill_null(texts, "")), r"\s+", " ")
    )
    seed_h = U64(seed & (2**64 - 1))
    # zero-copy flat UTF-8 view of the Arrow buffer — no per-row Python
    # encode/join (the column's bytes ARE the UTF-8 we want)
    from minhash_ray.util import string_flat_offsets

    flat_u8, offs = string_flat_offsets(norm)
    counts = np.diff(offs).astype(np.int64)
    flat = flat_u8.astype(np.uint64) ^ seed_h             # fold the seed per byte
    s_counts = np.maximum(counts - (w - 1), 0).astype(np.int64)
    starts = np.repeat(np.cumsum(counts) - counts, s_counts) + _segmented_arange(s_counts)
    shingles = combine_wgrams(flat, starts, w)
    return shingles, s_counts


def shingles_for_config(texts: pa.Array, cfg) -> tuple[np.ndarray, np.ndarray]:
    if cfg.shingle_mode == "token":
        return token_shingles(texts, cfg.shingle_w, cfg.seed)
    return char_shingles(texts, cfg.shingle_w, cfg.seed)

"""Small execution helpers."""

from __future__ import annotations

import numpy as np


def cluster_cpus(default: int = 8) -> int:
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default


def clamp_partitions(requested: int, reserve: int = 2) -> int:
    """Clamp a join/shuffle partition count so its aggregator actors plus
    ``reserve`` CPUs for neighbouring stages fit the cluster — an
    oversubscribed local cluster deadlocks (join backpressured while idle
    actor pools hold the CPUs)."""
    cpus = cluster_cpus()
    return max(2, min(requested, cpus - reserve if cpus > reserve else cpus))


def clamp_concurrency(requested: int) -> int:
    cpus = cluster_cpus()
    return max(1, min(requested, max(1, cpus // 2)))


def bytes_key_array(col) -> "np.ndarray":
    """String column (Arrow Array/ChunkedArray or list of str) → numpy
    fixed-width bytes (``'S'``) array via UTF-8.

    ``np.array(list_of_str, dtype='S')`` encodes with the ASCII codec and
    raises ``UnicodeEncodeError`` on any non-ASCII id; casting through
    Arrow ``binary`` yields UTF-8 bytes whose sort order matches Python
    ``str``/Arrow ``pc.less`` comparisons (UTF-8 byte order == code-point
    order), so ``np.searchsorted`` lookups stay consistent with the rest
    of the engine."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, (list, tuple)):
        if not col:
            return np.empty(0, dtype="S1")
        return np.array([s.encode("utf-8") for s in col], dtype="S")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty(0, dtype="S1")
    obj = pc.cast(col, pa.binary()).to_numpy(zero_copy_only=False)
    return obj.astype("S")   # bytes objects copy verbatim (no codec involved)


def int_lookup_pack(keys, values) -> dict:
    """Build a broadcastable int64-key → string-value lookup: sorted numpy
    key array + int32 codes + a small value vocabulary.

    Replaces python-dict broadcasts in join-lookup stages: a dict costs
    ~1 s deserialization per worker process (anti-scales with worker
    count); numpy arrays are zero-copy plasma views and the lookup is one
    ``searchsorted`` per batch (same pattern as the cluster-assignment
    pack, stages/cluster.py)."""
    import numpy as np
    import pyarrow as pa

    keys = np.asarray(keys, dtype=np.int64)
    order = np.argsort(keys)
    dict_arr = pa.array(list(values), pa.string()).dictionary_encode()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int32)
    return {
        "keys": keys[order],
        "codes": codes[order],
        "vocab": dict_arr.dictionary.to_pylist(),   # small domain, stays python
    }


def int_lookup_take(pack: dict, query) -> "pa.Array":
    """Vectorized lookup into an ``int_lookup_pack``: returns a string
    Arrow array with nulls where the key is absent."""
    import numpy as np
    import pyarrow as pa

    query = np.asarray(query, dtype=np.int64)
    keys = pack["keys"]
    if len(keys) == 0:
        return pa.array([None] * len(query), pa.string())
    pos = np.searchsorted(keys, query)
    pos_c = np.minimum(pos, len(keys) - 1)
    found = keys[pos_c] == query
    codes = pack["codes"][pos_c]
    vocab = pa.array(pack["vocab"], pa.string())
    indices = pa.array(codes, pa.int32(), mask=~found)
    return vocab.take(indices)


_BROADCAST_CACHE: dict = {}
_BROADCAST_CACHE_MAX = 8


def cached_get(ref):
    """Per-worker-process cache around ``ray.get`` for broadcast objects.

    Lets broadcast-lookup stages run as plain *tasks* (elastic, no idle CPU
    reservation, no actor-pool startup latency) while still deserializing
    the broadcast payload only once per worker process — the middle ground
    between an actor pool (state held, CPUs pinned) and naive per-task
    ``ray.get`` (repeated deserialization of dict payloads).

    Bounded LRU (pop+reinsert = touch): a long session runs MANY
    broadcast-consuming queries through the same worker pool, and an
    unbounded cache keeps a reference to every query's broadcast payload
    (zero-copy views pin their object-store segments) for the worker's
    lifetime — eviction only drops the cache's reference, callers hold
    their own for the duration of a task."""
    import ray

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    val = _BROADCAST_CACHE.pop(key, _BROADCAST_CACHE)   # sentinel: miss
    if val is _BROADCAST_CACHE:
        val = ray.get(ref)
        while len(_BROADCAST_CACHE) >= _BROADCAST_CACHE_MAX:
            _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
    _BROADCAST_CACHE[key] = val
    return val


def string_flat_offsets(col):
    """string/large_string column → (flat utf-8 bytes uint8, per-row
    offsets int64), slice-safe."""
    import numpy as np
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    large = pa.types.is_large_string(col.type) or pa.types.is_large_binary(col.type)
    odt = np.int64 if large else np.int32
    raw_off = np.frombuffer(col.buffers()[1], dtype=odt)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    start, end = int(raw_off[0]), int(raw_off[-1])
    return data[start:end], raw_off - start


# binary columns share the varbinary layout
binary_flat_offsets = string_flat_offsets


_WORDPOLY_CHUNK_WORDS = 16_384        # 128 KB scratch — L2-resident


def wordpoly_digest_rows_multi(flat, offs, mults):
    """Per-row polynomial hashes mod 2^64 over the row's 8-byte
    little-endian WORDS (zero-padded tail), one output array per
    multiplier in ``mults``, with the byte length folded in last:
    ``h = (Σ w_i·M^(m-1-i))·M + len`` ≡ the sequential fold
    ``h = h·M + w_i`` finished by ``h·M + len``.

    Word granularity keeps the per-byte temp footprint at ~1/8 of a
    byte-wise vectorized poly; rows are processed in 128 KB *chunks*
    through a reused aligned scratch buffer, Horner-folded between chunks
    (``h ← h·M^c + Σ w_j·M^(c-1-j)``, exact mod 2^64 — bit-identical to
    the single-pass fold), so the multiply/sum temps stay cache-resident
    and DRAM traffic is ONE read of the payload for ALL channels (the
    scratch chunk is reused across multipliers).  The previous
    full-length form (pad-copy + an m-word product temp per row) cost ~5
    bytes of memory traffic per payload byte per channel — the signature
    stage's dominant bandwidth term at full pool (BASELINE.md scaling
    notes)."""
    import numpy as np

    n = len(offs) - 1
    k = len(mults)
    outs = [np.empty(n, dtype=np.uint64) for _ in range(k)]
    if n == 0:
        return outs
    C = _WORDPOLY_CHUNK_WORDS
    # per channel: pw[j] = M^j (mod 2^64), j in [0, C]
    pws, pw_revs, Ms = [], [], []
    with np.errstate(over="ignore"):
        for m in mults:
            pw = np.empty(C + 1, dtype=np.uint64)
            pw[0] = np.uint64(1)
            pw[1:] = np.cumprod(np.full(C, np.uint64(m), dtype=np.uint64))
            pws.append(pw)
            pw_revs.append(pw[:C][::-1].copy())   # [C-c:] == M^(c-1) .. M^0
            Ms.append(np.uint64(m))
    scratch = np.zeros(C * 8, dtype=np.uint8)
    words = scratch.view(np.dtype("<u8"))
    prod = np.empty(C, dtype=np.uint64)
    hs = [np.uint64(0)] * k
    with np.errstate(over="ignore"):
        for i in range(n):
            o0, o1 = int(offs[i]), int(offs[i + 1])
            L = o1 - o0
            if L == 0:
                for j in range(k):
                    outs[j][i] = np.uint64(0)
                continue
            for j in range(k):
                hs[j] = np.uint64(0)
            pos = o0
            while pos < o1:
                blen = min(C * 8, o1 - pos)
                c = (blen + 7) // 8
                scratch[:blen] = flat[pos : pos + blen]
                if blen < c * 8:          # zero-pad the tail word only
                    scratch[blen : c * 8] = 0
                w = words[:c]
                p = prod[:c]
                for j in range(k):        # chunk stays cache-hot across channels
                    np.multiply(w, pw_revs[j][C - c :], out=p)
                    hs[j] = hs[j] * pws[j][c] + p.sum(dtype=np.uint64)
                pos += blen
            for j in range(k):
                outs[j][i] = hs[j] * Ms[j] + np.uint64(L)
    return outs


def wordpoly_digest_rows(flat, offs, mult: int):
    """Single-channel form of :func:`wordpoly_digest_rows_multi`."""
    return wordpoly_digest_rows_multi(flat, offs, [mult])[0]


# two independent 64-bit channels → a 128-bit content digest (collision
# probability ~n²/2^129); the raw bytes are never a shuffle key
DIGEST_PARAMS = (
    (0x517CC1B727220A95, 0x100000001B3),        # FNV-1a prime channel
    (0x9E3779B97F4A7C15, 0xD6E8FEB86659FD93),   # golden-ratio / odd-mult channel
)


_block_num_rows_remote = None


def from_arrow_refs_nonempty(refs):
    """``ray.data.from_arrow_refs`` minus empty blocks.

    Ray 2.49's hash-shuffle join broadcasts each input's schema only with
    the FIRST shuffled block; an empty first block short-circuits before
    the broadcast while still marking it done
    (hash_shuffle.py:223,589), and a join partition that then receives no
    shard finalizes ``pa.table({})`` — acero errors with ``No match or
    multiple matches for key field reference`` when that reaches a join
    side.  Dropping empty blocks up front removes the hazard.  Row counts
    are read via tiny zero-cpu remote probes (tables stay in plasma);
    one empty block is kept when ALL are empty so the dataset still
    carries the schema."""
    import ray
    import ray.data as rd

    global _block_num_rows_remote
    if _block_num_rows_remote is None:
        @ray.remote(num_cpus=0)
        def _nrows(t) -> int:
            return t.num_rows

        _block_num_rows_remote = _nrows
    nrows = ray.get([_block_num_rows_remote.remote(r) for r in refs])
    keep = [r for r, n in zip(refs, nrows) if n]
    return rd.from_arrow_refs(keep if keep else refs[:1])


def strip_empty_blocks(ds):
    """Materialize a Dataset and drop its empty blocks (see
    :func:`from_arrow_refs_nonempty`) — REQUIRED between two chained
    ``Dataset.join`` calls: join #1 finalizes an empty partition as a
    schema-LESS ``pa.table({})`` block, which poisons join #2's schema
    broadcast nondeterministically."""
    return from_arrow_refs_nonempty(ds.materialize().to_arrow_refs())


def fold_by_int_keys(
    ds,
    key_cols: list,
    partial_fn,
    final_fn,
    num_partitions: int,
    pkey_factor: int = 4,
):
    """Group-by whose DISTINCT-KEY count scales with the corpus: per-batch
    Arrow partial aggregate (``partial_fn``), key-hash partition, ONE
    vectorized Arrow aggregate per partition (``final_fn``).

    Ray Data's sort-based aggregate iterates groups at Python speed
    (measured ~160 µs/group — 130 s CPU for 800k groups), so any
    aggregate keyed on docs / clusters / digests / vocabulary elements
    must fold this way instead; Ray only ever sees the P pkey groups.

    ``partial_fn(batch) -> table`` must emit the integer key columns
    named in ``key_cols`` plus partial-aggregate columns;
    ``final_fn(table) -> table`` folds one partition's partials (the
    table holds every partial for each of its keys).  Keys must be
    integer-valued columns (cast strings to a digest first — the same
    reason the exact-dedup shuffle keys on digests, not texts)."""
    import pyarrow as pa

    from minhash_ray.stages.banding import splitmix64

    P = np.uint64(max(2, pkey_factor * clamp_partitions(num_partitions)))

    def add_pkey(batch: pa.Table) -> pa.Table:
        t = partial_fn(batch)
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for kc in key_cols:
            v = t.column(kc).to_numpy(zero_copy_only=False)
            h = splitmix64(h ^ v.astype(np.int64).view(np.uint64))
        return t.append_column("pkey", pa.array((h % P).astype(np.int64), pa.int64()))

    def fold(batch: pa.Table) -> pa.Table:
        return final_fn(batch.drop_columns(["pkey"]))

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(fold, batch_format="pyarrow")
    )


def fold_by_str_key(ds, key_col: str, partial_fn, final_fn, num_partitions: int,
                    pkey_factor: int = 4):
    """:func:`fold_by_int_keys` for a STRING key (vocabulary terms): the
    pkey comes from the width-independent vectorized FNV over the key's
    UTF-8 bytes (the pair-shuffle hash of ``stages/candidates``)."""
    import pyarrow as pa

    from minhash_ray.stages.candidates import _hash_fixed_bytes

    P = np.uint64(max(2, pkey_factor * clamp_partitions(num_partitions)))

    def add_pkey(batch: pa.Table) -> pa.Table:
        t = partial_fn(batch)
        h = _hash_fixed_bytes(bytes_key_array(t.column(key_col)))
        return t.append_column("pkey", pa.array((h % P).astype(np.int64), pa.int64()))

    def fold(batch: pa.Table) -> pa.Table:
        return final_fn(batch.drop_columns(["pkey"]))

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(fold, batch_format="pyarrow")
    )

"""Stage G — candidate-pair generation: THE wide shuffle.

Band rows (bucket, clip_id) → unordered candidate pairs (a < b) via a
**salted self-equi-join on the bucket key**:

1. a vectorized ``groupby(bucket).count()`` pass (partial aggregation per
   block, tiny output) finds hot buckets (> ``hot_band_threshold`` rows —
   e.g. boilerplate/silence clips all sharing a band hash),
2. hot bucket counts are broadcast (``ray.put`` once, read per task) and
   hot rows are **salted**: ``salt = splitmix64(fnv(clip_id)) % S_b`` with
   ``S_b = ceil(count / band_group_cap)`` sub-buckets, so no join group
   exceeds ~cap rows and the join blowup per hot bucket is O(count·cap)
   instead of O(count²),
3. the self-join emits within-(bucket, salt) ordered pairs; a filter keeps
   ``a < b``,
4. cross-salt connectivity for hot buckets is restored by a representative
   pass: min clip per (bucket, salt) → self-join reps on bucket → rep
   pairs.  Direct cross-salt pairs are traded for connectivity-via-
   representatives, the standard salted-LSH tradeoff (documented; recall is
   measured against planted truth in tests),
5. pairs are deduplicated across bands with a vectorized
   ``groupby(a, b).count()``.

This replaces the reference's single-threaded propagator bottleneck
(src/fcds/minhash-fcds.c:252-316) with a shuffle whose skew is explicitly
bounded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from minhash_ray.config import PipelineConfig
from minhash_ray.functions.hashing import FNV_OFFSET, FNV_PRIME
from minhash_ray.stages.banding import splitmix64

U64 = np.uint64

PAIRS_SCHEMA = pa.schema([("clip_id_a", pa.string()), ("clip_id_b", pa.string())])


def _hash_clip_ids(ids: pa.Array) -> np.ndarray:
    """Vectorized-ish uint64 hash of clip-id strings (used only for salting)."""
    # dictionary-encode first: hot buckets repeat ids across bands
    d = ids.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    from minhash_ray.functions.hashing import hash_str_array

    uh = splitmix64(hash_str_array(uniq, 0))
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return uh[codes] if len(codes) else np.empty(0, dtype=np.uint64)


def find_hot_buckets(band_ds, threshold: int, driver_max_rows: int = 50_000_000,
                     n_rows: int | None = None,
                     max_hot_buckets: int = 4_000_000) -> dict[int, int] | None:
    """bucket → row count for buckets above threshold, or ``None`` when the
    hot list itself would not be metadata-scale (> ``max_hot_buckets`` —
    e.g. a pathological everything-is-boilerplate corpus): the caller then
    degrades to GLOBAL salting (every bucket salted, connectivity restored
    by the representative pass) instead of holding an O(corpus) dict on
    the driver.

    Metadata-scale reduction: below ``driver_max_rows`` the bucket column
    (8 B/row) streams to the driver and is counted with one vectorized
    ``np.unique`` (Ray's aggregate operators carry seconds of fixed
    overhead that dwarf the actual count at this size); beyond it, the
    distributed groupby-count path takes over — its hot output likewise
    STREAMS to the driver (``iter_batches``, never ``take_all``) under the
    same cap."""
    if n_rows is None:
        n_rows = band_ds.count()
    if n_rows <= driver_max_rows:
        vals_list, cnts_list = [], []
        for batch in band_ds.select_columns(["bucket"]).iter_batches(
            batch_size=1_048_576, batch_format="pyarrow"
        ):
            v, c = np.unique(batch.column("bucket").to_numpy(), return_counts=True)
            vals_list.append(v)
            cnts_list.append(c)
        if not vals_list:
            return {}
        all_v = np.concatenate(vals_list)
        all_c = np.concatenate(cnts_list)
        uniq, inv = np.unique(all_v, return_inverse=True)
        totals = np.bincount(inv, weights=all_c).astype(np.int64)
        hot_mask = totals > threshold
        if int(hot_mask.sum()) > max_hot_buckets:
            return None
        return {int(v): int(c) for v, c in zip(uniq[hot_mask], totals[hot_mask])}

    counts = band_ds.groupby("bucket").count()
    cname = [c for c in counts.schema().names if c != "bucket"][0]
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t.column(cname), threshold)),
        batch_format="pyarrow",
    )
    out: dict[int, int] = {}
    for batch in hot.iter_batches(batch_size=1_048_576, batch_format="pyarrow"):
        if len(out) + batch.num_rows > max_hot_buckets:
            return None
        out.update(
            zip(
                batch.column("bucket").to_numpy().tolist(),
                batch.column(cname).to_numpy().tolist(),
            )
        )
    return out


def make_global_salt_fn(n_sub: int):
    """Degrade-path salting (see ``find_hot_buckets`` returning None):
    EVERY row is salted into ``n_sub`` sub-buckets by clip-id hash.  Cold
    buckets lose their direct within-bucket pairs, but the representative
    star pass restores connectivity per bucket — the standard salted-LSH
    connectivity-for-blowup trade, applied globally."""

    def add_salt(batch: pa.Table) -> pa.Table:
        ids = batch.column("clip_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        id_hash = _hash_clip_ids(ids)
        salt = (id_hash % U64(max(n_sub, 1))).astype(np.int64) + 1
        return batch.append_column("salt", pa.array(salt, pa.int64()))

    return add_salt


def make_salt_fn(hot_ref, cap: int):
    """map_batches fn adding a ``salt`` column (0 for cold buckets).

    ``hot_ref`` is a ``ray.ObjectRef`` wrapped in a list (broadcast once via
    ``ray.put``, cached per worker process)."""

    def add_salt(batch: pa.Table) -> pa.Table:
        if hot_ref:
            from minhash_ray.util import cached_get

            hot = cached_get(hot_ref[0])
        else:
            hot = {}
        buckets = batch.column("bucket").to_numpy()
        salt = np.zeros(len(buckets), dtype=np.int64)
        if hot:
            hot_keys = np.array(list(hot.keys()), dtype=np.int64)
            mask = np.isin(buckets, hot_keys)
            if mask.any():
                ids = batch.column("clip_id")
                if isinstance(ids, pa.ChunkedArray):
                    ids = ids.combine_chunks()
                id_hash = _hash_clip_ids(ids)
                counts = np.array([hot[int(b)] for b in buckets[mask]], dtype=np.int64)
                n_sub = np.maximum(counts // max(cap, 1), 1).astype(np.uint64)
                salt[mask] = ((id_hash[mask] % n_sub) + U64(1)).astype(np.int64)
        return batch.append_column("salt", pa.array(salt, pa.int64()))

    return add_salt


def _pairs_from_join(joined, out_cols=("clip_id_a", "clip_id_b"), local_dedupe: bool = True):
    """Keep strictly-ordered pairs from a self-join result, deduplicating
    within each batch (cross-batch duplicates are tolerated downstream)."""

    def keep_ordered(batch: pa.Table) -> pa.Table:
        a = batch.column("clip_id")
        b = batch.column("clip_id_r")
        mask = pc.less(a, b)
        t = batch.filter(mask)
        out = pa.table(
            {out_cols[0]: t.column("clip_id"), out_cols[1]: t.column("clip_id_r")},
            schema=PAIRS_SCHEMA,
        )
        if local_dedupe and out.num_rows:
            # Arrow-native distinct (group_by with no aggregates = unique
            # key rows) — no pandas round-trip in the shuffle tail
            out = out.group_by(["clip_id_a", "clip_id_b"]).aggregate([]).cast(PAIRS_SCHEMA)
        return out

    return joined.map_batches(keep_ordered, batch_format="pyarrow")


def _pairs_local_shuffle(salted_ds, cfg: PipelineConfig, n_partitions: int):
    """Candidate pairs via raw Ray reducer tasks (the one place the engine
    drops below the Dataset API, per SURVEY.md §2.6 rule (c)).

    Rationale: ``Dataset.join`` spins up per-partition aggregator actors
    with ~10 s of fixed latency — far more than the actual pair-generation
    work at metadata scale.  Each reducer task here mmap-reads the
    materialized band blocks zero-copy, filters its hash partition,
    sorts by bucket key, and emits pairs per equal-key run fully
    vectorized, with explicit skew control the join cannot express:
    runs up to ``band_group_cap`` emit all pairs, larger runs emit
    star+chain (2m-3 edges — connectivity preserved, quadratic blowup
    capped).  The join backend remains for true at-scale runs
    (``cfg.candidate_backend``)."""
    import ray
    import ray.data as rd

    refs = salted_ds.to_arrow_refs()
    cap = cfg.band_group_cap
    n_parts = n_partitions

    @ray.remote
    def split_block(block: pa.Table, n: int):
        """One scan of one band block → n compact per-partition shards
        (two-round map-reduce: total shuffle work is ONE pass over the
        data — the previous every-reducer-scans-every-block form did
        n_parts passes, so adding reducers added work and the stage
        anti-scaled)."""
        if not block.num_rows or "bucket" not in block.column_names:
            # empty (possibly schema-LESS) blocks slip out of map stages;
            # reducers skip zero-row shards
            empty = block.slice(0, 0)
            return tuple(empty for _ in range(n))
        bucket = block.column("bucket").to_numpy()
        salt = (
            block.column("salt").to_numpy()
            if "salt" in block.column_names
            else np.zeros(len(bucket), dtype=np.int64)
        )
        key = bucket * np.int64(1000003) + salt          # combined run key (wraps)
        part = (key % n + n) % n
        # per-part take → fresh COMPACT arrays (a slice-of-sorted view can
        # serialize its whole parent buffer)
        return tuple(
            block.take(pa.array(np.flatnonzero(part == p))) for p in range(n)
        )

    @ray.remote
    def reduce_partition(n_out: int, *blocks: pa.Table):
        """Emit this bucket-partition's locally-unique pairs, PRE-SPLIT by
        the pair key into ``n_out`` compact shards — the global-dedupe
        round consumes shard q of every reducer directly, with no separate
        re-keying map pass over the pair table."""
        def empties():
            e = pa.table({"clip_id_a": pa.array([], pa.string()),
                          "clip_id_b": pa.array([], pa.string())}, schema=PAIRS_SCHEMA)
            return tuple(e for _ in range(n_out))

        tables = [b for b in blocks if b.num_rows]
        if not tables:
            return empties()
        t = pa.concat_tables(tables).combine_chunks()
        bucket = t.column("bucket").to_numpy()
        salt = (
            t.column("salt").to_numpy()
            if "salt" in t.column_names
            else np.zeros(len(bucket), dtype=np.int64)
        )
        key = bucket * np.int64(1000003) + salt          # combined run key (wraps)
        ids = t.column("clip_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if len(key) == 0:
            return empties()
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        ids = ids.take(pa.array(order))
        starts = np.flatnonzero(np.diff(key_s, prepend=key_s[0] - 1))
        run_id = np.cumsum(np.diff(key_s, prepend=key_s[0] - 1) != 0) - 1
        run_len = np.diff(np.append(starts, len(key_s)))
        L = run_len[run_id]                              # run length per row
        r = np.arange(len(key_s)) - starts[run_id]       # position in run
        a_idx, b_idx = [], []
        # runs up to ``cap``: all pairs, j-loop bounded by cap iterations
        # over ONLY the small-run rows (gathered once)
        small = np.flatnonzero(L <= cap)
        if small.size:
            Ls = L[small]
            rs = r[small]
            for j in range(1, int(Ls.max())):
                mask = rs + j < Ls
                if not mask.any():
                    break
                src = small[mask]
                a_idx.append(src)
                b_idx.append(src + j)
        # over-cap runs: star+chain (2m-3 edges) emitted DIRECTLY in
        # O(run_len) — the previous j-loop form walked j up to the longest
        # run's length with a full-partition mask pass per j, turning a
        # single 100k-row bucket into an O(run_len x partition_rows)
        # straggler (ADVICE r3); connectivity is identical
        big = np.flatnonzero(L > cap)
        if big.size:
            rb = r[big]
            chain = big[rb + 1 < L[big]]                 # (i, i+1) adjacents
            if chain.size:
                a_idx.append(chain)
                b_idx.append(chain + 1)
            tail = big[rb >= 2]                          # (start, i); r==1 is
            if tail.size:                                # already the first chain edge
                a_idx.append(starts[run_id[tail]])
                b_idx.append(tail)
        if not a_idx:
            return empties()
        ai = np.concatenate(a_idx)
        bi = np.concatenate(b_idx)
        import pyarrow.compute as pc_

        A = ids.take(pa.array(ai))
        B = ids.take(pa.array(bi))
        lo = pc_.if_else(pc_.less(A, B), A, B)
        hi = pc_.if_else(pc_.less(A, B), B, A)
        out = pa.table({"clip_id_a": lo, "clip_id_b": hi}, schema=PAIRS_SCHEMA)
        # local dedupe (pairs from different bands in this partition),
        # Arrow-native: group_by with no aggregates = unique key rows
        out = out.group_by(["clip_id_a", "clip_id_b"]).aggregate([]).cast(PAIRS_SCHEMA)
        pk = _pair_pkey(out).column("pkey").to_numpy()
        part = (pk % n_out + n_out) % n_out
        return tuple(
            out.take(pa.array(np.flatnonzero(part == q))) for q in range(n_out)
        )

    @ray.remote
    def uniq_partition(*shards: pa.Table) -> pa.Table:
        """Global distinct for one pair-key partition; sorted output both
        for determinism and for verify-stage gather locality (pairs sorted
        by clip_id_a make the broadcast-pack row gathers near-sequential)."""
        tables = [s for s in shards if s.num_rows]
        if not tables:
            return pa.table({"clip_id_a": pa.array([], pa.string()),
                             "clip_id_b": pa.array([], pa.string())}, schema=PAIRS_SCHEMA)
        t = pa.concat_tables(tables)
        t = t.group_by(["clip_id_a", "clip_id_b"]).aggregate([]).cast(PAIRS_SCHEMA)
        return t.sort_by([("clip_id_a", "ascending"), ("clip_id_b", "ascending")])

    shards = [
        split_block.options(num_returns=n_parts).remote(r, n_parts) for r in refs
    ]
    mid = [
        reduce_partition.options(num_returns=n_parts).remote(
            n_parts, *[s[p] for s in shards]
        )
        for p in range(n_parts)
    ]
    tasks = [uniq_partition.remote(*[m[q] for m in mid]) for q in range(n_parts)]
    from minhash_ray.util import from_arrow_refs_nonempty

    return from_arrow_refs_nonempty(tasks)


def candidate_pairs(band_ds, cfg: PipelineConfig, num_partitions: int = 32):
    """Band rows → deduplicated unordered candidate pairs (a < b)."""
    import ray

    from minhash_ray.util import clamp_partitions

    # band rows are consumed by the count pass, both self-join sides and the
    # rep pass — pin them once (~24 B/row; at extreme scale checkpoint this
    # stage to parquet instead and feed the checkpoint here)
    band_ds = band_ds.materialize()

    # each hash-join partition spins up an aggregator actor (~seconds of
    # startup); don't pay for more partitions than the data volume needs
    n_band_rows = band_ds.count()
    num_partitions = clamp_partitions(
        min(num_partitions, max(2, n_band_rows // 500_000 + 1))
    )

    backend = cfg.candidate_backend
    if backend == "auto":
        # the raw-task reducers are fully distributed (the "local" name is
        # about bypassing Dataset.join, not the driver) and carry the
        # star+chain per-run caps; the join backend exists for cluster
        # scales where one exchange's ref fan-out matters (10^12 rows),
        # and pays per-group quadratic emission below the salt threshold
        backend = (
            "local" if n_band_rows <= cfg.candidate_local_max_rows else "join"
        )

    global_salt = False
    hot = {}
    # the hot-bucket pre-pass exists to keep any one JOIN group bounded —
    # the raw-task reducers don't need it (their per-run cap emits
    # star+chain for over-cap runs, the same degradation salting's
    # representative pass provides, without a driver-serial scan of every
    # bucket value: ~3 s of Amdahl serial time to find zero hot buckets on
    # a healthy corpus).  Runs in (band_group_cap, hot_band_threshold]
    # ALREADY took the star+chain path before this skip.
    if cfg.salt_hot_bands and backend != "local":
        hot = find_hot_buckets(
            band_ds, cfg.hot_band_threshold, driver_max_rows=cfg.driver_agg_max_rows,
            max_hot_buckets=cfg.max_hot_buckets,
        )
        if hot is None:                     # hot list not metadata-scale
            global_salt = True
            hot = {}
    hot_ref = [ray.put(hot)] if hot else None

    if global_salt:
        # degrade path: salt EVERYTHING (no per-bucket counts needed —
        # n_sub bounds any group at ~cap rows since no bucket can exceed
        # the total row count); connectivity restored by the star pass
        n_sub = max(2, -(-n_band_rows // max(cfg.band_group_cap, 1)))
        salted = band_ds.map_batches(
            make_global_salt_fn(n_sub), batch_format="pyarrow"
        ).materialize()
        join_key = ("bucket", "salt")
    elif hot:
        salted = band_ds.map_batches(
            make_salt_fn(hot_ref, cfg.band_group_cap), batch_format="pyarrow"
        ).materialize()
        join_key = ("bucket", "salt")
    else:
        # no hot buckets → salt is identically 0: skip the extra pass +
        # materialization entirely (the reducers treat a missing salt
        # column as 0, the join keys on bucket alone)
        salted = band_ds
        join_key = ("bucket",)

    if backend == "local":
        from minhash_ray.util import cluster_cpus

        # partition count = CPU count: A/B-measured equal to 4x finer
        # partitioning at both 4 and 16 CPUs on the 200k corpus — the
        # reducer sorts are not the binding term
        pairs = _pairs_local_shuffle(
            salted, cfg, n_partitions=max(2, min(num_partitions, cluster_cpus()))
        )
    else:
        joined = salted.join(
            salted,
            join_type="inner",
            on=join_key,
            right_suffix="_r",
            num_partitions=num_partitions,
        )
        pairs = _pairs_from_join(joined)

    if global_salt:
        # fully-distributed star pass: min clip per (bucket, salt), then a
        # star from each bucket's minimum representative — O(reps) edges
        # (combinations would be quadratic in sub-buckets exactly when the
        # degrade path triggers), connectivity preserved per bucket
        reps = salted.groupby(["bucket", "salt"]).min("clip_id")
        rep_col = [c for c in reps.schema().names if c.startswith("min")][0]
        reps = reps.map_batches(
            lambda t: pa.table(
                {"bucket": t.column("bucket"), "clip_id": t.column(rep_col)}
            ),
            batch_format="pyarrow",
        ).materialize()
        bucket_min = reps.groupby("bucket").min("clip_id")
        bmin_col = [c for c in bucket_min.schema().names if c.startswith("min")][0]
        star_joined = reps.join(
            bucket_min,
            join_type="inner",
            on=("bucket",),
            num_partitions=max(2, num_partitions // 8),
        )

        def star_pairs(batch: pa.Table) -> pa.Table:
            mask = pc.less(batch.column(bmin_col), batch.column("clip_id"))
            t = batch.filter(mask)
            return pa.table(
                {"clip_id_a": t.column(bmin_col), "clip_id_b": t.column("clip_id")},
                schema=PAIRS_SCHEMA,
            )

        pairs = pairs.union(star_joined.map_batches(star_pairs, batch_format="pyarrow"))
    elif hot:
        # representative pass: min clip per (bucket, salt) of hot buckets,
        # paired across salts → connectivity across salt sub-buckets
        hot_keys_arr = np.array(list(hot.keys()), dtype=np.int64)

        def keep_hot(batch: pa.Table) -> pa.Table:
            mask = np.isin(batch.column("bucket").to_numpy(), hot_keys_arr)
            return batch.filter(pa.array(mask))

        hot_rows = salted.map_batches(keep_hot, batch_format="pyarrow")
        n_hot_rows = sum(hot.values())
        if n_hot_rows <= cfg.driver_agg_max_rows:
            # metadata-scale: reps + rep pairs computed driver-side
            import itertools

            import pandas as pd

            frames = [
                b for b in hot_rows.iter_batches(batch_size=1_048_576, batch_format="pandas")
            ]
            if frames:
                df = pd.concat(frames, ignore_index=True)
                reps = df.groupby(["bucket", "salt"])["clip_id"].min().reset_index()
                pa_list, pb_list = [], []
                for _, grp in reps.groupby("bucket"):
                    ids = sorted(grp["clip_id"].tolist())
                    for x, y in itertools.combinations(ids, 2):
                        pa_list.append(x)
                        pb_list.append(y)
                if pa_list:
                    import ray.data as rd

                    rep_pairs = rd.from_arrow(
                        pa.table(
                            {
                                "clip_id_a": pa.array(pa_list, pa.string()),
                                "clip_id_b": pa.array(pb_list, pa.string()),
                            },
                            schema=PAIRS_SCHEMA,
                        )
                    )
                    pairs = pairs.union(rep_pairs)
        else:
            # distributed fallback: groupby-min reps + self-join on bucket
            reps = hot_rows.groupby(["bucket", "salt"]).min("clip_id")
            rep_col = [c for c in reps.schema().names if c.startswith("min")][0]
            reps = reps.map_batches(
                lambda t: pa.table(
                    {"bucket": t.column("bucket"), "clip_id": t.column(rep_col)}
                ),
                batch_format="pyarrow",
            )
            rep_joined = reps.join(
                reps,
                join_type="inner",
                on=("bucket",),
                right_suffix="_r",
                num_partitions=max(2, num_partitions // 8),
            )
            pairs = pairs.union(_pairs_from_join(rep_joined))

    if backend == "local":
        # the fused local shuffle already ends in the global-distinct round
        # (reducers emit pkey-pre-split shards straight into it)
        return pairs
    if cfg.pair_dedupe == "local":
        # batches were deduped inside _pairs_from_join / the reducers;
        # remaining cross-batch duplicates cost duplicate (vectorized)
        # verification and produce duplicate edges, which union-find absorbs
        return pairs
    # global distinct (default "auto"): reducer-local dedupe is keyed by the
    # BUCKET hash, so one true near-dup pair colliding in many of the
    # 32 text + simhash-chunk + 16 audio bands re-emerges once per band
    # partition — measured ~6x duplication on a dup-dense corpus (5.7M
    # emitted vs ~1M unique), and every duplicate is re-verified (exact
    # Jaccard) and re-folded by union-find downstream.  One slim shuffle of
    # the (a, b) id table here removes that entire multiplier.
    return dedupe_pairs(
        pairs,
        driver_max_rows=cfg.driver_agg_max_rows,
        num_partitions=num_partitions,
        force_groupby=(cfg.pair_dedupe == "global"),
    )


def _hash_fixed_bytes(ka: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a over a numpy fixed-width ``'S'`` bytes array —
    column-at-a-time over the (short) id width, never a Python loop over
    rows.  Each row's hash folds only its TRUE bytes (masked to the row's
    length, not the array's padded width), so the same id hashes
    identically regardless of which batch — and hence which max-id-width
    'S' array — it arrived in; equals ``fnv1a_64(id_bytes)`` exactly.
    (Ids are UTF-8 strings, so they contain no interior NUL bytes and
    length = index of last non-NUL + 1.)"""
    if ka.size == 0:
        return np.empty(0, dtype=np.uint64)
    width = ka.dtype.itemsize
    m = ka.view(np.uint8).reshape(len(ka), width)
    nz = m != 0
    lengths = width - np.argmax(nz[:, ::-1], axis=1)
    lengths[~nz.any(axis=1)] = 0
    h = np.full(len(ka), U64(FNV_OFFSET))
    P = U64(FNV_PRIME)
    for j in range(width):
        live = lengths > j
        if not live.any():
            break
        hj = h[live]
        h[live] = (hj ^ m[live, j].astype(np.uint64)) * P
    return h


def _pair_pkey(batch: pa.Table) -> pa.Table:
    """Append an int64 ``pkey`` hash of the (a, b) pair for hash
    partitioning (computed in parallel inside the dedupe's map pass)."""
    from minhash_ray.util import bytes_key_array

    ha = _hash_fixed_bytes(bytes_key_array(batch.column("clip_id_a")))
    hb = _hash_fixed_bytes(bytes_key_array(batch.column("clip_id_b")))
    pkey = splitmix64(ha * U64(FNV_PRIME) + hb).view(np.int64)
    return batch.append_column("pkey", pa.array(pkey))


def dedupe_pairs(pairs_ds, driver_max_rows: int, num_partitions: int,
                 force_groupby: bool = False):
    """Globally distinct candidate pairs.

    Below ``driver_max_rows`` the shuffle is raw reducer tasks over the
    materialized slim pair blocks (same rationale as
    ``_pairs_local_shuffle``: ``Dataset.groupby`` spins up per-partition
    aggregator actors whose ~10 s fixed startup dwarfs the actual distinct
    at metadata scale); each reducer zero-copy-filters its hash partition
    of the precomputed ``pkey`` and takes Arrow-native unique key rows.
    Above it (or with ``pair_dedupe="global"`` forced), the Dataset-native
    groupby distinct takes over — a true at-scale all-to-all."""
    import ray
    import ray.data as rd

    from minhash_ray.util import cluster_cpus

    if "pkey" in pairs_ds.schema().names:
        keyed = pairs_ds          # local reducers pre-attach the key
    else:
        keyed = pairs_ds.map_batches(_pair_pkey, batch_format="pyarrow").materialize()
    n = keyed.count()
    if force_groupby or n > driver_max_rows:
        uniq = keyed.groupby(["clip_id_a", "clip_id_b"]).count()
        return uniq.select_columns(["clip_id_a", "clip_id_b"])
    if n == 0:
        return keyed.select_columns(["clip_id_a", "clip_id_b"])

    n_parts = max(2, min(num_partitions, cluster_cpus(), n // 50_000 + 1))
    refs = keyed.to_arrow_refs()

    @ray.remote
    def split_pairs(block: pa.Table, n: int):
        """One scan of one pair block → n compact per-pkey-partition shards
        (same two-round shuffle shape as the band reducers — every-task-
        scans-everything anti-scales)."""
        if not block.num_rows:
            empty = block.slice(0, 0)
            return tuple(empty for _ in range(n))
        pk = block.column("pkey").to_numpy()
        part = (pk % n + n) % n
        return tuple(
            block.take(pa.array(np.flatnonzero(part == p))) for p in range(n)
        )

    @ray.remote
    def uniq_partition(*blocks: pa.Table) -> pa.Table:
        tables = [b for b in blocks if b.num_rows]
        if not tables:
            return pa.table(
                {"clip_id_a": pa.array([], pa.string()),
                 "clip_id_b": pa.array([], pa.string())}, schema=PAIRS_SCHEMA)
        t = pa.concat_tables(tables).select(["clip_id_a", "clip_id_b"])
        return t.group_by(["clip_id_a", "clip_id_b"]).aggregate([]).cast(PAIRS_SCHEMA)

    shards = [split_pairs.options(num_returns=n_parts).remote(r, n_parts) for r in refs]
    tasks = [uniq_partition.remote(*[s[p] for s in shards]) for p in range(n_parts)]
    from minhash_ray.util import from_arrow_refs_nonempty

    return from_arrow_refs_nonempty(tasks)

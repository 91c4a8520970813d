"""Event-stream operators over the ``events`` table — the *streaming
window* engine category from the gap analysis (SURVEY.md §2.6).

The reference approximates unbounded streams with infinite-insert drivers
(test/fcds/test_fixed_queries_infinite_write.c:90-99) and needs no
watermarks because its min-fold is order-independent; these operators
cover the stream shapes that ARE order-sensitive and that a training-data
/ analytics pipeline actually runs:

* :func:`window_counts` — tumbling-window aggregate (bucket by truncated
  timestamp, partial-per-block hash aggregate; embarrassingly parallel).
* :func:`sessionize` — gap-based session assignment (a session breaks
  when a user is idle longer than ``gap_minutes``): the canonical
  order-WITHIN-key windowed computation.
* :func:`asof_prior` — per-user as-of self-join: each ``left_type`` event
  gets the id of the latest strictly-preceding ``right_type`` event of
  the same user (-1 when none) — the "as-of join" custom operator Ray
  Data lacks natively.

Partitioning contract (documented per the custom-operator rule): the
order-sensitive ops hash-partition on ``user_id`` and require one *key's*
rows — not the corpus — to fit a task.  Keys are never split across
partitions, so within-partition ``lexsort`` + segmented scans give exact
global semantics; at 100 TB the per-user event list is the unit that must
be memory-bounded (true for any real user stream).

All three are deterministic, integer-valued, and exactly SQL-expressible
— each carries a DuckDB window-function oracle in ``__ray_entry__``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from minhash_ray.stages.banding import splitmix64


def _events(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def _ts_us(col) -> np.ndarray:
    """timestamp[us] column → int64 microseconds since epoch."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.int64()).to_numpy()


def window_counts(sf_dir: str, window_minutes: int = 60):
    """Tumbling-window aggregate: per (window start, event type) the event
    count and the value sum in cents.  ``window_us`` is the window start
    as int64 epoch-microseconds (timezone-free, bit-exact to compare).

    Scale shape: the window key is computed per batch (vectorized) and the
    partials fold through a WINDOW-HASH partition (windows scale with the
    stream's time span, so they must never become Ray-aggregate groups);
    windows never require ordering, only bucketing, so no sort and no
    watermark state.
    """
    win_us = np.int64(window_minutes) * 60_000_000

    def widen(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch.column("ts"))
        value = batch.column("value").to_numpy()
        return pa.table(
            {
                "window_us": pa.array((ts // win_us) * win_us, pa.int64()),
                "event_type": batch.column("event_type"),
                "value_cents": pa.array(
                    np.floor(value * 100.0 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    return _window_fold(
        _events(sf_dir, ["ts", "event_type", "value"]).map_batches(
            widen, batch_format="pyarrow"
        )
    )


def _window_fold(widened, num_partitions: int = 8):
    """(window_us, event_type) partial+final aggregate through a
    window-hash partition — shared by the tumbling and sliding ops."""
    import pyarrow.compute as pc

    from minhash_ray.util import fold_by_int_keys

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(["window_us", "event_type"]).aggregate(
            [([], "count_all"), ("value_cents", "sum")]
        )
        return pa.table(
            {
                "window_us": agg.column("window_us"),
                "event_type": agg.column("event_type"),
                "n_events": pc.cast(agg.column("count_all"), pa.int64()),
                "value_cents": pc.cast(agg.column("value_cents_sum"), pa.int64()),
            }
        )

    def final(t: pa.Table) -> pa.Table:
        agg = t.group_by(["window_us", "event_type"]).aggregate(
            [("n_events", "sum"), ("value_cents", "sum")]
        )
        return pa.table(
            {
                "window_us": agg.column("window_us"),
                "event_type": agg.column("event_type"),
                "n_events": pc.cast(agg.column("n_events_sum"), pa.int64()),
                "value_cents": pc.cast(agg.column("value_cents_sum"), pa.int64()),
            }
        )

    return fold_by_int_keys(widened, ["window_us"], partial, final, num_partitions)


def sliding_window_counts(sf_dir: str, window_minutes: int = 60, hop_minutes: int = 15):
    """Sliding/hopping-window aggregate: per (window start, event type) the
    event count and value sum in cents, where window starts are aligned to
    ``hop_minutes`` and each window spans ``window_minutes`` — an event at
    ``ts`` lands in every window with start in ``(ts - window, ts]``,
    i.e. ⌈window/hop⌉ windows.  ``hop == window`` reduces exactly to
    :func:`window_counts` (tested).

    Scale shape: the ≤⌈window/hop⌉× row replication happens vectorized
    inside ``map_batches`` on the SLIM (window_us, event_type,
    value_cents) projection — the wide input row is never replicated —
    followed by the same partial+final hash aggregate as the tumbling op.
    No sort, no watermark state; the blowup factor is the config constant
    window/hop, not data-dependent.
    """
    if window_minutes % hop_minutes != 0 and hop_minutes > window_minutes:
        raise ValueError("hop must not exceed window")
    win_us = np.int64(window_minutes) * 60_000_000
    hop_us = np.int64(hop_minutes) * 60_000_000
    n_hops = int(-(-win_us // hop_us))          # ceil(window/hop)

    def widen(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch.column("ts"))
        value = batch.column("value").to_numpy()
        cents = np.floor(value * 100.0 + 0.5).astype(np.int64)
        etype = batch.column("event_type")
        if isinstance(etype, pa.ChunkedArray):
            etype = etype.combine_chunks()
        base = (ts // hop_us) * hop_us
        offset = ts - base                      # ts mod hop, in [0, hop)
        starts_parts, idx_parts = [], []
        idx = np.arange(len(ts), dtype=np.int64)
        for j in range(n_hops):
            keep = offset + np.int64(j) * hop_us < win_us
            starts_parts.append((base - np.int64(j) * hop_us)[keep])
            idx_parts.append(idx[keep])
        starts = np.concatenate(starts_parts) if starts_parts else np.empty(0, np.int64)
        src = np.concatenate(idx_parts) if idx_parts else np.empty(0, np.int64)
        return pa.table(
            {
                "window_us": pa.array(starts, pa.int64()),
                "event_type": etype.take(pa.array(src)),
                "value_cents": pa.array(cents[src], pa.int64()),
            }
        )

    return _window_fold(
        _events(sf_dir, ["ts", "event_type", "value"]).map_batches(
            widen, batch_format="pyarrow"
        )
    )


def window_top_events(sf_dir: str, window_minutes: int = 60, topk: int = 3,
                      num_partitions: int = 8):
    """(window_us, event_type, n_events, rnk): the top-``topk`` event
    types of every tumbling window by count (ties broken by event_type
    asc) — the per-window heavy-hitter report of a streaming dashboard.

    Scale shape: rides :func:`window_counts` (already one row per
    (window, type) — metadata-scale), then ONE window-hash partition so
    each window's rows meet in a single task for the exact vectorized
    rank; nothing resembling corpus width ever moves."""
    from minhash_ray.util import clamp_partitions

    wc = window_counts(sf_dir, window_minutes)
    P = np.uint64(max(2, clamp_partitions(num_partitions)))

    def add_key(batch: pa.Table) -> pa.Table:
        w = batch.column("window_us").to_numpy(zero_copy_only=False)
        pkey = (splitmix64(w.view(np.uint64)) % P).astype(np.int64)
        return batch.append_column("pkey", pa.array(pkey, pa.int64()))

    def rank_fn(t: pa.Table) -> pa.Table:
        w = t.column("window_us").to_numpy(zero_copy_only=False)
        n = t.column("n_events").to_numpy(zero_copy_only=False)
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # event_type ties must break in STRING order, not dictionary order
        str_rank = np.argsort(
            np.argsort(np.asarray(enc.dictionary.to_pylist(), dtype=object))
        )
        order = np.lexsort((str_rank[codes], -n, w))
        ws = w[order]
        m = len(ws)
        new = np.ones(m, dtype=bool)
        if m > 1:
            new[1:] = ws[1:] != ws[:-1]
        idx = np.arange(m, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new, idx, 0))
        rnk = idx - start + 1
        keep = rnk <= topk
        sel = pa.array(order[keep], pa.int64())
        return pa.table(
            {
                "window_us": pa.array(ws[keep], pa.int64()),
                "event_type": et.take(sel),
                "n_events": pa.array(n[order[keep]], pa.int64()),
                "rnk": pa.array(rnk[keep], pa.int64()),
            }
        )

    return (
        wc.map_batches(add_key, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(rank_fn, batch_format="pyarrow")
    )


def _with_user_partition(ds, num_partitions: int):
    """Append ``pkey = splitmix64(user_id) % P``: the hash partition that
    co-locates each user's full event history (the op's partitioning
    assumption) while spreading users evenly."""
    P = np.uint64(max(2, num_partitions))

    def add_pkey(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy().astype(np.uint64)
        pkey = (splitmix64(uid) % P).astype(np.int64)
        return batch.append_column("pkey", pa.array(pkey, pa.int64()))

    return ds.map_batches(add_pkey, batch_format="pyarrow")


def _user_sorted(batch: pa.Table):
    """lexsort a partition's rows by (user, ts, event_id) and return the
    sorted key arrays plus per-row index of the user's first row."""
    ids = batch.column("event_id").to_numpy()
    uid = batch.column("user_id").to_numpy()
    ts = _ts_us(batch.column("ts"))
    o = np.lexsort((ids, ts, uid))
    uid_s, ts_s, ids_s = uid[o], ts[o], ids[o]
    n = len(o)
    new_user = np.ones(n, dtype=bool)
    if n > 1:
        new_user[1:] = uid_s[1:] != uid_s[:-1]
    idx = np.arange(n, dtype=np.int64)
    user_start = np.maximum.accumulate(np.where(new_user, idx, 0))
    return o, uid_s, ts_s, ids_s, new_user, user_start


def sessionize(sf_dir: str, gap_minutes: int = 30, num_partitions: int = 32):
    """(event_id, user_id, session_seq): a user's events split into
    sessions wherever the gap to the previous event exceeds
    ``gap_minutes``; ``session_seq`` is the 0-based session index within
    the user (deterministic tie-break: ts then event_id)."""
    gap_us = np.int64(gap_minutes) * 60_000_000

    def per_partition(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "session_seq": pa.array([], pa.int64()),
                }
            )
        _, uid_s, ts_s, ids_s, new_user, user_start = _user_sorted(batch)
        n = len(ids_s)
        brk = np.zeros(n, dtype=bool)
        if n > 1:
            brk[1:] = (~new_user[1:]) & ((ts_s[1:] - ts_s[:-1]) > gap_us)
        cum = np.cumsum(brk.astype(np.int64))
        seq = cum - cum[user_start]        # breaks since the user's first row
        return pa.table(
            {
                "event_id": pa.array(ids_s, pa.int64()),
                "user_id": pa.array(uid_s, pa.int64()),
                "session_seq": pa.array(seq, pa.int64()),
            }
        )

    ds = _with_user_partition(
        _events(sf_dir, ["event_id", "user_id", "ts"]), num_partitions
    )
    return ds.groupby("pkey").map_groups(per_partition, batch_format="pyarrow")


def range_join_recent(
    sf_dir: str,
    left_type: str = "error",
    right_type: str = "click",
    window_minutes: int = 5,
):
    """Banded time-RANGE join: for every ``left_type`` event, the number
    of ``right_type`` events (any user) in the half-open window
    ``(ts - window, ts]`` — the interval-join shape Ray Data has no
    native operator for.

    Banding makes it one equi-shuffle: both sides bucket into
    window-width time bands; a right event in band b can only serve left
    events in bands b and b+1 (the lookback crosses at most one
    boundary), so right rows are emitted to both and each left event is
    resolved entirely inside its OWN band group with two vectorized
    ``searchsorted``s against the group's sorted right timestamps.  Each
    (left, right) pair is counted exactly once because a left event
    lives in exactly one group.  Partitioning contract: one time band's
    rows must fit a task — at 100 TB the band width is the knob.
    """
    win_us = np.int64(window_minutes) * 60_000_000

    def band_rows(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type")
        if isinstance(types, pa.ChunkedArray):
            types = types.combine_chunks()
        t_np = np.asarray(types.to_numpy(zero_copy_only=False))
        ts = _ts_us(batch.column("ts"))
        ids = batch.column("event_id").to_numpy()
        band = ts // win_us
        is_l = t_np == left_type
        is_r = t_np == right_type
        out_band = [band[is_l], band[is_r], band[is_r] + 1]
        out_left = [
            np.ones(int(is_l.sum()), dtype=bool),
            np.zeros(int(is_r.sum()), dtype=bool),
            np.zeros(int(is_r.sum()), dtype=bool),
        ]
        out_ids = [ids[is_l], ids[is_r], ids[is_r]]
        out_ts = [ts[is_l], ts[is_r], ts[is_r]]
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band), pa.int64()),
                "is_left": pa.array(np.concatenate(out_left), pa.bool_()),
                "event_id": pa.array(np.concatenate(out_ids), pa.int64()),
                "ts_us": pa.array(np.concatenate(out_ts), pa.int64()),
            }
        )

    def per_band(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "n_recent": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        is_l = batch.column("is_left").to_numpy(zero_copy_only=False)
        ids = batch.column("event_id").to_numpy()
        ts = batch.column("ts_us").to_numpy()
        lts, lids = ts[is_l], ids[is_l]
        rts = np.sort(ts[~is_l])
        if len(lts) == 0:
            return empty
        hi = np.searchsorted(rts, lts, side="right")
        lo = np.searchsorted(rts, lts - win_us, side="right")
        return pa.table(
            {
                "event_id": pa.array(lids, pa.int64()),
                "n_recent": pa.array((hi - lo).astype(np.int64), pa.int64()),
            }
        )

    ds = _events(sf_dir, ["event_id", "ts", "event_type"]).map_batches(
        band_rows, batch_format="pyarrow"
    )
    return ds.groupby("band").map_groups(per_band, batch_format="pyarrow")


def asof_prior(
    sf_dir: str,
    left_type: str = "purchase",
    right_type: str = "click",
    num_partitions: int = 32,
):
    """Per-user as-of self-join: for every ``left_type`` event, the
    event_id of the most recent strictly-preceding ``right_type`` event of
    the SAME user (order: ts, then event_id; -1 when the user has none
    before that point).  Works for ``left_type == right_type`` too (the
    running maximum is shifted one row, so an event never matches
    itself)."""

    def per_partition(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "prior_event_id": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        types = batch.column("event_type")
        if isinstance(types, pa.ChunkedArray):
            types = types.combine_chunks()
        o, uid_s, ts_s, ids_s, new_user, user_start = _user_sorted(batch)
        t_s = np.asarray(types.to_numpy(zero_copy_only=False))[o]
        n = len(ids_s)
        idx = np.arange(n, dtype=np.int64)
        is_r = t_s == right_type
        last_r = np.maximum.accumulate(np.where(is_r, idx, np.int64(-1)))
        # strictly preceding: shift the running max one row back
        last_r = np.concatenate([[np.int64(-1)], last_r[:-1]])
        left_rows = np.flatnonzero(t_s == left_type)
        lr = last_r[left_rows]
        # a prior index before the user's first row belongs to another user
        valid = lr >= user_start[left_rows]
        prior = np.where(valid, ids_s[np.maximum(lr, 0)], np.int64(-1))
        return pa.table(
            {
                "event_id": pa.array(ids_s[left_rows], pa.int64()),
                "user_id": pa.array(uid_s[left_rows], pa.int64()),
                "prior_event_id": pa.array(prior, pa.int64()),
            }
        )

    ds = _with_user_partition(
        _events(sf_dir, ["event_id", "user_id", "ts", "event_type"]), num_partitions
    )
    return ds.groupby("pkey").map_groups(per_partition, batch_format="pyarrow")


def distinct_users_per_type(sf_dir: str, num_partitions: int = 32):
    """(event_type, n_users): EXACT per-group COUNT(DISTINCT user_id) —
    the audience-size / cardinality query every event pipeline ships.

    Scale shape (two-level exact distinct, the COUNT(DISTINCT) analog of
    partial aggregation): each batch first collapses to its distinct
    (event_type, user_id) pairs (one lexsort, no Python loop), so the
    shuffle moves at most one row per pair per batch; rows are then
    hash-partitioned on the PAIR (splitmix64(user) ^ type-hash), each
    partition dedups its pairs exactly once globally — a pair lands in
    exactly one partition — and counts per type; a final metadata-scale
    groupby sums the per-partition counts.  No corpus-width state
    anywhere, and a hot event_type is spread across all partitions by the
    user component of the key."""
    from ray.data.aggregate import Sum

    from minhash_ray.functions.hashing import hash_str_array
    from minhash_ray.util import clamp_partitions

    P = np.uint64(max(2, clamp_partitions(num_partitions)))

    def _distinct_pairs(batch: pa.Table):
        t = batch.column("event_type")
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        enc = t.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        users = batch.column("user_id").to_numpy()
        o = np.lexsort((users, codes))
        cs, us = codes[o], users[o]
        first = np.ones(len(cs), dtype=bool)
        if len(cs) > 1:
            first[1:] = (cs[1:] != cs[:-1]) | (us[1:] != us[:-1])
        return enc.dictionary, cs[first], us[first]

    def local_distinct(batch: pa.Table) -> pa.Table:
        vocab, cs, us = _distinct_pairs(batch)
        type_h = hash_str_array(vocab.to_pylist(), 7)
        pkey = ((splitmix64(us.astype(np.uint64)) ^ type_h[cs]) % P).astype(np.int64)
        return pa.table(
            {
                "event_type": vocab.take(pa.array(cs, pa.int64())),
                "user_id": pa.array(us, pa.int64()),
                "pkey": pa.array(pkey, pa.int64()),
            }
        )

    def per_partition_count(batch: pa.Table) -> pa.Table:
        vocab, cs, _ = _distinct_pairs(batch)
        n = np.bincount(cs, minlength=len(vocab)).astype(np.int64)
        present = np.flatnonzero(n)
        return pa.table(
            {
                "event_type": vocab.take(pa.array(present, pa.int64())),
                "n_partial": pa.array(n[present], pa.int64()),
            }
        )

    pruned = _events(sf_dir, ["event_type", "user_id"]).map_batches(
        local_distinct, batch_format="pyarrow"
    )
    per_part = pruned.groupby("pkey").map_groups(
        per_partition_count, batch_format="pyarrow"
    )
    return per_part.groupby("event_type").aggregate(Sum("n_partial", alias_name="n_users"))


def users_with_both(sf_dir: str, type_a: str = "click", type_b: str = "purchase"):
    """user_id of every user with at least one ``type_a`` AND one
    ``type_b`` event — the set-intersection shape (SQL INTERSECT).

    Scale shape: each batch collapses to its distinct (user_id, flag)
    pairs (flag = which of the two types), so at most two rows per user
    per batch cross the shuffle; the flag-max fold rides a user-hash
    partition (users are corpus-width — never Ray-aggregate groups) and
    keeps users where both flags are set.  No broadcast, no driver
    state."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        is_a = pc.equal(et, type_a).to_numpy(zero_copy_only=False)
        is_b = pc.equal(et, type_b).to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy()
        rows = np.unique(
            np.stack(
                [
                    np.concatenate([uid[is_a], uid[is_b]]),
                    np.concatenate(
                        [
                            np.zeros(int(is_a.sum()), np.int64),
                            np.ones(int(is_b.sum()), np.int64),
                        ]
                    ),
                ],
                axis=1,
            ),
            axis=0,
        )
        return pa.table(
            {
                "user_id": pa.array(rows[:, 0], pa.int64()),
                "has_a": pa.array((rows[:, 1] == 0).astype(np.int64), pa.int64()),
                "has_b": pa.array((rows[:, 1] == 1).astype(np.int64), pa.int64()),
            }
        )

    # users are corpus-width: fold via the user-hash partition
    from minhash_ray.util import fold_by_int_keys

    def fold(t: pa.Table) -> pa.Table:
        agg = t.group_by("user_id").aggregate([("has_a", "max"), ("has_b", "max")])
        keep = pc.and_(
            pc.equal(agg.column("has_a_max"), 1), pc.equal(agg.column("has_b_max"), 1)
        )
        return pa.table({"user_id": agg.column("user_id")}).filter(keep)

    return fold_by_int_keys(ds, ["user_id"], partial, fold, 8)


def approx_distinct_users_per_type(sf_dir: str, num_partitions: int = 32):
    """(event_type, n_users_approx): per-group COUNT(DISTINCT) via a
    mergeable HyperLogLog sketch — the constant-memory scale path next to
    the exact ``distinct_users_per_type`` (which shuffles one row per
    distinct pair; at 10^9+ users per type the sketch moves 4 KB per
    (batch, type) instead).

    The sketch obeys the reference's partial-aggregation contract
    exactly (insert = max-fold: commutative / associative / idempotent,
    reference src/utils/utils.c:3-33; merge = elementwise max,
    src/utils/utils.c:36-46): each batch folds its users into one
    register array per event_type present, a ``groupby(event_type)``
    merges the partials, and the estimator runs once per group —
    partitioned == serial register-for-register
    (test_hll_partition_invariance, the do_compare_with_serial anchor).

    Deterministic given the data (hash-based, no RNG), but approximate
    by design (~1.6% rel. err at 2^12 registers) → no SQL value oracle;
    pytest gates the estimate against the exact count."""
    from minhash_ray.functions.hll import (
        HLL_M,
        hll_estimate,
        hll_merge,
        hll_partial,
    )
    from minhash_ray.stages.banding import splitmix64

    ds = _events(sf_dir, columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column("event_type")
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        enc = t.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        users = splitmix64(
            batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        names: list[str] = []
        packs: list[bytes] = []
        # loop over the (few) event types present in the batch, not rows;
        # each iteration is one vectorized register fold
        for code, name in enumerate(enc.dictionary.to_pylist()):
            regs = hll_partial(users[codes == code])
            names.append(name)
            packs.append(regs.tobytes())
        return pa.table(
            {
                "event_type": pa.array(names, pa.string()),
                "regs": pa.array(packs, pa.binary()),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        col = group.column("regs")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        merged = np.zeros(HLL_M, dtype=np.uint8)
        # one elementwise-max per partial (len(group) partials, not rows)
        buf = np.frombuffer(b"".join(col.to_pylist()), dtype=np.uint8).reshape(
            len(col), HLL_M
        )
        merged = hll_merge(merged, buf.max(axis=0)) if len(col) else merged
        est = int(round(hll_estimate(merged)))
        return pa.table(
            {
                "event_type": pa.array([group.column("event_type")[0].as_py()]),
                "n_users_approx": pa.array([est], pa.int64()),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "event_type"
    ).map_groups(finalize, batch_format="pyarrow")


def approx_value_quantiles(
    sf_dir: str, qs=(0.25, 0.5, 0.75, 0.9, 0.99), k: int = 4096
):
    """(q, value_approx): quantiles of the float ``value`` column via a
    bottom-k (KMV) sketch — the scale path when the value domain is
    unbounded (the exact histogram fold of ``text.token_quantiles``
    assumes distinct values ≪ rows; floats break that).

    Sketch algebra (the reference's contract again): the sketch is the k
    rows with the SMALLEST ``splitmix64(event_id)`` — a set-min fold, so
    insert/merge are commutative / associative / idempotent and the merged
    sketch is independent of partitioning (Bar-Yossef et al. 2002 KMV;
    the k=1 special case IS a MinHash slot).  Each batch keeps its local
    bottom-k, one metadata-scale reduction keeps the global bottom-k, and
    the quantiles of the k hash-uniform sampled values estimate the true
    quantiles (±O(1/sqrt(k))).

    Deterministic given the data (hash-ordered, no RNG) and
    partition-invariant (pytest-asserted) but approximate by design → no
    SQL value oracle; pytest gates it against the exact quantiles."""
    from minhash_ray.stages.banding import splitmix64

    ds = _events(sf_dir, columns=["event_id", "value"])

    def local_bottom_k(batch: pa.Table) -> pa.Table:
        h = splitmix64(
            batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        v = batch.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        if len(h) > k:
            idx = np.argpartition(h, k)[:k]
            h, v = h[idx], v[idx]
        return pa.table(
            {"h": pa.array(h, pa.uint64()), "value": pa.array(v, pa.float64())}
        )

    # the partials are ≤ k rows per batch — a driver fold is metadata-scale
    # (k·n_batches rows), mirroring token_quantiles' histogram fold
    parts = []
    for b in ds.map_batches(local_bottom_k, batch_format="pyarrow").iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        parts.append(b)
    if parts:
        t = pa.concat_tables(parts)
        h = t.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        if len(h) > k:
            idx = np.argpartition(h, k)[:k]
            h, v = h[idx], v[idx]
        # ties in h cannot occur across distinct event_ids (splitmix64 is a
        # bijection), so the sample set is exactly determined
        sample = np.sort(v)
    else:
        sample = np.empty(0, np.float64)
    rows_q, rows_v = [], []
    for q in qs:
        rows_q.append(float(q))
        rows_v.append(
            float(sample[int(np.floor((len(sample) - 1) * q))]) if len(sample) else 0.0
        )
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {"q": pa.array(rows_q, pa.float64()),
             "value_approx": pa.array(rows_v, pa.float64())}
        )
    )


def event_type_transitions(sf_dir: str, num_partitions: int = 32):
    """(prev_type, event_type, n_transitions): per-user consecutive
    event-type bigram counts over the (ts, event_id)-ordered stream —
    the Markov transition matrix of the event log (the lag() window
    shape; ``asof_prior`` is the value-carrying cousin).

    Scale shape: user-hash partitioning (one user's rows land in one
    task, the ordering unit), per-partition vectorized lexsort + shifted
    compare, then per-batch (prev, cur) partial counts folded through a
    tiny groupby — the wide exchange carries only bigram partials."""
    import pyarrow.compute as pc

    def per_partition(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0:
            return pa.table(
                {
                    "prev_type": pa.array([], pa.string()),
                    "event_type": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                }
            )
        et = batch.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        o, _uid_s, _ts_s, _ids_s, new_user, _start = _user_sorted(batch)
        et_s = et.take(pa.array(o))
        n = len(o)
        has_prev = ~new_user
        cur_idx = np.flatnonzero(has_prev)
        prev_idx = cur_idx - 1
        prev = et_s.take(pa.array(prev_idx))
        cur = et_s.take(pa.array(cur_idx))
        t = pa.table({"prev_type": prev, "event_type": cur})
        # batch-local partial count before the exchange
        agg = t.group_by(["prev_type", "event_type"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "prev_type": agg.column("prev_type"),
                "event_type": agg.column("event_type"),
                "c": pc.cast(agg.column("count_all"), pa.int64()),
            }
        )

    ds = _with_user_partition(
        _events(sf_dir, ["event_id", "user_id", "ts", "event_type"]), num_partitions
    )
    out = (
        ds.groupby("pkey")
        .map_groups(per_partition, batch_format="pyarrow")
        .groupby(["prev_type", "event_type"])
        .sum("c")
    )

    def rename(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ccol = [c for c in batch.column_names if c.startswith("sum")][0]
        return pa.table(
            {
                "prev_type": batch.column("prev_type"),
                "event_type": batch.column("event_type"),
                "n_transitions": pc.cast(batch.column(ccol), pa.int64()),
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")


FUNNEL_STEPS = ("signup", "view", "click", "purchase", "error")


def funnel_counts(
    sf_dir: str,
    steps: tuple = FUNNEL_STEPS,
    num_partitions: int = 32,
):
    """(step, event_type, n_users): ordered-funnel depth counts — how many
    users performed ``steps[0]``, then ``steps[1]`` STRICTLY after it,
    then ``steps[2]`` strictly after that, … (the product-analytics
    funnel; the sequential-pattern cousin of
    :func:`event_type_transitions`).  A user reaches step ``s`` iff there
    is a strictly increasing timestamp chain through the first ``s+1``
    step types; the greedy earliest-time chain is optimal (taking the
    earliest feasible event at each step can only enlarge the feasible
    set downstream), so per-user minima are exact.  Repeated types in
    ``steps`` are allowed ("view, click, view again"): rows carry their
    TYPE, and each scan pass matches the pass's step type, so one event
    type can serve several steps (at distinct timestamps, strictness).

    Scale shape: rows are filtered to the funnel's types at the read
    (slim (user_id, ts, tid) rows), user-hash partitioned (one USER's
    rows per task — the same partitioning contract as
    :func:`sessionize`), and each partition computes its users' funnel
    depth with k vectorized ``minimum.reduceat`` passes (k = number of
    steps, no per-user Python).  Only k-row partial counts cross the
    final exchange."""
    from ray.data.aggregate import Sum

    steps = tuple(steps)
    k = len(steps)
    types = sorted(set(steps))                      # distinct event types
    tid_of_step = np.array([types.index(t) for t in steps], dtype=np.int64)
    FAR = np.int64(1) << 62

    def slim(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        et = batch.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        tid = np.full(batch.num_rows, -1, dtype=np.int64)
        for i, name in enumerate(types):
            tid[pc.equal(et, name).to_numpy(zero_copy_only=False)] = i
        keep = tid >= 0
        return pa.table(
            {
                "user_id": pa.array(
                    batch.column("user_id").to_numpy()[keep], pa.int64()
                ),
                "ts_us": pa.array(_ts_us(batch.column("ts"))[keep], pa.int64()),
                "tid": pa.array(tid[keep], pa.int64()),
            }
        )

    def per_partition(batch: pa.Table) -> pa.Table:
        counts = np.zeros(k, dtype=np.int64)
        if batch.num_rows:
            uid = batch.column("user_id").to_numpy()
            ts = batch.column("ts_us").to_numpy()
            st = batch.column("tid").to_numpy()
            o = np.lexsort((ts, uid))
            uid_s, ts_s, st_s = uid[o], ts[o], st[o]
            n = len(o)
            new_user = np.ones(n, dtype=bool)
            new_user[1:] = uid_s[1:] != uid_s[:-1]
            seg_starts = np.flatnonzero(new_user)
            useg = np.cumsum(new_user) - 1          # per-row user ordinal
            n_users = len(seg_starts)
            thr = np.full(n_users, -FAR, dtype=np.int64)
            alive = np.ones(n_users, dtype=bool)
            for s in range(k):
                mask = (st_s == tid_of_step[s]) & alive[useg] & (ts_s > thr[useg])
                vals = np.where(mask, ts_s, FAR)
                mins = np.minimum.reduceat(vals, seg_starts)
                alive &= mins < FAR
                thr = np.where(alive, mins, thr)
                counts[s] = int(alive.sum())
                if not counts[s]:
                    break
        return pa.table(
            {
                "step": pa.array(np.arange(k, dtype=np.int64), pa.int64()),
                "event_type": pa.array(list(steps), pa.string()),
                "n_partial": pa.array(counts, pa.int64()),
            }
        )

    ds = _with_user_partition(
        _events(sf_dir, ["user_id", "ts", "event_type"]).map_batches(
            slim, batch_format="pyarrow"
        ),
        num_partitions,
    )
    per_part = ds.groupby("pkey").map_groups(per_partition, batch_format="pyarrow")
    out = per_part.groupby(["step", "event_type"]).aggregate(
        Sum("n_partial", alias_name="n_users")
    )
    return out


def session_stats(sf_dir: str, gap_minutes: int = 30, num_partitions: int = 32):
    """(user_id, session_seq, n_events, duration_us): per-session summary
    over the gap sessionization of :func:`sessionize` — session length
    and dwell time, the engagement profile a stream pipeline reports.

    Scale shape: sessions never span partitions (user-hash partitioning,
    one user's rows per task), so the per-session aggregate happens
    INSIDE the same per-partition vectorized scan that assigns session
    ids — segment boundaries + ``diff``/gather, no second shuffle and no
    corpus-width Ray-aggregate groups."""
    gap_us = np.int64(gap_minutes) * 60_000_000

    def per_partition(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_seq": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "duration_us": pa.array([], pa.int64()),
                }
            )
        _, uid_s, ts_s, _ids_s, new_user, user_start = _user_sorted(batch)
        n = len(uid_s)
        brk = np.zeros(n, dtype=bool)
        if n > 1:
            brk[1:] = (~new_user[1:]) & ((ts_s[1:] - ts_s[:-1]) > gap_us)
        cum = np.cumsum(brk.astype(np.int64))
        seq = cum - cum[user_start]
        starts = np.flatnonzero(new_user | brk)
        ends = np.concatenate([starts[1:], [n]])
        return pa.table(
            {
                "user_id": pa.array(uid_s[starts], pa.int64()),
                "session_seq": pa.array(seq[starts], pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "duration_us": pa.array(ts_s[ends - 1] - ts_s[starts], pa.int64()),
            }
        )

    ds = _with_user_partition(
        _events(sf_dir, ["event_id", "user_id", "ts"]), num_partitions
    )
    return ds.groupby("pkey").map_groups(per_partition, batch_format="pyarrow")


def retention_cohorts(sf_dir: str, bucket_days: int = 7, num_partitions: int = 8):
    """(cohort_us, period_us, n_users): the classic retention / cohort
    matrix — users bucketed by the period of their FIRST event (cohort
    row), counted once in every period they were active (column).  The
    product-analytics deliverable every event warehouse ships; n_users at
    (c, c) is the cohort size, the row's later cells are its retention.

    Scale shape: per-batch distinct (user, period) pairs fold through a
    USER-hash partition (users are corpus-width, never Ray-aggregate
    groups); each partition holds all of its users' pairs, so the
    per-user min-period (cohort) and the per-(cohort, period) user counts
    are exact there.  Only spans²-scale matrix partials leave the fold —
    a final tiny two-key sum is all that crosses partitions.  No ordering
    needed anywhere (min is order-free), so no sort and no watermark.
    """
    import pyarrow.compute as pc

    from minhash_ray.util import fold_by_int_keys

    bucket_us = np.int64(bucket_days) * 86_400_000_000

    def widen(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch.column("ts"))
        return pa.table(
            {
                "user_id": pc.cast(batch.column("user_id"), pa.int64()),
                "period_us": pa.array((ts // bucket_us) * bucket_us, pa.int64()),
            }
        )

    def _distinct(u: np.ndarray, b: np.ndarray):
        o = np.lexsort((b, u))
        us, bs = u[o], b[o]
        first = np.ones(len(us), dtype=bool)
        if len(us) > 1:
            first[1:] = (us[1:] != us[:-1]) | (bs[1:] != bs[:-1])
        return us[first], bs[first]

    def partial(batch: pa.Table) -> pa.Table:
        us, bs = _distinct(
            batch.column("user_id").to_numpy(zero_copy_only=False),
            batch.column("period_us").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "user_id": pa.array(us, pa.int64()),
                "period_us": pa.array(bs, pa.int64()),
            }
        )

    def final(t: pa.Table) -> pa.Table:
        # one partition holds every (user, period) partial for its users
        us, bs = _distinct(
            t.column("user_id").to_numpy(zero_copy_only=False),
            t.column("period_us").to_numpy(zero_copy_only=False),
        )
        n = len(us)
        if n == 0:
            return pa.table(
                {
                    "cohort_us": pa.array([], pa.int64()),
                    "period_us": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        # cohort = per-user min period = the user's first row in the
        # (user, period) sort _distinct just produced
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = us[1:] != us[:-1]
        idx = np.arange(n, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new_user, idx, 0))
        mat = pa.table(
            {
                "cohort_us": pa.array(bs[start], pa.int64()),
                "period_us": pa.array(bs, pa.int64()),
                "n_users": pa.array(np.ones(n, dtype=np.int64), pa.int64()),
            }
        )
        agg = mat.group_by(["cohort_us", "period_us"]).aggregate([("n_users", "sum")])
        import pyarrow.compute as pc2

        return pa.table(
            {
                "cohort_us": agg.column("cohort_us"),
                "period_us": agg.column("period_us"),
                "n_users": pc2.cast(agg.column("n_users_sum"), pa.int64()),
            }
        )

    widened = _events(sf_dir, ["ts", "user_id"]).map_batches(
        widen, batch_format="pyarrow"
    )
    matrix = fold_by_int_keys(widened, ["user_id"], partial, final, num_partitions)
    # matrix partials are spans²-scale (independent of corpus width) —
    # Ray's aggregate is safe for the final two-key sum
    out = matrix.groupby(["cohort_us", "period_us"]).sum("n_users")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_us": pc.cast(batch.column("cohort_us"), pa.int64()),
                "period_us": pc.cast(batch.column("period_us"), pa.int64()),
                "n_users": pc.cast(batch.column("sum(n_users)"), pa.int64()),
            }
        )

    return out.map_batches(project, batch_format="pyarrow")


def value_outliers(sf_dir: str, z: int = 3, num_partitions: int = 8):
    """(event_id, user_id, value_cents): events whose value lies more than
    ``z`` population standard deviations from their OWN user's mean — the
    per-key statistical QC flag (fraud / telemetry-glitch screening) an
    event warehouse runs continuously.

    Exactness: the gate is the all-integer cross-product
    ``(v·n − s)² > z²·(n·s2 − s²)`` (v cents, n/s/s2 the user's count /
    cent sum / squared-cent sum), so no float σ ever decides a row.  The
    hot path compares in float64 and re-checks only near-boundary rows
    with arbitrary-precision Python ints (the ``tf_cosine_pairs``
    pattern); int64 partials assume |value_cents| < 2^31 and per-user
    squared-cent mass < 2^63 (documented envelope — beyond it, promote
    the fold to two-limb arithmetic).

    Scale shape: per-user (n, s, s2) moment partials fold through a
    USER-hash partition (users are corpus-width), then attach back to
    the stream by ONE slim partitioned join — nothing driver-resident,
    no ordering anywhere (moments are order-free)."""
    import pyarrow.compute as pc

    from minhash_ray.util import clamp_partitions, fold_by_int_keys, strip_empty_blocks

    np_parts = clamp_partitions(num_partitions)
    z2 = int(z) * int(z)

    def widen(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy()
        vc = np.floor(v * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "user_id": pc.cast(batch.column("user_id"), pa.int64()),
                "value_cents": pa.array(vc, pa.int64()),
            }
        )

    ev = _events(sf_dir, ["event_id", "user_id", "value"]).map_batches(
        widen, batch_format="pyarrow"
    )

    def mom_partial(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        vc = batch.column("value_cents").to_numpy(zero_copy_only=False)
        ug, inv = np.unique(u, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        # integer scatter-adds (bincount weights would round trip through
        # float64, exact only below 2^53)
        s_i = np.zeros(len(ug), dtype=np.int64)
        np.add.at(s_i, inv, vc)
        s2_i = np.zeros(len(ug), dtype=np.int64)
        np.add.at(s2_i, inv, vc * vc)
        return pa.table(
            {
                "user_id": pa.array(ug, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "s": pa.array(s_i, pa.int64()),
                "s2": pa.array(s2_i, pa.int64()),
            }
        )

    def mom_final(t: pa.Table) -> pa.Table:
        agg = t.group_by(["user_id"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("s2", "sum")]
        )
        import pyarrow.compute as pc2

        return pa.table(
            {
                "user_id": agg.column("user_id"),
                "n": pc2.cast(agg.column("n_sum"), pa.int64()),
                "s": pc2.cast(agg.column("s_sum"), pa.int64()),
                "s2": pc2.cast(agg.column("s2_sum"), pa.int64()),
            }
        )

    stats = strip_empty_blocks(
        fold_by_int_keys(ev, ["user_id"], mom_partial, mom_final, num_partitions)
    )
    joined = strip_empty_blocks(ev).join(
        stats, join_type="inner", on=("user_id",), num_partitions=np_parts
    )

    def flag(batch: pa.Table) -> pa.Table:
        vc = batch.column("value_cents").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        s = batch.column("s").to_numpy(zero_copy_only=False)
        s2 = batch.column("s2").to_numpy(zero_copy_only=False)
        lhs_f = (vc.astype(np.float64) * n - s) ** 2
        rhs_f = float(z2) * (n.astype(np.float64) * s2 - s.astype(np.float64) ** 2)
        out = lhs_f > rhs_f
        # near-boundary rows decided in arbitrary-precision integers
        near = np.abs(lhs_f - rhs_f) <= 1e-6 * (np.abs(lhs_f) + np.abs(rhs_f) + 1.0)
        for i in np.flatnonzero(near):
            d = int(vc[i]) * int(n[i]) - int(s[i])
            out[i] = d * d > z2 * (int(n[i]) * int(s2[i]) - int(s[i]) ** 2)
        t = batch.filter(pa.array(out))
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "value_cents": t.column("value_cents"),
            }
        )

    return joined.map_batches(flag, batch_format="pyarrow")


def interarrival_stats(sf_dir: str, num_partitions: int = 32):
    """(event_type, n_deltas, sum_delta_us, min_delta_us, max_delta_us):
    exact inter-arrival-time statistics — for each (user, event_type)
    stream the gaps between consecutive events (LAG semantics, ordered by
    ts then event_id), aggregated per event type.  The cadence profile a
    rate-limiter / bot-detector / traffic model reads off an event log.

    Scale shape: user-hash partition (same contract as :func:`sessionize`
    — one USER's rows per task, never the corpus), within-partition
    lexsort by (user, type-code, ts, id) + one vectorized diff, then
    per-type partials; count/sum/min/max are all mergeable, so the final
    exchange carries ≤ |event types| rows per partition.  Deltas depend
    only on the sorted timestamp sequence, so the event_id tie-break
    keeps the op deterministic without affecting any statistic.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Max, Min, Sum

    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "n_deltas": pa.array([], pa.int64()),
            "sum_delta_us": pa.array([], pa.int64()),
            "min_delta_us": pa.array([], pa.int64()),
            "max_delta_us": pa.array([], pa.int64()),
        }
    )

    def per_partition(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        etype = batch.column("event_type")
        if isinstance(etype, pa.ChunkedArray):
            etype = etype.combine_chunks()
        enc = etype.dictionary_encode()
        codes = np.asarray(
            enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64
        )
        uid = batch.column("user_id").to_numpy()
        ts = _ts_us(batch.column("ts"))
        ids = batch.column("event_id").to_numpy()
        o = np.lexsort((ids, ts, codes, uid))
        uid_s, code_s, ts_s = uid[o], codes[o], ts[o]
        n = len(o)
        same = np.zeros(n, dtype=bool)
        if n > 1:
            same[1:] = (uid_s[1:] == uid_s[:-1]) & (code_s[1:] == code_s[:-1])
        if not same.any():
            return empty
        delta = np.zeros(n, dtype=np.int64)
        delta[1:] = ts_s[1:] - ts_s[:-1]
        keep_codes = pa.array(code_s[same], pa.int64())
        t = pa.table(
            {
                "event_type": enc.dictionary.take(keep_codes),
                "delta": pa.array(delta[same], pa.int64()),
            }
        )
        agg = t.group_by("event_type").aggregate(
            [([], "count_all"), ("delta", "sum"), ("delta", "min"), ("delta", "max")]
        )
        return pa.table(
            {
                "event_type": agg.column("event_type"),
                "n_deltas": pc.cast(agg.column("count_all"), pa.int64()),
                "sum_delta_us": pc.cast(agg.column("delta_sum"), pa.int64()),
                "min_delta_us": pc.cast(agg.column("delta_min"), pa.int64()),
                "max_delta_us": pc.cast(agg.column("delta_max"), pa.int64()),
            }
        )

    ds = _with_user_partition(
        _events(sf_dir, ["event_id", "user_id", "ts", "event_type"]), num_partitions
    )
    return (
        ds.groupby("pkey")
        .map_groups(per_partition, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_deltas", alias_name="n_deltas"),
            Sum("sum_delta_us", alias_name="sum_delta_us"),
            Min("min_delta_us", alias_name="min_delta_us"),
            Max("max_delta_us", alias_name="max_delta_us"),
        )
    )


def cumulative_user_value(sf_dir: str, num_partitions: int = 32):
    """(event_id, user_id, cum_cents): each event annotated with the
    running total of its user's value (in exact integer cents) up to and
    including that event, ordered by (ts, event_id) — the cumulative-sum
    window function (``SUM(...) OVER (PARTITION BY user ORDER BY ts)``),
    the running-balance / lifetime-spend shape every event warehouse
    needs and Ray Data has no native window operator for.

    Scale shape: the same user-hash partition contract as
    :func:`sessionize` (one USER's complete history per task — the unit a
    running total is defined over — never the corpus), then one
    within-partition lexsort by (user, ts, id) and a single vectorized
    ``np.cumsum`` with per-user offsets subtracted (group-reset prefix
    sum, no Python loop).  Output rows = input rows; the op is a pure
    per-partition map, zero post-partition exchanges.
    """

    def per_partition(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "cum_cents": pa.array([], pa.int64()),
                }
            )
        o, uid_s, _ts_s, ids_s, new_user, _user_start = _user_sorted(batch)
        value = batch.column("value").to_numpy()
        vc = np.floor(value * 100.0 + 0.5).astype(np.int64)[o]
        cs = np.cumsum(vc)
        # subtract the prefix ending just before each user's first row
        grp = np.cumsum(new_user) - 1
        starts = np.flatnonzero(new_user)
        offsets = np.zeros(len(starts), dtype=np.int64)
        if len(starts) > 1:
            offsets[1:] = cs[starts[1:] - 1]
        cum = cs - offsets[grp]
        return pa.table(
            {
                "event_id": pa.array(ids_s, pa.int64()),
                "user_id": pa.array(uid_s, pa.int64()),
                "cum_cents": pa.array(cum, pa.int64()),
            }
        )

    ds = _with_user_partition(
        _events(sf_dir, ["event_id", "user_id", "ts", "value"]), num_partitions
    )
    return ds.groupby("pkey").map_groups(per_partition, batch_format="pyarrow")


def props_field_stats(sf_dir: str, field: str = "k"):
    """(event_type, n_with_field, sum_v, min_v, max_v): exact integer
    statistics of a JSON property extracted from the semi-structured
    ``props`` column, per event type — the schema-on-read projection
    every event log needs (payloads arrive as JSON strings; analytics
    want typed columns).

    Scale shape: extraction is one vectorized RE2 ``extract_regex`` per
    batch (pyarrow has no JSON kernel; the anchored ``"field": int``
    pattern is exact for flat integer fields — nested/typed payloads
    would swap this stage for an actor-pool ``orjson`` parser with the
    same downstream), rows lacking the field drop out as nulls, then the
    standard partial→final mergeable fold: per-batch Arrow group_by
    partials, one tiny |event types|-row exchange.
    """
    import re

    import pyarrow.compute as pc

    from ray.data.aggregate import Max, Min, Sum

    pattern = '"' + re.escape(field) + '":\\s*(?P<v>-?\\d+)'
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "n_with_field": pa.array([], pa.int64()),
            "sum_v": pa.array([], pa.int64()),
            "min_v": pa.array([], pa.int64()),
            "max_v": pa.array([], pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        props = batch.column("props")
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        ex = pc.extract_regex(props, pattern)
        valid = pc.is_valid(ex)
        if not pc.any(valid).as_py():
            return empty
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "v": pc.cast(pc.struct_field(ex, "v"), pa.int64()),
            }
        ).filter(valid)
        agg = t.group_by("event_type").aggregate(
            [([], "count_all"), ("v", "sum"), ("v", "min"), ("v", "max")]
        )
        return pa.table(
            {
                "event_type": agg.column("event_type"),
                "n_with_field": pc.cast(agg.column("count_all"), pa.int64()),
                "sum_v": pc.cast(agg.column("v_sum"), pa.int64()),
                "min_v": pc.cast(agg.column("v_min"), pa.int64()),
                "max_v": pc.cast(agg.column("v_max"), pa.int64()),
            }
        )

    return (
        _events(sf_dir, ["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_with_field", alias_name="n_with_field"),
            Sum("sum_v", alias_name="sum_v"),
            Min("min_v", alias_name="min_v"),
            Max("max_v", alias_name="max_v"),
        )
    )


def value_histogram(sf_dir: str, bin_cents: int = 500):
    """(bin_lo_cents, n_events): fixed-width histogram of event values in
    exact integer cents (floored bin start; negative values floor toward
    -inf, matching SQL integer-division-with-floor semantics) — the
    distribution profile behind threshold picking and skew detection.

    Scale shape: bins are data-ranged, not corpus-width (range/width
    buckets), but the fold still runs partial→final through the standard
    per-batch Arrow group_by so a pathological range never becomes Ray
    aggregate groups on raw rows; each batch ships ≤ |bins it saw|."""
    from ray.data.aggregate import Sum

    b = np.int64(bin_cents)

    def partial(batch: pa.Table) -> pa.Table:
        value = batch.column("value").to_numpy()
        cents = np.floor(value * 100.0 + 0.5).astype(np.int64)
        lo = np.floor_divide(cents, b) * b
        t = pa.table({"bin_lo_cents": pa.array(lo, pa.int64())})
        agg = t.group_by("bin_lo_cents").aggregate([([], "count_all")])
        import pyarrow.compute as pc

        return pa.table(
            {
                "bin_lo_cents": agg.column("bin_lo_cents"),
                "n_events": pc.cast(agg.column("count_all"), pa.int64()),
            }
        )

    return (
        _events(sf_dir, ["value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bin_lo_cents")
        .aggregate(Sum("n_events", alias_name="n_events"))
    )


def type_cooccurrence(sf_dir: str, num_partitions: int = 32):
    """(type_a, type_b, n_users): for every unordered pair of event types,
    how many users performed BOTH — the co-occurrence / market-basket
    matrix behind "users who did X also did Y" and feature-cross audits.

    Scale shape: users scale with the corpus, types don't.  The user-hash
    partition co-locates each user's distinct types; inside a partition
    one lexsort + run-length pass yields per-user type sets and a
    vectorized upper-triangle expansion emits each user's pairs (types
    per user is small and bounded by |event types|); per-pair partial
    counts fold through the final ≤ |types|² exchange.  No stage ever
    keys on users."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    empty = pa.table(
        {
            "type_a": pa.array([], pa.string()),
            "type_b": pa.array([], pa.string()),
            "n_users": pa.array([], pa.int64()),
        }
    )

    def per_partition(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        etype = batch.column("event_type")
        if isinstance(etype, pa.ChunkedArray):
            etype = etype.combine_chunks()
        enc = etype.dictionary_encode()
        raw = np.asarray(enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
        # remap dictionary codes to LEXICOGRAPHIC rank so the canonical
        # pair order (type_a < type_b) is string order, not first-seen
        sort_idx = np.asarray(
            pc.array_sort_indices(enc.dictionary).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        rank = np.empty(len(sort_idx), dtype=np.int64)
        rank[sort_idx] = np.arange(len(sort_idx))
        vocab = enc.dictionary.take(pa.array(sort_idx, pa.int64()))
        codes = rank[raw]
        uid = batch.column("user_id").to_numpy()
        o = np.lexsort((codes, uid))
        uid_s, code_s = uid[o], codes[o]
        n = len(o)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = (uid_s[1:] != uid_s[:-1]) | (code_s[1:] != code_s[:-1])
        du, dc = uid_s[first], code_s[first]  # distinct (user, type), sorted
        # per-user set sizes → vectorized upper-triangle pair expansion
        m = len(du)
        new_u = np.ones(m, dtype=bool)
        if m > 1:
            new_u[1:] = du[1:] != du[:-1]
        set_start = np.maximum.accumulate(np.where(new_u, np.arange(m), 0))
        pos = np.arange(m) - set_start                 # rank within user's set
        sizes = np.bincount(set_start, minlength=m)[set_start]
        n_after = sizes - pos - 1                      # pairs this element leads
        total = int(n_after.sum())
        if total == 0:
            return empty
        lead = np.repeat(np.arange(m), n_after)
        step = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(n_after)[:-1]]), n_after
        )
        trail = lead + 1 + step
        a_codes, b_codes = dc[lead], dc[trail]
        t = pa.table(
            {
                "type_a": vocab.take(pa.array(a_codes, pa.int64())),
                "type_b": vocab.take(pa.array(b_codes, pa.int64())),
            }
        )
        agg = t.group_by(["type_a", "type_b"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "type_a": agg.column("type_a"),
                "type_b": agg.column("type_b"),
                "n_users": pc.cast(agg.column("count_all"), pa.int64()),
            }
        )

    ds = _with_user_partition(
        _events(sf_dir, ["user_id", "event_type"]), num_partitions
    )
    return (
        ds.groupby("pkey")
        .map_groups(per_partition, batch_format="pyarrow")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def latest_event_per_user(sf_dir: str, num_partitions: int = 32):
    """(user_id, event_id, event_type, ts_us): each user's most recent
    event — the ``DISTINCT ON (user) ORDER BY ts DESC`` / argmax-per-group
    shape (current-state snapshot from an event log; Ray Data has no
    native DISTINCT ON).  Tie-break: latest ts, then largest event_id.

    Scale shape: the user-hash partition contract; per partition one
    lexsort by (user, ts, id) and a take of each user's LAST row — a pure
    per-partition map emitting one row per user."""

    def per_partition(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "ts_us": pa.array([], pa.int64()),
                }
            )
        ids = batch.column("event_id").to_numpy()
        uid = batch.column("user_id").to_numpy()
        ts = _ts_us(batch.column("ts"))
        o = np.lexsort((ids, ts, uid))
        uid_s = uid[o]
        n = len(o)
        last = np.ones(n, dtype=bool)
        if n > 1:
            last[:-1] = uid_s[1:] != uid_s[:-1]
        sel = pa.array(o[last], pa.int64())
        return pa.table(
            {
                "user_id": pa.array(uid_s[last], pa.int64()),
                "event_id": batch.column("event_id").take(sel),
                "event_type": batch.column("event_type").take(sel),
                "ts_us": pa.array(ts[o][last], pa.int64()),
            }
        )

    ds = _with_user_partition(
        _events(sf_dir, ["event_id", "user_id", "ts", "event_type"]), num_partitions
    )
    return ds.groupby("pkey").map_groups(per_partition, batch_format="pyarrow")


def trailing_value_sum(sf_dir: str, frame: int = 3, num_partitions: int = 32):
    """(event_id, user_id, trail_cents): per event, the sum of the
    user's last ``frame`` event values up to and including it, ordered by
    (ts, event_id) — the ROWS-frame window aggregate (``SUM(...) OVER
    (... ROWS BETWEEN frame-1 PRECEDING AND CURRENT ROW)``), the moving
    window every rate/velocity feature is built from.  Complements
    :func:`cumulative_user_value` (UNBOUNDED PRECEDING frame).

    Scale shape: identical to the running total — user-hash partition,
    one lexsort, one global cumsum; the frame subtraction is one gather
    at ``max(i - frame, group_start - 1)``.  Pure per-partition map."""

    def per_partition(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "trail_cents": pa.array([], pa.int64()),
                }
            )
        o, uid_s, _ts_s, ids_s, new_user, user_start = _user_sorted(batch)
        value = batch.column("value").to_numpy()
        vc = np.floor(value * 100.0 + 0.5).astype(np.int64)[o]
        gcs = np.cumsum(vc)
        i = np.arange(len(o), dtype=np.int64)
        j = np.maximum(i - frame, user_start - 1)
        trail = gcs - np.where(j >= 0, gcs[np.maximum(j, 0)], 0)
        return pa.table(
            {
                "event_id": pa.array(ids_s, pa.int64()),
                "user_id": pa.array(uid_s, pa.int64()),
                "trail_cents": pa.array(trail, pa.int64()),
            }
        )

    ds = _with_user_partition(
        _events(sf_dir, ["event_id", "user_id", "ts", "value"]), num_partitions
    )
    return ds.groupby("pkey").map_groups(per_partition, batch_format="pyarrow")


def user_event_paths(sf_dir: str, num_partitions: int = 32):
    """(path, n_users): users grouped by their full ordered event-type
    journey (events concatenated with ``>`` in (ts, event_id) order) —
    the collect-list + string_agg shape (Ray Data has neither) behind
    funnel exploration and behavioral cohorting.

    Scale shape: the user-hash partition assembles each user's path
    WITHOUT a Python loop — one lexsort, then the sorted event types
    become a ListArray sliced at user boundaries and ONE vectorized
    ``pc.binary_join`` emits every path; per-path counts fold through a
    path-hash partition (paths scale with users, never Ray aggregate
    groups)."""
    import pyarrow.compute as pc

    from minhash_ray.util import fold_by_str_key

    def per_partition(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "path": pa.array([], pa.string()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        etype = batch.column("event_type")
        if isinstance(etype, pa.ChunkedArray):
            etype = etype.combine_chunks()
        ids = batch.column("event_id").to_numpy()
        uid = batch.column("user_id").to_numpy()
        ts = _ts_us(batch.column("ts"))
        o = np.lexsort((ids, ts, uid))
        uid_s = uid[o]
        n = len(o)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = uid_s[1:] != uid_s[:-1]
        starts = np.flatnonzero(first)
        offsets = np.concatenate([starts, [n]]).astype(np.int32)
        sorted_types = etype.take(pa.array(o, pa.int64()))
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), sorted_types)
        paths = pc.binary_join(lists, ">")
        t = pa.table({"path": paths}).group_by("path").aggregate([([], "count_all")])
        return pa.table(
            {
                "path": t.column("path"),
                "n_users": pc.cast(t.column("count_all"), pa.int64()),
            }
        )

    def cnt_partial(b: pa.Table) -> pa.Table:
        return b

    def cnt_final(t: pa.Table) -> pa.Table:
        g = t.group_by("path").aggregate([("n_users", "sum")])
        return pa.table(
            {
                "path": g.column("path"),
                "n_users": pc.cast(g.column("n_users_sum"), pa.int64()),
            }
        )

    per_user = (
        _with_user_partition(
            _events(sf_dir, ["event_id", "user_id", "ts", "event_type"]),
            num_partitions,
        )
        .groupby("pkey")
        .map_groups(per_partition, batch_format="pyarrow")
    )
    return fold_by_str_key(per_user, "path", cnt_partial, cnt_final, num_partitions)


def sliding_window_distinct_users(
    sf_dir: str,
    window_minutes: int = 60,
    hop_minutes: int = 15,
    num_partitions: int = 8,
):
    """(window_us, n_users): EXACT distinct active users per sliding
    window — the streaming-dashboard "active users in the last hour,
    every 15 minutes" query, composing the sliding replication of
    :func:`sliding_window_counts` with the exact-distinct fold of
    ``distinct_users_per_type`` (no HLL approximation; the approximate
    twin is ``approx_distinct_users_per_type``).

    Scale shape: the ⌈window/hop⌉× replication happens vectorized on the
    SLIM (window_us, user_id) projection with in-batch pair dedup before
    anything shuffles; global distinct folds per (window, user) through
    the key-hash partition (user dimension is corpus-width — Ray never
    sees users as groups), each partition emits per-window partial
    counts (each pair exists in exactly one partition), and the final
    per-window sum is a metadata-scale Ray aggregate (windows ∝ time
    span / hop, not corpus)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from minhash_ray.util import fold_by_int_keys

    if hop_minutes > window_minutes:
        raise ValueError("hop must not exceed window")
    win_us = np.int64(window_minutes) * 60_000_000
    hop_us = np.int64(hop_minutes) * 60_000_000
    n_hops = int(-(-win_us // hop_us))          # ceil(window/hop)

    def widen(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch.column("ts"))
        users = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        base = (ts // hop_us) * hop_us
        offset = ts - base
        starts_parts, user_parts = [], []
        for j in range(n_hops):
            keep = offset + np.int64(j) * hop_us < win_us
            starts_parts.append((base - np.int64(j) * hop_us)[keep])
            user_parts.append(users[keep])
        w = np.concatenate(starts_parts) if starts_parts else np.empty(0, np.int64)
        u = np.concatenate(user_parts) if user_parts else np.empty(0, np.int64)
        # in-batch pair dedup before the shuffle
        o = np.lexsort((u, w))
        w, u = w[o], u[o]
        first = np.ones(len(w), dtype=bool)
        if len(w) > 1:
            first[1:] = (w[1:] != w[:-1]) | (u[1:] != u[:-1])
        return pa.table(
            {
                "window_us": pa.array(w[first], pa.int64()),
                "user_id": pa.array(u[first], pa.int64()),
            }
        )

    def pair_partial(batch: pa.Table) -> pa.Table:
        return batch                          # widen already deduped in-batch

    def pair_final(t: pa.Table) -> pa.Table:
        # one partition holds EVERY partial for each of its (w, u) keys:
        # dedupe pairs, then count per window — a per-partition partial
        # count that sums exactly once globally
        g = t.group_by(["window_us", "user_id"]).aggregate([([], "count_all")])
        c = g.group_by("window_us").aggregate([([], "count_all")])
        return pa.table(
            {
                "window_us": c.column("window_us"),
                "c": pc.cast(c.column("count_all"), pa.int64()),
            }
        )

    deduped = fold_by_int_keys(
        _events(sf_dir, ["ts", "user_id"]).map_batches(widen, batch_format="pyarrow"),
        ["window_us", "user_id"],
        pair_partial,
        pair_final,
        num_partitions,
    )
    agg = deduped.groupby("window_us").aggregate(Sum("c", alias_name="n_users"))

    def order_cols(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_us": batch.column("window_us"),
                "n_users": pc.cast(batch.column("n_users"), pa.int64()),
            }
        )

    return agg.map_batches(order_cols, batch_format="pyarrow")


def active_sessions_per_window(
    sf_dir: str,
    gap_minutes: int = 30,
    window_minutes: int = 60,
    num_partitions: int = 32,
):
    """(window_us, n_sessions): how many gap-sessions OVERLAP each
    tumbling window — the "concurrent activity" load curve a streaming
    dashboard draws.  The new shape vs the other window ops is
    INTERVAL → window expansion: a session [start, end] lands in every
    window from ``start // W`` through ``end // W`` (both inclusive),
    not just the one containing a point.

    Scale shape: session intervals come out of the same single-pass
    per-user-partition scan as ``session_stats`` (one row per session —
    already a large reduction); each interval then fans out to
    ``span // W + 1`` (window, 1) rows — data-dependent, bounded by the
    longest session over the window width (gap sessions are bounded in
    practice by the gap itself ending idle users; a pathological
    always-on user costs rows ∝ its lifetime / W, which is the answer's
    own size).  Windows are metadata-scale (time span / W): per-batch
    partial counts, one tiny Ray aggregate."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    gap_us = np.int64(gap_minutes) * 60_000_000
    win_us = np.int64(window_minutes) * 60_000_000

    def per_partition(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"window_us": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        _, uid_s, ts_s, _ids_s, new_user, user_start = _user_sorted(batch)
        n = len(uid_s)
        brk = np.zeros(n, dtype=bool)
        if n > 1:
            brk[1:] = (~new_user[1:]) & ((ts_s[1:] - ts_s[:-1]) > gap_us)
        starts = np.flatnonzero(new_user | brk)
        ends = np.concatenate([starts[1:], [n]])
        w_lo = ts_s[starts] // win_us
        w_hi = ts_s[ends - 1] // win_us
        counts = (w_hi - w_lo + 1).astype(np.int64)
        wins = (
            np.repeat(w_lo, counts)
            + (np.arange(int(counts.sum()), dtype=np.int64)
               - np.repeat(np.cumsum(counts) - counts, counts))
        ) * win_us
        # in-partition partial: windows are few, sessions are many
        t = pa.table({"window_us": pa.array(wins, pa.int64())})
        g = t.group_by("window_us").aggregate([([], "count_all")])
        return pa.table(
            {
                "window_us": g.column("window_us"),
                "c": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    ds = _with_user_partition(
        _events(sf_dir, ["event_id", "user_id", "ts"]), num_partitions
    )
    agg = (
        ds.groupby("pkey")
        .map_groups(per_partition, batch_format="pyarrow")
        .groupby("window_us")
        .aggregate(Sum("c", alias_name="n_sessions"))
    )

    def order_cols(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_us": batch.column("window_us"),
                "n_sessions": pc.cast(batch.column("n_sessions"), pa.int64()),
            }
        )

    return agg.map_batches(order_cols, batch_format="pyarrow")


def value_winsorize(sf_dir: str, q_lo: float = 0.01, q_hi: float = 0.99):
    """(event_id, value_cents, value_cents_w): every event's value in
    exact integer cents, clamped to the corpus's EXACT [q_lo, q_hi]
    order statistics (winsorization — the outlier-capping transform a
    feature pipeline runs before aggregates that a fat tail would
    dominate; the data-driven cousin of ``value_outliers``'s z-gate).

    Scale shape: the two cut points come from the ``token_quantiles``
    exact-histogram machinery — per-batch (value, count) partials
    (``np.unique``), one tiny ``groupby(value).sum`` exchange
    (distinct cents values ≪ events), a metadata-scale driver fold to
    the order statistics at ``floor((n-1)*q)`` (numpy 'lower' semantics,
    replayed by the oracle's row_number join) — then ONE streaming
    clamp map over the events.  No global sort, nothing corpus-width on
    the driver.

    EAGER at call time: the histogram fold executes during query
    construction (the driver must hold the two cut points before the
    clamp map can be built — the ``token_quantiles`` pattern), so the
    events table is scanned twice end-to-end (histogram pass + returned
    lazy clamp pass).  Pass an already-materialized events Dataset via a
    wrapper if the double scan matters upstream."""
    import pyarrow.compute as pc

    def cents(batch: pa.Table) -> np.ndarray:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return np.floor(v * 100.0 + 0.5).astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        v, c = np.unique(cents(batch), return_counts=True)
        return pa.table(
            {"v": pa.array(v, pa.int64()), "c": pa.array(c.astype(np.int64), pa.int64())}
        )

    hist = (
        _events(sf_dir, ["value"])
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
    if n == 0:
        lo = hi = np.int64(0)
    else:
        lo = v[np.searchsorted(cum, int(np.floor((n - 1) * q_lo)) + 1)]
        hi = v[np.searchsorted(cum, int(np.floor((n - 1) * q_hi)) + 1)]

    def clamp(batch: pa.Table) -> pa.Table:
        vc = cents(batch)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "value_cents": pa.array(vc, pa.int64()),
                "value_cents_w": pa.array(np.clip(vc, lo, hi), pa.int64()),
            }
        )

    return _events(sf_dir, ["event_id", "value"]).map_batches(
        clamp, batch_format="pyarrow"
    )

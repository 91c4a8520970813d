"""Similarity search over an embedding column (list<float>).

* ``ann_topk`` — brute-force cosine top-k against a broadcast query matrix:
  the embeddings stream through ``map_batches`` (numpy matmul per batch,
  float64), per-batch top-k partials are reduced on the driver — the
  canonical "broadcast small side, never shuffle the big side" pattern.
* ``embedding_dup_pairs`` — embedding-cosine near-duplicate pairs via
  random-hyperplane LSH (Charikar 2002 SimHash for vectors): bucket by
  sign-pattern chunks, self-join buckets, verify exact cosine — the scale
  path that avoids the O(n^2) cross join.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from minhash_ray.stages.banding import splitmix64

U64 = np.uint64


def _emb(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _matrix(batch: pa.Table) -> np.ndarray:
    col = batch.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, -1)


def ann_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10):
    """Top-k most cosine-similar vectors to ``query_vec_id`` (excluding
    itself): (vec_id, rank) with rank 1..k, ties broken by vec_id.

    Per-batch vectorized cosine against the broadcast query vector; partial
    top-k per batch, final merge on the driver (k rows)."""
    import duckdb  # only to fetch the single query row without Ray overhead

    q = duckdb.connect().execute(
        f"select embedding from '{os.path.join(sf_dir, 'embeddings.parquet')}' "
        f"where vec_id = {int(query_vec_id)}"
    ).fetchone()[0]
    qv = np.asarray(q, dtype=np.float64)
    qn = qv / np.linalg.norm(qv)

    def partial_topk(batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        cos = (m @ qn) / norms
        ids = np.asarray(batch.column("vec_id").to_numpy(), dtype=np.int64)
        mask = ids != query_vec_id
        cos, ids = cos[mask], ids[mask]
        order = np.lexsort((ids, -cos))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "cos": pa.array(cos[order], pa.float64()),
            }
        )

    partials = _emb(sf_dir).map_batches(partial_topk, batch_format="pyarrow")
    t = pa.concat_tables(list(partials.iter_batches(batch_size=65536, batch_format="pyarrow")))
    ids = t.column("vec_id").to_numpy()
    cos = t.column("cos").to_numpy()
    order = np.lexsort((ids, -cos))[:k]
    return pa.table(
        {
            "vec_id": pa.array(ids[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64), pa.int64()),
        }
    )


def embedding_pairs_exact(sf_dir: str, threshold: float = 0.35):
    """All pairs with cosine >= threshold — exact, vectorized brute force:
    the full (small-side) normalized matrix is broadcast once, each batch
    computes batch×all cosines with one matmul and emits its pairs.  The
    SQL-checkable baseline; ``embedding_dup_pairs`` is the LSH scale path."""
    import ray

    emb = _emb(sf_dir).materialize()
    t = pa.concat_tables(list(emb.iter_batches(batch_size=65536, batch_format="pyarrow")))
    mat = _matrix(t)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    all_ids = np.asarray(t.column("vec_id").to_numpy(), dtype=np.int64)
    # pack sorted by id so workers look rows up with one searchsorted —
    # no per-worker index dict, and the stage runs as a plain TASK pool
    # (an actor pool reserved CPUs and paid ~1-2 s spin-up per query for
    # state that is one zero-copy plasma view)
    o = np.argsort(all_ids)
    pack_ref = [ray.put({"mat": np.ascontiguousarray(mat[o]), "ids": all_ids[o]})]

    def find_pairs(batch: pa.Table) -> pa.Table:
        from minhash_ray.util import cached_get

        pack = cached_get(pack_ref[0])
        pmat, pids = pack["mat"], pack["ids"]
        ids_b = np.asarray(batch.column("vec_id").to_numpy(), dtype=np.int64)
        rows = np.searchsorted(pids, ids_b)
        cos = pmat[rows] @ pmat.T                          # (b, n)
        ii, jj = np.nonzero(cos >= threshold)
        a = ids_b[ii]
        b = pids[jj]
        keep = a < b
        order = np.lexsort((b[keep], a[keep]))
        return pa.table(
            {
                "vec_id_a": pa.array(a[keep][order], pa.int64()),
                "vec_id_b": pa.array(b[keep][order], pa.int64()),
            }
        )

    return emb.select_columns(["vec_id"]).map_batches(
        find_pairs, batch_format="pyarrow", batch_size=1024
    )


def ivf_centroids(
    m: np.ndarray, n_centroids: int, seed: int, kmeans_iters: int = 8
) -> np.ndarray:
    """Seeded Lloyd k-means on unit rows ``m`` → unit centroids.  Pure
    numpy and deterministic given (m, seed) — shared by the Ray index
    build AND the DuckDB oracle (which embeds these centroids as SQL
    literals to replay cell assignment independently)."""
    rng = np.random.default_rng(seed)
    n_centroids = min(n_centroids, len(m))
    cents = m[rng.choice(len(m), size=n_centroids, replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(m @ cents.T, axis=1)           # cosine on unit vectors
        for c in range(n_centroids):
            members = m[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return np.ascontiguousarray(cents)


def build_ivf_index(
    sf_dir: str,
    n_centroids: int = 16,
    seed: int = 42,
    kmeans_iters: int = 8,
    sample: int = 8192,
    embs=None,
):
    """IVF coarse index (Sivic & Zisserman 2003 "Video Google"; the FAISS
    IVF design): seeded Lloyd k-means on a driver-side sample gives
    ``n_centroids`` unit centroids; one ``map_batches`` pass assigns every
    vector to its nearest cell and packs its normalized form — the
    returned Dataset {vec_id, cell, nvec} IS the index (at scale: write it
    as cell-partitioned parquet and prune at the read per query).

    Returns (index_ds, centroids (n_centroids, dim) float64, dim).
    """
    import ray

    emb = (embs if embs is not None else _emb(sf_dir)).materialize()

    # sample for k-means (driver-side: centroids are metadata-scale)
    st = pa.concat_tables(
        list(emb.limit(sample).iter_batches(batch_size=8192, batch_format="pyarrow"))
    )
    m = _matrix(st)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    m = m / norms[:, None]
    cents = ivf_centroids(m, n_centroids, seed, kmeans_iters)
    cent_ref = [ray.put(cents)]
    dim = cents.shape[1]

    def assign_cells(batch: pa.Table) -> pa.Table:
        from minhash_ray.util import cached_get

        c = cached_get(cent_ref[0])
        v = _matrix(batch)
        norms = np.linalg.norm(v, axis=1)
        norms[norms == 0] = 1.0
        v = np.ascontiguousarray(v / norms[:, None])
        cell = np.argmax(v @ c.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cell": pa.array(cell, pa.int64()),
                "nvec": _pack_f64_rows(v),
            }
        )

    index = emb.map_batches(assign_cells, batch_format="pyarrow").materialize()
    return index, cents, dim


def ann_topk_ivf(
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    index=None,
):
    """Approximate top-k via the IVF index: score ONLY vectors whose cell
    is among the ``n_probe`` centroids nearest to the query — the scale
    path that touches ~n_probe/n_centroids of the corpus per query (vs the
    brute-force ``ann_topk`` baseline).  Pass a prebuilt ``index`` from
    :func:`build_ivf_index` to amortize the index over many queries.
    Returns (vec_id, rank) like ``ann_topk``."""
    import duckdb

    if index is None:
        index = build_ivf_index(sf_dir, n_centroids=n_centroids, seed=seed)
    index_ds, cents, dim = index

    q = duckdb.connect().execute(
        f"select embedding from '{os.path.join(sf_dir, 'embeddings.parquet')}' "
        f"where vec_id = {int(query_vec_id)}"
    ).fetchone()[0]
    qv = np.asarray(q, dtype=np.float64)
    qn = qv / np.linalg.norm(qv)
    probe = np.argsort(-(cents @ qn))[: min(n_probe, len(cents))]
    probe_set = np.sort(probe.astype(np.int64))

    def score(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy()
        pos = np.minimum(np.searchsorted(probe_set, cell), len(probe_set) - 1)
        mask = probe_set[pos] == cell
        ids = np.asarray(batch.column("vec_id").to_numpy(), dtype=np.int64)
        mask &= ids != query_vec_id
        if not mask.any():
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "cos": pa.array([], pa.float64())}
            )
        v = _unpack_f64_rows(batch.column("nvec"), dim)[mask]
        cos = v @ qn
        ids = ids[mask]
        order = np.lexsort((ids, -cos))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "cos": pa.array(cos[order], pa.float64()),
            }
        )

    partials = index_ds.map_batches(score, batch_format="pyarrow")
    t = pa.concat_tables(list(partials.iter_batches(batch_size=65536, batch_format="pyarrow")))
    ids = t.column("vec_id").to_numpy()
    cos = t.column("cos").to_numpy()
    order = np.lexsort((ids, -cos))[:k]
    return pa.table(
        {
            "vec_id": pa.array(ids[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64), pa.int64()),
        }
    )


# per-worker cache for the task-pool bucketer (same pattern as the
# document/clips signature stages: the seeded plane matrix rebuilds in
# microseconds, so worker-cached tasks beat a CPU-reserving actor pool)
_BUCKETER_CACHE: dict = {}


def _make_bucketer_fn(dim: int, n_planes: int, n_chunks: int, seed: int):
    key = (dim, n_planes, n_chunks, seed)

    def bucket_fn(batch: pa.Table) -> pa.Table:
        stage = _BUCKETER_CACHE.get(key)
        if stage is None:
            stage = _HyperplaneBucketer(dim, n_planes, n_chunks, seed)
            _BUCKETER_CACHE[key] = stage
        return stage(batch)

    return bucket_fn


class _HyperplaneBucketer:
    """Hyperplane-LSH bucketer; state (the seeded random plane matrix) is
    built once per worker via :func:`_make_bucketer_fn`."""

    def __init__(self, dim: int, n_planes: int, n_chunks: int, seed: int):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.n_chunks = n_chunks
        self.chunk_bits = n_planes // n_chunks

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        signs = (m @ self.planes) > 0                      # (n, n_planes)
        ids = batch.column("vec_id")
        n = m.shape[0]
        buckets = np.empty((n, self.n_chunks), dtype=np.int64)
        w = self.chunk_bits
        weights = (U64(1) << np.arange(w, dtype=np.uint64))
        for c in range(self.n_chunks):
            chunk = signs[:, c * w : (c + 1) * w].astype(np.uint64) @ weights
            mixed = splitmix64(chunk + (U64(c) << U64(56)))
            buckets[:, c] = (mixed >> U64(1)).astype(np.int64)
        out_ids = pa.concat_arrays(
            [ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids] * self.n_chunks
        )
        return pa.table(
            {
                "bucket": pa.array(buckets.T.reshape(-1), pa.int64()),
                "vec_id": out_ids,
            }
        )


def kmeans_train(sf_dir: str, k: int = 8, iters: int = 5, seed: int = 42,
                 emb=None):
    """(cell, n_members, centroid list<double>): k-means centroids trained
    by DISTRIBUTED Lloyd iterations over the embeddings table — the
    iterative-training loop (each round = one streaming assignment pass)
    that :func:`build_ivf_index`'s driver-side sample approximates; run
    this when the index must be trained on the FULL corpus.

    Scale shape per iteration: centroids broadcast once (``ray.put``,
    k×dim floats), each batch assigns vectors vectorized (one matmul) and
    emits k partial rows (cell, sum-vector, count); the driver folds
    batches×k metadata-scale rows into new centroids.  Nothing
    corpus-width ever leaves the tasks; empty cells keep their previous
    centroid (standard Lloyd convention).

    Init is deterministic and content-independent: the k vectors with the
    smallest ``splitmix64(vec_id)`` (the engine's seeded-sample idiom).
    Rows-only in CORRECTNESS (float sums are not bit-reproducible across
    batch orders); exactness is covered by the planted-cluster pytest
    (exact membership counts + centroid allclose)."""
    import ray

    from minhash_ray.stages.banding import splitmix64

    ds = emb if emb is not None else _emb(sf_dir)
    ds = ds.materialize()

    # deterministic init: k smallest splitmix64(vec_id ^ seed)
    def init_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
        o = np.argsort(h)[:k]
        m = _matrix(batch)[o]
        return pa.table(
            {
                "h": pa.array(h[o].view(np.int64), pa.int64()),
                "vec": _pack_f64_rows(m),
            }
        )

    parts = pa.concat_tables(
        list(
            ds.map_batches(init_partial, batch_format="pyarrow").iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            )
        )
    )
    if parts.num_rows == 0:
        return pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "n_members": pa.array([], pa.int64()),
                "centroid": pa.array([], pa.list_(pa.float64())),
            }
        )
    hs = parts.column("h").to_numpy().view(np.uint64)
    order = np.argsort(hs)[: min(k, len(hs))]
    dim = len(parts.column("vec")[0].as_py()) // 8
    cents = np.stack(
        [np.frombuffer(parts.column("vec")[int(i)].as_py(), dtype=np.float64)
         for i in order]
    )
    counts = np.zeros(len(cents), dtype=np.int64)

    for _ in range(iters):
        cent_ref = [ray.put(cents)]

        def step(batch: pa.Table) -> pa.Table:
            from minhash_ray.util import cached_get

            c = cached_get(cent_ref[0])
            v = _matrix(batch)
            # nearest centroid by squared euclidean (ties -> lowest cell)
            d2 = (v * v).sum(axis=1)[:, None] - 2.0 * (v @ c.T) + (c * c).sum(axis=1)[None, :]
            cell = np.argmin(d2, axis=1).astype(np.int64)
            kk = c.shape[0]
            sums = np.zeros((kk, c.shape[1]), dtype=np.float64)
            np.add.at(sums, cell, v)
            n = np.bincount(cell, minlength=kk).astype(np.int64)
            return pa.table(
                {
                    "cell": pa.array(np.arange(kk, dtype=np.int64), pa.int64()),
                    "sum": _pack_f64_rows(sums),
                    "n": pa.array(n, pa.int64()),
                }
            )

        pt = pa.concat_tables(
            list(
                ds.map_batches(step, batch_format="pyarrow").iter_batches(
                    batch_size=1 << 20, batch_format="pyarrow"
                )
            )
        )
        cells = pt.column("cell").to_numpy()
        ns = pt.column("n").to_numpy()
        sums = _unpack_f64_rows(pt.column("sum").combine_chunks(), dim)
        tot_n = np.zeros(len(cents), dtype=np.int64)
        np.add.at(tot_n, cells, ns)
        tot_s = np.zeros_like(cents)
        np.add.at(tot_s, cells, sums)
        nonempty = tot_n > 0
        cents[nonempty] = tot_s[nonempty] / tot_n[nonempty, None]
        counts = tot_n

    flat = pa.array(cents.reshape(-1), pa.float64())
    return pa.table(
        {
            "cell": pa.array(np.arange(len(cents), dtype=np.int64), pa.int64()),
            "n_members": pa.array(counts, pa.int64()),
            "centroid": pa.FixedSizeListArray.from_arrays(flat, dim).cast(
                pa.list_(pa.float64())
            ),
        }
    )


def _pack_f64_rows(mat: np.ndarray) -> pa.Array:
    """(n, d) float64 matrix → large_binary column (Acero joins reject
    list payload columns; vectors ride as opaque byte strings)."""
    n, d = mat.shape
    offs = (np.arange(n + 1, dtype=np.int64) * (d * 8))
    return pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offs.tobytes()),
         pa.py_buffer(np.ascontiguousarray(mat).view(np.uint8).tobytes())],
    )


def _unpack_f64_rows(col, dim: int) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # the join engine may rewrite large_binary to binary: pick the offset
    # width from the actual type (mirrors stages/verify._unpack_u64_column)
    off_dtype = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    raw_off = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    start, end = int(raw_off[0]), int(raw_off[-1])
    seg = data[start:end]
    if start % 8:
        seg = seg.copy()
    return seg.view(np.float64).reshape(-1, dim)


def embedding_dup_pairs(
    sf_dir: str,
    threshold: float = 0.9,
    n_planes: int = 32,
    n_chunks: int = 4,
    seed: int = 42,
    num_partitions: int = 8,
    broadcast_max_rows: int = 2_000_000,
    embs=None,
):
    """Near-duplicate embedding pairs (cosine >= threshold, vec_id_a <
    vec_id_b) via hyperplane-LSH candidates + exact cosine verification.
    ``embs`` overrides the embeddings table with any Dataset carrying
    (vec_id int64, embedding list<float>) — e.g. pooled audio features
    (``audio.audio_embedding_dup_pairs``).

    Two vectors at angle θ disagree on a random hyperplane with prob θ/π;
    with 8-bit chunks a cos≥0.9 pair (θ≤26°) shares a chunk with prob
    ~1-(1-(1-θ/π)^8)^4 ≈ 0.97, and near-identical pairs ~always.

    Verification auto-switches like the clips pipeline: ≤
    ``broadcast_max_rows`` vectors, the normalized matrix is broadcast
    once; beyond it, normalized vectors are attached to the candidate
    pairs by two partitioned hash joins (packed as binary through the
    join) — no full-matrix materialization anywhere."""
    import ray

    from minhash_ray.util import clamp_partitions

    emb = (embs if embs is not None else _emb(sf_dir)).materialize()
    n_vecs = emb.count()
    first = emb.take(1)[0]
    dim = len(first["embedding"])

    buckets = emb.map_batches(
        _make_bucketer_fn(dim, n_planes, n_chunks, seed),
        batch_format="pyarrow",
    )
    joined = buckets.join(
        buckets,
        join_type="inner",
        on=("bucket",),
        right_suffix="_r",
        num_partitions=clamp_partitions(num_partitions),
    )

    def ordered(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.less(batch.column("vec_id"), batch.column("vec_id_r"))
        tt = batch.filter(mask)
        return pa.table({"vec_id_a": tt.column("vec_id"), "vec_id_b": tt.column("vec_id_r")})

    pairs = joined.map_batches(ordered, batch_format="pyarrow")

    # distinct candidate pairs are corpus-width: fold per-batch Arrow
    # distinct partials through a pair-hash partition
    from minhash_ray.util import fold_by_int_keys

    def u_partial(batch: pa.Table) -> pa.Table:
        d = batch.group_by(["vec_id_a", "vec_id_b"]).aggregate([([], "count_all")])
        return pa.table(
            {"vec_id_a": d.column("vec_id_a"), "vec_id_b": d.column("vec_id_b")}
        )

    def u_final(t: pa.Table) -> pa.Table:
        d = t.group_by(["vec_id_a", "vec_id_b"]).aggregate([([], "count_all")])
        return pa.table(
            {"vec_id_a": d.column("vec_id_a"), "vec_id_b": d.column("vec_id_b")}
        )

    uniq = fold_by_int_keys(pairs, ["vec_id_a", "vec_id_b"], u_partial, u_final, 8)

    if n_vecs <= broadcast_max_rows:
        # broadcast path: one normalized matrix + sorted-id index, shipped once
        t = pa.concat_tables(
            list(emb.iter_batches(batch_size=65536, batch_format="pyarrow"))
        )
        mat = _matrix(t)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        ids_np = np.asarray(t.column("vec_id").to_numpy(), dtype=np.int64)
        order = np.argsort(ids_np)
        pack_ref = [ray.put({"mat": np.ascontiguousarray(mat[order]), "ids": ids_np[order]})]

        def verify(batch: pa.Table) -> pa.Table:
            from minhash_ray.util import cached_get

            pack = cached_get(pack_ref[0])
            pmat, pids = pack["mat"], pack["ids"]
            a = np.searchsorted(pids, batch.column("vec_id_a").to_numpy())
            b = np.searchsorted(pids, batch.column("vec_id_b").to_numpy())
            cos = (pmat[a] * pmat[b]).sum(axis=1)
            keep = cos >= threshold
            return pa.table(
                {
                    "vec_id_a": batch.column("vec_id_a").filter(pa.array(keep)),
                    "vec_id_b": batch.column("vec_id_b").filter(pa.array(keep)),
                    "cos": pa.array(cos[keep], pa.float64()),
                }
            )

        return uniq.map_batches(verify, batch_format="pyarrow")

    # join path (the 10^9-vector regime): attach normalized vectors per side
    def normalize(batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "nvec": _pack_f64_rows(np.ascontiguousarray(m / norms[:, None])),
            }
        )

    norm_ds = emb.map_batches(normalize, batch_format="pyarrow")

    def side(suffix):
        return norm_ds.map_batches(
            lambda b, s=suffix: pa.table(
                {"vec_id": b.column("vec_id"), f"nvec_{s}": b.column("nvec")}
            ),
            batch_format="pyarrow",
        )

    with_a = uniq.join(
        side("a"), join_type="inner", on=("vec_id_a",), right_on=("vec_id",),
        num_partitions=clamp_partitions(num_partitions),
    )
    from minhash_ray.util import strip_empty_blocks

    # mandatory barrier between chained joins (util.strip_empty_blocks doc)
    with_ab = strip_empty_blocks(with_a).join(
        side("b"), join_type="inner", on=("vec_id_b",), right_on=("vec_id",),
        num_partitions=clamp_partitions(num_partitions),
    )

    def verify_join(batch: pa.Table) -> pa.Table:
        va = _unpack_f64_rows(batch.column("nvec_a"), dim)
        vb = _unpack_f64_rows(batch.column("nvec_b"), dim)
        cos = (va * vb).sum(axis=1)
        keep = cos >= threshold
        return pa.table(
            {
                "vec_id_a": batch.column("vec_id_a").filter(pa.array(keep)),
                "vec_id_b": batch.column("vec_id_b").filter(pa.array(keep)),
                "cos": pa.array(cos[keep], pa.float64()),
            }
        )

    return with_ab.map_batches(verify_join, batch_format="pyarrow")


def semantic_dedup(
    sf_dir: str,
    n_centroids: int = 16,
    threshold: float = 0.3,
    seed: int = 42,
    embs=None,
):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): assign every embedding to its nearest k-means
    centroid cell (the IVF coarse index, ``build_ivf_index``), find
    within-cell pairs with cosine >= ``threshold``, connect them into
    components, and keep exactly one vector (the min vec_id) per
    component.  Returns (vec_id, cluster_id, keep) for EVERY vector —
    singletons keep themselves.

    Scale shape: pairs can only exist *inside* a cell, so the whole
    find-pairs + connected-components step is embarrassingly parallel per
    cell — one ``groupby("cell").map_groups`` pass emits final
    assignments with no global pair shuffle and no driver union-find.
    Cell size is bounded by n/n_centroids in expectation; at corpus scale
    raise ``n_centroids`` (SemDeDup uses ~10^5 cells for 10^9 docs) so
    the per-cell gram matrix stays cache-sized — the kernel below chunks
    its rows, so a hot cell degrades gracefully instead of allocating
    an n_cell^2 block.

    Reference semantics anchor: components-over-verified-pairs with a
    canonical min-id representative is the same cluster/keep contract as
    ``dedup_text.doc_dedup_tiered`` (and the flagship), applied to the
    embedding modality.  ``embs`` overrides the embeddings table (any
    Dataset with vec_id int64 + embedding list<float> — e.g. pooled audio
    features, ``audio.audio_semantic_dedup``)."""
    index, cents, dim = build_ivf_index(sf_dir, n_centroids, seed, embs=embs)

    def cell_components(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column("vec_id").to_numpy(), dtype=np.int64)
        v = _unpack_f64_rows(group.column("nvec"), dim)
        order = np.argsort(ids)
        ids = ids[order]
        v = np.ascontiguousarray(v[order])
        n = len(ids)
        # union-find over cos-gated pairs; with rows sorted by vec_id and
        # union-by-min, each root is the min positional index — hence the
        # min vec_id — of its component
        parent = np.arange(n)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        CH = 2048                       # gram-matrix row chunk (cache bound)
        for s in range(0, n, CH):
            g = v[s : s + CH] @ v.T
            ii, jj = np.nonzero(g >= threshold)
            ii = ii + s
            m = jj > ii                 # upper triangle only (a < b)
            for a, b in zip(ii[m], jj[m]):   # loop over EDGES (sparse), not rows
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        roots = np.fromiter((find(i) for i in range(n)), dtype=np.int64, count=n)
        cluster = ids[roots]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(cluster, pa.int64()),
                "keep": pa.array((cluster == ids).astype(np.int64), pa.int64()),
            }
        )

    return index.groupby("cell").map_groups(cell_components, batch_format="pyarrow")


def build_pq_index(
    sf_dir: str,
    m_sub: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    kmeans_iters: int = 8,
    sample: int = 8192,
    emb=None,
):
    """Product-quantization index (Jégou, Douze & Schmid 2011, "Product
    Quantization for Nearest Neighbor Search"): the dim is split into
    ``m_sub`` subspaces, each with its own ``n_codes``-entry k-means
    codebook trained on a driver-side sample (the same seeded-Lloyd
    sampling contract as :func:`build_ivf_index`), and one ``map_batches``
    pass encodes every vector to ``m_sub`` uint8 codes — 8 bytes/vector
    at the defaults vs 512 for raw float64×64: the memory form that lets
    a 10^12-vector index live in RAM across a cluster.

    Returns (index_ds {vec_id, codes binary}, codebooks
    (m_sub, n_codes, d_sub) float64, dim)."""
    import ray

    ds = (emb if emb is not None else _emb(sf_dir)).materialize()
    st = pa.concat_tables(
        list(ds.limit(sample).iter_batches(batch_size=8192, batch_format="pyarrow"))
    )
    m = _matrix(st)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    m = m / norms[:, None]
    dim = m.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    d_sub = dim // m_sub
    books = np.stack(
        [
            ivf_centroids(
                np.ascontiguousarray(m[:, s * d_sub: (s + 1) * d_sub]),
                n_codes,
                seed + s,
                kmeans_iters,
            )
            for s in range(m_sub)
        ]
    )  # (m_sub, n_codes, d_sub)
    book_ref = [ray.put(books)]

    def encode(batch: pa.Table) -> pa.Table:
        from minhash_ray.util import cached_get

        bks = cached_get(book_ref[0])
        v = _matrix(batch)
        norms = np.linalg.norm(v, axis=1)
        norms[norms == 0] = 1.0
        v = v / norms[:, None]
        n = v.shape[0]
        codes = np.empty((n, m_sub), dtype=np.uint8)
        for s in range(m_sub):
            sub = v[:, s * d_sub: (s + 1) * d_sub]
            # argmin ||x - c||^2 = argmax (x·c - ||c||²/2), one matmul
            scores = sub @ bks[s].T - 0.5 * (bks[s] ** 2).sum(axis=1)[None, :]
            codes[:, s] = np.argmax(scores, axis=1).astype(np.uint8)
        flat = codes.reshape(-1)
        offs = (np.arange(n + 1, dtype=np.int64) * m_sub)
        arr = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(offs), pa.py_buffer(np.ascontiguousarray(flat))],
        )
        return pa.table({"vec_id": batch.column("vec_id"), "codes": arr})

    index = ds.map_batches(encode, batch_format="pyarrow").materialize()
    return index, books, dim


def ann_topk_pq(
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    m_sub: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    index=None,
):
    """Approximate top-k by asymmetric distance over the PQ codes: the
    query builds ONE (m_sub × n_codes) inner-product table against the
    codebooks, and every vector's score is a pure table-gather sum over
    its uint8 codes — the scan never touches a float vector, only
    m_sub bytes per row (the 64×-compressed form of :func:`ann_topk`).
    Per-batch local top-k, driver folds batches × k rows.  Returns
    (vec_id, rank).

    SQL-checked in CORRECTNESS: once the seeded codebooks are fixed the
    code assignment is an integer argmax and ADC a lookup-table sum, so
    ``__ray_entry__._pq_topk_sql`` replays the chain with codebooks /
    half-norms / query table embedded as literals.  Recall vs the exact
    brute-force top-k is additionally pytest-pinned on clustered
    embeddings."""
    import duckdb

    if index is None:
        index = build_pq_index(sf_dir, m_sub=m_sub, n_codes=n_codes, seed=seed)
    index_ds, books, dim = index
    m_sub = books.shape[0]

    q = duckdb.connect().execute(
        f"select embedding from '{os.path.join(sf_dir, 'embeddings.parquet')}' "
        f"where vec_id = {int(query_vec_id)}"
    ).fetchone()[0]
    qv = np.asarray(q, dtype=np.float64)
    qn = qv / np.linalg.norm(qv)
    d_sub = dim // m_sub
    # table[s, c] = q_s · codebook[s][c]  (cosine via sum of sub inner
    # products against the normalized stored form)
    table = np.stack(
        [books[s] @ qn[s * d_sub: (s + 1) * d_sub] for s in range(m_sub)]
    )  # (m_sub, n_codes)

    def score(batch: pa.Table) -> pa.Table:
        col = batch.column("codes")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        flat = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        off = np.frombuffer(col.buffers()[1], dtype=np.int64)
        start = off[col.offset]
        codes = flat[start: start + n * m_sub].reshape(n, m_sub)
        adc = table[np.arange(m_sub)[None, :], codes].sum(axis=1)
        ids = np.asarray(batch.column("vec_id").to_numpy(), dtype=np.int64)
        mask = ids != query_vec_id
        adc, ids = adc[mask], ids[mask]
        order = np.lexsort((ids, -adc))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "adc": pa.array(adc[order], pa.float64()),
            }
        )

    partials = index_ds.map_batches(score, batch_format="pyarrow")
    t = pa.concat_tables(
        list(partials.iter_batches(batch_size=65536, batch_format="pyarrow"))
    )
    ids = t.column("vec_id").to_numpy()
    adc = t.column("adc").to_numpy()
    order = np.lexsort((ids, -adc))[:k]
    return pa.table(
        {
            "vec_id": pa.array(ids[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64), pa.int64()),
        }
    )


def build_ivfpq_index(
    sf_dir: str,
    n_centroids: int = 16,
    m_sub: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    kmeans_iters: int = 8,
    sample: int = 8192,
    emb=None,
):
    """IVF+PQ index (the FAISS IVFPQ composition — Jégou et al. 2011 §V):
    ONE map_batches pass assigns every vector its coarse cell AND its
    m_sub uint8 PQ codes (both codebooks trained on the same driver-side
    normalized sample).  9 bytes/vector at the defaults; at scale write
    it cell-partitioned so a query reads only its probed cells' files.

    Returns (index_ds {vec_id, cell, codes}, cents, books, dim)."""
    import ray

    ds = (emb if emb is not None else _emb(sf_dir)).materialize()
    st = pa.concat_tables(
        list(ds.limit(sample).iter_batches(batch_size=8192, batch_format="pyarrow"))
    )
    m = _matrix(st)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    m = m / norms[:, None]
    dim = m.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    d_sub = dim // m_sub
    cents = ivf_centroids(m, n_centroids, seed, kmeans_iters)
    books = np.stack(
        [
            ivf_centroids(
                np.ascontiguousarray(m[:, s * d_sub: (s + 1) * d_sub]),
                n_codes,
                seed + s,
                kmeans_iters,
            )
            for s in range(m_sub)
        ]
    )
    ref = [ray.put((cents, books))]

    def encode(batch: pa.Table) -> pa.Table:
        from minhash_ray.util import cached_get

        c, bks = cached_get(ref[0])
        v = _matrix(batch)
        norms = np.linalg.norm(v, axis=1)
        norms[norms == 0] = 1.0
        v = v / norms[:, None]
        n = v.shape[0]
        cell = np.argmax(v @ c.T, axis=1).astype(np.int64)
        codes = np.empty((n, m_sub), dtype=np.uint8)
        for s in range(m_sub):
            sub = v[:, s * d_sub: (s + 1) * d_sub]
            scores = sub @ bks[s].T - 0.5 * (bks[s] ** 2).sum(axis=1)[None, :]
            codes[:, s] = np.argmax(scores, axis=1).astype(np.uint8)
        offs = np.arange(n + 1, dtype=np.int64) * m_sub
        arr = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(offs),
             pa.py_buffer(np.ascontiguousarray(codes.reshape(-1)))],
        )
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cell": pa.array(cell, pa.int64()),
                "codes": arr,
            }
        )

    index = ds.map_batches(encode, batch_format="pyarrow").materialize()
    return index, cents, books, dim


def ann_topk_ivfpq(
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m_sub: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    index=None,
):
    """Approximate top-k through BOTH reductions: probe only the
    ``n_probe`` nearest coarse cells (touch ~n_probe/n_centroids of the
    corpus) and score the survivors by PQ asymmetric distance (touch only
    their code bytes) — the memory- and compute-bounded architecture a
    10^12-vector search actually ships.  Returns (vec_id, rank);
    rows-only in CORRECTNESS, recall pytest-pinned."""
    import duckdb

    if index is None:
        index = build_ivfpq_index(
            sf_dir, n_centroids=n_centroids, m_sub=m_sub, n_codes=n_codes, seed=seed
        )
    index_ds, cents, books, dim = index
    m_sub = books.shape[0]
    d_sub = dim // m_sub

    q = duckdb.connect().execute(
        f"select embedding from '{os.path.join(sf_dir, 'embeddings.parquet')}' "
        f"where vec_id = {int(query_vec_id)}"
    ).fetchone()[0]
    qv = np.asarray(q, dtype=np.float64)
    qn = qv / np.linalg.norm(qv)
    probe_set = np.sort(
        np.argsort(-(cents @ qn))[: min(n_probe, len(cents))].astype(np.int64)
    )
    table = np.stack(
        [books[s] @ qn[s * d_sub: (s + 1) * d_sub] for s in range(m_sub)]
    )

    def score(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy()
        pos = np.minimum(np.searchsorted(probe_set, cell), len(probe_set) - 1)
        mask = probe_set[pos] == cell
        ids = np.asarray(batch.column("vec_id").to_numpy(), dtype=np.int64)
        mask &= ids != query_vec_id
        if not mask.any():
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "adc": pa.array([], pa.float64())}
            )
        col = batch.column("codes")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        off = np.frombuffer(col.buffers()[1], dtype=np.int64)
        start = off[col.offset]
        codes = flat[start: start + len(col) * m_sub].reshape(len(col), m_sub)[mask]
        adc = table[np.arange(m_sub)[None, :], codes].sum(axis=1)
        ids = ids[mask]
        order = np.lexsort((ids, -adc))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "adc": pa.array(adc[order], pa.float64()),
            }
        )

    partials = index_ds.map_batches(score, batch_format="pyarrow")
    t = pa.concat_tables(
        list(partials.iter_batches(batch_size=65536, batch_format="pyarrow"))
    )
    ids = t.column("vec_id").to_numpy()
    adc = t.column("adc").to_numpy()
    order = np.lexsort((ids, -adc))[:k]
    return pa.table(
        {
            "vec_id": pa.array(ids[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64), pa.int64()),
        }
    )

"""Stage C — clustering: verified edges → canonical cluster assignments.

Two paths, auto-selected by edge count:

* **driver union-find** (≤ ``driver_uf_max_edges``): edges stream to the
  driver via ``iter_batches`` (never ``take_all`` on big data) into a
  path-compressed union-find.  Dup edges are a tiny fraction of the corpus,
  so this holds far beyond fixture scale.
* **distributed min-label propagation** (the 10^12 path): iterate
  "label(v) = min(label(v), min over neighbors' labels)" via partitioned
  joins + vectorized groupby-min until fixpoint.  Converges in O(diameter)
  rounds; near-dup components are small and shallow so a handful of rounds
  suffices (cf. Kiveris et al. 2014, "Connected components in MapReduce").

Canonical cluster id = min clip_id of the component, mirroring the
deterministic, order-independent outcome the reference gets from min-fold
commutativity (the property its concurrent designs rely on,
src/utils/utils.c:3-46).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from minhash_ray.config import PipelineConfig

ASSIGN_SCHEMA = pa.schema([("clip_id", pa.string()), ("cluster_id", pa.string())])


def components_driver(edges_ds) -> dict[str, str]:
    """Driver-side connected components, vectorized.

    Edges stream to the driver as Arrow batches; node ids are
    dictionary-encoded, remapped to sorted ranks (so the minimum integer
    label IS the minimum clip_id), and components are found by iterated
    scatter-min + pointer jumping — pure numpy, O(E · log diameter),
    ~100x faster than a per-edge python union-find loop at millions of
    edges.  Returns node → canonical (min) member."""
    a_parts, b_parts = [], []
    for batch in edges_ds.select_columns(["clip_id_a", "clip_id_b"]).iter_batches(
        batch_size=1_048_576, batch_format="pyarrow"
    ):
        a_parts.append(batch.column("clip_id_a"))
        b_parts.append(batch.column("clip_id_b"))
    if not a_parts:
        return {}
    combined = pa.concat_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
         for c in (a_parts + b_parts)]
    )
    n_edges = len(combined) // 2
    enc = combined.dictionary_encode()
    dict_vals = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # remap first-appearance dictionary codes to sorted-rank codes
    order = np.argsort(dict_vals)
    rank_of = np.empty(len(dict_vals), dtype=np.int64)
    rank_of[order] = np.arange(len(dict_vals))
    codes = rank_of[codes]
    uniq_sorted = dict_vals[order]

    u, v = codes[:n_edges], codes[n_edges:]
    lab = np.arange(len(uniq_sorted), dtype=np.int64)
    for _ in range(64):
        m = np.minimum(lab[u], lab[v])
        np.minimum.at(lab, u, m)
        np.minimum.at(lab, v, m)
        while True:                          # pointer jumping to fixpoint
            nl = lab[lab]
            if np.array_equal(nl, lab):
                break
            lab = nl
        if np.array_equal(lab[u], lab[v]):
            break
    return dict(zip(uniq_sorted.tolist(), uniq_sorted[lab].tolist()))


def components_label_propagation(edges_ds, num_partitions: int = 32, max_iters: int = 50,
                                 col_a: str = "clip_id_a", col_b: str = "clip_id_b",
                                 out_cols: tuple = ("clip_id", "cluster_id")):
    """Distributed min-label propagation. Returns a Dataset
    ``{out_cols[0]: node, out_cols[1]: min-label component id}`` — works
    for any orderable id type (string clip_ids, int64 doc_ids)."""
    import ray.data as rd

    from minhash_ray.util import clamp_partitions

    num_partitions = clamp_partitions(num_partitions)

    def to_directed(batch: pa.Table) -> pa.Table:
        a = batch.column(col_a)
        b = batch.column(col_b)
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([a, b]),
                "dst": pa.concat_arrays([b, a]),
            }
        )

    from minhash_ray.util import strip_empty_blocks

    # join inputs must carry no empty blocks (util.strip_empty_blocks doc)
    directed = strip_empty_blocks(edges_ds.select_columns([col_a, col_b]).map_batches(
        to_directed, batch_format="pyarrow"
    ))

    # labels init: every endpoint labels itself
    labels = (
        directed.map_batches(
            lambda t: pa.table({"node": t.column("src"), "label": t.column("src")}),
            batch_format="pyarrow",
        )
        .groupby("node")
        .min("label")
        .map_batches(
            lambda t: pa.table({"node": t.column("node"), "label": t.column("min(label)")}),
            batch_format="pyarrow",
        )
    )
    labels = strip_empty_blocks(labels)

    for _ in range(max_iters):
        # neighbor labels: join edges with labels on src, propagate to dst
        msgs = directed.join(
            labels,
            join_type="inner",
            on=("src",),
            right_on=("node",),
            num_partitions=num_partitions,
        ).map_batches(
            lambda t: pa.table({"node": t.column("dst"), "label": t.column("label")}),
            batch_format="pyarrow",
        )
        new_labels = (
            msgs.union(labels)
            .groupby("node")
            .min("label")
            .map_batches(
                lambda t: pa.table(
                    {"node": t.column("node"), "label": t.column("min(label)")}
                ),
                batch_format="pyarrow",
            )
        )
        new_labels = strip_empty_blocks(new_labels)
        # convergence: any node whose label shrank this round?
        changed = (
            new_labels.join(
                labels,
                join_type="inner",
                on=("node",),
                right_suffix="_old",
                num_partitions=num_partitions,
            )
            .map_batches(
                lambda t: pa.table(
                    {"c": pa.array(
                        np.asarray(
                            pa.compute.not_equal(t.column("label"), t.column("label_old"))
                        ).astype(np.int64)
                    )}
                ),
                batch_format="pyarrow",
            )
            .sum("c")
        )
        labels = new_labels
        if not changed:
            break

    return labels.map_batches(
        lambda t: pa.table(
            {out_cols[0]: t.column("node"), out_cols[1]: t.column("label")}
        ),
        batch_format="pyarrow",
    )


def assign_clusters(all_ids_ds, edges_ds, cfg: PipelineConfig, num_partitions: int = 32):
    """Full assignment table {clip_id, cluster_id}: dup members get their
    component's min clip_id, everything else is its own singleton cluster.

    ``all_ids_ds`` needs only a ``clip_id`` column.
    """
    n_edges = edges_ds.count()
    if n_edges <= cfg.driver_uf_max_edges:
        comp = components_driver(edges_ds)
        import ray

        # broadcast as sorted numpy byte arrays: zero-copy per worker, no
        # python-dict deserialization (which would anti-scale with workers)
        from minhash_ray.util import bytes_key_array

        keys = bytes_key_array(list(comp.keys()))
        vals = bytes_key_array(list(comp.values()))
        order = np.argsort(keys)
        comp_ref = [ray.put({"keys": keys[order], "vals": vals[order]})]

        def assign_fn(batch: pa.Table) -> pa.Table:
            from minhash_ray.util import bytes_key_array, cached_get

            pack = cached_get(comp_ref[0])
            keys_s, vals_s = pack["keys"], pack["vals"]
            ids = bytes_key_array(batch.column("clip_id"))
            # widen to the rep width so assignment can never truncate
            width = max(ids.dtype.itemsize, vals_s.dtype.itemsize if len(vals_s) else 1)
            out = ids.astype(f"S{width}")
            if len(keys_s):
                pos = np.searchsorted(keys_s, ids)
                pos_c = np.minimum(pos, len(keys_s) - 1)
                found = keys_s[pos_c] == ids
                out[found] = vals_s[pos_c[found]]
            return pa.table(
                {
                    "clip_id": batch.column("clip_id"),
                    "cluster_id": pa.array([x.decode() for x in out], pa.string()),
                },
                schema=ASSIGN_SCHEMA,
            )

        return all_ids_ds.select_columns(["clip_id"]).map_batches(
            assign_fn, batch_format="pyarrow"
        )

    # scale path: distributed label propagation + left join for singletons
    from minhash_ray.util import clamp_partitions

    comp_ds = components_label_propagation(edges_ds, num_partitions=num_partitions)
    joined = all_ids_ds.select_columns(["clip_id"]).join(
        comp_ds,
        join_type="left_outer",
        on=("clip_id",),
        right_suffix="_c",
        num_partitions=clamp_partitions(num_partitions),
    )

    def fill(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cluster = pc.coalesce(batch.column("cluster_id"), batch.column("clip_id"))
        return pa.table(
            {"clip_id": batch.column("clip_id"), "cluster_id": cluster},
            schema=ASSIGN_SCHEMA,
        )

    return joined.map_batches(fill, batch_format="pyarrow")

"""Deterministic clips-table synthesis tied to the driver testdata.

``BASELINE.json.input_hint`` mandates a clips-shaped input table that the
driver testdata does not ship; this module synthesizes one deterministically
(seeded, no external data) with transcripts windowed from the testdata
``documents.text`` column, caches it under /tmp keyed by (sf_dir, rows,
seed), and returns the cache directory.  entry(), queries() and bench.py
all read clips through this path.
"""

from __future__ import annotations

import hashlib
import os

CACHE_ROOT = "/tmp/minhash_ray_clips"

# rows synthesized per scale factor directory (~6x the documents row count,
# so near-dup clusters have realistic text diversity underneath)
DEFAULT_ROWS = {
    "sf0.001": 600,
    "sf0.01": 3000,
    "sf0.1": 30000,
}


# rows per generation shard for large corpora: generate_clips holds every
# float64 waveform in a driver-side dict (~115 KB/clip at default
# durations), so a 1M-row corpus would need ~100 GB in one process; above
# this bound the corpus is synthesized as independent seeded shards
# (unique id ranges via generate_clips(id_offset=...)) written straight to
# a clips.parquet DIRECTORY, ≤3 shards in flight (~12 GB peak each)
SHARD_ROWS = 100_000

_PQ_WRITE_KW = dict(
    row_group_size=256,
    use_dictionary=["clip_id", "codec"],
    compression={"bytes": "NONE", "clip_id": "SNAPPY", "sr_hz": "SNAPPY",
                 "dur_ms": "SNAPPY", "codec": "SNAPPY", "transcript": "SNAPPY"},
)


def _write_clip_shard(tmp_dir: str, shard: int, n_rows: int, id_offset: int,
                      seed: int, base_texts, dur_range, widen_texts) -> None:
    """Worker for sharded synthesis (module-level for picklability):
    generate one shard and write its clips part-file + truth shard."""
    import sys

    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from tools.make_fixtures import generate_clips

    clips, truth = generate_clips(
        n_rows, seed=seed, base_texts=base_texts, dur_range=dur_range,
        widen_texts=widen_texts, id_offset=id_offset,
    )
    pq.write_table(
        clips, os.path.join(tmp_dir, "clips.parquet", f"part-{shard:05d}.parquet"),
        **_PQ_WRITE_KW,
    )
    pq.write_table(truth, os.path.join(tmp_dir, f"truth-{shard:05d}.parquet"))


def clips_dir_for(sf_dir: str, n_rows: int | None = None, seed: int = 42,
                  dur_range: tuple[int, int] = (300, 1500),
                  widen_texts: bool = False) -> str:
    """Synthesize (or reuse cached) clips + truth_pairs parquet for a
    testdata scale dir. Returns the directory containing them.

    ``widen_texts`` grows the transcript source pool with the corpus so
    near-dup pairs stay ∝ rows (the scaling bench's width-proportional
    corpus; see tools/make_fixtures.generate_clips).

    Above :data:`SHARD_ROWS` rows, ``clips.parquet`` is a DIRECTORY of
    shard part-files (each shard an independent seeded generation with a
    disjoint clip-id range; planted truth clusters never span shards) —
    ``read_clips`` and ``pq.read_table`` both handle the directory form."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    if n_rows is None:
        n_rows = DEFAULT_ROWS.get(sf_name, 1000)
    widen_tag = "|widen" if widen_texts else ""
    shard_tag = f"|sharded{SHARD_ROWS}" if n_rows > SHARD_ROWS else ""
    key = hashlib.sha256(
        f"{os.path.abspath(sf_dir)}|{n_rows}|{seed}|{dur_range}|v5{widen_tag}{shard_tag}".encode()
    ).hexdigest()[:16]
    out_dir = os.path.join(CACHE_ROOT, key)
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir

    import pyarrow.parquet as pq

    base_texts = None
    docs_path = os.path.join(sf_dir, "documents.parquet")
    if os.path.exists(docs_path):
        base_texts = pq.read_table(docs_path, columns=["text"]).column("text").to_pylist()

    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from tools.make_fixtures import generate_clips

    if n_rows > SHARD_ROWS:
        return _clips_dir_sharded(
            out_dir, n_rows, seed, base_texts, dur_range, widen_texts
        )

    clips, truth = generate_clips(
        n_rows, seed=seed, base_texts=base_texts, dur_range=dur_range,
        widen_texts=widen_texts,
    )
    tmp = out_dir + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    # small row groups → parallel read blocks sized so the fused
    # read+signature stage has many more tasks than workers (256 rows
    # ≈ 30 MB ≈ 0.3 s of work: at 1024 rows a 100k corpus gave 16 workers
    # only ~6 task waves and the exposed last-wave straggle cost ~10% of
    # the stage — task quantization, not bandwidth); the audio payload is
    # incompressible (synthetic waveforms ≈ ratio 1.00) so snappy on the
    # `bytes` column is a pure decode tax on every scan (~30% of the fused
    # read+signature cost, measured) — store it raw, keep text columns
    # compressed (a dict `compression=` leaves UNLISTED columns
    # uncompressed, so every column is listed explicitly)
    # use_dictionary: parquet's default tries to dictionary-encode EVERY
    # column; for the ~100 KB-unique `bytes` payloads the encoder builds a
    # doomed dict per page before falling back, and the decoder pays the
    # indirection — measured 2.8x slower decode (0.46 vs 1.31 GiB/s/core)
    # for identical file size.  Only genuinely low-cardinality columns
    # keep dictionary encoding.
    pq.write_table(
        clips, os.path.join(tmp, "clips.parquet"), row_group_size=256,
        use_dictionary=["clip_id", "codec"],
        compression={"bytes": "NONE", "clip_id": "SNAPPY", "sr_hz": "SNAPPY",
                     "dur_ms": "SNAPPY", "codec": "SNAPPY", "transcript": "SNAPPY"},
    )
    pq.write_table(truth, os.path.join(tmp, "truth_pairs.parquet"))
    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write("ok")
    if os.path.exists(out_dir):
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    return out_dir


def _clips_dir_sharded(out_dir: str, n_rows: int, seed: int, base_texts,
                       dur_range, widen_texts) -> str:
    """Shard-wise synthesis of a >SHARD_ROWS corpus: each shard is an
    independent ``generate_clips`` run (seed + 7919·shard, disjoint id
    range) written directly to ``clips.parquet/part-*.parquet`` from a
    worker process, ≤3 in flight so peak memory stays ~36 GB instead of
    the ~100 GB a single 1M-row generation would need.  Truth shards are
    concatenated into one small ``truth_pairs.parquet`` (pairs ∝ rows)."""
    from concurrent.futures import ProcessPoolExecutor

    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = out_dir + ".tmp"
    os.makedirs(os.path.join(tmp, "clips.parquet"), exist_ok=True)
    n_shards = -(-n_rows // SHARD_ROWS)
    counts = [
        n_rows // n_shards + (1 if s < n_rows % n_shards else 0)
        for s in range(n_shards)
    ]
    offsets = [0] * n_shards
    for s in range(1, n_shards):
        offsets[s] = offsets[s - 1] + counts[s - 1]
    with ProcessPoolExecutor(max_workers=min(3, n_shards)) as ex:
        futs = [
            ex.submit(
                _write_clip_shard, tmp, s, counts[s], offsets[s],
                seed + 7919 * s, base_texts, dur_range, widen_texts,
            )
            for s in range(n_shards)
        ]
        for f in futs:
            f.result()
    truth = pa.concat_tables(
        [
            pq.read_table(os.path.join(tmp, f"truth-{s:05d}.parquet"))
            for s in range(n_shards)
        ]
    )
    pq.write_table(truth, os.path.join(tmp, "truth_pairs.parquet"))
    for s in range(n_shards):
        os.remove(os.path.join(tmp, f"truth-{s:05d}.parquet"))
    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write("ok")
    if os.path.exists(out_dir):
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    return out_dir

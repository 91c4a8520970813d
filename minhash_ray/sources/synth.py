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


def clips_dir_for(sf_dir: str, n_rows: int | None = None, seed: int = 42,
                  dur_range: tuple[int, int] = (300, 1500),
                  widen_texts: bool = False) -> str:
    """Synthesize (or reuse cached) clips + truth_pairs parquet for a
    testdata scale dir. Returns the directory containing them.

    ``widen_texts`` grows the transcript source pool with the corpus so
    near-dup pairs stay ∝ rows (the scaling bench's width-proportional
    corpus; see tools/make_fixtures.generate_clips)."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    if n_rows is None:
        n_rows = DEFAULT_ROWS.get(sf_name, 1000)
    widen_tag = "|widen" if widen_texts else ""
    key = hashlib.sha256(
        f"{os.path.abspath(sf_dir)}|{n_rows}|{seed}|{dur_range}|v5{widen_tag}".encode()
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

"""Benchmark harness.

Default: runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": "clips_dedup_e2e", "value": <sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": 0.1, "num_cpus": N,
     "clips": N, "clips_per_sec": X, "recall_gated": r}

``--scaling``: runs the same headline job twice in fresh subprocesses at
num_cpus=8 and num_cpus=32 on the same (pre-generated, page-warm) input and
prints throughput at both plus scaling efficiency — the sandbox evidence
for the north rule's N-vs-4N-node criterion.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_of(path: str) -> float:
    name = os.path.basename(os.path.normpath(path))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def _warm(path: str) -> None:
    """Page-warm a parquet file OR a directory of shard part-files (the
    sharded >100k fixtures write clips.parquet as a directory)."""
    files = (
        [path]
        if os.path.isfile(path)
        else sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        )
    )
    for p in files:
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass


def _mean_std(xs):
    m = sum(xs) / len(xs)
    if len(xs) < 2:
        return m, 0.0
    var = sum((x - m) ** 2 for x in xs) / (len(xs) - 1)
    return m, var ** 0.5


def run_bench() -> dict:
    import ray

    ray.init(
        address="local", num_cpus=NCPUS, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
        # keep worker prints off the driver's stdout: the bench contract is
        # ONE JSON line, and a forwarded "(ReadParquetRowGroups pid=...)"
        # line was observed interleaving with it
        log_to_driver=False,
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from minhash_ray.config import PipelineConfig
    from minhash_ray.pipelines import (
        ann,
        curation,
        dedup_text,
        events,
        relational,
        spans,
        text,
    )
    from minhash_ray.pipelines.dedup import dedup_metrics, run_dedup
    from minhash_ray.sources.synth import clips_dir_for

    # --- headline: clips near-dup dedup end-to-end ---
    n_rows_env = os.environ.get("GRAFT_CLIPS_ROWS")
    dur_env = os.environ.get("GRAFT_CLIPS_DUR")
    synth_kw = {}
    if dur_env:
        lo, hi = dur_env.split(",")
        synth_kw["dur_range"] = (int(lo), int(hi))
    if os.environ.get("GRAFT_CLIPS_WIDEN") == "1":
        # width-proportional corpus (pairs ∝ rows): the scaling bench's
        # input shape — see tools/make_fixtures.generate_clips(widen_texts)
        synth_kw["widen_texts"] = True
    clips_dir = clips_dir_for(
        SF_DIR, n_rows=int(n_rows_env) if n_rows_env else None, **synth_kw
    )                                                    # cached, untimed
    clips_path = os.path.join(clips_dir, "clips.parquet")
    # warm the page cache so we measure compute + shuffle, not first-touch IO
    _warm(clips_path)
    # warm the Ray worker pool: spawning NCPUS python workers is cluster
    # startup cost, not pipeline throughput
    rd.range(NCPUS * 4).repartition(NCPUS * 2).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()

    from minhash_ray.sources.clips import read_clips

    cfg = PipelineConfig()
    # mean±std over repeated runs — the reference's 10-run protocol
    # (plot_test_prob.py:139 reports mean and std per point); best-of-2
    # under the box's ±20-50% wall-time drift reported luck, not the
    # engine.  --scaling legs keep 1 run each: the interleaved-pair
    # median in run_scaling is that protocol's variance control.
    n_rep = int(
        os.environ.get(
            "GRAFT_HEADLINE_REPEATS",
            "1" if os.environ.get("GRAFT_HEADLINE_ONLY") else "10",
        )
    )
    head_runs: list = []
    stage_runs: list = []
    res = None
    for _ in range(n_rep):
        del res  # drop prior run's blocks before re-running
        stage_times: dict = {}
        t0 = time.time()
        res = run_dedup(
            read_clips(clips_path), cfg, num_partitions=max(8, NCPUS),
            stage_times=stage_times,
        )
        n_clips = res.assignments.count()
        head_runs.append(time.time() - t0)
        stage_runs.append(dict(stage_times))
    headline, headline_std = _mean_std(head_runs)
    stage_times = {
        k: round(_mean_std([sr[k] for sr in stage_runs])[0], 3)
        for k in stage_runs[0]
    }
    stage_times_std = {
        k: round(_mean_std([sr[k] for sr in stage_runs])[1], 3)
        for k in stage_runs[0]
    }
    if os.environ.get("GRAFT_STATS"):
        print(res.assignments.stats(), file=sys.stderr)
    metrics = dedup_metrics(
        res.assignments,
        os.path.join(clips_dir, "truth_pairs.parquet"),
        cfg,
        clips_path=clips_path,
        edges=res.edges,
    )

    if os.environ.get("GRAFT_HEADLINE_ONLY"):
        out = {
            "metric": "clips_dedup_e2e",
            "value": round(headline, 3),
            "value_std": round(headline_std, 3),
            "value_runs": [round(x, 3) for x in head_runs],
            "unit": "sec",
            "queries": {},
            "stages": stage_times,
            "stages_std": stage_times_std,
            "sf": _sf_of(SF_DIR),
            "num_cpus": NCPUS,
            "clips": n_clips,
            "clips_per_sec": round(n_clips / headline, 1),
            "recall_gated": round(metrics["recall_gated"], 4),
            "precision": round(metrics["precision"], 4),
            "precision_loose": round(metrics.get("precision_loose", metrics["precision"]), 4),
            "edge_precision": round(metrics.get("edge_precision", -1.0), 4),
        }
        ray.shutdown()
        return out

    # --- per-pipeline timings FIRST (before the sweep blocks): round 2's
    # per-query numbers drifted 10-40% because they ran after the sweeps in
    # a long shared session (VERDICT r2 "measure the bench regressions in
    # isolation"); each query now runs twice and reports best-of-2 with the
    # raw runs alongside so run-to-run variance is visible in the record ---
    def timed2(fn):
        import gc

        runs = []
        for _ in range(2):
            t = time.time()
            out = fn(SF_DIR)
            if hasattr(out, "count"):
                out.count()
            runs.append(round(time.time() - t, 3))
            # drop the result's materialized blocks before the next query:
            # with 80+ timed queries in one session, lingering object-store
            # refs push later queries into spill and inflate their numbers
            del out
            gc.collect()
        return min(runs), runs

    # audio/tiered ops run over the headline clips corpus (already cached
    # and page-warm), column-pruned at the read
    from minhash_ray.pipelines.audio import audio_containment_pairs as _acp
    from minhash_ray.pipelines.audio import audio_dup_regions as _adr
    from minhash_ray.pipelines.audio import audio_dup_pairs as _adp
    from minhash_ray.pipelines.audio import audio_phash_pairs as _aphp
    from minhash_ray.pipelines.audio import audio_trim_plan as _atp
    from minhash_ray.pipelines.audio import audio_exact_dedup as _aed
    from minhash_ray.pipelines.audio import audio_stats as _ast
    from minhash_ray.pipelines.audio import audio_energy_stats as _aes
    from minhash_ray.pipelines.audio import transcript_rate_flags as _rate_flags
    from minhash_ray.pipelines.audio import audio_semantic_dedup as _asd
    from minhash_ray.pipelines.multimodal import audio_chunk_plan as _chunk_plan
    from minhash_ray.pipelines.dedup import run_dedup_tiered as _rdt

    def _audio_stats(_sf):
        return _ast(read_clips(clips_path, columns=["codec", "sr_hz", "dur_ms", "bytes"]))

    def _audio_exact_dedup(_sf):
        return _aed(read_clips(clips_path, columns=["clip_id", "bytes"]))

    def _clips_dedup_tiered(_sf):
        return _rdt(read_clips(clips_path), cfg, num_partitions=max(8, NCPUS))

    queries: dict = {}
    queries_runs: dict = {}
    for name, fn in (
        ("minhash_dup_pairs_docs", dedup_text.minhash_dup_pairs),
        ("exact_dedup_docs", dedup_text.exact_dedup),
        ("ngram_jaccard_pairs", dedup_text.ngram_jaccard_pairs),
        ("doc_dedup_tiered", dedup_text.doc_dedup_tiered),
        ("doc_minhash_slots", dedup_text.doc_minhash_slots),
        ("token_counts", text.token_counts),
        ("text_quality", text.text_quality),
        ("ann_topk", ann.ann_topk),
        ("ann_topk_ivf", ann.ann_topk_ivf),
        ("embedding_pairs_exact", ann.embedding_pairs_exact),
        ("lineitem_agg", relational.lineitem_agg),
        ("orders_by_segment", relational.orders_by_segment),
        ("events_by_type", relational.events_by_type),
        ("window_counts", events.window_counts),
        ("window_top_events", events.window_top_events),
        ("sessionize", events.sessionize),
        ("session_stats", events.session_stats),
        ("asof_prior", events.asof_prior),
        ("simhash_dup_pairs", dedup_text.simhash_dup_pairs),
        ("bbit_minhash_pairs", dedup_text.bbit_minhash_pairs),
        ("oph_minhash_slots", dedup_text.oph_minhash_slots),
        ("oph_dense_slots", dedup_text.oph_dense_slots),
        ("oph_dup_pairs", dedup_text.oph_dup_pairs),
        ("token_quantiles", text.token_quantiles),
        ("corpus_curation", curation.corpus_curation),
        # round-4 operators
        ("decontaminate", dedup_text.decontaminate),
        ("term_doc_freq", text.term_doc_freq),
        ("stratified_sample_docs", text.stratified_sample_docs),
        ("mixture_sample", text.mixture_sample),
        ("word_counts", text.word_counts),
        ("bpe_train", text.bpe_train),
        ("scrub_terms", text.scrub_terms),
        ("lang_token_quantiles", text.lang_token_quantiles),
        ("distinct_users_per_type", events.distinct_users_per_type),
        ("approx_distinct_users_per_type", events.approx_distinct_users_per_type),
        ("approx_value_quantiles", events.approx_value_quantiles),
        ("customers_without_orders", relational.customers_without_orders),
        ("top_orders_per_customer", relational.top_orders_per_customer),
        ("sliding_window_counts", events.sliding_window_counts),
        ("range_join_recent", events.range_join_recent),
        ("salient_terms", text.salient_terms),
        ("weighted_jaccard_pairs", dedup_text.weighted_jaccard_pairs),
        ("frequent_terms", text.frequent_terms),
        ("semantic_dedup", ann.semantic_dedup),
        ("doc_repetition", text.doc_repetition),
        ("chunk_dedup_docs", dedup_text.chunk_dedup_docs),
        ("containment_pairs", dedup_text.containment_pairs),
        ("token_percent_rank", text.token_percent_rank),
        ("near_dup_vs_reference", dedup_text.near_dup_vs_reference),
        ("winnowing_fingerprints", dedup_text.winnowing_fingerprints),
        ("pack_sequences", text.pack_sequences),
        ("revenue_rollup", relational.revenue_rollup),
        ("training_manifest", curation.training_manifest),
        ("event_type_transitions", events.event_type_transitions),
        ("winnowing_dup_pairs", dedup_text.winnowing_dup_pairs),
        ("funnel_counts", events.funnel_counts),
        ("doc_dedup_keep_best", dedup_text.doc_dedup_keep_best),
        ("scoped_dup_pairs", dedup_text.scoped_dup_pairs),
        ("snm_dup_pairs", dedup_text.snm_dup_pairs),
        ("dedup_cluster_sizes", dedup_text.dedup_cluster_sizes),
        ("nation_segment_balance", relational.nation_segment_balance),
        ("lang_confusion", text.lang_confusion),
        ("repeated_ngram_scrub", dedup_text.repeated_ngram_scrub),
        ("bloom_decontaminate", dedup_text.bloom_decontaminate),
        ("tf_cosine_pairs", dedup_text.tf_cosine_pairs),
        ("cms_term_counts", text.cms_term_counts),
        ("repeated_ngram_dedup", dedup_text.repeated_ngram_dedup),
        ("chunk_documents", text.chunk_documents),
        ("bm25_topk", text.bm25_topk),
        ("global_shuffle_order", text.global_shuffle_order),
        ("token_bigram_counts", text.token_bigram_counts),
        ("cross_source_dups", dedup_text.cross_source_dups),
        ("dup_graph_components", dedup_text.dup_graph_components),
        ("dup_knn_graph", dedup_text.dup_knn_graph),
        ("curation_report", curation.curation_report),
        ("kmeans_train", ann.kmeans_train),
        ("bigram_familiarity", text.bigram_familiarity),
        ("retention_cohorts", events.retention_cohorts),
        ("dup_graph_triangles", dedup_text.dup_graph_triangles),
        ("value_outliers", events.value_outliers),
        ("interarrival_stats", events.interarrival_stats),
        ("cumulative_user_value", events.cumulative_user_value),
        ("props_field_stats", events.props_field_stats),
        ("segment_priority_cube", relational.segment_priority_cube),
        ("shipping_priority", relational.shipping_priority),
        ("length_gate_docs", text.length_gate_docs),
        ("gopher_quality_gate", text.gopher_quality_gate),
        ("posting_lists", text.posting_lists),
        ("weighted_sample_docs", text.weighted_sample_docs),
        ("ann_topk_pq", ann.ann_topk_pq),
        ("ann_topk_ivfpq", ann.ann_topk_ivfpq),
        ("lang_source_pivot", text.lang_source_pivot),
        ("value_histogram", events.value_histogram),
        ("type_cooccurrence", events.type_cooccurrence),
        ("latest_event_per_user", events.latest_event_per_user),
        ("trailing_value_sum", events.trailing_value_sum),
        ("user_event_paths", events.user_event_paths),
        ("local_supplier_volume", relational.local_supplier_volume),
        ("dup_graph_pagerank", dedup_text.dup_graph_pagerank),
        ("sliding_window_distinct_users", events.sliding_window_distinct_users),
        ("dedup_lines", text.dedup_lines),
        ("active_sessions_per_window", events.active_sessions_per_window),
        ("dup_spans", spans.dup_span_extract),
        ("dup_span_scrub", spans.dup_span_scrub),
        ("pii_scrub", text.pii_scrub),
        ("returned_item_revenue", relational.returned_item_revenue),
        ("large_volume_customers", relational.large_volume_customers),
        ("value_winsorize", events.value_winsorize),
        ("audio_dup_pairs", lambda _sf: _adp(read_clips(clips_path))),
        ("audio_phash_pairs", lambda _sf: _aphp(
            read_clips(clips_path, columns=["clip_id", "bytes", "codec"]))),
        ("audio_trim_plan", lambda _sf: _atp(
            read_clips(clips_path, columns=["clip_id", "bytes", "codec"]))),
        ("audio_containment_pairs", lambda _sf: _acp(
            read_clips(clips_path, columns=["clip_id", "sr_hz", "bytes"]))),
        ("audio_dup_regions", lambda _sf: _adr(
            read_clips(clips_path, columns=["clip_id", "sr_hz", "bytes"]))),
        ("clips_rate_outliers", lambda _sf: _rate_flags(read_clips(clips_path))),
        # SemDeDup-for-audio (assignments shape — pair emission is
        # quadratic on this tone-family-dense corpus, see audio.py)
        ("audio_semantic_dedup", lambda _sf: _asd(
            read_clips(clips_path,
                       columns=["clip_id", "bytes", "codec", "sr_hz"]))),
        ("audio_energy_stats", lambda _sf: _aes(
            read_clips(clips_path, columns=["clip_id", "bytes", "codec"]))),
        ("audio_stats", _audio_stats),
        ("audio_chunk_plan", lambda _sf: _chunk_plan(
            read_clips(clips_path, columns=["clip_id", "sr_hz", "bytes"]))),
        ("audio_exact_dedup", _audio_exact_dedup),
        ("clips_dedup_tiered", _clips_dedup_tiered),
    ):
        if os.environ.get("GRAFT_SKIP_QUERIES"):
            break
        queries[name], queries_runs[name] = timed2(fn)

    # --- input-rows sweep: the reference's ops-scaling protocol
    # (run_test_ops.sh:10 — NUM_OPS ∈ {10^4..10^7} at max threads) scaled
    # to the engine: same config, growing corpus, full pipeline each ---
    rows_sweep: dict = {}
    sweep_sizes = [
        int(x) for x in os.environ.get(
            "GRAFT_ROWS_SWEEP", "3000,30000,100000,300000,1000000").split(",") if x
    ]
    if sweep_sizes:
        # Each point runs in a FRESH subprocess (the --scaling legs'
        # protocol): after ~35 min of shared-session queries, lingering
        # object-store fragmentation slowed the in-session 1M point ~7%
        # vs a fresh run — the isolation the per-query timing note above
        # applies at corpus scale too.  Every point is a FULL corpus of
        # size n on the width-proportional fixture (pairs ∝ rows: the
        # fixed 5k-text pool made a 1M-row fixture ~200x-duplicated,
        # measuring degenerate dup density, not engine throughput — the
        # r3 scaling-bench lesson; >10k points are therefore NOT
        # comparable to the r4 fixed-pool limit(n) sweep, see
        # BASELINE.md), and reports mean±std + recall vs its own
        # planted truth.
        sweep_reps = int(os.environ.get("GRAFT_SWEEP_REPEATS", "5"))
        for n in sweep_sizes:
            # the >100k points run twice (the 1M point alone is
            # ~40 s/run — 2 runs still expose drift)
            reps = sweep_reps if n <= 100_000 else min(2, sweep_reps)
            # pre-generate outside the subprocess so a cold cache never
            # counts against the measured legs
            clips_dir_for(SF_DIR, n_rows=n, widen_texts=True)
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(NCPUS),
                GRAFT_SF_DIR=SF_DIR,
                GRAFT_CLIPS_ROWS=str(n),
                GRAFT_CLIPS_WIDEN="1",
                GRAFT_HEADLINE_ONLY="1",
                GRAFT_HEADLINE_REPEATS=str(reps),
            )
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, check=True,
            )
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            rows_sweep[str(n)] = {
                "sec": r["value"],
                "sec_std": r["value_std"],
                "runs": r["value_runs"],
                "clips": r["clips"],
                "clips_per_sec": r["clips_per_sec"],
                "recall_gated": r["recall_gated"],
                "stages": r["stages"],
            }

    # --- num_perm sweep: the reference's sketch-size sweep protocol
    # (run_tests_prob_sketch_size.sh:10 — {64..2048}) scaled to the engine:
    # same corpus subset, three sketch sizes, end-to-end sec each ---
    sweep: dict = {}
    sweep_rows = int(os.environ.get("GRAFT_SWEEP_ROWS", "10000"))
    for k in (64, 128, 256):
        kcfg = PipelineConfig(num_perm=k, bands=k // 4, rows_per_band=4)
        tk = time.time()
        kres = run_dedup(
            read_clips(clips_path).limit(sweep_rows), kcfg,
            num_partitions=max(8, NCPUS),
        )
        kn = kres.assignments.count()
        sweep[str(k)] = {
            "sec": round(time.time() - tk, 3),
            "clips": kn,
            "clips_per_sec": round(kn / (time.time() - tk), 1),
        }

    # --- batch-size sweep: the engine analog of the reference's
    # threshold-b sweep (run_test_threshold.sh:9 — b trades local
    # staleness vs contention; here batch_size trades per-batch overhead
    # vs pipelining granularity in the signature actor pool) ---
    batch_sweep: dict = {}
    for bsz in (0, 256, 1024, 4096):     # 0 = block granularity (read-fused)
        bcfg = PipelineConfig(batch_size=bsz)
        tb = time.time()
        bres = run_dedup(
            read_clips(clips_path).limit(sweep_rows), bcfg,
            num_partitions=max(8, NCPUS),
        )
        bn = bres.assignments.count()
        batch_sweep[str(bsz)] = {
            "sec": round(time.time() - tb, 3),
            "clips_per_sec": round(bn / (time.time() - tb), 1),
        }

    out = {
        "metric": "clips_dedup_e2e",
        "value": round(headline, 3),
        "value_std": round(headline_std, 3),
        "value_runs": [round(x, 3) for x in head_runs],
        "unit": "sec",
        "queries": queries,
        "queries_runs": queries_runs,
        "stages": stage_times,
        "stages_std": stage_times_std,
        "rows_sweep": rows_sweep,
        "sweep": sweep,
        "batch_sweep": batch_sweep,
        "sf": _sf_of(SF_DIR),
        "num_cpus": NCPUS,
        "clips": n_clips,
        "clips_per_sec": round(n_clips / headline, 1),
        "recall_gated": round(metrics["recall_gated"], 4),
        "precision": round(metrics["precision"], 4),
        "precision_loose": round(metrics.get("precision_loose", metrics["precision"]), 4),
        "edge_precision": round(metrics.get("edge_precision", -1.0), 4),
    }
    # attach the most recent committed --scaling result so the per-round
    # BENCH artifact carries the pooled pair efficiencies, not just
    # BASELINE.md prose (a --scaling run refreshes SCALING.json)
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.json")
    if os.path.exists(scaling_path):
        try:
            with open(scaling_path) as f:
                out["scaling"] = json.load(f)
        except Exception:
            pass
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """Same job, two parallelism levels, fresh processes (the sandbox
    substitute for N vs 4N Ray nodes; see BASELINE.md).

    Uses a larger clips table than the headline run (default 100k rows,
    override with GRAFT_SCALING_ROWS — BASELINE.md records 200k runs):
    at small inputs fixed per-stage latencies (driver pack build, shuffle
    barriers, actor spin-up — ~6 s of serial-equivalent regardless of CPU
    count, measured by Amdahl fit across the two legs) dominate and the
    comparison measures startup, not scaling.  Per-clip compute must stay
    dominant for the ratio to measure the ENGINE (at 100 TB the parallel
    fraction is ~100%; a small corpus UNDERSTATES large-cluster
    efficiency) — but the default stays at 100k so a default invocation
    finishes in ~6 minutes; see BASELINE.md for the 200k evidence.
    """
    scaling_rows = int(os.environ.get("GRAFT_SCALING_ROWS", "100000"))
    # realistic clip durations (avg ~3.6 s audio): the scaling measurement
    # must be dominated by per-clip compute, not per-stage latency
    dur = (1200, 6000)
    # pre-generate the clips cache so neither run pays synthesis.  The
    # scaling corpus is WIDTH-PROPORTIONAL (widen_texts: the transcript
    # pool grows with rows, so near-dup pairs ∝ rows) — a fixed 5k-text
    # pool under 200k rows grew the verified-pair workload superlinearly
    # and punished the gather-bound verify stage for fixture skew, not
    # engine behavior (VERDICT r3).
    from minhash_ray.sources.synth import clips_dir_for

    clips_dir_for(SF_DIR, n_rows=scaling_rows, dur_range=dur, widen_texts=True)

    def one(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SF_DIR=SF_DIR,
            GRAFT_CLIPS_ROWS=str(scaling_rows),
            GRAFT_CLIPS_DUR="1200,6000",
            GRAFT_CLIPS_WIDEN="1",
            GRAFT_HEADLINE_ONLY="1",
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    # default pair 2→8.  Two constraints bound the usable window on one
    # shared-memory box (see BASELINE.md scaling notes): num_cpus=32
    # oversubscribes (Ray's own threads contend with workers), and ≥14
    # concurrent workers saturate the box's ~19 GB/s aggregate DRAM
    # bandwidth (measured), so a 16-CPU leg measures the memory bus, not
    # the engine — a real 4-node cluster brings 4x the bandwidth.  2→8
    # stays inside the near-linear bandwidth region (3.4→13+ GB/s).
    pair = os.environ.get("GRAFT_SCALING_CPUS", "2,8").split(",")
    lo_n, hi_n = int(pair[0]), int(pair[1])
    # the box's wall times drift ±20-50% on multi-minute timescales
    # (virtualized host), so a best-of-N *per leg* can pair a lucky low leg
    # with an unlucky high leg and report noise.  Instead the legs are
    # INTERLEAVED (lo, hi, lo, hi, ...) so each adjacent pair shares host
    # conditions, and the reported value is the MEDIAN of per-pair
    # efficiencies.
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))
    runs = [(one(lo_n), one(hi_n)) for _ in range(repeats)]
    effs = [
        (hi["clips_per_sec"] / lo["clips_per_sec"]) / (hi_n / lo_n)
        for lo, hi in runs
    ]                                   # run order preserved for diagnosis
    s = sorted(effs)
    med = s[len(s) // 2] if repeats % 2 else 0.5 * (
        s[repeats // 2 - 1] + s[repeats // 2]
    )
    lo_best = min((lo for lo, _ in runs), key=lambda r: r["value"])
    hi_best = min((hi for _, hi in runs), key=lambda r: r["value"])
    # the pair closest to the median, for per-stage diagnosis of what
    # scaled and what didn't
    mi = min(range(repeats), key=lambda i: abs(effs[i] - med))
    return {
        "stages_lo": runs[mi][0].get("stages", {}),
        "stages_hi": runs[mi][1].get("stages", {}),
        "metric": "scaling_efficiency",
        "value": round(med, 3),
        "unit": "ratio",
        "sf": _sf_of(SF_DIR),
        "clips": lo_best["clips"],
        "cpus_lo": lo_n, "cpus_hi": hi_n,
        "sec_lo": lo_best["value"], "sec_hi": hi_best["value"],
        "clips_per_sec_lo": lo_best["clips_per_sec"],
        "clips_per_sec_hi": hi_best["clips_per_sec"],
        "speedup": round(hi_best["clips_per_sec"] / lo_best["clips_per_sec"], 2),
        "pair_efficiencies": [round(e, 3) for e in effs],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        result = run_scaling()
        # persist for run_bench to embed in the per-round BENCH artifact
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.json"), "w"
        ) as f:
            json.dump(result, f, indent=1)
        print(json.dumps(result))
    else:
        print(json.dumps(run_bench()))

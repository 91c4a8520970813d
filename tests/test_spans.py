"""ExactSubstr dup-span operators (pipelines/spans.py): planted-truth
extraction + scrub, rolling-hash kernel parity, partition invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _pdf(res):
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _write_docs(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_rolling_hashes_match_direct_poly():
    """O(n) prefix-product hashes == the direct O(L*n) polynomial, and
    equal windows hash equal across row boundaries."""
    from minhash_ray.functions.shingles import _segmented_arange
    from minhash_ray.pipelines.spans import _B1, _B2, rolling_window_hashes
    from minhash_ray.stages.banding import splitmix64

    rng = np.random.default_rng(7)
    rows = [rng.integers(0, 256, size=n, dtype=np.uint8) for n in (0, 3, 40, 17, 64)]
    flat = np.concatenate([r for r in rows if len(r)]).astype(np.uint8)
    offs = np.concatenate([[0], np.cumsum([len(r) for r in rows])]).astype(np.int64)
    L = 8
    h1, h2, starts, wc = rolling_window_hashes(flat, offs, L)
    assert wc.tolist() == [0, 0, 33, 10, 57]
    s = flat.astype(np.uint64) + np.uint64(1)
    for B, h in ((_B1, h1), (_B2, h2)):
        direct = np.zeros(len(starts), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(L):
                direct = direct * B + s[starts + j]
        assert np.array_equal(splitmix64(direct), h)
    # same window content -> same hash, regardless of position
    flat2 = np.concatenate([flat[:16], flat[:16]])
    offs2 = np.array([0, 16, 32], dtype=np.int64)
    a1, a2, _, _ = rolling_window_hashes(flat2, offs2, L)
    assert np.array_equal(a1[:9], a1[9:]) and np.array_equal(a2[:9], a2[9:])


def test_dup_spans_planted(ray_session, tmp_path):
    """Known shared strings at known offsets: spans come out exactly,
    including an intra-doc repeat and window-merge into maximal spans."""
    shared = "the quick brown fox jumps over the lazy dog!"  # 44 chars
    texts = [
        "aaaa" + shared + "bbbbbbbbbbbb",                    # span at [4, 48)
        "cccccccccc" + shared + "dd",                        # span at [10, 54)
        "unique text with nothing repeated anywhere here 0",  # no span
        "xx" + shared + "yy" + shared,                       # two spans, one doc
    ]
    d = _write_docs(tmp_path, texts)
    from minhash_ray.pipelines.spans import dup_span_extract

    L = 24
    df = (
        _pdf(dup_span_extract(d, L=L))
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    got = list(map(tuple, df[["doc_id", "span_start", "span_end"]].values))
    assert (0, 4, 4 + 44) in got
    assert (1, 10, 10 + 44) in got
    assert all(r[0] != 2 for r in got)
    # doc 3: shared at [2, 46) and [48, 92) — dup window starts 2..22
    # then 48..68; the 26-start gap > L, so two separate maximal spans
    d3 = [r for r in got if r[0] == 3]
    assert d3 == [(3, 2, 46), (3, 48, 92)]


def test_dup_span_scrub_planted(ray_session, tmp_path):
    shared = "the quick brown fox jumps over the lazy dog!"
    texts = [
        "aaaa" + shared + "bbbbbbbbbbbb",
        "cccccccccc" + shared + "dd",
        "unique text with nothing repeated anywhere here 0",
    ]
    d = _write_docs(tmp_path, texts)
    from minhash_ray.pipelines.spans import dup_span_scrub

    df = _pdf(dup_span_scrub(d, L=24)).set_index("doc_id").sort_index()
    assert df.loc[0, "clean_text"] == "aaaa" + "bbbbbbbbbbbb"
    assert df.loc[1, "clean_text"] == "cccccccccc" + "dd"
    assert df.loc[2, "clean_text"] == texts[2]
    assert df.loc[2, "n_spans"] == 0 and df.loc[2, "n_dup_chars"] == 0
    assert df.loc[0, "n_spans"] == 1 and df.loc[0, "n_dup_chars"] == 44
    # invariant: no L-gram survives twice after the scrub
    L = 24
    grams = {}
    for doc, txt in df["clean_text"].items():
        for p in range(len(txt) - L + 1):
            g = txt[p : p + L]
            assert g not in grams, (doc, grams[g], g)
            grams[g] = doc


def test_dup_spans_partition_invariance(ray_session, sf_dir):
    from minhash_ray.pipelines.spans import dup_span_extract

    a = (
        _pdf(dup_span_extract(sf_dir, num_partitions=2))
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    b = (
        _pdf(dup_span_extract(sf_dir, num_partitions=8))
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_dup_spans_short_and_empty_docs(ray_session, tmp_path):
    """Docs shorter than L (including empty) produce no windows and pass
    through the scrub untouched."""
    texts = ["", "tiny", "x" * 23, "y" * 60, "z" + "y" * 60]
    d = _write_docs(tmp_path, texts)
    from minhash_ray.pipelines.spans import dup_span_extract, dup_span_scrub

    spans = _pdf(dup_span_extract(d, L=24))
    assert set(spans.doc_id) == {3, 4}          # the shared y-run only
    df = _pdf(dup_span_scrub(d, L=24)).set_index("doc_id").sort_index()
    for i in (0, 1, 2):
        assert df.loc[i, "clean_text"] == texts[i]
        assert df.loc[i, "n_spans"] == 0


def test_pii_scrub_planted(ray_session, tmp_path):
    """Planted emails/phones/IPs: typed tokens, sequenced counts, and
    untouched clean docs."""
    texts = [
        "reach john.doe+x@example.co.uk or +1 415-555-2671 today",
        "host 10.0.0.1 backup 8.8.8.8 admin a@b.io",
        "nothing sensitive here",
        "double e1@x.com e2@y.org and run 12345678901",
    ]
    d = _write_docs(tmp_path, texts)
    from minhash_ray.pipelines.text import pii_scrub

    df = _pdf(pii_scrub(d)).set_index("doc_id").sort_index()
    assert df.loc[0, "text_redacted"] == "reach <EMAIL> or <PHONE> today"
    assert df.loc[0, "n_emails"] == 1 and df.loc[0, "n_phones"] == 1
    assert df.loc[1, "text_redacted"] == "host <IP> backup <IP> admin <EMAIL>"
    assert df.loc[1, "n_ips"] == 2 and df.loc[1, "n_emails"] == 1
    assert df.loc[2, "text_redacted"] == texts[2]
    assert int(df.loc[2, ["n_emails", "n_phones", "n_ips"]].sum()) == 0
    assert df.loc[3, "n_emails"] == 2 and df.loc[3, "n_phones"] == 1
    # oracle agreement on the planted fixture (testdata has no PII, so the
    # parametrized sf0.001 check alone never exercises a redaction)
    import duckdb

    import __ray_entry__ as E

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    odf = con.execute(E.oracle_sql()["pii_scrub"]).fetchdf()
    eng = df.reset_index()
    odf = odf.sort_values("doc_id").reset_index(drop=True)
    eng = eng[list(odf.columns)]
    assert eng.equals(odf)


def test_audio_embedding_dup_pairs_planted(ray_session, tmp_path):
    """SemDeDup-for-audio: exact and gain-scaled copies pair at high
    cosine; unrelated clips don't; non-decodable codecs are dropped."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from minhash_ray.functions.audio import encode_pcm, synth_waveform
    from minhash_ray.pipelines.audio import audio_embedding_dup_pairs

    rng = np.random.default_rng(11)
    sr = 16000
    ids, payloads, codecs = [], [], []

    def add(cid, wave, codec="pcm_s16le"):
        ids.append(cid)
        payloads.append(encode_pcm(wave))
        codecs.append(codec)

    base = [synth_waveform(rng, sr, 900) for _ in range(6)]
    for i, w in enumerate(base):
        add(f"clip_{i}", w)
    add("copy_of_0", base[0])               # byte-identical copy
    add("gain_of_1", base[1] * 0.5)         # re-gained copy
    add("ext", base[2], codec="mp3")        # dropped (no decoder)

    t = pa.table(
        {
            "clip_id": pa.array(ids, pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
            "sr_hz": pa.array([sr] * len(ids), pa.int32()),
            "dur_ms": pa.array(
                [len(p) // 2 * 1000 // sr for p in payloads], pa.int32()
            ),
            "codec": pa.array(codecs, pa.string()),
            "transcript": pa.array(["x"] * len(ids), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "clips.parquet"))
    clips = rd.read_parquet(str(tmp_path / "clips.parquet"))

    df = _pdf(audio_embedding_dup_pairs(clips, threshold=0.995))
    pairs = {(a, b) for a, b in zip(df.clip_id_a, df.clip_id_b)}
    assert ("clip_0", "copy_of_0") in pairs
    assert ("clip_1", "gain_of_1") in pairs
    assert all("ext" not in p for pair in pairs for p in pair)
    # ordering + cosine sanity
    assert (df.clip_id_a < df.clip_id_b).all()
    assert (df.cos >= 0.995).all()


def test_audio_semantic_dedup_planted(ray_session, tmp_path):
    """SemDeDup-for-audio assignments: copies cluster together under one
    min-id representative; distinct clips keep themselves."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from minhash_ray.functions.audio import encode_pcm, synth_waveform
    from minhash_ray.pipelines.audio import audio_semantic_dedup

    rng = np.random.default_rng(23)
    sr = 16000
    ids, payloads = [], []

    def add(cid, wave):
        ids.append(cid)
        payloads.append(encode_pcm(wave))

    base = [synth_waveform(rng, sr, 900) for _ in range(5)]
    for i, w in enumerate(base):
        add(f"clip_{i}", w)
    add("copy_of_0", base[0])
    add("gain_of_0", base[0] * 0.25)

    t = pa.table(
        {
            "clip_id": pa.array(ids, pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
            "sr_hz": pa.array([sr] * len(ids), pa.int32()),
            "dur_ms": pa.array(
                [len(p) // 2 * 1000 // sr for p in payloads], pa.int32()
            ),
            "codec": pa.array(["pcm_s16le"] * len(ids), pa.string()),
            "transcript": pa.array(["x"] * len(ids), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "clips.parquet"))
    clips = rd.read_parquet(str(tmp_path / "clips.parquet"))

    df = (
        _pdf(audio_semantic_dedup(clips, threshold=0.995, n_centroids=2))
        .set_index("clip_id")
        .sort_index()
    )
    assert len(df) == 7
    # the three copies of base[0] share one cluster; exactly one kept
    trio = df.loc[["clip_0", "copy_of_0", "gain_of_0"]]
    assert trio.cluster_id_clip.nunique() == 1
    assert int(trio.keep.sum()) == 1
    # distinct clips are their own kept representative
    for cid in ("clip_1", "clip_2", "clip_3", "clip_4"):
        assert df.loc[cid, "keep"] == 1
    assert int(df.keep.sum()) == 5


def test_modality_agreement_matches_planted_kinds(ray_session, small_fixture):
    """Cross-modal edge classification vs planted construction
    (tools/make_fixtures.py): near_transcript pairs share BYTE-IDENTICAL
    audio (only text edited) so they must carry audio evidence;
    near_audio pairs share IDENTICAL transcripts (only audio perturbed)
    so they must carry text evidence; exact pairs carry both."""
    import pyarrow.parquet as pq

    from minhash_ray.config import PipelineConfig
    from minhash_ray.pipelines.dedup import modality_agreement, run_dedup
    from minhash_ray.sources.clips import read_clips

    res = run_dedup(
        read_clips(str(small_fixture / "clips.parquet")),
        PipelineConfig(),
        num_partitions=4,
    )
    df = _pdf(modality_agreement(res.edges))
    cls = {
        (a, b): (int(t), int(au))
        for a, b, t, au in zip(df.clip_id_a, df.clip_id_b, df.text_dup, df.audio_dup)
    }
    truth = pq.read_table(str(small_fixture / "truth_pairs.parquet")).to_pandas()
    stats = {"near_transcript": [0, 0], "near_audio": [0, 0], "exact": [0, 0]}
    for a, b, kind in zip(truth.clip_id_a, truth.clip_id_b, truth.kind):
        if kind not in stats:
            continue
        key = (a, b) if a < b else (b, a)
        got = cls.get(key)
        if got is None:
            continue                      # recall is asserted elsewhere
        t, au = got
        ok = {
            "near_transcript": au == 1,   # audio bytes identical
            "near_audio": t == 1,         # transcript identical
            "exact": t == 1 and au == 1,
        }[kind]
        stats[kind][0] += int(ok)
        stats[kind][1] += 1
    for kind, (ok, n) in stats.items():
        assert n > 0, f"no {kind} edges recovered"
        assert ok / n >= 0.95, (kind, ok, n)
    assert set(df.modality.unique()) <= {
        "both", "text_only", "audio_only", "estimator_only"
    }


def test_dup_spans_duplicate_free_corpus(ray_session, tmp_path):
    """A corpus with NO duplicated L-gram anywhere: empty span table with
    the full schema, and a scrub that passes every doc through unchanged
    (regression: the all-empty candidate fold produced a schema-less
    block that poisoned the join's key resolution)."""
    texts = [
        "completely unique first document text here zero overlap",
        "another one with different words entirely for sure now",
        "third doc also unlike anything else in this tiny corpus",
    ]
    d = _write_docs(tmp_path, texts)
    from minhash_ray.pipelines.spans import dup_span_extract, dup_span_scrub

    sp_ds = dup_span_extract(d)
    assert sp_ds.schema().names == ["doc_id", "span_start", "span_end", "span_len"]
    assert sp_ds.count() == 0
    sc = _pdf(dup_span_scrub(d)).set_index("doc_id").sort_index()
    for i, txt in enumerate(texts):
        assert sc.loc[i, "clean_text"] == txt
    assert int(sc.n_spans.sum()) == 0 and int(sc.n_dup_chars.sum()) == 0


def test_audio_embedding_ops_no_decodable_clips(ray_session, tmp_path):
    """All-external-codec corpus: both embedding ops return typed empty
    results instead of throwing on the empty embeddings table."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from minhash_ray.pipelines.audio import (
        audio_embedding_dup_pairs,
        audio_semantic_dedup,
    )

    t = pa.table(
        {
            "clip_id": pa.array(["a", "b"], pa.string()),
            "bytes": pa.array([b"xx", b"yy"], pa.binary()),
            "sr_hz": pa.array([16000] * 2, pa.int32()),
            "dur_ms": pa.array([100] * 2, pa.int32()),
            "codec": pa.array(["opus", "mp3"], pa.string()),
            "transcript": pa.array(["x", "y"], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "clips.parquet"))
    clips = rd.read_parquet(str(tmp_path / "clips.parquet"))
    sd = audio_semantic_dedup(clips)
    assert sd.schema().names == ["clip_id", "cluster_id_clip", "keep"]
    assert sd.count() == 0
    pr = audio_embedding_dup_pairs(clips)
    assert pr.schema().names == ["clip_id_a", "clip_id_b", "cos"]
    assert pr.count() == 0


def _brute_dup_spans(texts, L):
    """O(n^2)-ish reference: every L-gram occurring >= 2 times, merged
    into per-doc maximal islands (window starts chain while gap <= L)."""
    from collections import Counter

    grams = Counter()
    for txt in texts:
        b = txt.encode("utf-8")
        for p in range(len(b) - L + 1):
            grams[b[p : p + L]] += 1
    spans = []
    for doc_id, txt in enumerate(texts):
        b = txt.encode("utf-8")
        ps = [p for p in range(len(b) - L + 1) if grams[b[p : p + L]] >= 2]
        if not ps:
            continue
        start = prev = ps[0]
        for p in ps[1:]:
            if p - prev > L:
                spans.append((doc_id, start, prev + L))
                start = p
            prev = p
        spans.append((doc_id, start, prev + L))
    return sorted(spans)


def test_dup_spans_matches_bruteforce_random(ray_session, tmp_path):
    """Differential fuzz: the distributed pipeline == the brute-force
    reference on seeded random corpora with planted repeats (covers
    candidate detection, exact verify, island merge, all partitionings)."""
    import numpy as np

    rng = np.random.default_rng(99)
    L = 12
    alphabet = list("abcdef ")
    for trial in range(4):
        n_docs = int(rng.integers(4, 10))
        texts = []
        for _ in range(n_docs):
            n = int(rng.integers(0, 80))
            texts.append("".join(rng.choice(alphabet, size=n)))
        # plant a shared fragment into a random subset
        frag = "".join(rng.choice(alphabet, size=int(rng.integers(L, 3 * L))))
        for i in rng.choice(n_docs, size=min(3, n_docs), replace=False):
            pos = int(rng.integers(0, max(1, len(texts[i]))))
            texts[i] = texts[i][:pos] + frag + texts[i][pos:]
        d = tmp_path / f"t{trial}"
        d.mkdir()
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        import pyarrow.parquet as pq

        pq.write_table(t, str(d / "documents.parquet"))
        from minhash_ray.pipelines.spans import dup_span_extract

        df = _pdf(dup_span_extract(str(d), L=L, num_partitions=3))
        got = sorted(
            (int(a), int(b), int(c))
            for a, b, c in zip(df.doc_id, df.span_start, df.span_end)
        )
        assert got == _brute_dup_spans(texts, L), (trial, texts)


def test_audio_embedding_malformed_sr_rows_drop(ray_session, tmp_path):
    """sr_hz <= 0 or too small for one spectral band: the row drops like
    a codec poison row instead of crashing the batch (regression:
    reduceat index out of bounds at frame_len <= 5)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from minhash_ray.functions.audio import encode_pcm, synth_waveform
    from minhash_ray.pipelines.audio import audio_semantic_dedup

    rng = np.random.default_rng(3)
    w = synth_waveform(rng, 16000, 600)
    t = pa.table(
        {
            "clip_id": pa.array(["good1", "good2", "tiny_sr", "neg_sr"], pa.string()),
            "bytes": pa.array([encode_pcm(w)] * 4, pa.binary()),
            "sr_hz": pa.array([16000, 16000, 16, -8000], pa.int32()),
            "dur_ms": pa.array([600] * 4, pa.int32()),
            "codec": pa.array(["pcm_s16le"] * 4, pa.string()),
            "transcript": pa.array(["x"] * 4, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "clips.parquet"))
    df = _pdf(
        audio_semantic_dedup(
            rd.read_parquet(str(tmp_path / "clips.parquet")), threshold=0.995
        )
    )
    assert sorted(df.clip_id) == ["good1", "good2"]


def test_keep_best_assignments_planted(ray_session, tmp_path):
    """Unit semantics over synthetic assignments + clips: keep_best is
    the largest payload (tie min clip_id), keep_first the min clip_id,
    singletons keep themselves on both policies."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from minhash_ray.pipelines.dedup import keep_best_assignments

    assigns = pa.table(
        {
            "clip_id": pa.array(["a", "b", "c", "d", "e", "f"], pa.string()),
            "cluster_id": pa.array(["a", "a", "a", "d", "d", "f"], pa.string()),
        }
    )
    clips = pa.table(
        {
            "clip_id": pa.array(["a", "b", "c", "d", "e", "f"], pa.string()),
            # cluster a: c biggest; cluster d: tie -> min id d; f singleton
            "bytes": pa.array(
                [b"x" * 10, b"x" * 30, b"x" * 40, b"x" * 20, b"x" * 20, b"x"],
                pa.binary(),
            ),
        }
    )
    df = (
        keep_best_assignments(
            rd.from_arrow(assigns), rd.from_arrow(clips), num_partitions=3
        )
        .to_pandas()
        .set_index("clip_id")
        .sort_index()
    )
    assert df.keep_first.to_dict() == {"a": 1, "b": 0, "c": 0, "d": 1, "e": 0, "f": 1}
    assert df.keep_best.to_dict() == {"a": 0, "b": 0, "c": 1, "d": 1, "e": 0, "f": 1}
    # exactly one of each flag per cluster
    g = df.groupby("cluster_id")[["keep_first", "keep_best"]].sum()
    assert (g == 1).all().all()

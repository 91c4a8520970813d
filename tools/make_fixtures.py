"""Deterministic synthetic clips-table generator with planted duplicates.

Implements FIXTURES.md: an audio-clip + transcript table shaped exactly per
``BASELINE.json.input_hint`` —
``(clip_id string, bytes binary, sr_hz int32, dur_ms int32, codec string,
transcript string)`` — plus a ``truth_pairs`` table carrying the planted
ground-truth duplicate pairs and their true shingle-set Jaccard.

Structure (seeded, no external data):
  * ~70% singleton clips (unique transcript + unique audio),
  * ~20% near-duplicate clusters of size 2-8 (seeded token edits on the
    transcript, gain/noise/pad-trim perturbation of the audio at SNR>=30dB),
  * ~10% exact duplicates (byte-identical transcript+audio, new clip_id),
  * adversarial empty/1-token transcripts (zero-shingle edge: all-INFTY
    signatures must not cross-match; reference INFTY init semantics at
    src/configuration/configuration.c:143-148),
  * one hot boilerplate group (identical transcript, unrelated audio) to
    exercise hot-band skew handling.

Usable as a library (``generate_clips``) and as a CLI.
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minhash_ray.config import PipelineConfig
from minhash_ray.functions.audio import encode_pcm, synth_waveform
from minhash_ray.oracle import oracle_token_shingles

CLIPS_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("dur_ms", pa.int32()),
        ("codec", pa.string()),
        ("transcript", pa.string()),
    ]
)

TRUTH_SCHEMA = pa.schema(
    [
        ("clip_id_a", pa.string()),
        ("clip_id_b", pa.string()),
        ("kind", pa.string()),
        ("jaccard_w", pa.float64()),
    ]
)

_SYLLABLES = [
    "ba", "ko", "ri", "ta", "zen", "mu", "lo", "pa", "shi", "ver",
    "dal", "nor", "eki", "tu", "san", "gre", "plo", "wis", "fen", "yar",
]


def _make_vocab(rng: np.random.Generator, size: int = 2000) -> list[str]:
    vocab = []
    seen = set()
    while len(vocab) < size:
        k = int(rng.integers(1, 4))
        word = "".join(_SYLLABLES[int(j)] for j in rng.integers(0, len(_SYLLABLES), k))
        word = f"{word}{int(rng.integers(0, 100)):02d}" if word in seen else word
        if word not in seen:
            seen.add(word)
            vocab.append(word)
    return vocab


def _base_transcript(rng, vocab, base_texts) -> str:
    n_tok = int(rng.integers(8, 121))
    if base_texts is not None:
        text = base_texts[int(rng.integers(0, len(base_texts)))]
        toks = text.lower().split()
        if len(toks) >= n_tok:
            start = int(rng.integers(0, len(toks) - n_tok + 1))
            return " ".join(toks[start : start + n_tok])
        if len(toks) >= 8:
            return " ".join(toks)
    return " ".join(vocab[int(i)] for i in rng.integers(0, len(vocab), n_tok))


def _edit_transcript(rng, text: str, vocab, rate: float) -> str:
    toks = text.split()
    out = []
    for t in toks:
        u = rng.random()
        if u < rate:                                   # substitute
            out.append(vocab[int(rng.integers(0, len(vocab)))])
        elif u < rate * 1.5:                           # delete
            continue
        else:
            out.append(t)
        if rng.random() < rate * 0.5:                  # insert after
            out.append(vocab[int(rng.integers(0, len(vocab)))])
    return " ".join(out) if out else text


def _perturb_audio(rng, wave: np.ndarray) -> np.ndarray:
    """Gain change + fresh low noise + short pad/trim; SNR vs base >= 30 dB
    on the overlapping prefix."""
    gain = float(rng.uniform(0.988, 1.012))
    out = wave * gain + rng.normal(0.0, 0.0012, size=len(wave))
    edit = rng.random()
    if edit < 0.3 and len(out) > 400:                  # trim up to 1% from the end
        out = out[: len(out) - int(rng.integers(1, max(2, len(out) // 100)))]
    elif edit < 0.6:                                   # pad with noise floor
        pad = rng.normal(0.0, 0.002, size=int(rng.integers(1, max(2, len(out) // 100))))
        out = np.concatenate([out, pad])
    return np.clip(out, -1.0, 1.0)


def generate_clips(
    n_rows: int,
    seed: int = 42,
    base_texts: list[str] | None = None,
    dur_range: tuple[int, int] = (500, 5000),
    cfg: PipelineConfig | None = None,
    widen_texts: bool = False,
    id_offset: int = 0,
) -> tuple[pa.Table, pa.Table]:
    """Generate (clips, truth_pairs) deterministically.

    ``base_texts``: optional realistic text source (e.g. the driver testdata
    ``documents.text`` column); transcripts are windowed from it when long
    enough, otherwise drawn from the seeded synthetic vocabulary.

    ``widen_texts``: extend the base-text pool with deterministic synthetic
    texts until expected reuse is ~2 rows/text.  A FIXED pool under a
    growing ``n_rows`` makes accidental same-source near-dup pairs grow
    superlinearly (two windows of the same doc overlap), so a 200k corpus
    measures a pair workload a width-proportional corpus never has —
    the scaling bench uses this so pairs ∝ rows.

    ``id_offset``: shifts the generated clip ids (``clip_{i+offset:08d}``)
    so shard-wise generation of one large corpus
    (:func:`minhash_ray.sources.synth.clips_dir_for` at >100k rows, where
    the in-memory wave dict would not fit the driver) yields globally
    unique ids.
    """
    cfg = cfg or PipelineConfig()
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(rng)

    if widen_texts and base_texts:
        target_pool = max(len(base_texts), n_rows // 2)
        if target_pool > len(base_texts):
            base_texts = list(base_texts)
            for _ in range(target_pool - len(base_texts)):
                n_tok = int(rng.integers(60, 400))
                base_texts.append(
                    " ".join(vocab[int(i)] for i in rng.integers(0, len(vocab), n_tok))
                )

    rows: list[dict] = []          # {"transcript","wave_key","sr","dur"}
    waves: dict[int, np.ndarray] = {}
    clusters: list[tuple[str, list[int]]] = []   # (kind, [row indices])
    next_wave = itertools.count()

    def synth(sr, dur):
        key = next(next_wave)
        waves[key] = synth_waveform(rng, sr, dur)
        return key

    def draw_sr_dur():
        sr = 16000 if rng.random() < 0.9 else 8000
        dur = int(rng.integers(dur_range[0], dur_range[1] + 1))
        return sr, dur

    # adversarial zero/one-token rows (~2%)
    n_empty = max(2, int(0.02 * n_rows)) if n_rows >= 50 else 0
    for i in range(min(n_empty, n_rows - len(rows))):
        sr, dur = draw_sr_dur()
        text = "" if i % 2 == 0 else vocab[int(rng.integers(0, len(vocab)))]
        rows.append({"transcript": text, "wave": synth(sr, dur), "sr": sr, "dur": dur})

    # hot boilerplate group (~2%, capped at 200)
    n_hot = min(200, int(0.02 * n_rows)) if n_rows >= 500 else (12 if n_rows >= 100 else 0)
    if n_hot and len(rows) + n_hot <= n_rows:
        boiler = " ".join(vocab[int(i)] for i in rng.integers(0, len(vocab), 12))
        hot_idx = []
        for _ in range(n_hot):
            sr, dur = draw_sr_dur()
            hot_idx.append(len(rows))
            rows.append({"transcript": boiler, "wave": synth(sr, dur), "sr": sr, "dur": dur})
        clusters.append(("boilerplate", hot_idx))

    # main population
    while len(rows) < n_rows:
        u = rng.random()
        remaining = n_rows - len(rows)
        if u < 0.70 or remaining < 2:
            sr, dur = draw_sr_dur()
            rows.append(
                {"transcript": _base_transcript(rng, vocab, base_texts),
                 "wave": synth(sr, dur), "sr": sr, "dur": dur}
            )
        elif u < 0.90:
            size = int(min(rng.integers(2, 9), remaining))
            sr, dur = draw_sr_dur()
            base_text = _base_transcript(rng, vocab, base_texts)
            base_key = synth(sr, dur)
            idxs = [len(rows)]
            rows.append({"transcript": base_text, "wave": base_key, "sr": sr, "dur": dur})
            rate = float(rng.uniform(0.01, 0.08))
            for _ in range(size - 1):
                mode = rng.random()
                text = base_text
                wkey = base_key
                if mode < 0.4:                          # near_transcript
                    text = _edit_transcript(rng, base_text, vocab, rate)
                elif mode < 0.7:                        # near_audio
                    wkey = next(next_wave)
                    waves[wkey] = _perturb_audio(rng, waves[base_key])
                else:                                   # near_both
                    text = _edit_transcript(rng, base_text, vocab, rate)
                    wkey = next(next_wave)
                    waves[wkey] = _perturb_audio(rng, waves[base_key])
                idxs.append(len(rows))
                rows.append({"transcript": text, "wave": wkey, "sr": sr, "dur": dur})
            clusters.append(("near", idxs))
        else:
            # exact duplicate pair/triple: byte-identical transcript + audio
            size = int(min(rng.integers(2, 4), remaining))
            sr, dur = draw_sr_dur()
            text = _base_transcript(rng, vocab, base_texts)
            wkey = synth(sr, dur)
            idxs = []
            for _ in range(size):
                idxs.append(len(rows))
                rows.append({"transcript": text, "wave": wkey, "sr": sr, "dur": dur})
            clusters.append(("exact", idxs))

    # deterministic shuffle → clip ids by final position
    perm = rng.permutation(len(rows))
    pos_of = np.empty(len(rows), dtype=np.int64)
    pos_of[perm] = np.arange(len(rows))
    clip_ids = [f"clip_{i + id_offset:08d}" for i in range(len(rows))]

    # encode audio
    payloads = [b""] * len(rows)
    sr_col = np.empty(len(rows), dtype=np.int32)
    dur_col = np.empty(len(rows), dtype=np.int32)
    texts = [""] * len(rows)
    for old_idx, row in enumerate(rows):
        p = int(pos_of[old_idx])
        wave = waves[row["wave"]]
        payloads[p] = encode_pcm(wave)
        sr_col[p] = row["sr"]
        dur_col[p] = int(len(wave) * 1000 / row["sr"])
        texts[p] = row["transcript"]

    clips = pa.table(
        {
            "clip_id": pa.array(clip_ids, pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
            "sr_hz": pa.array(sr_col, pa.int32()),
            "dur_ms": pa.array(dur_col, pa.int32()),
            "codec": pa.array(["pcm_s16le"] * len(rows), pa.string()),
            "transcript": pa.array(texts, pa.string()),
        },
        schema=CLIPS_SCHEMA,
    )

    # truth pairs with memoized true shingle-set jaccard
    shingle_cache: dict[int, frozenset] = {}

    def shingles_of(old_idx: int) -> frozenset:
        if old_idx not in shingle_cache:
            shingle_cache[old_idx] = frozenset(
                oracle_token_shingles(rows[old_idx]["transcript"], cfg.shingle_w, cfg.seed)
            )
        return shingle_cache[old_idx]

    t_a, t_b, t_kind, t_j = [], [], [], []
    for kind, idxs in clusters:
        for x, y in itertools.combinations(idxs, 2):
            ra, rb = rows[x], rows[y]
            if kind == "exact" or (ra["transcript"] == rb["transcript"] and ra["wave"] == rb["wave"]):
                pkind, j = "exact", 1.0
            elif kind == "boilerplate":
                pkind, j = "boilerplate", 1.0
            else:
                same_text = ra["transcript"] == rb["transcript"]
                same_audio = ra["wave"] == rb["wave"]
                if same_text:
                    pkind = "near_audio"
                elif same_audio:
                    pkind = "near_transcript"
                else:
                    pkind = "near_both"
                if same_text:
                    j = 1.0
                else:
                    sa, sb = shingles_of(x), shingles_of(y)
                    union = sa | sb
                    j = (len(sa & sb) / len(union)) if union else 1.0
            ca, cb = clip_ids[pos_of[x]], clip_ids[pos_of[y]]
            if ca > cb:
                ca, cb = cb, ca
            t_a.append(ca)
            t_b.append(cb)
            t_kind.append(pkind)
            t_j.append(j)

    truth = pa.table(
        {
            "clip_id_a": pa.array(t_a, pa.string()),
            "clip_id_b": pa.array(t_b, pa.string()),
            "kind": pa.array(t_kind, pa.string()),
            "jaccard_w": pa.array(t_j, pa.float64()),
        },
        schema=TRUTH_SCHEMA,
    )
    return clips, truth


def write_fixtures(out_dir: str, n_rows: int, seed: int = 42, **kw) -> None:
    os.makedirs(out_dir, exist_ok=True)
    clips, truth = generate_clips(n_rows, seed=seed, **kw)
    # small row groups so ray.data.read_parquet can split the read into
    # many blocks (one giant row group = one block = no read parallelism)
    # `bytes` stored raw: the synthetic audio payload is incompressible and
    # snappy would be a pure decode tax on every scan (dict `compression=`
    # leaves unlisted columns uncompressed → list every column)
    pq.write_table(
        clips, os.path.join(out_dir, "clips.parquet"), row_group_size=1024,
        compression={"bytes": "NONE", "clip_id": "SNAPPY", "sr_hz": "SNAPPY",
                     "dur_ms": "SNAPPY", "codec": "SNAPPY", "transcript": "SNAPPY"},
    )
    pq.write_table(truth, os.path.join(out_dir, "truth_pairs.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--rows", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--dur-min", type=int, default=500)
    ap.add_argument("--dur-max", type=int, default=5000)
    args = ap.parse_args()
    if args.rows < 1:
        ap.error("--rows must be >= 1")
    write_fixtures(args.out, args.rows, seed=args.seed, dur_range=(args.dur_min, args.dur_max))
    print(f"wrote {args.rows} clips to {args.out}")


if __name__ == "__main__":
    main()

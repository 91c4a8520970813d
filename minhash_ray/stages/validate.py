"""Stage V — validate / normalize / project.

Stateless ``map_batches`` transform over zero-copy Arrow batches that:

* checks the input schema contract,
* decodes the audio payload (pcm_s16le; other codecs take the stub path
  with ``decode_ok = false``) and computes the 64-bit energy-delta audio
  fingerprint,
* computes the exact-duplicate content hash md5(transcript ++ 0x00 ++ bytes),
* **drops the audio payload** — everything downstream (shingling, banding,
  the LSH shuffle) moves ~100-byte rows, never the waveform.  This is the
  "keep the bytes column out of every shuffle" rule (SURVEY.md §7).

The reference has no equivalent stage (no I/O); the INFTY empty-sketch
semantics it mandates for empty inputs (src/configuration/configuration.c:143-148)
are preserved downstream by the signature stage.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from minhash_ray.functions.audio import (
    UnsupportedCodecError,
    byte_oph_signature,
    decode_pcm,
    energy_delta_fingerprint,
)


def validated_schema(audio_num_perm: int) -> pa.Schema:
    return pa.schema(
        [
            ("clip_id", pa.string()),
            ("transcript", pa.string()),
            ("content_hash", pa.string()),
            ("audio_fp", pa.uint64()),
            ("audio_sig", pa.list_(pa.uint64(), audio_num_perm)),
            ("n_samples", pa.int64()),
            ("decode_ok", pa.bool_()),
        ]
    )


def make_validate_fn(n_fp_frames: int = 64, audio_num_perm: int = 64,
                     audio_ngram: int = 4, seed: int = 42):
    """Returns the stage V batch function (closure over config only —
    stateless, runs as plain Ray tasks)."""
    schema = validated_schema(audio_num_perm)

    def validate_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch.column("bytes").to_pylist()
        codecs = batch.column("codec").to_pylist()
        transcripts = batch.column("transcript").to_pylist()

        audio_fp = np.zeros(n, dtype=np.uint64)
        audio_sig = np.empty((n, audio_num_perm), dtype=np.uint64)
        n_samples = np.zeros(n, dtype=np.int64)
        decode_ok = np.zeros(n, dtype=bool)
        content_hash = [""] * n
        for i in range(n):
            payload = payloads[i] or b""
            text = transcripts[i] or ""
            h = hashlib.md5()
            h.update(text.encode("utf-8"))
            h.update(b"\x00")
            h.update(payload)
            content_hash[i] = h.hexdigest()
            # byte-level channel works on the raw payload, codec-agnostic
            audio_sig[i] = byte_oph_signature(payload, audio_num_perm, audio_ngram, seed)
            try:
                wave = decode_pcm(payload, codecs[i])
                n_samples[i] = len(wave)
                audio_fp[i] = energy_delta_fingerprint(wave, n_fp_frames)
                decode_ok[i] = True
            except UnsupportedCodecError:
                # stub boundary: codec needs an external decoder; the row
                # still flows through the transcript + byte channels
                decode_ok[i] = False

        return pa.table(
            {
                "clip_id": batch.column("clip_id"),
                "transcript": batch.column("transcript"),
                "content_hash": pa.array(content_hash, pa.string()),
                "audio_fp": pa.array(audio_fp, pa.uint64()),
                "audio_sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(audio_sig.reshape(-1), pa.uint64()), audio_num_perm
                ),
                "n_samples": pa.array(n_samples, pa.int64()),
                "decode_ok": pa.array(decode_ok, pa.bool_()),
            },
            schema=schema,
        )

    return validate_batch

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as ``binary`` columns with typed
metadata (the clips table is the audio instance of this pattern).  The
decode / feature-extract / resize / frame-sample transforms are actor-pool
``map_batches`` stages whose **Ray-side plumbing is real and tested**
(schema, batching, actor state, output layout) while the codec itself is a
clearly-marked stub: the sandbox ships no image/video libraries, so
non-PCM payloads raise ``UnsupportedCodecError`` and are routed to an
error column instead of crashing the stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from minhash_ray.functions.audio import UnsupportedCodecError, decode_pcm

FRAME_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("frame_idx", pa.int32()),
        ("feature", pa.list_(pa.float32(), 8)),
        ("decode_error", pa.string()),
    ]
)


class AudioFrameFeatures:
    """Actor-pool stage: decode → frame → 8-dim per-frame feature vector
    (log-energy octave bands via rFFT).  Stub boundary: only pcm_s16le
    decodes here; other codecs emit a decode_error row."""

    def __init__(self, frame_ms: int = 250, max_frames: int = 16):
        self.frame_ms = frame_ms
        self.max_frames = max_frames

    def _features(self, wave: np.ndarray, sr: int) -> np.ndarray:
        frame_len = max(1, int(sr * self.frame_ms / 1000))
        n_frames = min(self.max_frames, max(1, len(wave) // frame_len))
        out = np.zeros((n_frames, 8), dtype=np.float32)
        for i in range(n_frames):
            seg = wave[i * frame_len : (i + 1) * frame_len]
            spec = np.abs(np.fft.rfft(seg)) ** 2
            # 8 octave-ish bands
            edges = np.unique(
                np.geomspace(1, max(2, len(spec) - 1), 9).astype(np.int64)
            )
            for b in range(min(8, len(edges) - 1)):
                out[i, b] = np.log1p(spec[edges[b] : edges[b + 1]].sum())
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, feats, errs = [], [], [], []
        payloads = batch.column("bytes").to_pylist()
        codecs = batch.column("codec").to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        for cid, payload, codec, sr in zip(
            batch.column("clip_id").to_pylist(), payloads, codecs, srs
        ):
            try:
                wave = decode_pcm(payload or b"", codec)
                f = self._features(wave, sr)
                for i in range(f.shape[0]):
                    ids.append(cid)
                    frames.append(i)
                    feats.append(f[i])
                    errs.append(None)
            except UnsupportedCodecError as e:
                ids.append(cid)
                frames.append(-1)
                feats.append(np.zeros(8, dtype=np.float32))
                errs.append(str(e))
        flat = np.concatenate(feats) if feats else np.zeros(0, dtype=np.float32)
        return pa.table(
            {
                "clip_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(np.array(frames, dtype=np.int32), pa.int32()),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat, pa.float32()), 8
                ),
                "decode_error": pa.array(errs, pa.string()),
            },
            schema=FRAME_SCHEMA,
        )


def audio_frame_features(clips_ds, frame_ms: int = 250, concurrency: int = 2):
    """clips → per-frame feature rows (actor pool; small batches because the
    payload column is wide)."""
    return clips_ds.map_batches(
        AudioFrameFeatures,
        fn_constructor_kwargs={"frame_ms": frame_ms},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def resample_stub(clips_ds, target_sr: int = 16000):
    """Rate-conversion stage: real plumbing, stub kernel (linear
    interpolation; a production build swaps in a polyphase resampler).

    Non-decodable codecs pass through unchanged with ``resample_error``
    set — one poison row must never abort the stream (same contract as
    ``AudioFrameFeatures``)."""

    def fn(batch: pa.Table) -> pa.Table:
        from minhash_ray.functions.audio import encode_pcm

        out, out_sr, errs = [], [], []
        for payload, codec, sr in zip(
            batch.column("bytes").to_pylist(),
            batch.column("codec").to_pylist(),
            batch.column("sr_hz").to_pylist(),
        ):
            try:
                wave = decode_pcm(payload or b"", codec)
            except UnsupportedCodecError as e:
                out.append(payload)
                out_sr.append(sr)
                errs.append(str(e))
                continue
            if sr != target_sr and len(wave) > 1:
                n_out = int(len(wave) * target_sr / sr)
                x_new = np.linspace(0.0, len(wave) - 1, n_out)
                wave = np.interp(x_new, np.arange(len(wave)), wave)
            out.append(encode_pcm(wave))
            out_sr.append(target_sr)
            errs.append(None)
        t = batch.set_column(
            batch.column_names.index("bytes"), "bytes", pa.array(out, pa.binary())
        )
        idx = t.column_names.index("sr_hz")
        t = t.set_column(
            idx, "sr_hz", pa.array(np.array(out_sr, dtype=np.int32), pa.int32())
        )
        return t.append_column("resample_error", pa.array(errs, pa.string()))

    return clips_ds.map_batches(fn, batch_format="pyarrow", batch_size=64)

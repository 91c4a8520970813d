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


def _chunk_geometry(batch: pa.Table, window_ms: int, hop_ms: int):
    """Per-row chunk geometry from the PAYLOAD (pcm_s16le: 2 bytes/sample,
    the source of truth — ``dur_ms`` is metadata and the fixture plants
    poison rows whose payload length disagrees with it)."""
    payload = batch.column("bytes")
    if isinstance(payload, pa.ChunkedArray):
        payload = payload.combine_chunks()
    import pyarrow.compute as pc

    n_bytes = pc.binary_length(payload).to_numpy(zero_copy_only=False).astype(np.int64)
    sr = batch.column("sr_hz").to_numpy().astype(np.int64)
    n_smp = n_bytes // 2
    win = (np.int64(window_ms) * sr) // 1000
    hop = (np.int64(hop_ms) * sr) // 1000
    win = np.maximum(win, 1)
    hop = np.maximum(hop, 1)
    n_chunks = (n_smp + hop - 1) // hop
    total = int(n_chunks.sum())
    if total == 0:
        return payload, n_chunks, *(np.zeros(0, dtype=np.int64),) * 4
    row = np.repeat(np.arange(len(sr), dtype=np.int64), n_chunks)
    base = np.zeros(len(sr), dtype=np.int64)
    base[1:] = np.cumsum(n_chunks)[:-1]
    k = np.arange(total, dtype=np.int64) - base[row]
    start = k * hop[row]
    end = np.minimum(start + win[row], n_smp[row])
    return payload, n_chunks, row, k, start, end


def audio_chunk_plan(clips_ds, window_ms: int = 250, hop_ms: int = 250):
    """(clip_id, chunk_idx, start_smp, end_smp): the fixed-duration chunk
    plan for every clip — windowed segmentation boundaries in samples,
    the metadata half of audio chunking (long-clip splitting for
    training-example packing, VAD windows, per-chunk fingerprints).

    Hop < window yields overlapping chunks; the final chunk is truncated
    at the payload end.  Sample counts come from the payload byte length
    (pcm_s16le), never from the declared ``dur_ms``, so poison rows get
    plans that match what a slicer can actually cut.  One streaming
    flat-map pass: per batch, a vectorized repeat/arange expansion — rows
    out ≈ rows in × chunks/clip, no shuffle."""

    def plan(batch: pa.Table) -> pa.Table:
        _, _, row, k, start, end = _chunk_geometry(batch, window_ms, hop_ms)
        ids = batch.column("clip_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "clip_id": ids.take(pa.array(row, pa.int64())),
                "chunk_idx": pa.array(k, pa.int64()),
                "start_smp": pa.array(start, pa.int64()),
                "end_smp": pa.array(end, pa.int64()),
            }
        )

    return clips_ds.map_batches(plan, batch_format="pyarrow")


def audio_chunk_bytes(clips_ds, window_ms: int = 250, hop_ms: int = 250):
    """(clip_id, chunk_idx, start_smp, end_smp, bytes): the chunk plan
    PLUS the actual payload slices — one vectorized gather builds every
    chunk's bytes from the batch's contiguous Arrow values buffer (a
    single fancy-indexed ``np.take`` over byte indices; no per-row Python
    slicing), so overlapping windows copy only what they emit.

    Memory contract: a batch's output is ≤ ceil(window/hop) × its input
    bytes; size ``batch_size`` accordingly for hop ≪ window."""

    def slice_chunks(batch: pa.Table) -> pa.Table:
        payload, _, row, k, start, end = _chunk_geometry(batch, window_ms, hop_ms)
        ids = batch.column("clip_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if len(row) == 0:
            return pa.table(
                {
                    "clip_id": pa.array([], pa.string()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "start_smp": pa.array([], pa.int64()),
                    "end_smp": pa.array([], pa.int64()),
                    "bytes": pa.array([], pa.large_binary()),
                }
            )
        buf = np.frombuffer(payload.buffers()[2], dtype=np.uint8)
        off_buf = np.frombuffer(payload.buffers()[1], dtype=np.int32)
        val_off = off_buf[payload.offset: payload.offset + len(payload) + 1].astype(
            np.int64
        )
        byte_start = val_off[:-1][row] + 2 * start
        byte_len = 2 * (end - start)
        out_off = np.zeros(len(row) + 1, dtype=np.int64)
        np.cumsum(byte_len, out=out_off[1:])
        idx = np.repeat(byte_start - out_off[:-1], byte_len) + np.arange(
            int(out_off[-1]), dtype=np.int64
        )
        values = np.ascontiguousarray(buf[idx])
        # int64 offsets (large_binary) unconditionally: a batch of chunk
        # payloads can exceed 2 GiB, and one branch-free schema keeps
        # every block identical
        chunks = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(),
            len(row),
            [None, pa.py_buffer(out_off), pa.py_buffer(values)],
        )
        return pa.table(
            {
                "clip_id": ids.take(pa.array(row, pa.int64())),
                "chunk_idx": pa.array(k, pa.int64()),
                "start_smp": pa.array(start, pa.int64()),
                "end_smp": pa.array(end, pa.int64()),
                "bytes": chunks,
            }
        )

    return clips_ds.map_batches(slice_chunks, batch_format="pyarrow")

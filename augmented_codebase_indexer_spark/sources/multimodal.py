"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is REAL (schemas, partition discipline, Arrow batch
shapes, UDF signatures); the codec calls are STUBBED because the sandbox has
no image/audio libraries — each stub either raises ``NotImplementedError``
(strict mode) or produces a deterministic fake derived from the bytes
(hermetic-test mode, the ``LocalEmbeddingClient`` philosophy,
``infrastructure/fakes.py:295-360``).

Schema convention for a multimodal asset table:
    asset_id string, url string, mime string, content binary,
    meta struct<width:int, height:int, duration_ms:int, sample_rate:int>

Scale notes: binary payloads dominate the row size → keep them OUT of every
shuffle (select early, join late); feature extraction is mapInPandas with
small Arrow batches (``spark.sql.execution.arrow.maxRecordsPerBatch`` low
for fat rows); outputs are fixed-dim float arrays that downstream ANN
(operators/ann.py) consumes directly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id string, url string, mime string, content binary, "
    "meta struct<width:int, height:int, duration_ms:int, sample_rate:int>"
)

FEATURE_DIM = 64


def decode_image(content: bytes) -> "object":
    """STUB: real implementation decodes via PIL/turbojpeg. Not available in
    this environment."""
    raise NotImplementedError("image codec not available in this environment")


def _fake_features(content: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for an image/audio encoder: SHA-256 stream →
    unit-norm float vector. Same bytes → same features, everywhere."""
    h = hashlib.sha256(content or b"").digest()
    reps = (dim * 4 + len(h) - 1) // len(h)
    buf = (h * reps)[: dim * 4]
    v = np.frombuffer(buf, dtype="<u4")[:dim].astype(np.float64)
    v = v / 2147483647.5 - 1.0
    n = float(np.sqrt((v * v).sum()))
    return [float(x) for x in (v / n if n else v)]


FEATURES_SCHEMA = "asset_id string, mime string, features array<float>"


def feature_extract_stage(assets: DataFrame, strict: bool = False) -> DataFrame:
    """binary content → fixed-dim feature vector (mapInPandas, Arrow-batched).
    strict=True exercises the real-codec path (raises in this sandbox)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                for c in pdf["content"]:
                    decode_image(bytes(c) if c is not None else b"")
            feats = [
                _fake_features(bytes(c) if c is not None else b"") for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "mime": pdf["mime"], "features": feats}
            )

    return assets.select("asset_id", "mime", "content").mapInPandas(fn, FEATURES_SCHEMA)


RESIZED_SCHEMA = "asset_id string, content binary, meta struct<width:int, height:int>"


def resize_stage(assets: DataFrame, width: int, height: int) -> DataFrame:
    """STUB shape for image resize: passes bytes through and rewrites meta
    (real impl decodes/resizes/encodes inside the same mapInPandas)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "content": pdf["content"],
                    "meta": [{"width": width, "height": height}] * len(pdf),
                }
            )

    return assets.select("asset_id", "content").mapInPandas(fn, RESIZED_SCHEMA)


def frame_sample_stage(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB shape for video frame sampling (1 row → N frame rows, UDTF-shaped
    like the parse stage). Frame count derives deterministically from
    meta.duration_ms; frame bytes are content-hash fakes."""
    frames = assets.select(
        "asset_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest((F.col("meta.duration_ms") / every_ms).cast("int") - 1, F.lit(0)),
            )
        ).alias("frame_idx"),
        "content",
    )
    return frames.select(
        "asset_id",
        "frame_idx",
        F.sha2(F.concat(F.col("content"), F.col("frame_idx").cast("string").cast("binary")), 256)
        .alias("frame_key"),
    )


def synthetic_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake asset table for tests (binary payload = seeded)."""
    rows = []
    for i in range(n):
        content = hashlib.sha256(f"asset-{i}".encode()).digest() * (4 + i % 5)
        mime = ("image/jpeg", "audio/wav", "video/mp4")[i % 3]
        rows.append(
            (
                f"asset-{i:04d}",
                f"https://assets.example/{i}",
                mime,
                bytearray(content),
                {"width": 640, "height": 480, "duration_ms": 1000 * (1 + i % 7),
                 "sample_rate": 16000},
            )
        )
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)


# --------------------------------------------------------------------------
# Binary metadata WITHOUT codecs (r5): format sniffing by magic bytes and
# container-header dimension parsing are pure byte arithmetic — the PNG
# IHDR carries width/height as big-endian u32 at offsets 16/20 (PNG spec
# §11.2.2), GIF as little-endian u16 at 6/8 (GIF89a §18) — so the REAL
# metadata tier of the multimodal stack needs no image library at all.
# All JVM builtins: hex(substring(binary)) → conv(hex, 16, 10). Only the
# pixel DECODE stays stubbed (sandbox has no codec libs).
# --------------------------------------------------------------------------

_MAGIC = {
    "png": "89504E47",
    "jpeg": "FFD8FF",
    "gif": "47494638",
    "pdf": "25504446",
}


def _be_u32(col: str, offset_1based: int) -> F.Column:
    """Big-endian u32 at a 1-based byte offset of a binary column."""
    return F.expr(
        f"CAST(conv(hex(substring({col}, {offset_1based}, 4)), 16, 10) AS BIGINT)"
    )


def _le_u16(col: str, offset_1based: int) -> F.Column:
    """Little-endian u16: swap the two bytes, then parse."""
    b0 = f"hex(substring({col}, {offset_1based}, 1))"
    b1 = f"hex(substring({col}, {offset_1based + 1}, 1))"
    return F.expr(f"CAST(conv(concat({b1}, {b0}), 16, 10) AS BIGINT)")


# SOF markers that carry frame dimensions (ITU T.81 table B.1): C0-C3,
# C5-C7, C9-CB, CD-CF — i.e. every FFCx except DHT (C4), JPG (C8), DAC (CC)
_SOF_MARKERS = (
    "FFC0", "FFC1", "FFC2", "FFC3", "FFC5", "FFC6", "FFC7",
    "FFC9", "FFCA", "FFCB", "FFCD", "FFCE", "FFCF",
)
_JPEG_MAX_SEGMENTS = 16


def _jpeg_sof_steps(content_col: str, max_segments: int = _JPEG_MAX_SEGMENTS):
    """(alias, expr) chain locating the JPEG SOF marker by walking the
    segment list from offset 3 (1-based; right after FFD8) — ITU T.81
    B.2: each header segment is FF <marker> <u16 BE length incl. itself>.
    Fill bytes (extra FFs before a marker) are stepped over one byte at
    a time; SOS/EOI, a non-FF byte, a truncated length, or exhausting
    ``max_segments`` ends the walk with no SOF → NULL dims, never an
    error. Emitted as one alias per chained select (the intlog
    discipline: each step references its predecessor several times, so
    a flat expression tree would grow exponentially)."""
    sofs = ", ".join(f"'{m}'" for m in _SOF_MARKERS)
    steps = [
        ("_jp_off_0",
         f"CASE WHEN upper(hex(substring({content_col}, 1, 3))) = 'FFD8FF' "
         "THEN CAST(3 AS BIGINT) END"),
        ("_jp_sof_0", "CAST(NULL AS BIGINT)"),
    ]
    for k in range(1, max_segments + 1):
        off, sof = f"_jp_off_{k - 1}", f"_jp_sof_{k - 1}"
        m = f"_jp_m_{k}"
        steps.append(
            (m,
             f"CASE WHEN {sof} IS NULL AND {off} IS NOT NULL "
             f"THEN upper(hex(substring({content_col}, CAST({off} AS INT), 2))) END")
        )
        steps.append(
            (f"_jp_sof_{k}",
             f"CASE WHEN {sof} IS NOT NULL THEN {sof} "
             f"WHEN {m} IN ({sofs}) THEN {off} END")
        )
        # advance: fill byte 'FFFF' → +1; marker with length → skip the
        # segment; SOS/EOI/short read/non-FF → stop (NULL)
        steps.append(
            (f"_jp_off_{k}",
             f"CASE WHEN _jp_sof_{k} IS NOT NULL OR {m} IS NULL "
             f"OR substring({m}, 1, 2) <> 'FF' OR length({m}) < 4 "
             f"OR {m} IN ('FFDA', 'FFD9') THEN CAST(NULL AS BIGINT) "
             f"WHEN {m} = 'FFFF' THEN {off} + 1 "
             f"ELSE {off} + 2 + CAST(conv(hex(substring({content_col}, "
             f"CAST({off} AS INT) + 2, 2)), 16, 10) AS BIGINT) END")
        )
    last = f"_jp_sof_{max_segments}"
    steps.append(
        ("_jp_h",
         f"CASE WHEN {last} IS NOT NULL AND length({content_col}) >= {last} + 8 "
         f"THEN CAST(conv(hex(substring({content_col}, CAST({last} AS INT) + 5, 2)), "
         "16, 10) AS BIGINT) END")
    )
    steps.append(
        ("_jp_w",
         f"CASE WHEN {last} IS NOT NULL AND length({content_col}) >= {last} + 8 "
         f"THEN CAST(conv(hex(substring({content_col}, CAST({last} AS INT) + 7, 2)), "
         "16, 10) AS BIGINT) END")
    )
    return steps


def sniff_and_dimensions(
    assets: DataFrame, content_col: str = "content"
) -> DataFrame:
    """+ (fmt, width, height): format from magic bytes; dimensions parsed
    from the PNG/GIF headers (big-/little-endian respectively) and — r6,
    VERDICT r5 Next #6 — from the JPEG SOF0/SOF2 frame header via a
    bounded segment-list walk (big-endian u16s, same codec-free byte
    arithmetic). Other formats and truncated/junk payloads get NULL
    dimensions — surfaced, never a task failure."""
    prefix = F.expr(f"hex(substring({content_col}, 1, 8))")
    fmt = F.when(prefix.startswith(_MAGIC["png"]), F.lit("png"))
    for name in ("jpeg", "gif", "pdf"):
        fmt = fmt.when(prefix.startswith(_MAGIC[name]), F.lit(name))
    fmt = fmt.otherwise(F.lit("unknown"))
    out = assets.withColumn("fmt", fmt)
    jpeg_steps = _jpeg_sof_steps(content_col)
    for alias, expr in jpeg_steps:
        out = out.selectExpr("*", f"{expr} AS {alias}")
    long_enough = F.length(F.col(content_col))
    width = (
        F.when((F.col("fmt") == "png") & (long_enough >= 24), _be_u32(content_col, 17))
        .when((F.col("fmt") == "gif") & (long_enough >= 10), _le_u16(content_col, 7))
        .when(F.col("fmt") == "jpeg", F.col("_jp_w"))
    )
    height = (
        F.when((F.col("fmt") == "png") & (long_enough >= 24), _be_u32(content_col, 21))
        .when((F.col("fmt") == "gif") & (long_enough >= 10), _le_u16(content_col, 9))
        .when(F.col("fmt") == "jpeg", F.col("_jp_h"))
    )
    return out.withColumns(
        {"width": width.cast("long"), "height": height.cast("long")}
    ).drop(*[a for a, _ in jpeg_steps])


def _le_u32_expr(col: str, off: str) -> str:
    """Little-endian u32 at a (possibly computed) 1-based offset — the
    four bytes hex'd individually and re-concatenated reversed."""
    bs = [
        f"hex(substring({col}, CAST({off} AS INT) + {i}, 1))"
        for i in range(4)
    ]
    return (
        f"CAST(conv(concat({bs[3]}, {bs[2]}, {bs[1]}, {bs[0]}), 16, 10)"
        " AS BIGINT)"
    )


def _le_u16_expr(col: str, off: str) -> str:
    b0 = f"hex(substring({col}, CAST({off} AS INT), 1))"
    b1 = f"hex(substring({col}, CAST({off} AS INT) + 1, 1))"
    return f"CAST(conv(concat({b1}, {b0}), 16, 10) AS BIGINT)"


_WAV_MAX_CHUNKS = 8


def _wav_steps(content_col: str, max_chunks: int = _WAV_MAX_CHUNKS):
    """(alias, expr) chain walking the RIFF chunk list (RIFF spec / WAVE
    format: 4-byte id, little-endian u32 size, data, padded to even) for
    the 'fmt ' and 'data' chunks — same codec-free discipline as the
    JPEG SOF walk: bounded steps, one alias per chained select, any
    malformation (non-WAVE form, truncated chunk, >max_chunks) → NULL
    fields, never a task failure. 'data' counts only when its payload is
    FULLY present (a truncated download reports no duration rather than
    a wrong one)."""
    c = content_col
    steps = [
        ("_wv_off_0",
         f"CASE WHEN length({c}) >= 12 "
         f"AND upper(hex(substring({c}, 1, 4))) = '52494646' "
         f"AND upper(hex(substring({c}, 9, 4))) = '57415645' "
         "THEN CAST(13 AS BIGINT) END"),
        ("_wv_fmt_0", "CAST(NULL AS BIGINT)"),
        ("_wv_dsz_0", "CAST(NULL AS BIGINT)"),
    ]
    for k in range(1, max_chunks + 1):
        off, fmt, dsz = f"_wv_off_{k-1}", f"_wv_fmt_{k-1}", f"_wv_dsz_{k-1}"
        cid, csz = f"_wv_id_{k}", f"_wv_sz_{k}"
        steps.append(
            (cid,
             f"CASE WHEN {off} IS NOT NULL AND length({c}) >= {off} + 7 "
             f"THEN upper(hex(substring({c}, CAST({off} AS INT), 4))) END")
        )
        steps.append(
            (csz,
             f"CASE WHEN {cid} IS NOT NULL "
             f"THEN {_le_u32_expr(c, f'{off} + 4')} END")
        )
        # 666D7420 = 'fmt ', 64617461 = 'data'
        steps.append(
            (f"_wv_fmt_{k}",
             f"coalesce({fmt}, CASE WHEN {cid} = '666D7420' "
             f"AND {csz} >= 16 AND length({c}) >= {off} + 7 + {csz} "
             f"THEN {off} + 8 END)")
        )
        steps.append(
            (f"_wv_dsz_{k}",
             f"coalesce({dsz}, CASE WHEN {cid} = '64617461' "
             f"AND length({c}) >= {off} + 7 + {csz} THEN {csz} END)")
        )
        steps.append(
            (f"_wv_off_{k}",
             f"CASE WHEN {cid} IS NULL OR {csz} IS NULL "
             f"OR ({f'_wv_fmt_{k}'} IS NOT NULL AND {f'_wv_dsz_{k}'} IS NOT NULL) "
             f"THEN CAST(NULL AS BIGINT) "
             f"ELSE {off} + 8 + {csz} + ({csz} % 2) END")
        )
    lf = f"coalesce(_wv_fmt_{max_chunks}, CAST(NULL AS BIGINT))"
    ld = f"coalesce(_wv_dsz_{max_chunks}, CAST(NULL AS BIGINT))"
    steps.append(("_wv_fmtoff", lf))
    steps.append(("_wv_datasz", ld))
    return steps


def sniff_wav_metadata(
    assets: DataFrame, content_col: str = "content"
) -> DataFrame:
    """+ (fmt, sample_rate, channels, bits, duration_ms): RIFF/WAVE
    header metadata by pure byte arithmetic — the audio sibling of
    :func:`sniff_and_dimensions` (no codec in the container; pcm DECODE
    stays a declared stub like image pixels). duration_ms =
    ((data_size DIV block_align) · 1000) DIV sample_rate — exact
    integer division both ways; missing/garbled fmt or data chunk, a
    zero block_align, or a zero sample rate → NULL duration."""
    prefix = F.expr(f"upper(hex(substring({content_col}, 1, 4)))")
    wave = F.expr(f"upper(hex(substring({content_col}, 9, 4)))")
    out = assets.withColumn(
        "fmt",
        F.when(
            (prefix == "52494646") & (wave == "57415645"), F.lit("wav")
        ).otherwise(F.lit("unknown")),
    )
    for alias, expr in _wav_steps(content_col):
        out = out.selectExpr("*", f"{expr} AS {alias}")
    f = "_wv_fmtoff"
    out = out.selectExpr(
        "*",
        f"CASE WHEN {f} IS NOT NULL THEN "
        f"{_le_u16_expr(content_col, f'{f} + 2')} END AS _wv_ch",
        f"CASE WHEN {f} IS NOT NULL THEN "
        f"{_le_u32_expr(content_col, f'{f} + 4')} END AS _wv_sr",
        f"CASE WHEN {f} IS NOT NULL THEN "
        f"{_le_u16_expr(content_col, f'{f} + 12')} END AS _wv_ba",
        f"CASE WHEN {f} IS NOT NULL THEN "
        f"{_le_u16_expr(content_col, f'{f} + 14')} END AS _wv_bits",
    )
    dur = (
        "CASE WHEN _wv_sr >= 1 AND _wv_ba >= 1 AND _wv_datasz IS NOT NULL "
        "THEN ((_wv_datasz DIV _wv_ba) * 1000) DIV _wv_sr END"
    )
    out = out.selectExpr(
        "*",
        "_wv_sr AS sample_rate",
        "_wv_ch AS channels",
        "_wv_bits AS bits",
        f"{dur} AS duration_ms",
    )
    drop = [a for a, _ in _wav_steps(content_col)] + [
        "_wv_ch", "_wv_sr", "_wv_ba", "_wv_bits",
    ]
    drop += [f"_wv_id_{k}" for k in range(1, _WAV_MAX_CHUNKS + 1)]
    drop += [f"_wv_sz_{k}" for k in range(1, _WAV_MAX_CHUNKS + 1)]
    return out.drop(*set(drop))


def _be_u32_expr(col: str, off: str) -> str:
    """Big-endian u32 at a (possibly computed) 1-based offset."""
    return (
        f"CAST(conv(hex(substring({col}, CAST({off} AS INT), 4)), 16, 10)"
        " AS BIGINT)"
    )


_MP4_MAX_BOXES = 8


def _mp4_steps(content_col: str, max_boxes: int = _MP4_MAX_BOXES):
    """(alias, expr) chain over the ISO-BMFF box list (ISO 14496-12 §4.2:
    [u32 BE size][4cc type][payload]) — top-level walk to 'moov', then a
    nested walk inside moov to 'mvhd' (version 0: timescale/duration as
    BE u32 at payload +12/+16). size==0 (to-EOF) and size==1 (64-bit
    largesize) stop the walk — declared unparsed, NULL not wrong; mvhd
    version 1 (64-bit times) likewise. Same bounded one-alias-per-select
    discipline as the JPEG and WAV walks."""
    c = content_col
    steps = [
        ("_m4_off_0",
         f"CASE WHEN length({c}) >= 8 THEN CAST(1 AS BIGINT) END"),
        ("_m4_moov_0", "CAST(NULL AS BIGINT)"),
        ("_m4_end_0", "CAST(NULL AS BIGINT)"),
    ]
    for k in range(1, max_boxes + 1):
        off, moov, end = f"_m4_off_{k-1}", f"_m4_moov_{k-1}", f"_m4_end_{k-1}"
        sz, ty = f"_m4_sz_{k}", f"_m4_ty_{k}"
        steps.append(
            (sz,
             f"CASE WHEN {moov} IS NULL AND {off} IS NOT NULL "
             f"AND length({c}) >= {off} + 7 "
             f"THEN {_be_u32_expr(c, off)} END")
        )
        steps.append(
            (ty,
             f"CASE WHEN {sz} IS NOT NULL "
             f"THEN upper(hex(substring({c}, CAST({off} AS INT) + 4, 4))) END")
        )
        # 6D6F6F76 = 'moov'; require the whole box present before entering
        steps.append(
            (f"_m4_moov_{k}",
             f"coalesce({moov}, CASE WHEN {ty} = '6D6F6F76' AND {sz} >= 16 "
             f"AND length({c}) >= {off} + {sz} - 1 THEN {off} + 8 END)")
        )
        steps.append(
            (f"_m4_end_{k}",
             f"coalesce({end}, CASE WHEN {ty} = '6D6F6F76' AND {sz} >= 16 "
             f"AND length({c}) >= {off} + {sz} - 1 THEN {off} + {sz} END)")
        )
        steps.append(
            (f"_m4_off_{k}",
             f"CASE WHEN _m4_moov_{k} IS NOT NULL OR {sz} IS NULL "
             f"OR {sz} < 8 THEN CAST(NULL AS BIGINT) "
             f"ELSE {off} + {sz} END")
        )
    moov, end = f"_m4_moov_{max_boxes}", f"_m4_end_{max_boxes}"
    steps.append(("_m4_in_0", moov))
    steps.append(("_m4_mvhd_0", "CAST(NULL AS BIGINT)"))
    for k in range(1, max_boxes + 1):
        off, mv = f"_m4_in_{k-1}", f"_m4_mvhd_{k-1}"
        sz, ty = f"_m4_isz_{k}", f"_m4_ity_{k}"
        steps.append(
            (sz,
             f"CASE WHEN {mv} IS NULL AND {off} IS NOT NULL "
             f"AND {off} + 7 < {end} "
             f"THEN {_be_u32_expr(c, off)} END")
        )
        steps.append(
            (ty,
             f"CASE WHEN {sz} IS NOT NULL "
             f"THEN upper(hex(substring({c}, CAST({off} AS INT) + 4, 4))) END")
        )
        # 6D766864 = 'mvhd'; v0 box is 108 bytes, need payload through +24
        steps.append(
            (f"_m4_mvhd_{k}",
             f"coalesce({mv}, CASE WHEN {ty} = '6D766864' AND {sz} >= 32 "
             f"AND {off} + 31 < {end} "
             f"AND hex(substring({c}, CAST({off} AS INT) + 8, 1)) = '00' "
             f"THEN {off} + 8 END)")
        )
        steps.append(
            (f"_m4_in_{k}",
             f"CASE WHEN _m4_mvhd_{k} IS NOT NULL OR {sz} IS NULL "
             f"OR {sz} < 8 THEN CAST(NULL AS BIGINT) "
             f"ELSE {off} + {sz} END")
        )
    last = f"_m4_mvhd_{max_boxes}"
    # payload layout (v0): version/flags 4, creation 4, modification 4,
    # then timescale at +12 and duration at +16 (1-based from `last`,
    # which points AT the version byte)
    steps.append(
        ("_m4_ts", f"CASE WHEN {last} IS NOT NULL "
                   f"THEN {_be_u32_expr(c, f'{last} + 12')} END")
    )
    steps.append(
        ("_m4_dur", f"CASE WHEN {last} IS NOT NULL "
                    f"THEN {_be_u32_expr(c, f'{last} + 16')} END")
    )
    return steps


def sniff_mp4_metadata(
    assets: DataFrame, content_col: str = "content"
) -> DataFrame:
    """+ (fmt, major_brand, timescale, duration_ms): ISO-BMFF movie
    metadata by pure byte arithmetic — the video sibling of the WAV and
    image tiers. fmt = 'mp4' when the first box is 'ftyp' (major brand
    surfaced as text); duration_ms = (mvhd.duration · 1000) DIV
    mvhd.timescale, version-0 mvhd only (v1/largesize/to-EOF boxes are
    declared unparsed → NULL, never wrong or failing)."""
    is_ftyp = F.expr(
        f"length({content_col}) >= 12 AND "
        f"upper(hex(substring({content_col}, 5, 4))) = '66747970'"
    )
    out = assets.withColumn(
        "fmt", F.when(is_ftyp, F.lit("mp4")).otherwise(F.lit("unknown"))
    ).withColumn(
        "major_brand",
        F.when(is_ftyp, F.expr(f"decode(substring({content_col}, 9, 4), 'UTF-8')")),
    )
    for alias, expr in _mp4_steps(content_col):
        out = out.selectExpr("*", f"{expr} AS {alias}")
    out = out.selectExpr(
        "*",
        "_m4_ts AS timescale",
        "CASE WHEN _m4_ts >= 1 AND _m4_dur IS NOT NULL "
        "THEN (_m4_dur * 1000) DIV _m4_ts END AS duration_ms",
    )
    return out.drop(*{a for a, _ in _mp4_steps(content_col)})

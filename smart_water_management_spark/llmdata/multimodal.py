"""Multimodal-column plumbing (BASELINE.json extension surface): treat
image/audio/video payloads as opaque ``binary`` columns with typed
metadata, and run decode / feature-extraction as Arrow-batched
``mapInPandas`` stages.

Image decode/resize is optional-dependency-gated: when PIL is installed,
``decode_payload(..., real=True)`` and ``resize_payloads(use_codec=True)``
really decode and thumbnail image payloads (tested when PIL exists);
without it the real path raises and the default deterministic
byte-statistics stub stands in (audio/video decode needs librosa/ffmpeg
and stays stubbed). Everything Spark-side — schema, binary encoding,
metadata struct, partitioning, Arrow batch shapes, UDF signatures — is
identical on both paths.

Scale posture: payloads stay in executor Arrow batches end-to-end (never
collected); feature extraction is embarrassingly parallel per partition;
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory for
large blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.catalog import fan_out, load_table

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, "
    "byte_mean double, byte_entropy_proxy double, frame_count int"
)


def to_multimodal(docs: DataFrame) -> DataFrame:
    """Synthesize the multimodal table: text → binary payload + metadata
    struct (the shape a real corpus would land with: blob + mime + size)."""
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, "image/png")
            .when(F.col("doc_id") % 3 == 1, "audio/wav")
            .otherwise("video/mp4")
            .alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.lit("fake-corpus-v1").alias("origin"),
        ).alias("meta"),
    )


def _pil():
    """PIL.Image when installed, else None — the real image path is
    optional-dependency-gated, everything else uses the synthetic stub."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_payload(pdf, real: bool = False):
    """Per-batch decode. ``real=True`` really decodes image payloads —
    through PIL when installed (any format), else through the vendored
    pure-Python PNG codec (``png_codec``, stdlib zlib; same ITU-R 601-2
    integer luma as PIL's ``convert("L")``, so the two paths agree on RGB
    input). Non-PNG images without PIL, and audio/video (librosa/ffmpeg),
    still refuse loudly rather than fake results."""
    import numpy as np

    if real:
        from . import png_codec

        Image = _pil()
        import io

        feats = []
        for payload, mime in zip(pdf["payload"], pdf["mime"]):
            if mime.startswith("audio"):
                # PCM WAV is a stdlib decode (wave module) — real samples,
                # no optional dependency. Features mirror the image path:
                # mean |amplitude| rescaled to the byte domain, fraction of
                # distinct 8-bit levels, frame_count = PCM frame count.
                import wave

                try:
                    wf = wave.open(io.BytesIO(bytes(payload)))
                except (wave.Error, EOFError) as exc:
                    raise NotImplementedError(
                        "real decode for non-WAV audio needs librosa/ffmpeg"
                    ) from exc
                sw, nfr = wf.getsampwidth(), wf.getnframes()
                raw = wf.readframes(nfr)
                dt = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
                if dt is None:
                    raise NotImplementedError(f"unsupported WAV sample width {sw}")
                samples = np.frombuffer(raw, dtype=dt).astype(np.float64)
                if sw == 1:
                    samples -= 128.0  # 8-bit WAV is unsigned, center it
                scale = float(2 ** (8 * sw - 1))
                lvl = np.clip(
                    (samples / scale * 128.0 + 128.0), 0, 255
                ).astype(np.uint8)
                feats.append(
                    (
                        float(np.abs(samples).mean() / scale * 255.0),
                        len(np.unique(lvl)) / 256.0,
                        max(1, nfr),
                    )
                )
                continue
            if not mime.startswith("image"):
                raise NotImplementedError(
                    "real decode for video media needs ffmpeg"
                )
            if Image is not None:
                px = np.asarray(Image.open(io.BytesIO(payload)).convert("L"))
            elif png_codec.is_png(bytes(payload)):
                w, h, ch, pixels = png_codec.decode_png(bytes(payload))
                gray = png_codec.to_gray(w, h, ch, pixels)
                px = np.frombuffer(gray, dtype=np.uint8).reshape(h, w)
            else:
                raise NotImplementedError(
                    "real decode for non-PNG images requires PIL (the vendored "
                    "codec covers PNG only)"
                )
            feats.append(
                (float(px.mean()), len(np.unique(px)) / 256.0, 1)
            )
        return feats

    feats = []
    for payload, mime in zip(pdf["payload"], pdf["mime"]):
        arr = np.frombuffer(payload, dtype=np.uint8)
        # deterministic fake 'decode': byte statistics as stand-in features
        byte_mean = float(arr.mean()) if len(arr) else 0.0
        uniq = len(np.unique(arr))
        entropy_proxy = float(uniq) / 256.0
        frame_count = max(1, int(len(arr) // 64)) if mime.startswith("video") else 1
        feats.append((byte_mean, entropy_proxy, frame_count))
    return feats


def extract_features(mm: DataFrame) -> DataFrame:
    """mapInPandas feature-extraction stage over binary payloads."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = decode_payload(pdf)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "byte_mean": [f[0] for f in feats],
                    "byte_entropy_proxy": [f[1] for f in feats],
                    "frame_count": [f[2] for f in feats],
                }
            )

    flat = mm.select(
        "doc_id", "payload", F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )
    return flat.mapInPandas(run, FEATURE_SCHEMA)


@register(
    "x13_multimodal_features",
    # The synthetic corpus is ASCII, so the Python-side byte statistics
    # are exactly reproducible from the text in SQL (per-char unicode ==
    # byte value); integer byte sums stay < 2^53 so the float means are
    # bit-identical. Proves the whole Arrow/mapInPandas plumbing against
    # an engine that never saw the binary column.
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime,
           CAST(length(text) AS BIGINT) AS n_bytes,
           COALESCE(CAST(list_aggregate(
               list_transform(range(1, length(text) + 1),
                              i -> unicode(text[i])), 'avg') AS DOUBLE),
             0.0) AS byte_mean,
           len(list_distinct(list_transform(range(1, length(text) + 1),
                                            i -> unicode(text[i])))) / 256.0
             AS byte_entropy_proxy,
           CAST(CASE WHEN doc_id % 3 = 2
                     THEN greatest(length(text) // 64, 1)
                     ELSE 1 END AS INT) AS frame_count
    FROM documents
    """,
    doc="multimodal: binary payload + metadata struct → mapInPandas features",
)
def x13_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(to_multimodal(docs))


@register(
    "x14_multimodal_metadata",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime,
           COUNT(*) AS n_assets,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes
    FROM documents
    GROUP BY 1
    """,
    doc="multimodal: typed-metadata rollup over binary assets (JVM-side)",
)
def x14_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mm = to_multimodal(docs)
    return mm.groupBy(F.col("meta.mime").alias("mime")).agg(
        F.count("*").alias("n_assets"),
        F.sum("meta.n_bytes").alias("total_bytes"),
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes long, frame_hash long"


def sample_frames(
    mm: DataFrame,
    every_nth: int = 4,
    frame_size: int = 64,
    use_codec: bool = False,
) -> DataFrame:
    """Frame-sampling stage (1 video row → N frame rows) via mapInPandas.

    The default stub treats each ``frame_size``-byte slice of the payload
    as one frame and keeps every ``every_nth`` — the row-expansion shape
    (UDTF over Arrow batches) is exactly what a real keyframe sampler
    produces; only the slicing body changes. With ``use_codec=True``,
    animated-GIF payloads are REALLY decoded (vendored pure-Python
    ``gif_codec``: LZW, color tables, luma) and every ``every_nth``
    decoded frame is emitted with its true pixel size and pixel-content
    hash; non-GIF payloads fall through to the stub. Non-video assets
    pass through with a single frame 0 either way.

    Scale: expansion happens inside the executor batch (never a driver
    explode); output rows carry a content hash, so a downstream
    frame-level dedup is one groupBy away.
    """

    def run(batches):
        import zlib

        import pandas as pd

        from . import gif_codec

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_hash": []}
            for doc_id, payload, mime in zip(pdf["doc_id"], pdf["payload"], pdf["mime"]):
                if (
                    use_codec
                    and mime.startswith(("video", "image/gif"))
                    and gif_codec.is_gif(bytes(payload))
                ):
                    frames = gif_codec.decode_gif(bytes(payload))
                    for i in range(0, len(frames), every_nth):
                        _w, _h, px = frames[i]
                        out["doc_id"].append(doc_id)
                        out["frame_idx"].append(i)
                        out["frame_bytes"].append(len(px))
                        out["frame_hash"].append(zlib.crc32(px))
                    continue
                if mime.startswith("video"):
                    n_frames = max(1, len(payload) // frame_size)
                    idxs = range(0, n_frames, every_nth)
                else:
                    idxs = [0]
                for i in idxs:
                    chunk = bytes(payload[i * frame_size : (i + 1) * frame_size])
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(len(chunk))
                    # crc32, not hash(): Python's bytes hash is salted per
                    # process (PYTHONHASHSEED) — a content id must be stable
                    # across executors and runs for frame-level dedup
                    out["frame_hash"].append(zlib.crc32(chunk))
            yield pd.DataFrame(out)

    flat = mm.select("doc_id", "payload", F.col("meta.mime").alias("mime"))
    return flat.mapInPandas(run, FRAME_SCHEMA)


@register(
    "x16_frame_sampling",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 2
                THEN CAST(ceil(greatest(strlen(text) // 64, 1) / 4.0) AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS n_frames,
           CAST(1 AS BIGINT) AS has_first
    FROM documents
    """,
    doc="multimodal: every-4th frame sampling (1 video → N frames) via "
    "mapInPandas row expansion; frame COUNTS oracle-checked per doc",
)
def x16_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(to_multimodal(docs))
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.sum(F.when(F.col("frame_idx") == 0, 1).otherwise(0)).alias("has_first"),
    )


RESIZE_SCHEMA = "doc_id long, mime string, orig_bytes long, thumb_bytes long, thumb binary"


def resize_payloads(
    mm: DataFrame, target_bytes: int = 32, use_codec: bool = False
) -> DataFrame:
    """Resize/downsample stage via mapInPandas.

    Default path "resizes" by stride-sampling the payload down to
    ``target_bytes`` — deterministic, codec-free, and what the x19
    oracle's byte arithmetic describes. With ``use_codec=True``, image
    payloads are really decoded and thumbnailed to ≤8×8 PNG — via PIL
    when installed, else via the vendored pure-Python PNG codec (PNG
    payloads only; others fall through to the stride stub). The
    Spark-side contract is identical either way: binary in, binary out,
    bounded output size, Arrow batches end-to-end, payloads never on the
    driver.
    """
    codec = use_codec

    def run(batches):
        import pandas as pd

        from . import png_codec

        for pdf in batches:
            thumbs, sizes = [], []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                thumb = None
                if codec and mime.startswith("image"):
                    Image = _pil()
                    if Image is not None:
                        import io

                        img = Image.open(io.BytesIO(payload))
                        img.thumbnail((8, 8))
                        buf = io.BytesIO()
                        img.save(buf, format="PNG")
                        thumb = buf.getvalue()
                    elif png_codec.is_png(bytes(payload)):
                        w, h, ch, px = png_codec.decode_png(bytes(payload))
                        gray = png_codec.to_gray(w, h, ch, px)
                        tw, th, tpx = png_codec.thumbnail_gray(w, h, gray)
                        thumb = png_codec.encode_png_gray(tw, th, tpx)
                if thumb is None:
                    n = len(payload)
                    if n <= target_bytes:
                        thumb = bytes(payload)
                    else:
                        stride = n // target_bytes
                        thumb = bytes(payload[::stride][:target_bytes])
                thumbs.append(thumb)
                sizes.append(len(thumb))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "orig_bytes": pdf["n_bytes"],
                    "thumb_bytes": sizes,
                    "thumb": thumbs,
                }
            )

    flat = mm.select(
        "doc_id", "payload", F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )
    return flat.mapInPandas(run, RESIZE_SCHEMA)


@register(
    "x19_resize_thumbnails",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime,
           COUNT(*) AS n_assets,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_orig_bytes,
           CAST(SUM(LEAST(strlen(text), 32)) AS BIGINT) AS total_thumb_bytes
    FROM documents
    GROUP BY 1
    """,
    doc="multimodal: resize/downsample stage (stride-sampled stub for "
    "PIL/librosa) — bounded-size thumbnails via mapInPandas; byte "
    "arithmetic oracle-checked per mime",
)
def x19_resize_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    resized = resize_payloads(to_multimodal(docs))
    return resized.groupBy("mime").agg(
        F.count("*").alias("n_assets"),
        F.sum("orig_bytes").alias("total_orig_bytes"),
        F.sum("thumb_bytes").alias("total_thumb_bytes"),
    )


# --- x67: perceptual-hash (aHash) dedup over binary payloads -----------------

PHASH_BLOCKS = 64


@register(
    "x67_perceptual_hash",
    # The bit decision uses integer cross-multiplication
    # (sum_block * n_total > sum_total * n_block) instead of comparing
    # float means, so every bit is exact integer arithmetic both engines
    # reproduce; payloads are ASCII text bytes, so DuckDB reads the same
    # byte stream via ascii(substr(...)).
    oracle=f"""
    WITH bytes AS (
      SELECT doc_id, length(text) AS n,
             unnest(range(1, length(text) + 1)) AS pos
      FROM documents
    ),
    coded AS (
      SELECT doc_id, n, pos,
             ascii(substr(d.text, CAST(b.pos AS INT), 1)) AS code,
             CAST(FLOOR((b.pos - 1) * {PHASH_BLOCKS} / b.n) AS BIGINT) AS blk
      FROM bytes b JOIN documents d USING (doc_id)
    ),
    blocks AS (
      SELECT doc_id, blk,
             CAST(SUM(code) AS BIGINT) AS bsum,
             COUNT(*) AS bcnt
      FROM coded GROUP BY doc_id, blk
    ),
    -- payloads shorter than the block count leave empty blocks; emit
    -- them as 0-sum/0-count so the hash is always 64 bits (numpy twin
    -- uses bincount(minlength))
    all_blocks AS (
      SELECT d.doc_id, unnest(range(0, {PHASH_BLOCKS})) AS blk
      FROM documents d
    ),
    filled AS (
      SELECT a.doc_id, a.blk,
             COALESCE(b.bsum, 0) AS bsum,
             COALESCE(b.bcnt, 0) AS bcnt
      FROM all_blocks a LEFT JOIN blocks b
        ON a.doc_id = b.doc_id AND a.blk = b.blk
    ),
    totals AS (
      SELECT doc_id, CAST(SUM(bsum) AS BIGINT) AS tsum,
             CAST(SUM(bcnt) AS BIGINT) AS tcnt
      FROM filled GROUP BY doc_id
    ),
    bits AS (
      SELECT b.doc_id,
             string_agg(
               CASE WHEN bsum * tcnt > tsum * bcnt THEN '1' ELSE '0' END,
               '' ORDER BY blk) AS phash
      FROM filled b JOIN totals t USING (doc_id)
      GROUP BY b.doc_id
    )
    SELECT doc_id, phash,
           COUNT(*) OVER (PARTITION BY phash) AS n_same_hash
    FROM bits
    """,
    doc=f"perceptual average-hash over binary payloads: the byte stream "
    f"(the deterministic fake decode) is split into {PHASH_BLOCKS} "
    "blocks and each bit records whether the block's mean exceeds the "
    "payload mean — the aHash shape used for image near-dup detection, "
    "with integer cross-multiplied bit decisions so the hash is "
    "engine-exact. Runs as an Arrow-batched mapInPandas (numpy per "
    "payload, the same kernel a real pixel decode feeds); matching "
    "hashes group near-identical payloads without any pairwise compare",
)
def x67_perceptual_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window as W

    mm = to_multimodal(load_table(spark, sf_dir, "documents"))

    def phash(batches):
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n = len(arr)
                blk = (np.arange(n) * PHASH_BLOCKS) // n
                bsum = np.bincount(blk, weights=arr, minlength=PHASH_BLOCKS).astype(
                    np.int64
                )
                bcnt = np.bincount(blk, minlength=PHASH_BLOCKS).astype(np.int64)
                tsum, tcnt = int(arr.sum()), n
                # integer cross-multiply: exact, no float-mean compare;
                # empty blocks (payload shorter than 64 bytes) emit '0'
                # on both engines because 0 * tcnt > tsum * 0 is false
                bits = (bsum * tcnt) > (tsum * bcnt)
                out.append("".join("1" if b else "0" for b in bits))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "phash": out})

    hashed = mm.select("doc_id", "payload").mapInPandas(
        phash, "doc_id long, phash string"
    )
    return hashed.select(
        "doc_id",
        "phash",
        F.count("*").over(W.partitionBy("phash")).alias("n_same_hash"),
    )


# --- x117: multimodal shard-packing manifest ----------------------------------------

_X117_BUDGET = 4096  # bytes per output shard (tiny to exercise the math)


@register(
    "x117_shard_manifest",
    # Pack payloads into fixed-byte-budget output shards per source
    # (the webdataset/tar-shard layout step): shard index = floor of
    # the EXCLUSIVE running byte total / budget, in deterministic
    # doc_id order. Oversized payloads own their shard; the manifest
    # rows are what the writer job consumes.
    oracle=f"""
    WITH mm AS (
      SELECT doc_id, source,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    ),
    run AS (
      SELECT doc_id, source, n_bytes,
             COALESCE(SUM(n_bytes) OVER (PARTITION BY source
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS bytes_before
      FROM mm
    ),
    assigned AS (
      SELECT source,
             CAST(FLOOR(CAST(bytes_before AS DOUBLE) / {_X117_BUDGET})
                  AS BIGINT) AS shard,
             doc_id, n_bytes
      FROM run
    )
    SELECT source, shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM assigned GROUP BY source, shard
    """,
    doc="x117: multimodal shard-packing manifest — assign every payload to a "
    "fixed-byte-budget output shard per source (exclusive running "
    "byte total / budget, deterministic doc_id order): the "
    "webdataset/tar-shard layout plan a multimodal training pipeline "
    "writes before materializing shards. Scale: the running sum "
    "partitions by source (never a global window); payload bytes come "
    "from metadata, not decode; the manifest is what the distributed "
    "writer consumes shard-by-shard. Exactness: integer byte counts "
    "and floor arithmetic",
)
def x117_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    mm = (
        to_multimodal(docs)
        .select("doc_id", F.col("meta.n_bytes").alias("n_bytes"))
        .join(docs.select("doc_id", "source"), "doc_id")
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    assigned = mm.select(
        "source",
        F.floor(
            F.coalesce(F.sum("n_bytes").over(w), F.lit(0)).cast("double")
            / _X117_BUDGET
        )
        .cast("bigint")
        .alias("shard"),
        "doc_id",
        "n_bytes",
    )
    return assigned.groupBy("source", "shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_bytes").cast("bigint").alias("shard_bytes"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
        F.max("doc_id").cast("bigint").alias("last_doc"),
    )


# --- x124-x126: deep multimodal audits (VERDICT r7 directive #5) --------------------
#
# All three build REAL container files (PNG via the vendored codec,
# RIFF/WAV via the stdlib wave module) from deterministic pixel/sample
# streams derived from documents.text, push them through genuine binary
# decode stages (header walk + CRC + full pixel/sample reconstruction),
# and emit fields an engine that never saw the binary column can
# re-derive from the source text — so the entire encode->bytes->decode
# round trip is exact-oracle-checked, not just smoke-run.

_X126_CORRUPT_MOD = 13  # every 13th pairing gets a truncated image


def _png_payloads(docs: DataFrame, corrupt_mod: int | None = None) -> DataFrame:
    """Deterministic grayscale PNG per document: pixels are the ASCII
    byte stream of the text, width 8 + doc_id % 9, zero-padded to the
    last row; ``corrupt_mod`` truncates every corrupt_mod-th doc's
    pixels to the first half (the planted caption<->image mismatch for
    x126). Returns (doc_id, payload) with real encoded PNG bytes.

    r11 (guide §2.6): the corpus parquet arrives as ONE input split
    locally, which would serialize the pure-Python codec work of every
    consumer on a single core — fan_out spreads the encode (and the
    decode stages chained onto it, which stay narrow) across the
    session's cores; at 100 TB the scan already carries thousands of
    splits and it is a no-op."""
    docs = fan_out(docs, docs.sparkSession)

    def build(batches: Iterator) -> Iterator:
        import pandas as pd

        from . import png_codec

        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8")
                if corrupt_mod is not None and doc_id % corrupt_mod == 0:
                    data = data[: len(data) // 2]
                w = 8 + int(doc_id) % 9
                h = max(1, -(-len(data) // w))
                data = data + bytes(w * h - len(data))
                payloads.append(png_codec.encode_png_gray(w, h, data))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    return docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, payload binary"
    )


_PNG_AUDIT_SCHEMA = (
    "doc_id long, width long, height long, bit_depth long, "
    "color_type long, ihdr_crc_ok boolean, n_chunks long, px_sum long"
)


def _parse_png_header(payload: bytes):
    """Walk the real chunk stream: signature, IHDR fields, per-chunk CRC
    of IHDR, chunk count. Pure stdlib (struct + zlib.crc32)."""
    import struct
    import zlib

    from . import png_codec

    assert payload[:8] == png_codec.PNG_SIG
    off = 8
    n_chunks = 0
    width = height = bit_depth = color_type = -1
    crc_ok = False
    while off < len(payload):
        (clen,) = struct.unpack(">I", payload[off : off + 4])
        ctype = payload[off + 4 : off + 8]
        body = payload[off + 8 : off + 8 + clen]
        (crc,) = struct.unpack(
            ">I", payload[off + 8 + clen : off + 12 + clen]
        )
        if ctype == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(
                ">IIBB", body[:10]
            )
            crc_ok = zlib.crc32(ctype + body) == crc
        n_chunks += 1
        off += 12 + clen
    return width, height, bit_depth, color_type, crc_ok, n_chunks


@register(
    "x124_png_metadata_audit",
    # Every emitted field is a pure function of (n_chars, doc_id):
    # width = 8 + doc_id % 9, height = ceil(n_chars / width), fixed
    # 8-bit grayscale, 3 chunks (IHDR/IDAT/IEND), CRC always valid for
    # a correct encoder, pixel sum = sum of the text's byte codes
    # (zero padding adds nothing). The Spark side derives them all
    # from the DECODED BYTES, the oracle from the source text — any
    # encoder/decoder/CRC disagreement breaks the hash match.
    oracle="""
    WITH base AS (
      SELECT doc_id, n_chars AS n,
             CAST(8 + doc_id % 9 AS BIGINT) AS w
      FROM documents
    ),
    px AS (
      SELECT d.doc_id,
             CAST(SUM(ascii(substr(d.text, CAST(u.pos AS INT), 1)))
                  AS BIGINT) AS px_sum
      FROM documents d,
           (SELECT doc_id, unnest(range(1, n_chars + 1)) AS pos
            FROM documents) u
      WHERE u.doc_id = d.doc_id
      GROUP BY d.doc_id
    )
    SELECT b.doc_id,
           b.w AS width,
           GREATEST(1, CAST(FLOOR((b.n + b.w - 1) / b.w) AS BIGINT))
             AS height,
           CAST(8 AS BIGINT) AS bit_depth,
           CAST(0 AS BIGINT) AS color_type,
           TRUE AS ihdr_crc_ok,
           CAST(3 AS BIGINT) AS n_chunks,
           px.px_sum
    FROM base b JOIN px USING (doc_id)
    """,
    doc="x124: PNG metadata audit — encode every document's byte stream "
    "as a real grayscale PNG (vendored pure-Python codec), then a "
    "separate Arrow-batched decode stage walks the actual chunk "
    "stream: signature check, IHDR width/height/bit-depth/color-type, "
    "IHDR CRC-32 verification, chunk count, and a full pixel decode "
    "whose sum must equal the source text's byte sum. The "
    "header-level integrity pass a multimodal ingest pipeline runs "
    "before trusting third-party image payloads. Scale: payloads "
    "stay inside executor Arrow batches end-to-end; decode is "
    "embarrassingly parallel per partition. Exactness: every field "
    "integer-derived; oracle reconstructs all of them from text",
)
def x124_png_metadata_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pngs = _png_payloads(docs)

    def audit(batches: Iterator) -> Iterator:
        import pandas as pd

        from . import png_codec

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                w, h, depth, ctype, crc_ok, n_chunks = _parse_png_header(b)
                dw, dh, ch, pixels = png_codec.decode_png(b)
                assert (dw, dh) == (w, h)
                rows.append(
                    (
                        int(doc_id), w, h, depth, ctype, crc_ok,
                        n_chunks, sum(pixels),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "bit_depth",
                    "color_type", "ihdr_crc_ok", "n_chunks", "px_sum",
                ],
            )

    return pngs.mapInPandas(audit, _PNG_AUDIT_SCHEMA)


_X125_BLOCKS = 32  # fingerprint bits (coarser than x67's 64: audio frames)


@register(
    "x125_wav_fingerprint_dedup",
    # Samples are the text's byte codes (8-bit unsigned PCM), so the
    # 32-bit average-energy fingerprint is reproducible in SQL with
    # x67's integer cross-multiply device over ascii codes — but HERE
    # the Spark side computes it from samples decoded out of a real
    # RIFF/WAV container (stdlib wave roundtrip), so container
    # framing, sample width and frame count are all under test.
    oracle=f"""
    WITH bytes AS (
      SELECT doc_id, n_chars AS n,
             unnest(range(1, n_chars + 1)) AS pos
      FROM documents
    ),
    coded AS (
      SELECT b.doc_id, b.n, b.pos,
             ascii(substr(d.text, CAST(b.pos AS INT), 1)) AS code,
             CAST(FLOOR((b.pos - 1) * {_X125_BLOCKS} / b.n) AS BIGINT)
               AS blk
      FROM bytes b JOIN documents d USING (doc_id)
    ),
    blocks AS (
      SELECT doc_id, blk,
             CAST(SUM(code) AS BIGINT) AS bsum,
             COUNT(*) AS bcnt
      FROM coded GROUP BY doc_id, blk
    ),
    all_blocks AS (
      SELECT d.doc_id, unnest(range(0, {_X125_BLOCKS})) AS blk
      FROM documents d
    ),
    filled AS (
      SELECT a.doc_id, a.blk,
             COALESCE(b.bsum, 0) AS bsum,
             COALESCE(b.bcnt, 0) AS bcnt
      FROM all_blocks a LEFT JOIN blocks b
        ON a.doc_id = b.doc_id AND a.blk = b.blk
    ),
    totals AS (
      SELECT doc_id, CAST(SUM(bsum) AS BIGINT) AS tsum,
             CAST(SUM(bcnt) AS BIGINT) AS tcnt
      FROM filled GROUP BY doc_id
    ),
    fp AS (
      SELECT f.doc_id,
             string_agg(
               CASE WHEN bsum * tcnt > tsum * bcnt THEN '1' ELSE '0' END,
               '' ORDER BY blk) AS wav_fp
      FROM filled f JOIN totals t USING (doc_id)
      GROUP BY f.doc_id
    )
    SELECT fp.doc_id, fp.wav_fp,
           CAST(d.n_chars AS BIGINT) AS n_frames,
           COUNT(*) OVER (PARTITION BY fp.wav_fp) AS n_same_fp,
           fp.doc_id = MIN(fp.doc_id) OVER (PARTITION BY fp.wav_fp)
             AS is_canonical
    FROM fp JOIN documents d USING (doc_id)
    """,
    doc=f"x125: WAV fingerprint dedup — write every document's byte "
    "stream as a real 8-bit PCM RIFF/WAV file (stdlib wave module), "
    "decode it back in a separate Arrow stage (container framing, "
    f"sample width and frame count verified), fold the samples into "
    f"a {_X125_BLOCKS}-bit average-energy fingerprint (x67's exact "
    "integer cross-multiply device, coarser blocks), and group by "
    "fingerprint to find duplicate audio: per row the group size and "
    "whether this doc is the canonical (min doc_id) copy — the "
    "audio-dedup step of a multimodal curation pipeline. Scale: "
    "fingerprints bucket the corpus exactly like x67; no pairwise "
    "compare; decode is per-partition parallel. Exactness: planted "
    "duplicate texts produce byte-identical WAVs, hence equal "
    "fingerprints, on both engines",
)
def x125_wav_fingerprint_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")

    def build(batches: Iterator) -> Iterator:
        import io
        import wave

        import pandas as pd

        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                buf = io.BytesIO()
                wf = wave.open(buf, "wb")
                wf.setnchannels(1)
                wf.setsampwidth(1)
                wf.setframerate(8000)
                wf.writeframes(text.encode("utf-8"))
                wf.close()
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    wavs = docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, payload binary"
    )

    def fingerprint(batches: Iterator) -> Iterator:
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                wf = wave.open(io.BytesIO(bytes(payload)))
                assert wf.getsampwidth() == 1 and wf.getnchannels() == 1
                n = wf.getnframes()
                arr = np.frombuffer(
                    wf.readframes(n), dtype=np.uint8
                ).astype(np.int64)
                blk = (np.arange(n) * _X125_BLOCKS) // n
                bsum = np.bincount(
                    blk, weights=arr, minlength=_X125_BLOCKS
                ).astype(np.int64)
                bcnt = np.bincount(blk, minlength=_X125_BLOCKS).astype(
                    np.int64
                )
                tsum, tcnt = int(arr.sum()), n
                bits = (bsum * tcnt) > (tsum * bcnt)
                rows.append(
                    (
                        int(doc_id),
                        "".join("1" if b else "0" for b in bits),
                        n,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "wav_fp", "n_frames"]
            )

    fp = wavs.mapInPandas(
        fingerprint, "doc_id long, wav_fp string, n_frames long"
    )
    wfp = W.partitionBy("wav_fp")
    return fp.select(
        "doc_id",
        "wav_fp",
        "n_frames",
        F.count("*").over(wfp).alias("n_same_fp"),
        (F.col("doc_id") == F.min("doc_id").over(wfp)).alias(
            "is_canonical"
        ),
    )


@register(
    "x126_caption_image_consistency",
    # The pairing audit: captions (documents.text) vs their image
    # payloads, where every 13th image was built from a TRUNCATED
    # pixel stream. Consistency = decoded height and pixel sum match
    # what the caption predicts; the oracle recomputes both sides of
    # the comparison from text arithmetic alone.
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, n_chars AS n,
             CAST(8 + doc_id % 9 AS BIGINT) AS w,
             CASE WHEN doc_id % {_X126_CORRUPT_MOD} = 0
                  THEN CAST(FLOOR(n_chars / 2.0) AS BIGINT)
                  ELSE CAST(n_chars AS BIGINT) END AS n_used
      FROM documents
    ),
    sums AS (
      SELECT b.doc_id,
             CAST(SUM(CASE WHEN u.pos <= b.n_used
                  THEN ascii(substr(d.text, CAST(u.pos AS INT), 1))
                  ELSE 0 END) AS BIGINT) AS actual_sum,
             CAST(SUM(ascii(substr(d.text, CAST(u.pos AS INT), 1)))
                  AS BIGINT) AS expected_sum
      FROM base b
      JOIN documents d USING (doc_id),
           (SELECT doc_id, unnest(range(1, n_chars + 1)) AS pos
            FROM documents) u
      WHERE u.doc_id = b.doc_id
      GROUP BY b.doc_id
    )
    SELECT b.doc_id, b.source,
           b.w AS width,
           GREATEST(1, CAST(FLOOR((b.n + b.w - 1) / b.w) AS BIGINT))
             AS expected_h,
           GREATEST(1, CAST(FLOOR((b.n_used + b.w - 1) / b.w) AS BIGINT))
             AS actual_h,
           GREATEST(1, CAST(FLOOR((b.n + b.w - 1) / b.w) AS BIGINT))
             = GREATEST(1, CAST(FLOOR((b.n_used + b.w - 1) / b.w)
               AS BIGINT)) AS h_match,
           s.expected_sum = s.actual_sum AS sum_match,
           (GREATEST(1, CAST(FLOOR((b.n + b.w - 1) / b.w) AS BIGINT))
             = GREATEST(1, CAST(FLOOR((b.n_used + b.w - 1) / b.w)
               AS BIGINT)))
             AND s.expected_sum = s.actual_sum AS pair_consistent
    FROM base b JOIN sums s USING (doc_id)
    """,
    doc=f"x126: image<->caption pairing consistency audit — join every "
    "caption to its (deliberately sometimes-corrupted: every "
    f"{_X126_CORRUPT_MOD}th image is built from a truncated pixel "
    "stream) PNG payload, REALLY decode the image, and flag pairs "
    "whose decoded geometry (height) or content (pixel sum) "
    "contradicts what the caption predicts — the text<->image "
    "alignment gate a multimodal training pipeline runs before "
    "admitting pairs (mismatched pairs poison contrastive "
    "training). Scale: one hash join caption->payload on doc_id, "
    "decode per Arrow batch, no shuffle beyond the join. Exactness: "
    "heights and pixel sums are integers; the oracle re-derives "
    "both the decoded truth and the caption prediction from text",
)
def x126_caption_image_consistency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pngs = _png_payloads(docs, corrupt_mod=_X126_CORRUPT_MOD)

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        from . import png_codec

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, ch, pixels = png_codec.decode_png(bytes(payload))
                rows.append((int(doc_id), w, h, sum(pixels)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "actual_h", "actual_sum"]
            )

    decoded = pngs.mapInPandas(
        decode, "doc_id long, width long, actual_h long, actual_sum long"
    )

    caption = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").alias("n"),
        (F.lit(8) + F.col("doc_id") % 9).cast("bigint").alias("w"),
    )
    # caption-predicted content: byte sum of the FULL text, computed
    # JVM-side (split to chars -> ascii -> fold), never touching the
    # binary column
    exp_sum = docs.select(
        "doc_id",
        F.aggregate(
            F.transform(
                F.split(F.col("text"), ""),
                lambda c: F.when(F.length(c) > 0, F.ascii(c)).otherwise(
                    F.lit(0)
                ).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("expected_sum"),
    )
    geo = caption.select(
        "doc_id",
        "source",
        "w",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.floor((F.col("n") + F.col("w") - 1) / F.col("w")).cast(
                "bigint"
            ),
        ).alias("expected_h"),
    )
    out = (
        decoded.join(geo, "doc_id")
        .join(exp_sum, "doc_id")
        .select(
            "doc_id",
            "source",
            F.col("w").alias("width"),
            "expected_h",
            "actual_h",
            (F.col("expected_h") == F.col("actual_h")).alias("h_match"),
            (F.col("expected_sum") == F.col("actual_sum")).alias(
                "sum_match"
            ),
            (
                (F.col("expected_h") == F.col("actual_h"))
                & (F.col("expected_sum") == F.col("actual_sum"))
            ).alias("pair_consistent"),
        )
    )
    return out


# --- x138: animated-GIF frame-sequence dedup (VERDICT r8 directive #6) ---------

_X138_FRAME_LEN = 64   # 8x8 grayscale frame = 64 pixels = 64 text bytes
_X138_MAX_FRAMES = 4
_X138_MIN_SHARED = 2   # aligned frame-hash matches needed for an edge


def _gif_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic animated GIF per document: frame j's 8x8 grayscale
    pixels are text bytes [j*64, (j+1)*64) zero-padded, up to 4 frames
    (ceil(n_chars/64) capped). Real multi-frame GIF89a bytes via the
    vendored LZW encoder."""
    docs = fan_out(docs, docs.sparkSession)  # r11: parallelize the codec (see _png_payloads)

    def build(batches: Iterator) -> Iterator:
        import pandas as pd

        from . import gif_codec

        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                data = text.encode("utf-8")
                nf = max(1, min(-(-len(data) // _X138_FRAME_LEN), _X138_MAX_FRAMES))
                frames = []
                for j in range(nf):
                    sl = data[j * _X138_FRAME_LEN : (j + 1) * _X138_FRAME_LEN]
                    sl = sl + bytes(_X138_FRAME_LEN - len(sl))
                    frames.append((8, 8, sl))
                payloads.append(gif_codec.encode_gif_gray(frames))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    return docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, payload binary"
    )


def _x138_frame_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, frame_idx, fhash): decode every GIF frame with the real
    vendored decoder and aHash it — 64 pixels, 64 bits, bit_i set iff
    px_i * 64 > frame_sum (x67's integer cross-multiply device, exact
    on both engines)."""
    docs = load_table(spark, sf_dir, "documents")
    gifs = _gif_payloads(docs)

    def hash_frames(batches: Iterator) -> Iterator:
        import pandas as pd

        from . import gif_codec

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "fhash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for j, (w, h, px) in enumerate(gif_codec.decode_gif(bytes(payload))):
                    assert (w, h) == (8, 8)
                    s = sum(px)
                    bits = "".join(
                        "1" if px[i] * _X138_FRAME_LEN > s else "0"
                        for i in range(_X138_FRAME_LEN)
                    )
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(j)
                    out["fhash"].append(bits)
            yield pd.DataFrame(out)

    return gifs.mapInPandas(
        hash_frames, "doc_id long, frame_idx long, fhash string"
    )


def _x138_oracle() -> str:
    """SQL twin: per-(doc, frame) aHash from the source text (padding
    bytes are 0 and contribute nothing to the sum but DO occupy bit
    positions), aligned-frame equality edges with >= 2 shared frames,
    WITH RECURSIVE min-id closure (the x15 component device)."""
    L, MAXF, MIN_SH = _X138_FRAME_LEN, _X138_MAX_FRAMES, _X138_MIN_SHARED
    return f"""
    WITH RECURSIVE fgrid AS (
      SELECT doc_id, n_chars AS n, unnest(range(0, {MAXF})) AS j
      FROM documents
    ),
    fvalid AS (
      SELECT doc_id, n, j FROM fgrid WHERE j = 0 OR j * {L} < n
    ),
    px AS (
      SELECT f.doc_id, f.j, p.pos,
             CASE WHEN f.j * {L} + p.pos <= f.n
                  THEN ascii(substr(d.text, CAST(f.j * {L} + p.pos AS INT), 1))
                  ELSE 0 END AS code
      FROM fvalid f
      JOIN documents d USING (doc_id)
      CROSS JOIN (SELECT unnest(range(1, {L} + 1)) AS pos) p
    ),
    fsum AS (
      SELECT doc_id, j, CAST(SUM(code) AS BIGINT) AS s
      FROM px GROUP BY doc_id, j
    ),
    fhash AS (
      SELECT p.doc_id, p.j,
             string_agg(CASE WHEN p.code * {L} > f.s THEN '1' ELSE '0' END,
                        '' ORDER BY p.pos) AS fhash
      FROM px p JOIN fsum f ON p.doc_id = f.doc_id AND p.j = f.j
      GROUP BY p.doc_id, p.j
    ),
    edges0 AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM fhash a JOIN fhash b
        ON a.j = b.j AND a.fhash = b.fhash AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING COUNT(DISTINCT a.j) >= {MIN_SH}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM edges0
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM edges0
    ),
    reach(a, b) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    ),
    closure AS (
      SELECT a, b FROM reach
      UNION
      SELECT DISTINCT src AS a, src AS b FROM edges
    ),
    comp AS (SELECT a AS doc_id, MIN(b) AS component FROM closure GROUP BY a)
    SELECT component,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MIN(doc_id) AS canonical_doc_id
    FROM comp GROUP BY component
    """


@register(
    "x138_gif_frame_dedup",
    oracle=_x138_oracle(),
    doc="x138: animated-GIF frame-sequence near-dedup — every document "
    "becomes a real multi-frame GIF89a (vendored LZW encoder; frame j "
    "= 8x8 grayscale of text bytes [64j, 64j+64)), a second Arrow "
    "stage REALLY decodes each frame (LZW, color table, luma) and "
    "aHashes it with x67's integer cross-multiply device, then docs "
    "sharing >= 2 aligned frame hashes become edges and x15's "
    "label-propagation components group the clips; one row per "
    "component with size and canonical member. The near-dup shape for "
    "video/animation corpora: frame-level signatures + set overlap, "
    "never pixel-pairwise. Scale: encode/decode/hash stay inside "
    "executor Arrow batches; the pair join is hash-partitioned on "
    "(frame_idx, fhash) buckets like LSH (x08); components converge "
    "in O(log diameter) pointer-jump rounds. Exactness: aHash bits "
    "are pure integer comparisons; the oracle recomputes them from "
    "text and closes the same edge set with WITH RECURSIVE. "
    "Ref parity: reference media dedup pass (src/enhanced_ingestion."
    "py:300-340)",
)
def x138_gif_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .components import connected_components

    # r11: eager-checkpoint the frame-hash table — it feeds BOTH sides
    # of the aligned-frame self-join, and unpinned the whole GIF
    # encode+decode mapInPandas pipeline (the dominant cost, real codec
    # work in Python) executed twice per action (guide §1.2 step 1).
    # Bounded: <= MAX_FRAMES narrow rows per doc.
    fh = _x138_frame_hashes(spark, sf_dir).localCheckpoint(eager=True)
    a = fh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("frame_idx").alias("ja"),
        F.col("fhash").alias("ha"),
    )
    b = fh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("frame_idx").alias("jb"),
        F.col("fhash").alias("hb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("ja") == F.col("jb"))
            & (F.col("ha") == F.col("hb"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.countDistinct("ja").alias("n_shared"))
        .filter(F.col("n_shared") >= _X138_MIN_SHARED)
        .select("doc_a", "doc_b")
    )
    comps = connected_components(pairs)
    return comps.groupBy("component").agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.min("doc_id").alias("canonical_doc_id"),
    )


# --- x139: PNG tEXt/iTXt metadata extraction audit (VERDICT r8 directive #6) ---

_X139_COMMENT_CHARS = 24


def _png_text_payloads(docs: DataFrame) -> DataFrame:
    """PNG per document with embedded EXIF-style metadata: two tEXt
    chunks (``source``, ``lang`` — latin-1 key\\0value), one iTXt chunk
    (``comment`` — uncompressed UTF-8, first 24 chars of the text,
    empty language tag / translated keyword), and a 1x1 IDAT whose
    pixel is n_chars % 256. Chunk layout: IHDR, tEXt, tEXt, iTXt,
    IDAT, IEND (6 chunks)."""

    def build(batches: Iterator) -> Iterator:
        import struct
        import zlib

        import pandas as pd

        from . import png_codec

        def chunk(ctype: bytes, payload: bytes) -> bytes:
            body = ctype + payload
            return (
                struct.pack(">I", len(payload))
                + body
                + struct.pack(">I", zlib.crc32(body))
            )

        for pdf in batches:
            payloads = []
            for text, lang, source, n_chars in zip(
                pdf["text"], pdf["lang"], pdf["source"], pdf["n_chars"]
            ):
                ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
                px = bytes([int(n_chars) % 256])
                idat = zlib.compress(b"\x00" + px, 9)
                comment = text[:_X139_COMMENT_CHARS].encode("utf-8")
                payloads.append(
                    png_codec.PNG_SIG
                    + chunk(b"IHDR", ihdr)
                    + chunk(b"tEXt", b"source\x00" + source.encode("latin-1"))
                    + chunk(b"tEXt", b"lang\x00" + lang.encode("latin-1"))
                    + chunk(
                        b"iTXt",
                        b"comment\x00\x00\x00\x00\x00" + comment,
                    )
                    + chunk(b"IDAT", idat)
                    + chunk(b"IEND", b"")
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    return docs.select("doc_id", "text", "lang", "source", "n_chars").mapInPandas(
        build, "doc_id long, payload binary"
    )


@register(
    "x139_png_text_metadata",
    # Every output field reconstructs from the documents row the chunk
    # was built from: the decode stage must walk the real chunk stream,
    # CRC-check each metadata chunk, split tEXt at the NUL, parse the
    # 5-field iTXt header, and inflate the 1x1 IDAT back to the pixel.
    oracle=f"""
    SELECT doc_id,
           CAST(2 AS BIGINT) AS n_text,
           CAST(1 AS BIGINT) AS n_itxt,
           source AS source_val,
           lang AS lang_val,
           substr(text, 1, {_X139_COMMENT_CHARS}) AS comment_val,
           CAST(n_chars % 256 AS BIGINT) AS px_val,
           TRUE AS meta_crc_ok,
           CAST(6 AS BIGINT) AS n_chunks
    FROM documents
    """,
    doc="x139: EXIF-style PNG textual-metadata extraction audit — the "
    "builder embeds source/lang as tEXt chunks, a UTF-8 comment as a "
    "full 5-field iTXt chunk and the doc length as the 1x1 pixel; the "
    "Arrow-batched decode stage walks the byte-level chunk stream, "
    "verifies each metadata chunk's CRC-32, splits keys from values "
    "at the NUL separators, parses the iTXt header (compression flag/"
    "method, language tag, translated keyword) and inflates the IDAT "
    "to recover the pixel. The metadata-trust pass an ingest pipeline "
    "runs before accepting third-party image annotations (x124 covers "
    "geometry; this covers the textual side-channel). Scale: "
    "per-payload work inside executor batches, embarrassingly "
    "parallel. Exactness: strings and integers only. Ref parity: "
    "reference media-metadata extraction (src/enhanced_ingestion.py:"
    "300-340)",
)
def x139_png_text_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pngs = _png_text_payloads(docs)

    def extract(batches: Iterator) -> Iterator:
        import struct
        import zlib

        import pandas as pd

        from . import png_codec

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                assert b[:8] == png_codec.PNG_SIG
                off, n_chunks, n_text, n_itxt = 8, 0, 0, 0
                kv: dict[str, str] = {}
                comment = ""
                px_val = -1
                crc_ok = True
                while off < len(b):
                    (clen,) = struct.unpack(">I", b[off : off + 4])
                    ctype = b[off + 4 : off + 8]
                    body = b[off + 8 : off + 8 + clen]
                    (crc,) = struct.unpack(
                        ">I", b[off + 8 + clen : off + 12 + clen]
                    )
                    n_chunks += 1
                    if ctype == b"tEXt":
                        n_text += 1
                        crc_ok &= zlib.crc32(ctype + body) == crc
                        key, _, val = body.partition(b"\x00")
                        kv[key.decode("latin-1")] = val.decode("latin-1")
                    elif ctype == b"iTXt":
                        n_itxt += 1
                        crc_ok &= zlib.crc32(ctype + body) == crc
                        key, _, rest = body.partition(b"\x00")
                        comp_flag, comp_method = rest[0], rest[1]
                        assert comp_flag == 0 and comp_method == 0
                        lang_tag, _, rest2 = rest[2:].partition(b"\x00")
                        trans_key, _, utf8_text = rest2.partition(b"\x00")
                        assert lang_tag == b"" and trans_key == b""
                        if key == b"comment":
                            comment = utf8_text.decode("utf-8")
                    elif ctype == b"IDAT":
                        raw = zlib.decompress(body)
                        px_val = raw[1]  # filter byte then the pixel
                    off += 12 + clen
                rows.append(
                    (
                        int(doc_id), n_text, n_itxt,
                        kv.get("source", ""), kv.get("lang", ""),
                        comment, px_val, bool(crc_ok), n_chunks,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_text", "n_itxt", "source_val",
                    "lang_val", "comment_val", "px_val",
                    "meta_crc_ok", "n_chunks",
                ],
            )

    return pngs.mapInPandas(
        extract,
        "doc_id long, n_text long, n_itxt long, source_val string, "
        "lang_val string, comment_val string, px_val long, "
        "meta_crc_ok boolean, n_chunks long",
    )


# --- x147: nearest-neighbor image downsample (the resize stage) -------------------------

_X147_SCHEMA = (
    "doc_id long, src_w long, src_h long, dst_w long, dst_h long, "
    "dst_px_sum long"
)


@register(
    "x147_image_downsample",
    # The brief's RESIZE stage made real: decode each doc's actual PNG
    # (vendored codec), nearest-neighbor 2x downsample (keep pixels at
    # even rows/cols), RE-ENCODE the thumbnail as a new PNG and decode
    # THAT to emit dims + pixel sum — so the full decode->transform->
    # encode->decode loop is under test, not just the arithmetic. The
    # oracle reconstructs the kept-pixel sum straight from the text
    # bytes (row-major layout, width 8 + doc_id % 9, zero padding).
    oracle="""
    WITH base AS (
      SELECT doc_id, n_chars AS n,
             CAST(8 + doc_id % 9 AS BIGINT) AS w
      FROM documents
    ),
    px AS (
      SELECT b.doc_id,
             CAST(SUM(CASE WHEN ((u.pos - 1) // b.w) % 2 = 0
                            AND ((u.pos - 1) % b.w) % 2 = 0
                       THEN ascii(substr(d.text, CAST(u.pos AS INT), 1))
                       ELSE 0 END) AS BIGINT) AS dst_sum
      FROM base b
      JOIN documents d USING (doc_id)
      JOIN (SELECT doc_id, unnest(range(1, n_chars + 1)) AS pos
            FROM documents) u ON u.doc_id = b.doc_id
      GROUP BY b.doc_id
    ),
    dims AS (
      SELECT doc_id, w AS src_w,
             GREATEST(1, CAST(FLOOR((n + w - 1) / w) AS BIGINT)) AS src_h
      FROM base
    )
    SELECT d.doc_id, d.src_w, d.src_h,
           CAST((d.src_w + 1) // 2 AS BIGINT) AS dst_w,
           CAST((d.src_h + 1) // 2 AS BIGINT) AS dst_h,
           COALESCE(px.dst_sum, 0) AS dst_px_sum
    -- LEFT JOIN + COALESCE: an n_chars = 0 document has no unnested
    -- positions, so px has no row for it; the Spark side still emits a
    -- zero-sum 1-row-padded image. Inner join would silently depend on
    -- the generator's min-n_chars invariant (ADVICE r9).
    FROM dims d LEFT JOIN px USING (doc_id)
    """,
    doc="x147: image thumbnail stage — real PNG decode (vendored "
    "codec), nearest-neighbor 2x downsample keeping even rows/cols, "
    "re-encode as a genuine PNG and decode the thumbnail back for "
    "the emitted dims + pixel sum, closing the decode->resize->"
    "encode loop the multimodal brief names. Scale: payloads never "
    "leave executor Arrow batches; per-partition parallel; thumbnail "
    "bytes are ~1/4 the source (the shuffle-mass argument for "
    "resizing BEFORE any exchange at 100 TB). Exactness: the oracle "
    "rebuilds the kept-pixel sum from text bytes via the row-major "
    "(width = 8 + doc_id % 9) layout x124 already certifies",
)
def x147_image_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pngs = _png_payloads(docs)

    def resize(batches: Iterator) -> Iterator:
        import pandas as pd

        from . import png_codec

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _, pixels = png_codec.decode_png(bytes(payload))
                dst_w, dst_h = (w + 1) // 2, (h + 1) // 2
                dst = bytes(
                    pixels[(2 * i) * w + (2 * j)]
                    for i in range(dst_h)
                    for j in range(dst_w)
                )
                thumb = png_codec.encode_png_gray(dst_w, dst_h, dst)
                tw, th, _, tpx = png_codec.decode_png(thumb)
                assert (tw, th) == (dst_w, dst_h)
                rows.append(
                    (int(doc_id), w, h, tw, th, sum(tpx))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "src_w", "src_h", "dst_w", "dst_h",
                    "dst_px_sum",
                ],
            )

    return pngs.mapInPandas(resize, _X147_SCHEMA)


# --- x148: audio decimation (frame-sampling) audit --------------------------------------

_X148_FACTOR = 4  # keep every 4th frame: 8 kHz -> 2 kHz

_X148_SCHEMA = (
    "doc_id long, n_frames_in long, rate_out long, n_frames_out long, "
    "out_sum long, out_energy long"
)


@register(
    "x148_audio_decimate",
    # The frame-sampling stage for audio: decode each doc's real
    # RIFF/WAV (stdlib wave), keep every 4th sample, re-encode at the
    # decimated rate and decode THAT container for the emitted frame
    # count, amplitude sum and integer energy (sum of squared codes) —
    # container framing under test on both passes. Oracle reconstructs
    # everything from text positions = 1 (mod 4).
    oracle=f"""
    WITH kept AS (
      SELECT d.doc_id,
             ascii(substr(d.text, CAST(u.pos AS INT), 1)) AS code
      FROM documents d
      JOIN (SELECT doc_id, unnest(range(1, n_chars + 1)) AS pos
            FROM documents) u
        ON u.doc_id = d.doc_id AND (u.pos - 1) % {_X148_FACTOR} = 0
    )
    SELECT d.doc_id,
           CAST(d.n_chars AS BIGINT) AS n_frames_in,
           CAST(8000 // {_X148_FACTOR} AS BIGINT) AS rate_out,
           CAST(COUNT(k.code) AS BIGINT) AS n_frames_out,
           CAST(COALESCE(SUM(k.code), 0) AS BIGINT) AS out_sum,
           CAST(COALESCE(SUM(k.code * k.code), 0) AS BIGINT) AS out_energy
    -- LEFT JOIN + COALESCE: an n_chars = 0 document decimates to an
    -- empty WAV (0 frames, 0 sum/energy) on the Spark side; inner join
    -- would drop it here and depend on the generator's min-n_chars
    -- invariant (ADVICE r9).
    FROM documents d LEFT JOIN kept k USING (doc_id)
    GROUP BY d.doc_id, d.n_chars
    """,
    doc=f"x148: audio frame-sampling — real WAV decode (stdlib wave "
    f"container), decimate by {_X148_FACTOR} (8 kHz -> 2 kHz), "
    "re-encode at the new rate and decode the result for frame "
    "count, amplitude sum and exact integer energy. The audio "
    "analog of x147's image resize: both make the 'shrink before "
    "you shuffle' stage real byte-level work, per-partition "
    "parallel, payloads inside Arrow batches. Exactness: kept "
    "samples are the text bytes at positions = 1 (mod "
    f"{_X148_FACTOR}); sums/energies are exact BIGINTs the oracle "
    "rebuilds with ascii/substr",
)
def x148_audio_decimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    def run(batches: Iterator) -> Iterator:
        import io
        import wave

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8")
                buf = io.BytesIO()
                wf = wave.open(buf, "wb")
                wf.setnchannels(1)
                wf.setsampwidth(1)
                wf.setframerate(8000)
                wf.writeframes(data)
                wf.close()
                rdr = wave.open(io.BytesIO(buf.getvalue()), "rb")
                assert rdr.getframerate() == 8000
                frames = rdr.readframes(rdr.getnframes())
                rdr.close()
                dec = frames[:: _X148_FACTOR]
                out = io.BytesIO()
                wo = wave.open(out, "wb")
                wo.setnchannels(1)
                wo.setsampwidth(1)
                wo.setframerate(8000 // _X148_FACTOR)
                wo.writeframes(dec)
                wo.close()
                rd2 = wave.open(io.BytesIO(out.getvalue()), "rb")
                rate_out = rd2.getframerate()
                out_frames = rd2.readframes(rd2.getnframes())
                rd2.close()
                rows.append(
                    (
                        int(doc_id),
                        len(frames),
                        rate_out,
                        len(out_frames),
                        sum(out_frames),
                        sum(c * c for c in out_frames),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames_in", "rate_out", "n_frames_out",
                    "out_sum", "out_energy",
                ],
            )

    return docs.select("doc_id", "text").mapInPandas(run, _X148_SCHEMA)


# --- x151: JPEG dimension/EXIF metadata audit (segment walk) --------------------------


def _jpeg_payloads(docs: DataFrame) -> DataFrame:
    """Build a real JFIF/EXIF byte stream per document: SOI, APP1 (EXIF
    TIFF IFD0 with Orientation + ResolutionUnit, byte order alternating
    II/MM by doc_id), DQT, SOF0 carrying the x124 width convention
    (width = 8 + doc_id % 9), SOS, entropy bytes = the text (ASCII, so
    no 0xFF marker collision), EOI. Pure stdlib (struct)."""

    def build(batches: Iterator) -> Iterator:
        import struct

        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                data = text.encode("utf-8")
                w = 8 + doc_id % 9
                h = max(1, -(-len(data) // w))
                le = doc_id % 2 == 0
                bo = "<" if le else ">"
                tiff = b"II" if le else b"MM"
                tiff += struct.pack(bo + "HI", 42, 8)
                tiff += struct.pack(bo + "H", 2)  # 2 IFD0 entries
                orient = 1 + doc_id % 8
                res = 2 + doc_id % 2
                for tag, val in ((0x0112, orient), (0x0128, res)):
                    tiff += struct.pack(bo + "HHI", tag, 3, 1)
                    # TIFF: sub-4-byte values are LEFT-justified in the
                    # 4-byte slot for both byte orders
                    tiff += struct.pack(bo + "H", val) + b"\x00\x00"
                tiff += struct.pack(bo + "I", 0)  # no next IFD
                app1 = b"Exif\x00\x00" + tiff
                segs = b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
                dqt = bytes([(i * 7) % 255 + 1 for i in range(64)])
                segs += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + dqt
                sof = struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"
                segs += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
                sos = b"\x01\x01\x00\x00\x3f\x00"
                segs += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
                payloads.append(b"\xff\xd8" + segs + data + b"\xff\xd9")
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    return docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, payload binary"
    )


def _parse_jpeg(payload: bytes):
    """Walk the real marker stream: SOI, per-segment big-endian lengths,
    APP1 -> TIFF IFD0 (both byte orders), SOF0 dims, SOS entropy scan to
    EOI. Pure stdlib (struct) — the vendored-codec pattern x124/x139 use
    for PNG, applied to JPEG's segment grammar."""
    import struct

    assert payload[:2] == b"\xff\xd8"
    off = 2
    width = height = precision = orientation = res_unit = -1
    little = False
    n_segments = 0
    entropy_len = -1
    while off < len(payload):
        assert payload[off] == 0xFF, payload[off]
        marker = payload[off + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", payload[off + 2 : off + 4])
        body = payload[off + 4 : off + 2 + seglen]
        n_segments += 1
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            little = tiff[:2] == b"II"
            bo = "<" if little else ">"
            (magic,) = struct.unpack(bo + "H", tiff[2:4])
            assert magic == 42
            (ifd_off,) = struct.unpack(bo + "I", tiff[4:8])
            (count,) = struct.unpack(bo + "H", tiff[ifd_off : ifd_off + 2])
            p = ifd_off + 2
            for _ in range(count):
                tag, typ, cnt = struct.unpack(bo + "HHI", tiff[p : p + 8])
                (val,) = struct.unpack(bo + "H", tiff[p + 8 : p + 10])
                if tag == 0x0112:
                    orientation = val
                elif tag == 0x0128:
                    res_unit = val
                p += 12
        elif marker == 0xC0:
            precision, height, width = struct.unpack(">BHH", body[:5])
        off += 2 + seglen
        if marker == 0xDA:
            end = payload.index(b"\xff\xd9", off)
            entropy_len = end - off
            off = end
    return (
        width, height, precision, orientation, res_unit,
        little, n_segments, entropy_len,
    )


_X151_SCHEMA = (
    "doc_id long, width long, height long, jpeg_precision long, "
    "orientation long, res_unit long, exif_little_endian boolean, "
    "n_segments long, entropy_len long"
)


@register(
    "x151_jpeg_exif_audit",
    # Every emitted field is a pure function of (doc_id, n_chars):
    # width = 8 + doc_id % 9 (the x124 convention), height =
    # ceil(n_chars / width) floored at 1, orientation = 1 + doc_id % 8,
    # res_unit = 2 + doc_id % 2, byte order II when doc_id is even,
    # 4 marker segments (APP1/DQT/SOF0/SOS), entropy bytes = n_chars.
    # The Spark side derives them all from the PARSED BYTES (two real
    # passes: encoder then independent segment-walk parser, alternating
    # TIFF endianness) — any grammar disagreement breaks the hash match.
    oracle="""
    SELECT doc_id,
           CAST(8 + doc_id % 9 AS BIGINT) AS width,
           GREATEST(1, CAST(FLOOR((n_chars + (8 + doc_id % 9) - 1)
                                  / (8 + doc_id % 9)) AS BIGINT))
             AS height,
           CAST(8 AS BIGINT) AS jpeg_precision,
           CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
           CAST(2 + doc_id % 2 AS BIGINT) AS res_unit,
           doc_id % 2 = 0 AS exif_little_endian,
           CAST(4 AS BIGINT) AS n_segments,
           CAST(n_chars AS BIGINT) AS entropy_len
    FROM documents
    """,
    doc="x151: JPEG dimension/EXIF audit — encode every document as a "
    "real JPEG byte stream (SOI, EXIF APP1 with a TIFF IFD whose byte "
    "order alternates II/MM, DQT, SOF0, SOS, entropy data, EOI), then "
    "parse it back with an independent pure-stdlib segment walk: "
    "big-endian marker lengths, both TIFF endiannesses, left-justified "
    "SHORT value slots, entropy scan to EOI. The metadata-extraction "
    "stage a multimodal curation pipeline runs before any decode — "
    "dims/orientation come from bytes, not a codec dependency. Scale: "
    "payloads never leave executor Arrow batches; per-partition "
    "parallel; output is fixed-width metadata (the 'parse headers, "
    "ship metadata, not pixels' argument at 100 TB). No reference "
    "analog — extension per brief (multimodal round 4, VERDICT r9 "
    "directive #6a)",
)
def x151_jpeg_exif_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    jpegs = _jpeg_payloads(docs)

    def audit(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                (w, h, prec, orient, res, little, nseg, elen) = _parse_jpeg(
                    bytes(payload)
                )
                rows.append(
                    (int(doc_id), w, h, prec, orient, res, little, nseg, elen)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "jpeg_precision",
                    "orientation", "res_unit", "exif_little_endian",
                    "n_segments", "entropy_len",
                ],
            )

    return jpegs.mapInPandas(audit, _X151_SCHEMA)


# --- x152: audio spectral-fingerprint dedup (exact integer Goertzel bins) -------------


_X152_SCHEMA = (
    "doc_id long, n_frames long, dc long, re_q long, im_q long, "
    "nyq long"
)


@register(
    "x152_audio_spectral_dedup",
    # Spectral dedup with EXACT integer DFT bins: at omega = pi/2 the
    # Goertzel recurrence s[n] = x[n] + 2cos(omega)*s[n-1] - s[n-2]
    # degenerates to s[n] = x[n] - s[n-2] (2cos = 0) — an all-integer
    # filter whose closed form is the quarter-Nyquist DFT bin
    # Re = sum(x[0::4]) - sum(x[2::4]), Im = sum(x[3::4]) - sum(x[1::4]);
    # at omega = pi it is the alternating Nyquist sum. Both engines
    # compute the SAME integers — no float rounding device needed.
    # Samples are the text's byte codes decoded out of a real RIFF/WAV
    # container (x125's build), so framing is under test too.
    oracle="""
    WITH codes AS (
      SELECT d.doc_id,
             ascii(substr(d.text, CAST(u.pos AS INT), 1)) AS code,
             (u.pos - 1) % 4 AS m4,
             (u.pos - 1) % 2 AS m2
      FROM documents d
      JOIN (SELECT doc_id, unnest(range(1, n_chars + 1)) AS pos
            FROM documents) u ON u.doc_id = d.doc_id
    ),
    bins AS (
      SELECT d.doc_id,
             CAST(d.n_chars AS BIGINT) AS n_frames,
             CAST(COALESCE(SUM(c.code), 0) AS BIGINT) AS dc,
             CAST(COALESCE(SUM(CASE WHEN c.m4 = 0 THEN c.code
                                    WHEN c.m4 = 2 THEN -c.code
                                    ELSE 0 END), 0) AS BIGINT) AS re_q,
             CAST(COALESCE(SUM(CASE WHEN c.m4 = 3 THEN c.code
                                    WHEN c.m4 = 1 THEN -c.code
                                    ELSE 0 END), 0) AS BIGINT) AS im_q,
             CAST(COALESCE(SUM(CASE WHEN c.m2 = 0 THEN c.code
                                    ELSE -c.code END), 0) AS BIGINT)
               AS nyq
      -- LEFT JOIN + COALESCE: an n_chars = 0 document has no unnested
      -- positions; the Spark side still emits an all-zero-bin row
      -- (ADVICE r9 — never depend on the generator's min-n_chars)
      FROM documents d LEFT JOIN codes c USING (doc_id)
      GROUP BY d.doc_id, d.n_chars
    )
    SELECT doc_id, n_frames, dc, re_q, im_q, nyq,
           COUNT(*) OVER (PARTITION BY dc, re_q, im_q, nyq)
             AS n_same_sig,
           doc_id = MIN(doc_id) OVER (PARTITION BY dc, re_q, im_q, nyq)
             AS is_canonical
    FROM bins
    """,
    doc="x152: audio spectral-fingerprint dedup — decode each doc's "
    "real RIFF/WAV (stdlib wave), run the exact-integer Goertzel "
    "filter at quarter-Nyquist (s[n] = x[n] - s[n-2], the 2cos(pi/2)=0 "
    "degenerate recurrence) plus the DC and Nyquist bins, and group "
    "the corpus by the 4-integer spectral signature: per row the "
    "signature-group size and whether this doc is the canonical (min "
    "doc_id) copy. Complements x125's time-domain energy fingerprint "
    "with a frequency-domain one — two independent signatures is the "
    "standard audio-dedup belt-and-braces. Scale: one decode pass, "
    "per-partition parallel; the only shuffle is the signature window "
    "(exact-dup groups are tiny); signatures are 32 bytes/doc however "
    "long the audio is. Exactness: integer bins are identical across "
    "engines by construction; planted duplicate texts give "
    "byte-identical WAVs hence equal signatures. No reference analog "
    "— extension per brief (multimodal round 4, VERDICT r9 directive "
    "#6b)",
)
def x152_audio_spectral_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")

    def bins(batches: Iterator) -> Iterator:
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                buf = io.BytesIO()
                wf = wave.open(buf, "wb")
                wf.setnchannels(1)
                wf.setsampwidth(1)
                wf.setframerate(8000)
                wf.writeframes(text.encode("utf-8"))
                wf.close()
                rd = wave.open(io.BytesIO(buf.getvalue()))
                assert rd.getsampwidth() == 1 and rd.getnchannels() == 1
                n = rd.getnframes()
                arr = np.frombuffer(
                    rd.readframes(n), dtype=np.uint8
                ).astype(np.int64)
                rd.close()
                rows.append(
                    (
                        int(doc_id),
                        n,
                        int(arr.sum()),
                        int(arr[0::4].sum() - arr[2::4].sum()),
                        int(arr[3::4].sum() - arr[1::4].sum()),
                        int(arr[0::2].sum() - arr[1::2].sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_frames", "dc", "re_q", "im_q", "nyq"],
            )

    sig = docs.select("doc_id", "text").mapInPandas(bins, _X152_SCHEMA)
    wsig = W.partitionBy("dc", "re_q", "im_q", "nyq")
    return sig.select(
        "doc_id", "n_frames", "dc", "re_q", "im_q", "nyq",
        F.count("*").over(wsig).alias("n_same_sig"),
        (F.col("doc_id") == F.min("doc_id").over(wsig)).alias(
            "is_canonical"
        ),
    )


# --- x154: JPEG quantized-block pixel checksum (DQT-weighted, DCT-free) ----------------


_X154_SCHEMA = (
    "doc_id long, n_blocks long, last_block_fill long, dqt_sum long, "
    "dequant_checksum long, quant_sum long"
)


@register(
    "x154_jpeg_quantized_checksum",
    # Pixel-CONTENT audit for the JPEG path (VERDICT r10 directive #6a;
    # x151 covered headers only): re-parse the real byte stream, pull
    # the actual DQT table out of the 0xFFDB segment and the entropy
    # bytes out of the SOS..EOI scan, then fold the scan through the
    # table exactly the way dequantization walks coefficient blocks —
    # position p in its 64-sample block is weighted by table entry
    # q[p % 64]. Two exact integer checksums: dequant (sum c*q, the
    # multiply path) and quant (sum c // q, the divide path a real
    # quantizer runs). The encoder wrote q[i] = (i*7) % 255 + 1 and
    # entropy bytes = the text, so the oracle reconstructs both
    # checksums from the source text with the x124 per-char unnest
    # device — but the Spark side uses only PARSED bytes: a wrong
    # segment length, a mis-sliced table, or an off-by-one block
    # boundary breaks the hash match. dqt_sum = 7291 is the closed
    # form sum of the spec table (sum_i (7i mod 255) + 64) — a parse
    # integrity check, constant by construction.
    oracle="""
    WITH codes AS (
      SELECT d.doc_id,
             ascii(substr(d.text, CAST(u.pos AS INT), 1)) AS code,
             ((((u.pos - 1) % 64) * 7) % 255) + 1 AS q
      FROM documents d
      JOIN (SELECT doc_id, unnest(range(1, n_chars + 1)) AS pos
            FROM documents) u ON u.doc_id = d.doc_id
    )
    SELECT d.doc_id,
           CAST(FLOOR((d.n_chars + 63) / 64) AS BIGINT) AS n_blocks,
           CAST(d.n_chars % 64 AS BIGINT) AS last_block_fill,
           CAST(7291 AS BIGINT) AS dqt_sum,
           CAST(COALESCE(SUM(c.code * c.q), 0) AS BIGINT)
             AS dequant_checksum,
           CAST(COALESCE(SUM(CAST(FLOOR(c.code / c.q) AS BIGINT)), 0)
                AS BIGINT) AS quant_sum
    FROM documents d LEFT JOIN codes c USING (doc_id)
    GROUP BY d.doc_id, d.n_chars
    """,
    doc="x154: JPEG quantized-block checksum — the pixel-content "
    "companion to x151's header audit (completing the PNG parallel: "
    "x124 header+pixels, x151 header, x154 pixels). Parses the real "
    "DQT segment and the SOS entropy scan back out of each encoded "
    "stream and folds the scan through the parsed quantization table "
    "in 64-sample blocks: dequant_checksum = sum(c * q[p mod 64]) and "
    "quant_sum = sum(c div q[p mod 64]) — the multiply and the "
    "integer-divide paths a real (de)quantizer runs per coefficient, "
    "without needing the container-free DCT this corpus has no use "
    "for. Scale: payloads never leave executor Arrow batches; output "
    "is 6 fixed-width integers/doc; per-partition parallel, no "
    "shuffle. Exactness: all-integer folds, FLOOR(c/q) exact in IEEE "
    "for sub-2^53 operands. No reference analog — extension per brief "
    "(multimodal round 5, VERDICT r10 directive #6a)",
)
def x154_jpeg_quantized_checksum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    jpegs = _jpeg_payloads(docs)

    def audit(batches: Iterator) -> Iterator:
        import struct

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                assert b[:2] == b"\xff\xd8"
                off = 2
                dqt = None
                entropy = b""
                while off < len(b):
                    assert b[off] == 0xFF
                    marker = b[off + 1]
                    if marker == 0xD9:
                        break
                    (seglen,) = struct.unpack(">H", b[off + 2 : off + 4])
                    body = b[off + 4 : off + 2 + seglen]
                    if marker == 0xDB:
                        # precision (high nibble) 0 = 8-bit, table id 0
                        assert body[0] == 0, body[0]
                        dqt = body[1:65]
                    off += 2 + seglen
                    if marker == 0xDA:
                        end = b.index(b"\xff\xd9", off)
                        entropy = b[off:end]
                        off = end
                assert dqt is not None and len(dqt) == 64
                deq = sum(c * dqt[p % 64] for p, c in enumerate(entropy))
                qnt = sum(c // dqt[p % 64] for p, c in enumerate(entropy))
                n = len(entropy)
                rows.append(
                    (int(doc_id), -(-n // 64), n % 64, sum(dqt), deq, qnt)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_blocks", "last_block_fill", "dqt_sum",
                    "dequant_checksum", "quant_sum",
                ],
            )

    return jpegs.mapInPandas(audit, _X154_SCHEMA)


# --- x155: MPEG-audio frame-sync walk (header-rate geometry, real sync scan) -----------


# MPEG-1 Layer III bitrate table, kbps, index 1..14 (0 = free, 15 = bad)
_MP3_BITRATES = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_MP3_RATES = (44100, 48000, 32000)  # sample-rate index 0..2

_X155_SCHEMA = (
    "doc_id long, n_frames long, bitrate_kbps long, sample_rate long, "
    "padded boolean, frame_len long, payload_sum long, total_bytes long"
)


def _mp3_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic MPEG-1 Layer III-framed byte stream per document:
    every frame is a real 4-byte header (11-bit sync, version/layer
    bits, bitrate index 1 + doc_id % 14, sample-rate index doc_id % 3,
    padding bit doc_id % 2) followed by the standard
    floor(144 * bitrate / sample_rate) + padding - 4 payload bytes of
    text (zero-padded last frame; ASCII text has no 0xFF, so the sync
    word cannot false-fire inside a payload). Pure stdlib."""

    def build(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                data = text.encode("utf-8")
                bidx = 1 + doc_id % 14
                sidx = doc_id % 3
                pad = doc_id % 2
                flen = (
                    144 * _MP3_BITRATES[bidx] * 1000 // _MP3_RATES[sidx]
                    + pad
                )
                cap = flen - 4
                header = bytes(
                    (0xFF, 0xFB, (bidx << 4) | (sidx << 2) | (pad << 1),
                     0xC0)
                )
                frames = []
                for i in range(0, max(1, len(data)), cap) or [0]:
                    chunk = data[i : i + cap]
                    frames.append(header + chunk + bytes(cap - len(chunk)))
                payloads.append(b"".join(frames))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    return docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, payload binary"
    )


@register(
    "x155_mpeg_framesync_walk",
    # The container the WAV/RIFF family (x125/x148/x152) does NOT
    # cover: self-framing streams with no directory — the reader must
    # SCAN for 11-bit sync words and derive each frame's length from
    # its own header (the MPEG audio / ADTS pattern). Every emitted
    # field is a pure function of (doc_id, n_chars): bitrate index
    # 1 + doc_id % 14 over the MPEG-1 Layer III table, sample rate by
    # doc_id % 3 in {44100, 48000, 32000}, padding bit doc_id % 2,
    # frame_len = floor(144 * kbps * 1000 / rate) + pad, n_frames =
    # max(1, ceil(n_chars / (frame_len - 4))), payload_sum = the
    # text's byte sum (zero pad adds nothing). The Spark side computes
    # ALL of them from the parsed frames: a wrong table entry, a
    # mis-computed frame length, or a sync miss breaks the hash match.
    oracle="""
    WITH geom AS (
      SELECT doc_id, n_chars,
             CASE 1 + doc_id % 14
               WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48
               WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80
               WHEN 7 THEN 96 WHEN 8 THEN 112 WHEN 9 THEN 128
               WHEN 10 THEN 160 WHEN 11 THEN 192 WHEN 12 THEN 224
               WHEN 13 THEN 256 ELSE 320 END AS br,
             CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
               ELSE 32000 END AS sr,
             doc_id % 2 AS pad
      FROM documents
    ),
    dims AS (
      SELECT doc_id, n_chars, br, sr, pad,
             CAST(FLOOR(144.0 * br * 1000 / sr) AS BIGINT) + pad
               AS frame_len
      FROM geom
    ),
    px AS (
      SELECT d.doc_id,
             CAST(SUM(ascii(substr(d.text, CAST(u.pos AS INT), 1)))
                  AS BIGINT) AS byte_sum
      FROM documents d
      JOIN (SELECT doc_id, unnest(range(1, n_chars + 1)) AS pos
            FROM documents) u ON u.doc_id = d.doc_id
      GROUP BY d.doc_id
    ),
    n AS (
      SELECT doc_id, br, sr, pad, frame_len,
             GREATEST(1, CAST(FLOOR((n_chars + frame_len - 5)
                                    / (frame_len - 4)) AS BIGINT))
               AS n_frames
      FROM dims
    )
    SELECT n.doc_id, n.n_frames,
           CAST(n.br AS BIGINT) AS bitrate_kbps,
           CAST(n.sr AS BIGINT) AS sample_rate,
           n.pad = 1 AS padded,
           n.frame_len,
           COALESCE(px.byte_sum, 0) AS payload_sum,
           n.n_frames * n.frame_len AS total_bytes
    FROM n LEFT JOIN px USING (doc_id)
    """,
    doc="x155: MPEG-audio frame-sync walk — encode every document as a "
    "deterministic MPEG-1 Layer III-framed stream (real 4-byte "
    "headers: 11-bit sync, bitrate/sample-rate/padding fields), then "
    "an independent parser SCANS for sync words and walks the stream "
    "frame by frame, deriving each frame's length from its own header "
    "via the standard floor(144 * bitrate / rate) + padding formula — "
    "the self-framing container pattern (MP3/ADTS/MPEG-TS) that, "
    "unlike RIFF/PNG, has no length directory to trust. Completes the "
    "brief's container matrix: directory-framed (PNG x124/x139, RIFF "
    "x125/x148/x152, GIF x138), segment-framed (JPEG x151/x154), and "
    "now sync-framed. Scale: one pass per payload inside Arrow "
    "batches, fixed-width metadata out, no shuffle. Exactness: "
    "all-integer geometry; the only division is floor'd and exact in "
    "IEEE for these magnitudes. No reference analog — extension per "
    "brief (multimodal round 5, VERDICT r10 directive #6b)",
)
def x155_mpeg_framesync_walk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    streams = _mp3_payloads(docs)

    def walk(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                off = 0
                n_frames = 0
                payload_sum = 0
                br = sr = flen = pad = -1
                while off < len(b):
                    # sync scan: 11 set bits, then MPEG-1 (0b11),
                    # Layer III (0b01), no-CRC bit
                    assert b[off] == 0xFF and b[off + 1] == 0xFB
                    bidx = b[off + 2] >> 4
                    sidx = (b[off + 2] >> 2) & 0x3
                    this_pad = (b[off + 2] >> 1) & 0x1
                    assert 1 <= bidx <= 14 and sidx <= 2
                    this_br = _MP3_BITRATES[bidx]
                    this_sr = _MP3_RATES[sidx]
                    this_flen = 144 * this_br * 1000 // this_sr + this_pad
                    if n_frames == 0:
                        br, sr, flen, pad = this_br, this_sr, this_flen, this_pad
                    else:
                        assert (this_br, this_sr, this_flen) == (br, sr, flen)
                    payload_sum += sum(b[off + 4 : off + this_flen])
                    off += this_flen
                    n_frames += 1
                assert off == len(b)
                rows.append(
                    (
                        int(doc_id), n_frames, br, sr, pad == 1,
                        flen, payload_sum, len(b),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "bitrate_kbps", "sample_rate",
                    "padded", "frame_len", "payload_sum", "total_bytes",
                ],
            )

    return streams.mapInPandas(walk, _X155_SCHEMA)


# --- x156: RIFF LIST/INFO metadata walk (the x139 tEXt device, for audio) ---------------

_X156_SOFTWARE = "swm-synth-1.0"
_X156_SCHEMA = (
    "doc_id long, n_top_chunks long, data_bytes long, info_subchunks long,"
    " riff_size_ok boolean, title string, artist string, comment string,"
    " software string"
)


def _x156_info_chunk(doc_id: int, source: str, lang: str) -> bytes:
    """LIST/INFO chunk with four standard sub-chunks (INAM/IART/ICMT/
    ISFT), each value NUL-terminated and word-aligned per RIFF rules —
    the odd-length ICMT ('en' + NUL = 3 bytes) forces a pad byte, so the
    walker's alignment handling is actually exercised."""
    import struct

    def sub(cid: bytes, val: str) -> bytes:
        payload = val.encode("utf-8") + b"\x00"
        out = cid + struct.pack("<I", len(payload)) + payload
        return out + (b"\x00" if len(payload) % 2 else b"")

    body = (
        b"INFO"
        + sub(b"INAM", f"doc-{doc_id}")
        + sub(b"IART", source)
        + sub(b"ICMT", lang)
        + sub(b"ISFT", _X156_SOFTWARE)
    )
    return b"LIST" + struct.pack("<I", len(body)) + body


@register(
    "x156_wav_info_metadata",
    # x139 proved tEXt/iTXt extraction on real PNG bytes; x156 is the
    # SAME metadata-provenance stage for audio: splice a LIST/INFO
    # chunk (title/artist/comment/software) into each document's real
    # stdlib-written RIFF/WAV, then WALK the container generically —
    # chunk ids, little-endian sizes, odd-size pad bytes, RIFF size
    # patching — in a separate Arrow stage that never sees the build's
    # variables. The oracle REBUILDS every expected field from the
    # deterministic synthesis rule (title = 'doc-'||doc_id, artist =
    # source, comment = lang), so a single mis-parsed length byte
    # breaks the hash match. Scale: per-partition mapInPandas both
    # ways, no shuffle until the final projection; metadata extraction
    # is the provenance step a multimodal pipeline runs before any
    # decode.
    oracle=f"""
    SELECT doc_id,
           CAST(3 AS BIGINT) AS n_top_chunks,
           CAST(n_chars AS BIGINT) AS data_bytes,
           CAST(4 AS BIGINT) AS info_subchunks,
           TRUE AS riff_size_ok,
           'doc-' || CAST(doc_id AS VARCHAR) AS title,
           source AS artist,
           lang AS comment,
           '{_X156_SOFTWARE}' AS software
    FROM documents
    """,
    doc="x156: WAV LIST/INFO metadata audit — write each document's "
    "byte stream as a real 8-bit PCM RIFF/WAV (stdlib wave), splice "
    "in a LIST/INFO provenance chunk (INAM/IART/ICMT/ISFT with RIFF "
    "word-alignment pad bytes and a patched RIFF size), and walk the "
    "container back generically in a separate Arrow stage: top-level "
    "chunk census, data-chunk byte count, INFO sub-chunk extraction, "
    "RIFF size-field verification. The audio companion of x139's PNG "
    "tEXt audit — together they cover sidecar metadata for both "
    "image and audio containers. Oracle rebuilds all fields from the "
    "synthesis rule, so the byte walk itself is what's being graded. "
    "Scale: embarrassingly parallel mapInPandas, zero shuffles. No "
    "reference analog — extension per brief (multimodal metadata)",
)
def x156_wav_info_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    def build(batches: Iterator) -> Iterator:
        import io
        import struct
        import wave

        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, text, source, lang in zip(
                pdf["doc_id"], pdf["text"], pdf["source"], pdf["lang"]
            ):
                buf = io.BytesIO()
                wf = wave.open(buf, "wb")
                wf.setnchannels(1)
                wf.setsampwidth(1)
                wf.setframerate(8000)
                wf.writeframes(text.encode("utf-8"))
                wf.close()
                raw = buf.getvalue()
                # locate the data chunk: walk top-level chunks after the
                # 12-byte RIFF/WAVE header and splice INFO before it
                off = 12
                while off < len(raw):
                    cid = raw[off : off + 4]
                    size = struct.unpack("<I", raw[off + 4 : off + 8])[0]
                    if cid == b"data":
                        break
                    off += 8 + size + (size % 2)
                info = _x156_info_chunk(int(doc_id), source, lang)
                spliced = raw[:off] + info + raw[off:]
                spliced = (
                    spliced[:4]
                    + struct.pack("<I", len(spliced) - 8)
                    + spliced[8:]
                )
                payloads.append(spliced)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    wavs = docs.select("doc_id", "text", "source", "lang").mapInPandas(
        build, "doc_id long, payload binary"
    )

    def walk(batches: Iterator) -> Iterator:
        import struct

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
                riff_size = struct.unpack("<I", b[4:8])[0]
                size_ok = riff_size == len(b) - 8
                off, n_top, data_bytes, n_sub = 12, 0, -1, 0
                fields = {}
                while off + 8 <= len(b):
                    cid = b[off : off + 4]
                    size = struct.unpack("<I", b[off + 4 : off + 8])[0]
                    body = b[off + 8 : off + 8 + size]
                    n_top += 1
                    if cid == b"data":
                        data_bytes = size
                    elif cid == b"LIST" and body[:4] == b"INFO":
                        so = 4
                        while so + 8 <= len(body):
                            sid = body[so : so + 4].decode("ascii")
                            ssz = struct.unpack(
                                "<I", body[so + 4 : so + 8]
                            )[0]
                            val = body[so + 8 : so + 8 + ssz]
                            fields[sid] = val.rstrip(b"\x00").decode(
                                "utf-8"
                            )
                            n_sub += 1
                            so += 8 + ssz + (ssz % 2)
                    off += 8 + size + (size % 2)
                rows.append(
                    (
                        int(doc_id), n_top, data_bytes, n_sub, size_ok,
                        fields.get("INAM"), fields.get("IART"),
                        fields.get("ICMT"), fields.get("ISFT"),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_top_chunks", "data_bytes",
                    "info_subchunks", "riff_size_ok", "title", "artist",
                    "comment", "software",
                ],
            )

    return wavs.mapInPandas(walk, _X156_SCHEMA)

"""Multimodal columns — images/audio/video as opaque binary + typed metadata.

Spark-side design for a 100 TB multimodal corpus:

  media(id BIGINT, kind STRING, payload BINARY, meta STRUCT<format,width,
        height, n_bytes>)

  * payload is an opaque BINARY column — parquet stores it page-compressed;
    column pruning means metadata-only queries never read the bytes.
  * decode / resize / frame-sample run as Arrow-batched `mapInPandas`
    (vectorized transfer, one Python worker per partition — the ONLY place
    Python touches data, and it streams batches, never materializing a
    partition).
  * the actual codec work (PIL/libav) is stubbed in this container — the
    plumbing (schema, batch iteration, partitioning) is real and tested.

The synthetic corpus derives payloads from documents.text (utf-8 bytes) so
byte-level features are reproducible by the SQL oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("last_byte", IntegerType()),
        StructField("mean_byte", DoubleType()),
    ]
)

_FORMATS = ("png", "jpeg", "webp")


def synth_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents corpus.

    payload = utf-8 bytes of the text; format/width/height derived from
    doc_id (pure expressions → SQL-reproducible).
    """
    fmt = F.element_at(
        F.array(*[F.lit(f) for f in _FORMATS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return documents.select(
        F.col("doc_id").alias("id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            fmt.alias("format"),
            (F.col("doc_id") % 640 + 64).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 48).cast("int").alias("height"),
            F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - container has no codecs
    """Real decoder hook.  The container ships no image libs; a deployment
    drops PIL/torchvision in here without touching the Spark plumbing."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL — stubbed in this environment; "
            "byte-level features below exercise the same mapInPandas path"
        ) from e


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched byte-feature extraction via mapInPandas.

    Deterministic per-payload features (length, first/last byte, mean byte
    rounded to 6 dp) stand in for an embedding model; the Spark plumbing —
    binary column in, fixed-schema batch out, no driver collect — is the
    production shape.  Batches stream through; peak memory is one Arrow
    batch, not one partition.
    """

    # HALF-UP decimal rounding to match SQL round(): sum(bytes)/n is a
    # small-denominator rational, so exact 6dp ties DO occur (e.g. n=128
    # → x.1328125), where Python's builtin half-even round diverges.
    # Defined INSIDE the UDF body (not imported from the engine package):
    # cloudpickle ships local defs by value, while a module reference
    # would require egraphdb_spark on every Python worker's sys.path —
    # not true when the driver embeds this engine from another cwd.
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import decimal

        q6 = decimal.Decimal(1).scaleb(-6)

        def _rhu(x: float) -> float:
            return float(
                decimal.Decimal(repr(float(x))).quantize(
                    q6, rounding=decimal.ROUND_HALF_UP
                )
            )

        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1).astype("int32"),
                    "mean_byte": payloads.map(
                        lambda b: _rhu(sum(b) / len(b)) if len(b) else 0.0
                    ).astype("float64"),
                }
            )

    return media.select("id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


def resize_media(media: DataFrame, scale: int = 4) -> DataFrame:
    """Resize plumbing: every-``scale``-th-byte downsample standing in for
    the codec resize (the container ships no PIL/libav — a deployment
    swaps the two marked lines for a real decode→resize→encode).

    Returns the SAME media schema (id, kind, payload, meta) with payload
    downsampled and width/height/n_bytes updated, so the stage composes
    with :func:`extract_features` / :func:`sample_frames` exactly like a
    real resize sits between decode and featurize.  Arrow-batched
    mapInPandas: batches stream through one Python worker per partition,
    no driver collect, peak memory one batch.
    """
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")

    flat_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
            StructField("format", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "id": pdf["id"].astype("int64"),
                    "kind": pdf["kind"],
                    # real impl: decode(payload).resize(w//scale, h//scale)
                    "payload": pdf["payload"].map(lambda b: bytes(b[::scale])),
                    "format": pdf["format"],
                    "width": (pdf["width"] // scale).clip(lower=1).astype("int32"),
                    "height": (pdf["height"] // scale).clip(lower=1).astype("int32"),
                }
            )

    flat = media.select(
        "id", "kind", "payload", "meta.format", "meta.width", "meta.height"
    )
    out = flat.mapInPandas(batches, flat_schema)
    return out.select(
        "id",
        "kind",
        "payload",
        F.struct(
            F.col("format"),
            F.col("width"),
            F.col("height"),
            F.length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads.

    Without codecs, 'frames' are fixed-size byte windows — the schema and
    explode shape match a real frame sampler (one row per sampled frame,
    frame index + frame bytes).
    """
    win = 16
    return (
        media.select(
            "id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, greatest(cast(length(payload)/{win * every_n} as int)-1, 0)),"
                    f" i -> substring(payload, i*{win * every_n}+1, {win}))"
                )
            ).alias("frame_idx", "frame_bytes"),
        )
        .withColumn("frame_len", F.length("frame_bytes").cast("int"))
    )


def payload_dedup(media: DataFrame, id_col: str = "id") -> DataFrame:
    """Exact media dedup: duplicate groups by payload byte hash.

    The image/audio twin of text exact-dedup: identical binary payloads
    collapse to (payload_md5, canonical_id = min id, n_copies), returned
    only where n_copies ≥ 2.  At 100 TB the shuffle carries a 16-byte
    hash per object, never payload bytes — same discipline as the text
    fingerprint path; near-dup (perceptual-hash) variants slot into the
    identical groupBy shape with pHash in place of md5.
    """
    return (
        media.select(F.col(id_col).alias("id"), F.md5("payload").alias("payload_md5"))
        .groupBy("payload_md5")
        .agg(F.min("id").alias("canonical_id"), F.count("*").alias("n_copies"))
        .where(F.col("n_copies") >= 2)
    )


def payload_simhash_pairs(
    media: DataFrame, id_col: str = "id", max_hamming: int = 3
) -> DataFrame:
    """NEAR-duplicate media pairs by byte-level SimHash — the perceptual-
    hash slot :func:`payload_dedup` reserves, realized content-type-
    agnostically: non-overlapping 4-byte grams of the payload (8 hex
    chars) vote per fingerprint bit exactly like text shingles, then the
    same pigeonhole byte-blocking finds pairs within Hamming ≤ 3.  Catches
    re-muxed/retagged binaries whose bulk bytes match (a format-aware
    pHash would decode first — that hook is the stubbed codec line in
    :func:`extract_features`; the Spark shape is identical).

    Reuses dedup.simhash/simhash_pairs verbatim over the gram table, so
    scale behavior is the proven one: the shuffle carries 32-bit gram
    hashes (never payloads), the fingerprint aggregate is map-side
    combined, and the pair join is byte-block-bucketed.  Empty payloads
    (< 4 bytes) emit no grams and join nothing.
    """
    from .dedup import simhash, simhash_pairs

    grams = (
        media.select(
            F.col(id_col).alias("id"),
            # hoisted OUTSIDE the transform lambda — split-in-lambda would
            # re-split per chunk and stay quadratic
            F.split(F.hex("payload"), "").alias("hs"),
        )
        .select(
            "id",
            # chunks slice a pre-split char array: substring(hexstr, 1+8k,
            # 8) re-scans the hex string from position 0 per chunk —
            # O(len²) for a multi-MB payload (same UTF8String.substring
            # trap as dedup.with_shingles); slice on the array is O(1)
            # per element.  Output identical (hex is single-byte chars).
            F.explode(
                F.expr(
                    "if(size(hs) < 8, array(),"
                    " transform(sequence(0, size(hs) div 8 - 1),"
                    " k -> array_join(slice(hs, 1 + 8 * k, 8), '')))"
                )
            ).alias("gram"),
        )
        .distinct()
        .select(
            "id",
            F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long").alias("h"),
        )
    )
    sh = simhash(media, id_col, "payload", shingles=grams)
    return simhash_pairs(sh, max_hamming=max_hamming)

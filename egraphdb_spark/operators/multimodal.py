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


# ---------------------------------------------------------------------------
# Perceptual hash (pHash) — DCT-shaped 64-bit fingerprint of the payload
# ---------------------------------------------------------------------------

# DCT-II basis cos(pi*(2x+1)*u/16), quantized to 1e4 fixed-point ONCE and
# frozen as literals (not recomputed via math.cos at import: libm values
# sit microscopically close to the rounding boundary for some entries, and
# the oracle must embed bit-identical integers).  u indexes frequency,
# x indexes position; row u=0 is the DC row.
PHASH_DCT_MILLI = (
    (10000, 10000, 10000, 10000, 10000, 10000, 10000, 10000),
    (9808, 8315, 5556, 1951, -1951, -5556, -8315, -9808),
    (9239, 3827, -3827, -9239, -9239, -3827, 3827, 9239),
    (8315, -1951, -9808, -5556, 5556, 9808, 1951, -8315),
    (7071, -7071, -7071, 7071, 7071, -7071, -7071, 7071),
    (5556, -9808, 1951, 8315, -8315, -1951, 9808, -5556),
    (3827, -9239, 9239, -3827, -3827, 9239, -9239, 3827),
    (1951, -5556, 8315, -9808, 9808, -8315, 5556, -1951),
)


def phash64(media: DataFrame, id_col: str = "id") -> DataFrame:
    """64-bit PERCEPTUAL hash of each payload — the DCT-shaped twin of
    the byte-gram :func:`payload_simhash_pairs` (classic pHash: grayscale
    → DCT-II → low-frequency coefficients → median threshold).  The
    decode step is this environment's deterministic stand-in (PIL is the
    env-gated hook in :func:`decode_image`): the payload is folded into
    an 8×8 "luma" grid of byte-stripe sums — contiguous, so small payload
    edits perturb few cells, which is exactly the robustness property the
    DCT thresholding then spreads across bits.  A deployment swaps the
    stripe fold for a real decode+resample; everything from the grid on
    (the DCT, the median threshold, the banding downstream) is the
    production computation.

    Pipeline, all built-ins / integer arithmetic:
      1. stripe sums: payload bytes (via the pre-split hex-char array —
         the O(len) slicing discipline of payload_simhash_pairs) split
         into 64 contiguous stripes of width n_bytes div 64 (stripe 63
         takes the remainder); payloads under 64 bytes are dropped (no
         stable grid exists — documented, not silent: they can't hash);
      2. 2-D DCT-II as two 8×8 integer matrix multiplies against the
         frozen 1e4 fixed-point basis (row pass then column pass — two
         broadcast joins + map-side-combined sums, never a 4096-row
         basis);
      3. threshold: each of the 63 AC coefficients against their LOWER
         MEDIAN (the 32nd smallest, row_number over a per-id 63-row
         window — bounded, never SinglePartition); bit = coeff > median;
         the DC bit is 0 (pHash convention: DC carries brightness, not
         structure);
      4. pack into (sh_hi, sh_lo) — :func:`~.dedup.hamming64_pairs`'s
         exact input shape, so Hamming-radius pairing reuses the proven
         Manku-Jain-Das Sarma 4×16-bit multi-index join.

    Output: (id, sh_hi, sh_lo).  Scale: the only payload-sized work is
    the one stripe-fold projection; everything after is 64 rows/doc
    through two broadcast joins and per-id windows.  Integer bounds:
    cell ≤ 255·n_bytes, stage-2 coefficient ≤ 64·cell·10⁸ — inside int64
    for payloads to ~1 GB.
    """
    cmat = media.sparkSession.createDataFrame(
        [
            (u, x, b)
            for u, row in enumerate(PHASH_DCT_MILLI)
            for x, b in enumerate(row)
        ],
        "u int, x int, b long",
    )
    cells = (
        media.select(
            F.col(id_col).alias("id"),
            F.split(F.hex("payload"), "").alias("hs"),
            F.expr("octet_length(payload)").cast("long").alias("nb"),
        )
        .where(F.col("nb") >= 64)
        .select(
            "id",
            F.expr(
                "transform(sequence(1, cast(nb as int)), j ->"
                " cast(conv(concat(element_at(hs, 2*j - 1),"
                " element_at(hs, 2*j)), 16, 10) as bigint))"
            ).alias("bytes"),
            "nb",
        )
        .select(
            "id",
            F.posexplode(
                F.expr(
                    "transform(sequence(0, 63), k -> aggregate("
                    " slice(bytes, cast(k * (nb div 64) + 1 as int),"
                    "  cast(if(k = 63, nb - 63 * (nb div 64), nb div 64)"
                    "   as int)),"
                    " cast(0 as bigint), (acc, x) -> acc + x))"
                )
            ).alias("idx", "val"),
        )
        .select(
            "id",
            (F.col("idx") % 8).alias("c"),
            (F.col("idx") / 8).cast("int").alias("r"),
            "val",
        )
    )
    t1 = (
        cells.join(F.broadcast(cmat), cells.r == cmat.x)
        .groupBy("id", "u", "c")
        .agg(F.sum(F.col("val") * F.col("b")).alias("v1"))
    )
    cmat2 = cmat.select(
        F.col("u").alias("v"), F.col("x").alias("c2"), F.col("b").alias("b2")
    )
    t2 = (
        t1.join(F.broadcast(cmat2), t1.c == cmat2.c2)
        .groupBy("id", "u", "v")
        .agg(F.sum(F.col("v1") * F.col("b2")).alias("coeff"))
    )
    from pyspark.sql import Window

    ac = t2.where(~((F.col("u") == 0) & (F.col("v") == 0)))
    w = Window.partitionBy("id").orderBy("coeff", "u", "v")
    med = (
        ac.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 32)
        .select("id", F.col("coeff").alias("med"))
    )
    bits = ac.join(med, "id").select(
        "id",
        (F.col("u") * 8 + F.col("v")).alias("pos"),
        F.when(F.col("coeff") > F.col("med"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("bit"),
    )
    return bits.groupBy("id").agg(
        F.sum(
            F.expr("if(bit = 1 and pos < 32, shiftleft(cast(1 as bigint),"
                   " cast(pos as int)), cast(0 as bigint))")
        ).alias("sh_hi"),
        F.sum(
            F.expr("if(bit = 1 and pos >= 32, shiftleft(cast(1 as bigint),"
                   " cast(pos - 32 as int)), cast(0 as bigint))")
        ).alias("sh_lo"),
    )

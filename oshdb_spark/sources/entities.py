"""Stage-1 extraction: interleaved docs -> normalized entities DataFrame.

Entirely JVM-side (Catalyst expressions, no Python UDF): the text spans are
filtered and concatenated in offset order with higher-order array functions,
parsed with ``from_json`` against a fixed schema (no inference), and the tag
map is re-keyed to ints with ``transform_keys``.

The source ``spans`` column is NEVER rewritten — downstream stages carry
``doc_id`` and re-join to the source table, and ``verify_span_equality``
asserts byte-identical span sequences for any surviving row set
(the north-rule per-row invariant, BASELINE.json:15).

Entity semantics mirror the reference's OSMEntity
(/root/reference/oshdb/src/main/java/org/heigit/ohsome/oshdb/osm/OSMEntity.java:11-30,
OSM.java:86-127): id/version/visible/ts/changeset/uid + int-coded tags;
nodes carry 1e-7 fixed-point lon/lat (OSMCoordinates.java:9-12), ways an
ordered ref list (OSMWay.java:9-30), relations typed+roled members
(OSMMember.java:11-46).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("visible", T.BooleanType()),
        T.StructField("ts", T.LongType()),
        T.StructField("changeset", T.LongType()),
        T.StructField("uid", T.IntegerType()),
        T.StructField("tags", T.MapType(T.StringType(), T.IntegerType())),
        T.StructField("lon", T.LongType()),
        T.StructField("lat", T.LongType()),
        T.StructField("refs", T.ArrayType(T.LongType())),
        T.StructField(
            "members",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("type", T.StringType()),
                        T.StructField("ref", T.LongType()),
                        T.StructField("role", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def reassemble_payload(docs: DataFrame) -> DataFrame:
    """docs(doc_id, spans) -> + payload string (text spans in offset order)."""
    text_spans = F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text"))
    # spans are stored in offset order; sort defensively (cheap, small arrays)
    ordered = F.array_sort(
        text_spans,
        lambda a, b: F.when(a["offset"] < b["offset"], F.lit(-1))
        .when(a["offset"] > b["offset"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    payload = F.array_join(F.transform(ordered, lambda s: s["text"]), "")
    return docs.withColumn("payload", payload)


def extract_entities(docs: DataFrame, keep_spans: bool = False) -> DataFrame:
    """Parse each doc's payload into one entity-version row.

    Output columns: doc_id, id, type, version, visible, ts, changeset, uid,
    tags map<int,int>, lon/lat (fixed-point ints, nodes), refs (ways),
    members (relations).
    """
    parsed = reassemble_payload(docs).withColumn(
        "e", F.from_json(F.col("payload"), PAYLOAD_SCHEMA)
    )
    cols = [
        F.col("doc_id"),
        F.col("e.id").alias("id"),
        F.col("e.type").alias("type"),
        F.col("e.version").alias("version"),
        F.col("e.visible").alias("visible"),
        F.col("e.ts").alias("ts"),
        F.col("e.changeset").alias("changeset"),
        F.col("e.uid").alias("uid"),
        F.transform_keys(
            F.coalesce("e.tags", F.create_map().cast("map<string,int>")),
            lambda k, _: k.cast("int"),
        ).alias("tags"),
        F.col("e.lon").alias("lon"),
        F.col("e.lat").alias("lat"),
        F.col("e.refs").alias("refs"),
        F.col("e.members").alias("members"),
    ]
    if keep_spans:
        cols.append(F.col("spans"))
    return parsed.select(*cols)


def verify_span_equality(
    source_docs: DataFrame, surviving: DataFrame, doc_id_col: str = "doc_id"
) -> int:
    """Assert the span-sequence invariant for every surviving row.

    Joins the surviving rows back to the source and compares the full span
    sequence (kind, text, media_ref, order).  Returns the number of violating
    rows (0 == invariant holds).  Comparison happens distributed (no collect).
    """
    lhs = surviving.select(F.col(doc_id_col).alias("doc_id")).distinct()
    joined = lhs.join(source_docs, "doc_id", "left")
    # a surviving doc_id missing from the source, or any span mismatch when
    # the pipeline carries spans itself, is a violation
    if "spans" in surviving.columns:
        carried = surviving.select(
            F.col(doc_id_col).alias("doc_id"), F.col("spans").alias("carried_spans")
        )
        joined = carried.join(source_docs, "doc_id", "left")
        bad = joined.filter(
            F.col("spans").isNull()
            | (
                F.to_json(F.col("carried_spans")) != F.to_json(F.col("spans"))
            )
        )
        return bad.count()
    return joined.filter(F.col("spans").isNull()).count()

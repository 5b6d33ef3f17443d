"""Docs generator determinism + Spark extraction correctness + span invariant."""

import json

import pandas as pd
import pytest

from oshdb_spark.sources.docs import generate_docs
from oshdb_spark.sources.entities import extract_entities, verify_span_equality


def test_generator_deterministic():
    d1, w1 = generate_docs(n_features=60, seed=42)
    d2, w2 = generate_docs(n_features=60, seed=42)
    assert d1["doc_id"].tolist() == d2["doc_id"].tolist()
    assert d1["spans"].apply(json.dumps).tolist() == d2["spans"].apply(json.dumps).tolist()
    pd.testing.assert_frame_equal(w1.nodes, w2.nodes)
    # different seed -> different world
    d3, _ = generate_docs(n_features=60, seed=7)
    assert d1["doc_id"].tolist() != d3["doc_id"].tolist()


def test_generator_covers_required_cases():
    _, world = generate_docs(n_features=200, seed=42)
    nodes, ways, rels = world.nodes, world.ways, world.relations
    # deletions present
    assert (~nodes["visible"]).any() or (~ways["visible"]).any()
    # multi-version histories present
    assert (nodes.groupby("id").size() > 1).any()
    # closed and open ways
    closed = ways["refs"].apply(lambda r: r[0] == r[-1])
    assert closed.any() and (~closed).any()
    # relations with outer+inner members
    m = rels.iloc[0]["members"]
    roles = {x["role"] for x in m}
    assert {"outer", "inner"} <= roles
    # special coordinates present (pole / antimeridian)
    assert (nodes["lat"] == 900000000).any()
    assert (nodes["lon"] == 1800000000).any()


def test_spans_wellformed():
    docs, _ = generate_docs(n_features=40, seed=42)
    for spans in docs["spans"]:
        offsets = [s["offset"] for s in spans]
        assert offsets == sorted(offsets)
        assert len(set(offsets)) == len(offsets)
        kinds = {s["kind"] for s in spans}
        assert kinds <= {"text", "media"}
        for s in spans:
            if s["kind"] == "media":
                assert s["media_ref"] and not s["text"]
            else:
                assert not s["media_ref"]
        # payload reassembles to valid JSON
        payload = "".join(s["text"] for s in spans if s["kind"] == "text")
        d = json.loads(payload)
        assert {"id", "type", "version", "visible", "ts"} <= set(d)


@pytest.mark.usefixtures("spark")
class TestExtraction:
    def test_extract_matches_ground_truth(self, spark, docs_parquet):
        path, docs_pdf, world = docs_parquet
        docs = spark.read.parquet(path)
        entities = extract_entities(docs)
        got = entities.orderBy("type", "id", "version").toPandas()

        n_expected = len(world.nodes) + len(world.ways) + len(world.relations)
        assert len(got) == n_expected

        gn = got[got["type"] == "node"].set_index(["id", "version"])
        for row in world.nodes.itertuples(index=False):
            g = gn.loc[(row.id, row.version)]
            assert g["lon"] == row.lon and g["lat"] == row.lat
            assert g["visible"] == row.visible
            assert g["ts"] == row.ts
            assert dict(g["tags"]) == {int(k): v for k, v in row.tags.items()}

        gw = got[got["type"] == "way"].set_index(["id", "version"])
        for row in world.ways.itertuples(index=False):
            g = gw.loc[(row.id, row.version)]
            assert list(g["refs"]) == list(row.refs)

        gr = got[got["type"] == "relation"].set_index(["id", "version"])
        for row in world.relations.itertuples(index=False):
            g = gr.loc[(row.id, row.version)]
            got_members = [
                {"type": m["type"], "ref": m["ref"], "role": m["role"]}
                for m in g["members"]
            ]
            assert got_members == row.members

    def test_extraction_is_jvm_only(self, spark, docs_parquet):
        """The extraction plan must not contain a Python UDF stage."""
        path, _, _ = docs_parquet
        docs = spark.read.parquet(path)
        plan = extract_entities(docs)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_span_invariant_holds_for_pipeline_output(self, spark, docs_parquet):
        path, _, _ = docs_parquet
        docs = spark.read.parquet(path)
        entities = extract_entities(docs, keep_spans=True)
        surviving = entities.filter("type = 'node'")
        assert verify_span_equality(docs, surviving) == 0

    def test_span_invariant_catches_mutation(self, spark, docs_parquet):
        from pyspark.sql import functions as F

        path, _, _ = docs_parquet
        docs = spark.read.parquet(path)
        entities = extract_entities(docs, keep_spans=True).limit(5)
        mutated = entities.withColumn(
            "spans",
            F.transform(
                "spans",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    F.concat(s["text"], F.lit("x")).alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ),
        )
        assert verify_span_equality(docs, mutated) == 5


class TestRelationHeavyFixture:
    """synthesize_relation_docs (bench.py --relations): 11 entities per
    group (8 nodes, 2 closed ring ways, 1 multipolygon relation), all
    parseable by the standard extraction and assembling into holed
    polygons."""

    def test_shape_and_assembly(self, spark):
        from oshdb_spark.operators.snapshot import snapshot_view
        from oshdb_spark.sources.docs import synthesize_relation_docs
        from oshdb_spark.sources.entities import extract_entities

        docs = synthesize_relation_docs(spark, 20)
        assert docs.count() == 220
        ents = extract_entities(docs)
        by_type = {r["type"]: r["count"] for r in ents.groupBy("type").count().collect()}
        assert by_type == {"node": 160, "way": 40, "relation": 20}
        snaps = snapshot_view(ents, [1_400_000_000])
        rels = snaps.filter("type = 'relation'").select("wkt", "area").collect()
        assert len(rels) == 20
        for r in rels:
            # outer ring + inner hole
            assert r["wkt"].startswith("POLYGON ((")
            assert r["wkt"].count("(") - 1 == 2
            assert r["area"] > 0

    def test_span_roundtrip(self, spark):
        from oshdb_spark.sources.docs import synthesize_relation_docs
        from oshdb_spark.sources.entities import (
            extract_entities,
            verify_span_equality,
        )

        docs = synthesize_relation_docs(spark, 10)
        ents = extract_entities(docs, keep_spans=True)
        assert verify_span_equality(docs, ents) == 0

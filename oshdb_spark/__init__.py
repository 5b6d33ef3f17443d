"""oshdb_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query semantics of GIScience/oshdb (snapshot/contribution
views, XYGrid tiling, spatial filtering/clipping, aggregateByTimestamp /
aggregateByGeometry) as idiomatic PySpark DataFrame pipelines over tables of
interleaved text+media documents.

Layout:
    grid/       pure-numpy XYGrid / XYGridTree / quad-cell index kernels
    geometry/   geodesic formulas, point-in-polygon, clipping, geometry builder
    sources/    deterministic docs-table generators, span->entity extraction,
                tiled storage layout
    operators/  tiling, snapshot/contribution views, spatial join, kNN,
                zonal aggregation, t-digest, dedup, similarity, text, media
    filters/    filter DSL -> pyspark Column compiler (+ type narrowing)
    plans/      salted skew joins, per-partition lineage + resumable writes
    api.py      fluent SnapshotView / ContributionView query surface
    helpers.py  connect-by-properties database driver (oshdb-helpers port)
    osm_types.py OSM/OSH object layer for map/filter lambdas
    streaming.py Structured-Streaming ingest (exactly-once into the tiled
                store), windowed event-time aggregation, dedup-on-ingest
    pipeline.py end-to-end flagship pipelines (tile -> join -> refine -> agg)

The reference itself is batch-only (SURVEY.md §2.8); batch resumability
comes from checkpointed stages (plans/lineage.py), and streaming.py is a
beyond-reference front door producing the same store incrementally.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # convenience lazy exports (avoid importing pyspark at package import)
    if name in ("OSHDB", "SnapshotView", "ContributionView", "MapAggregator"):
        from oshdb_spark import api

        return getattr(api, name)
    if name in (
        "OSM",
        "OSMType",
        "OSMMember",
        "OSHDBTag",
        "OSHDBTagKey",
        "OSHDBTags",
        "OSHDBRole",
        "OSHNode",
        "OSHWay",
        "OSHRelation",
        "entity_from_row",
    ):
        from oshdb_spark import osm_types

        return getattr(osm_types, name)
    if name in ("OSHDBDriver", "OSHDBConnection"):
        from oshdb_spark import helpers

        return getattr(helpers, name)
    raise AttributeError(name)

"""oshdb_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query semantics of GIScience/oshdb (snapshot/contribution
views, XYGrid tiling, spatial filtering/clipping, aggregateByTimestamp /
aggregateByGeometry) as idiomatic PySpark DataFrame pipelines over tables of
interleaved text+media documents.

Layout:
    grid/       pure-numpy XYGrid / XYGridTree / quad-cell index kernels
    geometry/   geodesic formulas, point-in-polygon, clipping, geometry builder
    sources/    deterministic docs-table generator + span->entity extraction
    operators/  tiling, snapshot/contribution views, spatial join, kNN,
                zonal aggregation, dedup, similarity search, text analysis
    functions/  filter DSL -> pyspark Column compiler
    plans/      driver-side pruning (cell ranges, type narrowing)
    streaming/  structured-streaming wrappers for the events table
"""

__version__ = "0.1.0"

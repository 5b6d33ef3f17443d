from oshdb_spark.sources.docs import DocsGenerator, generate_docs, write_docs_parquet  # noqa: F401
from oshdb_spark.sources.entities import extract_entities, verify_span_equality  # noqa: F401

from oshdb_spark.filters.dsl import (  # noqa: F401
    FilterParseError,
    TagTranslator,
    parse_filter,
)

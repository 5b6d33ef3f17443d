"""Database-driver helper: connect-by-properties with a scoped callback.

Port of the reference's oshdb-helpers/oshdb-database-driver module
(OSHDBDriver.java:29-140, OSHDBConnection.java:14-46, Util.java:7-27):
an application hands a ``Properties``-style dict to
``OSHDBDriver.connect`` and receives a scoped connection object exposing
the two views and the tag translator; the callback's return value is
passed through as the "exit code".

Property values interpolate ``${other_prop}`` references recursively
(Util.getInterpolated); an unresolvable reference stays literal, exactly
as the reference's ``orElse("${sub}")`` does.

URI routing (OSHDBDriver.connect:62-72): the reference dispatches on the
``oshdb`` property's prefix — ``h2:``/``ignite:``.  The columnar engine's
backends are the tiled entities store and the raw interleaved docs table,
so the accepted prefixes here are:

* ``store:<path>``  -> ``OSHDB.from_store`` (the ``h2:`` analog: a
  pre-built local table; missing tables raise OSHDBTableNotFoundError);
* ``docs:<path>``   -> parquet docs table -> ``OSHDB.from_docs``
  (ETL-on-read, the analog of pointing the driver at raw data);
* anything else     -> ``ValueError("unknown oshdb value! ...")``.

The ``multithreading`` property (h2-only toggle in the reference,
OSHDBDriver.java:80-83) has no engine-side meaning here — parallelism is
the Spark master's — so it is parsed and recorded on the connection's
props but changes nothing.  The ``keytables`` property may point at a
``(key, value)`` parquet table; when present the translator is built from
it (the JDBC-keytables analog), otherwise from the loaded entities'
own tag dictionary fallback (empty translator).
"""

from __future__ import annotations

import re
from typing import Callable, Mapping, Optional

from pyspark.sql import SparkSession

from oshdb_spark.api import OSHDB, ContributionView, SnapshotView

_SUBSTITUTE = re.compile(r"\$\{([^}]+)\}")

OSHDB_PROPERTY_NAME = "oshdb"
KEYTABLES_PROPERTY_NAME = "keytables"
PREFIX_PROPERTY_NAME = "prefix"
MULTITHREADING_PROPERTY_NAME = "multithreading"
STORE_URI_PREFIX = "store:"
DOCS_URI_PREFIX = "docs:"


def get_interpolated(props: Mapping[str, str], key: str) -> Optional[str]:
    """Util.getInterpolated: the property's value with ``${ref}``
    references substituted recursively; None when absent; unresolvable
    references left literal."""
    value = props.get(key)
    if value is None:
        return None
    return _interpolate(props, value)


def _interpolate(props: Mapping[str, str], value: str) -> str:
    def sub(m: "re.Match[str]") -> str:
        inner = get_interpolated(props, m.group(1))
        return inner if inner is not None else "${" + m.group(1) + "}"

    return _SUBSTITUTE.sub(sub, value)


class OSHDBConnection:
    """OSHDBConnection.java:14-46 — props + database + translator, with
    view factories."""

    def __init__(self, props: Mapping[str, str], oshdb: OSHDB):
        self.props = props
        self.oshdb = oshdb
        self.tag_translator = oshdb.translator

    def get_snapshot_view(self) -> SnapshotView:
        return SnapshotView.on(self.oshdb)

    def get_contribution_view(self) -> ContributionView:
        return ContributionView.on(self.oshdb)

    def get_props(self) -> Mapping[str, str]:
        return self.props

    def get_oshdb(self) -> OSHDB:
        return self.oshdb


class OSHDBDriver:
    """OSHDBDriver.java:29-140 — static connect-by-properties entrypoint.

    The extra leading ``spark`` argument replaces the reference's ambient
    JDBC/Ignite runtime: sessions are explicit in Spark.
    """

    OSHDB_PROPERTY_NAME = OSHDB_PROPERTY_NAME
    KEYTABLES_PROPERTY_NAME = KEYTABLES_PROPERTY_NAME
    PREFIX_PROPERTY_NAME = PREFIX_PROPERTY_NAME
    MULTITHREADING_PROPERTY_NAME = MULTITHREADING_PROPERTY_NAME

    def __init__(self):
        raise RuntimeError("Driver class")  # IllegalStateException parity

    @staticmethod
    def connect(
        spark: SparkSession,
        props: Mapping[str, str],
        execute: Callable[[OSHDBConnection], object],
    ):
        uri = get_interpolated(props, OSHDB_PROPERTY_NAME)
        if uri is None:
            raise ValueError("need to have to specify oshdb!")
        low = uri.lower()
        if low.startswith(STORE_URI_PREFIX):
            db = OSHDB.from_store(
                spark,
                uri[len(STORE_URI_PREFIX):],
                translator=_keytables(spark, props),
            )
        elif low.startswith(DOCS_URI_PREFIX):
            docs = spark.read.parquet(uri[len(DOCS_URI_PREFIX):])
            db = OSHDB.from_docs(
                spark, docs, translator=_keytables(spark, props)
            )
        else:
            raise ValueError(f"unknown oshdb value! {uri}")
        return execute(OSHDBConnection(props, db))


def _keytables(spark: SparkSession, props: Mapping[str, str]):
    path = get_interpolated(props, KEYTABLES_PROPERTY_NAME)
    if path is None:
        return None
    from oshdb_spark.sources.keytables import build_keytables

    return build_keytables(spark.read.parquet(path))

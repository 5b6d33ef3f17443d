"""Error-message parity for querying a database whose tables are absent —
1:1 port of MapReduceOSHDBJdbcMissingTablesTest.java and
MapReduceOSHDBIgniteMissingCacheTest.java (oshdb-api/src/test/java/.../
mapreducer/): every view, stream, and timeout entry point over a missing
store must raise OSHDBTableNotFoundError (the reference's
OSHDBTableNotFoundException), never a raw backend error.
"""

import pytest

from oshdb_spark.api import (
    OSHDB,
    ContributionView,
    OSHDBTableNotFoundError,
    SnapshotView,
)
from oshdb_spark.timestamps import parse_iso

TS = [parse_iso("2014-01-01"), parse_iso("2015-01-01")]


@pytest.fixture()
def missing_path(tmp_path):
    return str(tmp_path / "test-data-without-tables")


def _connect(spark, path):
    return OSHDB.from_store(spark, path)


def test_osm_contribution_view(spark, missing_path):
    with pytest.raises(OSHDBTableNotFoundError):
        db = _connect(spark, missing_path)
        ContributionView.on(db).timestamps(TS).count()


def test_osm_entity_snapshot_view(spark, missing_path):
    with pytest.raises(OSHDBTableNotFoundError):
        db = _connect(spark, missing_path)
        SnapshotView.on(db).timestamps(TS).count()


def test_osm_contribution_view_stream(spark, missing_path):
    with pytest.raises(OSHDBTableNotFoundError):
        db = _connect(spark, missing_path)
        list(ContributionView.on(db).timestamps(TS).stream())


def test_osm_entity_snapshot_view_stream(spark, missing_path):
    with pytest.raises(OSHDBTableNotFoundError):
        db = _connect(spark, missing_path)
        list(SnapshotView.on(db).timestamps(TS).stream())


def test_timeout_map_reduce(spark, missing_path):
    with pytest.raises(OSHDBTableNotFoundError):
        db = _connect(spark, missing_path).timeout(30)
        SnapshotView.on(db).timestamps(TS).count()


def test_timeout_stream(spark, missing_path):
    with pytest.raises(OSHDBTableNotFoundError):
        db = _connect(spark, missing_path).timeout(30)
        list(SnapshotView.on(db).timestamps(TS).stream())


def test_empty_directory_counts_as_missing(spark, tmp_path):
    # a directory with no parquet files is "tables not present", same error
    empty = tmp_path / "empty-store"
    empty.mkdir()
    with pytest.raises(OSHDBTableNotFoundError):
        _connect(spark, str(empty))


def test_pruned_read_missing(spark, missing_path):
    from oshdb_spark.sources.store import read_pruned

    with pytest.raises(OSHDBTableNotFoundError):
        read_pruned(spark, missing_path, (0, 0, 10_000_000, 10_000_000))

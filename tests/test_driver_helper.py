"""Port of the oshdb-helpers database-driver suite (OSHDBDriverH2Test.java)
plus the Util.getInterpolated contract the driver relies on:
connect-by-properties with ``${var}`` interpolation, view factories on the
scoped connection, callback return value passed through, unknown/missing
``oshdb`` URIs rejected with the reference's messages.

The ``store:`` prefix stands in for ``h2:`` (pre-built local table), the
``docs:`` prefix for pointing the driver at raw data.
"""

import pytest

from oshdb_spark.api import OSHDB, SnapshotView, ContributionView
from oshdb_spark.filters.dsl import TagTranslator
from oshdb_spark.helpers import OSHDBConnection, OSHDBDriver, get_interpolated
from oshdb_spark.timestamps import parse_iso


def _t(iso: str) -> int:
    return parse_iso(iso) // 1_000_000  # the docs fixture works in epoch seconds


TS_SNAP = [_t("2016-01-01")]
TS_CONTRIB = [_t("2010-01-01"), _t("2019-01-01")]
BBOX = (-90.0, -45.0, 90.0, 45.0)


@pytest.fixture(scope="module")
def store_base(spark, docs_parquet, tmp_path_factory):
    """A store written under <base>/test-data, addressed via ${test-file}
    interpolation exactly as the reference's props do
    (OSHDBDriverH2Test.java:18-21)."""
    from oshdb_spark.sources.entities import extract_entities
    from oshdb_spark.sources.store import write_entities_table

    path, _, _ = docs_parquet
    ents = extract_entities(spark.read.parquet(path))
    base = tmp_path_factory.mktemp("driver")
    write_entities_table(ents, str(base / "test-data"), n_buckets=4)
    return str(base), path


def _props(store_base):
    base, _ = store_base
    return {"oshdb": f"store:{base}/${{test-file}}", "test-file": "test-data"}


# -- Util.getInterpolated ----------------------------------------------------


def test_interpolation_recursive_and_literal_fallback():
    props = {
        "oshdb": "store:${dir}/${name}",
        "dir": "/data/${env}",
        "env": "prod",
        # "name" missing -> stays literal (Util.java:22 orElse)
    }
    assert get_interpolated(props, "oshdb") == "store:/data/prod/${name}"
    assert get_interpolated(props, "absent") is None


# -- OSHDBDriverH2Test -------------------------------------------------------


def test_get_snapshot_view(spark, store_base):
    """OSHDBDriverH2Test.getSnapshotView: count through the scoped
    connection == the same fluent query on a directly opened database."""
    _, docs_path = store_base

    def query(conn):
        return (
            conn.get_snapshot_view()
            .area_of_interest(bbox=BBOX)
            .filter("type:node")
            .timestamps(TS_SNAP)
            .count()
        )

    result = OSHDBDriver.connect(spark, _props(store_base), query)
    direct_db = OSHDB.from_docs(spark, spark.read.parquet(docs_path))
    direct = (
        SnapshotView.on(direct_db)
        .area_of_interest(bbox=BBOX)
        .filter("type:node")
        .timestamps(TS_SNAP)
        .count()
    )
    assert result == direct
    assert result > 0


def test_get_contribution_view(spark, store_base):
    """OSHDBDriverH2Test.getContributionView analog."""
    _, docs_path = store_base

    def query(conn):
        return (
            conn.get_contribution_view()
            .area_of_interest(bbox=BBOX)
            .filter("type:node")
            .timestamps(TS_CONTRIB)
            .count()
        )

    result = OSHDBDriver.connect(spark, _props(store_base), query)
    direct_db = OSHDB.from_docs(spark, spark.read.parquet(docs_path))
    direct = (
        ContributionView.on(direct_db)
        .area_of_interest(bbox=BBOX)
        .filter("type:node")
        .timestamps(TS_CONTRIB)
        .count()
    )
    assert result == direct
    assert result > 0


def test_getters(spark, store_base):
    """OSHDBDriverH2Test.getter: the connection exposes props, database
    and translator; the callback's return value is passed through."""

    def testGetters(conn):
        assert isinstance(conn, OSHDBConnection)
        assert isinstance(conn.get_props(), dict)
        assert conn.get_props()["test-file"] == "test-data"
        assert isinstance(conn.get_oshdb(), OSHDB)
        assert isinstance(conn.tag_translator, TagTranslator)
        return 0

    assert OSHDBDriver.connect(spark, _props(store_base), testGetters) == 0


def test_docs_route_equivalent(spark, store_base):
    """docs:<path> loads raw data through the ETL; the same query must
    agree with the store route (one pipeline, two entry points)."""
    _, docs_path = store_base

    def query(conn):
        return (
            conn.get_snapshot_view()
            .area_of_interest(bbox=BBOX)
            .filter("type:node")
            .timestamps(TS_SNAP)
            .count()
        )

    via_store = OSHDBDriver.connect(spark, _props(store_base), query)
    via_docs = OSHDBDriver.connect(spark, {"oshdb": f"docs:{docs_path}"}, query)
    assert via_store == via_docs


def test_unknown_prefix_rejected(spark):
    with pytest.raises(ValueError, match="unknown oshdb value"):
        OSHDBDriver.connect(spark, {"oshdb": "ignite:/no/such"}, lambda c: 0)


def test_missing_oshdb_property_rejected(spark):
    with pytest.raises(ValueError, match="specify oshdb"):
        OSHDBDriver.connect(spark, {}, lambda c: 0)


def test_driver_not_instantiable():
    # IllegalStateException("Driver class") parity (OSHDBDriver.java:37-39)
    with pytest.raises(RuntimeError, match="Driver class"):
        OSHDBDriver()

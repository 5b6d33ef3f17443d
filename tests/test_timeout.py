"""Query timeout/cancel (OSHDBDatabase.timeoutInMilliseconds analog,
OSHDBDatabase.java:51-77, MapReducerJdbc.java:47-53): a terminal reducer
exceeding OSHDB.timeout() has its Spark job group cancelled
(interruptOnCancel) and raises OSHDBTimeoutError; the session stays usable.
"""

from __future__ import annotations

import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from oshdb_spark.api import OSHDB, OSHDBTimeoutError, SnapshotView

ENT_SCHEMA = (
    "doc_id string, id long, type string, version int, visible boolean, "
    "ts long, changeset long, uid int, tags map<int,int>, lon long, lat long, "
    "refs array<long>, members array<struct<type:string,ref:long,role:string>>"
)


@pytest.fixture(scope="module")
def db(spark):
    rows = [
        ("d", i, "node", 1, True, 100, 0, 0, {}, i * 1000000, i * 1000000,
         None, None)
        for i in range(1, 9)
    ]
    return OSHDB(spark, spark.createDataFrame(rows, ENT_SCHEMA))


def _slow_filter():
    @F.pandas_udf("boolean")
    def slow(v: pd.Series) -> pd.Series:
        time.sleep(30)
        return v == v

    return slow(F.col("id"))


def test_timeout_cancels_slow_query(spark, db):
    db.timeout(1.5)
    try:
        v = SnapshotView.on(db).timestamps([101]).filter(_slow_filter())
        t0 = time.time()
        with pytest.raises(OSHDBTimeoutError):
            v.count()
        # cancelled well before the 30 s the tasks would otherwise take
        assert time.time() - t0 < 20
        # the session survives the cancellation and runs new jobs
        assert spark.range(5).count() == 5
    finally:
        db.timeout(None)


def test_no_timeout_by_default(spark, db):
    assert SnapshotView.on(db).timestamps([101]).count() == 8


def test_timeout_not_triggered_when_fast(spark, db):
    db.timeout(120)
    try:
        assert SnapshotView.on(db).timestamps([101]).count() == 8
    finally:
        db.timeout(None)

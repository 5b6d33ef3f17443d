import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from oshdb_spark.session import get_spark

    s = get_spark(
        app_name="oshdb_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def small_world():
    """Deterministic small docs table + ground truth (seed 42)."""
    from oshdb_spark.sources.docs import generate_docs

    docs, world = generate_docs(n_features=120, seed=42)
    return docs, world


@pytest.fixture(scope="session")
def docs_parquet(tmp_path_factory):
    from oshdb_spark.sources.docs import write_docs_parquet

    path = str(tmp_path_factory.mktemp("docs") / "docs.parquet")
    docs, world = write_docs_parquet(path, n_features=120, seed=42)
    return path, docs, world

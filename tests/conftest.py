"""Shared test fixtures: one SparkSession per test run, plus the Betfair-shaped
fixture corpus."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # fast session for unit tests


@pytest.fixture(scope="session")
def spark():
    from betfair_database_spark.session import get_spark

    s = get_spark("betfair-database-spark-tests")
    yield s


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    from tests.corpus import build_corpus

    root = tmp_path_factory.mktemp("corpus")
    build_corpus(root)
    return root


@pytest.fixture(scope="session")
def indexed_db(spark, corpus_dir):
    """A database indexed once for read-only query tests."""
    from betfair_database_spark.database import BetfairDatabase

    db = BetfairDatabase(corpus_dir, spark=spark)
    db.index()
    return db


@pytest.fixture()
def fresh_corpus(tmp_path):
    """A private corpus copy for mutation tests (insert/clean)."""
    from tests.corpus import build_corpus

    root = tmp_path / "db"
    build_corpus(root)
    return root


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

import os
import shutil
import tempfile

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("ksql-udaf-statistics-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.default.parallelism", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        # bucketed-table tests: keep the warehouse + derby metastore out
        # of the repo working tree
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="kuss_wh_"))
        .config("spark.driver.extraJavaOptions",
                "-Dderby.system.home=/tmp/kuss_derby")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_dir():
    d = tempfile.mkdtemp(prefix="kuss_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


SF_DIR = os.environ.get("KUSS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR

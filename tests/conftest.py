from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from drill_logfile_plugin_spark.sources.tables import configure_session


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("drill-logfile-plugin-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    configure_session(s, shuffle_partitions=8)
    yield s
    s.stop()


MYSQL_LOG_LINES = [
    "070823 21:00:32       1 Connect     root@localhost on test1",
    "070823 21:00:48       1 Query       show tables",
    "070823 21:00:56       1 Query       select * from category",
    "070917 16:29:01      21 Query       select * from location",
    "070917 16:29:12      21 Query       select * from location where id = 1 LIMIT 1",
]


@pytest.fixture()
def mysql_log(tmp_path):
    """The reference README's worked example (/root/reference/README.md:9-15)."""
    p = tmp_path / "mysql.log"
    p.write_text("\n".join(MYSQL_LOG_LINES) + "\n")
    return str(p)

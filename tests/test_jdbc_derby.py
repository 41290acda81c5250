"""End-to-end JDBC reads against embedded Derby (SURVEY.md §2 S3).

Spark ships Apache Derby jars for its Hive metastore, so an in-memory
Derby database (``jdbc:derby:memory:...``) gives ``read_jdbc`` a real
endpoint with zero new dependencies: rows genuinely travel through
``format("jdbc")``, and both slicing modes (numeric range and explicit
predicates) are asserted to produce the configured partition count —
the property that makes warehouse extraction scale with the cluster
instead of one socket (reference
staging_records_extraction/automate_table_extraction.py:64-65 pulls the
whole table through a single pandas read_sql_query).

Derby-in-memory lives inside the JVM; Spark local mode shares one JVM
between driver and executors, so executor-side JDBC connections see the
same database.
"""

from __future__ import annotations

import pytest

from data_ingestion_from_multiple_directories_linux_spark.sources.jdbc import (
    read_jdbc,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
URL = "jdbc:derby:memory:ingest_e2e;create=true"

ROWS = [
    (i, f"FAC00{i % 3 + 1}", f"patient_{i}", 20 + i % 60) for i in range(100)
]


@pytest.fixture(scope="module")
def derby_table(spark):
    """Create + populate a Derby table through the shared JVM."""
    jvm = spark.sparkContext._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    try:
        st.executeUpdate("DROP TABLE patients")
    except Exception:
        pass  # first run: table doesn't exist
    st.executeUpdate(
        "CREATE TABLE patients ("
        "id INT PRIMARY KEY, facility VARCHAR(10), "
        "name VARCHAR(50), age INT)"
    )
    ps = conn.prepareStatement("INSERT INTO patients VALUES (?, ?, ?, ?)")
    for rid, fac, name, age in ROWS:
        ps.setInt(1, rid)
        ps.setString(2, fac)
        ps.setString(3, name)
        ps.setInt(4, age)
        ps.addBatch()
    ps.executeBatch()
    st.close()
    ps.close()
    conn.close()
    return "patients"


def test_jdbc_range_partitioned_read(spark, derby_table):
    """Range mode: N partitions, each a key-range cursor; full fidelity."""
    df = read_jdbc(
        spark,
        URL,
        derby_table,
        driver=DERBY_DRIVER,
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    got = sorted(
        (r["ID"], r["FACILITY"], r["NAME"], r["AGE"]) for r in df.collect()
    )
    assert got == sorted(ROWS)


def test_jdbc_predicate_partitioned_read(spark, derby_table):
    """Predicates mode: one partition per WHERE fragment (per-facility
    slicing for non-numeric keys)."""
    preds = [f"facility = 'FAC00{k}'" for k in (1, 2, 3)]
    df = read_jdbc(
        spark, URL, derby_table, predicates=preds, driver=DERBY_DRIVER
    )
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == len(ROWS)
    # each slice holds exactly its facility's rows
    per_fac = {r["FACILITY"]: r["n"] for r in
               df.groupBy("FACILITY").count().withColumnRenamed("count", "n").collect()}
    expect = {}
    for _, fac, _, _ in ROWS:
        expect[fac] = expect.get(fac, 0) + 1
    assert per_fac == expect


def test_jdbc_pushdown_subquery(spark, derby_table):
    """dbtable accepts a pushdown subquery — the filter runs in the
    database, not in Spark."""
    df = read_jdbc(
        spark,
        URL,
        "(SELECT id, age FROM patients WHERE age >= 50) t",
        driver=DERBY_DRIVER,
    )
    rows = df.collect()
    assert len(rows) == sum(1 for _, _, _, a in ROWS if a >= 50)
    assert all(r["AGE"] >= 50 for r in rows)

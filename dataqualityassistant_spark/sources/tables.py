"""Table sources/sinks and catalog introspection.

The reference reads whole Postgres tables into pandas (quality_engine.py:
131-132) and introspects information_schema (app/main.py:1311-1411,
db_utils.py:11-35). Here tables are lake tables: Iceberg when the runtime
ships the connector (the 100 TB deployment target — snapshot isolation,
partition pruning, schema evolution), parquet paths otherwise (this sandbox).
All callers go through read_table/write_table so the engine is
format-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

def iceberg_available(spark: SparkSession) -> bool:
    """True when the session's JVM ships the Iceberg Spark connector."""
    return _session_has_iceberg(spark)


def _session_has_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """ref = filesystem path (parquet dir / file) or catalog table name."""
    if os.path.exists(ref) or ref.startswith(("/", "file:", "s3:", "s3a:", "hdfs:")):
        return spark.read.parquet(ref)
    if spark.catalog.tableExists(ref):
        return spark.read.table(ref)
    raise ValueError(f"table not found: {ref}")


def write_table(df: DataFrame, ref: str, mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    spark = df.sparkSession
    if not (ref.startswith(("/", "file:", "s3:", "s3a:", "hdfs:"))) and _session_has_iceberg(spark):
        w.format("iceberg").saveAsTable(ref)
    elif ref.startswith(("/", "file:", "s3:", "s3a:", "hdfs:")) or os.path.isabs(ref):
        w.parquet(ref)
    else:
        w.saveAsTable(ref)


def table_exists(spark: SparkSession, ref: str) -> bool:
    """Analog of the reference's information_schema EXISTS probe
    (db_utils.py:11-35)."""
    if ref.startswith(("/", "file:")) or os.path.isabs(ref):
        return os.path.exists(ref.removeprefix("file:"))
    return spark.catalog.tableExists(ref)


def list_tables(spark: SparkSession, database: str | None = None) -> list[str]:
    """GET /database/tables analog (app/main.py:1311-1334)."""
    return [t.name for t in spark.catalog.listTables(database)]


def table_schema(spark: SparkSession, ref: str) -> list[dict]:
    """GET /database/tables/{t}/schema analog (app/main.py:1336-1411):
    column name/type/nullability. PK/FK constraints have no Spark-catalog
    analog; relationship *inference* lives in profiling.infer_relationships."""
    df = read_table(spark, ref)
    return [
        {"column_name": f.name, "data_type": f.dataType.simpleString(),
         "is_nullable": f.nullable}
        for f in df.schema.fields
    ]

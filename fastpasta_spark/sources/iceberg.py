"""Iceberg connector — gated behind availability, parquet fallback.

The design target is an Iceberg table bucket-partitioned by doc_id
(BASELINE.json input_hint): bucket partitioning gives (a) file pruning
for the lineage/resume bucket filter (plans/lineage.py) and (b)
co-located uniqueness aggregation without a shuffle. The sandbox image
has no Iceberg runtime jars, so `read_docs` transparently degrades to
plain parquet — the engine only depends on the DataFrame it returns.

To run against real Iceberg, launch with:
    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=<path>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fastpasta_spark import schema as S


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_docs(spark: SparkSession, source: str) -> DataFrame:
    """Load the docs table from an Iceberg identifier (catalog.db.tbl)
    or a parquet path. Schema is asserted, never inferred (the
    reference fails fast on a bad first RDH — fastpasta/src/lib.rs:101-159)."""
    if "/" not in source and iceberg_available(spark):
        df = spark.read.format("iceberg").load(source)
    else:
        df = spark.read.schema(S.DOCS_SCHEMA).parquet(source)
    names = [f.name for f in df.schema.fields]
    if names[:2] != ["doc_id", "spans"]:
        raise ValueError(f"docs schema mismatch: {names}")
    return df


def bucket_ddl(target: str, bucket_count: int = 256) -> str:
    """The CTAS DDL write_docs issues on Iceberg — exposed so tests can
    pin the bucket-partitioning contract even on images without the
    runtime jar (the integration test auto-skips there)."""
    return (
        f"CREATE TABLE IF NOT EXISTS {target} "
        f"USING iceberg PARTITIONED BY (bucket({bucket_count}, doc_id)) "
        "AS SELECT * FROM _docs_out"
    )


def write_docs(df: DataFrame, target: str, bucket_count: int = 256) -> None:
    """Write the docs table. On Iceberg: bucket(doc_id) partitioning via
    SQL DDL (file-pruning for resume + co-located uniqueness). On
    parquet: plain write (bucketBy requires a table catalog)."""
    spark = df.sparkSession
    if "/" not in target and iceberg_available(spark):
        df.createOrReplaceTempView("_docs_out")
        spark.sql(bucket_ddl(target, bucket_count))
    else:
        df.write.mode("overwrite").parquet(target)

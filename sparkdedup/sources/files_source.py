"""Source readers for the files table.

Production shape per the north rule is an Iceberg table; this sandbox has
no Iceberg jars, so the reader tries the Iceberg format first and falls
back to parquet, then enforces the contract schema (the pipeline's one
hard input requirement). Column pruning/pushdown happen downstream through
Catalyst regardless of the source format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FILES_COLUMNS = ["repo", "path", "commit", "lang", "content"]


class SchemaError(ValueError):
    pass


def read_files_table(spark: SparkSession, source: str) -> DataFrame:
    """Read files(repo, path, commit, lang, content) from an Iceberg table
    name/path or a parquet path."""
    df = None
    try:
        df = spark.read.format("iceberg").load(source)
    except Exception:
        df = spark.read.parquet(source)
    return enforce_files_schema(df)


def enforce_files_schema(df: DataFrame) -> DataFrame:
    missing = [c for c in FILES_COLUMNS if c not in df.columns]
    if missing:
        raise SchemaError(
            f"files table missing columns {missing}; has {df.columns}")
    for c in FILES_COLUMNS:
        if dict(df.dtypes)[c] != "string":
            df = df.withColumn(c, df[c].cast("string"))
    return df.select(*FILES_COLUMNS)

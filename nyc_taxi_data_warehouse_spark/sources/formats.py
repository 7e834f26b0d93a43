"""Multi-format source/sink layer: parquet, CSV, JSON, ORC.

The reference reads exactly one format (parquet, ``/root/reference/
data/emr/etl.py:20``). This engine treats format as a property of the
edge, not the pipeline: every reader takes an explicit schema (never
infer on the hot path — schema inference re-reads the data) and every
writer round-trips losslessly for the supported type surface.

CSV/JSON carry no timestamp-precision or decimal metadata, so readers
pin semantics via explicit options (ISO-8601 timestamps, UTC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def read_any(
    spark: SparkSession, path: str, fmt: str, schema: StructType
) -> DataFrame:
    reader = spark.read.schema(schema)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "orc":
        return reader.orc(path)
    if fmt == "csv":
        return reader.option("header", "true").option("timestampFormat", _TS_FMT).csv(path)
    if fmt == "json":
        return reader.option("timestampFormat", _TS_FMT).json(path)
    if fmt == "avro":
        return _avro(reader.format("avro").load, path)
    raise ValueError(f"unsupported format: {fmt}")


def _avro(op, path: str):
    """Avro ships as the external spark-avro module (not bundled since
    Spark 2.4); surface a precise remedy instead of Spark's lookup error."""
    try:
        return op(path)
    except Exception as e:  # AnalysisException: Failed to find data source
        if "Failed to find data source" in str(e):
            raise RuntimeError(
                "avro support needs the spark-avro package on the classpath "
                "(--packages org.apache.spark:spark-avro_2.13:<spark-version>); "
                "it is not bundled in this environment"
            ) from e
        raise


def write_any(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    writer = df.write.mode(mode)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "orc":
        writer.orc(path)
    elif fmt == "csv":
        writer.option("header", "true").option("timestampFormat", _TS_FMT).csv(path)
    elif fmt == "json":
        writer.option("timestampFormat", _TS_FMT).json(path)
    elif fmt == "avro":
        _avro(writer.format("avro").save, path)
    else:
        raise ValueError(f"unsupported format: {fmt}")


def read_evolving_parquet(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Read a parquet directory whose files were written under different
    schema versions (columns added over time). mergeSchema unions the
    footers; files lacking a column yield NULLs for it. Pass the target
    schema to pin the result shape regardless of which files exist.

    Scale note: mergeSchema reads EVERY footer at planning time — fine
    for a monthly-file layout (hundreds of footers), wrong for millions
    of tiny files; there, pin `schema` explicitly and skip the merge.
    """
    reader = spark.read.option("mergeSchema", "true")
    df = reader.parquet(path)
    if schema is not None:
        from pyspark.sql import functions as F

        have = {f.name for f in df.schema.fields}
        cols = [
            F.col(f.name).cast(f.dataType).alias(f.name)
            if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
        df = df.select(*cols)
    return df

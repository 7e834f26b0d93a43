"""Multi-format source/sink layer: parquet, CSV, JSON, ORC — plus Avro
when (and only when) the external spark-avro module is on the classpath.

The reference reads exactly one format (parquet, ``/root/reference/
data/emr/etl.py:20``). This engine treats format as a property of the
edge, not the pipeline: every reader takes an explicit schema (never
infer on the hot path — schema inference re-reads the data) and every
writer round-trips losslessly for the supported type surface.

CSV/JSON carry no timestamp-precision or decimal metadata, so readers
pin semantics via explicit options (ISO-8601 timestamps, UTC).

Avro is NOT advertised unconditionally: the short name ``avro`` only
resolves when the external spark-avro module registers it, but Spark
4.x ships the implementation class inside spark-sql — so when
``org.apache.spark.sql.avro.AvroFileFormat`` is loadable we address the
source by its full class name (works with or without the external
module's service registration). Only when the class itself is absent do
``read_any``/``write_any`` reject ``avro`` with the remedy, instead of
claiming a capability the deployment lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

_AVRO_REMEDY = (
    "avro needs the external spark-avro module on the classpath "
    "(--packages org.apache.spark:spark-avro_2.13:<spark-version>)"
)


_AVRO_CLASS = "org.apache.spark.sql.avro.AvroFileFormat"


def has_avro(spark: SparkSession) -> bool:
    """True iff the avro file-format implementation is on the classpath
    (bundled in spark-sql on Spark 4.x; external spark-avro earlier)."""
    try:
        spark._jvm.java.lang.Class.forName(_AVRO_CLASS)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def supported_formats(spark: SparkSession) -> list[str]:
    fmts = ["parquet", "orc", "csv", "json"]
    if has_avro(spark):
        fmts.append("avro")
    return fmts


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
    if fmt == "avro" and has_avro(spark):
        # Full class name: resolves even without the external module's
        # short-name service registration.
        return reader.format(_AVRO_CLASS).load(path)
    if fmt == "avro":
        raise ValueError(f"unsupported format in this deployment: {_AVRO_REMEDY}")
    raise ValueError(f"unsupported format: {fmt}")


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
    elif fmt == "avro" and has_avro(df.sparkSession):
        writer.format(_AVRO_CLASS).save(path)
    elif fmt == "avro":
        raise ValueError(f"unsupported format in this deployment: {_AVRO_REMEDY}")
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

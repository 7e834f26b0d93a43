"""Per-file Bloom data-skipping index — point lookups on NON-layout
columns.

The layout tools cover range predicates: ``write_sorted`` (one column)
and ``write_zordered`` (several) put row-group min/max fences around the
clustered keys, and scans measurably skip. A POINT lookup on a column
the layout was not built for (``user_id`` in a time-partitioned fact
table — the "find this user's rows" audit query) still scans every
file. The standard answer is a Bloom summary per file: tiny, mergeable,
no false negatives.

Index = plain rows, like ``operators/sketches.py``: per data file, an
m-bit Bloom filter stored as ``ceil(m/64)`` longs — ``(file, word,
bits)`` — built in ONE distributed pass: each row emits its key's k
(word, bitmask) pairs via ``_metadata.file_path`` (no per-file jobs),
then ``groupBy(file, word).agg(bit_or)``. The index is itself a parquet
table with a ``_meta.json`` dial sidecar (same fail-fast contract as
the ANN/IVF/postings indexes).

Lookup: a key's k positions are fixed, so candidate files are those
whose stored words cover every probe mask. The probe reads ONLY the
needed words (pushed filter on ``word``), evaluates the cover test as
an aggregation, and returns the file list — metadata-sized end to end.
``read_with_bloom`` then scans just those files (plus the residual
predicate, since Bloom hits can be false positives — never false
negatives).

Sizing: m=65536, k=7 ≈ 1% false positives at ~6.5k distinct keys per
file; 8 KiB of index per data file — at 100 TB / 256 MB files that is
~3 MB of index per TB, trivially broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.indexmeta import (
    check_index_meta,
    read_index_meta,
    write_index_meta,
)


def _probe_pairs(key, m_bits: int, k: int):
    """The k (word, mask) pairs for a key: position i = xxhash64(i, key)
    mod m; word = pos / 64, mask = 1 << (pos % 64)."""
    out = []
    for i in range(k):
        pos = F.pmod(F.xxhash64(F.lit(i), key), F.lit(m_bits))
        out.append(
            (
                (pos / 64).cast("int"),
                # SQL shiftleft takes a column shift amount; the Python
                # wrapper insists on an int literal
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
                ),
            )
        )
    return out


def build_bloom_index(
    spark: SparkSession,
    table_path: str,
    key_col: str,
    index_path: str,
    m_bits: int = 65536,
    k: int = 7,
) -> int:
    """One pass over the table -> ``(file, word, bits)`` rows at
    ``index_path`` + dial sidecar. Returns indexed file count."""
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    src = spark.read.parquet(table_path)
    # xxhash64 hashes the PHYSICAL type (int vs long vs string give
    # different bits for the "same" value), so the probe side must cast
    # to exactly this type — record it in the sidecar.
    key_type = src.schema[key_col].dataType.simpleString()
    df = src.select(
        F.col(key_col).alias("_k"),
        F.col("_metadata.file_path").alias("file"),
    )
    pairs = F.array(
        *[
            F.struct(w.alias("word"), msk.alias("mask"))
            for w, msk in _probe_pairs(F.col("_k"), m_bits, k)
        ]
    )
    idx = (
        df.where(F.col("_k").isNotNull())
        .select("file", F.explode(pairs).alias("p"))
        .groupBy("file", F.col("p.word").alias("word"))
        .agg(F.bit_or("p.mask").alias("bits"))
    )
    idx.write.mode("overwrite").parquet(index_path)
    write_index_meta(
        spark,
        index_path,
        {
            "kind": "bloom",
            "key_col": key_col,
            "key_type": key_type,
            "m_bits": m_bits,
            "k": k,
        },
    )
    return spark.read.parquet(index_path).select("file").distinct().count()


def bloom_candidate_files(
    spark: SparkSession,
    index_path: str,
    key_col: str,
    values: list,
    m_bits: int = 65536,
    k: int = 7,
) -> list[str]:
    """Files that MAY contain any of ``values`` (no false negatives).
    The scan of the index is pruned to the probed words only."""
    if not values:
        return []
    # Dedupe probe VALUES (duplicates would double the per-(file,_k)
    # probe rows and make the n==k cover test reject real matches) —
    # but never the probe ROWS: identical (word, mask) pairs from an
    # intra-key position collision must still count k times.
    values = list(dict.fromkeys(values))
    check_index_meta(
        spark,
        index_path,
        {"kind": "bloom", "key_col": key_col, "m_bits": m_bits, "k": k},
    )
    key_type = (read_index_meta(spark, index_path) or {}).get("key_type")
    if key_type is None:
        raise ValueError(
            f"{index_path}: sidecar lacks key_type — rebuild the index "
            "(probe hashing is type-sensitive; guessing risks silent "
            "false negatives)"
        )
    probes = spark.createDataFrame([(v,) for v in values], ["_k"]).select(
        F.col("_k").cast(key_type).alias("_k")
    )
    if probes.where(F.col("_k").isNull()).limit(1).count():
        raise ValueError(
            f"probe values do not cast cleanly to indexed type {key_type}"
        )
    pairs = F.array(
        *[
            F.struct(w.alias("word"), msk.alias("mask"))
            for w, msk in _probe_pairs(F.col("_k"), m_bits, k)
        ]
    )
    needed = probes.select(F.col("_k"), F.explode(pairs).alias("p")).select(
        "_k", F.col("p.word").alias("word"), F.col("p.mask").alias("mask")
    )
    words = [r.word for r in needed.select("word").distinct().collect()]
    idx = spark.read.parquet(index_path).where(F.col("word").isin(words))
    # a file covers a key iff ALL k probe bits are set in its words
    hit = (
        needed.join(F.broadcast(idx), "word")
        .withColumn(
            "_ok",
            (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")).cast(
                "int"
            ),
        )
        .groupBy("file", "_k")
        .agg(F.sum("_ok").alias("n_ok"), F.count(F.lit(1)).alias("n"))
        .where((F.col("n") == k) & (F.col("n_ok") == k))
    )
    return sorted({r.file for r in hit.select("file").distinct().collect()})


def read_with_bloom(
    spark: SparkSession,
    table_path: str,
    index_path: str,
    key_col: str,
    values: list,
    m_bits: int = 65536,
    k: int = 7,
) -> DataFrame:
    """The point-lookup: scan only Bloom-candidate files, then apply
    the exact residual predicate (Bloom false positives filtered here;
    false negatives impossible by construction). An empty candidate set
    short-circuits to an empty typed DataFrame without touching data."""
    files = bloom_candidate_files(
        spark, index_path, key_col, values, m_bits, k
    )
    schema = spark.read.parquet(table_path).schema
    if not files:
        return spark.createDataFrame([], schema)
    return (
        spark.read.option("basePath", table_path)
        .parquet(*files)
        .where(F.col(key_col).isin(values))
        .select(*[f.name for f in schema.fields])
    )


def append_to_bloom_index(
    spark: SparkSession,
    table_path: str,
    index_path: str,
    key_col: str,
    m_bits: int = 65536,
    k: int = 7,
) -> int:
    """Index only data files the index has not seen (monthly loads,
    streaming appends) — the same incremental-maintenance contract as
    the ANN/IVF/postings indexes: a growing table never pays a full
    rebuild. Data files are immutable once written (every write path
    here creates new files), so per-file Bloom rows never go stale;
    re-running after a partial failure is idempotent (already-indexed
    files are skipped). Returns newly indexed file count."""
    src = spark.read.parquet(table_path)
    check_index_meta(
        spark,
        index_path,
        {
            "kind": "bloom",
            "key_col": key_col,
            "key_type": src.schema[key_col].dataType.simpleString(),
            "m_bits": m_bits,
            "k": k,
        },
    )
    indexed = spark.read.parquet(index_path).select("file").distinct()
    df = src.select(
        F.col(key_col).alias("_k"),
        F.col("_metadata.file_path").alias("file"),
    )
    fresh = df.join(F.broadcast(indexed), "file", "left_anti")
    pairs = F.array(
        *[
            F.struct(w.alias("word"), msk.alias("mask"))
            for w, msk in _probe_pairs(F.col("_k"), m_bits, k)
        ]
    )
    add = (
        fresh.where(F.col("_k").isNotNull())
        .select("file", F.explode(pairs).alias("p"))
        .groupBy("file", F.col("p.word").alias("word"))
        .agg(F.bit_or("p.mask").alias("bits"))
        .localCheckpoint(eager=True)  # cut lineage off the index scan
    )
    n_new = add.select("file").distinct().count()
    if n_new:
        add.write.mode("append").parquet(index_path)
    return n_new

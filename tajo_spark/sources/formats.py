"""Storage-format readers/writers (Tajo tablespace parity).

Reference formats (BuiltinStorages.java:22-36; scanners under
tajo-storage/tajo-storage-hdfs/.../storage/) → Spark datasources:

| Tajo format | reference file | here |
|---|---|---|
| TEXT (delimited) | text/DelimitedTextFile.java:56 | csv reader (multi-char ``sep`` supported) |
| JSON lines | json/JsonLineDeserializer.java:46 | json reader (+schema inference = SelfDescSchemaBuildPhase.java:52 parity) |
| REGEX lines | regex/RegexLineDeserializer.java:47 | text reader + regexp_extract per group |
| RAW | rawfile/DirectRawFileScanner.java:45 | binaryFile datasource |
| PARQUET | parquet/ParquetScanner.java:38 | native |
| ORC | orc/OrcScanner.java:51 | native |
| AVRO | avro/AvroScanner.java:53 | ``spark-avro`` when on classpath (gated) |
| SEQUENCEFILE | sequencefile/SequenceFileScanner.java:48 | Hadoop RDD API (gated); typed serde path in sources/hive_formats.py |
| RCFILE | rcfile/RCFile.java:328 | Hive serde tables (sources/hive_formats.py; needs enableHiveSupport) |

JDBC pushdown parity (tajo-storage-jdbc/.../JdbcScanner.java:61,108
generates remote SQL with filter+projection+limit): ``spark.read.jdbc``
performs the same pushdowns natively — exposed via read_jdbc for
surface completeness.

Every reader returns a lazy DataFrame; filters/projections compose and
push into the scan (Catalyst), so at 100 TB a 2-column query reads 2
columns.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# --- TEXT (delimited) --------------------------------------------------------
def read_delimited(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    delimiter: str = "|",
    null_value: str = "\\N",
    header: bool = False,
    **options: str,
) -> DataFrame:
    """DelimitedTextFile parity, incl. multi-byte delimiters
    (reference test multibytes_delimiter_*, SURVEY.md §7.3.3)."""
    reader = (
        spark.read.option("sep", delimiter)
        .option("nullValue", null_value)
        .option("header", str(header).lower())
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_delimited(
    df: DataFrame, path: str, delimiter: str = "|", null_value: str = "\\N",
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .option("sep", delimiter)
        .option("nullValue", null_value)
        .csv(path)
    )


# --- JSON lines --------------------------------------------------------------
def read_json_lines(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    text_typing: bool = False,
) -> DataFrame:
    """Schema omitted → inference on read, the Spark-native equivalent of
    the reference's self-describing-table planning phase
    (SelfDescSchemaBuildPhase.java:52-55). ``text_typing=True``
    reproduces the reference's typing exactly — every primitive reads
    as TEXT and queries re-parse (the engine's SELF_DESC_TEXT_TYPING
    session var; ignored when a schema is given)."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    elif text_typing:
        reader = reader.option("primitivesAsString", "true")
    return reader.json(path)


def write_json_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


# --- REGEX lines -------------------------------------------------------------
def read_regex(
    spark: SparkSession,
    path: str,
    pattern: str,
    columns: list[str],
    types: list[str] | None = None,
) -> DataFrame:
    """RegexLineDeserializer parity: each line matched against ``pattern``;
    capture group i → ``columns[i]``. Non-matching lines yield NULLs in
    every column (the reference skips them — filter on a non-null key to
    replicate). Runs as a single JVM-side projection (regexp_extract),
    no Python."""
    n_groups = _re.compile(pattern).groups
    if n_groups != len(columns):
        raise ValueError(
            f"pattern has {n_groups} capture groups but {len(columns)} "
            "column names given"
        )
    lines = spark.read.text(path)
    cols = []
    for i, name in enumerate(columns, start=1):
        c = F.regexp_extract(F.col("value"), pattern, i)
        # regexp_extract returns '' on no-match; normalize to NULL
        c = F.when(c == "", None).otherwise(c)
        if types:
            c = c.cast(types[i - 1])
        cols.append(c.alias(name))
    return lines.select(*cols)


# --- RAW binary --------------------------------------------------------------
def read_raw(spark: SparkSession, path: str) -> DataFrame:
    """DirectRawFileScanner parity: one row per file with content bytes
    (plus path/length metadata) — the ingest point for multimodal
    corpora (operators/multimodal.py)."""
    return spark.read.format("binaryFile").load(path)


# --- columnar formats --------------------------------------------------------
def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """AVRO scan (AvroScanner.java:53 parity). Prefers the JVM
    spark-avro datasource when on the classpath (full pushdown /
    splittability); otherwise falls back to the pure-Python container
    codec (sources/avro_py.py — binaryFile + Arrow decode, one task
    per file), so the format works on a bare pyspark install."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:
        if "Failed to find" in str(e) or "ClassNotFound" in str(e):
            from tajo_spark.sources import avro_py

            return avro_py.read_avro(spark, path)
        raise  # real read errors must surface as themselves


def write_avro(df: DataFrame, path: str) -> None:
    """AVRO sink (AvroAppender parity); same classpath preference and
    pure-Python fallback as :func:`read_avro`."""
    try:
        df.write.format("avro").mode("overwrite").save(path)
    except Exception as e:
        if "Failed to find" in str(e) or "ClassNotFound" in str(e):
            from tajo_spark.sources import avro_py

            avro_py.write_avro(df, path)
            return
        raise


# --- SEQUENCEFILE ------------------------------------------------------------
def read_sequencefile(
    spark: SparkSession, path: str, value_schema: str, delimiter: str = "|"
) -> DataFrame:
    """SequenceFileScanner parity via the Hadoop RDD API: values are
    delimited text (the reference's layout — SequenceFileScanner.java:48
    wraps the text deserializer). The RDD hop is per-partition streaming,
    not a driver collect."""
    try:
        rdd = spark.sparkContext.sequenceFile(path).values()
    except Exception as e:
        raise NotImplementedError(
            "sequencefile input requires Hadoop IO classes"
        ) from e
    from tajo_spark.plans.dialect import _split_top_level

    lines = spark.createDataFrame(rdd.map(lambda v: (v,)), "value STRING")
    names_types = [
        c.strip().split(None, 1) for c in _split_top_level(value_schema)
    ]
    cols = [
        F.split(F.col("value"), _re.escape(delimiter)).getItem(i)
        .cast(t)
        .alias(n)
        for i, (n, t) in enumerate(names_types)
    ]
    return lines.select(*cols)


# --- JDBC --------------------------------------------------------------------
def read_jdbc(
    spark: SparkSession, url: str, table: str, **options: str
) -> DataFrame:
    """JdbcTablespace parity: Spark's JDBC source pushes filter,
    projection and limit to the remote engine exactly as the reference's
    SQLBuilder does (JdbcScanner.java:61,108)."""
    reader = spark.read.format("jdbc").option("url", url).option(
        "dbtable", table
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


# --- KAFKA -------------------------------------------------------------------
def kafka_offset_ranges_json(
    topic: str, ranges: dict[int, tuple[int, int]]
) -> tuple[str, str]:
    """(startingOffsets, endingOffsets) JSON for fixed per-partition
    offset ranges — the exact fragment surface of the reference's batch
    Kafka scan (KafkaTablespace.java:59 plans one fragment per
    (topic, partition, startOffset, lastOffset); KafkaScanner reads it).
    Pure string builder so the option surface is unit-testable without
    a broker."""
    if not ranges:
        raise ValueError("ranges must contain at least one partition")
    for p, (s, e) in ranges.items():
        if s < 0 or e < s:
            raise ValueError(
                f"partition {p}: invalid offset range [{s}, {e})"
            )
    import json

    start = {str(p): s for p, (s, _) in ranges.items()}
    end = {str(p): e for p, (_, e) in ranges.items()}
    return json.dumps({topic: start}), json.dumps({topic: end})


# The exact output schema of Spark's kafka datasource — the mock
# transport below serves the same columns so downstream code is
# byte-compatible with the real source.
KAFKA_WIRE_COLUMNS = (
    "key", "value", "topic", "partition", "offset", "timestamp",
    "timestampType",
)


def write_kafka_mock_log(df: DataFrame, path: str) -> None:
    """Stage a brokerless 'topic': one parquet directory per Kafka
    partition (``partitionBy("partition")``), rows carrying
    (partition INT, offset LONG, key BINARY, value BINARY,
    timestamp TIMESTAMP).  This is a TEST/CI transport — it lets the
    offset-range fragment semantics of :func:`read_kafka_batch`
    execute end-to-end without a broker or the spark-sql-kafka jar.
    Production deployments ship the jar and never touch this path."""
    cols = set(df.columns)
    missing = {"partition", "offset", "value"} - cols
    if missing:
        raise ValueError(f"mock log requires columns {sorted(missing)}")
    (
        df.write.partitionBy("partition")
        .mode("overwrite")
        .parquet(path)
    )


def read_kafka_mock_log(
    spark: SparkSession,
    path: str,
    topic: str,
    offset_ranges: dict[int, tuple[int, int]] | None = None,
) -> DataFrame:
    """Brokerless twin of the kafka batch scan: per-partition
    ``[start, end)`` slices over a staged mock log, returning the
    datasource's exact wire schema.  The (partition, offset) filter is
    an OR of per-partition conjunctions — partition values prune
    directories, offset predicates push into parquet row groups, so
    each fragment reads only its own byte range (the reference's
    KafkaScanner.java fragment granularity)."""
    base = spark.read.parquet(path)
    if offset_ranges is not None:
        # validate through the same surface as the real path
        kafka_offset_ranges_json(topic, offset_ranges)
        cond = None
        for p, (s, e) in offset_ranges.items():
            leg = (
                (F.col("partition") == p)
                & (F.col("offset") >= s)
                & (F.col("offset") < e)
            )
            cond = leg if cond is None else (cond | leg)
        base = base.filter(cond)
    if "key" not in base.columns:
        base = base.withColumn("key", F.lit(None).cast("binary"))
    if "timestamp" not in base.columns:
        base = base.withColumn("timestamp", F.lit(None).cast("timestamp"))
    return base.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        F.col("timestamp"),
        # 0 = CreateTime, matching the datasource default
        F.lit(0).alias("timestampType"),
    )


def read_kafka_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
    offset_ranges: dict[int, tuple[int, int]] | None = None,
    mock_log_dir: str | None = None,
) -> DataFrame:
    """KafkaTablespace parity (KafkaScanner.java reads fixed offset
    ranges as batch fragments): Spark's kafka datasource does exactly
    this with ``startingOffsets``/``endingOffsets``. Pass
    ``offset_ranges`` ({partition: (start, end)}) to pin per-partition
    ranges like the reference's fragments. Needs spark-sql-kafka on
    the classpath and a reachable broker; ``mock_log_dir`` serves the
    same wire schema + range semantics from a staged local log
    (:func:`write_kafka_mock_log`) so the fragment path executes
    brokerless in CI."""
    if mock_log_dir is not None:
        return read_kafka_mock_log(spark, mock_log_dir, topic, offset_ranges)
    if offset_ranges is not None:
        starting_offsets, ending_offsets = kafka_offset_ranges_json(
            topic, offset_ranges
        )
    try:
        return (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .option("endingOffsets", ending_offsets)
            .load()
        )
    except Exception as e:
        if "Failed to find" in str(e) or "ClassNotFound" in str(e):
            raise NotImplementedError(
                "kafka datasource not on classpath; add "
                "org.apache.spark:spark-sql-kafka-0-10"
            ) from e
        raise

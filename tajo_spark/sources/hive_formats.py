"""Hive-serde storage formats: RCFILE and serde SEQUENCEFILE.

Reference parity: the reference scans RCFile natively
(tajo-storage/tajo-storage-hdfs/.../rcfile/RCFile.java:328) and
SequenceFile through Hive serdes
(sequencefile/SequenceFileScanner.java:48). Spark has no *datasource*
for RCFile, but it ships the Hive integration (spark-hive on the
default classpath) whose table reader/writer speaks every Hive storage
handler — so the Spark-first expression of these formats is a Hive
``STORED AS`` table pinned to an explicit LOCATION, not a row-at-a-time
reimplementation of the container format.

Requires a Hive-enabled session (``enableHiveSupport()``); on the
default in-memory catalog these raise with a one-line fix hint. The
embedded-Derby metastore Spark creates on first use is local-mode
plumbing only — on a real cluster the same code runs against the
shared metastore, and the data path (splittable container files read
by executor-side serdes, predicate/column work done by Catalyst above
the scan) is identical at any scale.

Read path: an EXTERNAL table (never owns the files) registered under a
path-hashed name, so repeated reads of one directory reuse one catalog
entry and concurrent readers never collide. Write path: stage through
an EXTERNAL table as well — dropping the staging entry afterwards
leaves the files in place.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession

_HIVE_FORMATS = frozenset({"RCFILE", "SEQUENCEFILE", "TEXTFILE"})


def hive_support_available(spark: SparkSession) -> bool:
    try:
        return (
            spark.conf.get("spark.sql.catalogImplementation", "in-memory")
            == "hive"
        )
    except Exception:
        return False


def _require_hive(spark: SparkSession, what: str) -> None:
    if not hive_support_available(spark):
        raise NotImplementedError(
            f"{what} needs a Hive-enabled SparkSession "
            "(SparkSession.builder.enableHiveSupport()); the current "
            "session uses the in-memory catalog"
        )


def _ddl_cols(df_or_schema) -> str:
    schema = (
        df_or_schema.schema
        if isinstance(df_or_schema, DataFrame)
        else df_or_schema
    )
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema)


def _table_name(path: str, fmt: str, schema_ddl: str = "") -> str:
    digest = hashlib.md5(
        f"{fmt}:{path}:{schema_ddl}".encode()
    ).hexdigest()[:12]
    return f"tajo_hive_{fmt.lower()}_{digest}"


def _q(path: str) -> str:
    # same single-quote escaping register_hive_udf applies to jar paths
    return path.replace("'", "''")


def _check_fmt(fmt: str) -> str:
    fmt = fmt.upper()
    if fmt not in _HIVE_FORMATS or not re.fullmatch(r"[A-Z]+", fmt):
        raise ValueError(f"not a Hive-serde format: {fmt}")
    return fmt


def write_stored_as(df: DataFrame, path: str, fmt: str) -> None:
    """Write ``df`` to ``path`` in a Hive ``STORED AS`` container format
    via a transient EXTERNAL staging table (files survive the drop)."""
    fmt = _check_fmt(fmt)
    spark = df.sparkSession
    _require_hive(spark, f"writing {fmt}")
    name = _table_name(path, fmt) + "_w"
    view = name + "_src"
    df.createOrReplaceTempView(view)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE EXTERNAL TABLE {name} ({_ddl_cols(df)}) "
        f"STORED AS {fmt} LOCATION '{_q(path)}'"
    )
    try:
        spark.sql(f"INSERT OVERWRITE TABLE {name} SELECT * FROM {view}")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.catalog.dropTempView(view)


def read_stored_as(
    spark: SparkSession, path: str, schema_ddl: str, fmt: str
) -> DataFrame:
    """Lazy DataFrame over a Hive-serde directory. ``schema_ddl`` is the
    column list (``"a INT, b STRING"``) — serde formats are not
    self-describing, exactly as in the reference's catalog-supplied
    schemas."""
    fmt = _check_fmt(fmt)
    _require_hive(spark, f"reading {fmt}")
    # the name hashes (path, fmt, schema): identical reads genuinely
    # reuse one catalog entry, and IF NOT EXISTS (instead of the racy
    # DROP+CREATE) means a concurrent reader can never yank the table
    # out from under another's in-flight scan; a different schema over
    # the same path simply hashes to a different entry
    name = _table_name(path, fmt, schema_ddl)
    spark.sql(
        f"CREATE EXTERNAL TABLE IF NOT EXISTS {name} ({schema_ddl}) "
        f"STORED AS {fmt} LOCATION '{_q(path)}'"
    )
    return spark.table(name)


def read_rcfile(
    spark: SparkSession, path: str, schema_ddl: str
) -> DataFrame:
    """RCFile scan (RCFile.java:328 parity)."""
    return read_stored_as(spark, path, schema_ddl, "RCFILE")


def write_rcfile(df: DataFrame, path: str) -> None:
    write_stored_as(df, path, "RCFILE")


def read_sequencefile_serde(
    spark: SparkSession, path: str, schema_ddl: str
) -> DataFrame:
    """Typed SequenceFile scan through the Hive serde
    (SequenceFileScanner.java:48 parity) — unlike
    ``formats.read_sequencefile`` (raw key/value bytes), this yields
    the table's declared columns."""
    return read_stored_as(spark, path, schema_ddl, "SEQUENCEFILE")


def write_sequencefile_serde(df: DataFrame, path: str) -> None:
    write_stored_as(df, path, "SEQUENCEFILE")

"""Pluggable tablespaces: URI-scheme-routed storage backends.

Reference parity: the reference routes every table URI through a
registry of ``Tablespace`` handlers — ``TablespaceManager`` maps URI
schemes to handler classes and caches instances
(tajo-storage-common/.../storage/TablespaceManager.java; the abstract
surface is Tablespace.java:52 — scanner/appender factories per
format), with concrete backends for HDFS, JDBC
(JdbcTablespace.java:56), PostgreSQL, Kafka (KafkaTablespace.java:59),
S3 (S3TableSpace.java:45), HBase (HBaseTablespace.java:73) and an
example HTTP-JSON space (tajo-tablespace-example/).

Spark-first expression: most backends are URI schemes Spark's Hadoop
filesystem layer or a DataSource already understands (``s3a://`` paths,
``spark.read.jdbc``, the Kafka source), so the registry's job shrinks
to (a) mapping a scheme to the reader/writer that serves it and (b) an
extension point for backends Spark has no datasource for. The **HBase
tablespace is exactly that extension point**: its connector jars are
not shippable here, so ``hbase`` registers a handler that documents
the contract (row-key range pruning per IndexPredication.java, sorted
bulk-load writes per HFileAppender.java/SortedInsertRewriter.java) and
raises a clear error, while the test suite registers a FAKE tablespace
through the same API to prove third-party backends plug in without
touching engine code — the reference's own extension story
(tajo-tablespace-example) translated.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Tablespace:
    """A storage backend handler (Tablespace.java:52 analogue).

    ``reader(spark, uri, options) -> DataFrame`` and optional
    ``writer(df, uri, options) -> None``; ``note`` documents
    scale-relevant behavior (pushdown, split granularity).
    """

    scheme: str
    reader: Callable[[SparkSession, str, dict], DataFrame]
    writer: Callable[[DataFrame, str, dict], None] | None
    note: str


_REGISTRY: dict[str, Tablespace] = {}


def register_tablespace(space: Tablespace) -> None:
    """TablespaceManager.addTableSpaceForTest analogue — schemes are
    unique; re-registering replaces (latest wins, like a config
    override)."""
    _REGISTRY[space.scheme] = space


def tablespace_for(uri: str) -> Tablespace:
    scheme = urlparse(uri).scheme or "file"
    try:
        return _REGISTRY[scheme]
    except KeyError:
        raise ValueError(
            f"no tablespace handler for scheme {scheme!r} "
            f"(registered: {sorted(_REGISTRY)}) — register one via "
            "register_tablespace(), the TablespaceManager extension "
            "point"
        ) from None


def read_uri(spark: SparkSession, uri: str, **options) -> DataFrame:
    return tablespace_for(uri).reader(spark, uri, options)


def write_uri(df: DataFrame, uri: str, **options) -> None:
    space = tablespace_for(uri)
    if space.writer is None:
        raise NotImplementedError(
            f"tablespace {space.scheme!r} is read-only"
        )
    space.writer(df, uri, options)


# --- built-in handlers -------------------------------------------------------


def _path_reader(spark: SparkSession, uri: str, options: dict) -> DataFrame:
    fmt = options.pop("format", "parquet")
    return spark.read.format(fmt).options(**options).load(uri)


def _path_writer(df: DataFrame, uri: str, options: dict) -> None:
    fmt = options.pop("format", "parquet")
    mode = options.pop("mode", "overwrite")
    df.write.format(fmt).mode(mode).options(**options).save(uri)


def _jdbc_reader(spark: SparkSession, uri: str, options: dict) -> DataFrame:
    # JdbcTablespace.java:56 — Spark's JDBC source does the same
    # filter/projection/limit pushdown JdbcScanner generates by hand
    table = options.pop("dbtable")
    return spark.read.jdbc(uri.replace("jdbc+", "jdbc:", 1), table,
                           properties=options)


def _hbase_reader(spark: SparkSession, uri: str, options: dict) -> DataFrame:
    raise NotImplementedError(
        "HBase tablespace (HBaseTablespace.java:73): requires the "
        "hbase-spark connector jars, which cannot ship in this "
        "environment. Deployment contract: register a Tablespace whose "
        "reader wraps spark.read.format('org.apache.hadoop.hbase.spark') "
        "with catalog-mapped columns; row-key range predicates push down "
        "(IndexPredication.java parity) and writes should sort on the "
        "row key before bulk-load (SortedInsertRewriter/HFileAppender "
        "parity). The contract is demonstrated EXECUTABLE by "
        "sources/hbase_sim.py ('hbase+file' scheme): sorted region-split "
        "bulk load + row-key range scans pruned via driver-side region "
        "metadata — register() plugs it through this same API."
    )


class UndefinedTablespaceError(ValueError):
    """CREATE TABLE ... TABLESPACE <name> with an unregistered name —
    Tajo's UndefinedTablespaceException (raised by
    TablespaceManager.getByName; golden:
    TestCreateTable/negative/create_table_on_absent_tablespace.sql)."""


# NAMED tablespaces (Tajo's ``TABLESPACE space_name`` DDL clause —
# names resolve via the catalog, distinct from the URI-scheme handler
# registry above).  Value is the root URI tables in the space live
# under, or None for "engine default" (the Spark warehouse).
_NAMED: dict[str, str | None] = {}


def register_named_tablespace(name: str, root_uri: str | None) -> None:
    _NAMED[name.lower()] = root_uri


def named_tablespace_root(name: str) -> str | None:
    """Root URI for a named tablespace; raises like
    TablespaceManager.getByName on an unknown name."""
    try:
        return _NAMED[name.lower()]
    except KeyError:
        raise UndefinedTablespaceError(
            f"undefined tablespace: {name} "
            f"(registered: {sorted(_NAMED)})"
        ) from None


def register_builtin_tablespaces() -> None:
    register_named_tablespace("default", None)
    for scheme in ("file", "hdfs", "s3a", "s3", "gs", "abfss"):
        register_tablespace(Tablespace(
            scheme, _path_reader, _path_writer,
            "Hadoop-FS path space: splits at row-group/file granularity; "
            "filter+projection pushdown via the format datasource",
        ))
    register_tablespace(Tablespace(
        "jdbc+postgresql", _jdbc_reader, None,
        "JDBC space (PgSQLTablespace parity): predicate/column pushdown "
        "into remote SQL; partitionColumn options shard the scan",
    ))
    register_tablespace(Tablespace(
        "hbase", _hbase_reader, None,
        "extension point — see _hbase_reader's contract",
    ))


register_builtin_tablespaces()

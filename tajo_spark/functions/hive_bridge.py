"""Hive UDF bridge: load Hive UDF/GenericUDF/UDAF/UDTF classes from jars.

Reference parity: the reference scans jars for ``@UDFType``-annotated
Hive function classes and wraps them into its own function registry
(tajo-core/src/main/java/org/apache/tajo/engine/function/hiveudf/
HiveFunctionLoader.java:47). Spark ships the same capability natively
in spark-hive: ``CREATE [TEMPORARY] FUNCTION name AS 'class' USING JAR
'path'`` distributes the jar to executors and wraps the class in
HiveSimpleUDF / HiveGenericUDF / HiveUDAFFunction — evaluated JVM-side
per batch, never through a Python round-trip, so a bridged UDF costs
the same as in the reference.

Requires a Hive-enabled session (the function wrapper classes live in
the Hive session state). ``build_udf_jar`` is the dev-loop helper: it
compiles Java UDF source against the hive-exec/hadoop jars Spark
already ships and zips the classes into a jar — gated on a JDK being
present, exactly like any Java UDF workflow.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import zipfile

from pyspark.sql import SparkSession

from tajo_spark.sources.hive_formats import _require_hive

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def register_hive_udf(
    spark: SparkSession,
    name: str,
    class_name: str,
    jar: str | None = None,
    temporary: bool = True,
) -> None:
    """CREATE [TEMPORARY] FUNCTION ``name`` AS ``class_name``.

    ``class_name`` may be any Hive function flavor (UDF, GenericUDF,
    AbstractGenericUDAFResolver, GenericUDTF) — Spark picks the wrapper.
    ``jar`` is shipped to every executor; omit it when the class is
    already on the classpath.
    """
    _require_hive(spark, "the Hive UDF bridge")
    if not _IDENT.fullmatch(name):
        raise ValueError(f"invalid function name: {name}")
    if not re.fullmatch(r"[A-Za-z0-9_.$]+", class_name):
        raise ValueError(f"invalid class name: {class_name}")
    kw = "TEMPORARY FUNCTION" if temporary else "FUNCTION"
    # the neighboring args are regex-validated; the free-form jar path
    # gets SQL-literal escaping so a quote in a path can't truncate or
    # extend the statement
    using = " USING JAR '" + jar.replace("'", "''") + "'" if jar else ""
    spark.sql(f"CREATE {kw} {name} AS '{class_name}'{using}")


def drop_hive_udf(
    spark: SparkSession, name: str, temporary: bool = True
) -> None:
    if not _IDENT.fullmatch(name):
        raise ValueError(f"invalid function name: {name}")
    kw = "TEMPORARY FUNCTION" if temporary else "FUNCTION"
    spark.sql(f"DROP {kw} IF EXISTS {name}")


def _spark_jars_dir() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "jars")


def jdk_available() -> bool:
    return shutil.which("javac") is not None


def build_udf_jar(
    java_source: str, class_name: str, out_dir: str
) -> str:
    """Compile one Java UDF source file into ``out_dir/<class>.jar``
    against the hive-exec + hadoop jars Spark ships; returns the jar
    path. Raises RuntimeError when no JDK is installed."""
    if not jdk_available():
        raise RuntimeError("build_udf_jar needs javac (no JDK installed)")
    jars = _spark_jars_dir()
    cp = os.pathsep.join(
        os.path.join(jars, j)
        for j in os.listdir(jars)
        if j.startswith(("hive-exec", "hive-serde", "hadoop-client-api"))
    )
    os.makedirs(out_dir, exist_ok=True)
    src = os.path.join(out_dir, f"{class_name}.java")
    with open(src, "w") as f:
        f.write(java_source)
    classes = os.path.join(out_dir, "classes")
    subprocess.run(
        ["javac", "-cp", cp, "-d", classes, src],
        check=True,
        capture_output=True,
    )
    jar_path = os.path.join(out_dir, f"{class_name}.jar")
    with zipfile.ZipFile(jar_path, "w") as z:
        for root, _dirs, files in os.walk(classes):
            for fn in files:
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, classes))
    return jar_path

"""Warehouse DDL + JDBC sink — reference T2/T3/T4 parity.

The reference issues ``CREATE TABLE IF NOT EXISTS`` / ``DROP TABLE ...
CASCADE`` against Postgres (``queries.py:1-34``, ``task.py:148-151,
170-177``) and appends with ``to_sql``. Spark equivalents:

 - managed parquet tables in the session catalog (``saveAsTable`` /
   ``spark.sql`` DDL) — CASCADE is a no-op (no enforced FK graph;
   constraints are quality checks, operators/quality.py)
 - ``df.write.jdbc`` for actual-database parity. Exercised end-to-end
   against embedded Derby (whose driver ships in Spark's own jars —
   see test_warehouse.py's round-trip); for Postgres the vendor jar
   must be on ``spark.jars``, and the function raises a clear error
   when no suitable driver is present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def create_table(
    spark: SparkSession, name: str, schema: T.StructType, *, comment: str = ""
) -> None:
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    # '' doubling: the one escape SQL string literals need — an
    # unescaped quote in the comment would break (or splice into) the DDL
    comment_sql = f" COMMENT '{comment.replace(chr(39), chr(39) * 2)}'" if comment else ""
    spark.sql(f"CREATE TABLE IF NOT EXISTS `{name}` ({cols}) USING parquet{comment_sql}")


def drop_table(spark: SparkSession, name: str) -> None:
    # CASCADE intentionally absent: Spark has no FK graph to cascade
    # through (reference parity note, SURVEY §2 T4).
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")


def append_table(df: DataFrame, name: str) -> None:
    df.write.mode("append").format("parquet").saveAsTable(name)


def table_exists(spark: SparkSession, name: str) -> bool:
    return spark.catalog.tableExists(name)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC sink (reference ``to_sql`` parity). Requires the vendor JDBC
    driver on the Spark classpath (e.g. ``spark.jars`` →
    postgresql-*.jar); raises a clear error when it's absent."""
    try:
        df.write.jdbc(url=url, table=table, mode=mode, properties=properties or {})
    except Exception as e:  # pragma: no cover - env-dependent
        if "No suitable driver" in str(e) or "ClassNotFound" in str(e):
            raise RuntimeError(
                "JDBC driver not on classpath; add the vendor jar via "
                "spark.jars (not bundled in this environment)"
            ) from e
        raise

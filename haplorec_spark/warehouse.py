"""Table sinks and materialization modes.

Reproduces the reference's query-result materialization surface
(/root/reference/src/groovy/haplorec/util/Sql.groovy):

* ``Sql.selectAs`` (S6, Sql.groovy:416-461) offered five sinks — new
  table per storage engine, existing table, raw query, list of rows,
  lazy iterator. :func:`materialize` maps them onto Spark: ``table``
  (saveAsTable), ``path`` (parquet), ``df`` (lazy), ``rows``
  (collect), ``iterator`` (toLocalIterator). MySQL's MEMORY/MyISAM/
  InnoDB engine choice (Sql.groovy:6,412) is obsolete under
  Tungsten/Parquet.
* ``Sql.createTableFromExisting`` (S5, Sql.groovy:30-64): CTAS with a
  ``dontRunQuery`` schema-only variant (``LIMIT 0``) —
  :func:`create_table_from`. Secondary indexes become a no-op (Parquet
  column stats; engines with Z-ordering handle the rest).
* ``Sql.insertIntoSql`` ON DUPLICATE KEY discard/update
  (S4, Sql.groovy:388-408): :func:`insert_into` implements ``discard``
  as an anti-join against the live table on the key and ``update`` as a
  key-preferring overwrite (new rows win). On a transactional format
  (Delta/Iceberg) both collapse into a single MERGE; the parquet
  implementation here keeps the same visible semantics.
* ``Sql.tblColumns`` schema introspection (S11, Sql.groovy:549-610):
  :func:`table_columns` from the catalog plus the engine's primary-key
  metadata (Spark has no PK concept; schema.PRIMARY_KEYS carries it).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from haplorec_spark import schema as sch


def create_table_from(
    df: DataFrame,
    name: str,
    *,
    schema_only: bool = False,
    mode: str = "overwrite",
) -> None:
    """S5 CTAS; ``schema_only`` mirrors the reference's
    ``dontRunQuery`` LIMIT-0 create (Sql.groovy:43-47)."""
    out = df.limit(0) if schema_only else df
    out.write.mode(mode).saveAsTable(name)


def insert_into(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    *,
    on_duplicate: str | None = None,
    key: Sequence[str] | None = None,
) -> None:
    """S4 insert-select into an existing table.

    ``on_duplicate=None`` appends; ``'discard'`` drops incoming rows
    whose key already exists (ON DUPLICATE KEY UPDATE k=k trick,
    Sql.groovy:396-399); ``'update'`` replaces existing rows with the
    same key (new rows win). ``key`` defaults to the engine's PK
    metadata for known tables.
    """
    if on_duplicate is None:
        df.write.mode("append").insertInto(name)
        return
    if key is None:
        key = sch.PRIMARY_KEYS.get(name)
        if key is None:
            raise ValueError(f"no key metadata for {name!r}; pass key=")
    existing = spark.table(name)
    incoming = df.dropDuplicates(list(key))
    if on_duplicate == "discard":
        fresh = incoming.join(existing, on=list(key), how="left_anti")
        fresh.write.mode("append").insertInto(name)
    elif on_duplicate == "update":
        kept = existing.join(incoming, on=list(key), how="left_anti")
        merged = kept.unionByName(incoming.select(*existing.columns))
        # Rewrite through a staged temp view: overwriting a table from a
        # plan that reads it is not allowed.
        staged = merged.localCheckpoint(eager=True)
        staged.write.mode("overwrite").saveAsTable(name)
    else:
        raise ValueError(f"on_duplicate must be None|'discard'|'update', got {on_duplicate!r}")


def materialize(
    df: DataFrame,
    *,
    as_: str = "df",
    name: str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> DataFrame | list[Row] | Iterator[Row] | None:
    """S6: one query, five sinks (Sql.selectAs, Sql.groovy:416-461)."""
    if as_ == "df":
        return df
    if as_ == "rows":
        return df.collect()
    if as_ == "iterator":
        return df.toLocalIterator()
    if as_ == "table":
        if not name:
            raise ValueError("as_='table' requires name=")
        df.write.mode(mode).saveAsTable(name)
        return None
    if as_ == "path":
        if not path:
            raise ValueError("as_='path' requires path=")
        df.write.mode(mode).parquet(path)
        return None
    raise ValueError(f"unknown materialization {as_!r}")


def table_columns(
    spark: SparkSession, name: str
) -> dict[str, Any]:
    """S11 introspection: column list + primary key for a table, from
    the catalog + engine PK metadata (information_schema analog)."""
    cols = [c.name for c in spark.catalog.listColumns(name)]
    return {
        "columns": cols,
        "primary_key": list(sch.PRIMARY_KEYS.get(name, [])),
    }

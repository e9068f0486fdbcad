"""Row-condensing operators: the Spark face of the reference's lazy
row-iterator library (/root/reference/src/groovy/haplorec/util/Row.groovy).

The reference post-processes report joins with a volcano-style iterator
chain: noDuplicates -> filter -> collapse -> fill -> changeKeys -> DSV
(util/sql/Report.groovy:94-170). Those ops are order-DEPENDENT and the
reference admits it relies on MySQL fetch order (sql/Report.groovy:90-93).
Here every op takes an explicit deterministic ``order_by`` — a documented
semantic tightening (SURVEY.md §4 item 3).

Spark shapes:

* ``no_duplicates`` (A12) — per column-group first-seen dedup via
  ``row_number`` windows; fully distributed, one shuffle per distinct
  duplicate-key, usually sharing one partitioning.
* ``collapse`` (A13) — accumulative merge of consecutive rows; inherently
  sequential within its sort contract, so it runs as a grouped
  ``applyInPandas`` kernel per ``partition_by`` group (reports are
  per-job, bounded by human-readable output size; at 100 TB you collapse
  per patient/job partition, never globally). The pure-Python kernel
  ``collapse_rows`` matches RowTest.groovy goldens and is unit-testable
  without Spark.
* ``fill_missing`` (P3), ``project`` (P1), ``rename_columns`` (P2),
  ``write_dsv`` (S7) — thin declarative wrappers.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from functools import lru_cache
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

Row = dict[str, Any]


# ----------------------------------------------------------- pure kernels


def _non_null_keys(row: Row) -> list[str]:
    return [k for k, v in row.items() if v is not None]


def default_can_collapse(header: Sequence[str], last: Row, cur: Row) -> bool:
    """Row.groovy:128-147 default: collapsible iff no shared column."""
    return not (set(last.keys()) & set(cur.keys()))


def default_merge(header: Sequence[str], last: Row, cur: Row) -> None:
    """Row.groovy default collapse: overwrite last with cur."""
    last.update(cur)


@lru_cache(maxsize=64)
def _header_index(header: tuple) -> dict[str, int]:
    """Memoized header -> position map: ``report_can_collapse`` runs
    once per ROW in the collapse kernel, and rebuilding the index dict
    per call was the kernel's single hottest line (measured round 13).
    Headers are tiny and few, so a small LRU holds them all."""
    return {h: i for i, h in enumerate(header)}


def report_can_collapse(header: Sequence[str], last: Row, cur: Row) -> bool:
    """sql/Report.groovy:94-141 canCollapse: empty rows always collapse;
    otherwise non-null column sets must not overlap AND the first
    non-null column of ``cur`` must come after the last non-null column
    of ``last`` in header order."""
    last_keys = _non_null_keys(last)
    cur_keys = _non_null_keys(cur)
    if not last_keys or not cur_keys:
        return True
    if set(last_keys) & set(cur_keys):
        return False
    idx = _header_index(tuple(header))
    first_cur = min((idx[k] for k in cur_keys if k in idx), default=-1)
    last_last = max((idx[k] for k in last_keys if k in idx), default=-1)
    return first_cur > last_last


def report_merge(header: Sequence[str], last: Row, cur: Row) -> None:
    """sql/Report.groovy:142-146 collapse: copy cur's non-null values."""
    for k in _non_null_keys(cur):
        last[k] = cur[k]


def collapse_rows(
    rows: Sequence[Row],
    header: Sequence[str] | None = None,
    can_collapse: Callable[[Sequence[str], Row, Row], bool] | None = None,
    merge: Callable[[Sequence[str], Row, Row], Any] | None = None,
) -> list[Row]:
    """Accumulative collapse of consecutive rows (Row.groovy:128-185).

    ``merge`` may mutate the accumulated row in place or return a new
    row dict. Header defaults to the first row's keys (the reference's
    header-row convention).
    """
    can_collapse = can_collapse or default_can_collapse
    merge = merge or default_merge
    out: list[Row] = []
    last: Row | None = None
    hdr: Sequence[str] = header if header is not None else []
    for row in rows:
        row = dict(row)
        if last is None:
            last = row
            if header is None:
                hdr = list(row.keys())
        elif can_collapse(hdr, last, row):
            merged = merge(hdr, last, row)
            if isinstance(merged, dict):
                last = merged
        else:
            out.append(last)
            last = row
    if last is not None:
        out.append(last)
    return out


def no_duplicates_rows(
    rows: Sequence[Row],
    groups: Mapping[str, tuple[Sequence[str], Sequence[str]]],
) -> list[Row]:
    """First-seen column-group dedup (Row.groovy:40-64), pure Python.

    ``groups`` maps group name -> (duplicate_key_columns, columns_to_show).
    Each output row contains only the columns of groups whose duplicate
    key tuple had not been seen before.
    """
    seen: dict[str, set[tuple]] = {g: set() for g in groups}
    out: list[Row] = []
    for row in rows:
        r: Row = {}
        for g, (dup_key, cols) in groups.items():
            k = tuple(row.get(c) for c in dup_key)
            if k not in seen[g]:
                seen[g].add(k)
                for c in cols:
                    r[c] = row.get(c)
        out.append(r)
    return out


# ----------------------------------------------------------- Spark faces


def no_duplicates(
    df: DataFrame,
    groups: Mapping[str, tuple[Sequence[str], Sequence[str]]],
    order_by: Sequence[str],
) -> DataFrame:
    """A12 as windows: for each group, rows after the first occurrence of
    the group's duplicate-key tuple (in ``order_by`` order) get that
    group's columns nulled.

    A column claimed by several groups survives if ANY of them sees a
    fresh key (Row.groovy:50-58 merges group outputs into one row).
    Window partitions share the ``order_by`` sort; Catalyst plans one
    shuffle per distinct duplicate key.
    """
    out = df
    rn_cols: dict[str, str] = {}
    for g, (dup_key, _cols) in groups.items():
        rn = f"_rn_{g}"
        rn_cols[g] = rn
        w = Window.partitionBy(*[F.col(c) for c in dup_key]).orderBy(
            *[F.col(c) for c in order_by]
        )
        out = out.withColumn(rn, F.row_number().over(w))
    col_owners: dict[str, list[str]] = {}
    for g, (_dup, cols) in groups.items():
        for c in cols:
            col_owners.setdefault(c, []).append(g)
    keep_exprs = []
    grouped_cols = set(col_owners)
    for c in df.columns:
        if c in grouped_cols:
            fresh = None
            for g in col_owners[c]:
                cond = F.col(rn_cols[g]) == 1
                fresh = cond if fresh is None else (fresh | cond)
            keep_exprs.append(F.when(fresh, F.col(c)).alias(c))
        else:
            keep_exprs.append(F.col(c))
    return out.select(*keep_exprs)


def collapse(
    df: DataFrame,
    order_by: Sequence[str],
    partition_by: Sequence[str] | None = None,
    can_collapse: Callable[[Sequence[str], Row, Row], bool] | None = None,
    merge: Callable[[Sequence[str], Row, Row], Any] | None = None,
    header: Sequence[str] | None = None,
) -> DataFrame:
    """A13: accumulative collapse per ``partition_by`` group, rows sorted
    by ``order_by`` within the group.

    With ``partition_by=None`` the whole frame is one group (exact
    reference semantics, sequential — only for job-scoped report output).
    Collapse never crosses a partition boundary; choose ``partition_by``
    so that is semantically true (e.g. per job or per patient).

    Round 13 (guide §4.2): the grouped kernel is ``applyInArrow``
    (was ``applyInPandas``). The pandas boundary paid a per-CELL
    ``pd.isna`` call plus a NaN round-trip risk (pandas reads a float
    NaN as MISSING, so a NaN value would cross back as NULL); Arrow's
    ``to_pylist`` yields ``None`` for exactly the null cells at C
    speed and keeps NaN a value. The within-group sort is Arrow-native
    with an explicit original-order tiebreak column, reproducing the
    old ``mergesort``'s stability, and nulls sort last per key (the
    pandas ``na_position='last'`` convention, now part of this
    function's documented contract).
    """
    hdr = list(header) if header is not None else list(df.columns)
    schema: StructType = df.select(*hdr).schema
    keys = list(partition_by) if partition_by else []
    sort_cols = [c for c in order_by]

    def kernel(tbl):
        import pyarrow as pa
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            tbl.append_column(
                "_ord", pa.array(range(tbl.num_rows), type=pa.int64())
            ),
            sort_keys=[(c, "ascending") for c in sort_cols]
            + [("_ord", "ascending")],
            null_placement="at_end",
        )
        cols = {c: tbl.column(c).take(idx).to_pylist() for c in hdr}
        recs = [
            {c: cols[c][i] for c in hdr} for i in range(tbl.num_rows)
        ]
        collapsed = collapse_rows(recs, hdr, can_collapse, merge)
        return pa.table(
            {
                c: pa.array(
                    [r.get(c) for r in collapsed],
                    type=tbl.schema.field(c).type,
                )
                for c in hdr
            }
        )

    if keys:
        return df.groupBy(*keys).applyInArrow(kernel, schema=schema)
    return (
        df.coalesce(1)
        .groupBy(F.lit(1).alias("_g"))
        .applyInArrow(lambda tbl: kernel(tbl), schema=schema)
    )


def fill_missing(
    df: DataFrame, value: Any = None, columns: Sequence[str] | None = None
) -> DataFrame:
    """P3: replace nulls with ``value`` (no-op when value is None —
    missing keys are already nulls in a DataFrame)."""
    if value is None:
        return df
    return df.na.fill(value, subset=list(columns) if columns else None)


def project(df: DataFrame, keep: Sequence[str]) -> DataFrame:
    """P1: keep-list projection (Row.groovy:311-325)."""
    return df.select(*[c for c in keep if c in df.columns])


def rename_columns(
    df: DataFrame, mapping: Mapping[str, str] | Callable[[str], str]
) -> DataFrame:
    """P2: rename via map or function of the column name."""
    if callable(mapping):
        return df.toDF(*[mapping(c) for c in df.columns])
    return df.withColumnsRenamed(dict(mapping))


def write_dsv(
    df: DataFrame,
    path: str,
    separator: str = "\t",
    order_by: Sequence[str] | None = None,
    single_file: bool = False,
) -> None:
    """S7: DSV sink — header + separator, null -> '' (Row.groovy:244-305).

    ``single_file`` coalesces to one part (small job-scoped reports);
    leave False for distributed writes.
    """
    out = df
    if order_by:
        out = out.orderBy(*order_by)
    string_cols = [f.name for f in out.schema.fields]
    out = out.select(
        *[F.coalesce(F.col(c).cast("string"), F.lit("")).alias(c)
          for c in string_cols]
    )
    if single_file:
        out = out.coalesce(1)
    (
        out.write.mode("overwrite")
        .option("header", True)
        .option("sep", separator)
        .option("emptyValue", "")
        .csv(path)
    )

"""As-of join: for each left row, the most recent right row at or before it.

The reference engine has no temporal joins (SURVEY §2.3: "no
sort-merge/as-of/interval/range joins"); this is engine breadth for
event/training-data pipelines (feature lookback, last-quote attach,
click→purchase attribution).

Scale design — union + ordered window, NOT a range join:

    left ∪ right  →  one shuffle on the equi-keys  →  per-key ordered
    `last(payload, ignorenulls)` window  →  keep left rows

A naive inequality join (`l.key = r.key AND r.ts <= l.ts` + argmax)
explodes to |matches| rows per left row before pruning — quadratic per
key in the worst case and a BroadcastNestedLoopJoin if Catalyst can't
see the equi-conjunct. The union form is linear: one Exchange on the
join keys, one sort per partition (both sides together), constant
state per row. This is the standard distributed as-of shape and it
survives 100 TB as long as the equi-key (here `user_id`) is
high-cardinality; per-key data volume bounds the sort, not total
volume.

Determinism contract: ties on (keys, ts) *within the right side* are
resolved arbitrarily, exactly as SQL ASOF JOIN does. Callers that
carry value columns and need determinism must pre-aggregate the right
side to one row per (keys, ts). A right row at exactly the left row's
timestamp IS visible (`ts_r <= ts_l`, inclusive), matching DuckDB's
`ON l.ts >= r.ts`.

NULL semantics: rows with a NULL equi-key never match (SQL equality),
matching DuckDB's ASOF LEFT JOIN. NULL-key *right* rows are dropped up
front (they can never be anyone's match); NULL-key *left* rows are kept
— routed around the union/window entirely (no shuffle for them) and
re-attached with NULL payload, so the output has exactly one row per
left row. Without the routing, a window partition would group all NULL
keys together and invent matches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: attach, to every ``left`` row, ``right_ts`` and
    ``right_cols`` from the latest ``right`` row with the same ``on``
    keys and ``right_ts <= left_ts`` (NULLs when no such row).

    Output = all ``left`` columns + ``{prefix}{right_ts}`` +
    ``{prefix}{c}`` for each carried right column.
    """
    on = list(on)
    right_cols = list(right_cols or [])

    payload_fields = [F.col(right_ts).alias(right_ts)] + [
        F.col(c).alias(c) for c in right_cols
    ]
    r = (
        right.na.drop(subset=on)
        .select(
            *on,
            F.col(right_ts).alias(_TS),
            F.struct(*payload_fields).alias(_PAYLOAD),
        )
        .withColumn(_SIDE, F.lit(0))
    )
    null_key = None
    for k in on:
        cond = F.col(k).isNull()
        null_key = cond if null_key is None else (null_key | cond)
    l_matchable = left if null_key is None else left.filter(~null_key)
    l = (
        l_matchable
        .withColumn(_TS, F.col(left_ts))
        .withColumn(_SIDE, F.lit(1))
    )

    unioned = l.unionByName(r, allowMissingColumns=True)

    # Right rows sort before left rows at equal timestamps, making the
    # boundary inclusive; the running `last ignorenulls` is the as-of
    # state machine, evaluated in one pass per key partition.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )

    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col(f"{_PAYLOAD}.{right_ts}").alias(f"{prefix}{right_ts}"))
    out_cols.extend(
        F.col(f"{_PAYLOAD}.{c}").alias(f"{prefix}{c}") for c in right_cols
    )
    out = matched.filter(F.col(_SIDE) == 1).select(*out_cols)

    if null_key is None:
        return out
    # NULL-key left rows trivially match nothing: attach NULL payload
    # columns map-side and union back (they never enter the shuffle).
    right_types = dict(right.dtypes)
    null_payload = [
        F.lit(None).cast(right_types[right_ts]).alias(f"{prefix}{right_ts}")
    ] + [
        F.lit(None).cast(right_types[c]).alias(f"{prefix}{c}")
        for c in right_cols
    ]
    unmatched = left.filter(null_key).select(
        *[F.col(c) for c in left.columns], *null_payload
    )
    return out.unionByName(unmatched)

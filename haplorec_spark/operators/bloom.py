"""Distributed Bloom-filter membership: the compressed broadcast tier
of reference-set lookup (decontamination blocklists, historical dedup
stores, URL blocklists).

The existing membership operators broadcast the reference keys
themselves (``sampling.decontaminate`` ships distinct 32-hex shingle
hashes, ~40 B+overhead per key). A Bloom filter ships ~``1.44 ·
log2(1/fpp)`` BITS per key (~1.2 B/key at 1e-2, ~2.4 B/key at 1e-4) —
a 15-30× smaller broadcast for the same zero-corpus-shuffle probe
plan, which moves the "reference set fits the broadcast" ceiling from
tens of millions of keys to the low billions. The price is a bounded,
*chosen* false-positive rate; there are NO false negatives (a true
member always probes true), which is exactly the safe direction for
decontamination and blocklisting: a false positive drops a clean
document (rate = fpp), a miss never leaks a benchmark item.

Representation: the filter IS a DataFrame ``(chunk BIGINT, bits
BIGINT)`` — 63 usable bits per chunk (the sign bit stays clear so the
shift/mask arithmetic is portable across engines that reject
signed-overflow shifts; DuckDB, which runs the oracles, is one).
All-zero chunks are simply absent.

Plan shapes (the 100 TB contract):

* **build** — k map-side hash projections per key (explode of a
  k-element array), then ONE aggregate keyed on ``chunk`` with
  map-side partial ``bit_or`` — the shuffle moves at most
  ``n_bits/63`` rows regardless of key count.
* **probe** — k broadcast hash joins on ``chunk`` against the SAME
  small bits frame (Spark reuses the broadcast exchange). The probed
  corpus never shuffles, never explodes: each hash is a projected
  column, each lookup a broadcast join, the verdict a boolean AND.
* ``max_broadcast_bits`` bounds the probe's broadcast (default 2^28
  bits ≈ 68 MB of chunk rows); above it the constructor refuses
  loudly — the fallback for bigger reference sets is the exact
  shuffle-join membership (``sampling.decontaminate`` semantics with
  ``broadcast`` dropped), not a silent executor OOM.

Determinism: positions derive from ``md5`` (same convention as every
hash in the engine), so build and probe agree across engines, reruns
and languages, and every operator here has an exact DuckDB oracle.

Public-knowledge provenance: Bloom (1970) CACM 13(7) "Space/time
trade-offs in hash coding with allowable errors"; the parameter
formulas are the standard ``m = -n·ln p / (ln 2)^2``,
``k = (m/n)·ln 2``. No reference counterpart (haplorec has no
membership sketch); this face exists for the crawl-scale pipeline.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_parameters",
    "bloom_build",
    "bloom_probe",
    "bloom_decontaminate",
    "duck_bloom_bits_sql",
    "duck_bloom_member_sql",
]

#: usable bits per BIGINT chunk (sign bit kept clear — see module doc)
CHUNK_BITS = 63

#: unit separator + NULL sentinel — the sampling._key_str convention
_SEP = "\x1f"
_NULL = "\x00null"

#: refuse to build a probe plan whose bits frame exceeds this many
#: bits (≈ n_bits/63 rows × ~16 B broadcast). 2^28 bits ≈ 4.3 M chunk
#: rows ≈ 68 MB — comfortably broadcastable; override knowingly.
MAX_BROADCAST_BITS = 1 << 28


def bloom_parameters(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (n_bits, n_hashes) for ``n_items`` keys at ``fpp``.

    ``n_bits`` is rounded up to a multiple of ``CHUNK_BITS`` so the
    last chunk is full; ``n_hashes`` = round(m/n · ln 2), floored at 1.
    """
    if n_items <= 0:
        raise ValueError(f"n_items must be positive, got {n_items}")
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + CHUNK_BITS - 1) // CHUNK_BITS) * CHUNK_BITS
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _position(seed: str, i: int, key_cols: Sequence[str], n_bits: int) -> Column:
    """Hash position i in [0, n_bits): 60-bit integer from the first
    15 hex chars of md5(seed:i ␟ key columns), mod n_bits. NULL key
    components become a sentinel (the sampling._key_str convention)."""
    key = F.concat_ws(
        _SEP,
        F.lit(f"{seed}:{i}"),
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(_NULL))
            for c in key_cols
        ],
    )
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    return h % F.lit(n_bits)


def bloom_build(
    keys: DataFrame,
    key_cols: Sequence[str],
    *,
    n_bits: int,
    n_hashes: int,
    seed: str = "bloom",
) -> DataFrame:
    """(chunk, bits): the filter over the reference keys.

    One map-side explode of the k positions per key, one partial-
    aggregated ``bit_or`` keyed on chunk — the only shuffle moves
    ≤ ``n_bits/63`` rows. Duplicate keys are free (bit_or is
    idempotent), so no upstream distinct is needed.

    Persist with plain ``df.write.parquet`` — the frame IS the store
    (≤ n_bits/63 rows); record (n_bits, n_hashes, seed) next to it,
    they are part of the filter's identity (a probe with different
    parameters is silently wrong — same failure mode as the LSH
    store's segmentation marker, so write them down).
    """
    if n_hashes < 1 or n_bits < 1:
        raise ValueError(
            f"need n_hashes >= 1 and n_bits >= 1, got {n_hashes}/{n_bits}"
        )
    positions = F.array(
        *[_position(seed, i, key_cols, n_bits) for i in range(n_hashes)]
    )
    return (
        keys.select(F.explode(positions).alias("pos"))
        .select(
            F.expr(f"pos DIV {CHUNK_BITS}").alias("chunk"),
            # shiftleft's python binding takes a literal shift count;
            # the SQL form accepts a column
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" CAST(pos % {CHUNK_BITS} AS INT))"
            ).alias("b"),
        )
        .groupBy("chunk")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bits: DataFrame,
    key_cols: Sequence[str],
    *,
    n_bits: int,
    n_hashes: int,
    seed: str = "bloom",
    out_col: str = "maybe_member",
    max_broadcast_bits: int = MAX_BROADCAST_BITS,
) -> DataFrame:
    """``df`` + boolean ``out_col``: true iff every hash bit is set.

    (n_bits, n_hashes, seed) MUST match the build call — the filter's
    identity. k broadcast joins against the same bits frame; the k
    exchanges canonicalize identically (only alias names differ), so
    AQE's exchange reuse materializes the build ONCE at runtime —
    k-1 ReusedExchange nodes, pinned by
    tests/test_bloom.py::test_probe_builds_bits_once_at_runtime.
    The probed side stays map-side throughout.
    NULL-keyed rows probe like any other key (the NULL sentinel is a
    valid key value, matching build).
    """
    if n_hashes < 1 or n_bits < 1:
        raise ValueError(
            f"need n_hashes >= 1 and n_bits >= 1, got {n_hashes}/{n_bits}"
        )
    if n_bits > max_broadcast_bits:
        raise ValueError(
            f"n_bits={n_bits} exceeds max_broadcast_bits="
            f"{max_broadcast_bits} (~{n_bits // CHUNK_BITS} chunk rows "
            "to broadcast); use the exact shuffle-join membership for "
            "reference sets this large, or raise the bound knowingly"
        )
    out = df
    hit_cols = []
    for i in range(n_hashes):
        pos = _position(seed, i, key_cols, n_bits)
        out = out.withColumn(f"_bloom_pos_{i}", pos)
        side = bits.select(
            F.col("chunk").alias(f"_bloom_c_{i}"),
            F.col("bits").alias(f"_bloom_b_{i}"),
        )
        out = out.join(
            F.broadcast(side),
            F.expr(f"_bloom_pos_{i} DIV {CHUNK_BITS}")
            == F.col(f"_bloom_c_{i}"),
            "left",
        )
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT),"
            f" CAST(_bloom_pos_{i} % {CHUNK_BITS} AS INT))"
        )
        hit_cols.append(
            F.coalesce(
                (F.col(f"_bloom_b_{i}").bitwiseAND(mask) != 0),
                F.lit(False),
            )
        )
    member = hit_cols[0]
    for h in hit_cols[1:]:
        member = member & h
    out = out.withColumn(out_col, member)
    drop = [f"_bloom_pos_{i}" for i in range(n_hashes)]
    drop += [f"_bloom_c_{i}" for i in range(n_hashes)]
    drop += [f"_bloom_b_{i}" for i in range(n_hashes)]
    return out.drop(*drop)


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    fpp: float = 1e-4,
    n_items_hint: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    segmentation: str = "whitespace",
    seed: str = "bloom-decontaminate",
    max_broadcast_bits: int = MAX_BROADCAST_BITS,
) -> DataFrame:
    """:func:`sampling.decontaminate` semantics through a Bloom filter:
    drop corpus docs sharing any n-word shingle with ``benchmark``,
    plus ≤ ``fpp`` per-shingle false drops.

    Same shingle tokenization as the exact operator (imported from it,
    so the two can never drift). The benchmark side compresses to
    ~1.44·log2(1/fpp) bits per distinct shingle — the operator to
    reach for when the benchmark/blocklist's exact hash set outgrows a
    comfortable broadcast but its Bloom image does not. The corpus
    side: map-side shingle explode → map-side probe (k broadcast
    joins) → the rare hits distinct to a tiny dirty-id set → broadcast
    anti join. The corpus text itself never shuffles.

    ``n_items_hint`` sizes the filter without a counting job; by
    default the distinct benchmark shingles are counted first (one
    job over the benchmark only — eval-set sized, cheap).
    """
    from haplorec_spark.operators.sampling import shingle_hashes

    bench_hashes = shingle_hashes(
        benchmark, n, text_col=text_col, id_col=id_col,
        segmentation=segmentation,
    ).select("sh_hash")
    n_items = (
        n_items_hint
        if n_items_hint is not None
        else max(1, bench_hashes.distinct().count())
    )
    n_bits, n_hashes = bloom_parameters(n_items, fpp)
    bits = bloom_build(
        bench_hashes, ["sh_hash"], n_bits=n_bits, n_hashes=n_hashes,
        seed=seed,
    )
    corpus_hashes = shingle_hashes(
        corpus, n, text_col=text_col, id_col=id_col,
        segmentation=segmentation,
    )
    dirty = (
        bloom_probe(
            corpus_hashes, bits, ["sh_hash"],
            n_bits=n_bits, n_hashes=n_hashes, seed=seed,
            max_broadcast_bits=max_broadcast_bits,
        )
        .filter(F.col("maybe_member"))
        .select(id_col)
        .distinct()
    )
    return corpus.join(F.broadcast(dirty), on=id_col, how="left_anti")


# --------------------------------------------------------------- oracle twin

def _duck_hash60(key_expr: str) -> str:
    """First 15 hex chars of md5 → 60-bit integer (the DUCK_BAND
    pattern at 15 digits — DuckDB has no conv())."""
    # lambda var is `d`, NOT `i`: callers embed this inside a
    # list_transform whose own variable is `i` — reusing it here would
    # shadow the hash index and silently collapse all k positions
    return (
        "list_reduce(list_transform(generate_series(1, 15),"
        f" d -> strpos('0123456789abcdef', substr(md5({key_expr}), d, 1))"
        " - 1), (x, y) -> x * 16 + y)::BIGINT"
    )


def duck_bloom_positions_sql(
    key_expr: str, *, seed: str, n_bits: int, n_hashes: int
) -> str:
    """Table expression ``(pos)``: the k positions of one key — pair
    with unnest. ``key_expr`` must already be a VARCHAR expression."""
    key = (
        f"'{seed}:' || i::VARCHAR || chr(31) || "
        f"coalesce({key_expr}, chr(0) || 'null')"
    )
    return (
        f"unnest(list_transform(generate_series(0, {n_hashes - 1}),"
        f" i -> {_duck_hash60(key)} % {n_bits}))"
    )


def duck_bloom_bits_sql(
    keys_sql: str, key_expr: str, *, seed: str, n_bits: int, n_hashes: int
) -> str:
    """CTE body ``(chunk, bits)`` over ``keys_sql`` (a table
    expression exposing ``key_expr``)."""
    pos = duck_bloom_positions_sql(
        key_expr, seed=seed, n_bits=n_bits, n_hashes=n_hashes
    )
    return f"""
        SELECT pos // {CHUNK_BITS} AS chunk,
               bit_or(1::BIGINT << (pos % {CHUNK_BITS})::INT) AS bits
        FROM (SELECT {pos} AS pos FROM ({keys_sql}))
        GROUP BY 1
    """


def duck_bloom_member_sql(
    probe_sql: str,
    bits_sql: str,
    key_expr: str,
    id_expr: str,
    *,
    seed: str,
    n_bits: int,
    n_hashes: int,
) -> str:
    """``(id, maybe_member)`` over ``probe_sql`` rows against a
    ``bits_sql`` filter body (both table expressions).

    The probe relation is deduplicated on (id, key) before position
    expansion — duplicated probe rows would double the per-id hit
    count and the ``= n_hashes`` test would fabricate a FALSE
    NEGATIVE, the one error class the module guarantees impossible
    (review-caught). One key per id assumed (the Spark twin scores
    per-row; this aggregate form needs id to determine the key)."""
    pos = duck_bloom_positions_sql(
        "k", seed=seed, n_bits=n_bits, n_hashes=n_hashes
    )
    return f"""
        SELECT id, (count(*) FILTER (
                   WHERE b.bits IS NOT NULL
                     AND (b.bits & (1::BIGINT << (p.pos % {CHUNK_BITS})::INT))
                         <> 0)) = {n_hashes} AS maybe_member
        FROM (SELECT id, {pos} AS pos
              FROM (SELECT DISTINCT {id_expr} AS id, {key_expr} AS k
                    FROM ({probe_sql}))) p
        LEFT JOIN ({bits_sql}) b ON p.pos // {CHUNK_BITS} = b.chunk
        GROUP BY id
    """


# ------------------------------------------------------------- driver gate

from haplorec_spark.queries import register, table  # noqa: E402

_GATE_BITS = 63 * 1024
_GATE_K = 5
_GATE_SEED = "bloom-gate"

_GATE_KEYS_SQL = (
    "SELECT o_custkey::VARCHAR AS k FROM orders WHERE o_totalprice > 450000"
)


@register(
    "q_bloom_member",
    f"""
    WITH bits AS ({duck_bloom_bits_sql(
        _GATE_KEYS_SQL, "k",
        seed=_GATE_SEED, n_bits=_GATE_BITS, n_hashes=_GATE_K)})
    SELECT id AS c_custkey, maybe_member FROM ({duck_bloom_member_sql(
        "SELECT c_custkey FROM customer", "SELECT * FROM bits",
        "c_custkey::VARCHAR", "c_custkey",
        seed=_GATE_SEED, n_bits=_GATE_BITS, n_hashes=_GATE_K)})
    """,
    "distributed Bloom-filter membership: build = one chunk-keyed "
    "bit_or aggregate over the reference keys, probe = k broadcast "
    "joins, zero corpus shuffle, zero false negatives",
)
def q_bloom_member(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    keys = orders.filter(F.col("o_totalprice") > 450000).select(
        F.col("o_custkey").cast("string").alias("k")
    )
    bits = bloom_build(
        keys, ["k"], n_bits=_GATE_BITS, n_hashes=_GATE_K, seed=_GATE_SEED
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    return bloom_probe(
        cust.withColumn("_k", F.col("c_custkey").cast("string")),
        bits, ["_k"],
        n_bits=_GATE_BITS, n_hashes=_GATE_K, seed=_GATE_SEED,
    ).select("c_custkey", "maybe_member")


# ------------------------------------------------------------ store helpers

def write_bloom_params_marker(
    spark, path: str, *, n_bits: int, n_hashes: int, seed: str
) -> None:
    """Record the filter identity at ``<path>/_params`` (underscore-
    prefixed, the store-marker convention shared with the LSH store's
    ``_segmentation``). An existing marker is VALIDATED first — a job
    whose (n_bits, n_hashes, seed) drifted fails at write time instead
    of silently writing bits that probe wrong."""
    validate_bloom_params_marker(
        spark, path, n_bits=n_bits, n_hashes=n_hashes, seed=seed
    )
    spark.createDataFrame(
        [(n_bits, n_hashes, seed)],
        "n_bits bigint, n_hashes int, seed string",
    ).write.mode("overwrite").parquet(f"{path}/_params")


def read_bloom_params_marker(spark, path: str):
    """(n_bits, n_hashes, seed) from the store marker, or None when
    the store has none (not yet created)."""
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        r = spark.read.parquet(f"{path}/_params").first()
    except AnalysisException:
        return None
    return int(r["n_bits"]), int(r["n_hashes"]), r["seed"]


def validate_bloom_params_marker(
    spark, path: str, *, n_bits: int, n_hashes: int, seed: str
) -> None:
    stored = read_bloom_params_marker(spark, path)
    if stored is not None and stored != (n_bits, n_hashes, seed):
        raise ValueError(
            f"bloom store at {path} was written with (n_bits, n_hashes,"
            f" seed)={stored}; using {(n_bits, n_hashes, seed)} would"
            " probe wrong positions and silently mismatch — use the"
            " store's parameters or rebuild the store"
        )


def read_bloom_bits(spark, path: str) -> DataFrame:
    """The cumulative (chunk, bits) filter from a batch-partitioned
    store: one ``bit_or`` aggregate over all ``ingest_batch``
    partitions. bit_or is associative and idempotent, so replayed
    batch partitions (the exactly-once dynamic-overwrite scheme)
    merge into the same filter. After thousands of micro-batches this
    read-side merge grows linearly with batch count —
    :func:`compact_bloom_store` is the maintenance fix."""
    return (
        spark.read.parquet(f"{path}/bits")
        .groupBy("chunk")
        .agg(F.bit_or("bits").alias("bits"))
    )


def compact_bloom_store(spark, path: str) -> None:
    """Fold every ``ingest_batch`` partition of ``<path>/bits`` into
    ONE consolidated ``ingest_batch = -1`` partition (one file: the
    filter is n_bits/63 chunk rows — tiny by construction).

    :func:`read_bloom_bits` re-aggregates all batch partitions on
    every read, so an old store pays one ``bit_or`` row per chunk per
    batch forever; post-compaction the read scans a single partition.
    The partition level is KEPT so later stream batches append at the
    same depth and a replayed batch still overwrites its own
    partition; bit_or's idempotence makes folding committed batches
    into -1 safe even if a replay ever raced (the merge of -1 with a
    re-written batch is the same filter). Offline single-writer
    maintenance (the :mod:`~haplorec_spark.operators.stores`
    stage-and-rename contract); the ``_params`` marker lives under
    ``<path>/_params``, outside the rewritten ``bits`` directory, so
    it is untouched."""
    from haplorec_spark.operators.stores import replace_parquet_dir

    bits = spark.read.parquet(f"{path}/bits")
    merged = (
        bits.groupBy("chunk")
        .agg(F.bit_or("bits").alias("bits"))
        .coalesce(1)
    )
    if "ingest_batch" in bits.columns:
        merged = merged.withColumn(
            "ingest_batch",
            F.lit(-1).cast(bits.schema["ingest_batch"].dataType),
        )
        replace_parquet_dir(
            merged, f"{path}/bits", partition_by=("ingest_batch",)
        )
    else:
        replace_parquet_dir(merged, f"{path}/bits")

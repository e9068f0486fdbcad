"""Mode-neutrality: the engine must produce identical results under
spark.sql.ansi.enabled=true (the Spark 4 / driver default, which the
test session runs with) AND under ansi=false (legacy permissive mode).

Round 1 shipped an ANSI-only crash (getItem on a short array) masked by
a session-level ANSI override; this test pins the other direction so a
future change can't silently depend on either mode.
"""

from __future__ import annotations

import pytest

from haplorec_spark.queries import registry
from tests.conftest import rows

SF = "/root/testdata/sf0.001"

#: The queries that exercise positional indexing, casts, and arithmetic
#: where ANSI semantics differ (pivot cluster + division + LSH folds).
MODE_SENSITIVE = [
    "q_pivot_order_lines",
    "q_pair_normalize",
    "q_theta_or_join",
    "q_division_subset",
    "q_ann_lsh_bucketed",
    # round-5 gates: sequence()/slice() under the CASE guard (spans)
    # and conv() hex parsing (weighted sampling) must behave
    # identically under both ANSI modes
    "q_dedup_spans",
    "q_sample_weighted",
    # round-11: element_at-heavy folds (the windowFunnel DP and the
    # step-timings witness arithmetic), the repair fold's split()
    # indexing, and the bounded-verification bucket lambdas
    "q_funnel_events_retry",
    "q_funnel_step_timings",
    "q_fix_encoding",
    "q_dedup_verified_pairs",
    # round-12: the histogram-percentile floor/ceil/cast arithmetic
    # and the profile's pow/log2 bucket banding must agree across
    # ANSI modes
    "q_price_percentiles",
    "q_verification_profile",
]


@pytest.fixture()
def ansi_off(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.mark.parametrize("name", MODE_SENSITIVE)
def test_results_identical_across_ansi_modes(spark, ansi_off, name):
    import haplorec_spark.queries as qmod

    reg = registry()
    fn = reg[name].fn if name in reg else getattr(qmod, name)
    with_ansi_off = rows(fn(spark, SF))
    spark.conf.set("spark.sql.ansi.enabled", "true")
    with_ansi_on = rows(fn(spark, SF))
    assert with_ansi_on == with_ansi_off

"""Physical-plan regression guards: the scale-critical properties of the
headline operators, asserted from the formatted plan so a refactor cannot
silently reintroduce a shuffle/broadcast regression. These are the claims
PLANS.md makes — here they are executable."""

import pytest

from ccdb_data_pipeline_spark.benchqueries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _n_exchanges(plan):
    # count physical Exchange operators (broadcast exchanges counted apart)
    return sum(
        1
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and ") Exchange" in ln
    )


def test_ngram_repetition_is_shuffle_free_but_for_presentation_sort(spark):
    """All repetition stats are array-side: the ONLY exchange is the final
    orderBy's range partitioning."""
    plan = _plan(spark, "ngram_repetition")
    assert _n_exchanges(plan) == 1, plan


def test_gopher_quality_is_shuffle_free_but_for_presentation_sort(spark):
    plan = _plan(spark, "gopher_quality")
    assert _n_exchanges(plan) == 1, plan


def test_decontaminate_broadcasts_the_benchmark_side(spark):
    """Training side must meet the benchmark via a broadcast hash probe —
    never a sort-merge join (which would shuffle the full training corpus)."""
    plan = _plan(spark, "decontaminate")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_dim_join_share_broadcasts_dimensions(spark):
    plan = _plan(spark, "dim_join_share")
    assert "BroadcastHashJoin" in plan, plan


def test_point_lookup_pushes_key_predicate_to_scan(spark):
    plan = _plan(spark, "point_lookup")
    assert "PushedFilters" in plan and "In(" in plan, plan


def test_cdc_lww_latest_uses_hash_aggregate_not_window(spark):
    """LWW dedup must be the map-side-combining max_by aggregate, not a
    window sort (window = full sort per key partition, skew-fragile)."""
    plan = _plan(spark, "cdc_lww_latest")
    assert "Window" not in plan, plan


def test_chunk_windows_is_shuffle_free_but_for_presentation_sort(spark):
    """Chunking is a narrow explode — the only exchange is the final
    orderBy; no Python operator appears in the plan."""
    plan = _plan(spark, "chunk_windows")
    assert _n_exchanges(plan) == 1, plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_pack_sequences_has_one_data_shuffle(spark):
    """Packing shuffles once (groupBy shard for the Arrow fold); the only
    other exchange is the presentation orderBy."""
    plan = _plan(spark, "pack_sequences")
    assert _n_exchanges(plan) <= 2, plan


def test_gap_islands_audit_partitions_the_row_window(spark):
    """The row-level islands window must be partitioned (block-local), not
    a total order over the data: at least one hashpartitioning exchange
    carries the block key."""
    plan = _plan(spark, "lsn_gap_islands")
    assert "hashpartitioning(_block" in plan, plan

"""Physical-plan auditing: the 100 TB design rules as checkable
predicates over ``explain`` output.

Rules (SURVEY.md §4.2 + the scale brief):
* filters and column selection must reach the parquet scan
  (``PushedFilters`` / pruned ``ReadSchema``);
* small dimensions must join as ``BroadcastHashJoin``;
* expressions should run inside whole-stage codegen;
* no ``CartesianProduct`` unless explicitly intended.

Used by tests (tests/test_plans.py) so a regression that silently
de-optimizes a plan fails CI, not a production run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, final: bool = False) -> str:
    """Formatted physical plan; ``final=True`` executes the query (noop
    sink) first so AQE's *final* plan — with codegen spans and runtime
    join selections — is what gets audited."""
    if final:
        # must be an action on THIS Dataset's QueryExecution (a write
        # command would plan a fresh one and leave ours non-final)
        df.collect()
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def scan_read_schemas(plan: str) -> list[str]:
    """ReadSchema clauses of every parquet scan in the plan."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def asserts_column_pruned(df: DataFrame, table_hint: str, max_cols: int) -> None:
    """Assert at least one scan (matching ``table_hint`` in its schema)
    reads no more than ``max_cols`` columns."""
    plan = formatted_plan(df)
    schemas = scan_read_schemas(plan)
    matching = [s for s in schemas if table_hint in s]
    assert matching, f"no scan with column '{table_hint}' found:\n{plan}"
    widths = [s.count(":") for s in matching]
    assert min(widths) <= max_cols, (
        f"scan not pruned: narrowest ReadSchema has {min(widths)} cols "
        f"(wanted <= {max_cols}): {matching}"
    )


def asserts_filter_pushed(df: DataFrame, fragment: str) -> None:
    plan = formatted_plan(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any(fragment in p for p in pushed), (
        f"filter '{fragment}' not pushed to any scan; PushedFilters={pushed}"
    )


def asserts_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= min_count, f"expected >= {min_count} BroadcastHashJoin, got {n}\n{plan}"


def asserts_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"unexpected CartesianProduct:\n{plan}"


def asserts_whole_stage_codegen(df: DataFrame) -> None:
    plan = formatted_plan(df, final=True)
    # formatted explain marks codegen stages as "[codegen id : N]"
    assert "codegen id" in plan, f"no WholeStageCodegen span:\n{plan}"


def plan_fingerprint(df: DataFrame) -> dict:
    """Structural fingerprint of the STATIC physical plan — the
    plan-shape regression signal the DuckDB value oracle is blind to
    (r10 verdict ask #6): a lost broadcast, an extra shuffle, or a
    de-pruned scan is still value-correct but a 100 TB regression.
    Static (pre-AQE) on purpose: deterministic for fixed code + test
    data, no execution needed; AQE can only improve on it at runtime.

    Directional reading (enforced by tests/test_plan_shapes.py):
    ``shuffles``/``cartesian``/``bnlj``/``max_scan_cols`` must not
    rise, ``broadcast_joins`` must not fall, vs the committed
    ``tests/plan_fingerprints.json`` baseline."""
    plan = formatted_plan(df)
    schemas = scan_read_schemas(plan)
    return {
        "shuffles": len(re.findall(r"Arguments: (?:hash|range)partitioning", plan)),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "scans": len(schemas),
        "max_scan_cols": max((s.count(":") for s in schemas), default=0),
    }


def stream_plan_fingerprint(query) -> dict:
    """Structural fingerprint of a streaming query's LAST EXECUTED
    micro-batch physical plan (r11 verdict ask #2: extend the
    plan-shape gate to the stream families, whose plan only exists at
    runtime). Takes a started/finished ``StreamingQuery``; reads the
    same explain string ``query.explain()`` prints (simple mode — the
    micro-batch plan is post-AQE-free and single-line node labels, so
    ``Exchange hashpartitioning`` IS the tree label here, unlike the
    formatted batch explain).

    Counters and their directional reading (tests/test_plan_shapes.py):

    * ``shuffles`` / ``cartesian`` must not rise, ``broadcast_joins``
      must not fall — same economics as the batch gate;
    * the STATEFUL operator counts (``state_store_saves``,
      ``streaming_dedups``, ``symmetric_join``, ``pandas_with_state``,
      ``watermarks``) must match EXACTLY — a changed count is changed
      streaming semantics, not an optimization;
    * ``state_partitions`` (the stateful shuffle width, sized to state
      volume per SCALE.md) must not rise.
    """
    plan = query._jsq.explainInternal(False)  # noqa: SLF001 — py4j handle
    return {
        "shuffles": len(re.findall(r"Exchange (?:hash|range)partitioning", plan)),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "state_store_saves": plan.count("StateStoreSave"),
        "streaming_dedups": len(re.findall(r"StreamingDeduplicate", plan)),
        "symmetric_join": plan.count("StreamingSymmetricHashJoin"),
        "pandas_with_state": plan.count("FlatMapGroupsInPandasWithState"),
        "watermarks": plan.count("EventTimeWatermark"),
        "state_partitions": max(
            (int(m) for m in re.findall(r"numPartitions = (\d+)", plan)),
            default=0,
        ),
    }


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (broadcast exchanges are
    deliberately NOT counted — they're the cheap alternative we audit
    FOR). Formatted explain puts the partitioning on a detail line
    (``Arguments: hashpartitioning/rangepartitioning(...)``), so count
    those, not the tree label."""
    plan = formatted_plan(df)
    return len(re.findall(r"Arguments: (?:hash|range)partitioning", plan))

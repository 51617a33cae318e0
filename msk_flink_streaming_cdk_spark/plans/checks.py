"""Physical-plan inspection utilities.

The 100 TB posture is enforced here: tests assert that filters reach
the parquet scan (PushedFilters), scans prune columns (ReadSchema),
small dims broadcast (BroadcastHashJoin), nothing degrades to a
nested-loop join, and shuffle counts stay at the plan's minimum.
`.explain("formatted")` is the source of truth — iterate the operator
until the plan is the one you'd want on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a predicate fragment appears in the scan's
    PushedFilters (predicate pushdown reached the data source)."""
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, f"no PushedFilters in plan:\n{plan}"
    assert any(fragment in ln for ln in pushed), (
        f"filter {fragment!r} not pushed; PushedFilters lines: {pushed}"
    )


def assert_read_schema_pruned(
    df: DataFrame, must_read: list[str], must_not_read: list[str]
) -> None:
    """Assert column pruning: the parquet ReadSchema contains exactly
    the needed columns."""
    plan = formatted_plan(df)
    schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schemas, f"no ReadSchema in plan:\n{plan}"
    joined = " ".join(schemas)
    for col in must_read:
        assert col in joined, f"{col} missing from ReadSchema: {schemas}"
    for col in must_not_read:
        assert col not in joined, f"{col} not pruned: {schemas}"


def assert_broadcast_hash_join(df: DataFrame, at_least: int = 1) -> None:
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, f"expected >={at_least} BroadcastHashJoin:\n{plan}"


def assert_no_nested_loop_join(df: DataFrame) -> None:
    """O(n^2) guard: range/non-equi predicates silently degrade to
    BroadcastNestedLoopJoin / CartesianProduct (observed: the dedup
    length-band join, >9 min at sf0.1 until made an equi-join)."""
    plan = formatted_plan(df)
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan, f"{bad} in plan:\n{plan}"


def count_nodes(df: DataFrame, node: str) -> int:
    """Number of DISTINCT physical-plan nodes named ``node`` in the
    query's own plan tree, EXCLUDING subtrees under InMemoryRelation:
    a persisted frame's build plan executes once at cache fill (and
    its printed form even changes once AQE has finalized it), so its
    exchanges are not part of this query's per-run shuffle budget.
    Node ids are deduplicated, so a subtree printed once per consumer
    still counts once."""
    import re

    tree = formatted_plan(df).split("\n\n", 1)[0]
    ids: set[str] = set()
    skip_deeper_than: int | None = None
    for ln in tree.splitlines():
        indent = len(ln) - len(ln.lstrip(" :+-"))
        if skip_deeper_than is not None:
            if indent > skip_deeper_than:
                continue
            skip_deeper_than = None
        if "InMemoryRelation (" in ln:
            skip_deeper_than = indent
            continue
        hit = re.search(rf"(?:^|[+\-:]\s|\s){node} \((\d+)\)", ln)
        if hit:
            ids.add(hit.group(1))
    return len(ids)


def count_exchanges(df: DataFrame) -> int:
    """Number of distinct shuffle exchanges in the physical plan
    (before AQE runtime coalescing; BroadcastExchange excluded)."""
    return count_nodes(df, "Exchange")


def _toplevel_bracket_groups(s: str) -> list[str]:
    """Split ``[a], [b, [c]], [d]`` into its top-level ``[...]``
    groups (bracket-depth parser — expression text may nest)."""
    groups: list[str] = []
    depth = 0
    start = -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start >= 0:
                groups.append(s[start : i + 1])
                start = -1
    return groups


def unpartitioned_window_nodes(df: DataFrame) -> list[str]:
    """Arguments lines of physical ``Window`` nodes with an EMPTY
    partition spec — a SinglePartition exchange + one-reducer sort of
    the whole input at scale (the round-7 verdict's global-window
    class). Formatted-explain detail blocks print Window arguments as
    ``[exprs], [partitionSpec], [orderSpec]`` with EMPTY specs
    omitted: 3 groups = partitioned; 2 groups is partitioned-no-order
    (second group is bare expressions) or unpartitioned-with-order
    (second group carries ASC/DESC sort directions); 1 group = fully
    global. Only the unpartitioned shapes are returned."""
    plan = formatted_plan(df)
    import re

    out: list[str] = []
    for block in plan.split("\n\n"):
        lines = block.splitlines()
        if not lines or not re.match(r"\(\d+\) Window$", lines[0].strip()):
            continue
        arg = next(
            (ln for ln in lines if ln.startswith("Arguments: ")), ""
        )
        groups = _toplevel_bracket_groups(arg)
        if len(groups) >= 3:
            continue
        if len(groups) == 2 and not re.search(
            r"\b(ASC|DESC)\b", groups[1]
        ):
            continue  # partitioned window with no order spec
        out.append(f"{lines[0].strip()} {arg}")
    return out

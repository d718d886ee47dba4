"""Physical-plan lint: the "would this survive 100x?" review as a tool.

For every registered query (or a named subset), compiles the plan at a
small SF and reports the scale-relevant facts a reviewer greps an
.explain() for by hand:

- shuffle exchanges (each one moves data cluster-wide)
- single-partition exchanges (a global sort/limit funnel — fine for
  bounded finishers, a red flag on row-cardinality data)
- broadcast exchanges (dimension joins staying off the shuffle path)
- cartesian products (almost always a bug unless one side is 1 row)
- Python evaluation nodes (Arrow-batched pandas is acceptable where
  declared; row-at-a-time BatchEvalPython is never)
- pushed filters / partition filters reaching the scans

Usage::

    python -m chai_data_pipeline_spark.tools.plan_lint [name ...]

Exit code is 0 always — this is a report, not a gate; the plan-shape
TESTS pin the specific properties that must never regress.
"""

from __future__ import annotations

import re
import sys
from dataclasses import dataclass

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


@dataclass
class PlanFacts:
    name: str
    shuffles: int
    single_partition: int
    broadcasts: int
    cartesian: int
    python_row: int
    python_arrow: int
    pushed_filters: bool
    partition_filters: bool
    raw_single_partition: int = 0
    error: str | None = None


def _raw_single_partition(plan: str) -> int:
    """SinglePartition exchanges whose SUBTREE holds no Aggregate or
    TakeOrdered — i.e., a global funnel over row-cardinality data (the
    sorted-neighborhood class of scale trap), as opposed to the benign
    pattern of globally ordering an already-reduced frame (weeks,
    nations, quantile targets)."""
    sections = plan.split("\n\n")
    tree = sections[0]
    nodes = []  # (depth, node_name, id)
    for ln in tree.split("\n")[1:]:
        m = re.search(r"([:+\-\s]*)[+*]- (\S+).*\((\d+)\)", ln)
        if m:
            nodes.append((len(m.group(1)), m.group(2), int(m.group(3))))
    details = {
        int(re.match(r"\((\d+)\)", s).group(1)): s
        for s in sections
        if re.match(r"\(\d+\)", s)
    }
    flagged = 0
    for i, (depth, node, nid) in enumerate(nodes):
        if node != "Exchange":
            continue
        if "SinglePartition" not in details.get(nid, ""):
            continue
        subtree = []
        for d2, n2, _ in nodes[i + 1 :]:
            if d2 <= depth:
                break
            subtree.append(n2)
        reduced = any(
            "Aggregate" in n
            or "TakeOrdered" in n
            # cached/reused subtrees are opaque here: an
            # InMemoryTableScan of an already-aggregated frame or a
            # ReusedExchange pointing at one elsewhere in the plan
            # must not read as "raw" (test suites cache small frames)
            or "InMemory" in n
            or "ReusedExchange" in n
            for n in subtree
        )
        if not reduced and any(n.startswith("Scan") for n in subtree):
            flagged += 1
    return flagged


def lint_plan(name: str, plan: str) -> PlanFacts:
    return PlanFacts(
        name=name,
        # formatted/AQE plans print the distribution on the Arguments
        # line of the Exchange node, not beside the node name
        shuffles=plan.count("hashpartitioning(")
        + plan.count("rangepartitioning("),
        single_partition=plan.count("SinglePartition"),
        broadcasts=plan.count("BroadcastExchange"),
        cartesian=plan.count("CartesianProduct"),
        python_row=plan.count("BatchEvalPython"),
        python_arrow=plan.count("ArrowEvalPython")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("MapInPandas"),
        pushed_filters="PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        partition_filters="PartitionFilters: [" in plan
        and "PartitionFilters: []" not in plan,
        raw_single_partition=_raw_single_partition(plan),
    )


def lint_query(spark: SparkSession, name: str, sf_dir: str) -> PlanFacts:
    from .. import plans

    try:
        df = plans.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        return lint_plan(name, plan)
    except Exception as exc:  # noqa: BLE001 — report, don't gate
        return PlanFacts(
            name, 0, 0, 0, 0, 0, 0, False, False, error=str(exc)[:120]
        )


def main(argv: list[str]) -> int:
    from .. import plans
    from ..session import get_spark

    spark = get_spark("plan-lint")
    names = argv or sorted(plans.QUERIES)
    header = (
        "query\tshuffles\tsingle_part\traw_single_part\tbroadcasts\t"
        "cartesian\tpy_row\tpy_arrow\tpushed\tpart_pruned"
    )
    print(header)
    worst: list[PlanFacts] = []
    for name in names:
        f = lint_query(spark, name, DEFAULT_SF_DIR)
        if f.error:
            print(f"{f.name}\tERROR: {f.error}")
            continue
        print(
            f"{f.name}\t{f.shuffles}\t{f.single_partition}"
            f"\t{f.raw_single_partition}\t{f.broadcasts}"
            f"\t{f.cartesian}\t{f.python_row}\t{f.python_arrow}"
            f"\t{int(f.pushed_filters)}\t{int(f.partition_filters)}"
        )
        if f.cartesian or f.python_row or f.raw_single_partition:
            worst.append(f)
    if worst:
        print(
            f"\nFLAGGED ({len(worst)}): "
            + ", ".join(f.name for f in worst),
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

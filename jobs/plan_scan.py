"""Red-flag scan over every declared contract query's physical plan.

For each `__spark_entry__.queries()` row (sf0.001), captures
`explain("formatted")` to plans/<tag>/<name>.txt and greps the plan for
the guide's red flags: row-at-a-time Python (BatchEvalPython),
cartesian products, sort-merge joins, and counts Exchanges /
Arrow-boundary nodes. One JSON summary line per query on stdout.

Usage: python jobs/plan_scan.py [out_dir_tag]   (default plans/r07/scan)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGS = {
    "BatchEvalPython": "row-at-a-time Python UDF",
    "CartesianProduct": "cartesian product",
    "BroadcastNestedLoopJoin": "nested-loop join",
}
COUNTED = ["Exchange", "SortMergeJoin", "BroadcastHashJoin",
           "ShuffledHashJoin", "ArrowEvalPython", "MapInArrow",
           "FlatMapGroupsInPandas", "WholeStageCodegen"]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "plans/r07/scan"
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), tag)
    os.makedirs(out_dir, exist_ok=True)
    import __spark_entry__ as e
    from visionsearch_spark import get_spark

    spark = get_spark("plan_scan", cores=8, shuffle_partitions=8)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    sf = "/root/testdata/sf0.001"
    for name, fn in e.queries().items():
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as ex:  # noqa: BLE001 — record and continue
            print(json.dumps({"query": name, "error": str(ex)[:200]}))
            continue
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        row = {"query": name}
        for flag in FLAGS:
            row[flag] = len(re.findall(rf"\b{flag}\b", plan))
        for op in COUNTED:
            c = len(re.findall(rf"\b{op}\b", plan))
            if c:
                row[op] = c
        print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()

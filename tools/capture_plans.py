"""Capture ``explain("formatted")`` for headline queries into
``plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt`` (default r20) (the optimization round's evidence
files). Usage:

    python tools/capture_plans.py <tag> [query ...]

``tag`` is e.g. ``before`` / ``after``. With no query list, captures
every bench headline query. Queries that run side-effectful pipelines
(streaming replays, materializer cycles) execute as part of building
their result frame; the captured plan is the plan of the returned
DataFrame — the same frame the bench times with ``.count()``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from bench import HEADLINE
    from streaming_data_lake_spark.queries import all_queries
    from streaming_data_lake_spark.session import get_spark

    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r20"))
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture_plans")
    queries = all_queries()
    for name in names:
        q = queries[name]
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        df = q.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

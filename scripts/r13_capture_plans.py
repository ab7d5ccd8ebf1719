"""Capture .explain('formatted') for named registry queries into
plans/r13/<query>_<tag>.txt. Usage:
  python scripts/r13_capture_plans.py <tag> [--aqe-off] [--out DIR] q1 q2 ...
      tag = before|after|after_aqe_off|...
Plans are built at sf0.001 (plan shape is sf-independent). --aqe-off
disables adaptive execution for the capture so static-plan features that
AQE hides in the initial plan — ReusedExchange cross-references above all —
are visible in the committed text (VERDICT r12 task 4: the r12
cooccurrence evidence showed only the AQE initial plan).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def main() -> None:
    args = sys.argv[1:]
    aqe_off = "--aqe-off" in args
    if aqe_off:
        args.remove("--aqe-off")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        del args[i : i + 2]
    tag = args[0]
    names = args[1:]
    from translator_tm_provider_pipelines_spark.plans import testdata_queries as tq
    from translator_tm_provider_pipelines_spark.session import get_spark

    spark = get_spark(app_name=f"r13_plans_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    if aqe_off:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    os.makedirs(out, exist_ok=True)
    for name in names:
        df = tq.QUERIES[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(
            f"wrote {path} ({plan.count('Exchange')} Exchange refs, "
            f"{plan.count('ReusedExchange')} reused)"
        )
    spark.stop()


if __name__ == "__main__":
    main()

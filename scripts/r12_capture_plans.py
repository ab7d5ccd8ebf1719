"""Capture .explain('formatted') for named registry queries into
plans/r12/<query>_<tag>.txt. Usage:
  python scripts/r12_capture_plans.py <tag> q1 q2 ...   (tag = before|after)
Plans are built at sf0.001 (plan shape is sf-independent; AQE initial plan).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from translator_tm_provider_pipelines_spark.plans import testdata_queries as tq
    from translator_tm_provider_pipelines_spark.session import get_spark

    spark = get_spark(app_name=f"r12_plans_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        df = tq.QUERIES[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()

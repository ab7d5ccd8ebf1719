"""Targeted A/B timing: run named registry queries N times each with the
bench methodology (noop sink, codegen warmup at sf0.001, per-pass
calibration) and print per-query medians + spreads. Usage:
  python scripts/r12_time_queries.py q1,q2,... [passes] [sf_dir]
Run from the code tree you want to measure.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    from translator_tm_provider_pipelines_spark.plans import testdata_queries as tq
    from translator_tm_provider_pipelines_spark.session import get_spark

    spark = get_spark(app_name="r12_time")
    spark.sparkContext.setLogLevel("ERROR")
    warm = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for n in names:
        tq.QUERIES[n](spark, warm).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    import gc
    samples: dict[str, list[float]] = {n: [] for n in names}
    calibs = []
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    for _ in range(passes):
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.java.lang.System.gc()
        calibs.append(bench._calibration(spark, reps=1))
        for n in names:
            spark.sparkContext.setJobDescription(f"r12_time:{n}")
            t0 = time.perf_counter()
            tq.QUERIES[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[n].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    print("calib:", round(statistics.median(calibs), 3), [round(c, 2) for c in calibs])
    for n in names:
        s = samples[n]
        print(f"{n}: median={statistics.median(s):.3f} spread=[{min(s):.3f},{max(s):.3f}] all={s}")
    spark.stop()


if __name__ == "__main__":
    main()

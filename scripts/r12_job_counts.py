"""Count Spark jobs/stages/tasks per registry query (guide §1 empirical):
run each named query once warmed, then report how many jobs and stages the
timed noop action(s) produced — on sf0.1's small inputs, wall time tracks
scheduling overhead (jobs × stage rounds), so high counts mark queries
whose structure (checkpoint rounds, loop probes, extra exchanges) is the
cost. Usage: python scripts/r12_job_counts.py q1,q2,... [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from translator_tm_provider_pipelines_spark.plans import testdata_queries as tq
    from translator_tm_provider_pipelines_spark.session import get_spark

    spark = get_spark(app_name="r12_jobs")
    spark.sparkContext.setLogLevel("ERROR")
    warm = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    tracker = spark.sparkContext.statusTracker()

    for n in names:
        tq.QUERIES[n](spark, warm).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        ids0 = tracker.getJobIdsForGroup(None) or []
        j0 = max(ids0) if ids0 else -1
        t0 = time.perf_counter()
        tq.QUERIES[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        ids = [j for j in (tracker.getJobIdsForGroup(None) or []) if j > j0]
        n_stages = 0
        n_tasks = 0
        for j in ids:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numCompletedTasks
        print(
            f"{n}: wall={wall:.2f}s jobs={len(ids)} stages={n_stages} tasks={n_tasks}",
            flush=True,
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()

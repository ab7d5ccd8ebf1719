"""Cluster-shaped smoke (VERDICT r7 task 8): the headline operator
families run end-to-end on ``local-cluster[2,4,4096]`` — two separate
executor JVMs, real task serialization and remote shuffle fetches — so
local-mode-only assumptions (driver-side object sharing, localCheckpoint
block lifetimes, closure pickling shortcuts) fail HERE instead of on a
real cluster. Everything else in the suite runs local[N] inside one JVM,
which can never exercise those seams.

Runs in a subprocess: a Python process hosts exactly one SparkContext and
the suite's session fixture owns this one.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# universal_input_join: partition-pruned join path; near_dup_star_repaired:
# LSH + iterative repair with localCheckpoint between hops (the most
# cluster-sensitive lifetime assumption); cooccurrence_metrics: the
# broadcast-totals + pair-agg analytics path. r9 additions (VERDICT r8
# task 5): the round-8 sampler redesign — temperature/token-budget mixture
# samplers ride a broadcast literal plan table (createDataFrame rows must
# cross executor serialization) and dsir_top_selection's boundary_top_n
# brackets a quantile with multi-JVM partial aggregates.
SMOKE_QUERIES = (
    "universal_input_join",
    "near_dup_star_repaired",
    "near_dup_star_rescued",  # r11: one-round rescue + checkpointed bands
    "cooccurrence_metrics",
    "temperature_mixture_sample",
    "token_budget_mixture_sample",
    "dsir_top_selection",
)

SCRIPT = f"""
import sys
from translator_tm_provider_pipelines_spark.session import get_spark
from translator_tm_provider_pipelines_spark.plans import testdata_queries as tq

sf_dir = sys.argv[1]
spark = get_spark(
    app_name="local-cluster-smoke",
    master="local-cluster[2,4,4096]",
    shuffle_partitions=8,
    extra_conf={{"spark.driver.memory": "4g"}},
)
for name in {SMOKE_QUERIES!r}:
    n = tq.QUERIES[name](spark, sf_dir).count()
    print(name, n, flush=True)
    assert n >= 0
print("LC_SMOKE_OK", flush=True)
spark.stop()
"""


INDEX_SCRIPT = """
import sys
from translator_tm_provider_pipelines_spark.session import get_spark
from translator_tm_provider_pipelines_spark.streaming import dedup_index as di

idx = sys.argv[1]
spark = get_spark(
    app_name="local-cluster-index-smoke",
    master="local-cluster[2,4,4096]",
    shuffle_partitions=8,
    extra_conf={"spark.driver.memory": "4g"},
)
base = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest where nobody ever goes at night")
rows = [(i, base) for i in range(1, 7)]
mk = lambda rs: spark.createDataFrame(rs, "doc_id int, text string")
for bi, lo in enumerate(range(0, 6, 2)):
    di.update_near_dup_index(spark, mk(rows[lo:lo + 2]), idx, batch_id=bi,
                             max_bucket_size=3)
# reconcile runs repair hops with localCheckpoint between hops — the
# block-lifetime assumption a multi-JVM cluster actually stresses
di.reconcile_capped_buckets(spark, idx, max_bucket_size=3, repair_hops=-1)
keep = {r.doc_id: r.canonical_id
        for r in di.keep_list_from_index(spark, idx).collect()}
assert all(keep[d] == 1 for d in range(2, 7)), keep

# r11: the rescue fixpoint off local[*] — a starved late arrival whose
# genuine neighbors are ATTACHED (never promoted by the hop loop) must
# be rescued through the round loop's lazily checkpointed inputs
idx2 = idx + "-rescue"
T = ("the shared boilerplate block about spark shuffles parquet files "
     "broadcast joins and adaptive execution repeated verbatim across "
     "this synthetic near duplicate cluster fixture corpus")
di._write_batch(mk([
    (1, "ancient lexicon of untranslatable riddles carved into basalt "
        "cliffs by forgotten cartographers at midnight"),
    (3, T + " member one"), (4, T + " member two"),
]), idx2, "docs", 0)
di._write_batch(
    spark.createDataFrame([(1, 0, "B"), (3, 0, "B"), (4, 0, "B")],
                          "doc_id int, band int, band_sig string"),
    idx2, "bands", 0,
)
di._write_batch(
    spark.createDataFrame([(3, 4, 1.0)],
                          "doc_a int, doc_b int, jaccard double"),
    idx2, "pairs", 0,
)
di._write_batch(mk([(9, T + " member three")]), idx2, "docs", 1)
di._write_batch(
    spark.createDataFrame([(9, 0, "B")],
                          "doc_id int, band int, band_sig string"),
    idx2, "bands", 1,
)
di.reconcile_capped_buckets(spark, idx2, max_bucket_size=2,
                            repair_hops=-1, reps_per_hop=1)
keep = {r.doc_id: r.canonical_id
        for r in di.keep_list_from_index(spark, idx2).collect()}
assert keep[9] == 3 and keep[4] == 3 and keep[1] == 1, keep
print("LC_INDEX_OK", flush=True)
spark.stop()
"""


COMPACT_RACE_SCRIPT = """
import sys
from translator_tm_provider_pipelines_spark.session import get_spark
from translator_tm_provider_pipelines_spark.streaming import dedup_index as di

idx = sys.argv[1]
spark = get_spark(
    app_name="local-cluster-compact-race-smoke",
    master="local-cluster[2,4,4096]",
    shuffle_partitions=8,
    extra_conf={"spark.driver.memory": "4g"},
)
base = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest where nobody ever goes at night")
rows = [(i, base) for i in range(1, 7)]
mk = lambda rs: spark.createDataFrame(rs, "doc_id int, text string")
for bi, lo in enumerate(range(0, 6, 2)):
    di.update_near_dup_index(spark, mk(rows[lo:lo + 2]), idx, batch_id=bi,
                             max_bucket_size=3)
# compaction lands between the reconcile's derivation and its first
# negative-partition write (the _write_batch seam, same injection as the
# local[*] race test) — but HERE the merge's file moves and old-batch
# deletes race executor-side parquet reads across real JVM boundaries,
# the file-listing path where FAILED_READ_FILE actually differs from
# single-process local mode (r12, VERDICT r11 task 6)
real_write = di._write_batch
state = {"injected": False}
def inject(df, index_dir, sub, batch_id):
    if not state["injected"] and batch_id < 0:
        state["injected"] = True
        di.compact_index(spark, idx, upto_batch=2, target_partitions=1)
    return real_write(df, index_dir, sub, batch_id)
di._write_batch = inject
try:
    di.reconcile_capped_buckets(spark, idx, max_bucket_size=3,
                                repair_hops=-1, reconcile_id=5)
finally:
    di._write_batch = real_write
assert state["injected"]
keep = {r.doc_id: r.canonical_id
        for r in di.keep_list_from_index(spark, idx).collect()}
assert keep == {i: 1 for i in range(1, 7)}, keep
# the raced run's watermark covers the merged bands: follow-up is a no-op
assert di.reconcile_capped_buckets(spark, idx, max_bucket_size=3,
                                   repair_hops=-1, reconcile_id=6).count() == 0
print("LC_COMPACT_RACE_OK", flush=True)
spark.stop()
"""


@pytest.mark.localcluster
def test_local_cluster_compact_during_reconcile(tmp_path):
    """r12 (VERDICT r11 task 6): the compaction-racing-a-reconcile
    scenario on separate executor JVMs — the local[*] race test pins the
    semantics, this one exercises the multi-JVM file listing (executors
    read parquet the driver's compaction is concurrently moving and
    deleting) where read-failure behavior genuinely differs. Same
    timeout bound as the other smokes."""
    script = tmp_path / "lc_compact_race.py"
    script.write_text(COMPACT_RACE_SCRIPT)
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "8"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script), str(tmp_path / "idx")],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
        env=env,
    )
    assert proc.returncode == 0 and "LC_COMPACT_RACE_OK" in proc.stdout, (
        f"local-cluster compact-race smoke failed\n"
        f"stdout: {proc.stdout[-3000:]}\nstderr: {proc.stderr[-3000:]}"
    )


@pytest.mark.localcluster
def test_local_cluster_index_reconcile(tmp_path):
    """The incremental index's update → reconcile(repair_hops) → keep-list
    flow on separate executor JVMs: localCheckpoint blocks live on
    executors here (not in the driver's process), parquet round-trips
    cross real process boundaries."""
    script = tmp_path / "lc_index.py"
    script.write_text(INDEX_SCRIPT)
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "8"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script), str(tmp_path / "idx")],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
        env=env,
    )
    assert proc.returncode == 0 and "LC_INDEX_OK" in proc.stdout, (
        f"local-cluster index smoke failed\nstdout: {proc.stdout[-3000:]}\n"
        f"stderr: {proc.stderr[-3000:]}"
    )


@pytest.mark.localcluster
def test_local_cluster_smoke(tmp_path):
    sf_dir = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"no testdata at {sf_dir}")
    script = tmp_path / "lc_smoke.py"
    script.write_text(SCRIPT)
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "8"  # match the 2x4 executor cores
    # running a script FILE puts its own dir (tmp) on sys.path, not cwd
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script), sf_dir],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
        env=env,
    )
    assert proc.returncode == 0 and "LC_SMOKE_OK" in proc.stdout, (
        f"local-cluster smoke failed\nstdout: {proc.stdout[-3000:]}\n"
        f"stderr: {proc.stderr[-3000:]}"
    )

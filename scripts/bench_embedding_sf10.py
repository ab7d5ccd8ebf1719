"""sf10 scaling artifact for the embedding/ANN dedup family (VERDICT r11
task 3) — the one LLM-data family without an sf10 datapoint.

Two questions, answered separately:

1. **Registry shape** — the committed queries (`embedding_near_duplicates`,
   `semantic_near_duplicates`, `embedding_keep_list`) pin their semantics
   to a FIXED working set (`vec_id < 500`, required for an all-pairs
   DuckDB oracle). Scaling the corpus 10x/100x underneath them measures
   scan growth + pushdown: walls should stay near-flat because the
   vec_id filter reaches the parquet scan. This also settles their
   1.45x BASELINE_BENCH_v2 ratios with a larger-N datapoint (r11
   verdict: spread-dominated, not code).

2. **Scale path** — the OPERATORS over the FULL scaled corpus with the
   documented scale knobs (`banded_lsh_candidate_pairs` docstring: grow
   band_planes ~log n; `semantic_cluster_candidates`: grow n_lists to
   keep clusters bounded):
   - banded-LSH near-dup at threshold 0.9, band_planes=16 (random-pair
     collision 0.5^16 per band — selective at 200k vectors where the
     registry's 2-plane bands are ~all-pairs), candidates materialized
     once (localCheckpoint) and counted, then exact-cosine verified;
   - SemDeDup at n_lists = N/100 (clusters ~100 members — the replica
     corpus's true group size) + the keep list via connected components.
   Walls, per-decade exponents, candidate/verified counts, and executed-
   plan markers (no CartesianProduct / BroadcastNestedLoop) are recorded.

Corpus note (same by-design caveat as the text-dedup sf10 runs): the
scaled slices replicate the 2000 base vectors verbatim with offset ids
(make_scaled_data), so every vector has copies-1 identical twins and the
TRUE pair set grows ~ N * copies — output-dominated by construction. The
artifact therefore also records pairs/vector so linear-vs-quadratic in
the CORPUS (at fixed group size) is readable from the numbers.

Slices (regenerated if missing; .scaledata/ is never committed):
    python scripts/make_scaled_data.py --copies 10  --tables embeddings \
           --dest .scaledata/sf1.0-emb
    python scripts/make_scaled_data.py --copies 100 --tables embeddings \
           --dest .scaledata/sf10-emb

Usage: python scripts/bench_embedding_sf10.py  (quiet box, ~30-45 min)
Appends the "embedding" family block to SCALING_FAMILIES_sf10.json.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "SCALING_FAMILIES_sf10.json")

STEPS = [
    ("sf0.1", "/root/testdata/sf0.1", 2_000),
    ("sf1.0", os.path.join(REPO, ".scaledata/sf1.0-emb"), 20_000),
    ("sf10", os.path.join(REPO, ".scaledata/sf10-emb"), 200_000),
]

#: scale knobs for the full-corpus LSH path: 16-bit bands are selective
#: (0.5^16 random collision per band) where the registry's 2-bit bands
#: are ~all-pairs past ~10k vectors; identical twins (cosine 1.0)
#: collide in EVERY band so dedup recall on the replica corpus is exact,
#: and lsh_recall_bound quotes the analytic floor for merely-near pairs
LSH_KNOBS = dict(n_bands=16, band_planes=16, max_bucket_size=512)
LSH_THRESHOLD = 0.9


def _ensure_slices() -> None:
    for label, path, _ in STEPS:
        if label == "sf0.1" or os.path.isfile(
            os.path.join(path, "embeddings.parquet")
        ):
            continue
        copies = 10 if label == "sf1.0" else 100
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/make_scaled_data.py"),
             "--copies", str(copies), "--tables", "embeddings",
             "--dest", path],
            check=True, cwd=REPO,
        )


def _plan_markers(df) -> dict[str, object]:
    p = df._jdf.queryExecution().executedPlan().toString()
    return {
        "broadcast_hash_joins": p.count("BroadcastHashJoin"),
        "sort_merge_joins": p.count("SortMergeJoin"),
        "aqe_skew_split_joins": p.count("skew=true"),
        "cartesian_products": p.count("CartesianProduct"),
        "broadcast_nested_loops": p.count("BroadcastNestedLoop"),
    }


def _exponents(walls: dict[str, float]) -> dict[str, float]:
    out = {}
    if "sf0.1" in walls and "sf1.0" in walls and walls["sf0.1"]:
        out["exponent_sf0.1_to_sf1.0"] = round(
            math.log10(walls["sf1.0"] / walls["sf0.1"]), 2
        )
    if "sf1.0" in walls and "sf10" in walls and walls["sf1.0"]:
        out["exponent_sf1.0_to_sf10"] = round(
            math.log10(walls["sf10"] / walls["sf1.0"]), 2
        )
    return out


def main() -> None:
    _ensure_slices()

    from pyspark.sql import functions as F

    from translator_tm_provider_pipelines_spark.operators import similarity
    from translator_tm_provider_pipelines_spark.plans import testdata_queries as tq
    from translator_tm_provider_pipelines_spark.session import get_spark

    spark = get_spark(app_name="bench_embedding_sf10")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- 1. registry shape: fixed working set, growing scan ----------
    registry: dict[str, dict[str, float]] = {}
    reg_markers: dict[str, dict] = {}
    for qname in ("embedding_near_duplicates", "semantic_near_duplicates",
                  "embedding_keep_list"):
        fn = tq.QUERIES[qname]
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite").save()  # codegen warmup
        spark.catalog.clearCache()
        walls: dict[str, float] = {}
        for label, sf_dir, _n in STEPS:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls[label] = round(time.perf_counter() - t0, 1)
            if label == "sf10":
                reg_markers[qname] = _plan_markers(df)
            spark.catalog.clearCache()
            print(f"registry {qname} {label}: {walls[label]} s", flush=True)
        registry[qname] = {**walls, **_exponents(walls)}

    # ---- 2. scale path: full corpus, scale knobs ---------------------
    lsh: dict[str, dict] = {}
    for label, sf_dir, n in STEPS:
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        t0 = time.perf_counter()
        # candidates materialized ONCE (the production pattern — the
        # verify stage must not re-derive the band pipeline), counted
        # from the checkpoint so the count is free of re-derivation
        cand = similarity.banded_lsh_candidate_pairs(
            emb, n_dims=64, **LSH_KNOBS
        ).localCheckpoint()
        n_cand = cand.count()
        t_cand = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        ver = similarity._exact_cosine_pairs(
            emb, cand, "vec_id", "embedding", 6
        ).where(F.col("cosine") >= LSH_THRESHOLD)
        ver.write.format("noop").mode("overwrite").save()
        t_ver = round(time.perf_counter() - t0, 1)
        n_ver = ver.count()
        lsh[label] = {
            "wall_candidates_sec": t_cand,
            "wall_verify_sec": t_ver,
            "wall_total_sec": round(t_cand + t_ver, 1),
            "n_candidates": n_cand,
            "n_verified": n_ver,
            "candidates_per_vector": round(n_cand / n, 1),
        }
        if label == "sf10":
            lsh["plan_markers_sf10"] = _plan_markers(ver)
        spark.catalog.clearCache()
        print(f"lsh {label}: {lsh[label]}", flush=True)
    lsh_walls = {k: v["wall_total_sec"] for k, v in lsh.items()
                 if isinstance(v, dict) and "wall_total_sec" in v}
    lsh.update(_exponents(lsh_walls))
    lsh["recall_bound_at_0.9"] = round(
        similarity.lsh_recall_bound(0.9, LSH_KNOBS["n_bands"],
                                    LSH_KNOBS["band_planes"]), 3
    )

    sem: dict[str, dict] = {}
    for label, sf_dir, n in STEPS:
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        n_lists = max(16, n // 100)
        t0 = time.perf_counter()
        nd = similarity.semantic_near_duplicates(
            emb, threshold=LSH_THRESHOLD, n_lists=n_lists,
            max_bucket_size=4096,
        )
        nd.write.format("noop").mode("overwrite").save()
        t_nd = round(time.perf_counter() - t0, 1)
        n_pairs = nd.count()
        t0 = time.perf_counter()
        keep = similarity.semantic_dedup_keep_list(
            emb, threshold=LSH_THRESHOLD, n_lists=n_lists,
            max_bucket_size=4096,
        )
        keep.write.format("noop").mode("overwrite").save()
        t_keep = round(time.perf_counter() - t0, 1)
        n_kept = keep.where("keep").count()
        sem[label] = {
            "n_lists": n_lists,
            "wall_pairs_sec": t_nd,
            "wall_keep_list_sec": t_keep,
            "n_verified": n_pairs,
            "n_kept": n_kept,
        }
        if label == "sf10":
            sem["plan_markers_sf10"] = _plan_markers(nd)
        spark.catalog.clearCache()
        print(f"semdedup {label}: {sem[label]}", flush=True)
    sem_walls = {k: v["wall_pairs_sec"] for k, v in sem.items()
                 if isinstance(v, dict) and "wall_pairs_sec" in v}
    sem.update(_exponents(sem_walls))

    out = json.load(open(ART)) if os.path.isfile(ART) else {}
    out["embedding"] = {
        "corpus_note": (
            "scaled slices replicate the 2000 base vectors verbatim with "
            "offset ids (copies-1 identical twins per vector), so the true "
            "pair set grows ~ N*copies by construction; registry queries "
            "keep their committed vec_id<500 working set"
        ),
        "registry_shape": {**registry, "plan_markers_sf10": reg_markers},
        "lsh_scale_path": {"knobs": {**LSH_KNOBS,
                                     "threshold": LSH_THRESHOLD}, **lsh},
        "semdedup_scale_path": {"threshold": LSH_THRESHOLD, **sem},
    }
    with open(ART, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out["embedding"]))


if __name__ == "__main__":
    main()

"""Lineage-truncation staging: ``localCheckpoint`` by default, durable
parquet staging when configured — the 100 TB production form.

``localCheckpoint`` blocks are executor-local, NON-REPLICATED state: on a
real cluster an executor loss makes every downstream job that references
the block unrecoverable instead of recomputing lineage (optimization
guide §5). That is the right trade for bench/registry/local runs (no
durability needed, zero I/O), and the wrong one for long production
pipelines. ``stage`` keeps one call site for both: the CLI sets
``spark.translator_tm.stagingDir`` (see ``cli.main``) and every staged
intermediate becomes a parquet table under that directory — the guide
§3.3 "materialise an intermediate result" durable form — while
registry/bench invocations (conf unset) keep the exact localCheckpoint
behavior, lazy or eager.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame

#: session conf carrying the durable staging directory; unset/empty =
#: localCheckpoint (the bench/local default)
STAGING_DIR_CONF = "spark.translator_tm.stagingDir"


def stage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and return a frame whose plan is truncated to
    the materialized data (flat plans for iterative towers, single
    evaluation for multiply-consumed frames).

    Default (no ``spark.translator_tm.stagingDir`` in the session conf):
    ``df.localCheckpoint(eager=eager)`` — unchanged from the pre-r13 call
    sites. With the conf set, the frame is written once as parquet under
    the staging dir and read back: durable across executor loss, visible
    to every executor through the filesystem instead of block-manager
    state. The durable form is always eager (a parquet write is an
    action); the CLI paths that enable it run their terminal action right
    after plan construction, so eagerness only reorders work there.
    """
    sess = df.sparkSession
    base = sess.conf.get(STAGING_DIR_CONF, None)
    if not base:
        return df.localCheckpoint(eager=eager)
    path = f"{base.rstrip('/')}/stage-{uuid.uuid4().hex}"
    df.write.mode("error").parquet(path)
    return sess.read.parquet(path)

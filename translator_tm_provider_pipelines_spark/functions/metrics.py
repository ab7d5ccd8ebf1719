"""Cooccurrence metric column expressions.

Formulas are from the reference's ConceptCooccurrenceMetrics
(.../etl/util/ConceptCooccurrenceMetrics.java:5-70), re-expressed as native
Spark column arithmetic — same double-precision math, computed JVM-side
inside whole-stage codegen instead of per-record Java calls.

Rounding: the reference stores scores rounded to 8 decimal places with
BigDecimal ROUND_HALF_UP (ConceptCooccurrenceMetricsPipeline.java:847-852).
Spark's ``F.round`` is HALF_UP for positive scale, which matches; ``bround``
(HALF_EVEN) would not.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# NPMI / NPMI-max-denom offset guarding log(0)
# (ConceptCooccurrenceMetrics.java:34,58)
_OFFSET = 1e-9

SCALE = 8


def ngd(fx: Column, fy: Column, fxy: Column, total_concepts: Column) -> Column:
    """Normalized Google Distance
    (ConceptCooccurrenceMetrics.normalizedGoogleDistance:5-15):
    (max(log10 fx, log10 fy) - log10 fxy) / (log10 N - min(log10 fx, log10 fy)).
    N = *total concept observations*, not total docs."""
    log_fx = F.log10(fx.cast("double"))
    log_fy = F.log10(fy.cast("double"))
    log_fxy = F.log10(fxy.cast("double"))
    log_n = F.log10(total_concepts.cast("double"))
    return (F.greatest(log_fx, log_fy) - log_fxy) / (log_n - F.least(log_fx, log_fy))


def pmi(total_docs: Column, fx: Column, fy: Column, fxy: Column) -> Column:
    """Pointwise mutual information, natural log
    (pointwiseMutualInformation:17-26): ln(pxy / (px*py))."""
    n = total_docs.cast("double")
    pxy = fxy.cast("double") / n
    px = fx.cast("double") / n
    py = fy.cast("double") / n
    return F.log(pxy / (px * py))


def npmi(total_docs: Column, fx: Column, fy: Column, fxy: Column) -> Column:
    """Normalized PMI (normalizedPointwiseMutualInformation:28-38):
    pmi / (-ln(pxy + 1e-9))."""
    n = total_docs.cast("double")
    pxy = fxy.cast("double") / n
    denom = F.log(pxy + F.lit(_OFFSET)) * F.lit(-1.0)
    return pmi(total_docs, fx, fy, fxy) / denom


def npmi_max_denom(total_docs: Column, fx: Column, fy: Column, fxy: Column) -> Column:
    """NPMI with max-marginal denominator
    (normalizedPointwiseMutualInformationMaxDenom:50-62):
    pmi / (-ln(max(px, py) + 1e-9))."""
    n = total_docs.cast("double")
    px = fx.cast("double") / n
    py = fy.cast("double") / n
    denom = F.log(F.greatest(px, py) + F.lit(_OFFSET)) * F.lit(-1.0)
    return pmi(total_docs, fx, fy, fxy) / denom


def mutual_dependence(total_docs: Column, fx: Column, fy: Column, fxy: Column) -> Column:
    """Mutual dependence (mutualDependence:40-48): ln(pxy^2 / (px*py))."""
    n = total_docs.cast("double")
    pxy = fxy.cast("double") / n
    px = fx.cast("double") / n
    py = fy.cast("double") / n
    return F.log(F.pow(pxy, F.lit(2.0)) / (px * py))


def lfmd(total_docs: Column, fx: Column, fy: Column, fxy: Column) -> Column:
    """Log-frequency-biased mutual dependence
    (logFrequencyBiasedMutualDependence:64-70): md + ln(pxy)."""
    n = total_docs.cast("double")
    pxy = fxy.cast("double") / n
    return mutual_dependence(total_docs, fx, fy, fxy) + F.log(pxy)


def idf(total_docs: Column, docs_with_concept: Column) -> Column:
    """Inverse document frequency (ConceptIdfPipeline.getConceptIdf:184-203):
    ln(totalDocs / docsWithConcept)."""
    return F.log(total_docs.cast("double") / docs_with_concept.cast("double"))


def round8(col: Column) -> Column:
    """Reference storage rounding: scale 8, HALF_UP."""
    return F.round(col, SCALE)

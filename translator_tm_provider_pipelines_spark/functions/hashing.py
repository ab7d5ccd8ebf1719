"""Identity hashing — bit-exact with the reference.

The reference derives stable ids from content hashes:

- sentence / assertion / evidence ids: sha256 hex
  (.../etl/fn/ExtractedSentence.java:104-107,
   .../etl/fn/ClassifiedSentenceStorageSqlValuesFn.java:640-650)
- concept-pair id: base64(sha1("c1|c2")) with the pair in lexicographic
  order (.../etl/fn/ConceptCooccurrenceCountsFn.java:365-392)
- level text id: docId_level_sha256(spanStart+spanEnd+first8chars)
  (.../etl/fn/ConceptCooccurrenceCountsFn.java:189-197)

All are native Spark expressions (F.sha2/F.sha1/F.base64/F.unhex) so they
run JVM-side and match Java's MessageDigest output byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sha256_hex(col: Column | str) -> Column:
    """sha256 hex digest, lowercase — matches DigestUtils.sha256Hex."""
    return F.sha2(F.col(col) if isinstance(col, str) else col, 256)


def sha1_base64(col: Column | str) -> Column:
    """base64 of the raw sha1 digest — matches the reference's pair-id
    scheme: Base64.encodeBase64String(DigestUtils.sha1("c1|c2"))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.base64(F.unhex(F.sha1(c)))


def concept_pair_id(c1: Column, c2: Column) -> Column:
    """Canonical pair id: lexicographic order then base64-sha1 of "c1|c2"
    (ConceptCooccurrenceCountsFn.ConceptPair ctor + getPairId)."""
    lo = F.least(c1, c2)
    hi = F.greatest(c1, c2)
    return sha1_base64(F.concat_ws("|", lo, hi))


def level_text_id(doc_id: Column, level: Column, span_start: Column, span_end: Column, text: Column) -> Column:
    """Text-unit id for sub-document cooccurrence levels:
    ``docId_LEVEL_sha256(start + end + first-8-chars-of-text)`` —
    ConceptCooccurrenceCountsFn.java:189-197 (document level uses the bare
    doc id)."""
    digest = sha256_hex(
        F.concat(
            span_start.cast("string"),
            span_end.cast("string"),
            F.substring(text, 1, 8),
        )
    )
    return F.concat_ws("_", doc_id, level, digest)

"""PySpark-native analytics engine with the query and data-processing
capabilities of UCDenver-ccp/Translator-TM-Provider-Pipelines.

The reference is a set of Apache Beam (Java) batch pipelines over Cloud
Datastore; this package re-expresses every operator in SURVEY.md §2 as
idiomatic Spark DataFrame programs: explicit schemas, partitioned Parquet
tables, Catalyst-optimized joins/windows in place of hand-built CoGroupByKey
DAGs, and broadcast joins in place of fragile side inputs.

Layout
------
- ``session``    SparkSession factory tuned for local testing and cluster scale
- ``schemas``    all StructTypes (documents/status/annotations/sentences/...)
- ``functions``  column-expression libraries (hashing, cooccurrence metrics,
                 text statistics) — pure ``pyspark.sql.functions``, JVM-side
- ``sources``    readers: parquet tables, two-column TSVs, XML document stubs
- ``operators``  the operator inventory: versioning, universal status⋈docs
                 join, span joins, cooccurrence chain, sentence extraction,
                 post-processing filters, dedup, similarity, text analysis
- ``plans``      pipeline compositions + CLI dispatch (PipelineKey-style)
- ``streaming``  Structured Streaming ingest of new document batches
"""

__version__ = "0.1.0"

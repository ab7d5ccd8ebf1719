"""Column-expression libraries — pure ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen friendly). No Python UDFs here."""

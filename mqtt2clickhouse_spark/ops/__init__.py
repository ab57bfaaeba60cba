"""Large-scale training-data pipeline operators (driver-mandated
extensions beyond the reference's surface, BASELINE.json line 6):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), vector similarity search, text analysis, multimodal column
plumbing, and an as-of join.

All hot paths are built-in pyspark.sql.functions (JVM, whole-stage
codegen); Python appears only in the clearly-marked multimodal stubs.
"""

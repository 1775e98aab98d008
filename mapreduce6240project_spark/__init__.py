"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference repo sry19/mapreduce6240project.

The reference is a Hadoop MapReduce + HBase pipeline (CSV ingest ->
feature store -> k-medoids clustering -> group-by analytics); this
package re-expresses that capability surface -- plus large-scale
training-data-pipeline extensions (dedup, similarity search, text
analysis, event windows) -- as idiomatic PySpark DataFrame programs.

Layout
------
- ``session``    SparkSession builder tuned for the test harness.
- ``functions``  scalar Column-expression kernels (distance, parsing).
- ``sources``    ingest (dirty tweets CSV -> feature store) + loaders.
- ``operators``  the operator inventory from SURVEY.md section 2 plus
                 extensions: clustering, lookups, sampling, analytics,
                 dedup, similarity, text stats, windows.
- ``plans``      query registry shared by __spark_entry__ and bench.py.
- ``streaming``  Structured Streaming variants of the window operators.

Design stance (SURVEY.md section 7): DataFrame API + Catalyst built-ins
only for reference parity; no RDDs; Python UDFs only where array-heavy
extension math genuinely beats expression trees; driver-side Python for
iterative control flow.
"""

__version__ = "0.1.0"

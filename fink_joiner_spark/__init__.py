"""fink_joiner_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference
``reva-compass/fink-joiner`` (a Flink 1.8 streaming dedup+join POC; see
SURVEY.md), re-expressed Spark-first:

* batch + streaming on the unified DataFrame API, Catalyst-optimized;
* the reference's operator inventory (SURVEY.md §2): JSON envelope
  projection, latest-version-per-key dedup, multi-way left outer join,
  temporal (as-of) join, windowed aggregation, changelog output;
* large-scale training-data-pipeline extensions: dedup families
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
  similarity search, text analysis, multimodal column plumbing.

Everything is designed for a real multi-executor cluster at ~100 TB:
declarative plans (predicate pushdown + column pruning reach the scans),
broadcast joins for small dimensions, AQE for skew, no driver-side
collects in any operator.
"""

__version__ = "0.1.0"

from fink_joiner_spark.session import get_spark  # noqa: F401
from fink_joiner_spark.catalog import load_tables, table  # noqa: F401

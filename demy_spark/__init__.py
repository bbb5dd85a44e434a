"""demy_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query and data-processing capabilities
of the reference platform (forchard/demy, a Scala/Spark public-health
analytics stack) in idiomatic PySpark: DataFrame/SQL plans that Catalyst
can optimize end-to-end, pandas UDFs only where built-ins genuinely
cannot express the semantics, and Structured Streaming for streams.

Layout
------
- ``session``    : SparkSession factory tuned for both local[32] tests
                   and multi-executor clusters.
- ``io``         : table loading, checkpoint/snapshot-with-reuse
                   (parity: core/src/main/scala/util/util.scala:44-78).
- ``functions``  : scalar kits — text normalization, text analytics,
                   vector math, score calibration.
- ``operators``  : relational + custom operators — fuzzy lookup join,
                   top-k/window helpers, declarative group-by,
                   deduplication, similarity search, embeddings,
                   multimodal column plumbing.
- ``streaming``  : Structured Streaming windows over event streams.
- ``plans``      : pipeline orchestrator (Model/Step/Plan parity:
                   mllib/src/main/scala/Model.scala).

Everything here is designed for ~100 TB inputs on a large cluster:
no driver-side collection of data-sized state, broadcast only for
dictionary-sized sides, shuffles only on declared keys, filters and
projections kept pushdown-friendly.
"""

__version__ = "0.1.0"

from demy_spark.session import get_spark  # noqa: F401

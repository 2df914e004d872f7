"""akka_stream_contrib_spark — a PySpark-native analytics engine re-expressing
the operator semantics of akka/akka-stream-contrib (reference at
/root/reference, snapshot 2026-08-07) on the Spark DataFrame / Structured
Streaming model, extended with large-scale training-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis).

Design notes
------------
Akka element streams are totally ordered; Spark DataFrames are unordered
multisets. Every order-sensitive operator here takes an explicit ``seq``
(monotonic index) or ``ts`` (event-time) column — see SURVEY.md §1.4. Batch
operators are pure Column/Window expressions (Catalyst-optimizable, inside
whole-stage codegen); streaming forms use watermarks + stateful APIs; cyclic
reference combinators (Retry / FeedbackLoop / unfoldFlow) become driver-side
iteration because Spark plans are DAGs.
"""

from akka_stream_contrib_spark.session import get_spark
from akka_stream_contrib_spark.tables import load, load_all, register_views

__all__ = ["get_spark", "load", "load_all", "register_views"]
__version__ = "0.1.0"

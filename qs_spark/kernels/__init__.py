"""Pure-pandas/pure-python extraction kernels.

No Spark imports here: the same functions run (a) inside Arrow-batched
``mapInPandas`` on executors and (b) single-threaded as the golden oracle in
tests (SURVEY.md §5).  Equality between the two runs is what validates the
distributed plumbing (partitioning, skew split/re-stitch, ordering).
"""

from qs_spark.kernels.dispatch import EXT_BY_FMT, extract_doc, fmt_of_spans

__all__ = ["extract_doc", "fmt_of_spans", "EXT_BY_FMT"]

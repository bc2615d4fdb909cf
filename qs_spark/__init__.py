"""qs_spark — a PySpark-native rebuild of QuantaSearch's extraction + search
capabilities (reference: AmeyaAI/QuantaSearch @ /root/reference, read-only).

Architecture (Spark-first, not a port — see SURVEY.md §7):
  - input:  table (doc_id string, spans array<struct<kind,text,media_ref,offset>>)
  - extract: salted repartition + size-aware skew split -> mapInPandas(kernels)
             -> ordered span sequences (doc_id, order, kind, text, media_ref)
  - store:   filename-prepend + lowercase/newline normalization (F1/F2)
  - search:  postings / OR / AND / BM25L retrieval, dedup window, score rollup,
             preview windowing, top-k — all DataFrame ops; previews in a pandas
             kernel (char-exact reference semantics)
  - textops: dedup (exact/minhash-LSH/simhash/jaccard), ANN, quality scoring
  - checkpoint: per-wave lineage + idempotent resume
"""

__version__ = "0.1.0"

"""doc_parser_spark — a PySpark-native web-scale document extraction engine.

A from-scratch reimplementation of the capabilities of
mindsandcompany/doc_parser (a Docling fork) on top of Apache Spark:

* a vectorized extraction kernel (HTML DOM walk + PDF layout pass) that runs
  inside ``mapInPandas`` over Arrow batches of Common-Crawl-style pages
  ``(url, warc_ts, html binary, text, lang)``,
* a structure-preserving chunker + flat vector-metadata builder
  (GenOSVectorMeta-shaped rows) for RAG/training-data pipelines,
* large-scale plumbing: salt repartitioning by url-hash, AQE-friendly plans,
  per-partition completion manifests with anti-join resume, accumulator
  metrics,
* training-data operators: dedup (exact / MinHash-LSH / SimHash / n-gram
  Jaccard), embedding similarity search, text analysis (lang-id, quality,
  token counts, fingerprints).

Everything here derives from public knowledge of the reference's behaviour
(cited as ``file:line`` into ``/root/reference``) re-expressed Spark-first.
"""

__version__ = "0.1.0"

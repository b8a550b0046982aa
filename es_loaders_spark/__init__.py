"""es_loaders_spark — a PySpark-native full-text index build + BM25 query engine.

Re-expresses the capabilities of the reference repo ``shahcompbio/es-loaders``
(a pandas → Elasticsearch ETL; see SURVEY.md) as an idiomatic Spark engine:

- ``corpus``     deterministic Common-Crawl-style web-pages synthesizer
- ``extract``    byte-identical html → text extraction (vectorized pandas UDF)
- ``analyze``    Lucene-StandardAnalyzer-compatible tokenizer (JVM + Arrow paths)
- ``postings``   long-format posting lists + corpus statistics
- ``bm25``       exact BM25 top-k scorer as a Catalyst join/agg plan
- ``codec``      delta+varint posting-block codec with block-max metadata (numpy)
- ``build``      partition-local index build with lineage/metrics checkpointing
- ``merge``      global sort-merge of postings with hot-term salting
- ``wand``       block-max WAND top-k query engine over the compressed index
- ``queries``    the reference's ETL/aggregation operator surface (SURVEY §2)
- ``dedup``      exact / MinHash-LSH / SimHash / n-gram-Jaccard deduplication
- ``similarity`` brute-force + LSH-bucketed cosine ANN over embeddings
- ``textstats``  language-ID, quality scoring, token counting, fingerprinting
- ``multimodal`` binary media columns with stubbed decoders, real Spark plumbing
"""

__version__ = "0.1.0"

K_MAX = 50_000  # reference's max_result_window (mira/constants.py:24)

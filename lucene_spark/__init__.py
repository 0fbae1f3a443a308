"""lucene_spark — a PySpark-native full-text index + BM25 search engine.

A brand-new implementation (NOT a port) of the computation performed by
Apache Lucene's core index-and-search pipeline (reference at
/root/reference, see SURVEY.md):

- analysis:   standard tokenizer -> lowercase -> stopword chain
- index:      per-partition inverted-index segment build (mapInPandas),
              FOR/delta + PFor-compressed 256-posting blocks with
              per-block skip + impact (block-max) metadata
- similarity: BM25 (k1=1.2, b=0.75) with Lucene's exact float32 operation
              order and SmallFloat length-norm quantization
- search:     term / boolean AND-OR / phrase queries, top-k with
              block-max pruning and score-desc/doc-asc tie-break
- merge:      tiered segment compaction
- pipeline:   web-scale training-data ops (dedup, ANN, text quality)
"""

__version__ = "0.1.0"

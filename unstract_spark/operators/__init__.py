"""Operator library — SURVEY.md §2 inventory, Spark-first.

Modules:
  dedup          F1-F3 anti-join dedup + exact/MinHash/SimHash/Jaccard/
                 embedding near-dup (training-data pipeline ops)
  chunking       T3 chunk/posexplode (+ sentence splitter UDF)
  retrieval      J4/R1-R8 top-k similarity, RRF fusion, keyword table
  prompts        T8-T10 prompt assembly, extraction, type coercion (§1.2)
  text_analysis  language-ID, quality scoring, token counts, fingerprints
  similarity     brute-force + LSH-bucketed ANN over embeddings
  usage          A1-A5 usage/cost/status aggregations
  llm            batched/bounded/retrying pandas-UDF LLM controller (T7)
  multimodal     binary-column plumbing for image/audio (decode stubbed)
"""

"""Operator library — SURVEY.md §2 inventory, Spark-first.

Modules:
  dedup          F1-F3 anti-join dedup + exact/MinHash/SimHash/Jaccard/
                 embedding near-dup + train/eval n-gram decontamination
                 + duplicate clusters (map-reduce connected components)
                 + intra-corpus span overlap
  chunking       T3 chunk/posexplode (+ sentence splitter UDF)
  retrieval      J4/R1-R8 top-k similarity, RRF fusion, keyword table,
                 Okapi BM25 (single + shared-index batch)
  prompts        T8-T10 prompt assembly, extraction, type coercion (§1.2)
  text_analysis  language-ID, quality scoring (incl. Gopher rules +
                 repetition filters), PII redaction, token counts,
                 fingerprints, unigram-LM fluency scoring
  bpe            distributed BPE: corpus counting, exact merges,
                 broadcast encode, vocab/id export; char-level AND
                 GPT-2 byte-level alphabets
  similarity     ANN over embeddings: brute-force, sign-LSH, IVF
                 (+k-means refine), PQ (+per-subspace refine), IVF-PQ,
                 cost-based strategy planner
  hnsw           sharded HNSW graph ANN (per-partition graphs,
                 scatter/gather merge; recall-gated)
  joins          as-of (backward/forward/nearest merge-as-of, plus the
                 skew-safe ts-bucket chunked plan) and bin-bucketed
                 range joins with an eager fan-out guard
  timeseries     multi-resolution rollup cascade (coarse from fine,
                 raw scanned once) + additive-partial maintenance
  export         training export: deterministic shards, sequence
                 packing, mixture sampling, stratified (reservoir)
                 sampling, small-file compaction
  usage          A1-A5 usage/cost/status aggregations
  llm            batched/bounded/retrying pandas-UDF LLM controller (T7)
  lineitems      bounded-round line-item continuation (distributed state)
  enrich         T11-T18 summarize/challenge/eval/lookup/classify/repair
  extract        T1/T2 x2text adapter registry (PDF/OCR/remote shapes)
  index_store    T4/T5 chunk embedding + vector index store
  variables      F8 variable replacement (static/custom/dynamic)
  multimodal     image/audio/video binary columns with REAL pure-stdlib
                 codecs (BMP/PGM/PPM/PNG/JPEG/GIF/WAV/AVI via minijpeg,
                 minigif, miniavi, helpers here); features, resize,
                 frame sampling
  minipdf        machine-generated-PDF text extraction
  minijpeg       baseline sequential JPEG codec
  minigif        GIF87a/89a codec incl. full-redraw animations
  miniavi        uncompressed-DIB AVI mux/demux
"""

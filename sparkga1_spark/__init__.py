"""sparkga1_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the reference genomics pipeline (HamidMushtaq/SparkGA1, surveyed in
/root/repo/SURVEY.md), re-expressed Spark-first:

- the reference's hand-rolled dataflow (range binning, skew re-split,
  interval coalescing, per-group external transforms, global merge sort)
  becomes declarative DataFrame plans optimized by Catalyst + AQE;
- the record kinds (SAM/BED/VCF rows, sequence dictionary) become typed
  DataFrames (see FIXTURES.md);
- beyond the reference surface, large-scale training-data-pipeline
  operators are first-class: dedup (exact/minhash/simhash/jaccard),
  similarity search over embeddings, text analysis, multimodal plumbing.

Layout:
    session      SparkSession factory (AQE + Arrow on, UTC)
    sources/     catalog (testdata tables), sinks, fixture derivations
    functions/   scalar/array helpers: stable hashing, text, vectors
    operators/   filters, binning, intervals, dedup, similarity,
                 per-group transforms, skew salting
    plans/       named queries + DuckDB oracle SQL + genomics pipeline
    streaming/   micro-batch ingestion + windowed/stateful streaming ops
"""

__version__ = "0.1.0"

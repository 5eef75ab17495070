"""pagerank_hadoop_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``Riddle4045/PageRank-Hadoop`` (a 13-job Hadoop MapReduce PageRank
pipeline, ``/root/reference/src/PageRank/PageRank.java``), built
Spark-first:

* the reference's hand-scheduled map/reduce jobs become lazy DataFrame
  plans optimized by Catalyst (see ``operators.pagerank``,
  ``sources.wiki``, ``functions.wikitext``);
* every operator is designed for a multi-executor cluster at 100 TB
  scale — broadcast semi-joins for dimension-sized sides, partial
  aggregation, no single-reducer stages (the reference's
  ``setNumReduceTasks(1)`` at ``PageRank.java:442`` is deliberately
  NOT reproduced), in-memory iteration with lineage truncation instead
  of 13 full disk round-trips;
* beyond reference parity, the engine ships the operators a large-scale
  LLM training-data pipeline needs: deduplication (exact, MinHash-LSH,
  SimHash, n-gram Jaccard, embedding-cosine), similarity search,
  multimodal binary columns, text analysis, and structured streaming.
"""

__version__ = "0.1.0"

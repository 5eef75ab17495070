from pagerank_hadoop_spark.sources.wiki import read_pages, parse_pages  # noqa: F401

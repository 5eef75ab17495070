from pagerank_hadoop_spark.plans.oracle import pagerank_oracle_sql  # noqa: F401

from pagerank_hadoop_spark.functions.wikitext import (  # noqa: F401
    extract_links,
    normalize_title,
    valid_wiki_link,
)
from pagerank_hadoop_spark.functions.vectors import cosine_similarity  # noqa: F401

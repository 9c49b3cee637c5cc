from . import cdc, cluster, dedup, graph, knn, retrieval, text  # noqa: F401

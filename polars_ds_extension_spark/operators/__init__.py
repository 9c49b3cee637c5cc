from . import cdc, dedup, graph, knn, retrieval, text  # noqa: F401

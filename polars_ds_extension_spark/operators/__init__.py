from . import dedup, knn, retrieval, text  # noqa: F401

from . import chunking, dedup, drift, graph, lm, projection, sampling, similarity, split  # noqa: F401

from . import chunking, dedup, graph, lm, projection, sampling, similarity, split  # noqa: F401

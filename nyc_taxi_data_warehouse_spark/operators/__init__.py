from . import chunking, dedup, graph, lm, projection, sampling, similarity  # noqa: F401

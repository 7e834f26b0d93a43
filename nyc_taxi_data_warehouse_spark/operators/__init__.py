from . import chunking, dedup, lm, projection, sampling, similarity  # noqa: F401

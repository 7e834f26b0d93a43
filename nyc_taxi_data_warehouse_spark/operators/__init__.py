from . import chunking, dedup, lm, sampling, similarity  # noqa: F401

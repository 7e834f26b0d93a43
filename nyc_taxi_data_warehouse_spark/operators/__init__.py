from . import chunking, dedup, sampling, similarity  # noqa: F401

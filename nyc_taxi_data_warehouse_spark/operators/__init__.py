from . import (  # noqa: F401
    chunking,
    dedup,
    drift,
    dsir,
    graph,
    lm,
    projection,
    sampling,
    semdedup,
    shuffle,
    similarity,
    split,
)

from .binaryops import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_media_batch,
    extract_features,
    fake_decode_meta,
    read_media_dir,
    synthesize_media,
)

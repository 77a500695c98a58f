from .bitstream import (
    pack_stream,
    unpack_stream,
    pack_corpus,
    unpack_corpus,
    stream_num_bytes,
)

__all__ = [
    "pack_stream",
    "unpack_stream",
    "pack_corpus",
    "unpack_corpus",
    "stream_num_bytes",
]

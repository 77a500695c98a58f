from .bitstream import (
    pack_stream,
    unpack_stream,
    pack_corpus,
    peek_corpus_header,
    unpack_corpus,
    stream_num_bytes,
)

__all__ = [
    "pack_stream",
    "unpack_stream",
    "pack_corpus",
    "peek_corpus_header",
    "unpack_corpus",
    "stream_num_bytes",
]

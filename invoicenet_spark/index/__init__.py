from invoicenet_spark.index.build import build_index, IndexPaths
from invoicenet_spark.index.codec import (
    vb_encode,
    vb_decode,
    encode_posting_list,
    decode_posting_list,
)

__all__ = [
    "build_index",
    "IndexPaths",
    "vb_encode",
    "vb_decode",
    "encode_posting_list",
    "decode_posting_list",
]

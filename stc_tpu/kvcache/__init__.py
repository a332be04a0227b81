from stc_tpu.kvcache.state import StreamKV, DecodeKV
from stc_tpu.kvcache.engine import (
    init_stream_kv,
    init_decode_kv,
    append_stream,
    retrieve_blocks,
    decode_write,
    decode_attend,
)

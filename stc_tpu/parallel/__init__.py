from stc_tpu.parallel.mesh import make_mesh
from stc_tpu.parallel.sharding import (
    qwen2_param_specs, stream_kv_specs, decode_kv_specs, shard_pytree,
)

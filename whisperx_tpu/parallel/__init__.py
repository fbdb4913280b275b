from whisperx_tpu.parallel.sharding import (
    get_mesh,
    make_mesh,
    set_mesh,
    shard,
    use_mesh,
    shard_params_tp,
)

__all__ = ["get_mesh", "make_mesh", "set_mesh", "shard", "use_mesh", "shard_params_tp"]

from midas_tpu.dist.sharded import (
    make_mesh,
    shard_index,
    distributed_profile_step,
)

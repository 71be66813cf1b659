from rpg_open_remode_tpu.parallel.mesh import make_mesh
from rpg_open_remode_tpu.parallel.halo import exchange_halo_1d, exchange_halo_2d
from rpg_open_remode_tpu.parallel.sharded import (
    build_sharded_update,
    build_sharded_denoise,
    build_sharded_reseed,
    shard_state,
    stack_states,
    SHARDED_PACKED_KEYS,
)
from rpg_open_remode_tpu.parallel.node import ShardedDepthmapNode
from rpg_open_remode_tpu.parallel.distributed import (
    initialize as initialize_distributed,
    make_distributed_mesh,
    replicate_frame,
    shard_local_keyframes,
    local_block,
    local_stats,
    gather_kf_slot,
)

from .batch import BatchedChain, BatchedMixer, batched_buffers, stack_states
from .sharding import (
    ShardedBatch,
    ShardedMixer,
    shard_batched_state,
    stream_mesh,
)

"""Device-mesh sharding for multi-chip synthesis."""

from .mesh import (channel_mesh, shard_schedule, synthesize_on_mesh,
                   synthesize_sharded)
from .pipeline import make_step, run_sequence, run_step

__all__ = ['channel_mesh', 'shard_schedule', 'synthesize_sharded',
           'synthesize_on_mesh', 'make_step', 'run_step', 'run_sequence']

"""Multi-chip synthesis over a ('channel', 'time') device mesh.

Runs on a virtual CPU mesh out of the box (8 virtual devices); on real
hardware the same code shards over the TPU slice.  Three surfaces:

1. synthesize_on_mesh -- the routed entry point (panel / worklist /
   stacked-table / dense, mirroring the single-chip engine).
2. synthesize_stack_sharded -- vstack-class schedules where mesh shards
   are stacked-table slices (1/P table bytes per device).
3. StackSequencer.play_packed_sharded -- shot fan-out: every device
   plays its slice of a randomized shot sequence.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "")
     + " --xla_force_host_platform_device_count=8").strip())

import jax

# force the CPU platform BEFORE backend init (some jax builds ignore the
# JAX_PLATFORMS env var); set WFTPU_EXAMPLE_TPU=1 to run on real devices
if not os.environ.get("WFTPU_EXAMPLE_TPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from waveforms_tpu import cosPulse, mixing, square, zero
from waveforms_tpu.core import WaveVStack
from waveforms_tpu.ops.lowering import lower_schedule
from waveforms_tpu.ops.stack_seq import (StackSequencer,
                                         synthesize_stack_sharded)
from waveforms_tpu.parallel.mesh import channel_mesh, synthesize_on_mesh

FS, STOP = 2e9, 8.192e-6
mesh = channel_mesh(n_channel=4, n_time=2)
interp = jax.default_backend() != "tpu"   # Pallas interprets off-TPU
print("mesh:", dict(mesh.shape), "interpret:", interp)

# -- 1) routed mesh synthesis (8 XY/Z channels) ---------------------------
rng = np.random.default_rng(0)
chans = []
for c in range(8):
    if c % 2 == 0:
        x = zero()
        for _ in range(3):
            I, _ = mixing(0.5 * cosPulse(20e-9) >> rng.uniform(0, 7e-6),
                          freq=-150e6 - 2e6 * c, DRAGScaling=1e-10)
            x += I
        chans.append(x)
    else:
        chans.append(0.3 * square(200e-9, edge=20e-9) >> 2e-6)
sig = synthesize_on_mesh(chans, 0.0, STOP, FS, mesh,
                         interpret=interp)
print("routed mesh output:", sig.shape, sig.dtype, "sharding:",
      sig.sharding if hasattr(sig, "sharding") else "host")

# int16 DAC codes with a 14-bit full scale, straight off the mesh
codes = synthesize_on_mesh(chans, 0.0, STOP, FS, mesh, interpret=interp,
                           out_dtype=jnp.int16, dac_scale=8191.0)
print("DAC codes:", codes.shape, codes.dtype,
      "max |code| =", int(np.abs(np.asarray(codes)).max()))

# -- 2) vstack-class schedules: mesh shards ARE table slices --------------
vstacks = [WaveVStack([float(a) * cosPulse(50e-9) >> o
                       for a, o in zip(rng.uniform(0.2, 1.0, 40),
                                       rng.uniform(0, STOP - 1e-7, 40))])
           for _ in range(4)]
out = synthesize_stack_sharded(vstacks, 0.0, STOP, FS, mesh,
                               interpret=interp)
print("sharded stack output:", out.shape)

# -- 3) shot fan-out: each device plays its slice of the sequence ---------
lows = [lower_schedule([v], 0.0, STOP, FS, bucket_samples=None)
        for v in vstacks[:3]]
seq = StackSequencer(lows)
ks = rng.integers(0, 3, size=16)
shots = seq.play_packed_sharded(ks, mesh, interpret=interp)
print("shot batch:", shots.shape, "-- schedule ids:", list(map(int, ks)))

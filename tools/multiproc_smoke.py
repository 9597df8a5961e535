"""Two-process ``jax.distributed`` smoke test of the sharded synthesis step.

Single-process virtual-device meshes (the test suite's default) validate
SPMD logic but not the multi-process path: distributed initialization,
global-array construction from per-process shards, and collectives that
actually cross process boundaries.  This script proves that path with two
OS processes x 4 virtual CPU devices = one global 8-device
('channel', 'time') mesh running the same sharded synthesis + demodulation
step as ``__graft_entry__.dryrun_multichip``.

Run directly (spawns its own workers):

    python tools/multiproc_smoke.py

Exit code 0 and a final ``MULTIPROC OK`` line mean both workers ran the
step and agreed with the host oracle.
"""

import os
import socket
import subprocess
import sys

N_PROC = 2
LOCAL_DEVICES = 4


def worker(process_id: int, port: int) -> None:
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + f' --xla_force_host_platform_device_count='
                               f'{LOCAL_DEVICES}').strip()
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(coordinator_address=f'localhost:{port}',
                               num_processes=N_PROC,
                               process_id=process_id)
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
    from waveforms_tpu import cosPulse, mixing, square, zero
    from waveforms_tpu.ops.demod import demodulate
    from waveforms_tpu.ops.lowering import lower_schedule
    from waveforms_tpu.parallel.mesh import channel_mesh, synthesize_sharded

    assert len(jax.devices()) == N_PROC * LOCAL_DEVICES, jax.devices()
    assert jax.process_count() == N_PROC

    rng = np.random.default_rng(5)
    chans = []
    for c in range(8):
        x = zero()
        if c % 2 == 0:
            I, _ = mixing(0.5 * cosPulse(50e-9) >> rng.uniform(0, 3e-6),
                          freq=-100e6 - 5e6 * c, DRAGScaling=1e-10)
            x += I
        else:
            x += 0.3 * (square(200e-9, edge=20e-9)
                        >> rng.uniform(0, 3e-6))
        chans.append(x)

    start, stop, fs = 0.0, 4.096e-6, 2e9
    mesh = channel_mesh(n_channel=4, n_time=2)
    low = lower_schedule(chans, start, stop, fs)
    sig = synthesize_sharded(low, mesh, rows_per_tile=8, interpret=True)

    # a real cross-process collective: global mean over the sharded array
    got_mean = float(jnp.mean(sig))

    # demodulation contracts the sharded time axis against a tone matrix
    # (the partitioner inserts a psum over 'time' crossing processes)
    from jax.sharding import NamedSharding, PartitionSpec as P
    n = sig.shape[1]
    t = np.arange(n) / fs
    freqs = np.array([-100e6, -110e6])
    matrix = (np.exp(-2j * np.pi * np.outer(t, freqs)) * (2.0 / n)
              ).astype(np.complex64)
    matrix = jax.device_put(matrix, NamedSharding(mesh, P('time', None)))
    iq = jax.jit(demodulate)(sig, matrix)
    iq_host = np.asarray(
        jax.experimental.multihost_utils.process_allgather(iq, tiled=True))

    # sparse worklist kernel over the same 2-process mesh (per-shard
    # local worklists; the global arrays span processes)
    from waveforms_tpu.ops.sparse_synth import synthesize_sparse_sharded
    sig_sp = synthesize_sparse_sharded(low, mesh, Rs=8, interpret=True)
    sp_err = float(jnp.abs(sig_sp - sig).max())
    assert sp_err < 2e-6, f"sparse-sharded mismatch {sp_err}"

    # distributed four-step FFT with all_to_all crossing processes
    from jax.sharding import Mesh
    from waveforms_tpu.ops.fft_sharded import fft_convolve_sharded
    fmesh = Mesh(np.array(jax.devices()), ('time',))
    n_fft = (N_PROC * LOCAL_DEVICES) ** 2 * 32
    ker = np.exp(-0.5 * np.linspace(-3, 3, 21) ** 2)
    ker /= ker.sum()
    x_long = np.sin(np.arange(n_fft) * 0.01)
    conv = fft_convolve_sharded(jnp.asarray(x_long, jnp.float32), ker,
                                fmesh)
    conv_host = np.asarray(
        jax.experimental.multihost_utils.process_allgather(conv,
                                                           tiled=True))
    conv_ref = np.fft.ifft(np.fft.fft(x_long)
                           * np.fft.fft(ker, n=n_fft)).real
    assert np.abs(conv_host - conv_ref).max() < 2e-3

    t_glob = np.arange(start, stop, 1 / fs)
    oracle = np.stack([w(t_glob) for w in chans])
    assert abs(got_mean - oracle.mean()) < 1e-6, (got_mean, oracle.mean())
    oracle_iq = oracle @ (np.exp(-2j * np.pi * np.outer(t_glob, freqs))
                          * (2.0 / len(t_glob)))
    iq_global = iq_host.reshape(-1, len(freqs))[:len(chans)]
    np.testing.assert_allclose(iq_global, oracle_iq, rtol=2e-4, atol=1e-6)

    print(f"worker {process_id}: mean={got_mean:.6g} "
          f"iq[0,0]={complex(iq_host.reshape(-1, 2)[0, 0]):.4g} "
          f"oracle_iq[0,0]={complex(oracle_iq[0, 0]):.4g} OK", flush=True)
    jax.distributed.shutdown()


def main() -> int:
    with socket.socket() as s:          # pick a free coordinator port
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(N_PROC)]
    ok = True
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=420)
        if p.returncode != 0:
            ok = False
        tail = '\n'.join(out.strip().splitlines()[-8:])
        print(f"--- worker {pid} (exit {p.returncode}) ---\n{tail}",
              flush=True)
    print("MULTIPROC OK" if ok else "MULTIPROC FAILED", flush=True)
    return 0 if ok else 1


if __name__ == '__main__':
    if len(sys.argv) == 3:
        worker(int(sys.argv[1]), int(sys.argv[2]))
    else:
        sys.exit(main())

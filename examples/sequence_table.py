"""Randomized-benchmarking-style shot loop on a device-resident table.

Builds K gate-sequence schedules, uploads them once as a Sequencer table,
then runs a randomized shot order through synthesis -> pre-compensation ->
MXU demodulation with a single kernel compilation.

    python examples/sequence_table.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import os

    import jax

    # WFTPU_EXAMPLE_CPU=1 forces the CPU interpreter (e.g. when the TPU
    # terminal is unavailable); NB the config call must precede any
    # backend-initializing jax call on this platform.
    if os.environ.get('WFTPU_EXAMPLE_CPU'):
        jax.config.update('jax_platforms', 'cpu')
    interpret = jax.default_backend() != 'tpu'

    from waveforms_tpu import cosPulse, mixing, zero
    from waveforms_tpu.ops import Sequencer, lower_schedule
    from waveforms_tpu.parallel import run_sequence

    fs, span = 2e9, 2e-6
    rng = np.random.default_rng(0)

    # -- K random Clifford-train schedules (one XY channel each) ----------
    def gate_train(n_gates):
        ch = zero()
        for g in range(n_gates):
            I, _ = mixing(0.5 * cosPulse(20e-9) >> (0.2e-6 + g * 0.1e-6),
                          freq=-150e6, phase=rng.uniform(0, 2 * np.pi),
                          DRAGScaling=1e-10)
            ch += I
        return [ch]

    K = 6
    lows = [lower_schedule(gate_train(rng.integers(2, 12)), 0, span, fs)
            for _ in range(K)]
    seq = Sequencer(lows)
    print(f"table: {K} schedules, padded descriptors {seq.shape}, "
          f"opcodes {seq.ops_present}")

    # -- randomized shot order, demodulated at the drive IF ----------------
    shots = rng.integers(0, K, size=32)
    iq = np.asarray(run_sequence(seq, shots, demod_freqs=[150e6],
                                 rows_per_tile=8, interpret=interpret))
    print(f"ran {len(shots)} shots -> IQ {iq.shape} {iq.dtype}")
    # |IQ| grows with the number of gates in the selected schedule
    mags = np.abs(iq[:, 0, 0])
    for k in range(K):
        sel = mags[np.asarray(shots) == k]
        if sel.size:
            assert np.allclose(sel, sel[0], rtol=1e-5), "shot-order leak!"
    print("per-schedule IQ consistent across the randomized order")
    print("example |IQ| per shot:", np.round(mags[:8], 4))

    # -- sparse play: gate trains are pulse-sparse, so the worklist kernel
    # plays the same table ~2x faster on chip (132.8 vs 67.0 GS/s
    # measured; benchmarks/tpu_state.json r3_seq_sparse_play) -------------
    dense0 = np.asarray(seq.play(0, rows_per_tile=8, interpret=interpret))
    sparse0 = np.asarray(seq.play_sparse(0, Rs=8, interpret=interpret))
    assert np.array_equal(dense0, sparse0), "sparse play must be bit-equal"
    print("play_sparse(0) bit-equal to play(0)")

    # -- amortized shot batches: the whole shot sequence in ONE dispatch
    # (vmap prepends a grid axis to the kernel; per-dispatch latency --
    # the entire cost of a 10 us schedule -- amortizes to nothing) -------
    batch = np.asarray(seq.play_many(shots[:8], rows_per_tile=8,
                                     interpret=interpret))
    assert np.array_equal(batch[0], np.asarray(
        seq.play(int(shots[0]), rows_per_tile=8, interpret=interpret)))
    print(f"play_many: {batch.shape[0]} shots in one dispatch -> "
          f"{batch.shape}")

    # -- shot-PACKED batches: the whole sequence as ONE panel-kernel
    # launch (grid steps scale with output panels, not shots; factor math
    # runs on live subtiles only).  ks stays traced -- a measurement-
    # feedback loop compiles once.  Measured 1.75 us/shot vs play_many's
    # 2.55 on v5e (benchmarks/tpu_state.json r4_seq_packed*) -------------
    packed = np.asarray(seq.play_packed(shots[:8], Rs=8,
                                        interpret=interpret))
    assert np.array_equal(packed, batch), "packed must match play_many"
    print(f"play_packed: {packed.shape[0]} shots in one kernel launch")

    # -- stacked-table playback: NARROW-pulse tables (bare gate trains,
    # no carrier) run the pulse-instance STACK kernel instead -- the K
    # tables stay device-resident and shots select slices via scalar-
    # prefetch index maps, so per-shot cost is the shot's own live pulse
    # blocks, below play_packed's union-subtile floor --------------------
    from waveforms_tpu.core import WaveVStack
    from waveforms_tpu.ops import StackSequencer

    def bare_train(n_gates):
        offs = 0.2e-6 + np.arange(n_gates) * 0.1e-6
        return [WaveVStack([0.5 * cosPulse(20e-9) >> float(o)
                            for o in offs])]

    lows2 = [lower_schedule(bare_train(int(rng.integers(2, 12))),
                            0, span, fs) for _ in range(K)]
    sseq = StackSequencer(lows2)
    print("stack table:", sseq.describe())
    sout = np.asarray(sseq.play_packed(shots[:8], interpret=interpret))
    ref0 = np.asarray(sseq.play(int(shots[0]), interpret=interpret))
    assert np.allclose(sout[0], ref0), "stacked playback must match play"
    codes = np.asarray(sseq.play_packed(shots[:8], interpret=interpret,
                                        out_dtype=jax.numpy.int16))
    print(f"play_packed (stack): {sout.shape[0]} shots in one launch; "
          f"int16 codes {codes.shape} {codes.dtype}")


if __name__ == '__main__':
    main()

"""Compiled-HLO audits of the sharded production step (VERDICT r5 #6).

The memory story of the ('channel', 'time') mesh rests on the time axis
STAYING distributed through the IIR pre-compensation: the associative
scan's carry must cross shard boundaries as boundary collectives
(collective-permute / all-to-all over ICI), never as an all-gather of
the full (C, N) signal -- a silent all-gather would erase the 1/P
per-device memory scaling the dryrun prints.  These tests pin that
contract in the compiled HLO itself (SURVEY §2.4 "carry crossing shard
boundaries over ICI").
"""

import re
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from waveforms_tpu.distortion import combine_filters, exp_decay_filter
from waveforms_tpu.ops.iir import lfilter
from waveforms_tpu.parallel.mesh import channel_mesh

FS = 2e9


def _collective_counts(txt):
    # match async pairs too: post-optimization HLO on TPU (and CPU with
    # async collectives) spells these 'all-gather-start(' /
    # 'all-gather-done(' -- counting only sync spellings would let an
    # async all-gather slip past the == 0 guard.  -done is folded into
    # the -start count (one logical collective).
    return Counter(re.findall(
        r'\b(all-gather|all-reduce|collective-permute|reduce-scatter|'
        r'all-to-all)(?:-start)?\(', txt))


@pytest.fixture(scope='module')
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    return channel_mesh(n_channel=4, n_time=2)


def test_sharded_iir_carry_no_signal_allgather(mesh):
    C, N = 8, 16384
    sig = jax.device_put(jnp.zeros((C, N), jnp.float32),
                         NamedSharding(mesh, P('channel', 'time')))
    b, a = combine_filters([exp_decay_filter(0.02, 3e-6, FS, inv=True)])
    b = jnp.asarray(b, jnp.float32)
    a = jnp.asarray(a, jnp.float32)

    def apply(sig):
        return jax.vmap(lambda x: lfilter(b, a, x))(sig)

    txt = jax.jit(apply).lower(sig).compile().as_text()
    counts = _collective_counts(txt)
    assert counts.get('all-gather', 0) == 0, counts
    # the scan carry really does cross the time-shard boundary as
    # boundary collectives (a replicated/serial plan would have none)
    assert counts.get('collective-permute', 0) \
        + counts.get('all-to-all', 0) > 0, counts
    # and the output keeps the input's distributed sharding
    out = jax.jit(apply)(sig)
    assert out.sharding.spec == P('channel', 'time')


def test_sharded_iir_matches_host_scipy(mesh):
    # the audited plan must also be CORRECT: distributed scan == scipy
    from scipy.signal import lfilter as sp_lfilter
    rng = np.random.default_rng(11)
    C, N = 8, 16384
    x = rng.standard_normal((C, N)).astype(np.float32)
    b, a = combine_filters([exp_decay_filter(0.02, 3e-6, FS, inv=True)])
    want = sp_lfilter(b, a, x.astype(np.float64), axis=-1)
    bj = jnp.asarray(b, jnp.float32)
    aj = jnp.asarray(a, jnp.float32)
    sig = jax.device_put(jnp.asarray(x),
                         NamedSharding(mesh, P('channel', 'time')))
    got = np.asarray(jax.jit(
        lambda s: jax.vmap(lambda r: lfilter(bj, aj, r))(s))(sig))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 5e-5


def test_demod_psum_is_reduce_not_gather(mesh):
    # MXU demodulation over the sharded sample axis: the tone reduction
    # must ride a psum (all-reduce / reduce-scatter), not gather the
    # signal
    from waveforms_tpu.ops.demod import demod_matrix, demodulate
    C, N = 8, 16384
    sig = jax.device_put(jnp.zeros((C, N), jnp.float32),
                         NamedSharding(mesh, P('channel', 'time')))
    m = jax.device_put(demod_matrix([50e6, 80e6], N, FS),
                       NamedSharding(mesh, P('time', None)))
    txt = jax.jit(demodulate).lower(sig, m).compile().as_text()
    counts = _collective_counts(txt)
    assert counts.get('all-gather', 0) == 0, counts
    assert counts.get('all-reduce', 0) \
        + counts.get('reduce-scatter', 0) > 0, counts

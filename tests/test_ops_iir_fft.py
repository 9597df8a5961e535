"""Device IIR (associative-scan) and FFT pipelines vs scipy references."""

import numpy as np
import scipy.signal as sps

import jax.numpy as jnp

from waveforms_tpu.distortion import exp_decay_filter, predistort
from waveforms_tpu.ops.fft import (correct_reflection_jax,
                                   fft_convolve_centered, reflection_jax)
from waveforms_tpu.ops.iir import lfilter, predistort_jax, sosfilt


def test_sosfilt_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096)
    sos = sps.butter(4, 0.1, output='sos')
    ref = sps.sosfilt(sos, x)
    got = np.asarray(sosfilt(jnp.asarray(sos), jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)


def test_sosfilt_zi_streaming():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(2048)
    sos = sps.butter(3, 0.2, output='sos')
    whole = np.asarray(sosfilt(jnp.asarray(sos), jnp.asarray(x)))
    a, zf = sosfilt(jnp.asarray(sos), jnp.asarray(x[:1000]),
                    zi=jnp.zeros((sos.shape[0], 2)))
    b, _ = sosfilt(jnp.asarray(sos), jnp.asarray(x[1000:]), zi=zf)
    np.testing.assert_allclose(np.concatenate([np.asarray(a),
                                               np.asarray(b)]), whole,
                               rtol=1e-9, atol=1e-12)


def test_lfilter_matches_scipy():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(4096)
    b, a = sps.butter(5, 0.15)
    ref = sps.lfilter(b, a, x)
    got = np.asarray(lfilter(b, a, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-10)


def test_lfilter_zi_matches_scipy():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(1024)
    b, a = sps.butter(2, 0.3)
    zi = sps.lfiltic(b, a, [0.7], [0.7])
    ref, ref_zf = sps.lfilter(b, a, x, zi=zi)
    got, got_zf = lfilter(b, a, jnp.asarray(x), zi=jnp.asarray(zi))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got_zf), ref_zf, rtol=1e-8,
                               atol=1e-10)


def test_predistort_jax_matches_host():
    fs = 2e9
    filters = [exp_decay_filter(0.05, 100e-9, fs, inv=True)]
    sig = np.zeros(2048)
    sig[500:1500] = 1.0
    ker = sps.windows.hann(31)
    ker /= ker.sum()

    host = predistort(sig, filters, ker=ker)
    dev = np.asarray(predistort_jax(jnp.asarray(sig), filters, ker=ker))
    np.testing.assert_allclose(dev, host, rtol=1e-8, atol=1e-10)


def test_fft_convolve_centered_matches_scipy():
    rng = np.random.default_rng(4)
    sig = rng.standard_normal(1000)
    ker = rng.standard_normal(33)
    size = len(sig)
    padded = np.hstack([np.zeros_like(sig), sig, np.zeros_like(sig)])
    start = size + len(ker) // 2
    ref = sps.fftconvolve(padded, ker, mode='full')[start:start + size]
    got = np.asarray(fft_convolve_centered(jnp.asarray(sig),
                                           jnp.asarray(ker)))
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-10)


def test_reflection_roundtrip_device():
    fs = 2e9
    sig = np.zeros(4096)
    sig[1000:2000] = 1.0
    out = reflection_jax(jnp.asarray(sig), 0.2, 5e-9, fs)
    back = correct_reflection_jax(out, 0.2, 5e-9, fs)
    np.testing.assert_allclose(np.asarray(back), sig, atol=1e-9)


def test_lfilter_high_order_long_signal_matches_scipy():
    """d>=3 multi-exponential precompensation over 1M samples: clustered
    near-unit poles make the doubling scan numerically divergent, so
    lfilter must route to the exact sequential form and track scipy
    without materializing (n, d, d) maps (round-2 review finding)."""
    from waveforms_tpu.distortion import exp_decay_filter
    b, a = exp_decay_filter([0.02, 0.008, 0.004], [2e-6, 9e-6, 30e-6], 2e9,
                            output='ba')
    assert max(len(a), len(b)) - 1 >= 3
    n = 1_000_000
    t = np.arange(n)
    sig = np.sin(t * 0.37e-3) + 0.2 * (t % 50000 < 12000)
    want = sps.lfilter(b, a, sig)
    got = np.asarray(lfilter(b, a, jnp.asarray(sig)))
    scale = np.abs(want).max()
    # NB: ~1e-6 is the (b, a) DIRECT FORM's own conditioning limit here,
    # not an implementation gap: the internal DF2T states amplify to
    # ~1/(1-lambda)^3 ~ 1e10, so any two f64 direct-form realizations
    # (scipy's C loop included) differ at eps * that.  The well-
    # conditioned production path is filter_zpk below.
    assert np.abs(got - want).max() / scale < 1e-5


def test_filter_zpk_parallel_cascade_matches_sos_reference():
    """The PARALLEL device path for clustered-pole filters: factored-form
    cascade vs scipy's sosfilt on the same zpk (both stable realizations
    of the same transfer function)."""
    from waveforms_tpu.distortion import exp_decay_filter
    from waveforms_tpu.ops.iir import filter_zpk
    z, p, k = exp_decay_filter([0.02, 0.008, 0.004], [2e-6, 9e-6, 30e-6],
                               2e9, output='zpk')
    n = 1_000_000
    t = np.arange(n)
    sig = np.sin(t * 0.37e-3) + 0.2 * (t % 50000 < 12000)
    want = sps.sosfilt(sps.zpk2sos(z, p, k), sig)
    got = np.asarray(filter_zpk(z, p, k, jnp.asarray(sig)))
    scale = np.abs(want).max()
    # two independent stable realizations of the same zpk agree to ~5e-9
    assert np.abs(got - want).max() / scale < 2e-8


def test_filter_zpk_complex_poles():
    """Complex-conjugate pole pairs run as complex AR1 scans."""
    from waveforms_tpu.ops.iir import filter_zpk
    z, p, k = sps.butter(4, 0.12, output='zpk')
    rng = np.random.default_rng(11)
    sig = rng.standard_normal(50_000)
    want = sps.sosfilt(sps.zpk2sos(z, p, k), sig)
    got = np.asarray(filter_zpk(z, p, k, jnp.asarray(sig)))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-9


def test_sharded_fft_roundtrip_and_convolution():
    """Four-step distributed FFT over an 8-shard virtual mesh: forward/
    inverse round trip and circular convolution vs numpy (SURVEY 2.4:
    sample-axis FFT sharded over the mesh, all_to_all transposes)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS
    import functools

    from waveforms_tpu.ops.fft_sharded import (fft_convolve_sharded,
                                               fft_sharded, ifft_sharded)

    devs = np.array(jax.devices()[:8])
    if len(devs) < 8:
        pytest.skip('needs 8 virtual devices')
    mesh = Mesh(devs, ('time',))
    rng = np.random.default_rng(3)
    N = 8 * 8 * 64
    x = rng.standard_normal(N)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=PS('time'),
                       out_specs=PS('time'))
    def fwd_bwd(xl):
        X = fft_sharded(xl.astype(jnp.complex64), 'time')
        return ifft_sharded(X, 'time').real

    xs = jax.device_put(jnp.asarray(x, jnp.float32),
                        NamedSharding(mesh, PS('time')))
    back = np.asarray(fwd_bwd(xs))
    np.testing.assert_allclose(back, x, atol=1e-4)

    # spectrum correctness: gather the strided shards and compare to np.fft
    @functools.partial(jax.shard_map, mesh=mesh, in_specs=PS('time'),
                       out_specs=PS('time'))
    def fwd(xl):
        return fft_sharded(xl.astype(jnp.complex64), 'time')

    Xs = np.asarray(fwd(xs))          # concatenated strided blocks
    P, L = 8, N // 8
    X = np.empty(N, complex)
    for p in range(P):
        X[p::P] = Xs[p * L:(p + 1) * L]
    ref = np.fft.fft(x)
    np.testing.assert_allclose(X, ref, atol=1e-2 * np.abs(ref).max() / 1e3)

    ker = rng.standard_normal(33)
    got = np.asarray(fft_convolve_sharded(jnp.asarray(x, jnp.float32),
                                          ker, mesh))
    want = np.fft.ifft(np.fft.fft(x) * np.fft.fft(ker, n=N)).real
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_sharded_fft_convolution_f64_precision():
    """f64 signals keep double precision through the distributed FFT
    (the x64 tier; complex64 would cap deconvolution at ~1e-3)."""
    import functools
    import jax
    from jax.sharding import Mesh

    from waveforms_tpu.ops.fft_sharded import fft_convolve_sharded

    devs = np.array(jax.devices()[:8])
    if len(devs) < 8:
        pytest.skip('needs 8 virtual devices')
    mesh = Mesh(devs, ('time',))
    rng = np.random.default_rng(7)
    N = 8 * 8 * 32
    x = rng.standard_normal(N)
    ker = rng.standard_normal(17)
    got = np.asarray(fft_convolve_sharded(jnp.asarray(x, jnp.float64),
                                          ker, mesh))
    want = np.fft.ifft(np.fft.fft(x) * np.fft.fft(ker, n=N)).real
    assert np.abs(got - want).max() < 1e-10


def test_sosfilt_near_unit_double_pole_matches_scipy():
    """A biquad with a clustered near-unit double pole routes to the
    sequential fallback like lfilter does (round-4 review: the doubling
    scan diverges there, and the two entry points must agree)."""
    from scipy.signal import sosfilt as sp_sosfilt

    r = 1 - 1e-8
    # double pole at r: a = (1, -2r, r^2)
    sos = np.array([[1.0, 0.0, 0.0, 1.0, -2 * r, r * r]])
    from waveforms_tpu.ops import iir

    rng = np.random.default_rng(3)
    x = rng.standard_normal(200_000)
    got = np.asarray(iir.sosfilt(jnp.asarray(sos), jnp.asarray(x)))
    want = sp_sosfilt(sos, x)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 1e-9


def test_extract_kernel_jax_skip_matches_reference():
    """skip trims both kernel ends like the reference extractKernel."""
    from waveforms_tpu.ops.fft import extract_kernel_jax

    rng = np.random.default_rng(5)
    n = 256
    sig_out = rng.standard_normal(n)
    h = np.exp(-np.arange(8) / 3.0)
    sig_in = np.convolve(sig_out, h)[:n]
    full = np.asarray(extract_kernel_jax(sig_in, sig_out, 1e9))
    trimmed = np.asarray(extract_kernel_jax(sig_in, sig_out, 1e9, skip=10))
    np.testing.assert_allclose(trimmed, full[10:-10], rtol=1e-12)


def test_fft_convolve_sharded_centered_alignment():
    """centered=True treats the kernel's zero-lag as its center tap (the
    extract_kernel_jax convention); without it such kernels shift the
    output by half the kernel length (round-4 review finding)."""
    import jax
    from jax.sharding import Mesh

    from waveforms_tpu.ops.fft_sharded import fft_convolve_sharded

    if len(jax.devices()) < 4:
        pytest.skip('needs 4 virtual devices')
    mesh = Mesh(np.array(jax.devices()[:4]), ('time',))
    n = 1024
    rng = np.random.default_rng(2)
    sig = jnp.asarray(rng.standard_normal(n))
    K = 33
    ker = np.zeros(K)
    ker[K // 2] = 1.0                         # centered identity kernel
    out = np.asarray(fft_convolve_sharded(sig, ker, mesh, centered=True))
    np.testing.assert_allclose(out, np.asarray(sig), atol=1e-4)

"""Physics property test for multi-tone DRAG (mirrors the reference's).

Build the complex I - jQ pulse with randomized blocking frequencies, project
onto a 21-point frequency comb around each blocked transition, and assert the
spectral minimum lands exactly on the center bin -- i.e. the pulse really
notches out every blocked frequency.
"""

import numpy as np

from waveforms_tpu.models.multy_drag import drag_sin, drag_sinx


def test_drag_sin():
    t0 = 0e-9
    freq = 5e9
    width = 22.22e-9
    np.random.seed(1234)
    delta = np.random.random() * 9.5e6 - 19e6
    plateau = 0
    block_freq = tuple(
        np.concatenate(
            (np.random.random([np.random.randint(4) + 1]) * 100e6 + 20e6,
             -np.random.random([np.random.randint(4) + 1]) * 100e6 - 20e6)))
    I = drag_sin(freq, width, plateau, delta, block_freq, 0, t0)
    Q = drag_sin(freq, width, plateau, delta, block_freq, -np.pi / 2, t0)
    wav = I - 1j * Q
    ttt = np.linspace(t0 - (width + plateau) * 10,
                      t0 + (width + plateau) * 11, 1000001)
    for bq in block_freq:
        freq_list = (freq + np.linspace(-0.02e6, 0.02e6, 21) + bq).reshape(
            [1, -1])
        ff = np.exp(-2j * np.pi * freq_list * (ttt.reshape([-1, 1])))
        assert np.argmin(np.abs(wav(ttt) @ ff)) == 10

    block_freq = np.random.random() * 100e6 + 20e6

    I = drag_sin(freq, width, plateau, delta, block_freq, 0, t0)
    Q = drag_sin(freq, width, plateau, delta, block_freq, -np.pi / 2, t0)
    wav = I - 1j * Q
    ttt = np.linspace(t0 - (width + plateau) * 10,
                      t0 + (width + plateau) * 11, 1000001)
    bq = block_freq
    freq_list = (freq + np.linspace(-0.02e6, 0.02e6, 21) + bq).reshape(
        [1, -1])
    ff = np.exp(-2j * np.pi * freq_list * (ttt.reshape([-1, 1])))
    assert np.argmin(np.abs(wav(ttt) @ ff)) == 10


def test_drag_sinx():
    t0 = 0e-9
    freq = 5e9
    width = 22.22e-9
    np.random.seed(1234)
    delta = np.random.random() * 9.5e6 - 19e6
    plateau = 0
    block_freq = tuple(
        np.concatenate(
            (np.random.random([np.random.randint(4) + 1]) * 100e6 + 20e6,
             -np.random.random([np.random.randint(4) + 1]) * 100e6 - 20e6)))
    tab = np.random.random() * 0.8 + 0.2
    I = drag_sinx(freq, width, plateau, delta, block_freq, 0, t0, tab)
    Q = drag_sinx(freq, width, plateau, delta, block_freq, -np.pi / 2, t0,
                  tab)
    wav = I - 1j * Q
    ttt = np.linspace(t0 - (width + plateau) * 10,
                      t0 + (width + plateau) * 11, 1000001)
    for bq in block_freq:
        freq_list = (freq + np.linspace(-0.02e6, 0.02e6, 21) + bq).reshape(
            [1, -1])
        ff = np.exp(-2j * np.pi * freq_list * (ttt.reshape([-1, 1])))
        assert np.argmin(np.abs(wav(ttt) @ ff)) == 10

    block_freq = np.random.random() * 100e6 + 20e6

    I = drag_sinx(freq, width, plateau, delta, block_freq, 0, t0, tab)
    Q = drag_sinx(freq, width, plateau, delta, block_freq, -np.pi / 2, t0,
                  tab)
    wav = I - 1j * Q
    ttt = np.linspace(t0 - (width + plateau) * 10,
                      t0 + (width + plateau) * 11, 1000001)
    bq = block_freq
    freq_list = (freq + np.linspace(-0.02e6, 0.02e6, 21) + bq).reshape(
        [1, -1])
    ff = np.exp(-2j * np.pi * freq_list * (ttt.reshape([-1, 1])))
    assert np.argmin(np.abs(wav(ttt) @ ff)) == 10


def test_drag_sin_plateau_serialization():
    w = drag_sin(5e9, 20e-9, plateau=10e-9, delta=1e6,
                 block_freq=(100e6,), phase=0.1)
    # round-trips through the flat-list wire format
    from waveforms_tpu import Waveform
    l = w.tolist()
    w2 = Waveform.fromlist(l)
    t = np.linspace(0, 40e-9, 2001)
    assert np.allclose(w(t), w2(t))

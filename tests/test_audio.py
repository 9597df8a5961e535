"""Audio playback paths, exercised against a stub pyaudio backend.

pyaudio isn't installed in CI; a recording stub lets the tests drive the
real streaming/normalization logic end-to-end (chunked sampling, running
peak attenuation, int16 conversion, stream teardown).
"""

import sys
import types

import numpy as np
import pytest


class _StubStream:
    def __init__(self, log):
        self.log = log

    def write(self, data):
        self.log['chunks'].append(np.frombuffer(data, dtype=np.int16))

    def stop_stream(self):
        self.log['stopped'] = True

    def close(self):
        self.log['closed'] = True


class _StubPyAudio:
    paInt16 = 8

    def __init__(self, log):
        self.log = log

    def PyAudio(self):
        return self

    def open(self, **kw):
        self.log['open_kw'] = kw
        return _StubStream(self.log)

    def terminate(self):
        self.log['terminated'] = True


@pytest.fixture
def stub_audio(monkeypatch):
    log = {'chunks': []}
    stub = _StubPyAudio(log)
    mod = types.SimpleNamespace(PyAudio=lambda: stub, paInt16=8)
    monkeypatch.setitem(sys.modules, 'pyaudio', mod)
    return log


def test_waveform_play_streams_and_attenuates(stub_audio):
    from waveforms_tpu import cos

    # amplitude 3 would wrap int16 at full scale; the running peak tracker
    # must attenuate so nothing clips
    w = 3.0 * cos(2 * np.pi * 200.0)
    w.start, w.stop = 0.0, 0.25
    w._play(time_unit=1, volume=1.0)

    log = stub_audio
    assert log['open_kw']['rate'] == 48000 and log['open_kw']['channels'] == 1
    assert log['stopped'] and log['closed'] and log['terminated']
    samples = np.concatenate(log['chunks'])
    assert len(samples) == round(0.25 * 48000)
    peak = np.abs(samples.astype(np.int64)).max()
    assert peak <= 32767                       # never wraps
    assert peak > 0.9 * (2**15 * 0.99 / 3.0)   # and actually plays signal


def test_module_play_normalizes_buffer(stub_audio):
    from waveforms_tpu.core import play

    t = np.linspace(0, 1, 4801)
    play(np.sin(2 * np.pi * 100 * t) * 5.0, rate=4800)

    samples = np.concatenate(stub_audio['chunks'])
    assert len(samples) == len(t)
    peak = np.abs(samples.astype(np.int64)).max()
    assert 0.95 * 2**15 * 0.999 <= peak <= 32767   # normalized to full scale

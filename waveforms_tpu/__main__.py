"""CLI: ``python -m waveforms_tpu sample "cosPulse(20)" out.npy``.

Mirrors the reference console script (``/root/reference/waveforms/
__main__.py``) with an extra ``--engine`` flag selecting host-oracle or TPU
synthesis.
"""

import click


@click.group()
def main():
    pass


@main.command()
@click.option('--sample-rate', '-S', default=44100, help='Sample rate in Hz')
@click.option('--start', '-a', default=0, help='Start time in seconds')
@click.option('--duration', '-l', default=-1, help='Duration in seconds')
@click.option('--stop', '-b', default=1, help='Stop time in seconds')
@click.option('--amplitude', '-A', default=1, help='Amplitude')
@click.option('--engine', default='numpy',
              type=click.Choice(['numpy', 'jax']),
              help='Synthesis engine: host oracle or XLA/TPU')
@click.argument('waveform', type=str)
@click.argument('output', type=click.Path(exists=False))
def sample(sample_rate, start, duration, stop, amplitude, waveform, output,
           engine):
    """Sample a waveform expression to a .npy file."""
    import numpy as np

    from . import wave_eval

    wav = wave_eval(waveform)
    wav.start = start
    if duration > 0 and stop == 1:
        stop = start + duration
    wav.stop = stop
    wav.sample_rate = sample_rate
    if engine == 'jax':
        from .ops import sample_waveform
        points = np.asarray(sample_waveform(wav))
    else:
        points = wav.sample()
    np.save(output, points * amplitude)


if __name__ == '__main__':
    main()

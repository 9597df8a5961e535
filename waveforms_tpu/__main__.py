"""CLI entry point: ``python -m waveforms_tpu sample "cosPulse(20)" out.npy``.

Behavior-compatible with the reference console script
(``/root/reference/waveforms/__main__.py:4-35``), including its quirks:
click infers INT for ``-a/-b/-l/-A`` from the integer defaults, and
``--duration`` only takes effect while ``--stop`` still has its default
value.  Adds an ``--engine`` flag selecting the host oracle or the XLA/TPU
path.
"""

import click

_SAMPLE_OPTIONS = (
    ('--sample-rate', '-S', 44100, 'Sample rate in Hz'),
    ('--start', '-a', 0, 'Start time in seconds'),
    ('--duration', '-l', -1, 'Duration in seconds'),
    ('--stop', '-b', 1, 'Stop time in seconds'),
    ('--amplitude', '-A', 1, 'Amplitude'),
)


def _resolve_window(wav, start, duration, stop, sample_rate):
    # reference quirk: duration applies only when stop is untouched (== 1)
    wav.start = start
    wav.stop = start + duration if (duration > 0 and stop == 1) else stop
    wav.sample_rate = sample_rate
    return wav


def _synthesize(wav, engine):
    if engine == 'jax':
        import numpy as np

        from .ops import sample_waveform
        return np.asarray(sample_waveform(wav))
    if engine != 'numpy':
        import numpy as np

        from .engine import synthesize
        return np.asarray(synthesize([wav], wav.start, wav.stop,
                                     wav.sample_rate, engine=engine))[0]
    return wav.sample()


@click.group()
def main():
    """waveforms_tpu command line."""


def _sample_impl(sample_rate, start, duration, stop, amplitude, waveform,
                 output, engine, dtype, dac_scale):
    import numpy as np

    from . import wave_eval

    wav = _resolve_window(wave_eval(waveform), start, duration, stop,
                          sample_rate)
    if dtype == 'float64':
        # device engines return f32 jax arrays; honor the selected dtype
        np.save(output, np.asarray(_synthesize(wav, engine),
                                   dtype=np.float64) * amplitude)
        return
    # narrowed outputs go through the unified engine entry (in-kernel
    # quantize on the pallas routes); the amplitude folds into the DAC
    # scale for int16 so codes round once
    import jax.numpy as jnp

    from .engine import synthesize
    od = {'float32': jnp.float32, 'int16': jnp.int16}[dtype]
    out = synthesize([wav], wav.start, wav.stop, wav.sample_rate,
                     engine={'jax': 'xla'}.get(engine, engine),
                     out_dtype=od, dac_scale=dac_scale * amplitude)[0]
    out = np.asarray(out)
    if dtype == 'float32':
        out = out.astype(np.float32) * np.float32(amplitude)
    np.save(output, out)


def _build_sample_command():
    cmd = _sample_impl
    cmd = click.argument('output', type=click.Path(exists=False))(cmd)
    cmd = click.argument('waveform', type=str)(cmd)
    cmd = click.option('--dac-scale', default=32767.0, type=float,
                       help='Full-scale code for --dtype int16')(cmd)
    cmd = click.option('--dtype', default='float64',
                       type=click.Choice(['float64', 'float32', 'int16']),
                       help='Output dtype: float64 (reference behavior), '
                            'float32, or int16 DAC codes')(cmd)
    cmd = click.option('--engine', default='numpy',
                       type=click.Choice(['numpy', 'jax', 'auto',
                                          'pallas', 'pallas-panel',
                                          'pallas-sparse', 'pallas-dense',
                                          'pallas-stack', 'xla',
                                          'native']),
                       help='Synthesis engine: host oracle, XLA trace, '
                            'the fused TPU kernels (auto picks the best '
                            'route), or the C++ host engine')(cmd)
    for flag, short, default, helptext in reversed(_SAMPLE_OPTIONS):
        cmd = click.option(flag, short, default=default, help=helptext)(cmd)
    return main.command('sample')(cmd)


sample = _build_sample_command()


if __name__ == '__main__':
    main()

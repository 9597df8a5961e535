"""On-chip measurement of the 1e-9 tier: the XLA x64 engine on TPU.

Run standalone (x64 is a process-global flag, so the capture harness
invokes this as a subprocess):

    python tools/x64_probe.py      # prints one JSON line
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax  # noqa: E402

jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from waveforms_tpu import cos, gaussian
    from waveforms_tpu.ops.jax_eval import evaluate
    from waveforms_tpu.utils.profiling import measure_device

    w = ((gaussian(100e-6) >> 50e-6) * cos(2 * np.pi * 137.137e6)).simplify()
    grid = np.arange(0, 100e-6, 5e-10)
    t64 = jnp.asarray(grid)
    f = jax.jit(lambda tt: evaluate(w, tt))
    out = np.asarray(f(t64))
    host = w(grid)
    rel = float(np.abs(out - host).max() / np.abs(host).max())
    med = measure_device(lambda: f(t64), 'jit')
    print(json.dumps({
        "backend": jax.default_backend(),
        "max_rel_err": rel, "ok": bool(rel < 1e-9),
        "device_ms": round(med * 1e3, 3),
        "gsps": round(len(grid) / med / 1e9, 3),
    }))


if __name__ == '__main__':
    main()

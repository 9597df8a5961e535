#!/usr/bin/env bash
# Release dry-run: build the native-bundled wheel, install it into a
# clean venv, and smoke it on a simulated TOOLCHAIN-LESS host (g++
# removed from PATH) so the wheel-bundled baseline accelerators -- not a
# fresh -march=native build -- are what executes.  The offline analog of
# the reference's publish pipeline
# (/root/reference/.github/workflows/workflow.yml:68-86); the CI twine
# gate covers metadata (.github/workflows/test.yml).
#
# Usage: bash tools/release_smoke.sh  (from the repo root)
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=$(mktemp -d)
PYVER=$(python -c 'import sys; print("%d.%d" % sys.version_info[:2])')

echo "== build (WFTPU_BUILD_NATIVE=1) =="
WFTPU_BUILD_NATIVE=1 python -m build --wheel --no-isolation -o "$OUT" \
    | tail -1
WHEEL=$(ls "$OUT"/waveforms_tpu-*.whl)

echo "== clean venv install =="
python -m venv "$OUT/venv" --without-pip
python -m pip install -q --no-deps \
    --target "$OUT/venv/lib/python$PYVER/site-packages" "$WHEEL"

echo "== smoke on a toolchain-less PATH (prebuilt .so must load) =="
mkdir -p "$OUT/slimbin"
ln -sf "$(command -v sh)" "$OUT/slimbin/sh"
DEPS=$(python -c 'import numpy, os; print(os.path.dirname(os.path.dirname(numpy.__file__)))')
cd "$OUT" && env -i PATH="$OUT/slimbin" "$OUT/venv/bin/python" - "$DEPS" <<'EOF'
import sys
sys.path.insert(0, sys.argv[1])        # host deps (numpy/scipy) only
import numpy as np
import waveforms_tpu.native as nat
from waveforms_tpu import engine, cosPulse, gaussian, cos, wave_eval

assert nat.available(), "prebuilt native accelerators failed to load"
w = cosPulse(0.5) + 0.2 * gaussian(0.3)
assert wave_eval("cosPulse(0.5) + 0.2*gaussian(0.3)") == w
t = np.arange(-1, 1, 1e-3)
assert w(t).shape == (2000,)
chans = [cosPulse(2e-7) * cos(2 * np.pi * 5e7)]
a = engine.synthesize(chans, 0.0, 1e-6, 2e9, engine='native')
b = engine.synthesize(chans, 0.0, 1e-6, 2e9, engine='numpy')
rel = float(np.abs(a - b).max() / np.abs(b).max())
assert rel < 1e-9, rel
print(f"RELEASE SMOKE OK: wheel installs clean, prebuilt native engine "
      f"parity {rel:.2e}")
EOF

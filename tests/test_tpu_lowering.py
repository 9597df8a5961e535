"""AOT Mosaic-lowering smoke: every Pallas kernel must lower for TPU.

The checks live in tools/check_tpu_lowering.py and run in ONE subprocess
with production dtypes (x64 off): under this conftest's x64 mode the
tracer of this jax build recurses without bound on ``convert_element_type``
of weak int64 scalars, and real TPU runs never enable x64 on the host
anyway.  The subprocess prints a JSON name -> status map; each test here
asserts its check's status so failures stay individually addressable.
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope='module')
def lowering_results():
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    env.pop('XLA_FLAGS', None)
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, 'tools',
                                      'check_tpu_lowering.py')],
        capture_output=True, text=True, timeout=900, env=env, cwd=_REPO)
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith('{')]
    assert lines, (
        f"lowering checker produced no JSON\nstdout: {proc.stdout[-2000:]}"
        f"\nstderr: {proc.stderr[-2000:]}")
    return json.loads(lines[-1])


@pytest.mark.parametrize('name', [
    'dense_fine_skip', 'dense_pair', 'dense_int16', 'sparse', 'panels',
    'hi_including_chirp', 'stack_including_ext', 'play_many'])
def test_kernel_lowers_for_tpu(lowering_results, name):
    assert name in lowering_results, (
        f"check {name} missing from tools/check_tpu_lowering.py")
    assert lowering_results[name] == 'ok', lowering_results[name]

"""Multi-process mesh validation.

The rest of the suite exercises SPMD logic on a single-process virtual
8-device mesh; this test proves the *multi-process* story -- distributed
initialization, global arrays assembled across processes, and collectives
that really cross process boundaries (Gloo on CPU) -- by running
tools/multiproc_smoke.py: 2 OS processes x 4 virtual devices = one global
('channel', 'time') mesh running the sharded synthesis + demodulation step.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_smoke():
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)          # workers set their own device count
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'multiproc_smoke.py')],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420)
    assert res.returncode == 0, res.stdout + res.stderr
    assert 'MULTIPROC OK' in res.stdout
    assert res.stdout.count(': mean=') >= 1   # at least one worker reported

"""Run the reference library's own test suite against waveforms_tpu.

The reference tests import ``waveforms`` / ``waveforms.waveform`` /
``waveforms.multy_drag`` / ``waveforms._waveform``; this harness aliases
those module names onto our packages and executes the reference's test
functions unmodified (loaded from the read-only mount at run time -- no
reference code is copied into this repository).  Skips when the reference
checkout is absent.
"""

import sys
import types
from pathlib import Path

import pytest

REF_TESTS = Path("/root/reference/tests")

pytestmark = pytest.mark.skipif(not REF_TESTS.exists(),
                                reason="reference checkout not mounted")


def _install_aliases():
    import waveforms_tpu
    from waveforms_tpu import core as _core
    from waveforms_tpu import ir
    from waveforms_tpu.ir import algebra, piecewise
    from waveforms_tpu.models import multy_drag as _md
    from waveforms_tpu.models import shapes as _shapes

    wf = types.ModuleType("waveforms")
    wf.__dict__.update(waveforms_tpu.__dict__)

    wf_waveform = types.ModuleType("waveforms.waveform")
    wf_waveform.__dict__.update(_shapes.__dict__)
    wf_waveform.__dict__.update(_core.__dict__)
    from waveforms_tpu.models.mixing import D, mixing
    wf_waveform.D = D
    wf_waveform.mixing = mixing
    wf_waveform.WaveVStack = _core.WaveVStack
    wf_waveform.Waveform = _core.Waveform

    wf_md = types.ModuleType("waveforms.multy_drag")
    wf_md.__dict__.update(_md.__dict__)

    wf_ir = types.ModuleType("waveforms._waveform")
    wf_ir.__dict__.update(algebra.__dict__)
    wf_ir.wave_sum = piecewise.wave_sum
    wf_ir.merge_waveform = piecewise.merge_piecewise
    wf_ir.calc_parts = piecewise.calc_parts
    wf_ir._zero = algebra.ZERO

    sys.modules.setdefault("waveforms", wf)
    sys.modules.setdefault("waveforms.waveform", wf_waveform)
    sys.modules.setdefault("waveforms.multy_drag", wf_md)
    sys.modules.setdefault("waveforms._waveform", wf_ir)
    wf.waveform = wf_waveform
    wf.multy_drag = wf_md
    wf._waveform = wf_ir


def _load_reference_tests(fname: str) -> dict:
    _install_aliases()
    src = (REF_TESTS / fname).read_text()
    namespace: dict = {"__name__": f"ref_{fname[:-3]}"}
    exec(compile(src, str(REF_TESTS / fname), "exec"), namespace)
    return {k: v for k, v in namespace.items()
            if k.startswith("test_") and callable(v)}


@pytest.mark.parametrize("name", sorted(_load_reference_tests(
    "test_waveform.py")) if REF_TESTS.exists() else [])
def test_reference_waveform(name):
    _load_reference_tests("test_waveform.py")[name]()


@pytest.mark.parametrize("name", sorted(_load_reference_tests(
    "test_wavevstack.py")) if REF_TESTS.exists() else [])
def test_reference_wavevstack(name):
    _load_reference_tests("test_wavevstack.py")[name]()


@pytest.mark.parametrize("name", sorted(_load_reference_tests(
    "test_multi_drag.py")) if REF_TESTS.exists() else [])
def test_reference_multi_drag(name):
    _load_reference_tests("test_multi_drag.py")[name]()

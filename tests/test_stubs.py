"""Type-stub coverage for the scripting surface (round 4).

The reference ships ``_waveform.pyi`` for its tuple-IR core; here the
surfaces a lab integrator scripts against -- core, engine, ir/algebra,
ir/registry, ops/lowering, ops/sequencer, parallel/mesh -- each carry a
stub.  This test cross-checks every public stub name against the runtime
module (a stale stub fails), and runs mypy over examples/ when mypy is
installed (it is not baked into the CI-less dev image; the GitHub matrix
runs it).
"""

import ast
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent

PAIRS = [
    ('waveforms_tpu/core.pyi', 'waveforms_tpu.core'),
    ('waveforms_tpu/engine.pyi', 'waveforms_tpu.engine'),
    ('waveforms_tpu/ir/algebra.pyi', 'waveforms_tpu.ir.algebra'),
    ('waveforms_tpu/ir/registry.pyi', 'waveforms_tpu.ir.registry'),
    ('waveforms_tpu/ops/lowering.pyi', 'waveforms_tpu.ops.lowering'),
    ('waveforms_tpu/parallel/mesh.pyi', 'waveforms_tpu.parallel.mesh'),
    ('waveforms_tpu/ops/sequencer.pyi', 'waveforms_tpu.ops.sequencer'),
]

# stub-only type aliases (no runtime counterpart by design)
ALIAS_OK = {'Factor', 'Term', 'Expr', 'Bounds', 'Seq', 'FunctionLib'}


@pytest.mark.parametrize('stub,modname', PAIRS)
def test_stub_names_exist_at_runtime(stub, modname):
    import importlib
    tree = ast.parse((ROOT / stub).read_text())
    mod = importlib.import_module(modname)
    missing = []
    for node in tree.body:
        names = []
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
            names = [node.name]
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target,
                                                            ast.Name):
            names = [node.target.id]
        for n in names:
            if n.startswith('_') or n in ALIAS_OK:
                continue
            if not hasattr(mod, n):
                missing.append(n)
    assert not missing, f"{stub} declares names absent at runtime: {missing}"


def test_stub_methods_exist_at_runtime():
    import importlib
    for stub, modname in PAIRS:
        tree = ast.parse((ROOT / stub).read_text())
        mod = importlib.import_module(modname)
        for node in tree.body:
            if not isinstance(node, ast.ClassDef):
                continue
            if not hasattr(mod, node.name):
                continue
            cls = getattr(mod, node.name)
            for sub in node.body:
                if (isinstance(sub, ast.FunctionDef)
                        and not sub.name.startswith('_')):
                    assert hasattr(cls, sub.name), (
                        f"{stub}: {node.name}.{sub.name} missing")


def test_examples_typecheck_with_mypy_if_available():
    try:
        import mypy  # noqa: F401
    except ImportError:
        pytest.skip('mypy not installed in this image')
    out = subprocess.run(
        [sys.executable, '-m', 'mypy', '--ignore-missing-imports',
         str(ROOT / 'examples')],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr

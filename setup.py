"""Build hook: optional prebuilt native accelerators inside wheels.

The package is pure Python; the two C++ accelerators (wavecore ctypes
engine, lowerext CPython lowering walker) normally compile on first use
with the host's g++ at -march=native (fastest).  For toolchain-less
deploy hosts, wheels built with ``WFTPU_BUILD_NATIVE=1`` (the
cibuildwheel pipeline, .github/workflows/test.yml) bundle
baseline-architecture builds -- ``_wavecore_prebuilt.so`` (ABI-free) and
``_lowerext_prebuilt.so`` (CPython-ABI, hence per-python wheels).  The
loader prefers a fresh -march=native build and falls back to the bundled
libraries (waveforms_tpu/native/__init__.py).

Analog of the reference's cibuildwheel manylinux pipeline
(/root/reference/.github/workflows/workflow.yml:68-86), adapted to the
optional-accelerator design: a missing toolchain degrades to numpy, it
never breaks install.
"""

import os
import subprocess
import sysconfig

from setuptools import setup
from setuptools.command.build_py import build_py

try:
    from setuptools.command.bdist_wheel import bdist_wheel as _bdist_wheel
except ImportError:                                  # older setuptools
    from wheel.bdist_wheel import bdist_wheel as _bdist_wheel


class bdist_wheel_native(_bdist_wheel):
    """Platform-tag wheels that bundle the native accelerators (the
    lowerext CPython extension is ABI-specific)."""

    def finalize_options(self):
        super().finalize_options()
        if os.environ.get('WFTPU_BUILD_NATIVE') == '1':
            self.root_is_pure = False


class build_py_native(build_py):
    def run(self):
        super().run()
        if os.environ.get('WFTPU_BUILD_NATIVE') != '1':
            return
        pkg = os.path.join(self.build_lib, 'waveforms_tpu', 'native')
        src_pkg = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'waveforms_tpu', 'native')
        # portable flags: no -march=native in shipped binaries
        subprocess.run(
            ['g++', '-O3', '-ffast-math', '-fopenmp', '-fPIC', '-c',
             os.path.join(src_pkg, 'wavecore.cpp'),
             '-o', os.path.join(pkg, '_wavecore_prebuilt.o')],
            check=True)
        subprocess.run(
            ['g++', '-shared', '-fopenmp',
             '-o', os.path.join(pkg, '_wavecore_prebuilt.so'),
             os.path.join(pkg, '_wavecore_prebuilt.o'), '-lm'],
            check=True)
        os.unlink(os.path.join(pkg, '_wavecore_prebuilt.o'))
        inc = sysconfig.get_paths()['include']
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', f'-I{inc}',
             os.path.join(src_pkg, 'lowerext.cpp'),
             '-o', os.path.join(pkg, '_lowerext_prebuilt.so')],
            check=True)


setup(cmdclass={'build_py': build_py_native,
                'bdist_wheel': bdist_wheel_native})

"""Builds and runs the native C-ABI edge-case suite (csrc/test_abi.cpp).

Counterpart of the reference's gtest job (reference
``.github/workflows/cpp_testing.yml:16-70``, ``cmake/test.cmake``):
exercises the raw ABI with adversarial sizes that ctypes callers cannot
reach through the validated Python wrappers.
"""

import os
import shutil
import subprocess

import pytest

CSRC = os.path.join(os.path.dirname(__file__), '..', 'pyg_lib_tpu', 'csrc')


@pytest.mark.skipif(shutil.which('make') is None or
                    shutil.which('g++') is None,
                    reason='native toolchain unavailable')
def test_native_abi_suite():
    r = subprocess.run(['make', '-s', 'test'], cwd=CSRC,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert 'ABI TESTS PASSED' in r.stdout

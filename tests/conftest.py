"""Test configuration: run on CPU with 8 simulated devices.

Mirrors the reference test strategy (SURVEY.md §4): golden-reference tests
against pure-numpy implementations; multi-device semantics validated on a
virtual 8-device CPU mesh before any real pod is involved.

Note: pytest plugins import jax before this file runs, so env vars are
already captured — use jax.config.update (works until backend init).
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

assert jax.default_backend() == 'cpu', 'tests must run on the CPU backend'

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

# Persistent compile cache for the suite: the pre-commit use case is
# REPEAT runs, where XLA:CPU compilation dominates wall time (round-4
# verdict: quick tier must be fast enough to gate every commit). First
# run populates .jax_test_cache/; later runs compile warm.
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), '.jax_test_cache'))
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

assert jax.default_backend() == 'cpu', 'tests must run on the CPU backend'

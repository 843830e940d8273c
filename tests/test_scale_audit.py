"""Scale-audit tier test: the 10M-node preprocessing chain stays inside
the 16 GB deployment budget (round-4 verdict task 7).

Runs bench/bench_scale_audit.py's 10M 'full' tier in a subprocess
(fresh ru_maxrss) and asserts completion + peak RSS. Skipped on hosts
without enough free memory to run the tier at all (CI runners have
~7 GB; the audit's own artifact SCALE_AUDIT.json records the dev-host
runs).
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _available_gb():
    try:
        with open('/proc/meminfo') as f:
            for line in f:
                if line.startswith('MemAvailable'):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0


@pytest.mark.skipif(_available_gb() < 20.0,
                    reason='needs ~16 GB free to exercise the 10M tier')
def test_10m_tier_fits_16gb():
    r = subprocess.run(
        [sys.executable,
         os.path.join(HERE, 'bench', 'bench_scale_audit.py'),
         '--child', '0'],
        capture_output=True, text=True, cwd=HERE, timeout=3600)
    lines = [ln for ln in (r.stdout or '').splitlines()
             if ln.startswith('{')]
    assert lines, f'audit child failed: {(r.stderr or "")[-500:]}'
    rec = json.loads(lines[-1])
    assert rec['nodes'] == 10_000_000 and rec['mode'] == 'full'
    assert rec['edges'] > 90_000_000
    assert rec['fits_16gb'], rec
    assert rec['peak_rss_gb'] <= 16.0, rec

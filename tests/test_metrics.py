"""Metrics wiring: per-phase counters + roofline gauges in a train loop.

The reference has no observability layer (SURVEY.md §5); these tests pin
the contract our training loops rely on: windowed JSON records with
phase attribution, lazy loss sync, and roofline-unit gauges.
"""

import json
import time

import jax
import jax.numpy as jnp
import pytest

from pyg_lib_tpu.metrics import Metrics


def test_window_emission_and_phases():
    records = []
    m = Metrics(sink=records.append, every=3, edges_per_step=100)
    for it in range(7):
        with m.phase('sample'):
            time.sleep(0.002)
        with m.phase('step'):
            pass
        m.step(loss=jnp.float32(it), lr=0.1)
    # 7 steps, window 3 -> exactly 2 records (the tail stays open).
    assert len(records) == 2
    r = records[0]
    assert r['step'] == 3
    # Window losses are averaged: (0 + 1 + 2) / 3.
    assert r['loss'] == pytest.approx(1.0)
    assert records[1]['loss'] == pytest.approx(4.0)
    assert set(r['phases_ms']) == {'sample', 'step', 'other'}
    assert r['phases_ms']['sample'] >= 1.0  # ms; we slept 2ms per step
    assert r['edges_per_s'] > 0
    assert r['lr'] == pytest.approx(0.1)
    # Records are JSON-serializable (the sink contract).
    json.dumps(records)


def test_roofline_gauges_present():
    records = []
    m = Metrics(sink=records.append, every=1, bytes_per_step=10**6,
                flops_per_step=10**6)
    m.step()
    (r, ) = records
    for key in ('gbps', 'hbm_fraction', 'tflops', 'mxu_fraction'):
        assert key in r and r[key] > 0


def test_lazy_loss_sync_in_jitted_loop():
    """Device losses are held lazily; one sync per window still reads
    every loss correctly after async dispatch."""
    records = []
    m = Metrics(sink=records.append, every=4)

    @jax.jit
    def step(x):
        return x + 1, (x * x).sum()

    x = jnp.arange(8.0)
    for _ in range(4):
        x, loss = step(x)
        m.step(loss=loss)
    assert len(records) == 1 and records[0]['loss'] > 0


def test_summary_totals():
    m = Metrics(sink=lambda rec: None, every=2, edges_per_step=10)
    for _ in range(4):
        with m.phase('step'):
            time.sleep(0.001)
        m.step()
    s = m.summary()
    assert s['steps'] == 4
    assert 0 < s['phase_share']['step'] <= 1.0
    assert s['edges_per_s'] > 0
    assert s['steps_per_s'] > 0


def test_file_sink(tmp_path):
    path = str(tmp_path / 'metrics.jsonl')
    m = Metrics(sink=path, every=1)
    m.step(loss=jnp.float32(2.5))
    m.step(loss=jnp.float32(3.5))
    lines = [json.loads(ln) for ln in open(path)]
    assert [r['loss'] for r in lines] == [2.5, 3.5]


def test_every_validation():
    with pytest.raises(ValueError):
        Metrics(every=0)

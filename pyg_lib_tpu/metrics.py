"""Training-loop metrics: per-phase counters + roofline gauges.

The reference ships no observability (SURVEY.md §5 — ``TORCH_CHECK``
messages and ad-hoc benchmark prints only). A production TPU loop needs
three things the benches don't give it:

* **per-phase wall-time attribution** — host sampling vs padding vs
  host→device transfer vs the jitted step (the classic failure mode of a
  sampled-GNN pipeline is the host loop silently starving 8 chips);
* **throughput gauges in roofline units** — edges/s and effective GB/s
  against the chip's HBM ceiling (``profiling.device_roofline``), the
  units BASELINE.md targets are written in;
* **a machine-readable sink** — JSON lines, one per report window, so a
  run's telemetry can be diffed/regressed like the bench outputs.

Use::

    metrics = Metrics(edges_per_step=E, bytes_per_step=B, every=20)
    for it in range(steps):
        with metrics.phase('sample'):
            batch = make_batch(...)
        with metrics.phase('step'):
            params, opt_state, loss = step(params, opt_state, *batch)
        metrics.step(loss=loss)           # emits one JSON line every 20
    print(metrics.summary())

Device scalars passed to ``step`` are kept lazy and only synced at window
edges, so instrumentation does not serialize the pipeline: between
reports the host never blocks on the device. ``phase('step')`` therefore
measures *dispatch* time for an async jitted call; the window's
``steps_per_s`` (which spans the sync) is the true device-inclusive rate,
and the residual ``other`` bucket absorbs device wait time.
"""

import contextlib
import json
import time
from typing import Callable, Optional, Union

__all__ = ['Metrics']


class Metrics:
    """Windowed training metrics with phase counters and roofline gauges.

    Args:
        sink: where JSON lines go — a path (appended), a callable taking
            the record dict, or ``None`` for stdout.
        every: emit one record per this many ``step()`` calls.
        edges_per_step: graph edges processed per step (→ ``edges_per_s``).
        bytes_per_step: HBM bytes a step moves (→ ``gbps``/``hbm_fraction``).
        flops_per_step: FLOPs per step (→ ``tflops``/``mxu_fraction``).
    """

    def __init__(self, sink: Union[str, Callable, None] = None,
                 every: int = 20, *, edges_per_step: int = 0,
                 bytes_per_step: int = 0, flops_per_step: int = 0):
        if every < 1:
            raise ValueError(f'every must be >= 1, got {every}')
        self._sink = sink
        self.every = every
        self.edges_per_step = edges_per_step
        self.bytes_per_step = bytes_per_step
        self.flops_per_step = flops_per_step
        self._roof = None  # resolved lazily: importing jax here is rude
        self.steps = 0
        self._win_t0 = time.perf_counter()
        self._win_phases: dict = {}
        self._win_loss = []  # lazy device scalars, synced at window edge
        self._records = []
        self._t_start = self._win_t0
        self._totals: dict = {}

    # ------------------------------------------------------------ phases
    @contextlib.contextmanager
    def phase(self, name: str):
        """Attribute the enclosed host wall time to ``name``."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._win_phases[name] = self._win_phases.get(name, 0.0) + dt
            self._totals[name] = self._totals.get(name, 0.0) + dt

    # ------------------------------------------------------------- steps
    def step(self, loss=None, **gauges):
        """Count one training step; emit a record at window edges.

        ``loss`` may be a device scalar — it is held lazily and synced
        only when the window closes. Extra keyword gauges (floats) are
        averaged over the window.
        """
        self.steps += 1
        if loss is not None:
            self._win_loss.append(loss)
        for k, v in gauges.items():
            key = f'gauge:{k}'
            self._win_phases[key] = self._win_phases.get(key, 0.0) + float(v)
        if self.steps % self.every == 0:
            self._emit()

    def _roofline(self):
        if self._roof is None:
            from pyg_lib_tpu.profiling import device_roofline
            self._roof = device_roofline()
        return self._roof

    def _emit(self):
        import jax

        if self._win_loss:
            # One sync per window, on the LAST loss: jitted steps execute
            # in order, so its readiness covers the whole window.
            jax.block_until_ready(self._win_loss[-1])
        now = time.perf_counter()
        dt = max(now - self._win_t0, 1e-9)
        n = self.every
        rec = {'step': self.steps, 'steps_per_s': round(n / dt, 3)}
        if self._win_loss:
            rec['loss'] = round(
                sum(float(v) for v in self._win_loss) / len(self._win_loss),
                6)
        phases = {k: v for k, v in self._win_phases.items()
                  if not k.startswith('gauge:')}
        if phases:
            accounted = sum(phases.values())
            rec['phases_ms'] = {k: round(v / n * 1e3, 3)
                                for k, v in sorted(phases.items())}
            # Device wait + anything not under a phase() context.
            rec['phases_ms']['other'] = round(
                max(dt - accounted, 0.0) / n * 1e3, 3)
        for k, v in self._win_phases.items():
            if k.startswith('gauge:'):
                rec[k[6:]] = round(v / n, 6)
        step_s = dt / n
        if self.edges_per_step:
            rec['edges_per_s'] = round(self.edges_per_step / step_s, 1)
        if self.bytes_per_step:
            rec['gbps'] = round(self.bytes_per_step / step_s / 1e9, 2)
            rec['hbm_fraction'] = round(rec['gbps'] / self._roofline().
                                        hbm_gbps, 6)
        if self.flops_per_step:
            rec['tflops'] = round(self.flops_per_step / step_s / 1e12, 3)
            rec['mxu_fraction'] = round(
                rec['tflops'] / self._roofline().mxu_bf16_tflops, 6)
        self._records.append(rec)
        self._write(rec)
        self._win_t0 = time.perf_counter()
        self._win_phases = {}
        self._win_loss = []

    def _write(self, rec):
        line = json.dumps(rec)
        if callable(self._sink):
            self._sink(rec)
        elif isinstance(self._sink, str):
            with open(self._sink, 'a') as f:
                f.write(line + '\n')
        else:
            print(line, flush=True)

    # ----------------------------------------------------------- summary
    @property
    def records(self):
        return list(self._records)

    def summary(self) -> dict:
        """Run-level totals: steps/s overall and per-phase time shares."""
        total = max(time.perf_counter() - self._t_start, 1e-9)
        out = {'steps': self.steps,
               'steps_per_s': round(self.steps / total, 3),
               'wall_s': round(total, 3)}
        if self._totals:
            out['phase_share'] = {k: round(v / total, 4)
                                  for k, v in sorted(self._totals.items())}
        if self.edges_per_step and self.steps:
            out['edges_per_s'] = round(
                self.edges_per_step * self.steps / total, 1)
        return out

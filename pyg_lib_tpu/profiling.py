"""Profiling / roofline helpers.

The reference library ships no tracing (SURVEY.md §5 — wall-clock only in
its benchmarks); on TPU, ``jax.profiler`` gives per-kernel traces for free,
and the roofline counters here turn op timings into fractions of the
chip's HBM / MXU ceilings — the units BASELINE.md targets are written in.
"""

import contextlib
import time
from dataclasses import dataclass
from typing import Optional

__all__ = ['trace', 'device_roofline', 'Roofline', 'measure']

HBM_GBPS = {'TPU v5 lite': 819.0, 'TPU v5': 2765.0, 'TPU v4': 1228.0}
MXU_BF16_TFLOPS = {'TPU v5 lite': 197.0, 'TPU v5': 459.0, 'TPU v4': 275.0}


@dataclass
class Roofline:
    hbm_gbps: float
    mxu_bf16_tflops: float

    def balance_flop_per_byte(self) -> float:
        """Arithmetic-intensity knee: ops below this are HBM-bound."""
        return self.mxu_bf16_tflops * 1e12 / (self.hbm_gbps * 1e9)


def device_roofline(device=None) -> Roofline:
    """Peak HBM bandwidth / MXU throughput for a device (CPU fallback)."""
    import jax

    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, 'device_kind', '')
    hbm = next((v for k, v in HBM_GBPS.items() if kind.startswith(k)), 50.0)
    mxu = next((v for k, v in MXU_BF16_TFLOPS.items() if kind.startswith(k)),
               1.0)
    return Roofline(hbm, mxu)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """``jax.profiler`` trace context; view with TensorBoard/XProf.

    ``log_dir`` defaults to ``<home>/traces``.
    """
    import jax

    if log_dir is None:
        import os.path as osp

        from pyg_lib_tpu.home import get_home_dir
        log_dir = osp.join(get_home_dir(), 'traces')
    with jax.profiler.trace(log_dir):
        yield log_dir


def measure(fn, *args, iters: int = 8, bytes_accessed: int = 0,
            flops: int = 0, warmup: int = 1):
    """Times a jitted callable and reports roofline fractions.

    Returns a dict with ``seconds``, and when given, ``gbps``/``tflops``
    plus ``hbm_fraction``/``mxu_fraction`` against the current device.
    """
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    roof = device_roofline()
    res = {'seconds': dt}
    if bytes_accessed:
        res['gbps'] = bytes_accessed / dt / 1e9
        res['hbm_fraction'] = res['gbps'] / roof.hbm_gbps
    if flops:
        res['tflops'] = flops / dt / 1e12
        res['mxu_fraction'] = res['tflops'] / roof.mxu_bf16_tflops
    return res

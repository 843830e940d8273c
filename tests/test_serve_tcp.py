"""TCP partition serving (``sampler.serve`` CLI) — the multi-host path.

Servers run as real subprocesses of the CLI entry point, listening on
TCP localhost; the coordinator attaches with
``SamplingService.connect`` — the exact deployment shape of a pod
(one ``python -m pyg_lib_tpu.sampler.serve`` per sampling host).
"""

import os
import secrets
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from pyg_lib_tpu.sampler.dist_service import (DistNeighborSampler,
                                              partition_graph)
from pyg_lib_tpu.sampler.serve import load_partition_payload
from pyg_lib_tpu.sampler.transport import SamplingService


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_load_partition_payload_roundtrip(tmp_path):
    rowptr = np.array([0, 2, 3], np.int64)
    col = np.array([1, 0, 1], np.int64)
    np.savez(tmp_path / 'homo.npz', rowptr=rowptr, col=col)
    p = load_partition_payload(str(tmp_path / 'homo.npz'))
    np.testing.assert_array_equal(p['rowptr'], rowptr)
    np.savez(tmp_path / 'het.npz', rowptr__a__to__b=rowptr, col__a__to__b=col)
    p = load_partition_payload(str(tmp_path / 'het.npz'))
    np.testing.assert_array_equal(p['hetero'][('a', 'to', 'b')][1], col)
    np.savez(tmp_path / 'bad.npz', junk=col)
    with pytest.raises(ValueError, match='no rowptr'):
        load_partition_payload(str(tmp_path / 'bad.npz'))


@pytest.mark.slow
def test_serve_cli_tcp_matches_inprocess(tmp_path):
    rng = np.random.default_rng(6)
    n, e = 150, 1200
    deg = rng.multinomial(e, np.ones(n) / n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=e).astype(np.int64)
    graph = partition_graph(rowptr, col, 2)

    key = secrets.token_bytes(32)
    keyfile = tmp_path / 'cluster.key'
    keyfile.write_bytes(key)

    procs, addrs = [], []
    env = dict(os.environ, JAX_PLATFORMS='cpu', PALLAS_AXON_POOL_IPS='')
    for p in range(2):
        np.savez(tmp_path / f'part{p}.npz',
                 rowptr=graph.rowptr_parts[p], col=graph.col_parts[p])
        port = _free_port()
        procs.append(
            subprocess.Popen([
                sys.executable, '-m', 'pyg_lib_tpu.sampler.serve',
                '--partition', str(tmp_path / f'part{p}.npz'),
                '--host', '127.0.0.1', '--port', str(port),
                '--authkey-file', str(keyfile)
            ], env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                             text=True))
        addrs.append(('127.0.0.1', port))
    try:
        # wait for listeners by retrying the authenticated connect (a raw
        # probe would consume an accept and abort its handshake — which
        # the server now survives, but the retry is the honest wait)
        deadline = time.time() + 30
        svc = None
        while svc is None:
            try:
                svc = SamplingService.connect(addrs, authkey=key)
            except (ConnectionRefusedError, OSError):
                if time.time() > deadline:
                    for pr in procs:
                        pr.kill()
                        print(pr.stdout.read())
                    pytest.fail('server did not come up')
                time.sleep(0.1)

        svc.disconnect()  # drop connections; servers loop back to accept
        # a wrong-key handshake must not kill the servers...
        from multiprocessing.connection import Client
        with pytest.raises(Exception):
            Client(addrs[0], authkey=b'not-the-cluster-key!')
        # ...the real coordinator still connects afterwards
        svc = SamplingService.connect(addrs, authkey=key)

        seeds = rng.choice(n, size=16, replace=False).astype(np.int64)
        local = DistNeighborSampler(graph, rng=9)
        row_l, col_l, nid_l, nph_l = local.sample(seeds, [3, 2])
        remote = DistNeighborSampler(graph, rng=9, service=svc)
        row_r, col_r, nid_r, nph_r = remote.sample(seeds, [3, 2])
        np.testing.assert_array_equal(row_r, row_l)
        np.testing.assert_array_equal(col_r, col_l)
        np.testing.assert_array_equal(nid_r, nid_l)
        assert nph_r == nph_l
        svc.close()  # sends ('stop',): servers exit cleanly
        for pr in procs:
            assert pr.wait(timeout=15) == 0
    finally:
        for pr in procs:
            if pr.poll() is None:
                pr.kill()

"""Multi-PROCESS (N-host analog) SUMMA execution: 2 processes x 4 CPU devices
under jax.distributed.initialize, the config-5 "1 chip -> 1 host -> N hosts"
frontier (SURVEY.md section 2.3; no reference counterpart -- the reference is
single-GPU by construction).

Each test spawns two worker processes that join one distributed runtime,
build the global 2x4 mesh, construct globally-sharded inputs from
process-local shards only (no cross-process device_put), run summa_gemm,
and verify every addressable output shard bit-equals the single-device
emulation -- cross-process bit-identity, the invariant the order-free
shift/reduction design exists for."""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # full-lane family; default lane: -m 'not slow'

_WORKER = os.path.join(os.path.dirname(__file__), "_mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_cluster(mode: str, nproc: int = 2, timeout: int = 420):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # the coordination service is chatty on stderr at INFO; keep output usable
    env.setdefault("TPU_STDERR_LOG_LEVEL", "3")
    env.update(G8_COORD=f"127.0.0.1:{port}", G8_NPROC=str(nproc), G8_MODE=mode)
    procs = []
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER], env=dict(env, G8_PID=str(pid)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=timeout)[0])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} (mode={mode}) failed:\n{out}"
        assert "MP_OK" in out, f"worker {pid} (mode={mode}) no MP_OK:\n{out}"


@pytest.mark.parametrize("mode", ["gather", "stream", "accurate", "robust",
                                  "complex"])
def test_two_process_summa_bit_identity(mode):
    _run_cluster(mode)


@pytest.mark.parametrize("mode", ["getrf", "qr"])
def test_two_process_factorization_bit_identity(mode):
    """Solver/QR layers over a process-spanning mesh: the Schur / trailing
    updates run through cross-process SUMMA; the factorization bits must
    equal the single-device run (order-free reduction design)."""
    _run_cluster(mode, timeout=600)

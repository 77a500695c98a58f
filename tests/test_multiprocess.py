"""REAL multi-process execution of the multihost protocol (SURVEY §2.3 P9).

Two OS processes run `jax.distributed.initialize` against a localhost
coordinator on CPU devices (gloo collectives) and execute the actual
`jax.process_count() > 1` branches — `make_array_from_process_local_data`,
`process_allgather`, `sync_global_devices` — that the faked-process tests
in test_runtime.py cannot reach.  The emitted streams and the assembled
container must be byte-identical to single-process encode.

Skips (with the reason) if the sandbox forbids the coordinator socket or
the jax build lacks CPU collectives.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from hsc_tpu import MultilevelDictionary, SignalGenerator, make_test_config
from hsc_tpu.runtime import CorpusEncoder

_WORKER = r"""
import os, sys
rank = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=rank
)
assert jax.process_count() == 2, jax.process_count()
import numpy as np
from jax.sharding import Mesh
from hsc_tpu import MultilevelDictionary, SignalGenerator, make_test_config
from hsc_tpu.models import ConvolutionalSparseCoder
from hsc_tpu.parallel.dp import DataParallelEncoder
from hsc_tpu.runtime import CorpusEncoder

cfg = make_test_config()
mld = MultilevelDictionary.generate(cfg, seed=7)
N = 7  # ragged: nl=4, process 1 owns 3 blocks and zero-pads to 4
xs = SignalGenerator(mld, rates=4e-3).generate_signals(N, cfg.block_size, seed=21)
lo, hi = DataParallelEncoder.multihost_split(N, 2)[rank]

# (a) allgathered DP encode: make_array_from_process_local_data +
#     process_allgather over the real 2-process, 4-device CPU topology
mesh = Mesh(np.array(jax.devices()), ("data",))
coder = ConvolutionalSparseCoder(mld, backend="jax")
dp = DataParallelEncoder(mesh, coder.mp)
enc = dp.encode_multihost(xs[lo:hi], N)
if rank == 0:
    np.savez(
        os.path.join(outdir, "dp.npz"),
        positions=np.asarray(enc.positions), atoms=np.asarray(enc.atoms),
        codes=np.asarray(enc.codes), count=np.asarray(enc.count),
        scale=np.asarray(enc.scale),
    )

# (b) journal shard encode + process-0 assembly: sync_global_devices
ce = CorpusEncoder(
    mld, backend="jax", batch_size=2,
    journal_dir=os.path.join(outdir, "j"), process_index=rank,
)
blob = ce.encode_multihost(xs[lo:hi], N)
if rank == 0:
    assert blob is not None
    with open(os.path.join(outdir, "container.hsct"), "wb") as f:
        f.write(blob)
else:
    assert blob is None
print("WORKER_OK", rank, flush=True)
"""

_SKIP_MARKERS = (
    "permission denied",
    "address already in use",
    "failed to connect",
    "unavailable",
    "collectives",
    "gloo",
    "deadline exceeded",
)


def test_two_process_multihost_encode(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(rank), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out")
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            low = out.lower()
            if any(m in low for m in _SKIP_MARKERS):
                pytest.skip(f"multi-process jax unavailable here: {out[-400:]}")
            pytest.fail(f"worker failed:\n{out}")
        assert "WORKER_OK" in out

    # expected values from a plain single-process encode in THIS process
    cfg = make_test_config()
    mld = MultilevelDictionary.generate(cfg, seed=7)
    N = 7
    xs = SignalGenerator(mld, rates=4e-3).generate_signals(
        N, cfg.block_size, seed=21
    )

    # (a) the allgathered streams == the 8-virtual-device mesh DP streams
    import jax
    from jax.sharding import Mesh

    from hsc_tpu.models import ConvolutionalSparseCoder
    from hsc_tpu.parallel.dp import DataParallelEncoder

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    dp = DataParallelEncoder(mesh, ConvolutionalSparseCoder(mld, backend="jax").mp)
    ref = dp.encode(xs)
    got = np.load(tmp_path / "dp.npz")
    np.testing.assert_array_equal(got["count"], np.asarray(ref.count))
    np.testing.assert_array_equal(got["positions"], np.asarray(ref.positions))
    np.testing.assert_array_equal(got["atoms"], np.asarray(ref.atoms))
    np.testing.assert_array_equal(got["codes"], np.asarray(ref.codes))
    np.testing.assert_array_equal(got["scale"], np.asarray(ref.scale))

    # (b) the assembled container == single-process encode bytes
    expected = CorpusEncoder(mld, backend="jax", batch_size=2).encode(xs)
    assembled = (tmp_path / "container.hsct").read_bytes()
    assert assembled == expected


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]

"""Two-process multi-host smoke test (VERDICT round-2 #8): the
``host_local_batch_to_global`` assembly path — the only distributed code path
without single-process coverage — proven on a real two-process CPU
``jax.distributed`` cluster (2 fake devices per process, 4 global devices)."""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid,
                           local_device_ids=[0, 1])
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

import numpy as np

from synthsr_tpu.parallel.mesh import host_local_batch_to_global, make_data_mesh

mesh = make_data_mesh()
assert mesh.devices.size == 4

# each process holds ITS half of the global batch of 4 examples: the
# global batch value at index b is b + 1 (process 0 -> examples 0,1;
# process 1 -> examples 2,3)
local = np.stack([np.full((3, 3), 2 * pid + k + 1, np.float32)
                  for k in range(2)])
batch = host_local_batch_to_global(mesh, (local,))
(g,) = batch
assert g.shape == (4, 3, 3), g.shape

total = jax.jit(lambda t: jax.numpy.sum(t[0]))(batch)
expected = float(9 * (1 + 2 + 3 + 4))
assert float(total) == expected, (float(total), expected)

# per-example means in batch order prove shard PLACEMENT, not just the sum
from jax.experimental import multihost_utils

means = jax.jit(lambda t: jax.numpy.mean(t[0], axis=(1, 2)))(batch)
np.testing.assert_allclose(
    np.asarray(multihost_utils.process_allgather(means, tiled=True)),
    [1.0, 2.0, 3.0, 4.0])
print(f"OK process {pid}", flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_build_model_inputs_local_slice_stream_parity(tmp_path):
    """Per-host sharded input pipeline (SURVEY.md §5, VERDICT r4 #6):
    ``build_model_inputs(local_slice=(pid, n))`` must yield exactly this
    host's contiguous slice of the single-host stream — including the GMM
    prior draws — so that concatenating the processes' yields in process
    order reproduces the seeded single-host stream (topology-invariant)."""
    import numpy as np

    from synthsr_tpu.io.volume import save_volume
    from synthsr_tpu.synth.model_inputs import build_model_inputs

    lab_dir = tmp_path / "labels"
    lab_dir.mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        lab = np.zeros((12, 12, 12), np.int32)
        lab[2:10, 2:10, 2:10] = rng.integers(0, 3, (8, 8, 8)) * 2
        p = str(lab_dir / f"m{i}.nii.gz")
        save_volume(lab, np.eye(4), None, p)
        paths.append(p)

    kwargs = dict(path_label_maps=paths, n_labels=3, prior_means=None,
                  prior_stds=None, batchsize=4)
    full = build_model_inputs(rng=np.random.default_rng(7), **kwargs)
    p0 = build_model_inputs(rng=np.random.default_rng(7), local_slice=(0, 2),
                            **kwargs)
    p1 = build_model_inputs(rng=np.random.default_rng(7), local_slice=(1, 2),
                            **kwargs)
    for _ in range(3):  # several draws: parity must persist down the stream
        f, a, b = next(full), next(p0), next(p1)
        assert len(f) == len(a) == len(b)
        for ff, aa, bb in zip(f, a, b):
            assert aa.shape[0] == bb.shape[0] == ff.shape[0] // 2
            np.testing.assert_array_equal(ff, np.concatenate([aa, bb], 0))

    with pytest.raises(ValueError):
        next(build_model_inputs(rng=np.random.default_rng(7),
                                local_slice=(0, 3), **kwargs))


def test_host_local_batch_to_global_two_processes(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    port = _free_port()
    env = dict(os.environ)
    # fresh processes must see the repo; drop any conftest-injected device
    # count so the child's own XLA_FLAGS value wins
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, str(script), str(port), str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"OK process {i}" in out, out

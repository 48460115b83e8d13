"""Multi-process (simulated multi-host) test of the sharded permutation step.

SURVEY.md section 4: pod behavior is tested without a TPU pod by launching
two jax.distributed CPU processes, each with 4 virtual devices, and running
the sharded permutation chunk over the GLOBAL 8-device mesh.  Each process
computes its exceedance counts locally; the psum over "perm" must produce the
global count everywhere.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
import numpy as np

proc_id = int(sys.argv[1])
coord = sys.argv[2]
out_path = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coord, num_processes=2, process_id=proc_id)
assert len(jax.devices()) == 8, jax.devices()

import jax.numpy as jnp

sys.path.insert(0, {repo!r})
import __graft_entry__ as g
from fscl_tpu.ops.lattice import LatticeTables
from fscl_tpu.ops.permute import block_permutation_indices
from fscl_tpu.parallel import make_scan_mesh, sharded_permute_chunk

tables, pos, row, null, cand, lo, hi = g._example_problem(
    n_sites=512, n_cand=32, grid_points=256
)
lt = LatticeTables(tables.table, tables.grid_points)
mesh = make_scan_mesh(n_perm=4, n_site=2)
R = 8
sigma = block_permutation_indices(
    jax.random.key(0), jnp.asarray(pos.astype(np.int64)), 200_000, R
)
thr = jnp.full(len(cand), 1.0, jnp.float32)
# shard global arrays over the mesh (every process holds the same host data)
from jax.sharding import NamedSharding, PartitionSpec as P

sigma_g = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("perm")), np.asarray(sigma)
)
def rep(x, spec):
    return jax.make_array_from_process_local_data(NamedSharding(mesh, spec), np.asarray(x))

clr_null, exceed = sharded_permute_chunk(
    mesh, lt, jnp.asarray(row), jnp.asarray(null), sigma_g,
    jnp.asarray(pos), rep(cand, P("site")), rep(lo, P("site")),
    rep(hi, P("site")), rep(thr, P("site")),
    chunk=8, start=0, n=512, w_pad=512,
)
ex = np.asarray(jax.device_get(exceed.addressable_shards[0].data))
np.save(out_path, ex)
print("worker", proc_id, "exceed shard0:", ex[:5])
"""


@pytest.mark.skipif(
    os.environ.get("FSCL_SKIP_MULTIHOST") == "1", reason="disabled"
)
def test_two_process_permute_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=str(REPO)))
    procs = []
    outs = []
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    for i in range(2):
        out = tmp_path / f"ex{i}.npy"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(i), coord, str(out)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            )
        )
    for p in procs:
        try:
            rc = p.wait(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        if rc != 0:
            msg = p.stdout.read().decode()[-2000:]
            pytest.fail(f"worker failed: {msg}")
    # both processes must agree on the psum'd exceedance shard they hold
    e0 = np.load(outs[0])
    e1 = np.load(outs[1])
    np.testing.assert_array_equal(e0, e1)

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


FULL_WORKER = r"""
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

sys.path.insert(0, {repo!r})
from tests.test_multihost import _full_pipeline

pn, pp = _full_pipeline()
np.savez(out_path, pn=pn, pp=pp)
print("worker", proc_id, "permute_n:", pn[:6], "permute_p:", pp[:6])
"""


def _full_pipeline():
    """Tiny end-to-end scan + hist permutation; returns (permute_n, permute_p).

    Runs identically on any topology with 8 global devices: the sigma
    stream derives from absolute replicate indices and the pruning RNG
    from the config seed, so 1-process x 8-device and 2-process x
    4-device runs must produce IDENTICAL pruning outcomes.

    HIST_REP_SUB is patched down to 2 so the driver's shard_now gate
    (replicate padding <= 2x) is satisfied at this tiny replicate count —
    the run MUST take the sharded to_global + allgather path, asserted via
    the dispatch counters (ADVICE r1: the unpatched config silently fell
    back to the unsharded path, leaving the sharded code untested).
    """
    import numpy as np

    from fscl_tpu.data import build_snp_data
    from fscl_tpu.engine import (
        PermuteConfig, ScanConfig, scan_genome, scan_permute,
    )
    from fscl_tpu.engine import permute as permute_mod
    from fscl_tpu.models import background_fsp, build_tables
    from fscl_tpu.sim import simulate_dataset

    sim = simulate_dataset(
        seed=31, sample_size=24, snp_density=1.0, mb_length=2.0,
        alpha=5e-5, n_sweeps=1,
    )
    n = len(sim["pos"])
    data = build_snp_data(
        np.full(n, "1"), sim["pos"], sim["freq"], np.full(n, sim["n"]),
        np.zeros(n, bool),
    )
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=512)
    data.attach_model(tables)
    scan_cfg = ScanConfig(small_grid_sp=10000, large_grid_sp=200000)
    result = scan_genome(data, tables, scan_cfg)
    pc = PermuteConfig(n_permute=24, chunk_replicates=16, seed=5)
    saved = permute_mod.HIST_REP_SUB
    permute_mod.HIST_REP_SUB = 2
    try:
        scan_permute(data, tables, result, scan_cfg, pc)
    finally:
        permute_mod.HIST_REP_SUB = saved
    assert permute_mod.last_stats.get("hist_sharded_dispatches", 0) > 0, (
        "sharded permutation branch was not taken: "
        f"{permute_mod.last_stats}"
    )
    return result.permute_n.copy(), result.permute_p.copy()


@pytest.mark.skipif(
    os.environ.get("FSCL_SKIP_MULTIHOST") == "1", reason="disabled"
)
def test_two_process_full_permutation_matches_single(tmp_path):
    """The FULL hist permutation driver over a 2-process global mesh must
    reproduce the single-process 8-device run exactly (to_global sigma
    lift + allgather drains keep the host pruning loop SPMD-identical)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker_full.py"
    script.write_text(FULL_WORKER.format(repo=str(REPO)))
    procs, outs = [], []
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    for i in range(2):
        out = tmp_path / f"full{i}.npz"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(i), coord, str(out)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            )
        )
    for p in procs:
        try:
            rc = p.wait(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("full-pipeline multihost worker timed out")
        if rc != 0:
            msg = p.stdout.read().decode()[-3000:]
            pytest.fail(f"worker failed: {msg}")

    # single-process baseline (8 local virtual devices via conftest)
    pn_ref, pp_ref = _full_pipeline()
    a = np.load(outs[0])
    b = np.load(outs[1])
    np.testing.assert_array_equal(a["pn"], b["pn"])
    np.testing.assert_array_equal(a["pp"], b["pp"])
    np.testing.assert_array_equal(a["pn"], pn_ref)
    np.testing.assert_array_equal(a["pp"], pp_ref)

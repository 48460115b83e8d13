"""Round-2 measurement batch: all TPU-side numbers in ONE process.

The axon tunnel charges a flat 3-8 min worker-init tax per process, so the
round's measurements run back-to-back here: genome1m headline (ours), the
pruning-tail profile and checkpoint overhead on the same warm state, then
mixed100k (ours).  Results merge incrementally into headline_results.json
after each stage, so a crash loses only later stages.

Run EXCLUSIVELY on the axon tunnel:  python bench/run_r2_measurements.py
"""

import copy
import importlib.util
import json
import pathlib
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401  (compile cache)

import numpy as np

spec = importlib.util.spec_from_file_location(
    "headline", REPO / "bench" / "headline.py"
)
H = importlib.util.module_from_spec(spec)
spec.loader.exec_module(H)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax.numpy as jnp

    t0 = time.monotonic()
    jnp.zeros(8).sum().item()
    log(f"device-init tax: {time.monotonic()-t0:.0f}s")

    # ---- genome1m ours (headline) + parity + calibration -----------------
    path = H.gen_genome1m()
    ours_out = H.DATA / "headline_genome1m.ours.tsv"
    ref_out = H.DATA / "headline_genome1m.ref.tsv"
    out = H._run_ours_phased(path, 100_000, out_tsv=ours_out)
    if ref_out.exists():
        out.update(H.compare_parity(ours_out, ref_out))
    H.merge_results("genome1m", out)
    log(f"genome1m done: {json.dumps(out)}")

    # ---- tail profile + checkpoint overhead on the same dataset ----------
    import fscl_tpu.engine.checkpoint as ck
    import fscl_tpu.engine.permute as P
    from fscl_tpu.engine import PermuteConfig, ScanConfig, scan_genome, scan_permute
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables

    data = load_snp_input(path)
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    cfg = ScanConfig(small_grid_sp=1000, large_grid_sp=100000)
    result0 = scan_genome(data, tables, cfg)

    keep = np.array([
        np.where(result0.chr_id == c)[0][
            np.argmax(result0.clr[result0.chr_id == c])
        ]
        for c in range(data.n_chromosomes)
    ])
    tail = copy.deepcopy(result0)
    tail.permute_finished[:] = True
    tail.permute_finished[keep] = False
    pc = PermuteConfig(n_permute=4096, chunk_replicates=32, seed=1)
    t0 = time.monotonic()
    scan_permute(data, tables, tail, cfg, copy.deepcopy(pc))
    w1 = time.monotonic() - t0  # includes tail-shape compiles
    tail2 = copy.deepcopy(result0)
    tail2.permute_finished[:] = True
    tail2.permute_finished[keep] = False
    t0 = time.monotonic()
    scan_permute(data, tables, tail2, cfg, pc)
    w2 = time.monotonic() - t0
    pr = int(tail2.permute_n[keep].sum())
    log(f"tail({len(keep)} immortal pts): cold {w1:.1f}s warm {w2:.1f}s, "
        f"{pr} pr -> {pr / w2:.0f} pr/s; stats {P.last_stats}")
    H.merge_results("genome1m", {
        "tail_points": int(len(keep)), "tail_point_rounds": pr,
        "tail_pr_per_s_warm": round(pr / w2, 1),
    })

    # checkpoint overhead (warm shapes, 256 perms over all 10k points)
    def run_ck(ckpt_path, n=256):
        r = copy.deepcopy(result0)
        t0 = time.monotonic()
        scan_permute(
            data, tables, r, cfg,
            PermuteConfig(n_permute=n, chunk_replicates=32, seed=1,
                          checkpoint_path=ckpt_path),
        )
        return time.monotonic() - t0, int(r.permute_n.sum())

    run_ck(None)  # warm
    w_off, pr_off = run_ck(None)
    acc = {"t": 0.0, "n": 0}
    orig = ck.Checkpointer.save

    def timed_save(self, result, rounds_done):
        ts = time.monotonic()
        orig(self, result, rounds_done)
        acc["t"] += time.monotonic() - ts
        acc["n"] += 1

    ck.Checkpointer.save = timed_save
    with tempfile.TemporaryDirectory() as d:
        w_on, _ = run_ck(str(pathlib.Path(d) / "g.ckpt"))
        size = sum(p.stat().st_size for p in pathlib.Path(d).iterdir())
    ck.Checkpointer.save = orig
    log(f"ckpt: off {w_off:.1f}s on {w_on:.1f}s "
        f"(saves {acc['t']:.2f}s/{acc['n']}x, {size/1e6:.1f} MB)")
    H.merge_results("genome1m", {
        "ckpt_wall_off_s": round(w_off, 2),
        "ckpt_wall_on_s": round(w_on, 2),
        "ckpt_save_s": round(acc["t"], 2),
        "ckpt_bytes": int(size),
        "ckpt_overhead_pct": round(100 * acc["t"] / max(w_on, 1e-9), 2),
    })

    # ---- mixed100k ours --------------------------------------------------
    mpath = H.gen_mixed100k()
    m_ours = H.DATA / "headline_mixed100k.ours.tsv"
    m_ref = H.DATA / "headline_mixed100k.ref.tsv"
    mout = H._run_ours_phased(mpath, 10_000, out_tsv=m_ours)
    if m_ref.exists():
        mout.update(H.compare_parity(m_ours, m_ref))
    H.merge_results("mixed100k", mout)
    log(f"mixed100k done: {json.dumps(mout)}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark configs from BASELINE.json, ours vs the reference C.

Configs (see BASELINE.md "To measure"):
  ms_neutral  ms-simulated neutral data, 1 replicate, n=20, ~1k segsites,
              100 permutations (ms-input path)
  ms_sweep    ms-simulated sweep scenario, 10 replicates, n=50, folded
  asc100k     one ~100k-site chromosome with K=2/M=20 ascertainment,
              10k permutations
  mixed100k   ~100k sites over 4 chromosomes with 31 distinct sample
              depths (missing-genotype subsampling) + 30% folded sites,
              10k permutations — the compressed mixed-depth path
  genome1m    whole genome ~1M sites over 22 chromosomes, K>=2 rare-allele
              filter, 100k permutations with exceedance pruning

Each config with both sides present also writes programmatic parity checks
(compare_parity: per-interval CLR tolerance bands, max-CLR dominance,
empirical-p agreement) into headline_results.json.

Usage:  python bench/headline.py <config> [--ref-only|--ours-only]
Results are merged into bench/headline_results.json.

Ours runs in-process with the per-process device-init tax absorbed by a
trivial dispatch first (see bench/repro_cache2.py); phase walls therefore
measure the engine plus any residual cold compiles (persistent cache makes
those ~0.1s).  The reference C binary runs via subprocess; for configs
where its full permutation count is infeasible single-core, it runs a
reduced count and the point-rounds/s RATE is reported (the rate is
size-stable; see bench/baseline_c.json).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401  (compile-cache config)
import numpy as np

DATA = REPO / "bench" / "data"
RESULTS = REPO / "bench" / "headline_results.json"
REF_BIN = REPO / "bench" / "fscl_ref"
REF_MS_BIN = REPO / "bench" / "fscl_ref_ms"  # + working ms input (bench/refstubs/msparse.c + msinput_fixed.c)


# ---------------------------------------------------------------- data gen

def make_haps(rng, freq, n):
    """[n, S] uint8 haplotype matrix with column sums == freq."""
    ranks = np.argsort(rng.random((n, len(freq))), axis=0)
    return (ranks < freq[None, :]).astype(np.uint8)


def write_ms_file(path, blocks, nsam):
    """blocks: list of (positions_frac [S] float, haps [n, S] uint8)."""
    with open(path, "w") as f:
        f.write(f"ms {nsam} {len(blocks)} -s {len(blocks[0][0])}\n")
        f.write("27182 8182 845\n")
        for pos, haps in blocks:
            f.write("\n//\n")
            f.write(f"segsites: {len(pos)}\n")
            f.write("positions: "
                    + " ".join(f"{p:1.8f}" for p in pos) + "\n")
            for row in haps:
                f.write("".join("1" if v else "0" for v in row) + "\n")


def neutral_freqs(rng, S, n):
    p = 1.0 / np.arange(1, n)
    return rng.choice(np.arange(1, n), size=S, p=p / p.sum())


def gen_ms_neutral():
    path = DATA / "headline_ms_neutral.ms"
    if path.exists():
        return path
    rng = np.random.default_rng(11)
    n, S = 20, 1000
    pos = np.sort(rng.random(S))
    haps = make_haps(rng, neutral_freqs(rng, S, n), n)
    write_ms_file(path, [(pos, haps)], n)
    return path


def gen_ms_sweep():
    path = DATA / "headline_ms_sweep.ms"
    seg_bp = 5_000_000
    if path.exists():
        return path, seg_bp
    from fscl_tpu.sim.sample import (
        place_sweeps, sample_snps, standard_neutral_spectrum,
    )

    rng = np.random.default_rng(12)
    n, blocks = 50, []
    fsp = standard_neutral_spectrum(n)
    for b in range(10):
        spos, salpha = place_sweeps(1, seg_bp, 3e-5)
        pos_bp, freq = sample_snps(
            rng, 2500, seg_bp, spos, salpha, fsp, n
        )
        blocks.append((pos_bp / seg_bp, make_haps(rng, freq, n)))
    write_ms_file(path, blocks, n)
    return path, seg_bp


def gen_asc100k():
    path = DATA / "headline_asc100k.sf"
    if path.exists():
        return path
    from fscl_tpu.models.ascbias import ascprob_subsample
    from fscl_tpu.sim import simulate_dataset, write_snp_file

    # oversample so ~100k sites survive the K=2-of-20 ascertainment rule
    sim = simulate_dataset(
        seed=13, sample_size=50, snp_density=1.65, mb_length=100.0,
        alpha=3e-5, n_sweeps=2,
    )
    rng = np.random.default_rng(14)
    p = np.asarray(ascprob_subsample(sim["freq"], 20, 2, sim["n"]))
    keep = rng.random(len(sim["freq"])) < p
    write_snp_file(path, sim["pos"][keep], sim["freq"][keep], sim["n"])
    print(f"asc100k: {int(keep.sum())} sites ascertained "
          f"of {len(keep)} simulated", file=sys.stderr)
    return path


def gen_mixed100k():
    """~100k sites over 4 chromosomes with 31 distinct sample depths.

    The reference's mixed/missing-depth headline case (README.md:26):
    per-site depth 20..50 drawn as hypergeometric subsamples of the n=50
    simulation (what a VCF with missing genotype calls yields), 30% of
    sites folded to minor-allele counts.
    """
    path = DATA / "headline_mixed100k.sf"
    if path.exists():
        return path
    from fscl_tpu.sim import simulate_dataset

    rng = np.random.default_rng(77)
    rows = []
    for c in range(4):
        sim = simulate_dataset(
            seed=300 + c, sample_size=50, snp_density=1.0, mb_length=26.0,
            alpha=3e-5, n_sweeps=1,
        )
        n0 = sim["n"]
        d = rng.integers(20, n0 + 1, len(sim["pos"]))
        f = rng.hypergeometric(sim["freq"], n0 - sim["freq"], d)
        folded = rng.random(len(d)) < 0.3
        f = np.where(folded, np.minimum(f, d - f), f)
        keep = (f >= 1) & (f <= d - 1)
        rows.append(
            (c + 1, sim["pos"][keep], f[keep], d[keep], folded[keep])
        )
    with open(path, "w") as fh:
        for c, pos, fr, dd, fo in rows:
            for p_, q, n_, b in zip(pos, fr, dd, fo):
                fh.write(f"{c}\t{p_}\t{q}\t{n_}\t{int(b)}\n")
    total = sum(len(r[1]) for r in rows)
    n_depths = len(np.unique(np.concatenate([r[3] for r in rows])))
    print(f"mixed100k: {total} sites, {n_depths} distinct depths",
          file=sys.stderr)
    return path


def gen_genome1m():
    path = DATA / "headline_genome1m.sf"
    if path.exists():
        return path
    from fscl_tpu.sim import simulate_dataset

    rows = []
    for c in range(22):
        sim = simulate_dataset(
            seed=200 + c, sample_size=50, snp_density=1.0, mb_length=45.5,
            alpha=3e-5, n_sweeps=1,
        )
        keep = sim["freq"] >= 2  # rare-allele filter K>=2
        rows.append((c + 1, sim["pos"][keep], sim["freq"][keep], sim["n"]))
    total = sum(len(r[1]) for r in rows)
    with open(path, "w") as f:
        for c, pos, freq, n in rows:
            for p_, q in zip(pos, freq):
                f.write(f"{c}\t{p_}\t{q}\t{n}\t0\n")
    print(f"genome1m: {total} sites over 22 chromosomes", file=sys.stderr)
    return path


# ---------------------------------------------------------------- runners

def absorb_device_tax():
    import jax
    import jax.numpy as jnp

    t0 = time.monotonic()
    jnp.zeros(8).sum().item()
    print(f"device-init tax absorbed: {time.monotonic()-t0:.1f}s "
          f"({jax.devices()[0]})", file=sys.stderr)


def run_ours_cli(argv):
    """Run our CLI in-process; returns wall seconds."""
    from fscl_tpu import cli

    t0 = time.monotonic()
    cli.main(argv)
    return time.monotonic() - t0


def run_ref(argv, timeout=14400, binary=None):
    t0 = time.monotonic()
    subprocess.run([str(binary or REF_BIN)] + argv, check=True,
                   capture_output=True, timeout=timeout)
    return time.monotonic() - t0


def point_rounds_from_tsv(path, col=5):
    """Sum permute_n over output rows (schema scan-chromosome.c:731-734)."""
    tot = 0
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) > col:
                tot += int(parts[col])
    return tot


def merge_results(name, entry):
    cur = json.loads(RESULTS.read_text()) if RESULTS.exists() else {}
    cur.setdefault(name, {}).update(entry)
    RESULTS.write_text(json.dumps(cur, indent=2) + "\n")
    print(json.dumps({name: entry}, indent=2))


def _read_tsv(path):
    """[(chr, pos, clr, alpha, pcols...)] rows of a scan output TSV."""
    rows = []
    with open(path) as f:
        for line in f:
            p = line.split()
            if len(p) >= 4:
                rows.append((p[0], float(p[1]), float(p[2]), float(p[3]),
                             p[4:]))
    return rows


def compare_parity(ours_tsv, ref_tsv, clr_rtol=0.02, clr_atol=0.5,
                   perm_cols=False):
    """Programmatic ours-vs-reference output agreement for one config.

    Both scanners emit ONE row per coarse interval in (chr, interval)
    order (scan-chromosome.c:731-745 / fscl_tpu/io/output.py), so rows
    align positionally.  Checks (VERDICT r1 item 4):
      * per-interval CLR agreement within tolerance bands (ours evaluates
        a dense superset of the reference's greedy bisection probes, so
        ours may exceed ref; a DEFICIT beyond tolerance is a failure);
      * max-CLR dominance: our global max >= the reference's - atol;
      * when both carry permutation columns (``perm_cols=True``, decided
        by the caller from its run configuration — n_permute > 0 on both
        sides), per-interval p agreement as a two-sample proportion test:
        different RNG streams by design (PARITY.md), so each side's
        (permute_p, permute_n) counts estimate the same per-interval
        exceedance probability; a z-score beyond 4 combined standard
        errors flags the interval, and the gate allows a small flagged
        fraction (the pruning stop makes the counts only approximately
        binomial).
    Returns a dict merged into headline_results.json, with pass/fail.
    """
    ours = _read_tsv(ours_tsv)
    ref = _read_tsv(ref_tsv)
    out = {"parity_rows_ours": len(ours), "parity_rows_ref": len(ref)}
    if len(ours) != len(ref) or not ours:
        out["parity_pass"] = False
        out["parity_fail_reason"] = "row count mismatch"
        return out
    o_clr = np.array([r[2] for r in ours])
    r_clr = np.array([r[2] for r in ref])
    bad_ref = ~np.isfinite(r_clr)
    if bad_ref.any():
        # the reference emits infinite CLRs on singleton-free data with an
        # estimated background (PARITY.md reference bug #8) — that is a
        # reference defect, not an agreement check; fail with the reason
        out["parity_pass"] = False
        out["parity_ref_nonfinite"] = int(bad_ref.sum())
        out["parity_fail_reason"] = "reference output non-finite"
        return out
    # deficit = ref found a higher max in an interval than our dense scan
    deficit = r_clr - o_clr
    tol = clr_atol + clr_rtol * np.abs(r_clr)
    bad = deficit > tol
    out["parity_max_deficit"] = round(float(deficit.max(initial=0.0)), 4)
    out["parity_deficit_intervals"] = int(bad.sum())
    out["parity_max_clr_ours"] = round(float(o_clr.max()), 2)
    out["parity_max_clr_ref"] = round(float(r_clr.max()), 2)
    ok = (
        not bad.any()
        and o_clr.max() >= r_clr.max() - clr_atol
    )
    if perm_cols:
        try:
            co = np.array([[int(r[4][0]), int(r[4][1])] for r in ours],
                          dtype=np.float64)
            cr = np.array([[int(r[4][0]), int(r[4][1])] for r in ref],
                          dtype=np.float64)
            # p-values are comparable ONLY where both scanners discovered
            # the same per-interval maximum: our dense search finds
            # strictly higher maxima in most sweep-data intervals (e.g.
            # 12.2 vs the bisection's 1.3), and a p-value for a higher
            # threshold is legitimately smaller — comparing those would
            # flag our better search as a defect.  Restrict to
            # CLR-matched intervals (same statistic on both sides).
            matched = np.abs(o_clr - r_clr) <= np.maximum(
                0.5, 0.05 * np.abs(r_clr)
            )
            # two-sample proportion z on the exceedance counts, with a
            # continuity floor of half an exceedance per side so fully
            # unresolved intervals (p=0 on few permutations) never divide
            # by zero.  One-sided at 4 sigma: flag only intervals where
            # OUR p is smaller than the reference supports
            # (anti-conservative); our denser null statistic may sit
            # legitimately ABOVE the C's (conservative) — a documented
            # estimand difference (PARITY.md), not a defect.
            po = np.clip(co[:, 0], 0.5, None) / np.maximum(co[:, 1], 1.0)
            pr_ = np.clip(cr[:, 0], 0.5, None) / np.maximum(cr[:, 1], 1.0)
            se2 = (
                po * (1 - po) / np.maximum(co[:, 1], 1.0)
                + pr_ * (1 - pr_) / np.maximum(cr[:, 1], 1.0)
            )
            z = (po - pr_) / np.sqrt(np.maximum(se2, 1e-12))
            zm = z[matched]
            flagged = zm < -4.0
            out["parity_p_matched"] = int(matched.sum())
            out["parity_p_flagged"] = int(flagged.sum())
            out["parity_p_flagged_frac"] = round(
                float(flagged.mean()) if len(zm) else 0.0, 4
            )
            out["parity_p_zmax"] = round(
                float(np.abs(zm).max()) if len(zm) else 0.0, 2
            )
            # conservative-side divergence is recorded too (ADVICE r3):
            # the GATE stays one-sided (larger-p deviations cost power,
            # not validity — the power cost is measured separately, see
            # bench/power_recovery.py / PARITY.md), but '0 flags' claims
            # must not read as two-sided agreement
            cons = zm > 4.0
            out["parity_p_conservative_flagged"] = int(cons.sum())
            out["parity_p_conservative_frac"] = round(
                float(cons.mean()) if len(zm) else 0.0, 4
            )
            ok = ok and (len(zm) == 0 or flagged.mean() <= 0.03)
        except (ValueError, IndexError, ZeroDivisionError):
            pass
    out["parity_pass"] = bool(ok)
    return out


# ---------------------------------------------------------------- configs

def _both_nonempty(ours_out, ref_out):
    """Gate parity comparison on both TSVs existing with content — a
    --ref-only run must not compare against a stale or empty ours file."""
    return (
        ours_out.exists() and ours_out.stat().st_size > 0
        and ref_out.exists() and ref_out.stat().st_size > 0
    )


def cfg_ms_neutral(args):
    path = gen_ms_neutral()
    out = {}
    ours_out = DATA / "headline_ms_neutral.ours.tsv"
    ref_out = DATA / "headline_ms_neutral.ref.tsv"
    if not args.ref_only:
        absorb_device_tax()
        argv = ["-m", str(path), "--ms-segment-length", "1000000",
                "--compat-mirror-unfolded",  # reference bug #1 parity
                "-p", "100", "-o", str(ours_out), "-v", "2"]
        w1 = run_ours_cli(argv)
        w2 = run_ours_cli(argv)  # warm: all shapes compiled
        out.update(ours_wall_s=round(w2, 2), ours_wall_cold_s=round(w1, 2),
                   ours_point_rounds=point_rounds_from_tsv(ours_out))
    if not args.ours_only:
        ref_out.unlink(missing_ok=True)  # append-mode ms binary
        w = run_ref(["-m", str(path), "--ms-segment-length=1000000",
                     "-p", "100", "-o", str(ref_out), "-v", "0"],
                    binary=REF_MS_BIN)
        out.update(ref_wall_s=round(w, 2),
                   ref_point_rounds=point_rounds_from_tsv(ref_out))
    if _both_nonempty(ours_out, ref_out) and not args.ref_only:
        out["parity_compat_mode"] = "compat_mirror_unfolded"
        out.update(compare_parity(ours_out, ref_out, perm_cols=True))
    merge_results("ms_neutral", out)


def cfg_ms_sweep(args):
    path, seg_bp = gen_ms_sweep()
    out = {}
    ours_out = DATA / "headline_ms_sweep.ours.tsv"
    ref_out = DATA / "headline_ms_sweep.ref.tsv"
    if not args.ref_only:
        absorb_device_tax()
        argv = ["-m", str(path), "--ms-segment-length", str(seg_bp),
                "--ms-folded", "-p", "100", "-o", str(ours_out), "-v", "2"]
        w1 = run_ours_cli(argv)
        w2 = run_ours_cli(argv)
        out.update(ours_wall_s=round(w2, 2), ours_wall_cold_s=round(w1, 2),
                   ours_point_rounds=point_rounds_from_tsv(ours_out))
    if not args.ours_only:
        ref_out.unlink(missing_ok=True)  # append-mode ms binary
        w = run_ref(["-m", str(path), f"--ms-segment-length={seg_bp}",
                     "--ms-folded", "-p", "100", "-o", str(ref_out),
                     "-v", "0"], binary=REF_MS_BIN)
        out.update(ref_wall_s=round(w, 2),
                   ref_point_rounds=point_rounds_from_tsv(ref_out))
    if _both_nonempty(ours_out, ref_out) and not args.ref_only:
        # all-folded data: the mirrored-unfolded accumulation (bug #1)
        # never fires, so no compat mode is needed for model parity
        out.update(compare_parity(ours_out, ref_out, perm_cols=True))
    merge_results("ms_sweep", out)


def _pvalue_calibration(result):
    """Projected-vs-empirical p calibration over well-resolved points.

    VERDICT r1 item 8: on points with permute_p >= 20 (the pruning
    threshold — their empirical p is resolved to ~20 exceedances), the
    chi-square tail projection (engine/pvalues.py) must reproduce the
    empirical p.  Reports quantiles of |log10(proj / emp)|; ~0.3 means
    within 2x, which is the practical agreement bar for a tail fit from
    <=10k null samples.
    """
    from fscl_tpu.engine.pvalues import empirical_pvalues, projected_pvalues

    sel = np.asarray(result.permute_p) >= 20
    if not sel.any():
        return {}
    emp = empirical_pvalues(result.permute_p, result.permute_n)[sel]
    proj = projected_pvalues(result)[sel]
    ok = np.isfinite(proj) & (proj > 0) & (emp > 0)
    if not ok.any():
        return {}
    lr = np.abs(np.log10(proj[ok] / emp[ok]))
    return dict(
        pcal_points=int(ok.sum()),
        pcal_log10_median=round(float(np.median(lr)), 3),
        pcal_log10_q90=round(float(np.quantile(lr, 0.9)), 3),
    )


def _run_ours_phased(path, n_permute, asc_depth=0, asc_min=1,
                     chunk_replicates=32, null_dist_save=10000,
                     out_tsv=None, compat_mirror=False):
    """Library-level run with phase walls (scan vs permutation).

    ``compat_mirror`` reproduces the reference's mirrored-unfolded
    background accumulation (reference bug #1, PARITY.md) so parity
    comparisons run both scanners on the same model basis.
    """
    from fscl_tpu.engine import (
        PermuteConfig, ScanConfig, scan_genome, scan_permute,
    )
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables
    from fscl_tpu.utils import MSG_DEBUG1, configure_logmsg

    configure_logmsg(MSG_DEBUG1)
    absorb_device_tax()
    t0 = time.monotonic()
    data = load_snp_input(path)
    t_load = time.monotonic() - t0

    t0 = time.monotonic()
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths,
        compat_mirror_unfolded=compat_mirror,
    )
    tables = build_tables(
        fsp, data.sample_depths, grid_points=2048,
        asc_depth=asc_depth, asc_min_freq=asc_min,
    )
    data.attach_model(tables)
    t_model = time.monotonic() - t0

    scan_cfg = ScanConfig(small_grid_sp=1000, large_grid_sp=100000)
    pc = PermuteConfig(n_permute=n_permute, chunk_replicates=chunk_replicates,
                       seed=1, null_dist_save=null_dist_save)
    from fscl_tpu.engine import prewarm_scan

    t0 = time.monotonic()
    prewarm_scan(data, tables, scan_cfg)
    t_prewarm = time.monotonic() - t0
    if n_permute > 0:
        # production pipeline order: permutation programs compile in the
        # background while the scan runs (engine/permute.py prewarm);
        # its synchronous setup (hist tables, geometry checks) is timed
        # separately so phase walls sum to true wall time
        from fscl_tpu.engine.permute import prewarm_hist_permute

        t0 = time.monotonic()
        prewarm_hist_permute(data, tables, scan_cfg, pc)
        t_prewarm += time.monotonic() - t0
    t0 = time.monotonic()
    result = scan_genome(data, tables, scan_cfg)
    t_scan_cold = time.monotonic() - t0
    t0 = time.monotonic()
    result = scan_genome(data, tables, scan_cfg)
    t_scan = time.monotonic() - t0

    t0 = time.monotonic()
    scan_permute(data, tables, result, scan_cfg, pc)
    t_perm = time.monotonic() - t0
    pr = int(result.permute_n.sum())
    from fscl_tpu.engine import permute as _perm_mod

    perm_stats = {
        k: round(v, 2) if isinstance(v, float) else v
        for k, v in _perm_mod.last_stats.items()
    }
    if out_tsv is not None:
        from fscl_tpu.io import scan_output

        scan_output(str(out_tsv), data, result, n_permute=n_permute)
    extra = _pvalue_calibration(result)
    return dict(
        **extra,
        n_sites=int(data.n_snps),
        n_points=int(result.n_points),
        ours_load_s=round(t_load, 2),
        ours_model_s=round(t_model, 2),
        ours_prewarm_s=round(t_prewarm, 2),
        ours_scan_s=round(t_scan, 2),
        ours_scan_cold_s=round(t_scan_cold, 2),
        ours_perm_s=round(t_perm, 2),
        ours_point_rounds=pr,
        ours_point_rounds_per_s=round(pr / max(t_perm, 1e-9), 1),
        ours_max_clr=round(float(result.clr.max()), 2),
        ours_finished_points=int(result.permute_finished.sum()),
        perm_stats=perm_stats,
    )


def cfg_asc100k(args):
    """Ascertainment headline.  The dataset is all-UNFOLDED, so the
    reference's background estimate is mirrored (reference bug #1,
    background-fsp.c:226-233) — parity therefore runs ours in
    --compat-mirror-unfolded mode so both scanners share the model basis
    (VERDICT r2 item 1); the documented-default model differs deliberately.
    """
    path = gen_asc100k()
    out = {}
    ours_out = DATA / "headline_asc100k.ours.tsv"
    ref_out = DATA / "headline_asc100k.ref.tsv"
    if not args.ref_only:
        out.update(_run_ours_phased(path, 10_000, asc_depth=20, asc_min=2,
                                    out_tsv=ours_out,
                                    compat_mirror=not args.no_compat))
    if not args.ours_only:
        n_ref = int(args.ref_permute or 100)
        w_scan = run_ref(["-f", str(path), "-o", str(ref_out),
                          "-d", "20", "--asc-minimum-freq=2", "-v", "0"])
        w = run_ref(["-f", str(path), "-o", str(ref_out),
                     "-d", "20", "--asc-minimum-freq=2",
                     "-p", str(n_ref), "-v", "0"])
        pr = point_rounds_from_tsv(ref_out)
        out.update(
            ref_scan_s=round(w_scan, 2), ref_n_permute=n_ref,
            ref_perm_s=round(w - w_scan, 2), ref_point_rounds=pr,
            ref_point_rounds_per_s=round(pr / max(w - w_scan, 1e-9), 2),
        )
    if _both_nonempty(ours_out, ref_out) and not args.ref_only:
        out["parity_compat_mode"] = (
            "default" if args.no_compat else "compat_mirror_unfolded"
        )
        out.update(compare_parity(ours_out, ref_out, perm_cols=True))
    merge_results("asc100k", out)


def cfg_mixed100k(args):
    """Mixed/missing-depth headline: 31 distinct depths + folded mix.

    70% of sites are unfolded, so reference bug #1 mirrors its estimated
    background — parity runs in compat mode like asc100k.
    """
    path = gen_mixed100k()
    out = {}
    ours_out = DATA / "headline_mixed100k.ours.tsv"
    ref_out = DATA / "headline_mixed100k.ref.tsv"
    if not args.ref_only:
        out.update(_run_ours_phased(path, 10_000, out_tsv=ours_out,
                                    compat_mirror=not args.no_compat))
    if not args.ours_only:
        n_ref = int(args.ref_permute or 50)
        w_scan = run_ref(["-f", str(path), "-o", str(ref_out), "-v", "0"])
        w = run_ref(["-f", str(path), "-o", str(ref_out),
                     "-p", str(n_ref), "-v", "0"])
        pr = point_rounds_from_tsv(ref_out)
        out.update(
            ref_scan_s=round(w_scan, 2), ref_n_permute=n_ref,
            ref_perm_s=round(w - w_scan, 2), ref_point_rounds=pr,
            ref_point_rounds_per_s=round(pr / max(w - w_scan, 1e-9), 2),
        )
    if _both_nonempty(ours_out, ref_out) and not args.ref_only:
        out["parity_compat_mode"] = (
            "default" if args.no_compat else "compat_mirror_unfolded"
        )
        out.update(compare_parity(ours_out, ref_out, perm_cols=True))
    merge_results("mixed100k", out)


def genome1m_neutral_parity(run_ours=True, run_ref_side=True):
    """At-scale CLR parity for genome1m under the forced neutral spectrum.

    The K>=2 rare-allele filter leaves the dataset singleton-free, and the
    reference emits INFINITE CLRs genome-wide when it estimates a
    background from such data (reference bug #8, PARITY.md: the f=1 class
    of the estimated spectrum is zero and the sweep-model log-prob spline
    pipeline diverges; injecting a dozen singletons restores finite
    output).  Parity at this scale therefore compares both scanners with
    --force-neutral-spectrum — same data, same model basis, scan-only —
    while the performance numbers stay on the estimated-background
    config, whose model path is parity-checked on the singleton-carrying
    configs (ms_*, mixed100k).
    """
    path = gen_genome1m()
    ours_out = DATA / "headline_genome1m_neutral.ours.tsv"
    ref_out = DATA / "headline_genome1m_neutral.ref.tsv"
    out = {}
    if run_ours:
        out["neutral_ours_scan_s"] = round(run_ours_cli(
            ["-f", str(path), "-o", str(ours_out),
             "--force-neutral-spectrum", "-v", "0"]
        ), 2)
    if run_ref_side:
        out["neutral_ref_scan_s"] = round(run_ref(
            ["-f", str(path), "-o", str(ref_out),
             "--force-neutral-spectrum", "-v", "0"]
        ), 2)
    if _both_nonempty(ours_out, ref_out) and run_ours:
        out.update({
            "neutral_" + k: v
            for k, v in compare_parity(ours_out, ref_out).items()
        })
    return out


def cfg_genome1m(args):
    path = gen_genome1m()
    out = {}
    ours_out = DATA / "headline_genome1m.ours.tsv"
    ref_out = DATA / "headline_genome1m.ref.tsv"
    if not args.ref_only:
        out.update(_run_ours_phased(path, 100_000, out_tsv=ours_out))
    if not args.ours_only:
        n_ref = int(args.ref_permute or 20)
        w_scan = run_ref(["-f", str(path), "-o", str(ref_out), "-v", "0"])
        w = run_ref(["-f", str(path), "-o", str(ref_out),
                     "-p", str(n_ref), "-v", "0"])
        pr = point_rounds_from_tsv(ref_out)
        out.update(
            ref_scan_s=round(w_scan, 2), ref_n_permute=n_ref,
            ref_perm_s=round(w - w_scan, 2), ref_point_rounds=pr,
            ref_point_rounds_per_s=round(pr / max(w - w_scan, 1e-9), 2),
        )
    if _both_nonempty(ours_out, ref_out) and not args.ref_only:
        out.update(compare_parity(ours_out, ref_out, perm_cols=True))
    out.update(genome1m_neutral_parity(
        run_ours=not args.ref_only, run_ref_side=not args.ours_only
    ))
    merge_results("genome1m", out)


CONFIGS = dict(ms_neutral=cfg_ms_neutral, ms_sweep=cfg_ms_sweep,
               asc100k=cfg_asc100k, mixed100k=cfg_mixed100k,
               genome1m=cfg_genome1m)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=sorted(CONFIGS))
    ap.add_argument("--ref-only", action="store_true")
    ap.add_argument("--ours-only", action="store_true")
    ap.add_argument("--ref-permute", type=int, default=0,
                    help="permutation count for the reference side "
                    "(rate extrapolates; default per config)")
    ap.add_argument("--no-compat", action="store_true",
                    help="run ours with the documented-default background "
                    "(not the reference's mirrored-unfolded accumulation); "
                    "parity is expected to fail in this mode on "
                    "unfolded-site configs")
    args = ap.parse_args()
    CONFIGS[args.config](args)


if __name__ == "__main__":
    main()

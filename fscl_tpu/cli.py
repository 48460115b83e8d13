"""Command-line driver mirroring the reference fscl binary.

Option table mirrors /root/reference/fscl.c:38-102; validation mirrors
validate_options (fscl.c:180-258).  Pipeline (fscl.c:272-341):
  options -> input -> background SFS -> sweep-model tables -> null model ->
  scan -> permute -> output.

TPU-specific additions: --grid-points (the dense log_ad grid replacing
--splines; --splines is still accepted and mapped), --chunk, --seed,
--checkpoint-every.  --n-threads is accepted for compatibility; parallelism
here is device-level (see fscl_tpu.parallel).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from . import __version__
from .data import SNPData
from .engine import PermuteConfig, ScanConfig, scan_genome, scan_permute
from .io import load_snp_input, load_spectra, scan_output, write_spectra
from .io.output import write_null_distribution
from .models import background_fsp, build_tables
from .models.tables import DEFAULT_GRID_POINTS
from .utils import MSG_ERROR, MSG_STATUS, configure_logmsg, logmsg


def build_parser():
    p = argparse.ArgumentParser(
        prog="fscl-tpu",
        description="TPU-native frequency-spectrum composite-likelihood sweep scan",
    )
    a = p.add_argument
    a("-f", "--snpfile", help="File name of file with SNP frequency data")
    a("-d", "--asc-depth", type=int, default=0, help="Depth of SNP ascertainment sample")
    a("--asc-minimum-freq", type=int, default=1,
      help="minimum number of observations of both alleles for SNP ascertainment")
    a("-p", "--n-permute", type=int, default=0,
      help="number of snp block permutations for p-value computations")
    a("--permute-nbp", type=float, default=0.1,
      help="probability for switching to a new snp block for permutations")
    a("--n-threads", type=int, default=1,
      help="accepted for compatibility; parallelism is device-level")
    a("-a", "--alpha-factor", type=float, default=1.0,
      help="multiply 1/alpha by this factor to determine single sweep window size")
    a("-g", "--fine-grid-spacing", type=int, default=1000,
      help="Spacing of candidate sweep points along the chromosome (in bp)")
    a("-G", "--coarse-grid-spacing", type=int, default=100000,
      help="Size of coarse grid in which CLR maxima will be selected")
    a("-w", "--sweep-width", type=float, default=1.0,
      help="maximum width of sweep effect in scanning, in Mb")
    a("--minimum-depth", type=int, default=5,
      help="minimum depth of sample (lower depth SNPs ignored)")
    a("-m", "--msfile", help="Name of an ms output file")
    a("--ms-segment-length", type=int, default=0,
      help="Length in bp of simulated ms segments (use with -m option only)")
    a("--ms-folded", action="store_true", help="For ms input, treat all sites as folded")
    a("--max-only", action="store_true",
      help="for ms input, output only the maximum CLR for each input block")
    a("--ms-sample-first", type=int, default=0,
      help="index of first chromosome in ms sample to analyze")
    a("--ms-sample-size", type=int, default=0,
      help="number of consecutive chromosomes in ms output to take as the sample")
    a("--force-neutral-spectrum", action="store_true",
      help="Do not estimate background spectrum from the data. Use sum(1/i)/i")
    a("-b", "--background-spectrum",
      help="Load the background frequency spectrum from a file")
    a("--output-bs", help="write estimated background site-frequency spectra to file")
    a("--include-invariant", action="store_true",
      help="Include invariant sites in analysis (default is to ignore them)")
    a("--splines", type=int, default=0,
      help="compatibility alias: spline knot count; mapped to --grid-points")
    a("--grid-points", type=int, default=DEFAULT_GRID_POINTS,
      help="dense log(alpha*d) grid resolution for the sweep-model tables")
    a("--prepend-label", help="optional token to prepend to each line of the output")
    a("-v", "--verbosity", type=int, default=3,
      help="verbosity level 0-5, default 3, debug 4 and above")
    a("-o", "--output-file", help="output file for scan results")
    a("--no-scan", action="store_true",
      help="do not scan chromosome, compute background frequency spectrum only")
    a("--ascbias-background-only", action="store_true",
      help="correct for ascertainment bias only in estimating the background "
      "site frequency spectrum")
    # TPU-native knobs
    a("--eval-range", type=int, default=81920,
      help="+- SNPs in each candidate evaluation window")
    a("--bp-resl", type=int, default=128, help="position refinement resolution (bp)")
    a("--chunk", type=int, default=32, help="candidate chunk size in the CLR kernel")
    a("--chunk-replicates", type=int, default=16,
      help="permutation replicates evaluated per device round")
    a("--seed", type=int, default=0xFD821A6,
      help="RNG seed (reference default is this hard-coded value, fscl.c:134)")
    a("--no-refine", action="store_true", help="skip bp_resl position refinement")
    a("--no-hist", action="store_true",
      help="disable the histogram fast path (ops/histclr.py) for scan and "
      "permutation; use the per-site lattice kernel everywhere")
    a("--checkpoint", help="permutation checkpoint file (.npz); saved "
      "after each chunk, auto-resumed when the file exists")
    a("--compat-mirror-unfolded", action="store_true",
      help="replicate the reference's mirrored accumulation of unfolded sites "
      "in the background spectrum (for parity testing)")
    a("--version", action="version", version=f"fscl-tpu {__version__}")
    return p


def validate_args(args):
    stop = []
    configure_logmsg(max(args.verbosity, 0))
    if args.minimum_depth < 5:
        args.minimum_depth = 5
    if args.splines:
        if args.splines < 200:
            stop.append("must use at least 200 spline functions / grid points")
        args.grid_points = max(args.splines + 1, args.grid_points)
    if not args.snpfile and not args.msfile:
        stop.append("input snp frequency file or ms file not specified (use -f or -m)")
    if args.snpfile and args.msfile:
        stop.append("specify either a snp frequency file or an ms file, not both")
    if not args.output_file:
        stop.append("specify an output file name with -o option")
    if args.ms_segment_length and not args.msfile:
        logmsg(MSG_ERROR, "--ms-segment-length ignored without -m")
        args.ms_segment_length = 0
    if args.asc_depth == 1 or args.asc_depth < 0:
        stop.append("if specified, ascertainment sample depth must be at least 2")
    if args.asc_depth >= 2 and args.asc_minimum_freq > 2 * args.asc_depth:
        stop.append("SNP ascertainment impossible with these asc settings")
    if args.asc_depth >= 2 and args.asc_minimum_freq == 0:
        args.asc_minimum_freq = 1
    if args.fine_grid_spacing < 1 and not args.output_bs:
        stop.append("specify sweep position grid spacing with -g option (in bp)")
    if (
        not args.output_bs
        and args.fine_grid_spacing >= 1
        and args.coarse_grid_spacing % args.fine_grid_spacing != 0
    ):
        stop.append("fine grid spacing must evenly divide coarse grid spacing")
    if stop:
        for s in stop:
            logmsg(MSG_ERROR, "Error: %s", s)
        raise SystemExit(255)
    return args


def _pipeline_snp_data(data: SNPData, args):
    """background -> tables -> scan -> permute -> output for one dataset."""
    loaded = load_spectra(args.background_spectrum) if args.background_spectrum else None
    fsp = background_fsp(
        data.obs_freq,
        data.depth_p,
        data.folded,
        data.sample_depths,
        force_neutral_spectrum=args.force_neutral_spectrum,
        loaded_spectra=loaded,
        include_invariant=args.include_invariant,
        compat_mirror_unfolded=args.compat_mirror_unfolded,
    )
    if args.output_bs:
        write_spectra(args.output_bs, data.sample_depths, fsp)
    if args.no_scan:
        return None

    from .utils.timing import phase

    logmsg(MSG_STATUS, "Computing sweep models for all sample depths")
    with phase("tables"):
        tables = build_tables(
            fsp,
            data.sample_depths,
            grid_points=args.grid_points,
            asc_depth=args.asc_depth,
            asc_min_freq=args.asc_minimum_freq,
            ascbias_background_only=args.ascbias_background_only,
            include_invariant=args.include_invariant,
        )
    data.attach_model(tables)

    from .ops.lattice import LatticeTables

    with phase("lattice-pack"):
        lattice = LatticeTables(tables.table, tables.grid_points)
    scan_cfg = ScanConfig(
        eval_range=args.eval_range,
        bp_resl=args.bp_resl,
        small_grid_sp=args.fine_grid_spacing,
        large_grid_sp=args.coarse_grid_spacing,
        chunk=args.chunk,
        refine=not args.no_refine,
        use_hist=not args.no_hist,
    )
    # scan-stage programs compile in the background starting NOW — a cold
    # process otherwise serializes one tunnel compile per fused stage into
    # the scan wall (engine/scan.py prewarm_scan)
    from .engine import prewarm_scan

    prewarm_scan(data, tables, scan_cfg)
    perm_cfg = None
    if args.n_permute > 0:
        perm_cfg = PermuteConfig(
            n_permute=args.n_permute,
            permute_nbp=args.permute_nbp,
            scan_width_mb=args.sweep_width,
            chunk_replicates=args.chunk_replicates,
            seed=args.seed,
            alpha_factor=args.alpha_factor,
            checkpoint_path=args.checkpoint,
            use_hist=not args.no_hist,
        )
        # permutation program shapes are a pure function of the dataset
        # geometry — compile them in the background while the scan runs
        from .engine.permute import prewarm_hist_permute

        prewarm_hist_permute(data, tables, scan_cfg, perm_cfg)

    with phase("scan"):
        result = scan_genome(data, tables, scan_cfg, lattice=lattice)

    if perm_cfg is not None:

        def dump():
            scan_output(
                args.output_file, data, result, False, args.n_permute,
                args.prepend_label,
            )
            write_null_distribution(args.output_file, data, result)

        with phase("permute"):
            scan_permute(
                data, tables, result, scan_cfg, perm_cfg, dump_fn=dump,
                lattice=lattice,
            )
    return result


def _enable_compile_cache():
    """Persistent compilation cache (compiles through remote TPU tunnels can
    take minutes; cached recompiles are ~0.1s)."""
    import os

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.join(os.path.expanduser("~"), ".cache", "fscl_tpu_xla"),
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass


def main(argv=None):
    _enable_compile_cache()
    args = validate_args(build_parser().parse_args(argv))

    if args.msfile:
        from .io.ms_input import ms_pipeline

        return ms_pipeline(args, _pipeline_snp_data)

    data = load_snp_input(
        args.snpfile,
        include_invariant=args.include_invariant,
        minimum_obs_depth=args.minimum_depth,
    )
    result = _pipeline_snp_data(data, args)
    if result is not None:
        scan_output(
            args.output_file,
            data,
            result,
            maximum_only=args.max_only,
            n_permute=args.n_permute,
            prepend_label=args.prepend_label,
        )
        if args.n_permute > 0:
            write_null_distribution(args.output_file, data, result)
    return 0


if __name__ == "__main__":
    sys.exit(main())

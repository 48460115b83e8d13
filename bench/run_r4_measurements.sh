#!/bin/sh
# Round-4 measurement batch: one config at a time on the single TPU.
# Order: headline (genome1m + neutral parity + pruning tail) first, then
# the first-run (cold persistent cache) protocol, then the smaller
# configs.  Ours-only where the round-3 reference TSV/rate on disk is
# still valid (same data files, same reference binary); ms configs
# re-run both sides (cheap) so the parity gates compare fresh outputs.
# The power-recovery reference side (subprocesses, CPU) can run ahead of
# or concurrently with the TPU stages; its ours side needs the TPU.
set -x
cd "$(dirname "$0")/.."
python bench/power_recovery.py --ref-only --workers 2 --reps 48 2>>bench/r4_run.log
python bench/run_r4_genome1m.py 2>>bench/r4_run.log
python bench/run_r3_first.py 2>>bench/r4_run.log
python bench.py 2>>bench/r4_run.log
python bench/headline.py ms_neutral 2>>bench/r4_run.log
python bench/headline.py ms_sweep 2>>bench/r4_run.log
python bench/headline.py asc100k --ours-only 2>>bench/r4_run.log
python bench/headline.py mixed100k --ours-only 2>>bench/r4_run.log
python bench/power_recovery.py --ours-only --reps 48 2>>bench/r4_run.log
python bench/make_round_table.py 4

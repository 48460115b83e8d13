#!/bin/sh
# Round-4 measurement batch: one config at a time on the single TPU.
# Ours-only where the round-3 reference TSV/rate on disk is still valid
# (same data files, same reference binary); ms configs re-run both sides
# (cheap) so the parity gates compare fresh outputs.
set -x
cd "$(dirname "$0")/.."
python bench/headline.py ms_neutral 2>>bench/r4_run.log
python bench/headline.py ms_sweep 2>>bench/r4_run.log
python bench/headline.py asc100k --ours-only 2>>bench/r4_run.log
python bench/headline.py mixed100k --ours-only 2>>bench/r4_run.log

#!/bin/sh
# Build the reference C binary for benchmarking (one full build, two
# names: bench/fscl_ref_ms and its copy bench/fscl_ref, kept for scripts
# that predate ms support).  Includes stub GSL (refstubs/stubs.c) and
# working ms input: refstubs/msparse.c replaces the flex/bison parser
# absent from this image; refstubs/msinput_fixed.c replaces the
# reference's ms-input.c, which never initializes chr_limits and crashes
# as shipped (PARITY.md bug #6).
#
# Both binaries get ONE one-line patch, applied to a /tmp copy of
# scan-chromosome.c (the file at /root/reference is read-only and is never
# modified): snp_block_permute's overrun branch sets j = n_snps - k with
# k > n_snps, making j NEGATIVE and swapping out-of-bounds heap memory
# (PARITY.md bug #7; ASan-verified).  Without the patch the reference
# corrupts memory every ~100 permutation rounds and eventually segfaults,
# so no timing run of useful length completes.
set -e
cd "$(dirname "$0")/.."
REF=/root/reference
PATCHED=/tmp/fscl_ref_patched
mkdir -p "$PATCHED"
# fail fast if the buggy line drifted — a silent sed no-op would rebuild
# the heap-corrupting binary with no indication the patch was missing
grep -q 'j = n_snps - k;' "$REF/scan-chromosome.c" || {
  echo "build_ref.sh: bug #7 pattern not found in scan-chromosome.c" >&2
  exit 1
}
sed 's/j = n_snps - k;/\/* bench fix: j = n_snps - k made j negative *\//' \
    "$REF/scan-chromosome.c" > "$PATCHED/scan-chromosome.c"

# The ms binary additionally opens the per-block output in APPEND mode:
# the reference reopens it with "w" for every ms block so only the last
# replicate's rows survive (PARITY.md bug #3) — useless for a per-block
# parity comparison.  Harness callers unlink the file before each run.
grep -q 'fopen(output_fname, "w")' "$REF/scan-chromosome.c" || {
  echo "build_ref.sh: output fopen pattern not found" >&2
  exit 1
}
sed 's/fopen(output_fname, "w")/fopen(output_fname, "a")/' \
    "$PATCHED/scan-chromosome.c" > "$PATCHED/scan-chromosome-ms.c"

common() {
  echo "$REF/fscl.c $REF/snp-input.c $REF/background-fsp.c $REF/asc-bias.c
        $REF/sm-spline.c $REF/sm-search.c $1
        $REF/logmsg.c $REF/cmdline-utils.c bench/refstubs/stubs.c"
}

gcc -O2 -march=native -fopenmp -I"$REF" -Ibench/refstubs \
    -o bench/fscl_ref_ms $(common "$PATCHED/scan-chromosome-ms.c") \
    bench/refstubs/msparse.c bench/refstubs/msinput_fixed.c \
    -lm -lpthread 2>/dev/null
gcc -O2 -march=native -fopenmp -I"$REF" -Ibench/refstubs \
    -o bench/fscl_ref $(common "$PATCHED/scan-chromosome.c") \
    bench/refstubs/msparse.c bench/refstubs/msinput_fixed.c \
    -lm -lpthread 2>/dev/null
echo "built bench/fscl_ref_ms (append-mode output) and bench/fscl_ref"

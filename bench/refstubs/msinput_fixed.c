/* Corrected ms-input adapter for the reference benchmark build.
   The reference's own ms-input.c leaves chr_limits/n_chromosomes
   UNINITIALIZED in both ms_background and ms_next_block (ms-input.c:1-151)
   and never increments n_depths in ms_next_block, so its -m scan path
   crashes in scan_chromosome (scan-chromosome.c:253) and scan_free
   (fscl.c:267-268); the folded branch also zeroes minor-allele counts
   when d <= n-d (ms-input.c:138-140).  This file provides working
   replacements with the intended semantics so the reference's NUMERICAL
   path (background, sweep tables, scan, permutation) can be timed on ms
   input.  Fresh code against fscl.h/msparser.h, not a copy. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <fscl.h>
#include <msparser.h>
#include <kmacros.h>

static FILE *msfp = NULL;
static int block_counter = 0;

void ms_openfile(char *ms_fname) {
  if (msfp) fclose(msfp);
  msfp = fopen(ms_fname, "r");
  if (!msfp) {
    fprintf(stderr, "Can't open ms file \"%s\"\n", ms_fname);
    exit(1);
  }
  msparser_setfile(msfp);
  block_counter = 0;
}

static scan_t *new_scan(void) {
  scan_t *s = calloc(1, sizeof(scan_t));
  return s;
}

static int depth_index(scan_t *s, int depth) {
  int j = 0;
  while (j < s->n_depths && s->sample_depths[j] != depth) j++;
  if (j == s->n_depths) {
    if (s->n_depths % 32 == 0)
      RA(s->sample_depths, sizeof(int) * (s->n_depths + 32));
    s->sample_depths[s->n_depths++] = depth;
  }
  return j;
}

/* append one block's segregating sites; returns new snp count */
static int append_block(scan_t *s, msblock_t *msb, int n_snps,
                        long offset_bp, int seg_len, int folded,
                        int first, int size) {
  if (size == 0) size = msb->n_haplotypes - first;
  if (msb->n_poly == 0 || size <= 0) return n_snps; /* empty block: no
    sites, and registering a depth-0 spectrum row would pollute the
    background table */
  int m = depth_index(s, size);
  for (int i = 0; i < msb->n_poly; i++) {
    int d = 0;
    for (int j = first; j < first + size; j++)
      if (msb->haplotypes[j][i] == '1') d++;
    if (d == 0 || d == size) continue;
    if (n_snps % SNP_ALLOC_STEP == 0)
      RA(s->snps, sizeof(snp_t) * (n_snps + SNP_ALLOC_STEP));
    snp_t *sp = s->snps + n_snps;
    sp->chr = 0;
    sp->pos = (int)(msb->positions[i] * seg_len + offset_bp);
    sp->null_logl = 0.0;
    sp->depth_p = m;
    if (folded) {
      sp->obs_freq = d <= size - d ? d : size - d;
      sp->folded = 1;
    } else {
      sp->obs_freq = d;
      sp->folded = 0;
    }
    n_snps++;
  }
  return n_snps;
}

static void set_limits(scan_t *s) {
  s->n_chromosomes = 1;
  MA(s->chr_limits, sizeof(chr_limits_t));
  s->chr_limits[0].chr = 0;
  MA(s->chr_limits[0].name, 8);
  strcpy(s->chr_limits[0].name, "ms");
  s->chr_limits[0].start_index = 0;
  s->chr_limits[0].n_snps = s->n_snps;
  s->chr_limits[0].start_pos = s->n_snps ? s->snps[0].pos : 0;
  s->chr_limits[0].bp_length = s->n_snps ? s->snps[s->n_snps - 1].pos : 0;
}

scan_t *ms_background(char *ms_fname, int ms_segment_length, int ms_folded,
                      int ms_sample_first, int ms_sample_size) {
  ms_openfile(ms_fname);
  scan_t *s = new_scan();
  msblock_t *msb;
  int n_snps = 0, nb = 0;
  while ((msb = msparser_block())) {
    n_snps = append_block(s, msb, n_snps, (long)nb * ms_segment_length,
                          ms_segment_length, ms_folded,
                          ms_sample_first, ms_sample_size);
    msparser_block_free(msb);
    nb++;
  }
  s->n_snps = n_snps;
  set_limits(s);
  fclose(msfp);
  msfp = NULL;
  return s;
}

scan_t *ms_next_block(int ms_segment_length, int ms_folded,
                      int ms_sample_first, int ms_sample_size) {
  msblock_t *msb = msparser_block();
  if (!msb) return NULL;
  scan_t *s = new_scan();
  s->n_snps = append_block(s, msb, 0, 0, ms_segment_length, ms_folded,
                           ms_sample_first, ms_sample_size);
  msparser_block_free(msb);
  set_limits(s);
  block_counter++;
  return s;
}

/* Hand-rolled replacement for the reference's flex/bison ms parser
   (ms-parser.y + ms-scanner.lex) so the benchmark build of the reference
   supports -m input without flex/bison in this image.  Implements only the
   API surface ms-input.c uses (msparser.h:46-48): msparser_setfile,
   msparser_block, msparser_block_free.  Line-oriented: blocks start at
   "//", then "segsites: n", optional "prob: p", "positions: ...", then
   0/1 haplotype rows until a blank line or EOF.  Marginal gene trees
   "[size](tree);" lines are skipped (only msblock_fsbranch_lengths would
   need them, which the fscl binary's -m path never calls). */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <msparser.h>

static FILE *ms_fp = NULL;

yyscan_t msparser_setfile(FILE *f) {
  ms_fp = f;
  return (yyscan_t)f;
}

static char *read_line(void) {
  static char *buf = NULL;
  static size_t cap = 0;
  ssize_t n = getline(&buf, &cap, ms_fp);
  if (n < 0) return NULL;
  while (n > 0 && (buf[n - 1] == '\n' || buf[n - 1] == '\r')) buf[--n] = 0;
  return buf;
}

msblock_t *msparser_block(void) {
  char *line;
  if (!ms_fp) return NULL;
  /* seek the next block start */
  for (;;) {
    line = read_line();
    if (!line) return NULL;
    if (line[0] == '/' && line[1] == '/') break;
  }
  msblock_t *msb = calloc(1, sizeof(msblock_t));
  long n_poly = -1;
  /* header lines: skip trees, read segsites / prob / positions */
  for (;;) {
    long fpos = ftell(ms_fp);
    line = read_line();
    if (!line) {
      /* EOF after "segsites: 0" with no positions line: empty block */
      if (n_poly == 0) return msb;
      free(msb);
      return NULL;
    }
    if (line[0] == '/' && line[1] == '/') {
      /* next block started: only legal after "segsites: 0" (ms emits no
         positions/haplotypes then) — push it back and return empty */
      fseek(ms_fp, fpos, SEEK_SET);
      if (n_poly == 0) return msb;
      fprintf(stderr, "ms parse: block without positions\n");
      free(msb);
      return NULL;
    }
    if (line[0] == '[' || line[0] == '(') continue; /* marginal trees */
    if (!strncmp(line, "segsites:", 9)) {
      n_poly = strtol(line + 9, NULL, 10);
      continue;
    }
    if (!strncmp(line, "prob:", 5)) {
      msb->prob = strtod(line + 5, NULL);
      continue;
    }
    if (!strncmp(line, "positions:", 10)) {
      if (n_poly < 0) n_poly = 0;
      msb->n_poly = (int)n_poly;
      msb->positions = malloc(sizeof(double) * (n_poly > 0 ? n_poly : 1));
      char *p = line + 10;
      for (long i = 0; i < n_poly; i++) {
        char *end;
        msb->positions[i] = strtod(p, &end);
        if (end == p) {
          fprintf(stderr, "ms parse: fewer positions than segsites\n");
          msb->n_poly = (int)i;
          break;
        }
        p = end;
      }
      break;
    }
    if (!line[0]) continue;
    fprintf(stderr, "ms parse: unexpected line '%s'\n", line);
  }
  /* haplotype rows: 0/1 strings until blank line / EOF / next block */
  int cap = 16, nh = 0;
  char **haps = malloc(sizeof(char *) * cap);
  for (;;) {
    long fpos = ftell(ms_fp);
    line = read_line();
    if (!line || !line[0]) break;
    if (line[0] == '/' && line[1] == '/') { fseek(ms_fp, fpos, SEEK_SET); break; }
    if (nh == cap) { cap *= 2; haps = realloc(haps, sizeof(char *) * cap); }
    haps[nh++] = strdup(line);
  }
  msb->n_haplotypes = nh;
  msb->haplotypes = haps;
  msb->n_segments = 0;
  msb->segments = NULL;
  msb->gspace = NULL;
  return msb;
}

void msparser_block_free(msblock_t *msb) {
  if (!msb) return;
  for (int i = 0; i < msb->n_haplotypes; i++) free(msb->haplotypes[i]);
  free(msb->haplotypes);
  free(msb->positions);
  free(msb->segments);
  free(msb);
}

/* Stub implementations: GSL RNG (xorshift, only used for seeding paths the
   reference never exercises in SNP-file mode) and the ms-input entry points
   (SNP-file benchmarks never call them). */
#include <stdio.h>
#include <stdlib.h>
#include <math.h>
#include <gsl/gsl_rng.h>

static const gsl_rng_type taus_type = { "taus-stub" };
const gsl_rng_type *gsl_rng_taus = &taus_type;

gsl_rng *gsl_rng_alloc(const gsl_rng_type *T) {
  (void)T;
  gsl_rng *r = malloc(sizeof(gsl_rng));
  r->s = 88172645463325252ULL;
  return r;
}
void gsl_rng_set(gsl_rng *r, unsigned long seed) { r->s = seed ? seed : 1; }
double gsl_rng_uniform(gsl_rng *r) {
  r->s ^= r->s << 13; r->s ^= r->s >> 7; r->s ^= r->s << 17;
  return (r->s >> 11) * (1.0 / 9007199254740992.0);
}
void gsl_rng_free(gsl_rng *r) { free(r); }
double gsl_ran_lognormal(gsl_rng *r, double zeta, double sigma) {
  (void)r; (void)zeta; (void)sigma; return 1.0;
}
double gsl_ran_gaussian(gsl_rng *r, double sigma) { (void)r; (void)sigma; return 0.0; }


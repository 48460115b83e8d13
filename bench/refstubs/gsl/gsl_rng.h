/* Minimal GSL RNG stub for building the reference binary for baseline
   timing only (the reference uses gsl_rng_alloc/set once and libc rand()
   for everything hot). NOT GSL code. */
#ifndef STUB_GSL_RNG_H
#define STUB_GSL_RNG_H
typedef struct { unsigned long long s; } gsl_rng;
typedef struct { const char *name; } gsl_rng_type;
extern const gsl_rng_type *gsl_rng_taus;
gsl_rng *gsl_rng_alloc(const gsl_rng_type *T);
void gsl_rng_set(gsl_rng *r, unsigned long seed);
double gsl_rng_uniform(gsl_rng *r);
void gsl_rng_free(gsl_rng *r);
#endif

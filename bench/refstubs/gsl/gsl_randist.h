#ifndef STUB_GSL_RANDIST_H
#define STUB_GSL_RANDIST_H
#include <gsl/gsl_rng.h>
double gsl_ran_lognormal(gsl_rng *r, double zeta, double sigma);
double gsl_ran_gaussian(gsl_rng *r, double sigma);
#endif

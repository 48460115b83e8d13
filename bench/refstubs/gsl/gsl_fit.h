#ifndef STUB_GSL_FIT_H
#define STUB_GSL_FIT_H
#endif

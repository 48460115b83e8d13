/* fastio: C extension for host-side input hot paths.
 *
 * The TPU compute path is JAX/XLA; the remaining native-code obligation is
 * the I/O front end the reference implements in C (snp-input.c's line parser
 * and the flex/bison ms lexer).  Python-loop parsing of a multi-million-line
 * SNP file costs minutes; this extension parses it in one pass.
 *
 * Exposes:
 *   parse_snp_file(path) -> (list[str] chr, int64[] pos, int64[] freq,
 *                            int64[] size, int64[] folded)
 *     Whitespace rows "chr pos freq size folded"; '#' comments and blank
 *     lines skipped; short rows skipped (matching snp-input.c:49-62 --
 *     filtering and folding stay in Python where the policy flags live).
 *   parse_ms_haplotypes(lines: list[bytes]) -> uint8[n_hap, n_poly]
 *     0/1 character rows to a matrix without a Python char loop.
 *
 * Built with setuptools (see fscl_tpu/native/setup.py); the Python reader
 * falls back to a pure-Python loop when the extension is absent.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <ctype.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
  int64_t *data;
  size_t n, cap;
} i64vec;

static int i64vec_push(i64vec *v, int64_t x) {
  if (v->n == v->cap) {
    size_t ncap = v->cap ? v->cap * 2 : 65536;
    int64_t *nd = realloc(v->data, ncap * sizeof(int64_t));
    if (!nd) return -1;
    v->data = nd;
    v->cap = ncap;
  }
  v->data[v->n++] = x;
  return 0;
}

static PyObject *i64vec_to_array(i64vec *v) {
  /* Build a numpy array without linking numpy headers: create a bytes
     object and frombuffer it on the Python side?  Simpler: use the buffer
     via PyByteArray + np.frombuffer in the Python wrapper.  Here we return
     a bytes object holding the raw little-endian int64 data. */
  return PyBytes_FromStringAndSize((const char *)v->data,
                                   (Py_ssize_t)(v->n * sizeof(int64_t)));
}

static PyObject *parse_snp_file_raw(PyObject *self, PyObject *args) {
  const char *path;
  if (!PyArg_ParseTuple(args, "s", &path)) return NULL;

  FILE *f = fopen(path, "r");
  if (!f) {
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return NULL;
  }

  PyObject *chrs = PyList_New(0);
  i64vec pos = {0}, freq = {0}, size = {0}, fold = {0};
  char *line = NULL;
  size_t cap = 0;
  ssize_t len;
  int ok = 1;

  while (ok && (len = getline(&line, &cap, f)) != -1) {
    char *p = line;
    while (*p == ' ' || *p == '\t') p++;
    if (*p == '#' || *p == '\n' || *p == '\r' || *p == 0) continue;

    /* chr token */
    char *chr_start = p;
    while (*p && !isspace((unsigned char)*p)) p++;
    if (!*p) continue;
    size_t chr_len = (size_t)(p - chr_start);

    char *end;
    long long v_pos = strtoll(p, &end, 10);
    if (end == p) continue;
    p = end;
    long long v_freq = strtoll(p, &end, 10);
    if (end == p) continue;
    p = end;
    long long v_size = strtoll(p, &end, 10);
    if (end == p) continue;
    p = end;
    long long v_fold = strtoll(p, &end, 10);
    if (end == p) continue;

    PyObject *cs = PyUnicode_FromStringAndSize(chr_start, (Py_ssize_t)chr_len);
    if (!cs || PyList_Append(chrs, cs) < 0) {
      Py_XDECREF(cs);
      ok = 0;
      break;
    }
    Py_DECREF(cs);
    if (i64vec_push(&pos, v_pos) || i64vec_push(&freq, v_freq) ||
        i64vec_push(&size, v_size) || i64vec_push(&fold, v_fold)) {
      PyErr_NoMemory();
      ok = 0;
      break;
    }
  }
  free(line);
  fclose(f);

  if (!ok) {
    Py_DECREF(chrs);
    free(pos.data); free(freq.data); free(size.data); free(fold.data);
    return NULL;
  }

  PyObject *out = Py_BuildValue(
      "(NNNNN)", chrs, i64vec_to_array(&pos), i64vec_to_array(&freq),
      i64vec_to_array(&size), i64vec_to_array(&fold));
  free(pos.data); free(freq.data); free(size.data); free(fold.data);
  return out;
}

static PyObject *parse_ms_haplotypes(PyObject *self, PyObject *args) {
  PyObject *lines;
  if (!PyArg_ParseTuple(args, "O", &lines)) return NULL;
  if (!PyList_Check(lines)) {
    PyErr_SetString(PyExc_TypeError, "expected list of bytes");
    return NULL;
  }
  Py_ssize_t n_hap = PyList_Size(lines);
  Py_ssize_t n_poly = 0;
  if (n_hap > 0) {
    PyObject *first = PyList_GetItem(lines, 0);
    n_poly = PyBytes_Size(first);
  }
  PyObject *buf = PyBytes_FromStringAndSize(NULL, n_hap * n_poly);
  if (!buf) return NULL;
  char *dst = PyBytes_AsString(buf);
  for (Py_ssize_t i = 0; i < n_hap; i++) {
    PyObject *row = PyList_GetItem(lines, i);
    if (!PyBytes_Check(row) || PyBytes_Size(row) != n_poly) {
      Py_DECREF(buf);
      PyErr_SetString(PyExc_ValueError, "ragged or non-bytes haplotype rows");
      return NULL;
    }
    const char *src = PyBytes_AsString(row);
    for (Py_ssize_t j = 0; j < n_poly; j++) dst[i * n_poly + j] = src[j] - '0';
  }
  return Py_BuildValue("(Nnn)", buf, n_hap, n_poly);
}

static PyMethodDef methods[] = {
    {"parse_snp_file_raw", parse_snp_file_raw, METH_VARARGS,
     "parse a SNP frequency file -> (chr list, raw int64 bytes x4)"},
    {"parse_ms_haplotypes", parse_ms_haplotypes, METH_VARARGS,
     "list[bytes] of 0/1 rows -> (raw uint8 bytes, n_hap, n_poly)"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef module = {PyModuleDef_HEAD_INIT, "_fastio",
                                    "fscl_tpu native I/O hot paths", -1,
                                    methods};

PyMODINIT_FUNC PyInit__fastio(void) { return PyModule_Create(&module); }

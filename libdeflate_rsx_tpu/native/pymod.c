/* CPython extension bindings for the native host codec (codec.c).
 *
 * The ctypes path costs ~1 us per call, which dominates nano/small
 * buffers (the reference wins those groups with zero-overhead Rust
 * calls, reference benches/bench_main.rs nano groups). METH_FASTCALL
 * entry points cost ~100 ns and release the GIL around large calls so
 * the host thread pool (batch.py) scales like the reference's rayon
 * layer (reference src/batch.rs:34-57).
 *
 * Exposed: crc32(data, crc=0), adler32(data, adler=1),
 * deflate(data, level, flush, history=b"") -> bytes,
 * inflate(data, max_out) -> (bytes, consumed).
 * Errors surface as negative codes mapped to exceptions in host.py.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

extern int64_t deflate_c(const uint8_t *buf, int64_t hist_len,
                         int64_t total_len, int level, int flush,
                         uint8_t *out, int64_t out_cap, int32_t *work);
extern int64_t inflate_c(const uint8_t *in, int64_t in_len, uint8_t *out,
                         int64_t out_cap, int64_t *consumed);
extern uint32_t crc32_c(uint32_t crc, const uint8_t *p, int64_t n);
extern uint32_t adler32_c(uint32_t adler, const uint8_t *p, int64_t n);
extern int64_t resolve_tokens_c(const int32_t *toks, int64_t ntoks,
                                uint8_t *out, int64_t out_cap);

#define ERR_BADDATA (-1)
#define ERR_SPACE (-2)
#define ERR_SHORT (-3)

#define HASH_SIZE (1 << 16)

/* grow-only per-thread work buffer (matchfinder heads + prev links) */
static _Thread_local int32_t *work_buf = NULL;
static _Thread_local size_t work_cap = 0;

static int32_t *get_work(size_t total) {
    size_t need = 2 * HASH_SIZE + total + 16;
    if (work_cap < need) {
        size_t cap = need + need / 2;
        int32_t *p = realloc(work_buf, cap * sizeof(int32_t));
        if (!p) return NULL;
        work_buf = p;
        work_cap = cap;
    }
    return work_buf;
}

static PyObject *py_crc32(PyObject *self, PyObject *const *args,
                          Py_ssize_t nargs) {
    (void)self;
    if (nargs < 1 || nargs > 2) {
        PyErr_SetString(PyExc_TypeError, "crc32(data, crc=0)");
        return NULL;
    }
    Py_buffer view;
    if (PyObject_GetBuffer(args[0], &view, PyBUF_SIMPLE) < 0) return NULL;
    uint32_t crc = 0;
    if (nargs == 2) {
        crc = (uint32_t)PyLong_AsUnsignedLongMask(args[1]);
        if (PyErr_Occurred()) { PyBuffer_Release(&view); return NULL; }
    }
    uint32_t r;
    if (view.len >= 65536) {
        Py_BEGIN_ALLOW_THREADS
        r = crc32_c(crc, view.buf, view.len);
        Py_END_ALLOW_THREADS
    } else {
        r = crc32_c(crc, view.buf, view.len);
    }
    PyBuffer_Release(&view);
    return PyLong_FromUnsignedLong(r);
}

static PyObject *py_adler32(PyObject *self, PyObject *const *args,
                            Py_ssize_t nargs) {
    (void)self;
    if (nargs < 1 || nargs > 2) {
        PyErr_SetString(PyExc_TypeError, "adler32(data, adler=1)");
        return NULL;
    }
    Py_buffer view;
    if (PyObject_GetBuffer(args[0], &view, PyBUF_SIMPLE) < 0) return NULL;
    uint32_t adler = 1;
    if (nargs == 2) {
        adler = (uint32_t)PyLong_AsUnsignedLongMask(args[1]);
        if (PyErr_Occurred()) { PyBuffer_Release(&view); return NULL; }
    }
    uint32_t r;
    if (view.len >= 65536) {
        Py_BEGIN_ALLOW_THREADS
        r = adler32_c(adler, view.buf, view.len);
        Py_END_ALLOW_THREADS
    } else {
        r = adler32_c(adler, view.buf, view.len);
    }
    PyBuffer_Release(&view);
    return PyLong_FromUnsignedLong(r);
}

/* deflate(data, level, flush, history=b"") -> bytes | int error code */
static PyObject *py_deflate(PyObject *self, PyObject *const *args,
                            Py_ssize_t nargs) {
    (void)self;
    if (nargs < 3 || nargs > 4) {
        PyErr_SetString(PyExc_TypeError,
                        "deflate(data, level, flush, history=b'')");
        return NULL;
    }
    Py_buffer data, hist;
    hist.buf = NULL; hist.len = 0; hist.obj = NULL;
    if (PyObject_GetBuffer(args[0], &data, PyBUF_SIMPLE) < 0) return NULL;
    long level = PyLong_AsLong(args[1]);
    long flush = PyLong_AsLong(args[2]);
    if (PyErr_Occurred()) { PyBuffer_Release(&data); return NULL; }
    if (nargs == 4 &&
        PyObject_GetBuffer(args[3], &hist, PyBUF_SIMPLE) < 0) {
        PyBuffer_Release(&data);
        return NULL;
    }
    int64_t total = data.len + hist.len;
    int64_t cap = total + (total >> 3) + 4096;
    PyObject *out = PyBytes_FromStringAndSize(NULL, cap);
    int32_t *work = get_work((size_t)total);
    if (!out || !work) {
        Py_XDECREF(out);
        PyBuffer_Release(&data);
        if (hist.obj) PyBuffer_Release(&hist);
        return out ? PyErr_NoMemory() : NULL;
    }
    uint8_t *dst = (uint8_t *)PyBytes_AS_STRING(out);
    int64_t n;
    if (hist.len == 0) {
        if (total >= 16384) {
            Py_BEGIN_ALLOW_THREADS
            n = deflate_c(data.buf ? data.buf : (const void *)dst, 0,
                          total, (int)level, (int)flush, dst, cap, work);
            Py_END_ALLOW_THREADS
        } else {
            n = deflate_c(data.buf ? data.buf : (const void *)dst, 0,
                          total, (int)level, (int)flush, dst, cap, work);
        }
    } else {
        /* assemble history + data contiguously (the matchfinder reads
         * one linear buffer) */
        uint8_t *tmp = malloc((size_t)total ? (size_t)total : 1);
        if (!tmp) {
            Py_DECREF(out);
            PyBuffer_Release(&data);
            PyBuffer_Release(&hist);
            return PyErr_NoMemory();
        }
        memcpy(tmp, hist.buf, (size_t)hist.len);
        memcpy(tmp + hist.len, data.buf, (size_t)data.len);
        Py_BEGIN_ALLOW_THREADS
        n = deflate_c(tmp, hist.len, total, (int)level, (int)flush,
                      dst, cap, work);
        Py_END_ALLOW_THREADS
        free(tmp);
    }
    PyBuffer_Release(&data);
    if (hist.obj) PyBuffer_Release(&hist);
    if (n < 0) {
        Py_DECREF(out);
        return PyLong_FromLongLong(n);
    }
    if (_PyBytes_Resize(&out, (Py_ssize_t)n) < 0) return NULL;
    return out;
}

/* inflate(data, max_out) -> (bytes, consumed) | int error code */
static PyObject *py_inflate(PyObject *self, PyObject *const *args,
                            Py_ssize_t nargs) {
    (void)self;
    if (nargs != 2) {
        PyErr_SetString(PyExc_TypeError, "inflate(data, max_out)");
        return NULL;
    }
    Py_buffer data;
    if (PyObject_GetBuffer(args[0], &data, PyBUF_SIMPLE) < 0) return NULL;
    int64_t max_out = PyLong_AsLongLong(args[1]);
    if (PyErr_Occurred()) { PyBuffer_Release(&data); return NULL; }
    if (max_out < 0) max_out = 0;
    PyObject *out = PyBytes_FromStringAndSize(NULL, max_out ? max_out : 1);
    if (!out) { PyBuffer_Release(&data); return NULL; }
    int64_t consumed = 0;
    int64_t n;
    uint8_t *dst = (uint8_t *)PyBytes_AS_STRING(out);
    static const uint8_t empty = 0;
    const uint8_t *src = data.len ? data.buf : &empty;
    if (data.len >= 16384) {
        Py_BEGIN_ALLOW_THREADS
        n = inflate_c(src, data.len, dst, max_out, &consumed);
        Py_END_ALLOW_THREADS
    } else {
        n = inflate_c(src, data.len, dst, max_out, &consumed);
    }
    PyBuffer_Release(&data);
    if (n < 0) {
        Py_DECREF(out);
        return PyLong_FromLongLong(n);
    }
    if (_PyBytes_Resize(&out, (Py_ssize_t)n) < 0) return NULL;
    PyObject *tup = PyTuple_New(2);
    if (!tup) { Py_DECREF(out); return NULL; }
    PyTuple_SET_ITEM(tup, 0, out);
    PyTuple_SET_ITEM(tup, 1, PyLong_FromLongLong(consumed));
    return tup;
}

/* resolve_tokens(tokens_i32_buffer, out_cap) -> bytes | None on bad.
 * Pass 2 of the two-pass device decoder (ops/tokens.py format). */
static PyObject *py_resolve_tokens(PyObject *self, PyObject *const *args,
                                   Py_ssize_t nargs) {
    (void)self;
    if (nargs != 2) {
        PyErr_SetString(PyExc_TypeError, "resolve_tokens(tokens, out_cap)");
        return NULL;
    }
    Py_buffer toks;
    if (PyObject_GetBuffer(args[0], &toks, PyBUF_SIMPLE) < 0) return NULL;
    int64_t out_cap = PyLong_AsLongLong(args[1]);
    if (PyErr_Occurred() || out_cap < 0) {
        PyBuffer_Release(&toks);
        if (!PyErr_Occurred())
            PyErr_SetString(PyExc_ValueError, "out_cap must be >= 0");
        return NULL;
    }
    PyObject *out = PyBytes_FromStringAndSize(NULL, out_cap ? out_cap : 1);
    if (!out) { PyBuffer_Release(&toks); return NULL; }
    uint8_t *dst = (uint8_t *)PyBytes_AS_STRING(out);
    int64_t ntoks = toks.len / 4;
    int64_t n;
    Py_BEGIN_ALLOW_THREADS
    n = resolve_tokens_c((const int32_t *)toks.buf, ntoks, dst, out_cap);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&toks);
    if (n < 0) {
        Py_DECREF(out);
        Py_RETURN_NONE;
    }
    if (_PyBytes_Resize(&out, (Py_ssize_t)n) < 0) return NULL;
    return out;
}

static PyMethodDef methods[] = {
    {"crc32", (PyCFunction)py_crc32, METH_FASTCALL, "crc32(data, crc=0)"},
    {"adler32", (PyCFunction)py_adler32, METH_FASTCALL,
     "adler32(data, adler=1)"},
    {"deflate", (PyCFunction)py_deflate, METH_FASTCALL,
     "deflate(data, level, flush, history=b'')"},
    {"inflate", (PyCFunction)py_inflate, METH_FASTCALL,
     "inflate(data, max_out)"},
    {"resolve_tokens", (PyCFunction)py_resolve_tokens, METH_FASTCALL,
     "resolve_tokens(tokens, out_cap)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_codec", NULL, -1, methods,
    NULL, NULL, NULL, NULL,
};

void ldrsx_global_init(void);

PyMODINIT_FUNC PyInit__codec(void) {
    /* eager checksum-table/SIMD-tier init while still single-threaded;
     * the hot functions release the GIL, so lazy init would race */
    ldrsx_global_init();
    return PyModule_Create(&moduledef);
}

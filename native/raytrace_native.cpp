// Native IO + runtime helpers for raytrace_tpu.
//
// The reference's entire runtime is C++ (SURVEY.md section 2); the compute
// path of this rebuild is XLA/Pallas, but the host-side runtime pieces that
// the reference implements natively -- snapshot parsing, zero-stripping
// compression, image validation -- are provided here as a CPython extension
// (built with setuptools; no pybind11 dependency).
//
// Wire format: see raytrace_tpu/io/serialization.py and the reference
// sources it cites (src/RayTraceStructures.cpp). The parser here returns a
// flat dict of numpy arrays/scalars; raytrace_tpu.io.loader assembles the
// dataclasses. A pure-Python fallback with identical behavior exists, so
// the extension is an accelerator, not a requirement.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <utility>
#include <vector>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

namespace {

struct Cursor {
    const uint8_t *data;
    size_t size;
    size_t pos = 0;

    bool need(size_t n) const { return pos + n <= size; }

    template <typename T>
    bool read(T *out) {
        if (!need(sizeof(T))) return false;
        std::memcpy(out, data + pos, sizeof(T));
        pos += sizeof(T);
        return true;
    }
};

void set_err(const char *msg) { PyErr_SetString(PyExc_ValueError, msg); }

// Create a 1-D numpy array copying n elements of dtype `typenum` from the
// cursor; returns nullptr (with error set) on underrun.
PyObject *read_array(Cursor &c, npy_intp n, int typenum, size_t itemsize) {
    if (!c.need((size_t)n * itemsize)) {
        set_err("snapshot truncated while reading array");
        return nullptr;
    }
    PyObject *arr = PyArray_SimpleNew(1, &n, typenum);
    if (!arr) return nullptr;
    std::memcpy(PyArray_DATA((PyArrayObject *)arr), c.data + c.pos,
                (size_t)n * itemsize);
    c.pos += (size_t)n * itemsize;
    return arr;
}

bool dict_set(PyObject *d, const char *key, PyObject *val /* stolen */) {
    if (!val) return false;
    int rc = PyDict_SetItemString(d, key, val);
    Py_DECREF(val);
    return rc == 0;
}

// ---------------------------------------------------------------------------
// zero-stripping compression (Utilities::compress_array, RayUtilities.h)
// ---------------------------------------------------------------------------

// Decompress mode-1 payload into an array of n elements of width `itemsize`.
bool decompress_mode1(const uint8_t *payload, size_t nbytes, size_t n,
                      size_t itemsize, uint8_t *out) {
    std::memset(out, 0, n * itemsize);
    if (nbytes <= 1) return true;  // NULL / all-zero special cases
    if (nbytes == n * itemsize) {
        std::memcpy(out, payload, nbytes);
        return true;
    }
    size_t mask_bytes = (n + 7) / 8;
    if (nbytes < mask_bytes) return false;
    const uint8_t *vals = payload + mask_bytes;
    size_t navail = (nbytes - mask_bytes) / itemsize;
    size_t j = 0;
    for (size_t i = 0; i < n; i++) {
        if (payload[i / 8] & (1u << (i % 8))) {
            if (j >= navail) return false;
            std::memcpy(out + i * itemsize, vals + j * itemsize, itemsize);
            j++;
        }
    }
    return true;
}

PyObject *py_decompress_array(PyObject *, PyObject *args) {
    Py_ssize_t n;
    Py_buffer buf;
    int method;
    int want_f32;
    if (!PyArg_ParseTuple(args, "ny*ip", &n, &buf, &method, &want_f32))
        return nullptr;
    const uint8_t *payload = (const uint8_t *)buf.buf;
    size_t nbytes = (size_t)buf.len;
    npy_intp nn = n;
    PyObject *result = nullptr;
    if (method == 0) {
        size_t isz = want_f32 ? 4 : 8;
        if (nbytes != (size_t)n * isz) {
            set_err("raw payload size mismatch");
        } else {
            result = PyArray_SimpleNew(1, &nn, want_f32 ? NPY_FLOAT32 : NPY_FLOAT64);
            if (result)
                std::memcpy(PyArray_DATA((PyArrayObject *)result), payload,
                            nbytes);
        }
    } else if (method == 1 || method == 2) {
        size_t isz = (method == 2) ? 4 : (want_f32 ? 4 : 8);
        int tnum = (isz == 4) ? NPY_FLOAT32 : NPY_FLOAT64;
        PyObject *tmp = PyArray_SimpleNew(1, &nn, tnum);
        if (tmp && decompress_mode1(payload, nbytes, (size_t)n, isz,
                                    (uint8_t *)PyArray_DATA((PyArrayObject *)tmp))) {
            if (method == 2 && !want_f32) {
                // widen f32 -> f64
                result = PyArray_Cast((PyArrayObject *)tmp, NPY_FLOAT64);
                Py_DECREF(tmp);
            } else {
                result = tmp;
            }
        } else {
            Py_XDECREF(tmp);
            if (!PyErr_Occurred()) set_err("corrupt compressed payload");
        }
    } else {
        set_err("unknown compression method");
    }
    PyBuffer_Release(&buf);
    return result;
}

// ---------------------------------------------------------------------------
// ray_gain_struct (headerless blob, RayTraceStructures.cpp:2018-2047)
// ---------------------------------------------------------------------------

PyObject *parse_gain(Cursor &c, size_t blob_end) {
    int32_t Nx, Ny, Nv;
    if (!c.read(&Nx) || !c.read(&Ny) || !c.read(&Nv)) {
        set_err("gain blob truncated");
        return nullptr;
    }
    if (Nx <= 0 || Ny <= 0 || Nv <= 0 || (size_t)Nx * Ny > (1u << 28)) {
        set_err("invalid gain dimensions");
        return nullptr;
    }
    PyObject *d = PyDict_New();
    if (!d) return nullptr;
    npy_intp cells = (npy_intp)Nx * Ny;
    bool ok = dict_set(d, "Nx", PyLong_FromLong(Nx))
        && dict_set(d, "Ny", PyLong_FromLong(Ny))
        && dict_set(d, "Nv", PyLong_FromLong(Nv))
        && dict_set(d, "x", read_array(c, Nx, NPY_FLOAT64, 8))
        && dict_set(d, "y", read_array(c, Ny, NPY_FLOAT64, 8))
        && dict_set(d, "n", read_array(c, cells, NPY_FLOAT64, 8))
        && dict_set(d, "g0", read_array(c, cells, NPY_FLOAT32, 4))
        && dict_set(d, "E0", read_array(c, cells, NPY_FLOAT32, 4))
        && dict_set(d, "gv", read_array(c, cells * Nv, NPY_FLOAT32, 4))
        && dict_set(d, "gv0", read_array(c, cells, NPY_FLOAT32, 4));
    if (!ok || c.pos != blob_end) {
        Py_DECREF(d);
        if (!PyErr_Occurred()) set_err("gain blob size mismatch");
        return nullptr;
    }
    return d;
}

// ---------------------------------------------------------------------------
// ray_seed_struct (headerless blob, RayTraceStructures.cpp:1413-1431)
// ---------------------------------------------------------------------------

PyObject *parse_seed(Cursor &c, size_t blob_end) {
    int32_t dim[5];
    for (int i = 0; i < 5; i++)
        if (!c.read(&dim[i])) { set_err("seed blob truncated"); return nullptr; }
    PyObject *d = PyDict_New();
    PyObject *xs = PyList_New(5);
    PyObject *fs = PyList_New(5);
    if (!d || !xs || !fs) { Py_XDECREF(d); Py_XDECREF(xs); Py_XDECREF(fs); return nullptr; }
    for (int i = 0; i < 5; i++) {
        PyObject *x = read_array(c, dim[i], NPY_FLOAT64, 8);
        PyObject *f = x ? read_array(c, dim[i], NPY_FLOAT64, 8) : nullptr;
        if (!x || !f) { Py_XDECREF(x); Py_DECREF(d); Py_DECREF(xs); Py_DECREF(fs); return nullptr; }
        PyList_SET_ITEM(xs, i, x);
        PyList_SET_ITEM(fs, i, f);
    }
    double f0;
    if (!c.read(&f0) || c.pos != blob_end) {
        Py_DECREF(d); Py_DECREF(xs); Py_DECREF(fs);
        set_err("seed blob size mismatch");
        return nullptr;
    }
    npy_intp five = 5;
    PyObject *dims = PyArray_SimpleNew(1, &five, NPY_INT32);
    std::memcpy(PyArray_DATA((PyArrayObject *)dims), dim, 5 * sizeof(int32_t));
    bool ok = dict_set(d, "dim", dims)
        && PyDict_SetItemString(d, "x", xs) == 0
        && PyDict_SetItemString(d, "f", fs) == 0
        && dict_set(d, "f0", PyFloat_FromDouble(f0));
    Py_DECREF(xs);
    Py_DECREF(fs);
    if (!ok) { Py_DECREF(d); return nullptr; }
    return d;
}

// ---------------------------------------------------------------------------
// top-level fast scan of a create_image blob: splits the length-prefixed
// sub-blobs and fully parses the headerless gain/seed sections (the bulk of
// the bytes); the versioned euv/seed_beam headers are small and left to
// Python. Returns a dict:
//   { N, N_start, N_parallel, dz, euv_blob: memoryview,
//     seed_beam_blob: memoryview|None, gain: [dict...], seed: dict|None,
//     image: array|None, I_ang: array|None, image_counts: (nx*ny*nv, na*nb) }
// ---------------------------------------------------------------------------

PyObject *py_parse_create_image(PyObject *, PyObject *args) {
    Py_buffer buf;
    long nx, ny, na, nb, nv;  // filled lazily: caller passes -1s and we defer
    if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
    Cursor c{(const uint8_t *)buf.buf, (size_t)buf.len};
    PyObject *out = PyDict_New();
    // a view of the EXPORTING object (buf.obj), not a raw FromMemory view:
    // slices stored in the result dict must keep the caller's bytes alive
    // after we release our buffer, or they would alias freed memory
    PyObject *mv_owner = PyMemoryView_FromObject(buf.obj);
    (void)nx; (void)ny; (void)na; (void)nb; (void)nv;

    int32_t N, N_start, N_parallel;
    double dz;
    bool header_ok = out && mv_owner && c.read(&N) && c.read(&N_start)
        && c.read(&N_parallel) && c.read(&dz) && N >= 0 && N < 1000;
    if (!header_ok) {
        Py_XDECREF(out); Py_XDECREF(mv_owner);
        PyBuffer_Release(&buf);
        if (!PyErr_Occurred()) set_err("create_image blob truncated");
        return nullptr;
    }
    bool ok = dict_set(out, "N", PyLong_FromLong(N))
        && dict_set(out, "N_start", PyLong_FromLong(N_start))
        && dict_set(out, "N_parallel", PyLong_FromLong(N_parallel))
        && dict_set(out, "dz", PyFloat_FromDouble(dz));

    // euv_beam + seed_beam sub-blobs (returned as memoryview slices)
    const char *blob_keys[2] = {"euv_blob", "seed_beam_blob"};
    for (int bi = 0; ok && bi < 2; bi++) {
        uint32_t nbytes;
        if (!c.read(&nbytes) || !c.need(nbytes)) { ok = false; break; }
        if (nbytes == 0) {
            ok = PyDict_SetItemString(out, blob_keys[bi], Py_None) == 0;
        } else {
            PyObject *slice = PySequence_GetSlice(
                mv_owner, (Py_ssize_t)c.pos, (Py_ssize_t)(c.pos + nbytes));
            ok = slice && dict_set(out, blob_keys[bi], slice);
            c.pos += nbytes;
        }
    }

    // gain array: fully parsed natively
    PyObject *gains = ok ? PyList_New(0) : nullptr;
    for (int i = 0; ok && gains && i < N; i++) {
        uint32_t nbytes;
        if (!c.read(&nbytes) || !c.need(nbytes)) { ok = false; break; }
        PyObject *g = parse_gain(c, c.pos + nbytes);
        ok = g && PyList_Append(gains, g) == 0;
        Py_XDECREF(g);
    }
    if (ok && gains) {
        ok = PyDict_SetItemString(out, "gain", gains) == 0;
    }
    Py_XDECREF(gains);

    // seed
    if (ok) {
        uint32_t nbytes;
        if (!c.read(&nbytes) || !c.need(nbytes)) {
            ok = false;
        } else if (nbytes == 0) {
            ok = PyDict_SetItemString(out, "seed", Py_None) == 0;
        } else {
            PyObject *s = parse_seed(c, c.pos + nbytes);
            ok = s && dict_set(out, "seed", s);
        }
    }

    // trailing image / I_ang: sizes depend on the euv_beam dims, which live
    // in the versioned blob; return the residual bytes for Python to finish
    if (ok) {
        PyObject *rest = PySequence_GetSlice(mv_owner, (Py_ssize_t)c.pos,
                                             (Py_ssize_t)c.size);
        ok = rest && dict_set(out, "trailer", rest);
    }
    Py_DECREF(mv_owner);
    PyBuffer_Release(&buf);
    if (!ok) {
        Py_XDECREF(out);
        if (!PyErr_Occurred()) set_err("create_image blob parse failed");
        return nullptr;
    }
    return out;
}

// ---------------------------------------------------------------------------
// image validation: relative-norm golden gate (check_ans) in native code
// ---------------------------------------------------------------------------

PyObject *py_norms(PyObject *, PyObject *args) {
    PyObject *a_obj, *b_obj;
    if (!PyArg_ParseTuple(args, "OO", &a_obj, &b_obj)) return nullptr;
    PyArrayObject *a = (PyArrayObject *)PyArray_FROM_OTF(
        a_obj, NPY_FLOAT64, NPY_ARRAY_IN_ARRAY);
    PyArrayObject *b = (PyArrayObject *)PyArray_FROM_OTF(
        b_obj, NPY_FLOAT64, NPY_ARRAY_IN_ARRAY);
    if (!a || !b) { Py_XDECREF(a); Py_XDECREF(b); return nullptr; }
    if (PyArray_SIZE(a) != PyArray_SIZE(b)) {
        Py_DECREF(a); Py_DECREF(b);
        set_err("size mismatch");
        return nullptr;
    }
    const double *pa = (const double *)PyArray_DATA(a);
    const double *pb = (const double *)PyArray_DATA(b);
    npy_intp n = PyArray_SIZE(a);
    double na_ = 0, nb_ = 0, nd = 0;
    for (npy_intp i = 0; i < n; i++) {
        na_ += pa[i] * pa[i];
        nb_ += pb[i] * pb[i];
        double d = pa[i] - pb[i];
        nd += d * d;
    }
    Py_DECREF(a);
    Py_DECREF(b);
    return Py_BuildValue("ddd", sqrt(na_), sqrt(nb_), sqrt(nd));
}

// ---------------------------------------------------------------------------
// dual-array quicksort + unique: the native sort tier of the interp library
// (same algorithm family as /root/reference/src/AtomicModel/interp.hpp:146-358
// -- iterative median-of-3 quicksort with an insertion-sort cutover on
// subarrays < 7, carrying an optional payload array through every swap)
// ---------------------------------------------------------------------------

static void qsort_dual(npy_intp n, double *arr, double *brr) {
    if (n <= 1) return;
    npy_intp istack[128];
    int jstack = 0;
    npy_intp l = 0, ir = n - 1;
    for (;;) {
        if (ir - l < 7) {  // insertion sort on small subarrays
            for (npy_intp j = l + 1; j <= ir; j++) {
                double a = arr[j];
                double b = brr ? brr[j] : 0.0;
                npy_intp i;
                for (i = j - 1; i >= l; i--) {
                    if (arr[i] <= a) break;
                    arr[i + 1] = arr[i];
                    if (brr) brr[i + 1] = brr[i];
                }
                arr[i + 1] = a;
                if (brr) brr[i + 1] = b;
            }
            if (jstack == 0) return;
            ir = istack[--jstack];
            l = istack[--jstack];
        } else {
            npy_intp k = (l + ir) / 2;  // median-of-3 pivot selection
            std::swap(arr[k], arr[l + 1]);
            if (brr) std::swap(brr[k], brr[l + 1]);
            if (arr[l] > arr[ir]) {
                std::swap(arr[l], arr[ir]);
                if (brr) std::swap(brr[l], brr[ir]);
            }
            if (arr[l + 1] > arr[ir]) {
                std::swap(arr[l + 1], arr[ir]);
                if (brr) std::swap(brr[l + 1], brr[ir]);
            }
            if (arr[l] > arr[l + 1]) {
                std::swap(arr[l], arr[l + 1]);
                if (brr) std::swap(brr[l], brr[l + 1]);
            }
            npy_intp i = l + 1, j = ir;
            double a = arr[l + 1];
            double b = brr ? brr[l + 1] : 0.0;
            for (;;) {  // partition
                do i++; while (arr[i] < a);
                do j--; while (arr[j] > a);
                if (j < i) break;
                std::swap(arr[i], arr[j]);
                if (brr) std::swap(brr[i], brr[j]);
            }
            arr[l + 1] = arr[j];
            arr[j] = a;
            if (brr) { brr[l + 1] = brr[j]; brr[j] = b; }
            if (jstack > 124) return;  // cannot happen for n < 2^63
            if (ir - i + 1 >= j - l) {  // push larger side, recurse smaller
                istack[jstack++] = i;
                istack[jstack++] = ir;
                ir = j - 1;
            } else {
                istack[jstack++] = l;
                istack[jstack++] = j - 1;
                l = i;
            }
        }
    }
}

PyObject *py_quicksort(PyObject *, PyObject *args) {
    PyObject *x_obj, *y_obj = Py_None;
    if (!PyArg_ParseTuple(args, "O|O", &x_obj, &y_obj)) return nullptr;
    PyArrayObject *x = (PyArrayObject *)PyArray_FROM_OTF(
        x_obj, NPY_FLOAT64, NPY_ARRAY_ENSURECOPY | NPY_ARRAY_C_CONTIGUOUS);
    if (!x) return nullptr;
    PyArrayObject *y = nullptr;
    if (y_obj != Py_None) {
        y = (PyArrayObject *)PyArray_FROM_OTF(
            y_obj, NPY_FLOAT64, NPY_ARRAY_ENSURECOPY | NPY_ARRAY_C_CONTIGUOUS);
        if (!y) { Py_DECREF(x); return nullptr; }
        if (PyArray_SIZE(y) != PyArray_SIZE(x)) {
            Py_DECREF(x); Py_DECREF(y);
            set_err("payload size mismatch");
            return nullptr;
        }
    }
    qsort_dual(PyArray_SIZE(x), (double *)PyArray_DATA(x),
               y ? (double *)PyArray_DATA(y) : nullptr);
    if (!y) return (PyObject *)x;
    PyObject *r = Py_BuildValue("NN", x, y);
    return r;
}

PyObject *py_unique(PyObject *, PyObject *args) {
    PyObject *x_obj;
    if (!PyArg_ParseTuple(args, "O", &x_obj)) return nullptr;
    PyArrayObject *x = (PyArrayObject *)PyArray_FROM_OTF(
        x_obj, NPY_FLOAT64, NPY_ARRAY_ENSURECOPY | NPY_ARRAY_C_CONTIGUOUS);
    if (!x) return nullptr;
    npy_intp n = PyArray_SIZE(x);
    double *p = (double *)PyArray_DATA(x);
    qsort_dual(n, p, nullptr);
    npy_intp m = 0;  // in-place dedup of the sorted array (interp::unique)
    for (npy_intp i = 0; i < n; i++)
        if (m == 0 || p[i] != p[m - 1]) p[m++] = p[i];
    npy_intp dims_[1] = {m};
    PyObject *out = PyArray_SimpleNew(1, dims_, NPY_FLOAT64);
    if (out) memcpy(PyArray_DATA((PyArrayObject *)out), p, m * sizeof(double));
    Py_DECREF(x);
    return out;
}

PyMethodDef methods[] = {
    {"parse_create_image", py_parse_create_image, METH_VARARGS,
     "Fast native scan/parse of a create_image blob."},
    {"decompress_array", py_decompress_array, METH_VARARGS,
     "Decompress a zero-stripped array payload (modes 0/1/2)."},
    {"norms", py_norms, METH_VARARGS,
     "(||a||, ||b||, ||a-b||) in one native pass."},
    {"quicksort", py_quicksort, METH_VARARGS,
     "Dual-array quicksort: sort x (f64 copy), co-permuting optional y."},
    {"unique", py_unique, METH_VARARGS,
     "Sort + deduplicate (native)."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "raytrace_native",
    "Native IO/runtime helpers for raytrace_tpu", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_raytrace_native(void) {
    PyObject *m = PyModule_Create(&moduledef);
    if (!m) return nullptr;
    import_array();
    return m;
}

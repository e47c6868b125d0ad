// Native host-side NaFlex preprocessing: fused patchify + collate.
//
// The input pipeline's per-sample hot loop (normalize -> pad -> unfold ->
// pad-to-max_tokens -> collate) is pure memory movement; in Python/numpy it
// costs several intermediate copies per image. This extension does the whole
// batch in one pass, writing every patch row directly into the final
// collated buffers, parallelized across images with OpenMP.
//
// Replaces the role the reference delegates to torch's C++ F.unfold +
// DataLoader worker processes (vitok/pp/ops.py:242, vitok/data.py:283 in
// Na-VAE/vitok-release), as a TPU-host-native component.
//
// CPython C API only (no pybind11 in this image). The Python wrapper
// (vitok_tpu/native/__init__.py) falls back to the numpy path when the
// extension is not built.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct ImageView {
  const float* data;  // contiguous C,H,W
  int64_t c, h, w;
};

// One image: normalize + patchify directly into the collated output rows.
void patchify_one(
    const ImageView& img, int patch, int max_tokens,
    float mean[3], float std_inv[3], bool do_norm,
    float* patches_out,     // [max_tokens, C*patch*patch]
    uint8_t* mask_out,      // [max_tokens]
    int32_t* row_out,       // [max_tokens]
    int32_t* col_out,       // [max_tokens]
    int32_t* meta_out       // [4]: orig_h, orig_w, grid_rows, grid_cols
) {
  const int64_t c = img.c, h = img.h, w = img.w;
  const int64_t gr = (h + patch - 1) / patch;
  const int64_t gc = (w + patch - 1) / patch;
  const int64_t n = gr * gc;
  const int64_t dim = c * patch * patch;

  std::memset(patches_out, 0, sizeof(float) * max_tokens * dim);
  std::memset(mask_out, 0, max_tokens);
  std::memset(row_out, 0, sizeof(int32_t) * max_tokens);
  std::memset(col_out, 0, sizeof(int32_t) * max_tokens);

  for (int64_t gy = 0; gy < gr; ++gy) {
    for (int64_t gx = 0; gx < gc; ++gx) {
      const int64_t token = gy * gc + gx;
      if (token >= max_tokens) continue;  // guarded by caller; belt+braces
      float* dst = patches_out + token * dim;
      for (int64_t ch = 0; ch < c; ++ch) {
        const float m = do_norm ? mean[ch % 3] : 0.0f;
        const float si = do_norm ? std_inv[ch % 3] : 1.0f;
        const float* src_plane = img.data + ch * h * w;
        for (int64_t py = 0; py < patch; ++py) {
          const int64_t y = gy * patch + py;
          float* drow = dst + ch * patch * patch + py * patch;
          if (y >= h) continue;  // zero padding (memset above)
          const float* srow = src_plane + y * w;
          const int64_t x0 = gx * patch;
          const int64_t valid = std::min<int64_t>(patch, w - x0);
          for (int64_t px = 0; px < valid; ++px) {
            drow[px] = (srow[x0 + px] - m) * si;
          }
        }
      }
      mask_out[token] = 1;
      row_out[token] = static_cast<int32_t>(gy);
      col_out[token] = static_cast<int32_t>(gx);
    }
  }
  meta_out[0] = static_cast<int32_t>(h);
  meta_out[1] = static_cast<int32_t>(w);
  meta_out[2] = static_cast<int32_t>(gr);
  meta_out[3] = static_cast<int32_t>(gc);
}

// patchify_collate(buffers, shapes, patch, max_tokens, mean, std) -> bytes x5
//
// buffers: list of contiguous float32 C,H,W buffers (as one flat bytes each)
// Returns (patches, mask, row, col, meta) as bytes objects the Python side
// wraps as numpy arrays (zero extra copies beyond the single write).
PyObject* py_patchify_collate(PyObject*, PyObject* args) {
  PyObject* buf_list;
  PyObject* shape_list;
  int patch, max_tokens, do_norm;
  float mean[3], stdv[3];
  if (!PyArg_ParseTuple(
          args, "OOiip(fff)(fff)", &buf_list, &shape_list, &patch,
          &max_tokens, &do_norm, &mean[0], &mean[1], &mean[2], &stdv[0],
          &stdv[1], &stdv[2]))
    return nullptr;

  const Py_ssize_t b = PyList_Size(buf_list);
  if (b <= 0 || PyList_Size(shape_list) != b) {
    PyErr_SetString(PyExc_ValueError, "empty batch or shape mismatch");
    return nullptr;
  }

  std::vector<ImageView> views(b);
  std::vector<Py_buffer> pybufs(b);
  int64_t dim = -1;
  for (Py_ssize_t i = 0; i < b; ++i) {
    PyObject* shp = PyList_GetItem(shape_list, i);
    long c = PyLong_AsLong(PyTuple_GetItem(shp, 0));
    long h = PyLong_AsLong(PyTuple_GetItem(shp, 1));
    long w = PyLong_AsLong(PyTuple_GetItem(shp, 2));
    if (PyObject_GetBuffer(PyList_GetItem(buf_list, i), &pybufs[i],
                           PyBUF_CONTIG_RO) < 0)
      return nullptr;
    if (pybufs[i].len < (Py_ssize_t)(sizeof(float) * c * h * w)) {
      PyErr_SetString(PyExc_ValueError, "buffer smaller than shape");
      return nullptr;
    }
    views[i] = {reinterpret_cast<const float*>(pybufs[i].buf), c, h, w};
    int64_t d = c * (int64_t)patch * patch;
    if (dim == -1) dim = d;
    if (d != dim) {
      PyErr_SetString(PyExc_ValueError, "channel counts differ across batch");
      return nullptr;
    }
    int64_t gr = (h + patch - 1) / patch, gc = (w + patch - 1) / patch;
    if (gr * gc > max_tokens) {
      PyErr_Format(PyExc_ValueError,
                   "image %zd produces %lld patches > max_tokens=%d",
                   i, (long long)(gr * gc), max_tokens);
      return nullptr;
    }
  }

  PyObject* patches = PyBytes_FromStringAndSize(
      nullptr, sizeof(float) * b * max_tokens * dim);
  PyObject* mask = PyBytes_FromStringAndSize(nullptr, b * max_tokens);
  PyObject* rows =
      PyBytes_FromStringAndSize(nullptr, sizeof(int32_t) * b * max_tokens);
  PyObject* cols =
      PyBytes_FromStringAndSize(nullptr, sizeof(int32_t) * b * max_tokens);
  PyObject* meta = PyBytes_FromStringAndSize(nullptr, sizeof(int32_t) * b * 4);
  if (!patches || !mask || !rows || !cols || !meta) return nullptr;

  float* p_out = reinterpret_cast<float*>(PyBytes_AsString(patches));
  uint8_t* m_out = reinterpret_cast<uint8_t*>(PyBytes_AsString(mask));
  int32_t* r_out = reinterpret_cast<int32_t*>(PyBytes_AsString(rows));
  int32_t* c_out = reinterpret_cast<int32_t*>(PyBytes_AsString(cols));
  int32_t* meta_out = reinterpret_cast<int32_t*>(PyBytes_AsString(meta));

  float std_inv[3] = {1.0f / stdv[0], 1.0f / stdv[1], 1.0f / stdv[2]};

  Py_BEGIN_ALLOW_THREADS
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (Py_ssize_t i = 0; i < b; ++i) {
    patchify_one(views[i], patch, max_tokens, mean, std_inv, do_norm != 0,
                 p_out + (int64_t)i * max_tokens * dim, m_out + i * max_tokens,
                 r_out + i * max_tokens, c_out + i * max_tokens,
                 meta_out + i * 4);
  }
  Py_END_ALLOW_THREADS

  for (Py_ssize_t i = 0; i < b; ++i) PyBuffer_Release(&pybufs[i]);

  PyObject* result = PyTuple_Pack(5, patches, mask, rows, cols, meta);
  Py_DECREF(patches);
  Py_DECREF(mask);
  Py_DECREF(rows);
  Py_DECREF(cols);
  Py_DECREF(meta);
  return result;
}

PyMethodDef kMethods[] = {
    {"patchify_collate", py_patchify_collate, METH_VARARGS,
     "Fused normalize+patchify+collate over a batch of CHW float32 images"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_pp_native",
    "Native NaFlex preprocessing kernels", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit__pp_native(void) { return PyModule_Create(&kModule); }

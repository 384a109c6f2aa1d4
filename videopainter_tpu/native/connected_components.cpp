// Connected-components labeling (8-connectivity) with per-component areas.
//
// TPU-native replacement for the reference's only native kernel,
// sam2/csrc/connected_components.cu (289 LoC CUDA union-find used by SAM2
// mask post-processing, app/sam2/utils/misc.py:47-63). Same contract:
//   input : uint8 mask  [B, 1, H, W]  (nonzero = foreground)
//   output: int32 labels [B, 1, H, W] (0 background; components numbered from 1)
//           int32 areas  [B, 1, H, W] (area of the component at each pixel)
//
// CPU path-compressed union-find (the mask post-process runs host-side next
// to SAM2's point prompts; the TPU never touches it). Exposed through the
// CPython C API — no pybind11 dependency (built via setuptools, see setup.py).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  explicit UnionFind(size_t n) : parent(n) {
    for (size_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];  // path halving
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (a < b) parent[b] = a; else parent[a] = b;
  }
};

void label_one(const uint8_t* mask, int32_t* labels, int32_t* areas,
               int h, int w) {
  const size_t n = static_cast<size_t>(h) * w;
  UnionFind uf(n);
  // union pass: 8-connectivity, only look back (W, NW, N, NE)
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const size_t i = static_cast<size_t>(y) * w + x;
      if (!mask[i]) continue;
      if (x > 0 && mask[i - 1]) uf.unite((int32_t)i, (int32_t)(i - 1));
      if (y > 0) {
        const size_t up = i - w;
        if (mask[up]) uf.unite((int32_t)i, (int32_t)up);
        if (x > 0 && mask[up - 1]) uf.unite((int32_t)i, (int32_t)(up - 1));
        if (x + 1 < w && mask[up + 1]) uf.unite((int32_t)i, (int32_t)(up + 1));
      }
    }
  }
  // root -> compact label + area count
  std::vector<int32_t> area(n, 0);
  for (size_t i = 0; i < n; ++i)
    if (mask[i]) ++area[uf.find((int32_t)i)];
  std::vector<int32_t> compact(n, 0);
  int32_t next = 1;
  for (size_t i = 0; i < n; ++i) {
    if (!mask[i]) { labels[i] = 0; areas[i] = 0; continue; }
    const int32_t r = uf.find((int32_t)i);
    if (!compact[r]) compact[r] = next++;
    labels[i] = compact[r];
    areas[i] = area[r];
  }
}

// args: (mask_bytes, b, h, w) -> (labels_bytes, areas_bytes)
PyObject* get_connected_components(PyObject*, PyObject* args) {
  Py_buffer buf;
  int b, h, w;
  if (!PyArg_ParseTuple(args, "y*iii", &buf, &b, &h, &w)) return nullptr;
  const size_t per = static_cast<size_t>(h) * w;
  if (static_cast<size_t>(buf.len) < per * b) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "mask buffer too small");
    return nullptr;
  }
  PyObject* labels_b = PyBytes_FromStringAndSize(nullptr, per * b * 4);
  PyObject* areas_b = PyBytes_FromStringAndSize(nullptr, per * b * 4);
  if (!labels_b || !areas_b) {
    PyBuffer_Release(&buf);
    Py_XDECREF(labels_b);
    Py_XDECREF(areas_b);
    return nullptr;
  }
  auto* mask = static_cast<const uint8_t*>(buf.buf);
  auto* labels = reinterpret_cast<int32_t*>(PyBytes_AsString(labels_b));
  auto* areas = reinterpret_cast<int32_t*>(PyBytes_AsString(areas_b));
  Py_BEGIN_ALLOW_THREADS
  for (int i = 0; i < b; ++i)
    label_one(mask + per * i, labels + per * i, areas + per * i, h, w);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  return Py_BuildValue("(NN)", labels_b, areas_b);
}

PyMethodDef methods[] = {
    {"get_connected_components", get_connected_components, METH_VARARGS,
     "uint8 mask bytes [B*H*W] -> (int32 labels bytes, int32 areas bytes)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_cc", nullptr, -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__cc(void) { return PyModule_Create(&module); }

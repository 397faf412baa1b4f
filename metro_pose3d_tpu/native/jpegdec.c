/* Native host-side image runtime for metro_pose3d_tpu.
 *
 * The reference delegates its host hot loops to native dependencies:
 * libjpeg-turbo via jpeg4py for JPEG decode and OpenCV C++ for warps/resizes
 * (SURVEY.md §3 "Component inventory", §4.1 "host hot loop #1"). In the TPU
 * rebuild the warp moved on-device (ops/warp.py), so the host's remaining
 * native obligations are JPEG decode and source-tile extraction — implemented
 * here against system libjpeg with a pthread pool, GIL released for the whole
 * batch. Exposed as the `_metro_native` CPython extension; Python-side
 * wrapper with cv2 fallback lives in `utils/improc.py`.
 *
 * Functions:
 *   decode_jpeg(data: bytes) -> (buffer: bytes, h: int, w: int)   RGB8
 *   decode_jpeg_batch(items: list[bytes], threads: int)
 *       -> list[(buffer, h, w)]
 *   extract_tile(img: buffer, h, w, x0, y0, x1, y1, factor, tile_side)
 *       -> bytes  (tile_side*tile_side*3, integer-factor AREA decimation,
 *                  zero padding — the host half of pipeline/crops.py's
 *                  extract_source_tile)
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <jpeglib.h>
#include <pthread.h>
#include <setjmp.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* ------------------------------------------------------------------ decode */

struct error_mgr {
  struct jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void error_exit(j_common_ptr cinfo) {
  struct error_mgr *err = (struct error_mgr *)cinfo->err;
  longjmp(err->setjmp_buffer, 1);
}

/* Decode one JPEG from memory to RGB8. Returns malloc'd buffer (caller
 * frees) or NULL on corrupt input. Pure C — safe without the GIL. */
static uint8_t *decode_one(const uint8_t *data, size_t len, int *out_h,
                           int *out_w) {
  struct jpeg_decompress_struct cinfo;
  struct error_mgr jerr;
  uint8_t *buf = NULL;

  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    free(buf);
    return NULL;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return NULL;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = (int)cinfo.output_width;
  const int h = (int)cinfo.output_height;
  const size_t stride = (size_t)w * 3;
  buf = (uint8_t *)malloc((size_t)h * stride);
  if (!buf) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return NULL;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t *row = buf + (size_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_h = h;
  *out_w = w;
  return buf;
}

static PyObject *py_decode_jpeg(PyObject *self, PyObject *args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return NULL;
  int h = 0, w = 0;
  uint8_t *buf;
  Py_BEGIN_ALLOW_THREADS;
  buf = decode_one((const uint8_t *)view.buf, (size_t)view.len, &h, &w);
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&view);
  if (!buf) {
    PyErr_SetString(PyExc_ValueError, "corrupt or unsupported JPEG");
    return NULL;
  }
  PyObject *bytes =
      PyBytes_FromStringAndSize((const char *)buf, (Py_ssize_t)h * w * 3);
  free(buf);
  if (!bytes) return NULL;
  return Py_BuildValue("(Nii)", bytes, h, w);
}

/* ------------------------------------------------- threaded batch decode */

typedef struct {
  const uint8_t *data;
  size_t len;
  uint8_t *out;
  int h, w;
} item_t;

typedef struct {
  item_t *items;
  int n;
  int next; /* guarded by lock */
  pthread_mutex_t lock;
} batch_t;

static void *worker(void *arg) {
  batch_t *b = (batch_t *)arg;
  for (;;) {
    pthread_mutex_lock(&b->lock);
    int i = b->next++;
    pthread_mutex_unlock(&b->lock);
    if (i >= b->n) break;
    b->items[i].out =
        decode_one(b->items[i].data, b->items[i].len, &b->items[i].h,
                   &b->items[i].w);
  }
  return NULL;
}

static PyObject *py_decode_jpeg_batch(PyObject *self, PyObject *args) {
  PyObject *list;
  int threads = 4;
  if (!PyArg_ParseTuple(args, "O|i", &list, &threads)) return NULL;
  if (!PyList_Check(list)) {
    PyErr_SetString(PyExc_TypeError, "expected list of bytes");
    return NULL;
  }
  const int n = (int)PyList_GET_SIZE(list);
  if (n == 0) return PyList_New(0);
  if (threads < 1) threads = 1;
  if (threads > n) threads = n;
  if (threads > 64) threads = 64;

  item_t *items = (item_t *)calloc((size_t)n, sizeof(item_t));
  if (!items) return PyErr_NoMemory();
  for (int i = 0; i < n; i++) {
    PyObject *o = PyList_GET_ITEM(list, i);
    char *p;
    Py_ssize_t len;
    if (PyBytes_AsStringAndSize(o, &p, &len) < 0) {
      free(items);
      return NULL;
    }
    items[i].data = (const uint8_t *)p;
    items[i].len = (size_t)len;
  }

  batch_t batch = {items, n, 0, PTHREAD_MUTEX_INITIALIZER};
  Py_BEGIN_ALLOW_THREADS;
  pthread_t tids[64];
  int started = 0;
  for (; started < threads; started++) {
    if (pthread_create(&tids[started], NULL, worker, &batch)) break;
  }
  if (started == 0) worker(&batch); /* degenerate: run inline */
  for (int i = 0; i < started; i++) pthread_join(tids[i], NULL);
  Py_END_ALLOW_THREADS;

  PyObject *result = PyList_New(n);
  if (!result) goto fail;
  for (int i = 0; i < n; i++) {
    if (!items[i].out) {
      Py_INCREF(Py_None);
      PyList_SET_ITEM(result, i, Py_None);
      continue;
    }
    PyObject *bytes = PyBytes_FromStringAndSize(
        (const char *)items[i].out, (Py_ssize_t)items[i].h * items[i].w * 3);
    if (!bytes) {
      Py_DECREF(result);
      result = NULL;
      goto fail;
    }
    PyObject *tup = Py_BuildValue("(Nii)", bytes, items[i].h, items[i].w);
    if (!tup) {
      Py_DECREF(result);
      result = NULL;
      goto fail;
    }
    PyList_SET_ITEM(result, i, tup);
  }
fail:
  for (int i = 0; i < n; i++) free(items[i].out);
  free(items);
  return result;
}

/* --------------------------------------------------------- tile extraction */

/* ROI slice + integer-factor box (AREA) decimation + zero pad into a fixed
 * tile_side x tile_side x C tile. Matches pipeline/crops.extract_source_tile
 * semantics for integer factors. C (trailing optional arg) defaults to 3;
 * C=1 serves mask tiles without a channel-replication round trip. */
static PyObject *py_extract_tile(PyObject *self, PyObject *args) {
  Py_buffer img;
  int h, w, x0, y0, x1, y1, factor, tile_side, ch = 3;
  if (!PyArg_ParseTuple(args, "y*iiiiiiii|i", &img, &h, &w, &x0, &y0, &x1, &y1,
                        &factor, &tile_side, &ch))
    return NULL;
  if (ch < 1 || ch > 4 || (Py_ssize_t)h * w * ch != img.len) {
    PyBuffer_Release(&img);
    PyErr_SetString(PyExc_ValueError, "image buffer size != h*w*channels");
    return NULL;
  }
  if (x0 < 0 || y0 < 0 || x1 > w || y1 > h || x1 < x0 || y1 < y0 ||
      factor < 1 || tile_side < 1) {
    PyBuffer_Release(&img);
    PyErr_SetString(PyExc_ValueError, "bad ROI/factor/tile_side");
    return NULL;
  }
  const Py_ssize_t tbytes = (Py_ssize_t)tile_side * tile_side * ch;
  PyObject *out = PyBytes_FromStringAndSize(NULL, tbytes);
  if (!out) {
    PyBuffer_Release(&img);
    return NULL;
  }
  uint8_t *dst = (uint8_t *)PyBytes_AS_STRING(out);
  const uint8_t *src = (const uint8_t *)img.buf;

  Py_BEGIN_ALLOW_THREADS;
  memset(dst, 0, (size_t)tbytes);
  const int roi_w = x1 - x0, roi_h = y1 - y0;
  int out_w = roi_w / factor, out_h = roi_h / factor;
  if (factor == 1) {
    out_w = roi_w;
    out_h = roi_h;
  } else {
    if (out_w < 1 && roi_w > 0) out_w = 1;
    if (out_h < 1 && roi_h > 0) out_h = 1;
  }
  if (out_w > tile_side) out_w = tile_side;
  if (out_h > tile_side) out_h = tile_side;
  /* Effective block side per axis: when a clamped ROI dimension is smaller
   * than `factor` the output dim was forced to 1 above; average only the
   * by x bx pixels that exist inside the ROI (matches the numpy engine's
   * truncated slice) instead of reading `factor` rows/cols past y1/x1 —
   * that read went past the image buffer for edge-touching ROIs. When the
   * ROI covers full blocks, by == bx == factor and nothing changes. */
  const int by = (out_h > 0 && roi_h < factor) ? roi_h : factor;
  const int bx = (out_w > 0 && roi_w < factor) ? roi_w : factor;
  const int f2 = by * bx;
  int done = 0;
  if (factor == 1) {
    for (int oy = 0; oy < out_h; oy++)
      memcpy(dst + (size_t)oy * tile_side * ch,
             src + ((size_t)(y0 + oy) * w + x0) * ch, (size_t)out_w * ch);
    done = 1;
  } else if (factor <= 16) {
    /* three-pass decimation, all passes vectorizable: (1) vertical
     * u8->u16 row sums (contiguous adds), (2) horizontal group sums with
     * contiguous destination (fx-outer), (3) rounding division with the
     * common block sizes specialized so the compiler emits vector
     * magic-multiplies. Same integer accumulation and rounding as the
     * naive f x f loop (byte-exact). u16 is safe: f*f*255 <= 65280. */
    const size_t row_elems = (size_t)out_w * bx * ch;
    const int n_res = out_w * ch;
    uint16_t *tmp =
        (uint16_t *)malloc((row_elems + (size_t)n_res) * sizeof(uint16_t));
    if (tmp) { /* on malloc failure fall through to the scratch-free loop */
      uint16_t *res = tmp + row_elems;
      const int fc = bx * ch;
      for (int oy = 0; oy < out_h; oy++) {
        memset(tmp, 0, row_elems * sizeof(uint16_t));
        for (int fy = 0; fy < by; fy++) {
          const uint8_t *restrict p =
              src + ((size_t)(y0 + oy * factor + fy) * w + x0) * ch;
          uint16_t *restrict a = tmp;
          for (size_t i = 0; i < row_elems; i++) a[i] += p[i];
        }
        memset(res, 0, (size_t)n_res * sizeof(uint16_t));
        for (int fx = 0; fx < bx; fx++) {
          const uint16_t *restrict s = tmp + (size_t)fx * ch;
          uint16_t *restrict r = res;
          for (int ox = 0; ox < out_w; ox++)
            for (int c = 0; c < ch; c++) r[ox * ch + c] += s[ox * fc + c];
        }
        uint8_t *restrict drow = dst + (size_t)oy * tile_side * ch;
        const uint16_t *restrict q = res;
        switch (f2) {
          case 4:
            for (int j = 0; j < n_res; j++) drow[j] = (uint8_t)((q[j] + 2) / 4);
            break;
          case 9:
            for (int j = 0; j < n_res; j++) drow[j] = (uint8_t)((q[j] + 4) / 9);
            break;
          case 16:
            for (int j = 0; j < n_res; j++) drow[j] = (uint8_t)((q[j] + 8) / 16);
            break;
          default:
            for (int j = 0; j < n_res; j++)
              drow[j] = (uint8_t)((q[j] + f2 / 2) / f2);
        }
      }
      free(tmp);
      done = 1;
    }
  }
  if (!done && factor > 1) {
    for (int oy = 0; oy < out_h; oy++) {
      uint8_t *drow = dst + (size_t)oy * tile_side * ch;
      for (int ox = 0; ox < out_w; ox++) {
        unsigned int acc[4] = {0, 0, 0, 0};
        for (int fy = 0; fy < by; fy++) {
          const uint8_t *p =
              src +
              ((size_t)(y0 + oy * factor + fy) * w + x0 + ox * factor) * ch;
          for (int fx = 0; fx < bx; fx++) {
            for (int c = 0; c < ch; c++) acc[c] += p[c];
            p += ch;
          }
        }
        for (int c = 0; c < 4 && c < ch; c++)
          drow[ox * ch + c] = (uint8_t)((acc[c] + f2 / 2) / f2);
      }
    }
  }
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&img);
  return out;
}

/* ------------------------------------------------------------------ module */

/* native crop-parameter engine (croprep.c, compiled into this module) */
extern PyObject *py_crop_params(PyObject *self, PyObject *args);

static PyMethodDef methods[] = {
    {"decode_jpeg", py_decode_jpeg, METH_VARARGS,
     "decode_jpeg(data) -> (rgb_bytes, h, w)"},
    {"decode_jpeg_batch", py_decode_jpeg_batch, METH_VARARGS,
     "decode_jpeg_batch(list_of_bytes, threads=4) -> list[(rgb_bytes,h,w)|None]"},
    {"extract_tile", py_extract_tile, METH_VARARGS,
     "extract_tile(img,h,w,x0,y0,x1,y1,factor,tile_side) -> tile_bytes"},
    {"crop_params", py_crop_params, METH_VARARGS,
     "crop_params(cam,bbox,proc,tile,w,h,expand,sx,sy,scale,rot,flip,mode,J,"
     "coords,valid,mirror) -> (param_doubles, x0, y0, x1, y1, factor)"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_metro_native",
                                       "native host image runtime", -1,
                                       methods};

PyMODINIT_FUNC PyInit__metro_native(void) { return PyModule_Create(&moduledef); }

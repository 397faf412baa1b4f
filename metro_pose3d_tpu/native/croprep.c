/* Native crop-parameter engine: the per-example virtual-camera algebra of
 * `pipeline/crops.prepare_example` in C.
 *
 * Responsibility-parity with the Python chain (which itself mirrors the
 * reference's data_loading.load_and_transform3d, SURVEY.md 3.1 steps 1-3 +
 * GT bookkeeping): box->square, virtual crop camera (undistort,
 * turn_towards, square_pixels, flip, rotate, zoom-to-fit,
 * center_principal_point), source-ROI computation, warp-parameter packing
 * and tile rebase, and ground-truth transforms (3D joints into the crop
 * camera frame, 2D projections, validity masks, mirror permutation).
 *
 * Why C: the Python path is ~700 tiny numpy calls per example (~2.4 ms/ex,
 * dispatch-bound, GIL-held); measured host model needs ~4.5 cores/chip at
 * the 5k crops/s target (BASELINE.md). This function is the same float64
 * math in one call. Parity contract: same operation ORDER as the numpy
 * code, so results agree to ~1e-12 relative (pinned by
 * tests/test_native_prep.py); goldens stay on the Python engine, the
 * native engine is the opt-in production path (config data.host_prep).
 *
 * Exposed through the `_metro_native` module (see jpegdec.c for the module
 * definition; this file only contributes the py_crop_params method).
 */
#include <Python.h>

#include <float.h>
#include <math.h>
#include <stdint.h>
#include <string.h>

/* ------------------------------------------------------------ small algebra */

/* out = a @ b for row-major 3x3 */
static void mat3_mul(const double *a, const double *b, double *out) {
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++)
      out[i * 3 + j] = a[i * 3 + 0] * b[0 * 3 + j] + a[i * 3 + 1] * b[1 * 3 + j] +
                       a[i * 3 + 2] * b[2 * 3 + j];
}

/* out = a @ b^T for row-major 3x3 */
static void mat3_mul_bt(const double *a, const double *b, double *out) {
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++)
      out[i * 3 + j] = a[i * 3 + 0] * b[j * 3 + 0] + a[i * 3 + 1] * b[j * 3 + 1] +
                       a[i * 3 + 2] * b[j * 3 + 2];
}

/* general 3x3 inverse via adjugate (K is triangular but keep it general) */
static int mat3_inv(const double *m, double *out) {
  double c00 = m[4] * m[8] - m[5] * m[7];
  double c01 = m[5] * m[6] - m[3] * m[8];
  double c02 = m[3] * m[7] - m[4] * m[6];
  double det = m[0] * c00 + m[1] * c01 + m[2] * c02;
  if (det == 0.0 || !isfinite(det)) return -1;
  double inv = 1.0 / det;
  out[0] = c00 * inv;
  out[1] = (m[2] * m[7] - m[1] * m[8]) * inv;
  out[2] = (m[1] * m[5] - m[2] * m[4]) * inv;
  out[3] = c01 * inv;
  out[4] = (m[0] * m[8] - m[2] * m[6]) * inv;
  out[5] = (m[2] * m[3] - m[0] * m[5]) * inv;
  out[6] = c02 * inv;
  out[7] = (m[1] * m[6] - m[0] * m[7]) * inv;
  out[8] = (m[0] * m[4] - m[1] * m[3]) * inv;
  return 0;
}

/* ------------------------------------------------------------- camera model */

/* OpenCV-model distortion of one normalized point (geom/camera.py
 * distort_points). Exact identity when all coefficients are zero. */
static void distort_pt(double x, double y, const double *d, double *xd,
                       double *yd) {
  double k1 = d[0], k2 = d[1], p1 = d[2], p2 = d[3], k3 = d[4];
  double r2 = x * x + y * y;
  double radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3));
  *xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x);
  *yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y;
}

/* Fixed-point inverse, 10 iterations (geom/camera.py undistort_points);
 * short-circuits exactly like the numpy version when dist == 0. */
static void undistort_pt(double *x, double *y, const double *d) {
  if (d[0] == 0 && d[1] == 0 && d[2] == 0 && d[3] == 0 && d[4] == 0) return;
  double k1 = d[0], k2 = d[1], p1 = d[2], p2 = d[3], k3 = d[4];
  double xd = *x, yd = *y, xx = *x, yy = *y;
  for (int i = 0; i < 10; i++) {
    double r2 = xx * xx + yy * yy;
    double radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3));
    double dx = 2.0 * p1 * xx * yy + p2 * (r2 + 2.0 * xx * xx);
    double dy = p1 * (r2 + 2.0 * yy * yy) + 2.0 * p2 * xx * yy;
    xx = (xd - dx) / radial;
    yy = (yd - dy) / radial;
  }
  *x = xx;
  *y = yy;
}

/* camera_to_image: project one camera-frame point (geom/camera.py:77) */
static void cam_to_img(const double *K, const double *d, double px, double py,
                       double pz, double *ox, double *oy) {
  double xn = px / pz, yn = py / pz;
  double xd, yd;
  distort_pt(xn, yn, d, &xd, &yd);
  *ox = K[0] * xd + K[1] * yd + K[2];
  *oy = K[4] * yd + K[5];
}

/* image_to_camera at depth 1: normalized ray (geom/camera.py:93) */
static void img_to_ray(const double *K, const double *d, double px, double py,
                       double *ox, double *oy) {
  double y = (py - K[5]) / K[4];
  double x = (px - K[2] - K[1] * y) / K[0];
  undistort_pt(&x, &y, d);
  *ox = x;
  *oy = y;
}

/* reproject_image_points for one pixel (geom/camera.py:236): src pixel ->
 * world ray -> dst pixel; exact for shared optical center. */
static void reproject_pt(const double *Ks, const double *Rs, const double *ds,
                         const double *Kd, const double *Rd, const double *dd,
                         double px, double py, double *ox, double *oy) {
  double x, y;
  img_to_ray(Ks, ds, px, py, &x, &y);
  double w0 = x * Rs[0] + y * Rs[3] + Rs[6];
  double w1 = x * Rs[1] + y * Rs[4] + Rs[7];
  double w2 = x * Rs[2] + y * Rs[5] + Rs[8];
  double c0 = w0 * Rd[0] + w1 * Rd[1] + w2 * Rd[2];
  double c1 = w0 * Rd[3] + w1 * Rd[4] + w2 * Rd[5];
  double c2 = w0 * Rd[6] + w1 * Rd[7] + w2 * Rd[8];
  cam_to_img(Kd, dd, c0, c1, c2, ox, oy);
}

static double nan_to_num(double v) {
  if (isnan(v)) return 0.0;
  if (isinf(v)) return v > 0 ? DBL_MAX : -DBL_MAX;
  return v;
}

/* --------------------------------------------------------------- the engine */

/* Output layout (doubles), NBASE = 40 then GT blocks of J each:
 *   [0:9]   warp H   = M @ inv(K_crop)
 *   [9:13]  warp K rebased to tile coords (f32-rounded pre-rebase, matching
 *           rebase_warp_params operating on get_warp_params' f32 output)
 *   [13:18] source distortion
 *   [18:27] crop intrinsics K
 *   [27:36] rot_to_orig = R_src @ R_crop^T (= warp M)
 *   [36:40] warp K UNREBASED (frame mode / prepare_inference_crop_params)
 *   [40 : 40+3J]           coords3d (crop camera frame, mm)
 *   [40+3J : 40+5J]        coords2d (crop pixels)
 *   [40+5J : 40+6J]        joint_validity (3D)
 *   [40+6J : 40+7J]        joint_validity_2d
 */
#define NBASE 40

PyObject *py_crop_params(PyObject *self, PyObject *args) {
  Py_buffer cam_buf, bbox_buf, coords_buf, valid_buf, mirror_buf;
  int proc_side, tile_side, img_w, img_h, flip, mode, J;
  double box_expansion, shift_x, shift_y, scale, rot_rad;
  if (!PyArg_ParseTuple(args, "y*y*iiiidddddiiiy*y*y*", &cam_buf, &bbox_buf,
                        &proc_side, &tile_side, &img_w, &img_h, &box_expansion,
                        &shift_x, &shift_y, &scale, &rot_rad, &flip, &mode, &J,
                        &coords_buf, &valid_buf, &mirror_buf))
    return NULL;

  PyObject *result = NULL;
  const Py_ssize_t coords_need =
      (mode == 0) ? (Py_ssize_t)J * 3 * 8 : (mode == 1) ? (Py_ssize_t)J * 2 * 8 : 0;
  if (cam_buf.len != 29 * 8 || bbox_buf.len != 4 * 8 ||
      coords_buf.len < coords_need || valid_buf.len < J ||
      mirror_buf.len < (Py_ssize_t)J * 4 || J < 0 || proc_side < 1 ||
      tile_side < 1 || mode < 0 || mode > 2) {
    PyErr_SetString(PyExc_ValueError, "crop_params: bad buffer sizes/args");
    goto done;
  }

  {
    const double *cam = (const double *)cam_buf.buf;
    const double *Ko = cam;           /* original K, row-major 3x3 */
    const double *Ro = cam + 9;       /* original R */
    const double *t = cam + 18;       /* optical center (world) */
    const double *dist = cam + 21;    /* k1 k2 p1 p2 k3 */
    const double *up = cam + 26;      /* world_up */
    const double *bbox = (const double *)bbox_buf.buf;
    const double *coords = (const double *)coords_buf.buf;
    const uint8_t *valid_in = (const uint8_t *)valid_buf.buf;
    const int32_t *mirror = (const int32_t *)mirror_buf.buf;

    const Py_ssize_t n_out = NBASE + (Py_ssize_t)J * 7;
    PyObject *out_bytes = PyBytes_FromStringAndSize(NULL, n_out * 8);
    if (!out_bytes) goto done;
    double *out = (double *)PyBytes_AS_STRING(out_bytes);
    memset(out, 0, (size_t)n_out * 8);

    /* ---- step 1: box -> square (+ shift), boxes.expand_to_square ------- */
    double side = (bbox[2] > bbox[3] ? bbox[2] : bbox[3]) * box_expansion;
    double cx0 = bbox[0] + bbox[2] / 2.0, cy0 = bbox[1] + bbox[3] / 2.0;
    /* box_around twice, matching crops.make_crop_camera order */
    double bx0 = cx0 - side / 2.0, by0 = cy0 - side / 2.0;
    double bcx = (bx0 + side / 2.0) + shift_x * side;
    double bcy = (by0 + side / 2.0) + shift_y * side;
    double box_x = bcx - side / 2.0, box_y = bcy - side / 2.0;

    /* ---- crop camera state: copy of the original, undistorted ---------- */
    double Kc[9], Rc[9];
    memcpy(Kc, Ko, sizeof(Kc));
    memcpy(Rc, Ro, sizeof(Rc));
    const double dist0[5] = {0, 0, 0, 0, 0};

    /* ---- step 2: turn_towards(image_to_world(box center, depth 1000)) -- */
    {
      double rx, ry;
      img_to_ray(Ko, dist, bcx, bcy, &rx, &ry);
      double pc0 = rx * 1000.0, pc1 = ry * 1000.0, pc2 = 1000.0;
      double cw0 = pc0 * Ro[0] + pc1 * Ro[3] + pc2 * Ro[6] + t[0];
      double cw1 = pc0 * Ro[1] + pc1 * Ro[4] + pc2 * Ro[7] + t[1];
      double cw2 = pc0 * Ro[2] + pc1 * Ro[5] + pc2 * Ro[8] + t[2];
      double z0 = cw0 - t[0], z1 = cw1 - t[1], z2 = cw2 - t[2];
      double zn = sqrt(z0 * z0 + z1 * z1 + z2 * z2);
      z0 /= zn; z1 /= zn; z2 /= zn;
      double d0 = -up[0], d1 = -up[1], d2 = -up[2];
      double dz = d0 * z0 + d1 * z1 + d2 * z2;
      double y0 = d0 - dz * z0, y1 = d1 - dz * z1, y2 = d2 - dz * z2;
      double yn = sqrt(y0 * y0 + y1 * y1 + y2 * y2);
      if (yn < 1e-8) { /* looking straight up/down: previous y as tiebreak */
        double rz = Rc[3] * z0 + Rc[4] * z1 + Rc[5] * z2;
        y0 = Rc[3] - rz * z0; y1 = Rc[4] - rz * z1; y2 = Rc[5] - rz * z2;
        yn = sqrt(y0 * y0 + y1 * y1 + y2 * y2);
      }
      y0 /= yn; y1 /= yn; y2 /= yn;
      double x0 = y1 * z2 - y2 * z1;
      double x1 = y2 * z0 - y0 * z2;
      double x2 = y0 * z1 - y1 * z0;
      Rc[0] = x0; Rc[1] = x1; Rc[2] = x2;
      Rc[3] = y0; Rc[4] = y1; Rc[5] = y2;
      Rc[6] = z0; Rc[7] = z1; Rc[8] = z2;
    }

    /* ---- square_pixels, flip, rotate ------------------------------------ */
    {
      double f = (Kc[0] + Kc[4]) / 2.0;
      Kc[0] = f;
      Kc[4] = f;
    }
    if (flip) {
      Rc[0] = -Rc[0]; Rc[1] = -Rc[1]; Rc[2] = -Rc[2];
      Kc[1] = -Kc[1];
    }
    if (rot_rad != 0.0) {
      double c = cos(rot_rad), s = sin(rot_rad);
      double rot[9] = {c, s, 0.0, -s, c, 0.0, 0.0, 0.0, 1.0};
      double tmp[9];
      mat3_mul(rot, Rc, tmp);
      memcpy(Rc, tmp, sizeof(tmp));
    }

    /* ---- zoom so the box boundary fits the output ----------------------- */
    {
      /* 16 boundary points: edges TL->TR->BR->BL, t = 0,.25,.5,.75 */
      double cxs[4] = {box_x, box_x + side, box_x + side, box_x};
      double cys[4] = {box_y, box_y, box_y + side, box_y + side};
      double half_extent = 0.0;
      double ppx = Kc[2], ppy = Kc[5];
      for (int e = 0; e < 4; e++) {
        double ax = cxs[e], ay = cys[e];
        double bx = cxs[(e + 1) % 4], by = cys[(e + 1) % 4];
        for (int k = 0; k < 4; k++) {
          double tt = 0.25 * k;
          double px = ax + (bx - ax) * tt, py = ay + (by - ay) * tt;
          double ox, oy;
          reproject_pt(Ko, Ro, dist, Kc, Rc, dist0, px, py, &ox, &oy);
          double dx = fabs(ox - ppx), dy = fabs(oy - ppy);
          if (dx > half_extent) half_extent = dx;
          if (dy > half_extent) half_extent = dy;
        }
      }
      double zf =
          scale * (proc_side / 2.0) / (half_extent > 1e-6 ? half_extent : 1e-6);
      Kc[0] *= zf;
      Kc[4] *= zf;
      Kc[2] = (proc_side - 1) / 2.0;
      Kc[5] = (proc_side - 1) / 2.0;
    }

    /* ---- source ROI: reproject the 5x5 crop grid into the source ------- */
    int x0i, y0i, x1i, y1i, factor;
    {
      double lox = INFINITY, loy = INFINITY, hix = -INFINITY, hiy = -INFINITY;
      double step = (proc_side - 1) / 4.0;
      for (int gx = 0; gx < 5; gx++)
        for (int gy = 0; gy < 5; gy++) {
          double ox, oy;
          reproject_pt(Kc, Rc, dist0, Ko, Ro, dist, gx * step, gy * step, &ox,
                       &oy);
          if (ox < lox) lox = ox;
          if (ox > hix) hix = ox;
          if (oy < loy) loy = oy;
          if (oy > hiy) hiy = oy;
        }
      double lx = floor(lox) - 2.0, ly = floor(loy) - 2.0;
      double hx = ceil(hix) + 3.0, hy = ceil(hiy) + 3.0;
      if (lx < 0) lx = 0;
      if (ly < 0) ly = 0;
      if (hx > img_w) hx = img_w;
      if (hy > img_h) hy = img_h;
      double roi_w = hx - lx, roi_h = hy - ly;
      if (roi_w < 1) roi_w = 1;
      if (roi_h < 1) roi_h = 1;
      double m = roi_w > roi_h ? roi_w : roi_h;
      factor = (int)ceil(m / tile_side);
      if (factor < 1) factor = 1;
      x0i = (int)lx;
      y0i = (int)ly;
      x1i = (int)hx;
      y1i = (int)hy;
    }

    /* ---- warp params (geom/camera.get_warp_params + tile rebase) -------- */
    {
      double M[9], Kinv[9], H[9];
      mat3_mul_bt(Ro, Rc, M);
      if (mat3_inv(Kc, Kinv) != 0) {
        Py_DECREF(out_bytes);
        PyErr_SetString(PyExc_ValueError, "crop_params: singular K");
        goto done;
      }
      mat3_mul(M, Kinv, H);
      memcpy(out + 0, H, sizeof(H));
      /* K rounds through f32 before the rebase, matching
       * rebase_warp_params(get_warp_params(...)) on the f32 dict */
      double fx = (double)(float)Ko[0], fy = (double)(float)Ko[4];
      double cxp = (double)(float)Ko[2], cyp = (double)(float)Ko[5];
      out[9] = fx / factor;
      out[10] = fy / factor;
      out[11] = (cxp - x0i) / factor;
      out[12] = (cyp - y0i) / factor;
      memcpy(out + 13, dist, 5 * 8);
      memcpy(out + 18, Kc, sizeof(Kc));
      memcpy(out + 27, M, sizeof(M));
      out[36] = Ko[0];
      out[37] = Ko[4];
      out[38] = Ko[2];
      out[39] = Ko[5];
    }

    /* ---- ground truth --------------------------------------------------- */
    double *c3 = out + NBASE;
    double *c2 = c3 + (Py_ssize_t)J * 3;
    double *v3 = c2 + (Py_ssize_t)J * 2;
    double *v2 = v3 + J;
    if (mode == 0) {
      for (int j = 0; j < J; j++) {
        const double *p = coords + (Py_ssize_t)j * 3;
        int wfinite = isfinite(p[0]) && isfinite(p[1]) && isfinite(p[2]);
        double q0 = p[0] - t[0], q1 = p[1] - t[1], q2 = p[2] - t[2];
        double a = q0 * Rc[0] + q1 * Rc[1] + q2 * Rc[2];
        double b = q0 * Rc[3] + q1 * Rc[4] + q2 * Rc[5];
        double c = q0 * Rc[6] + q1 * Rc[7] + q2 * Rc[8];
        double ix, iy;
        cam_to_img(Kc, dist0, a, b, c, &ix, &iy);
        int v2ok = valid_in[j] && isfinite(ix) && isfinite(iy) && ix >= -0.5 &&
                   ix <= proc_side - 0.5 && iy >= -0.5 && iy <= proc_side - 0.5;
        c3[j * 3 + 0] = nan_to_num(a);
        c3[j * 3 + 1] = nan_to_num(b);
        c3[j * 3 + 2] = nan_to_num(c);
        c2[j * 2 + 0] = nan_to_num(ix);
        c2[j * 2 + 1] = nan_to_num(iy);
        v3[j] = (valid_in[j] && wfinite) ? 1.0 : 0.0;
        v2[j] = v2ok ? 1.0 : 0.0;
      }
    } else if (mode == 1) {
      for (int j = 0; j < J; j++) {
        const double *p = coords + (Py_ssize_t)j * 2;
        double ix, iy;
        reproject_pt(Ko, Ro, dist, Kc, Rc, dist0, p[0], p[1], &ix, &iy);
        int v2ok = valid_in[j] && isfinite(ix) && isfinite(iy) && ix >= -0.5 &&
                   ix <= proc_side - 0.5 && iy >= -0.5 && iy <= proc_side - 0.5;
        c2[j * 2 + 0] = nan_to_num(ix);
        c2[j * 2 + 1] = nan_to_num(iy);
        v2[j] = v2ok ? 1.0 : 0.0;
      }
    }
    if (flip && J > 0 && mode != 2) {
      double *tmp = (double *)PyMem_Malloc((size_t)J * 7 * 8);
      if (!tmp) {
        Py_DECREF(out_bytes);
        PyErr_NoMemory();
        goto done;
      }
      memcpy(tmp, c3, (size_t)J * 7 * 8);
      double *t3 = tmp, *t2 = tmp + (Py_ssize_t)J * 3,
             *tv3 = t2 + (Py_ssize_t)J * 2, *tv2 = tv3 + J;
      for (int j = 0; j < J; j++) {
        int m = mirror[j];
        if (m < 0 || m >= J) m = j;
        c3[j * 3 + 0] = t3[m * 3 + 0];
        c3[j * 3 + 1] = t3[m * 3 + 1];
        c3[j * 3 + 2] = t3[m * 3 + 2];
        c2[j * 2 + 0] = t2[m * 2 + 0];
        c2[j * 2 + 1] = t2[m * 2 + 1];
        v3[j] = tv3[m];
        v2[j] = tv2[m];
      }
      PyMem_Free(tmp);
    }

    result = Py_BuildValue("(Niiiii)", out_bytes, x0i, y0i, x1i, y1i, factor);
  }

done:
  PyBuffer_Release(&cam_buf);
  PyBuffer_Release(&bbox_buf);
  PyBuffer_Release(&coords_buf);
  PyBuffer_Release(&valid_buf);
  PyBuffer_Release(&mirror_buf);
  return result;
}

// medmamba_io: native host-side data-loading kernels.
//
// The reference delegates image decode/resize to PIL inside torch DataLoader
// worker processes (train.py:162-170). Here the host data path is native C++:
//   * decode_resize:     JPEG/PNG decode -> RGB -> bilinear resize (one image)
//   * batch_decode_resize: thread-pool batched version (off the GIL)
//   * gather_u8:         batched index-gather for the NPZ (MedMNIST) arrays
// Exposed with a plain C ABI and wrapped via ctypes (medmamba_tpu/data/native.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <cstdlib>
#include <thread>
#include <vector>
#include <atomic>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// PIL-compatible BILINEAR resize: separable triangle filter with support
// widened by the scale factor when downsampling (antialiasing), matching
// PIL.Image.resize(..., BILINEAR) used by torchvision transforms.
// ---------------------------------------------------------------------------
struct FilterTaps {
  std::vector<int> start;     // first source index per output coord
  std::vector<int> count;     // number of taps per output coord
  std::vector<float> weights; // packed, max_taps per output coord
  int max_taps = 0;
};

static FilterTaps make_taps(int src, int dst) {
  FilterTaps t;
  double scale = (double)src / dst;
  double fscale = scale < 1.0 ? 1.0 : scale;
  double support = 1.0 * fscale;  // triangle filter support = 1
  t.max_taps = (int)(support * 2.0 + 3.0);
  t.start.resize(dst);
  t.count.resize(dst);
  t.weights.assign((size_t)dst * t.max_taps, 0.0f);
  for (int i = 0; i < dst; ++i) {
    double center = (i + 0.5) * scale;
    int lo = (int)(center - support + 0.5);
    int hi = (int)(center + support + 0.5);
    if (lo < 0) lo = 0;
    if (hi > src) hi = src;
    double total = 0.0;
    int n = hi - lo;
    for (int j = 0; j < n; ++j) {
      double x = (lo + j + 0.5 - center) / fscale;
      double w = x < 0 ? 1.0 + x : 1.0 - x;
      if (w < 0) w = 0;
      t.weights[(size_t)i * t.max_taps + j] = (float)w;
      total += w;
    }
    if (total > 0) {
      for (int j = 0; j < n; ++j)
        t.weights[(size_t)i * t.max_taps + j] /= (float)total;
    }
    t.start[i] = lo;
    t.count[i] = n;
  }
  return t;
}

static void bilinear_resize_rgb(const uint8_t* src, int sh, int sw,
                                uint8_t* dst, int dh, int dw) {
  if (sh == dh && sw == dw) {
    memcpy(dst, src, (size_t)sh * sw * 3);
    return;
  }
  FilterTaps tx = make_taps(sw, dw);
  FilterTaps ty = make_taps(sh, dh);
  // horizontal pass: (sh, sw) -> (sh, dw), float intermediate
  std::vector<float> tmp((size_t)sh * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + (size_t)y * sw * 3;
    float* orow = tmp.data() + (size_t)y * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const float* w = tx.weights.data() + (size_t)x * tx.max_taps;
      int s0 = tx.start[x], n = tx.count[x];
      float acc0 = 0, acc1 = 0, acc2 = 0;
      for (int j = 0; j < n; ++j) {
        const uint8_t* p = row + (size_t)(s0 + j) * 3;
        acc0 += w[j] * p[0];
        acc1 += w[j] * p[1];
        acc2 += w[j] * p[2];
      }
      orow[x * 3 + 0] = acc0;
      orow[x * 3 + 1] = acc1;
      orow[x * 3 + 2] = acc2;
    }
  }
  // vertical pass: (sh, dw) -> (dh, dw)
  for (int y = 0; y < dh; ++y) {
    const float* w = ty.weights.data() + (size_t)y * ty.max_taps;
    int s0 = ty.start[y], n = ty.count[y];
    uint8_t* orow = dst + (size_t)y * dw * 3;
    for (int x = 0; x < dw * 3; ++x) {
      float acc = 0;
      for (int j = 0; j < n; ++j)
        acc += w[j] * tmp[(size_t)(s0 + j) * dw * 3 + x];
      acc += 0.5f;
      orow[x] = acc <= 0 ? 0 : (acc >= 255.f ? 255 : (uint8_t)acc);
    }
  }
}

// ---------------------------------------------------------------------------
// JPEG decode
// ---------------------------------------------------------------------------
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = (JpegErr*)cinfo->err;
  longjmp(e->jb, 1);
}

// target > 0 enables DCT-domain scaled decode (libjpeg scale_num/8): pick
// the smallest N in 1..8 whose scaled dims still cover `target`, so the
// subsequent triangle resize only ever downsamples. Cuts IDCT work up to
// (N/8)^2 and feeds the resize a much smaller image (the DALI /
// tf.image "decode at reduced scale" trick); target <= 0 decodes full-res
// (bit-exact PIL-parity path, the default).
static int decode_jpeg(FILE* f, std::vector<uint8_t>* out, int* h, int* w,
                       int target) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (target > 0) {
    int side = cinfo.image_width < cinfo.image_height
                   ? cinfo.image_width : cinfo.image_height;
    int num = 8;
    while (num > 1 && (side * (num - 1)) / 8 >= target) --num;
    cinfo.scale_num = num;
    cinfo.scale_denom = 8;
  }
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  out->resize((size_t)(*h) * (*w) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + (size_t)cinfo.output_scanline * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ---------------------------------------------------------------------------
// PNG decode
// ---------------------------------------------------------------------------
static int decode_png(FILE* f, std::vector<uint8_t>* out, int* h, int* w) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); return -1; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);             // palette/gray->8bit
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  *h = png_get_image_height(png, info);
  *w = png_get_image_width(png, info);
  if (png_get_rowbytes(png, info) != (size_t)(*w) * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  out->resize((size_t)(*h) * (*w) * 3);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y) rows[y] = out->data() + (size_t)y * (*w) * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// ---------------------------------------------------------------------------
// Public API
// ---------------------------------------------------------------------------

// Decode one image file (JPEG or PNG by magic) and bilinear-resize into
// dst (size*size*3 uint8). fast != 0 enables DCT-scaled JPEG decode (see
// decode_jpeg; PNG is unaffected). Returns 0 on success.
int decode_resize_ex(const char* path, int size, uint8_t* dst, int fast) {
  FILE* f = fopen(path, "rb");
  if (!f) return -2;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  std::vector<uint8_t> buf;
  int h = 0, w = 0, rc = -1;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    rc = decode_jpeg(f, &buf, &h, &w, fast ? size : 0);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    rc = decode_png(f, &buf, &h, &w);
  }
  fclose(f);
  if (rc != 0 || h <= 0 || w <= 0) return -1;
  bilinear_resize_rgb(buf.data(), h, w, dst, size, size);
  return 0;
}

int decode_resize(const char* path, int size, uint8_t* dst) {
  return decode_resize_ex(path, size, dst, 0);
}

// Batched threaded decode+resize. paths: n C strings. dst: (n, size, size, 3).
// status: per-image return codes. Returns count of failures.
int batch_decode_resize_ex(const char** paths, int n, int size, uint8_t* dst,
                           int* status, int n_threads, int fast) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), fails(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = decode_resize_ex(paths[i], size,
                                dst + (size_t)i * size * size * 3, fast);
      status[i] = rc;
      if (rc != 0) fails.fetch_add(1);
    }
  };
  std::vector<std::thread> ts;
  for (int t = 0; t < n_threads - 1; ++t) ts.emplace_back(worker);
  worker();
  for (auto& t : ts) t.join();
  return fails.load();
}

int batch_decode_resize(const char** paths, int n, int size, uint8_t* dst,
                        int* status, int n_threads) {
  return batch_decode_resize_ex(paths, n, size, dst, status, n_threads, 0);
}

// Batched gather: out[i] = src[idx[i]] for row-major uint8 rows of row_bytes.
void gather_u8(const uint8_t* src, const int64_t* idx, int n,
               int64_t row_bytes, uint8_t* out) {
  for (int i = 0; i < n; ++i) {
    memcpy(out + (size_t)i * row_bytes, src + (size_t)idx[i] * row_bytes,
           (size_t)row_bytes);
  }
}

}  // extern "C"

// Native data-loader core: threaded JPEG/PNG decode -> bilinear resize ->
// normalize -> NHWC float32, exposed as a C ABI for ctypes.
//
// This replaces the reference's torch DataLoader worker *processes*
// (train_src.py:16-25) with an in-process thread pool: libjpeg/libpng decode
// releases no GIL issues (we never touch Python), the resize matches torch
// bilinear align_corners=false (the same formula ops/resize.py uses on
// device), and the output buffer is written directly into caller-provided
// NHWC float32 memory ready for jax.device_put.
//
// Build: g++ -O3 -shared -fPIC segdata.cpp -o libsegdata.so -ljpeg -lpng -lpthread

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>
#include <atomic>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<unsigned char> data;  // HWC, 1 or 3 channels
  int h = 0, w = 0, c = 0;
  bool ok = false;
};

// ---------------------------------------------------------------- JPEG ----
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

Image decode_jpeg(FILE* f) {
  Image img;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img.w = cinfo.output_width;
  img.h = cinfo.output_height;
  img.c = cinfo.output_components;
  img.data.resize(size_t(img.w) * img.h * img.c);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = img.data.data() + size_t(cinfo.output_scanline) * img.w * img.c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  img.ok = true;
  return img;
}

// ----------------------------------------------------------------- PNG ----
Image decode_png(FILE* f) {
  Image img;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return img;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return img;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return img;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  int channels = png_get_channels(png, info);
  img.w = int(w);
  img.h = int(h);
  img.c = channels;
  img.data.resize(size_t(w) * h * channels);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = img.data.data() + size_t(y) * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  img.ok = true;
  return img;
}

Image decode_file(const char* path) {
  Image bad;
  FILE* f = std::fopen(path, "rb");
  if (!f) return bad;
  unsigned char magic[8] = {0};
  size_t got = std::fread(magic, 1, 8, f);
  std::rewind(f);
  Image img;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    img = decode_jpeg(f);
  } else if (got >= 8 && !png_sig_cmp(magic, 0, 8)) {
    img = decode_png(f);
  }
  std::fclose(f);
  return img;
}

// --------------------------------------------------------------- resize ----
// torch bilinear align_corners=false coordinates (matches ops/resize.py)
inline void interp_coeffs(int in_size, int out_size, int i,
                          int* lo, int* hi, float* frac) {
  if (in_size == out_size) {
    *lo = *hi = i;
    *frac = 0.f;
    return;
  }
  float scale = float(in_size) / out_size;
  float src = (i + 0.5f) * scale - 0.5f;
  if (src < 0) src = 0;
  if (src > in_size - 1) src = float(in_size - 1);
  *lo = int(std::floor(src));
  *hi = *lo + 1 < in_size ? *lo + 1 : in_size - 1;
  *frac = src - *lo;
}

// decode one image, bilinear-resize to (oh,ow), normalize, write NHWC f32.
bool process_one(const char* path, int oh, int ow, const float* mean,
                 const float* stdv, float scale, float* out) {
  Image img = decode_file(path);
  if (!img.ok) return false;
  const int c_out = 3;
  for (int y = 0; y < oh; ++y) {
    int y0, y1; float fy;
    interp_coeffs(img.h, oh, y, &y0, &y1, &fy);
    for (int x = 0; x < ow; ++x) {
      int x0, x1; float fx;
      interp_coeffs(img.w, ow, x, &x0, &x1, &fx);
      for (int ch = 0; ch < c_out; ++ch) {
        int cs = img.c == 1 ? 0 : ch;  // broadcast grayscale
        float v00 = img.data[(size_t(y0) * img.w + x0) * img.c + cs];
        float v01 = img.data[(size_t(y0) * img.w + x1) * img.c + cs];
        float v10 = img.data[(size_t(y1) * img.w + x0) * img.c + cs];
        float v11 = img.data[(size_t(y1) * img.w + x1) * img.c + cs];
        float top = v00 + (v01 - v00) * fx;
        float bot = v10 + (v11 - v10) * fx;
        float v = (top + (bot - top) * fy) * scale;
        out[(size_t(y) * ow + x) * c_out + ch] = (v - mean[ch]) / stdv[ch];
      }
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Decode+resize+normalize a batch of image files into out[N,OH,OW,3] f32.
// scale: multiplier applied to raw uint8 values before normalize (use 1/255
// for [0,1] pipelines, 1.0 for raw-255 pipelines).  Returns the number of
// successfully decoded images; failures leave zeros and set ok[i]=0.
int segdata_load_batch(const char** paths, int n, int oh, int ow,
                       const float* mean, const float* stdv, float scale,
                       int nthreads, float* out, unsigned char* ok) {
  if (nthreads < 1) nthreads = 1;
  std::atomic<int> next(0), good(0);
  size_t stride = size_t(oh) * ow * 3;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      bool r = process_one(paths[i], oh, ow, mean, stdv, scale, out + stride * i);
      ok[i] = r ? 1 : 0;
      if (r) good.fetch_add(1);
      else std::memset(out + stride * i, 0, stride * sizeof(float));
    }
  };
  std::vector<std::thread> threads;
  int nt = nthreads < n ? nthreads : n;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return good.load();
}

// Write an HxW uint8 class-id map as an 8-bit palettized (P-mode) PNG —
// the --saveres pseudo-label export format (reference utility.py:211-217
// via PIL; this is the native fast path for Cityscapes-scale exports).
// palette: pal_n RGB triplets (<= 256).  Returns 1 on success.
int segdata_save_palette_png(const char* path, const unsigned char* pred,
                             int h, int w, const unsigned char* palette,
                             int pal_n) {
  if (pal_n < 1 || pal_n > 256) return 0;
  FILE* f = std::fopen(path, "wb");
  if (!f) return 0;
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                            nullptr, nullptr);
  if (!png) { std::fclose(f); return 0; }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    std::fclose(f);
    return 0;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    std::fclose(f);
    return 0;
  }
  png_init_io(png, f);
  png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_PALETTE,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_color plte[256];
  for (int i = 0; i < pal_n; ++i) {
    plte[i].red = palette[i * 3 + 0];
    plte[i].green = palette[i * 3 + 1];
    plte[i].blue = palette[i * 3 + 2];
  }
  png_set_PLTE(png, info, plte, pal_n);
  // label PNGs favor write speed over ratio: id maps are runs of equal
  // bytes, which compress fine even at the fastest level
  png_set_compression_level(png, 3);
  png_write_info(png, info);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y)
    rows[y] = const_cast<png_bytep>(pred + size_t(y) * w);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(f);
  return 1;
}

// Threaded batch flavor: preds is n contiguous HxW maps.  Returns count
// written; ok[i] records per-file success.
int segdata_save_palette_png_batch(const char** paths,
                                   const unsigned char* preds, int n, int h,
                                   int w, const unsigned char* palette,
                                   int pal_n, int nthreads,
                                   unsigned char* ok) {
  if (nthreads < 1) nthreads = 1;
  std::atomic<int> next(0), good(0);
  size_t stride = size_t(h) * w;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int r = segdata_save_palette_png(paths[i], preds + stride * i, h, w,
                                       palette, pal_n);
      ok[i] = static_cast<unsigned char>(r);
      if (r) good.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  int nt = nthreads < n ? nthreads : n;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return good.load();
}

// Decode a single image to uint8 HWC (for label maps / inspection).
// Returns 1 on success; caller provides max_bytes-sized buffer and receives
// h/w/c. Images larger than max_bytes fail.
int segdata_decode(const char* path, unsigned char* out, long max_bytes,
                   int* h, int* w, int* c) {
  Image img = decode_file(path);
  if (!img.ok) return 0;
  long need = long(img.data.size());
  if (need > max_bytes) return 0;
  std::memcpy(out, img.data.data(), img.data.size());
  *h = img.h;
  *w = img.w;
  *c = img.c;
  return 1;
}

}  // extern "C"

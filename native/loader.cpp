// Native batched image loader: multithreaded JPEG/PNG decode + bilinear
// resize into a caller-provided contiguous uint8 NHWC buffer.
//
// This is the TPU-native equivalent of the reference's
// DataLoader(num_workers=8) worker processes (train/train.py:76-78): the
// per-sample hot path (decode -> RGB -> resize) runs in C++ with a
// persistent thread pool, avoiding Python object overhead entirely; the
// Python side (imageretrievalresearch_tpu/data/native_loader.py) binds via
// ctypes and falls back to PIL when this library is unavailable.
//
// Build: make -C native    (g++ -O3 -shared -fPIC loader.cpp -ljpeg -lpng)

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <memory>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------------------------------------------------------------------------
// thread pool (persistent across calls; sized lazily)
// ---------------------------------------------------------------------------

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

  int size() const { return static_cast<int>(workers_.size()); }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

// Reference-counted pool handle: a resize replaces the shared pointer, but
// any in-flight batch call keeps the old pool alive (and is the one to join
// its workers on release) — never destroys a pool under a concurrent caller.
std::shared_ptr<ThreadPool> pool(int want) {
  static std::mutex mu;
  static std::shared_ptr<ThreadPool> p;
  std::lock_guard<std::mutex> lk(mu);
  if (!p || (want > 0 && p->size() != want)) {
    p = std::make_shared<ThreadPool>(
        want > 0 ? want
                 : std::max(2u, std::thread::hardware_concurrency()));
  }
  return p;
}

// ---------------------------------------------------------------------------
// decoders -> RGB8 (h, w, 3)
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jmp, 1);
}

bool decode_jpeg(FILE* f, std::vector<uint8_t>* out, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, std::vector<uint8_t>* out, int* w, int* h) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  // normalize everything to 8-bit RGB (white background for alpha, matching
  // PIL convert('RGB') on typical sketch PNGs closely enough; exact alpha
  // compositing differs only for semi-transparent pixels)
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  // Adam7-interlaced PNGs: register the de-interlacer, then read the whole
  // image at once (png_read_image composes all passes; plain row-by-row
  // reads would return raw interlace-pass rows — scrambled pixels counted
  // as a successful decode)
  png_set_interlace_handling(png);
  png_read_update_info(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  if (rowbytes < static_cast<size_t>(*w) * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  out->resize(static_cast<size_t>(*w) * *h * 3);
  std::vector<uint8_t> img(rowbytes * *h);
  {
    std::vector<png_bytep> rows(*h);
    for (int y = 0; y < *h; ++y) rows[y] = img.data() + rowbytes * y;
    png_read_image(png, rows.data());
  }
  for (int y = 0; y < *h; ++y)
    std::memcpy(out->data() + static_cast<size_t>(y) * *w * 3,
                img.data() + rowbytes * y, static_cast<size_t>(*w) * 3);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool has_suffix(const char* path, const char* suf) {
  size_t lp = std::strlen(path), ls = std::strlen(suf);
  if (ls > lp) return false;
  for (size_t i = 0; i < ls; ++i) {
    char a = path[lp - ls + i], b = suf[i];
    if (a >= 'A' && a <= 'Z') a += 32;
    if (a != b) return false;
  }
  return true;
}

// bilinear resize (align-corners=false, PIL/torch convention) RGB8 -> RGB8
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst,
                     int dh, int dw) {
  if (sh == dh && sw == dw) {
    std::memcpy(dst, src, static_cast<size_t>(dh) * dw * 3);
    return;
  }
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(fy >= 0 ? fy : fy - 1);  // floor
    float wy = fy - y0;
    int y1 = y0 + 1;
    y0 = y0 < 0 ? 0 : (y0 >= sh ? sh - 1 : y0);
    y1 = y1 < 0 ? 0 : (y1 >= sh ? sh - 1 : y1);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(fx >= 0 ? fx : fx - 1);
      float wx = fx - x0;
      int x1 = x0 + 1;
      x0 = x0 < 0 ? 0 : (x0 >= sw ? sw - 1 : x0);
      x1 = x1 < 0 ? 0 : (x1 >= sw ? sw - 1 : x1);
      const uint8_t* p00 = src + (static_cast<size_t>(y0) * sw + x0) * 3;
      const uint8_t* p01 = src + (static_cast<size_t>(y0) * sw + x1) * 3;
      const uint8_t* p10 = src + (static_cast<size_t>(y1) * sw + x0) * 3;
      const uint8_t* p11 = src + (static_cast<size_t>(y1) * sw + x1) * 3;
      uint8_t* o = dst + (static_cast<size_t>(y) * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] + wx * (p01[c] - p00[c]);
        float bot = p10[c] + wx * (p11[c] - p10[c]);
        float v = top + wy * (bot - top);
        o[c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// decode one file and write resized RGB into out (th, tw, 3); returns ok
bool load_one(const char* path, int th, int tw, uint8_t* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::vector<uint8_t> buf;
  int w = 0, h = 0;
  bool ok;
  if (has_suffix(path, ".png")) {
    ok = decode_png(f, &buf, &w, &h);
  } else if (has_suffix(path, ".jpg") || has_suffix(path, ".jpeg")) {
    ok = decode_jpeg(f, &buf, &w, &h);
  } else {
    // sniff: PNG signature else try JPEG
    uint8_t sig[8] = {0};
    size_t got = std::fread(sig, 1, 8, f);
    std::rewind(f);
    if (got == 8 && png_sig_cmp(sig, 0, 8) == 0) {
      ok = decode_png(f, &buf, &w, &h);
    } else {
      ok = decode_jpeg(f, &buf, &w, &h);
    }
  }
  std::fclose(f);
  if (!ok || w <= 0 || h <= 0) return false;
  resize_bilinear(buf.data(), h, w, out, th, tw);
  return true;
}

}  // namespace

extern "C" {

// Decode n images into out (n, th, tw, 3) uint8. Failed decodes are filled
// with gray (128) and counted in the return value. num_threads <= 0 uses
// hardware concurrency. Thread-safe w.r.t. distinct output buffers.
int irt_decode_resize_batch(const char** paths, int n, int th, int tw,
                            uint8_t* out, int num_threads) {
  std::shared_ptr<ThreadPool> tp = pool(num_threads);
  std::atomic<int> failures(0);
  int done = 0;  // guarded by mu
  std::mutex mu;
  std::condition_variable cv;
  const size_t stride = static_cast<size_t>(th) * tw * 3;
  for (int i = 0; i < n; ++i) {
    tp->submit([&, i] {
      uint8_t* dst = out + stride * i;
      if (!load_one(paths[i], th, tw, dst)) {
        std::memset(dst, 128, stride);
        failures.fetch_add(1);
      }
      // predicate update AND notify both under mu: if either happened
      // outside the lock, the waiting caller could observe done == n,
      // return, and destroy the stack-local mu/cv while this worker is
      // still about to touch them (use-after-scope)
      std::lock_guard<std::mutex> lk(mu);
      if (++done == n) cv.notify_one();
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done == n; });
  return failures.load();
}

// Version tag for the ctypes binding to validate.
int irt_loader_abi_version() { return 1; }

}  // extern "C"

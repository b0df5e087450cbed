// Native data-loading runtime: threaded JPEG/PNG decode + resize pipeline.
//
// The reference framework's host-side data path is torch DataLoader worker
// processes running cv2 decode/resize (reference training/dataset.py); this
// is the TPU framework's native equivalent: a C++ thread-pool that decodes
// and resizes image batches straight into caller-provided CHW uint8 buffers
// (zero Python in the per-image path). Exposed through a plain C ABI for
// ctypes (no pybind11 in the image).
//
// Build: make -C native   (produces libgnerf_loader.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Decoders: file -> interleaved RGB8 (HWC)

struct Image {
  std::vector<uint8_t> rgb;  // H*W*3
  int h = 0, w = 0;
  bool ok = false;
};

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

Image decode_jpeg(const char* path) {
  Image img;
  FILE* f = fopen(path, "rb");
  if (!f) return img;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return img;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  img.w = static_cast<int>(cinfo.output_width);
  img.h = static_cast<int>(cinfo.output_height);
  img.rgb.resize(static_cast<size_t>(img.w) * img.h * 3);
  const int stride = img.w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img.rgb.data() + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  img.ok = true;
  return img;
}

Image decode_png(const char* path) {
  Image img;
  FILE* f = fopen(path, "rb");
  if (!f) return img;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return img;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  img.w = static_cast<int>(png_get_image_width(png, info));
  img.h = static_cast<int>(png_get_image_height(png, info));
  png_byte color_type = png_get_color_type(png, info);
  png_byte bit_depth = png_get_bit_depth(png, info);

  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  img.rgb.resize(static_cast<size_t>(img.w) * img.h * 3);
  std::vector<png_bytep> rows(img.h);
  for (int y = 0; y < img.h; y++)
    rows[y] = img.rgb.data() + static_cast<size_t>(y) * img.w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  img.ok = true;
  return img;
}

Image decode_any(const char* path) {
  const char* dot = strrchr(path, '.');
  if (dot && (strcmp(dot, ".png") == 0 || strcmp(dot, ".PNG") == 0))
    return decode_png(path);
  return decode_jpeg(path);
}

// ---------------------------------------------------------------------------
// Resize: box-average for downscale (cv2 INTER_AREA-like), bilinear upscale.

void resize_rgb(const Image& src, int out_h, int out_w,
                std::vector<uint8_t>* out) {
  out->resize(static_cast<size_t>(out_h) * out_w * 3);
  const float sy = static_cast<float>(src.h) / out_h;
  const float sx = static_cast<float>(src.w) / out_w;
  const bool down = sy >= 1.0f && sx >= 1.0f;
  for (int oy = 0; oy < out_h; oy++) {
    for (int ox = 0; ox < out_w; ox++) {
      uint8_t* dst = out->data() + (static_cast<size_t>(oy) * out_w + ox) * 3;
      if (down) {
        // Box average over the source footprint.
        int y0 = static_cast<int>(oy * sy), y1 = static_cast<int>((oy + 1) * sy);
        int x0 = static_cast<int>(ox * sx), x1 = static_cast<int>((ox + 1) * sx);
        y1 = std::max(y1, y0 + 1); x1 = std::max(x1, x0 + 1);
        y1 = std::min(y1, src.h); x1 = std::min(x1, src.w);
        int acc[3] = {0, 0, 0};
        int count = 0;
        for (int y = y0; y < y1; y++) {
          const uint8_t* row = src.rgb.data() + (static_cast<size_t>(y) * src.w + x0) * 3;
          for (int x = x0; x < x1; x++) {
            acc[0] += row[0]; acc[1] += row[1]; acc[2] += row[2];
            row += 3;
            count++;
          }
        }
        for (int c = 0; c < 3; c++)
          dst[c] = static_cast<uint8_t>((acc[c] + count / 2) / count);
      } else {
        // Bilinear with align_corners=False pixel centers.
        float fy = (oy + 0.5f) * sy - 0.5f;
        float fx = (ox + 0.5f) * sx - 0.5f;
        int y0 = static_cast<int>(floorf(fy)), x0 = static_cast<int>(floorf(fx));
        float wy = fy - y0, wx = fx - x0;
        int y0c = std::min(std::max(y0, 0), src.h - 1);
        int y1c = std::min(std::max(y0 + 1, 0), src.h - 1);
        int x0c = std::min(std::max(x0, 0), src.w - 1);
        int x1c = std::min(std::max(x0 + 1, 0), src.w - 1);
        for (int c = 0; c < 3; c++) {
          auto at = [&](int y, int x) {
            return static_cast<float>(
                src.rgb[(static_cast<size_t>(y) * src.w + x) * 3 + c]);
          };
          float top = at(y0c, x0c) * (1 - wx) + at(y0c, x1c) * wx;
          float bot = at(y1c, x0c) * (1 - wx) + at(y1c, x1c) * wx;
          float v = top * (1 - wy) + bot * wy;
          dst[c] = static_cast<uint8_t>(std::min(std::max(v + 0.5f, 0.0f), 255.0f));
        }
      }
    }
  }
}

// HWC interleaved -> planar CHW into the caller's buffer (optionally x-flipped).
void to_chw(const uint8_t* hwc, int h, int w, bool flip_x, uint8_t* chw) {
  const size_t plane = static_cast<size_t>(h) * w;
  for (int y = 0; y < h; y++) {
    const uint8_t* row = hwc + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < w; x++) {
      int sx = flip_x ? (w - 1 - x) : x;
      const uint8_t* px = row + sx * 3;
      const size_t o = static_cast<size_t>(y) * w + x;
      chw[o] = px[0];
      chw[plane + o] = px[1];
      chw[2 * plane + o] = px[2];
    }
  }
}

// ---------------------------------------------------------------------------
// Thread pool

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; i++)
      workers_.emplace_back([this] { Loop(); });
  }
  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void Submit(std::function<void()> fn) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      queue_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void Loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        fn = std::move(queue_.front());
        queue_.pop();
      }
      fn();
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> queue_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

struct Loader {
  std::vector<std::string> paths;
  ThreadPool pool;
  int out_h, out_w;
  Loader(int threads, int h, int w) : pool(threads), out_h(h), out_w(w) {}
};

}  // namespace

extern "C" {

// Create a loader over a fixed file list. paths: array of C strings.
void* loader_create(const char** paths, int64_t n_paths, int threads,
                    int out_h, int out_w) {
  auto* loader = new Loader(threads, out_h, out_w);
  loader->paths.reserve(n_paths);
  for (int64_t i = 0; i < n_paths; i++) loader->paths.emplace_back(paths[i]);
  return loader;
}

void loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

// Decode a batch into out (uint8, [batch, 3, out_h, out_w], caller-owned).
// indices: dataset indices; flips: per-item x-flip flags (may be null).
// Returns the number of successfully decoded items.
int64_t loader_get_batch(void* handle, const int64_t* indices,
                         const uint8_t* flips, int64_t batch, uint8_t* out) {
  auto* loader = static_cast<Loader*>(handle);
  const size_t item = static_cast<size_t>(3) * loader->out_h * loader->out_w;
  std::atomic<int64_t> ok_count{0};
  int64_t done = 0;  // guarded by mu: incremented under the lock so the
                     // waiter cannot pass the predicate (and destroy mu/cv)
                     // before the last worker has released the lock
  std::mutex mu;
  std::condition_variable cv;

  for (int64_t i = 0; i < batch; i++) {
    loader->pool.Submit([&, i] {
      const auto& path = loader->paths[indices[i] % loader->paths.size()];
      Image img = decode_any(path.c_str());
      if (img.ok) {
        std::vector<uint8_t> resized;
        const uint8_t* hwc = img.rgb.data();
        int h = img.h, w = img.w;
        if (h != loader->out_h || w != loader->out_w) {
          resize_rgb(img, loader->out_h, loader->out_w, &resized);
          hwc = resized.data();
          h = loader->out_h;
          w = loader->out_w;
        }
        to_chw(hwc, h, w, flips && flips[i], out + i * item);
        ok_count.fetch_add(1);
      } else {
        memset(out + i * item, 0, item);
      }
      {
        // Increment AND notify under the lock: the waiter (which owns mu
        // inside cv.wait) cannot observe done==batch and destroy mu/cv
        // until this worker has released the lock, after which the worker
        // never touches them again.
        std::lock_guard<std::mutex> lk(mu);
        ++done;
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done == batch; });
  return ok_count.load();
}

// One-shot decode helper (no pool): returns 0 on success.
int decode_image(const char* path, int out_h, int out_w, uint8_t* out) {
  Image img = decode_any(path);
  if (!img.ok) return 1;
  std::vector<uint8_t> resized;
  const uint8_t* hwc = img.rgb.data();
  if (img.h != out_h || img.w != out_w) {
    resize_rgb(img, out_h, out_w, &resized);
    hwc = resized.data();
  }
  to_chw(hwc, out_h, out_w, false, out);
  return 0;
}

}  // extern "C"

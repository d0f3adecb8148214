// Native data loader: JPEG/PNG decode -> aspect-preserving resize ->
// pad-to-square, with a background thread pool prefetching whole batches.
//
// TPU-native replacement for the reference's cv2 + torch DataLoader worker
// processes (reference utils/datasets.py:65-125, load_image :660-680):
// the host-side hot path (decode + resize) runs in C++ threads, handing
// fixed-shape uint8 batches to Python/JAX over a zero-copy C ABI (ctypes).
//
// Output matches rep_yolo_tpu.data.datasets.DetectionDataset.load_item:
// longest side resized to img_size (box-filter for downscale, bilinear for
// upscale), content at the top-left, 114-gray padding, plus the true
// content (h, w) per image.
//
// Build: g++ -O3 -march=native -shared -fPIC loader.cpp -o libryloader.so \
//            -ljpeg -lpng -lpthread

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr uint8_t kPad = 114;

struct Image {
  std::vector<uint8_t> rgb;  // h*w*3
  int h = 0, w = 0;
};

// ---------------------------------------------------------------------------
// decode
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, Image* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
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
  png_set_expand(png);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->rgb.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->rgb.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const std::string& path, Image* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (got >= 8 && magic[0] == 0x89 && magic[1] == 'P') {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok && out->w > 0 && out->h > 0;
}

// ---------------------------------------------------------------------------
// resize + pad
// ---------------------------------------------------------------------------

// Box-filter (area) downscale / bilinear upscale, then top-left placement
// into the img_size x img_size canvas pre-filled with kPad.
void resize_pad(const Image& src, int S, uint8_t* canvas, float* hw) {
  const double r = double(S) / std::max(src.h, src.w);
  const int nh = std::max(1, int(src.h * r));
  const int nw = std::max(1, int(src.w * r));
  hw[0] = float(nh);
  hw[1] = float(nw);

  for (int y = 0; y < nh; ++y) {
    uint8_t* dst_row = canvas + size_t(y) * S * 3;
    if (r < 1.0) {
      // area: average the source box [y0,y1) x [x0,x1)
      const double sy0 = y / r, sy1 = (y + 1) / r;
      const int iy0 = int(sy0), iy1 = std::min(int(sy1 + 0.9999), src.h);
      for (int x = 0; x < nw; ++x) {
        const double sx0 = x / r, sx1 = (x + 1) / r;
        const int ix0 = int(sx0), ix1 = std::min(int(sx1 + 0.9999), src.w);
        int acc[3] = {0, 0, 0};
        int cnt = 0;
        for (int yy = iy0; yy < iy1; ++yy) {
          const uint8_t* p = src.rgb.data() + (size_t(yy) * src.w + ix0) * 3;
          for (int xx = ix0; xx < ix1; ++xx, p += 3) {
            acc[0] += p[0];
            acc[1] += p[1];
            acc[2] += p[2];
            ++cnt;
          }
        }
        if (cnt == 0) cnt = 1;
        dst_row[x * 3 + 0] = uint8_t(acc[0] / cnt);
        dst_row[x * 3 + 1] = uint8_t(acc[1] / cnt);
        dst_row[x * 3 + 2] = uint8_t(acc[2] / cnt);
      }
    } else {
      // bilinear
      const double sy = std::min((y + 0.5) / r - 0.5, double(src.h - 1));
      const int y0 = std::max(0, int(sy));
      const int y1 = std::min(y0 + 1, src.h - 1);
      const double fy = std::max(0.0, sy - y0);
      for (int x = 0; x < nw; ++x) {
        const double sx = std::min((x + 0.5) / r - 0.5, double(src.w - 1));
        const int x0 = std::max(0, int(sx));
        const int x1 = std::min(x0 + 1, src.w - 1);
        const double fx = std::max(0.0, sx - x0);
        for (int c = 0; c < 3; ++c) {
          const double v00 = src.rgb[(size_t(y0) * src.w + x0) * 3 + c];
          const double v01 = src.rgb[(size_t(y0) * src.w + x1) * 3 + c];
          const double v10 = src.rgb[(size_t(y1) * src.w + x0) * 3 + c];
          const double v11 = src.rgb[(size_t(y1) * src.w + x1) * 3 + c];
          dst_row[x * 3 + c] = uint8_t(
              (v00 * (1 - fx) + v01 * fx) * (1 - fy) +
              (v10 * (1 - fx) + v11 * fx) * fy + 0.5);
        }
      }
    }
  }
}

// ---------------------------------------------------------------------------
// batched prefetching loader
// ---------------------------------------------------------------------------

struct Batch {
  std::vector<uint8_t> images;  // batch*S*S*3
  std::vector<float> hw;        // batch*2
  std::vector<int32_t> indices; // batch
  int count = 0;
};

struct Loader {
  std::vector<std::string> paths;
  int img_size, batch, n_threads;
  bool shuffle;
  uint64_t seed;

  std::vector<int> order;
  std::atomic<size_t> next_item{0};
  std::atomic<int> batches_left{0};  // batches the consumer has yet to take

  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::queue<Batch> ready;
  size_t max_queue = 4;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  std::atomic<int> epoch_active{0};

  void worker() {
    while (!stop.load()) {
      // claim a batch worth of indices
      size_t start = next_item.fetch_add(batch);
      if (start >= order.size()) {
        std::this_thread::sleep_for(std::chrono::milliseconds(2));
        continue;
      }
      Batch b;
      const size_t S = img_size;
      size_t n = std::min(size_t(batch), order.size() - start);
      b.images.assign(size_t(batch) * S * S * 3, kPad);
      b.hw.assign(size_t(batch) * 2, 0.f);
      b.indices.assign(batch, -1);
      b.count = int(n);
      for (size_t i = 0; i < n; ++i) {
        int idx = order[start + i];
        b.indices[i] = idx;
        Image img;
        if (!decode_file(paths[idx], &img)) {
          b.hw[i * 2] = b.hw[i * 2 + 1] = 0.f;  // caller treats as skip
          continue;
        }
        resize_pad(img, img_size, b.images.data() + i * S * S * 3,
                   b.hw.data() + i * 2);
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] { return ready.size() < max_queue || stop; });
      if (stop) return;
      ready.push(std::move(b));
      cv_ready.notify_one();
    }
  }

  void drain_and_park() {
    // park workers (any in-flight claim lands beyond every order size)
    next_item.store(~size_t(0) / 2);
    std::unique_lock<std::mutex> lk(mu);
    std::queue<Batch>().swap(ready);
    cv_space.notify_all();
  }

  void start_epoch(int epoch) {
    drain_and_park();
    order.resize(paths.size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = int(i);
    if (shuffle) {
      std::mt19937_64 rng(seed + uint64_t(epoch));
      for (size_t i = order.size(); i > 1; --i) {
        size_t j = rng() % i;
        std::swap(order[i - 1], order[j]);
      }
    }
    batches_left.store(int((order.size() + batch - 1) / batch));
    next_item.store(0);
    cv_space.notify_all();
  }

  // Explicit epoch order (host-computed): the sampling POLICY — shard
  // slicing (reference utils/datasets.py:82 DistributedSampler) and
  // image-weight resampling (reference train.py:324-335) — stays in
  // Python; the C++ side only decodes and prefetches. Indices may
  // repeat (weighted resample draws with replacement).
  void start_epoch_order(const int32_t* idx, int n) {
    drain_and_park();
    order.assign(idx, idx + n);
    batches_left.store(int((size_t(n) + batch - 1) / batch));
    next_item.store(0);
    cv_space.notify_all();
  }

  bool next(uint8_t* images, float* hw, int32_t* indices, int* count) {
    if (batches_left.load() <= 0) return false;  // epoch exhausted
    std::unique_lock<std::mutex> lk(mu);
    if (!cv_ready.wait_for(lk, std::chrono::seconds(120),
                           [&] { return !ready.empty() || stop; }))
      return false;
    if (ready.empty()) return false;
    Batch b = std::move(ready.front());
    ready.pop();
    batches_left.fetch_sub(1);
    cv_space.notify_one();
    lk.unlock();
    const size_t S = img_size;
    memcpy(images, b.images.data(), size_t(batch) * S * S * 3);
    memcpy(hw, b.hw.data(), size_t(batch) * 2 * sizeof(float));
    memcpy(indices, b.indices.data(), size_t(batch) * sizeof(int32_t));
    *count = b.count;
    return true;
  }
};

}  // namespace

extern "C" {

void* ryt_create(const char** paths, int n, int img_size, int batch,
                 int n_threads, uint64_t seed, int shuffle) {
  auto* l = new Loader();
  l->paths.assign(paths, paths + n);
  l->img_size = img_size;
  l->batch = batch;
  l->n_threads = std::max(1, n_threads);
  l->shuffle = shuffle != 0;
  l->seed = seed;
  l->order.resize(0);
  l->next_item.store(~size_t(0) / 2);  // nothing to do until start_epoch
  for (int i = 0; i < l->n_threads; ++i)
    l->workers.emplace_back([l] { l->worker(); });
  return l;
}

void ryt_start_epoch(void* h, int epoch) {
  static_cast<Loader*>(h)->start_epoch(epoch);
}

void ryt_start_epoch_order(void* h, const int32_t* order, int n) {
  static_cast<Loader*>(h)->start_epoch_order(order, n);
}

int ryt_next(void* h, uint8_t* images, float* hw, int32_t* indices,
             int* count) {
  return static_cast<Loader*>(h)->next(images, hw, indices, count) ? 1 : 0;
}

int ryt_num_batches(void* h) {
  auto* l = static_cast<Loader*>(h);
  return int((l->paths.size() + l->batch - 1) / l->batch);
}

void ryt_destroy(void* h) {
  auto* l = static_cast<Loader*>(h);
  l->stop.store(true);
  l->cv_space.notify_all();
  l->cv_ready.notify_all();
  for (auto& t : l->workers) t.join();
  delete l;
}

// single-image decode+resize+pad (for detect-CLI and tests)
int ryt_load_one(const char* path, int img_size, uint8_t* canvas, float* hw,
                 int* orig_h, int* orig_w) {
  Image img;
  if (!decode_file(path, &img)) return 0;
  memset(canvas, kPad, size_t(img_size) * img_size * 3);
  resize_pad(img, img_size, canvas, hw);
  *orig_h = img.h;
  *orig_w = img.w;
  return 1;
}

}  // extern "C"

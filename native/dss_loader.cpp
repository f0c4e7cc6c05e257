// dss_native loader: parallel PNG decoding + asynchronous batch prefetch.
//
// Native runtime counterpart of the reference's DataLoader workers (the only
// multi-process aspect of yifita/DSS, SURVEY.md §3.1): a std::thread pool
// decodes the dataset's per-view pngs in parallel at startup, and a
// double-buffered prefetcher assembles index-selected view batches
// (images + masks) concurrently with device compute.
//
// Exposed through a plain C ABI for ctypes (no pybind11 in this image).
// Build: g++ -O3 -shared -fPIC dss_loader.cpp -o libdss_loader.so -lpng -lz -pthread
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Thread pool
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

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

// ---------------------------------------------------------------------------
// PNG decode (libpng) to float32 in [0, 1], fixed channel count
// ---------------------------------------------------------------------------
bool decode_png_f32(const char* path, float* out, int want_h, int want_w,
                    int want_c) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (want_c >= 3 &&
      (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA))
    png_set_gray_to_rgb(png);
  if (want_c == 1 &&
      (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
       color == PNG_COLOR_TYPE_PALETTE))
    png_set_rgb_to_gray(png, 1, -1.0, -1.0);
  png_read_update_info(png, info);

  if ((int)h != want_h || (int)w != want_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }

  int rowbytes = png_get_rowbytes(png, info);
  int in_c = rowbytes / (int)w;
  std::vector<uint8_t> row(rowbytes);
  const float inv = 1.0f / 255.0f;
  for (png_uint_32 y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out + (size_t)y * w * want_c;
    for (png_uint_32 x = 0; x < w; ++x) {
      for (int c = 0; c < want_c; ++c) {
        int src_c = c < in_c ? c : in_c - 1;
        dst[x * want_c + c] = row[x * in_c + src_c] * inv;
      }
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

struct Prefetcher {
  const float* images;  // (V, H, W, 3)
  const float* masks;   // (V, H, W)
  int64_t v, h, w;
  int batch;
  ThreadPool* pool;

  std::vector<float> img_buf[2];
  std::vector<float> mask_buf[2];
  int slot = 0;
  std::atomic<int> pending{0};
  std::mutex mu;
  std::condition_variable cv;
};

}  // namespace

extern "C" {

void* dss_pool_create(int n_threads) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  return new ThreadPool(n_threads);
}

void dss_pool_destroy(void* p) { delete static_cast<ThreadPool*>(p); }

// Decode one PNG into out (want_h*want_w*want_c float32). Returns 0 on ok.
int dss_decode_png_f32(const char* path, float* out, int want_h, int want_w,
                       int want_c) {
  return decode_png_f32(path, out, want_h, want_w, want_c) ? 0 : 1;
}

// Parallel decode of n PNGs into out (n, h, w, c). Returns #failures.
int dss_load_images_f32(void* pool_ptr, const char** paths, int n, float* out,
                        int h, int w, int c) {
  auto* pool = static_cast<ThreadPool*>(pool_ptr);
  std::atomic<int> failures{0};
  // done is guarded by mu: incrementing it outside the lock lets the waiter
  // see done == n and destroy mu/cv while the final worker is still locking
  // them (use-after-free at teardown).
  int done = 0;
  std::mutex mu;
  std::condition_variable cv;
  for (int i = 0; i < n; ++i) {
    const char* path = paths[i];
    float* dst = out + (size_t)i * h * w * c;
    pool->submit([&, path, dst] {
      if (!decode_png_f32(path, dst, h, w, c)) failures++;
      {
        std::lock_guard<std::mutex> lk(mu);
        if (++done == n) cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done == n; });
  return failures.load();
}

// ---------------------------------------------------------------------------
// Async double-buffered batch prefetch over in-memory datasets
// ---------------------------------------------------------------------------

void* dss_prefetch_create(void* pool_ptr, const float* images,
                          const float* masks, int64_t v, int64_t h, int64_t w,
                          int batch) {
  auto* pf = new Prefetcher;
  pf->pool = static_cast<ThreadPool*>(pool_ptr);
  pf->images = images;
  pf->masks = masks;
  pf->v = v;
  pf->h = h;
  pf->w = w;
  pf->batch = batch;
  for (int s = 0; s < 2; ++s) {
    pf->img_buf[s].resize((size_t)batch * h * w * 3);
    pf->mask_buf[s].resize((size_t)batch * h * w);
  }
  return pf;
}

void dss_prefetch_destroy(void* p) { delete static_cast<Prefetcher*>(p); }

// Start assembling the batch for `idx` (batch view ids) in the background.
int dss_prefetch_submit(void* p, const int64_t* idx_in, int n) {
  auto* pf = static_cast<Prefetcher*>(p);
  if (n != pf->batch || pf->pending.load() != 0) return 1;
  std::vector<int64_t> idx(idx_in, idx_in + n);
  pf->pending = 1;
  int s = pf->slot;
  pf->pool->submit([pf, idx, s] {
    const size_t img_px = (size_t)pf->h * pf->w * 3;
    const size_t msk_px = (size_t)pf->h * pf->w;
    for (int i = 0; i < (int)idx.size(); ++i) {
      int64_t v = idx[i] % pf->v;
      memcpy(pf->img_buf[s].data() + i * img_px, pf->images + v * img_px,
             img_px * sizeof(float));
      memcpy(pf->mask_buf[s].data() + i * msk_px, pf->masks + v * msk_px,
             msk_px * sizeof(float));
    }
    {
      std::lock_guard<std::mutex> lk(pf->mu);
      pf->pending = 0;
    }
    pf->cv.notify_one();
  });
  return 0;
}

// Block until the submitted batch is ready; copy into caller buffers.
int dss_prefetch_get(void* p, float* img_out, float* mask_out) {
  auto* pf = static_cast<Prefetcher*>(p);
  {
    std::unique_lock<std::mutex> lk(pf->mu);
    pf->cv.wait(lk, [pf] { return pf->pending.load() == 0; });
  }
  int s = pf->slot;
  memcpy(img_out, pf->img_buf[s].data(), pf->img_buf[s].size() * sizeof(float));
  memcpy(mask_out, pf->mask_buf[s].data(),
         pf->mask_buf[s].size() * sizeof(float));
  pf->slot ^= 1;
  return 0;
}

}  // extern "C"

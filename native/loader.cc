// Native multi-sweep point-cloud loader.
//
// TPU-native replacement for the reference's CPU dataloader hot loop
// (mmdet3d/datasets/pipelines/loading.py LoadPointsFromMultiSweeps +
// worker subprocess pool): a C++ thread pool reads the keyframe + N sweep
// .bin files, applies the per-sweep sensor->lidar rigid transform and
// timestamp channel, range-filters, and writes directly into the caller's
// fixed-capacity (points, mask) buffers — zero Python in the per-sweep
// loop, one allocation-free pass per sample.
//
// Exposed via a minimal C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct ThreadPool {
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lock(mu_);
            cv_.wait(lock, [this] { return stop_ || !jobs_.empty(); });
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
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void Submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lock(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

ThreadPool* g_pool = nullptr;
std::mutex g_pool_mu;

ThreadPool* Pool(int n) {
  std::lock_guard<std::mutex> lock(g_pool_mu);
  if (!g_pool) g_pool = new ThreadPool(n > 0 ? n : 4);
  return g_pool;
}

// Read one .bin file of float32 rows [load_dim]; returns rows read.
int64_t ReadBin(const char* path, std::vector<float>* out, int load_dim) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  int64_t bytes = ftell(f);
  fseek(f, 0, SEEK_SET);
  int64_t n = bytes / (sizeof(float) * load_dim);
  out->resize(static_cast<size_t>(n) * load_dim);
  size_t got = fread(out->data(), sizeof(float) * load_dim, n, f);
  fclose(f);
  return static_cast<int64_t>(got);
}

struct SweepResult {
  std::vector<float> points;  // [n, out_dim] rows
  int64_t n = 0;
};

}  // namespace

extern "C" {

// Load keyframe + sweeps into a fixed-capacity buffer.
//
// paths:        (num_sweeps+1) null-terminated strings, keyframe first.
// transforms:   (num_sweeps+1) row-major 3x4 [R|t] sensor->lidar (identity
//               for the keyframe).
// time_deltas:  per-file timestamp channel value.
// load_dim:     columns in each .bin (nuScenes: 5).
// out_dim:      output columns (xyz + extra dims + timestamp slot at index
//               out_dim-1).
// range:        [x0, y0, z0, x1, y1, z1] keep-filter; pass nulls to skip.
// remove_close: drop sweep points with BEV radius < 1m (reference
//               _remove_close).
// out_points:   [capacity, out_dim] float32, zero-padded.
// out_mask:     [capacity] uint8.
// Returns number of valid rows written, or -1 on error.
int64_t msmd_load_sweeps(const char** paths, const float* transforms,
                         const float* time_deltas, int num_files,
                         int load_dim, int out_dim, const float* range,
                         int remove_close, float* out_points,
                         uint8_t* out_mask, int64_t capacity,
                         int num_threads) {
  std::vector<SweepResult> results(num_files);
  std::atomic<int> done{0};
  std::mutex done_mu;
  std::condition_variable done_cv;

  ThreadPool* pool = Pool(num_threads);
  for (int i = 0; i < num_files; ++i) {
    pool->Submit([&, i] {
      std::vector<float> raw;
      int64_t n = ReadBin(paths[i], &raw, load_dim);
      if (n > 0) {
        const float* T = transforms + static_cast<int64_t>(i) * 12;
        SweepResult& r = results[i];
        r.points.reserve(static_cast<size_t>(n) * out_dim);
        for (int64_t p = 0; p < n; ++p) {
          const float* row = raw.data() + p * load_dim;
          float x = row[0], y = row[1], z = row[2];
          if (i > 0 && remove_close && (x * x + y * y) < 1.0f) continue;
          float tx = T[0] * x + T[1] * y + T[2] * z + T[3];
          float ty = T[4] * x + T[5] * y + T[6] * z + T[7];
          float tz = T[8] * x + T[9] * y + T[10] * z + T[11];
          if (range && (tx < range[0] || ty < range[1] || tz < range[2] ||
                        tx > range[3] || ty > range[4] || tz > range[5]))
            continue;
          r.points.push_back(tx);
          r.points.push_back(ty);
          r.points.push_back(tz);
          for (int c = 3; c < out_dim - 1; ++c)
            r.points.push_back(c < load_dim ? row[c] : 0.0f);
          r.points.push_back(time_deltas[i]);
          ++r.n;
        }
      }
      if (done.fetch_add(1) + 1 == num_files) {
        std::lock_guard<std::mutex> lock(done_mu);
        done_cv.notify_one();
      }
    });
  }
  {
    std::unique_lock<std::mutex> lock(done_mu);
    done_cv.wait(lock, [&] { return done.load() == num_files; });
  }

  int64_t written = 0;
  for (int i = 0; i < num_files && written < capacity; ++i) {
    int64_t take = results[i].n;
    if (written + take > capacity) take = capacity - written;
    std::memcpy(out_points + written * out_dim, results[i].points.data(),
                static_cast<size_t>(take) * out_dim * sizeof(float));
    written += take;
  }
  std::memset(out_points + written * out_dim, 0,
              static_cast<size_t>(capacity - written) * out_dim *
                  sizeof(float));
  std::memset(out_mask, 1, written);
  std::memset(out_mask + written, 0, capacity - written);
  return written;
}

// Load a raw .bin into a fixed buffer (single file path).
int64_t msmd_load_bin(const char* path, int load_dim, float* out,
                      int64_t capacity) {
  std::vector<float> raw;
  int64_t n = ReadBin(path, &raw, load_dim);
  if (n < 0) return -1;
  if (n > capacity) n = capacity;
  std::memcpy(out, raw.data(),
              static_cast<size_t>(n) * load_dim * sizeof(float));
  return n;
}

}  // extern "C"

// Prefetching dataset loader: worker threads decode frames ahead of the
// consumer so the SLAM host loop never waits on disk or PNG inflate.
//
// Native-runtime replacement for the reference's synchronous per-frame
// cv::imread in the example mains (mono_tum.cc:75-86): the reference pays
// decode latency on the tracking thread every frame; here a bounded
// ordered queue keeps N frames ready.
//
// Exposed through a C API (loader_api) consumed from Python via ctypes.

#include <atomic>
#include <condition_variable>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "image_decode.h"

namespace myslam {

class PrefetchLoader {
 public:
  PrefetchLoader(std::vector<std::string> paths, int n_workers, int ahead)
      : paths_(std::move(paths)),
        ahead_(ahead < 1 ? 1 : ahead),
        next_to_schedule_(0),
        next_to_emit_(0),
        stop_(false) {
    if (n_workers < 1) n_workers = 1;
    for (int i = 0; i < n_workers; ++i) {
      workers_.emplace_back([this] { WorkerLoop(); });
    }
  }

  ~PrefetchLoader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_work_.notify_all();
    cv_done_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Blocking: next frame in order. Returns false at end of sequence or on
  // decode failure of that frame (failed frames yield empty images).
  bool Next(DecodedImage* out, int* index) {
    std::unique_lock<std::mutex> lk(mu_);
    if (next_to_emit_ >= int64_t(paths_.size())) return false;
    int64_t want = next_to_emit_;
    cv_work_.notify_all();
    cv_done_.wait(lk, [&] { return stop_ || done_.count(want); });
    if (stop_) return false;
    *out = std::move(done_[want]);
    done_.erase(want);
    *index = int(want);
    ++next_to_emit_;
    cv_work_.notify_all();  // window advanced, schedule more
    return true;
  }

  int64_t size() const { return int64_t(paths_.size()); }

 private:
  void WorkerLoop() {
    for (;;) {
      int64_t idx;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_work_.wait(lk, [&] {
          return stop_ ||
                 (next_to_schedule_ < int64_t(paths_.size()) &&
                  next_to_schedule_ < next_to_emit_ + ahead_);
        });
        if (stop_) return;
        idx = next_to_schedule_++;
      }
      DecodedImage img;
      decode_image_file(paths_[idx], &img);  // failure -> empty image
      {
        std::lock_guard<std::mutex> lk(mu_);
        done_[idx] = std::move(img);
      }
      cv_done_.notify_all();
    }
  }

  std::vector<std::string> paths_;
  int ahead_;
  int64_t next_to_schedule_;
  int64_t next_to_emit_;
  bool stop_;
  std::mutex mu_;
  std::condition_variable cv_work_, cv_done_;
  std::map<int64_t, DecodedImage> done_;
  std::vector<std::thread> workers_;
};

}  // namespace myslam

// ---------------------------------------------------------------------------
// C API (ctypes surface)
// ---------------------------------------------------------------------------

extern "C" {

// Per-thread staging slot between _next (metadata) and _copy (pixels).
static thread_local myslam::DecodedImage* staged_image = nullptr;

void* myslam_loader_open(const char** paths, int n_paths, int n_workers,
                         int ahead) {
  std::vector<std::string> v(paths, paths + n_paths);
  return new myslam::PrefetchLoader(std::move(v), n_workers, ahead);
}

// Returns 1 and fills (*w, *h) if a frame is available; caller then calls
// myslam_loader_copy to fetch pixels. Returns 0 at end.
int myslam_loader_next(void* handle, int* index, int* w, int* h) {
  auto* l = static_cast<myslam::PrefetchLoader*>(handle);
  auto* staged = new myslam::DecodedImage();
  int idx;
  if (!l->Next(staged, &idx)) {
    delete staged;
    return 0;
  }
  *index = idx;
  *w = staged->width;
  *h = staged->height;
  // stash for the copy call (single-consumer API)
  staged_image = staged;
  return 1;
}

int myslam_loader_copy(void* handle, float* dst, long capacity) {
  (void)handle;
  if (!staged_image) return 0;
  long n = long(staged_image->gray.size());
  if (n > capacity) n = capacity;
  std::memcpy(dst, staged_image->gray.data(), size_t(n) * sizeof(float));
  delete staged_image;
  staged_image = nullptr;
  return int(n);
}

void myslam_loader_close(void* handle) {
  delete static_cast<myslam::PrefetchLoader*>(handle);
}

long myslam_loader_size(void* handle) {
  return long(static_cast<myslam::PrefetchLoader*>(handle)->size());
}

int myslam_decode_file(const char* path, float* dst, long capacity, int* w,
                       int* h) {
  myslam::DecodedImage img;
  if (!myslam::decode_image_file(path, &img)) return 0;
  *w = img.width;
  *h = img.height;
  long n = long(img.gray.size());
  if (n > capacity) return 0;
  std::memcpy(dst, img.gray.data(), size_t(n) * sizeof(float));
  return 1;
}

}  // extern "C"

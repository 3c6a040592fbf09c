// Native feature-batch loader for fast_dit_tpu.
//
// The training fast path streams millions of small `.npy` latent-feature
// files (reference fast-DiT's CustomDataset, train.py:97-116, served there
// by torch DataLoader worker *processes*). This is the TPU-native runtime
// equivalent: a C++ thread pool parses npy headers and assembles batches
// into caller-provided buffers, with a bounded in-order prefetch queue —
// no Python in the hot path, no GIL, no pickling across processes.
//
// Exposed as a minimal C ABI consumed via ctypes
// (fast_dit_tpu/data/native_loader.py).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct NpyArray {
  std::vector<int64_t> shape;
  std::string dtype;  // "<f4", "<i8", ...
  std::vector<char> data;
};

// Minimal .npy (v1/v2) reader: little-endian, C-contiguous only.
bool read_npy(const std::string& path, NpyArray* out, std::string* err) {
  std::ifstream f(path, std::ios::binary);
  if (!f) { *err = "cannot open " + path; return false; }
  char magic[6];
  f.read(magic, 6);
  if (std::memcmp(magic, "\x93NUMPY", 6) != 0) { *err = "bad magic: " + path; return false; }
  unsigned char ver[2];
  f.read(reinterpret_cast<char*>(ver), 2);
  uint32_t hlen = 0;
  if (ver[0] == 1) {
    uint16_t h16; f.read(reinterpret_cast<char*>(&h16), 2); hlen = h16;
  } else {
    f.read(reinterpret_cast<char*>(&hlen), 4);
  }
  std::string header(hlen, '\0');
  f.read(&header[0], hlen);

  auto find_val = [&](const std::string& key) -> std::string {
    auto p = header.find(key);
    if (p == std::string::npos) return "";
    p = header.find(':', p);
    return header.substr(p + 1);
  };
  std::string descr = find_val("'descr'");
  auto q0 = descr.find('\'');
  auto q1 = descr.find('\'', q0 + 1);
  out->dtype = descr.substr(q0 + 1, q1 - q0 - 1);
  if (find_val("'fortran_order'").find("True") != std::string::npos) {
    *err = "fortran order unsupported: " + path;
    return false;
  }
  std::string shp = find_val("'shape'");
  auto l = shp.find('(');
  auto r = shp.find(')');
  out->shape.clear();
  std::string inner = shp.substr(l + 1, r - l - 1);
  size_t pos = 0;
  while (pos < inner.size()) {
    while (pos < inner.size() && !isdigit(inner[pos])) pos++;
    if (pos >= inner.size()) break;
    size_t end = pos;
    while (end < inner.size() && isdigit(inner[end])) end++;
    out->shape.push_back(std::stoll(inner.substr(pos, end - pos)));
    pos = end;
  }
  int64_t count = 1;
  for (auto s : out->shape) count *= s;
  int itemsize = std::stoi(out->dtype.substr(2));
  out->data.resize(count * itemsize);
  f.read(out->data.data(), out->data.size());
  if (!f) { *err = "truncated: " + path; return false; }
  return true;
}

struct Batch {
  std::vector<float> x;
  std::vector<int32_t> y;
};

struct Loader {
  std::vector<std::string> feature_paths;
  std::vector<std::string> label_paths;
  std::vector<int64_t> order;     // sample indices to stream, in order
  int batch_size = 0;
  int64_t sample_elems = 0;       // floats per feature sample
  std::vector<int64_t> sample_shape;

  int prefetch = 4;
  std::vector<std::thread> workers;
  std::atomic<int64_t> next_batch{0};
  int64_t num_batches = 0;

  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::map<int64_t, Batch> ready;  // batch index -> data
  int64_t consumed = 0;
  bool stop = false;
  std::string error;

  ~Loader() { shutdown(); }

  void shutdown() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_ready.notify_all();
    cv_space.notify_all();
    for (auto& t : workers) if (t.joinable()) t.join();
    workers.clear();
  }

  bool load_sample(int64_t idx, float* x_out, int32_t* y_out, std::string* err) {
    NpyArray fx, fy;
    if (!read_npy(feature_paths[idx], &fx, err)) return false;
    if (!read_npy(label_paths[idx], &fy, err)) return false;
    int64_t n = 1;
    for (auto s : fx.shape) n *= s;
    if (n != sample_elems) { *err = "feature size mismatch at " + feature_paths[idx]; return false; }
    if (fx.dtype == "<f4") {
      std::memcpy(x_out, fx.data.data(), n * sizeof(float));
    } else if (fx.dtype == "<f8") {
      const double* src = reinterpret_cast<const double*>(fx.data.data());
      for (int64_t i = 0; i < n; i++) x_out[i] = static_cast<float>(src[i]);
    } else {
      *err = "unsupported feature dtype " + fx.dtype;
      return false;
    }
    if (fy.dtype == "<i8") {
      *y_out = static_cast<int32_t>(*reinterpret_cast<const int64_t*>(fy.data.data()));
    } else if (fy.dtype == "<i4") {
      *y_out = *reinterpret_cast<const int32_t*>(fy.data.data());
    } else if (fy.dtype == "<f4") {
      *y_out = static_cast<int32_t>(*reinterpret_cast<const float*>(fy.data.data()));
    } else {
      *err = "unsupported label dtype " + fy.dtype;
      return false;
    }
    return true;
  }

  void worker() {
    while (true) {
      int64_t b = next_batch.fetch_add(1);
      if (b >= num_batches) return;
      Batch batch;
      batch.x.resize(batch_size * sample_elems);
      batch.y.resize(batch_size);
      std::string err;
      for (int i = 0; i < batch_size; i++) {
        int64_t idx = order[b * batch_size + i];
        if (!load_sample(idx, batch.x.data() + i * sample_elems,
                         &batch.y[i], &err)) {
          std::lock_guard<std::mutex> lk(mu);
          if (error.empty()) error = err;
          cv_ready.notify_all();
          return;
        }
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] {
        return stop || static_cast<int64_t>(ready.size()) < prefetch ||
               b == consumed;  // never block the batch the consumer waits on
      });
      if (stop) return;
      ready.emplace(b, std::move(batch));
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* dl_create(const char** feature_paths, const char** label_paths,
                int64_t n_files, const int64_t* order, int64_t order_len,
                int batch_size, int prefetch, int num_threads,
                char* err_out, int err_cap) {
  auto ld = std::make_unique<Loader>();
  ld->feature_paths.assign(feature_paths, feature_paths + n_files);
  ld->label_paths.assign(label_paths, label_paths + n_files);
  ld->order.assign(order, order + order_len);
  ld->batch_size = batch_size;
  ld->prefetch = prefetch < 1 ? 1 : prefetch;
  ld->num_batches = order_len / batch_size;

  NpyArray first;
  std::string err;
  if (n_files == 0 || !read_npy(ld->feature_paths[0], &first, &err)) {
    std::snprintf(err_out, err_cap, "%s", err.empty() ? "no files" : err.c_str());
    return nullptr;
  }
  int64_t n = 1;
  for (auto s : first.shape) n *= s;
  ld->sample_elems = n;
  ld->sample_shape = first.shape;

  int threads = num_threads < 1 ? 1 : num_threads;
  for (int i = 0; i < threads; i++) {
    ld->workers.emplace_back(&Loader::worker, ld.get());
  }
  return ld.release();
}

int dl_sample_shape(void* handle, int64_t* shape_out, int cap) {
  auto* ld = static_cast<Loader*>(handle);
  int n = static_cast<int>(ld->sample_shape.size());
  for (int i = 0; i < n && i < cap; i++) shape_out[i] = ld->sample_shape[i];
  return n;
}

int64_t dl_num_batches(void* handle) {
  return static_cast<Loader*>(handle)->num_batches;
}

// Copy the next in-order batch into caller buffers.
// Returns 1 on success, 0 at end of stream, -1 on error.
int dl_next(void* handle, float* x_out, int32_t* y_out,
            char* err_out, int err_cap) {
  auto* ld = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(ld->mu);
  if (ld->consumed >= ld->num_batches) return 0;
  int64_t want = ld->consumed;
  ld->cv_ready.wait(lk, [&] {
    return ld->stop || !ld->error.empty() || ld->ready.count(want) > 0;
  });
  if (!ld->error.empty()) {
    std::snprintf(err_out, err_cap, "%s", ld->error.c_str());
    return -1;
  }
  if (ld->stop) return 0;
  Batch batch = std::move(ld->ready.at(want));
  ld->ready.erase(want);
  ld->consumed++;
  lk.unlock();
  ld->cv_space.notify_all();
  std::memcpy(x_out, batch.x.data(), batch.x.size() * sizeof(float));
  std::memcpy(y_out, batch.y.data(), batch.y.size() * sizeof(int32_t));
  return 1;
}

void dl_destroy(void* handle) {
  delete static_cast<Loader*>(handle);
}

}  // extern "C"

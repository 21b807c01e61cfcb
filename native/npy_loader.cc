// Native data loader: mmap-backed .npy cube files with multithreaded
// row gather and asynchronous batch prefetch.
//
// Role in the framework: the reference's host data path (np.load of the
// full (1000, 32, 32, 32, 19) array + np.random.choice fancy-index copies
// per training step, reference utils.py:559-621) becomes:
//   * mmap the file once (no 2.5 GB RAM copy, the page cache does the work),
//   * gather minibatch sample rows with parallel memcpy,
//   * prefetch the NEXT batch on a background thread while the device
//     computes the current step.
//
// C API (ctypes-friendly), see nbody_tpu/data/native_loader.py:
//   NpyLoader* npy_open(const char* path);
//   int   npy_ndim(NpyLoader*);
//   void  npy_shape(NpyLoader*, int64_t* out);
//   int   npy_gather(NpyLoader*, const int64_t* idx, int64_t n,
//                    float* out, int nthreads);
//   int   npy_prefetch(NpyLoader*, const int64_t* idx, int64_t n,
//                      float* out, int nthreads);
//   int   npy_prefetch_wait(NpyLoader*);
//   void  npy_close(NpyLoader*);
//   const char* npy_last_error();
// All int-returning calls: 0 = ok, nonzero = error (message via
// npy_last_error).  Only little-endian float32, C-order arrays are
// supported — the cube schema's format.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

thread_local std::string g_error;

void set_error(const std::string& msg) { g_error = msg; }

struct NpyLoader {
  int fd = -1;
  void* map = nullptr;
  size_t file_size = 0;
  const float* data = nullptr;       // first element past the header
  std::vector<int64_t> shape;
  int64_t row_elems = 0;             // product of shape[1:]

  std::thread prefetch_thread;
  std::atomic<bool> prefetch_active{false};

  ~NpyLoader() {
    if (prefetch_thread.joinable()) prefetch_thread.join();
    if (map && map != MAP_FAILED) munmap(map, file_size);
    if (fd >= 0) close(fd);
  }
};

bool parse_header(const char* buf, size_t size, NpyLoader* ld,
                  size_t* data_offset) {
  if (size < 10 || std::memcmp(buf, "\x93NUMPY", 6) != 0) {
    set_error("not a .npy file (bad magic)");
    return false;
  }
  const unsigned char major = buf[6];
  size_t header_len, header_start;
  if (major == 1) {
    header_len = static_cast<unsigned char>(buf[8]) |
                 (static_cast<unsigned char>(buf[9]) << 8);
    header_start = 10;
  } else if (major == 2 || major == 3) {
    if (size < 12) { set_error("truncated header"); return false; }
    uint32_t len;
    std::memcpy(&len, buf + 8, 4);
    header_len = len;
    header_start = 12;
  } else {
    set_error("unsupported .npy version");
    return false;
  }
  if (header_start + header_len > size) {
    set_error("truncated header");
    return false;
  }
  std::string header(buf + header_start, header_len);

  if (header.find("'<f4'") == std::string::npos &&
      header.find("\"<f4\"") == std::string::npos) {
    set_error("only little-endian float32 ('<f4') arrays are supported");
    return false;
  }
  if (header.find("'fortran_order': False") == std::string::npos) {
    set_error("only C-order arrays are supported");
    return false;
  }
  size_t sp = header.find("'shape':");
  if (sp == std::string::npos) { set_error("no shape in header"); return false; }
  size_t open = header.find('(', sp), close = header.find(')', sp);
  if (open == std::string::npos || close == std::string::npos) {
    set_error("malformed shape");
    return false;
  }
  std::string dims = header.substr(open + 1, close - open - 1);
  int64_t v = 0;
  bool in_num = false;
  for (char c : dims) {
    if (c >= '0' && c <= '9') { v = v * 10 + (c - '0'); in_num = true; }
    else if (in_num) { ld->shape.push_back(v); v = 0; in_num = false; }
  }
  if (in_num) ld->shape.push_back(v);
  if (ld->shape.empty()) { set_error("scalar .npy not supported"); return false; }

  ld->row_elems = 1;
  for (size_t i = 1; i < ld->shape.size(); ++i) ld->row_elems *= ld->shape[i];
  *data_offset = header_start + header_len;
  return true;
}

void gather_rows(const NpyLoader* ld, const int64_t* idx, int64_t n,
                 float* out, int nthreads) {
  const size_t row_bytes = static_cast<size_t>(ld->row_elems) * sizeof(float);
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const float* src = ld->data + idx[i] * ld->row_elems;
      std::memcpy(out + i * ld->row_elems, src, row_bytes);
    }
  };
  if (nthreads <= 1 || n < 2) {
    work(0, n);
    return;
  }
  const int t = static_cast<int>(std::min<int64_t>(nthreads, n));
  std::vector<std::thread> threads;
  threads.reserve(t);
  const int64_t per = (n + t - 1) / t;
  for (int i = 0; i < t; ++i) {
    int64_t lo = i * per, hi = std::min<int64_t>(n, lo + per);
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
}

bool check_indices(const NpyLoader* ld, const int64_t* idx, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    if (idx[i] < 0 || idx[i] >= ld->shape[0]) {
      set_error("index " + std::to_string(idx[i]) + " out of range [0, " +
                std::to_string(ld->shape[0]) + ")");
      return false;
    }
  }
  return true;
}

}  // namespace

extern "C" {

const char* npy_last_error() { return g_error.c_str(); }

NpyLoader* npy_open(const char* path) {
  auto ld = new NpyLoader();
  ld->fd = open(path, O_RDONLY);
  if (ld->fd < 0) {
    set_error(std::string("cannot open ") + path);
    delete ld;
    return nullptr;
  }
  struct stat st;
  if (fstat(ld->fd, &st) != 0) {
    set_error("fstat failed");
    delete ld;
    return nullptr;
  }
  ld->file_size = static_cast<size_t>(st.st_size);
  ld->map = mmap(nullptr, ld->file_size, PROT_READ, MAP_PRIVATE, ld->fd, 0);
  if (ld->map == MAP_FAILED) {
    set_error("mmap failed");
    delete ld;
    return nullptr;
  }
  madvise(ld->map, ld->file_size, MADV_WILLNEED);
  size_t offset = 0;
  if (!parse_header(static_cast<const char*>(ld->map), ld->file_size, ld,
                    &offset)) {
    delete ld;
    return nullptr;
  }
  ld->data = reinterpret_cast<const float*>(
      static_cast<const char*>(ld->map) + offset);
  return ld;
}

int npy_ndim(NpyLoader* ld) { return static_cast<int>(ld->shape.size()); }

void npy_shape(NpyLoader* ld, int64_t* out) {
  for (size_t i = 0; i < ld->shape.size(); ++i) out[i] = ld->shape[i];
}

int npy_gather(NpyLoader* ld, const int64_t* idx, int64_t n, float* out,
               int nthreads) {
  if (!check_indices(ld, idx, n)) return 1;
  gather_rows(ld, idx, n, out, nthreads);
  return 0;
}

int npy_prefetch(NpyLoader* ld, const int64_t* idx, int64_t n, float* out,
                 int nthreads) {
  if (ld->prefetch_active.load()) {
    set_error("a prefetch is already in flight; call npy_prefetch_wait first");
    return 1;
  }
  if (!check_indices(ld, idx, n)) return 1;
  std::vector<int64_t> indices(idx, idx + n);
  ld->prefetch_active.store(true);
  ld->prefetch_thread = std::thread(
      [ld, indices = std::move(indices), out, nthreads]() {
        gather_rows(ld, indices.data(), indices.size(), out, nthreads);
      });
  return 0;
}

int npy_prefetch_wait(NpyLoader* ld) {
  if (!ld->prefetch_active.load()) {
    set_error("no prefetch in flight");
    return 1;
  }
  ld->prefetch_thread.join();
  ld->prefetch_active.store(false);
  return 0;
}

void npy_close(NpyLoader* ld) { delete ld; }

}  // extern "C"

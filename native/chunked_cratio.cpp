// Native runtime for exaspim_tpu: chunked blosc compression-ratio metric.
//
// The product metric of the pipeline is a Zarr-style chunked compression
// ratio (reference img_util.py:401-441 computes it with a per-chunk Python
// loop around numcodecs). Here the chunk walk, the gather of possibly
// ragged edge chunks, and the blosc_compress_ctx calls all run in C++
// across a thread pool, so whole-volume ratio measurement keeps up with
// TPU-side inference instead of serializing on the Python interpreter.
//
// Exposed via ctypes (exaspim_tpu/compression/native.py). Built against
// the system libblosc (same library numcodecs wraps), so ratios are
// bit-identical to the reference metric.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {
// Prototypes for libblosc.so.1 (blosc.h is not installed in this image).
int blosc_compress_ctx(int clevel, int doshuffle, size_t typesize,
                       size_t nbytes, const void* src, void* dest,
                       size_t destsize, const char* compressor,
                       size_t blocksize, int numinternalthreads);
}

namespace {

constexpr size_t kMaxOverhead = 16;  // BLOSC_MAX_OVERHEAD

struct ChunkJob {
  int64_t z, y, x;  // chunk start
};

}  // namespace

extern "C" double exaspim_chunked_cratio(
    const uint16_t* img, int64_t sz, int64_t sy, int64_t sx, int64_t cz,
    int64_t cy, int64_t cx, const char* cname, int clevel, int shuffle,
    int n_threads) {
  if (!img || sz <= 0 || sy <= 0 || sx <= 0 || cz <= 0 || cy <= 0 || cx <= 0)
    return -1.0;

  std::vector<ChunkJob> jobs;
  for (int64_t z = 0; z < sz; z += cz)
    for (int64_t y = 0; y < sy; y += cy)
      for (int64_t x = 0; x < sx; x += cx) jobs.push_back({z, y, x});

  unsigned hw = std::thread::hardware_concurrency();
  size_t workers = n_threads > 0 ? static_cast<size_t>(n_threads)
                                 : (hw ? hw : 4);
  if (workers > jobs.size()) workers = jobs.size();

  std::atomic<size_t> next{0};
  std::atomic<int64_t> total_c{0}, total_u{0};
  std::atomic<bool> failed{false};
  std::string compressor(cname ? cname : "zstd");

  auto worker = [&]() {
    // Per-thread scratch sized for a full chunk; edge chunks are smaller.
    const size_t max_elems = static_cast<size_t>(cz) * cy * cx;
    std::vector<uint16_t> chunk(max_elems);
    std::vector<uint8_t> dest(max_elems * sizeof(uint16_t) + kMaxOverhead);
    for (;;) {
      size_t i = next.fetch_add(1);
      if (i >= jobs.size() || failed.load()) return;
      const ChunkJob& j = jobs[i];
      const int64_t nz = std::min(cz, sz - j.z);
      const int64_t ny = std::min(cy, sy - j.y);
      const int64_t nx = std::min(cx, sx - j.x);
      // Gather the (possibly ragged) chunk into contiguous scratch, matching
      // the reference's np.ascontiguousarray copy before codec.encode.
      uint16_t* dst = chunk.data();
      for (int64_t z = 0; z < nz; ++z) {
        const uint16_t* zplane = img + (j.z + z) * sy * sx;
        for (int64_t y = 0; y < ny; ++y) {
          std::memcpy(dst, zplane + (j.y + y) * sx + j.x,
                      static_cast<size_t>(nx) * sizeof(uint16_t));
          dst += nx;
        }
      }
      const size_t nbytes =
          static_cast<size_t>(nz) * ny * nx * sizeof(uint16_t);
      int csize = blosc_compress_ctx(
          clevel, shuffle, sizeof(uint16_t), nbytes, chunk.data(),
          dest.data(), nbytes + kMaxOverhead, compressor.c_str(),
          /*blocksize=*/0, /*numinternalthreads=*/1);
      if (csize <= 0) {
        failed.store(true);
        return;
      }
      total_c.fetch_add(csize);
      total_u.fetch_add(static_cast<int64_t>(nbytes));
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (size_t t = 0; t < workers; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();

  if (failed.load() || total_c.load() == 0) return -2.0;
  return static_cast<double>(total_u.load()) /
         static_cast<double>(total_c.load());
}

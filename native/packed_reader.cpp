// Native packed-dataset reader: mmap'd LITPKDS chunk files, shuffled block
// sampling, and a background prefetch thread producing ready [B, block]
// int32 batches.
//
// This is the TPU-native answer to the role torch's C++ DataLoader workers
// play for the reference (lit_gpt/packed_dataset.py runs inside
// torch.utils.data workers): host-side batch assembly runs off the Python
// thread so the training loop's host time goes to dispatching XLA programs,
// not memcpy. Exposed as a C ABI for ctypes (no pybind11 dependency).
//
// File format (packed_dataset.py:24-25,83-97): "LITPKDS" magic, u64 version
// (=1), u8 dtype code, u64 chunk_size, then chunk_size tokens.
//
// Build: make -C native   (produces libpacked_reader.so)

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[] = "LITPKDS";
constexpr size_t kHeaderSize = 24;

// dtype codes (packed_dataset.py:14)
enum DtypeCode : uint8_t {
  kU8 = 1, kI8 = 2, kI16 = 3, kI32 = 4, kI64 = 5, kF32 = 6, kF64 = 7, kU16 = 8,
};

size_t dtype_size(uint8_t code) {
  switch (code) {
    case kU8: case kI8: return 1;
    case kI16: case kU16: return 2;
    case kI32: case kF32: return 4;
    case kI64: case kF64: return 8;
    default: return 0;
  }
}

struct MappedChunk {
  void* base = nullptr;
  size_t bytes = 0;
  const uint8_t* data() const {
    return static_cast<const uint8_t*>(base) + kHeaderSize;
  }
};

struct Reader {
  std::vector<std::string> files;
  int64_t block_size = 0;
  int n_chunks = 0;
  int batch_size = 0;
  bool shuffle = true;
  bool wrap = false;
  uint8_t dtype_code = 0;
  int64_t chunk_tokens = 0;
  int64_t blocks_per_chunk = 0;

  size_t file_idx = 0;
  std::vector<MappedChunk> mapped;
  std::vector<int64_t> block_order;
  size_t order_idx = 0;
  std::mt19937_64 rng;

  // prefetch machinery
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_producer, cv_consumer;
  std::deque<std::vector<int32_t>> queue;
  size_t max_queue = 4;
  std::atomic<bool> stop{false};
  bool exhausted = false;
  std::string error;

  ~Reader() { shutdown(); }

  void shutdown() {
    stop.store(true);
    cv_producer.notify_all();
    cv_consumer.notify_all();
    if (worker.joinable()) worker.join();
    unmap_all();
  }

  void unmap_all() {
    for (auto& m : mapped) {
      if (m.base) munmap(m.base, m.bytes);
    }
    mapped.clear();
  }

  bool read_header(const std::string& path) {
    int fd = open(path.c_str(), O_RDONLY);
    if (fd < 0) { error = "open failed: " + path; return false; }
    uint8_t hdr[kHeaderSize];
    ssize_t n = read(fd, hdr, kHeaderSize);
    close(fd);
    if (n != (ssize_t)kHeaderSize || memcmp(hdr, kMagic, 7) != 0) {
      error = "bad LITPKDS header: " + path;
      return false;
    }
    uint64_t version;
    memcpy(&version, hdr + 7, 8);
    if (version != 1) { error = "unsupported version"; return false; }
    dtype_code = hdr[15];
    uint64_t chunk_size;
    memcpy(&chunk_size, hdr + 16, 8);
    chunk_tokens = (int64_t)chunk_size;
    blocks_per_chunk = chunk_tokens / block_size;
    return dtype_size(dtype_code) != 0;
  }

  bool load_group() {
    unmap_all();
    if ((size_t)n_chunks > files.size() - file_idx) {
      if (!wrap) return false;
      file_idx = 0;
    }
    for (int i = 0; i < n_chunks; ++i) {
      const std::string& path = files[file_idx + i];
      if (chunk_tokens == 0 && !read_header(path)) return false;
      int fd = open(path.c_str(), O_RDONLY);
      if (fd < 0) { error = "open failed: " + path; return false; }
      struct stat st;
      fstat(fd, &st);
      MappedChunk m;
      m.bytes = (size_t)st.st_size;
      m.base = mmap(nullptr, m.bytes, PROT_READ, MAP_PRIVATE, fd, 0);
      close(fd);
      if (m.base == MAP_FAILED) { error = "mmap failed: " + path; return false; }
      madvise(m.base, m.bytes, MADV_WILLNEED);
      mapped.push_back(m);
    }
    file_idx += n_chunks;
    int64_t total = (int64_t)n_chunks * blocks_per_chunk;
    block_order.resize(total);
    for (int64_t i = 0; i < total; ++i) block_order[i] = i;
    if (shuffle) {
      std::shuffle(block_order.begin(), block_order.end(), rng);
    }
    order_idx = 0;
    return true;
  }

  // copy one block into out as int32
  void read_block(int64_t block_idx, int32_t* out) {
    int64_t chunk = block_idx / blocks_per_chunk;
    int64_t elem = (block_idx % blocks_per_chunk) * block_size;
    const uint8_t* src = mapped[chunk].data() + elem * dtype_size(dtype_code);
    switch (dtype_code) {
      case kU16: {
        const uint16_t* p = reinterpret_cast<const uint16_t*>(src);
        for (int64_t i = 0; i < block_size; ++i) out[i] = (int32_t)p[i];
        break;
      }
      case kI32: {
        memcpy(out, src, block_size * 4);
        break;
      }
      case kI64: {
        const int64_t* p = reinterpret_cast<const int64_t*>(src);
        for (int64_t i = 0; i < block_size; ++i) out[i] = (int32_t)p[i];
        break;
      }
      case kU8: {
        for (int64_t i = 0; i < block_size; ++i) out[i] = (int32_t)src[i];
        break;
      }
      default: {
        memset(out, 0, block_size * 4);
        break;
      }
    }
  }

  bool fill_batch(std::vector<int32_t>& batch) {
    batch.resize((size_t)batch_size * block_size);
    for (int b = 0; b < batch_size; ++b) {
      if (order_idx >= block_order.size()) {
        if (!load_group()) return false;
      }
      read_block(block_order[order_idx++], batch.data() + (size_t)b * block_size);
    }
    return true;
  }

  void run() {
    while (!stop.load()) {
      std::vector<int32_t> batch;
      if (!fill_batch(batch)) {
        std::lock_guard<std::mutex> lock(mu);
        exhausted = true;
        cv_consumer.notify_all();
        return;
      }
      std::unique_lock<std::mutex> lock(mu);
      cv_producer.wait(lock, [&] { return queue.size() < max_queue || stop.load(); });
      if (stop.load()) return;
      queue.push_back(std::move(batch));
      cv_consumer.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* ppd_open(const char** paths, int n_files, long block_size, int n_chunks,
               int batch_size, unsigned long seed, int shuffle, int wrap,
               int prefetch_depth) {
  auto* r = new Reader();
  for (int i = 0; i < n_files; ++i) r->files.emplace_back(paths[i]);
  r->block_size = block_size;
  // group size never exceeds the corpus (parity with the Python reader's
  // n_chunks = min(n_chunks, len(files)) clamp); without this, load_group
  // indexes past files[] after a wrap reset
  r->n_chunks = n_chunks > n_files ? n_files : n_chunks;
  r->batch_size = batch_size;
  r->shuffle = shuffle != 0;
  r->wrap = wrap != 0;
  r->rng.seed(seed);
  r->max_queue = prefetch_depth > 0 ? (size_t)prefetch_depth : 4;
  if (r->files.empty() || !r->read_header(r->files[0]) || !r->load_group()) {
    delete r;
    return nullptr;
  }
  r->worker = std::thread([r] { r->run(); });
  return r;
}

// Fills out[batch_size * block_size]; returns 1 on success, 0 when exhausted.
int ppd_next(void* handle, int32_t* out) {
  auto* r = static_cast<Reader*>(handle);
  std::unique_lock<std::mutex> lock(r->mu);
  r->cv_consumer.wait(lock, [&] {
    return !r->queue.empty() || r->exhausted || r->stop.load();
  });
  if (r->queue.empty()) return 0;
  std::vector<int32_t> batch = std::move(r->queue.front());
  r->queue.pop_front();
  r->cv_producer.notify_one();
  lock.unlock();
  memcpy(out, batch.data(), batch.size() * sizeof(int32_t));
  return 1;
}

long ppd_block_size(void* handle) {
  return static_cast<Reader*>(handle)->block_size;
}

void ppd_close(void* handle) {
  delete static_cast<Reader*>(handle);
}

}  // extern "C"

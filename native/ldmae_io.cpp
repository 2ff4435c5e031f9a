// ldmae_io — native data-plane for ldmae_tpu.
//
// The reference's IO-heavy host paths (50k PNG writes per FID run,
// inference.py:294-298; per-item safetensors reads in DataLoader workers,
// img_latent_dataset.py:76-86) become a small C++ runtime:
//
//   * png_encode_batch: multi-threaded PNG encoding (zlib deflate, filter 0)
//   * safetensors shard reader: mmap + header parse + threaded row gather
//
// Exposed with a C ABI for ctypes (no pybind11 in this image).
// Build: g++ -O3 -shared -fPIC -std=c++17 ldmae_io.cpp -lz -lpthread -o libldmae_io.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>
#include <thread>
#include <atomic>
#include <zlib.h>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// PNG encoding
// ---------------------------------------------------------------------------

static void put_be32(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back((v >> 24) & 0xff);
  out.push_back((v >> 16) & 0xff);
  out.push_back((v >> 8) & 0xff);
  out.push_back(v & 0xff);
}

static void write_chunk(std::vector<uint8_t>& out, const char type[4],
                        const uint8_t* data, size_t len) {
  put_be32(out, (uint32_t)len);
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  if (len) out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, Z_NULL, 0);
  crc = crc32(crc, out.data() + start, (uInt)(len + 4));
  put_be32(out, crc);
}

// Encode one HWC uint8 RGB image into an in-memory PNG.
static void encode_png(const uint8_t* img, int h, int w, int level,
                       std::vector<uint8_t>& out) {
  out.clear();
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  out.insert(out.end(), sig, sig + 8);

  uint8_t ihdr[13];
  ihdr[0] = (w >> 24) & 0xff; ihdr[1] = (w >> 16) & 0xff;
  ihdr[2] = (w >> 8) & 0xff;  ihdr[3] = w & 0xff;
  ihdr[4] = (h >> 24) & 0xff; ihdr[5] = (h >> 16) & 0xff;
  ihdr[6] = (h >> 8) & 0xff;  ihdr[7] = h & 0xff;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type RGB
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  write_chunk(out, "IHDR", ihdr, 13);

  // raw scanlines with filter byte 0
  const size_t stride = (size_t)w * 3;
  std::vector<uint8_t> raw((stride + 1) * h);
  for (int y = 0; y < h; ++y) {
    raw[y * (stride + 1)] = 0;
    memcpy(&raw[y * (stride + 1) + 1], img + y * stride, stride);
  }

  uLongf bound = compressBound((uLong)raw.size());
  std::vector<uint8_t> comp(bound);
  compress2(comp.data(), &bound, raw.data(), (uLong)raw.size(), level);
  write_chunk(out, "IDAT", comp.data(), bound);
  write_chunk(out, "IEND", nullptr, 0);
}

// images: (n, h, w, 3) uint8 contiguous. paths: array of n C strings.
// Returns number of files successfully written.
int png_encode_batch(const uint8_t* images, int n, int h, int w,
                     const char* const* paths, int level, int num_threads) {
  if (num_threads <= 0) num_threads = (int)std::thread::hardware_concurrency();
  std::atomic<int> next(0), ok(0);
  const size_t img_size = (size_t)h * w * 3;

  auto worker = [&]() {
    std::vector<uint8_t> buf;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      encode_png(images + (size_t)i * img_size, h, w, level, buf);
      FILE* f = fopen(paths[i], "wb");
      if (!f) continue;
      size_t written = fwrite(buf.data(), 1, buf.size(), f);
      fclose(f);
      if (written == buf.size()) ok.fetch_add(1);
    }
  };

  std::vector<std::thread> threads;
  int nt = std::min(num_threads, n);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

// ---------------------------------------------------------------------------
// safetensors shard reader (mmap)
// ---------------------------------------------------------------------------

struct Tensor {
  std::string name;
  std::string dtype;
  std::vector<int64_t> shape;
  uint64_t begin = 0, end = 0;
};

struct Shard {
  int fd = -1;
  uint8_t* base = nullptr;
  size_t size = 0;
  uint64_t data_start = 0;
  std::vector<Tensor> tensors;
};

// minimal JSON scanning for the safetensors header: a flat object of
// name -> {"dtype": "...", "shape": [...], "data_offsets": [a, b]}.
static bool parse_header(const char* js, size_t len, std::vector<Tensor>& out) {
  size_t i = 0;
  auto skip_ws = [&]() { while (i < len && (js[i] == ' ' || js[i] == '\n' || js[i] == '\t' || js[i] == '\r')) ++i; };
  auto parse_string = [&](std::string& s) -> bool {
    skip_ws();
    if (i >= len || js[i] != '"') return false;
    ++i; s.clear();
    while (i < len && js[i] != '"') {
      if (js[i] == '\\' && i + 1 < len) ++i;
      s.push_back(js[i++]);
    }
    if (i >= len) return false;
    ++i; return true;
  };
  auto parse_int = [&](int64_t& v) -> bool {
    skip_ws();
    char* endp = nullptr;
    v = strtoll(js + i, &endp, 10);
    if (endp == js + i) return false;
    i = endp - js; return true;
  };

  skip_ws();
  if (i >= len || js[i] != '{') return false;
  ++i;
  for (;;) {
    skip_ws();
    if (i < len && js[i] == '}') { ++i; break; }
    std::string key;
    if (!parse_string(key)) return false;
    skip_ws();
    if (i >= len || js[i] != ':') return false;
    ++i; skip_ws();
    if (i >= len || js[i] != '{') return false;
    ++i;
    if (key == "__metadata__") {
      // skip the metadata object (string values only)
      int depth = 1;
      while (i < len && depth > 0) {
        if (js[i] == '"') { std::string tmp; parse_string(tmp); continue; }
        if (js[i] == '{') ++depth;
        if (js[i] == '}') --depth;
        ++i;
      }
    } else {
      Tensor t; t.name = key;
      for (;;) {
        skip_ws();
        if (i < len && js[i] == '}') { ++i; break; }
        std::string field;
        if (!parse_string(field)) return false;
        skip_ws();
        if (i >= len || js[i] != ':') return false;
        ++i; skip_ws();
        if (field == "dtype") {
          if (!parse_string(t.dtype)) return false;
        } else if (field == "shape" || field == "data_offsets") {
          if (i >= len || js[i] != '[') return false;
          ++i;
          std::vector<int64_t> vals;
          skip_ws();
          if (i < len && js[i] != ']') {
            for (;;) {
              int64_t v;
              if (!parse_int(v)) return false;
              vals.push_back(v);
              skip_ws();
              if (i < len && js[i] == ',') { ++i; continue; }
              break;
            }
          }
          skip_ws();
          if (i >= len || js[i] != ']') return false;
          ++i;
          if (field == "shape") t.shape = vals;
          else if (vals.size() == 2) { t.begin = (uint64_t)vals[0]; t.end = (uint64_t)vals[1]; }
        } else {
          return false;
        }
        skip_ws();
        if (i < len && js[i] == ',') { ++i; continue; }
      }
      out.push_back(std::move(t));
    }
    skip_ws();
    if (i < len && js[i] == ',') { ++i; continue; }
  }
  return true;
}

void* shard_open(const char* path) {
  Shard* s = new Shard();
  s->fd = open(path, O_RDONLY);
  if (s->fd < 0) { delete s; return nullptr; }
  struct stat st;
  fstat(s->fd, &st);
  s->size = (size_t)st.st_size;
  s->base = (uint8_t*)mmap(nullptr, s->size, PROT_READ, MAP_PRIVATE, s->fd, 0);
  if (s->base == MAP_FAILED) { close(s->fd); delete s; return nullptr; }
  madvise(s->base, s->size, MADV_RANDOM);
  // validate the header length against the file size before scanning —
  // a truncated/corrupt shard must fail cleanly, not SIGSEGV past the map
  if (s->size < 8) {
    munmap(s->base, s->size); close(s->fd); delete s; return nullptr;
  }
  uint64_t hlen;
  memcpy(&hlen, s->base, 8);  // little-endian header length
  if (hlen > s->size - 8) {
    munmap(s->base, s->size); close(s->fd); delete s; return nullptr;
  }
  s->data_start = 8 + hlen;
  if (!parse_header((const char*)s->base + 8, hlen, s->tensors)) {
    munmap(s->base, s->size); close(s->fd); delete s; return nullptr;
  }
  // tensor extents must stay inside the file
  for (auto& t : s->tensors) {
    if (t.end < t.begin || s->data_start + t.end > s->size) {
      munmap(s->base, s->size); close(s->fd); delete s; return nullptr;
    }
  }
  return s;
}

void shard_close(void* handle) {
  Shard* s = (Shard*)handle;
  if (!s) return;
  munmap(s->base, s->size);
  close(s->fd);
  delete s;
}

static Tensor* find_tensor(Shard* s, const char* name) {
  for (auto& t : s->tensors)
    if (t.name == name) return &t;
  return nullptr;
}

// first dim of tensor `name`, or -1.
int64_t shard_num_rows(void* handle, const char* name) {
  Shard* s = (Shard*)handle;
  Tensor* t = find_tensor(s, name);
  if (!t || t->shape.empty()) return -1;
  return t->shape[0];
}

// bytes per row (product of trailing dims * dtype size), or -1.
int64_t shard_row_bytes(void* handle, const char* name) {
  Shard* s = (Shard*)handle;
  Tensor* t = find_tensor(s, name);
  if (!t || t->shape.empty() || t->shape[0] <= 0) return -1;
  uint64_t total = t->end - t->begin;
  return (int64_t)(total / (uint64_t)t->shape[0]);
}

// Gather rows[indices] of tensor `name` into out (n_idx * row_bytes),
// multi-threaded. Returns rows copied.
int64_t shard_gather(void* handle, const char* name, const int64_t* indices,
                     int64_t n_idx, uint8_t* out, int num_threads) {
  Shard* s = (Shard*)handle;
  Tensor* t = find_tensor(s, name);
  if (!t || t->shape.empty() || t->shape[0] <= 0) return -1;
  const uint64_t row_bytes = (t->end - t->begin) / (uint64_t)t->shape[0];
  const uint8_t* base = s->base + s->data_start + t->begin;
  const int64_t rows = t->shape[0];

  if (num_threads <= 0) num_threads = 4;
  std::atomic<int64_t> next(0), ok(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n_idx) break;
      int64_t r = indices[i];
      if (r < 0 || r >= rows) continue;
      memcpy(out + (uint64_t)i * row_bytes, base + (uint64_t)r * row_bytes,
             row_bytes);
      ok.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  int nt = (int)std::min<int64_t>(num_threads, n_idx);
  for (int i = 0; i < nt; ++i) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return ok.load();
}

}  // extern "C"

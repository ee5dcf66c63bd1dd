// Native record-file reader/writer.
//
// Production data-path component (the reference leans on torch DataLoader
// worker processes; this container — and TPU hosts generally — want a
// zero-copy mmap'd shard format instead): fixed-layout binary records are
// written once by the Python packer (tools/pack_dataset.py) and served by
// this reader through ctypes with no per-sample Python parsing.
//
// File layout:
//   header:  int64 magic, int64 n_records, int64 index_offset
//   records: raw bytes (each record = caller-defined payload)
//   index:   n_records x (int64 offset, int64 length)
//
// Build: make -C native   (part of libeval_core.so's sibling librecord_io.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

constexpr int64_t kMagic = 0x57534F445245435ALL;  // "WSODRECZ"

struct Reader {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  int64_t n = 0;
  const int64_t* index = nullptr;  // 2 * n entries
};

}  // namespace

extern "C" {

void* record_open(const char* path) {
  Reader* r = new Reader();
  r->fd = open(path, O_RDONLY);
  if (r->fd < 0) {
    delete r;
    return nullptr;
  }
  struct stat st;
  fstat(r->fd, &st);
  r->size = static_cast<size_t>(st.st_size);
  r->base = static_cast<const uint8_t*>(
      mmap(nullptr, r->size, PROT_READ, MAP_PRIVATE, r->fd, 0));
  if (r->base == MAP_FAILED) {
    close(r->fd);
    delete r;
    return nullptr;
  }
  madvise(const_cast<uint8_t*>(r->base), r->size, MADV_WILLNEED);
  const int64_t* hdr = reinterpret_cast<const int64_t*>(r->base);
  if (hdr[0] != kMagic) {
    munmap(const_cast<uint8_t*>(r->base), r->size);
    close(r->fd);
    delete r;
    return nullptr;
  }
  r->n = hdr[1];
  r->index = reinterpret_cast<const int64_t*>(r->base + hdr[2]);
  return r;
}

int64_t record_count(void* handle) {
  return handle ? static_cast<Reader*>(handle)->n : -1;
}

int64_t record_length(void* handle, int64_t i) {
  Reader* r = static_cast<Reader*>(handle);
  if (!r || i < 0 || i >= r->n) return -1;
  return r->index[2 * i + 1];
}

// Copy record i into out (caller allocates record_length bytes).
int64_t record_read(void* handle, int64_t i, uint8_t* out) {
  Reader* r = static_cast<Reader*>(handle);
  if (!r || i < 0 || i >= r->n) return -1;
  int64_t off = r->index[2 * i], len = r->index[2 * i + 1];
  memcpy(out, r->base + off, static_cast<size_t>(len));
  return len;
}

// Batched copy: gather `count` records (ids) back to back into out;
// out_lengths receives each record's length.
int64_t record_read_batch(void* handle, const int64_t* ids, int64_t count,
                          uint8_t* out, int64_t* out_lengths) {
  Reader* r = static_cast<Reader*>(handle);
  if (!r) return -1;
  int64_t total = 0;
  for (int64_t k = 0; k < count; ++k) {
    int64_t i = ids[k];
    if (i < 0 || i >= r->n) return -1;
    int64_t off = r->index[2 * i], len = r->index[2 * i + 1];
    memcpy(out + total, r->base + off, static_cast<size_t>(len));
    out_lengths[k] = len;
    total += len;
  }
  return total;
}

void record_close(void* handle) {
  Reader* r = static_cast<Reader*>(handle);
  if (!r) return;
  if (r->base && r->base != MAP_FAILED)
    munmap(const_cast<uint8_t*>(const_cast<const uint8_t*>(r->base)), r->size);
  if (r->fd >= 0) close(r->fd);
  delete r;
}

// Writer: one-shot pack from an offsets/lengths table + blob.
int64_t record_write(const char* path, const uint8_t* blob,
                     const int64_t* lengths, int64_t n) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  int64_t header[3] = {kMagic, n, 0};
  fwrite(header, sizeof(int64_t), 3, f);
  std::vector<int64_t> index(2 * n);
  int64_t off = sizeof(header);
  const uint8_t* p = blob;
  for (int64_t i = 0; i < n; ++i) {
    fwrite(p, 1, static_cast<size_t>(lengths[i]), f);
    index[2 * i] = off;
    index[2 * i + 1] = lengths[i];
    off += lengths[i];
    p += lengths[i];
  }
  header[2] = off;
  fwrite(index.data(), sizeof(int64_t), 2 * n, f);
  fseek(f, 0, SEEK_SET);
  fwrite(header, sizeof(int64_t), 3, f);
  fclose(f);
  return off;
}

}  // extern "C"

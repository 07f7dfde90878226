// Native trace sink: buffered binary row logging for long sweeps.
//
// The host-runtime counterpart of the reference's logging IO (append-only
// lip.txt traces, original_code/simulation.py:182-184, and the per-tick
// Debug/* text dumps) — those cost a Python-level format+write per tick;
// this sink streams fixed-width float32 rows through a large user-space
// buffer with a single fwrite per flush, so host-side logging never
// back-pressures the device loop.
//
// File format (little-endian):
//   magic "CMPCTRC1" (8 bytes) | uint32 ncols | uint32 reserved
//   float32 rows, ncols each, tightly packed.
//
// C ABI (handles are opaque pointers):
//   void* ts_open(const char* path, unsigned ncols, unsigned buf_rows);
//   int   ts_append(void* h, const float* rows, unsigned nrows);
//   int   ts_flush(void* h);
//   long  ts_rows_written(void* h);
//   int   ts_close(void* h);

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Sink {
  std::FILE* f;
  uint32_t ncols;
  std::vector<float> buf;
  size_t used;   // floats in buf
  long rows;
};

}  // namespace

extern "C" {

void* ts_open(const char* path, unsigned ncols, unsigned buf_rows) {
  if (ncols == 0) return nullptr;
  std::FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  const char magic[8] = {'C', 'M', 'P', 'C', 'T', 'R', 'C', '1'};
  uint32_t hdr[2] = {ncols, 0};
  if (std::fwrite(magic, 1, 8, f) != 8 ||
      std::fwrite(hdr, sizeof(uint32_t), 2, f) != 2) {
    std::fclose(f);
    return nullptr;
  }
  Sink* s = new Sink;
  s->f = f;
  s->ncols = ncols;
  s->buf.resize(static_cast<size_t>(buf_rows ? buf_rows : 4096) * ncols);
  s->used = 0;
  s->rows = 0;
  return s;
}

int ts_flush(void* h) {
  Sink* s = static_cast<Sink*>(h);
  if (!s) return -1;
  if (s->used) {
    if (std::fwrite(s->buf.data(), sizeof(float), s->used, s->f) != s->used)
      return -2;
    s->used = 0;
  }
  return std::fflush(s->f) == 0 ? 0 : -2;
}

int ts_append(void* h, const float* rows, unsigned nrows) {
  Sink* s = static_cast<Sink*>(h);
  if (!s) return -1;
  size_t n = static_cast<size_t>(nrows) * s->ncols;
  size_t cap = s->buf.size();
  size_t off = 0;
  while (n > 0) {
    size_t take = n < cap - s->used ? n : cap - s->used;
    std::memcpy(s->buf.data() + s->used, rows + off, take * sizeof(float));
    s->used += take;
    off += take;
    n -= take;
    if (s->used == cap) {
      if (std::fwrite(s->buf.data(), sizeof(float), s->used, s->f)
          != s->used)
        return -2;
      s->used = 0;
    }
  }
  s->rows += nrows;
  return 0;
}

long ts_rows_written(void* h) {
  Sink* s = static_cast<Sink*>(h);
  return s ? s->rows : -1;
}

int ts_close(void* h) {
  Sink* s = static_cast<Sink*>(h);
  if (!s) return -1;
  int rc = ts_flush(h);
  std::fclose(s->f);
  delete s;
  return rc;
}

}  // extern "C"

// Native FITS primary-HDU reader + parallel batch decoder.
//
// The training hot loop (SURVEY.md §3.4) is dominated by per-sample FITS
// gunzip + decode; the reference hides it behind 12 torch DataLoader worker
// PROCESSES (reference data/datamodule.py:19-20). This library does the same
// work in-process: zlib inflate + header scan + big-endian convert in C, and
// a pthread pool for whole batches, bound to Python via ctypes
// (xmm_superres_denoise_tpu/data/native_loader.py).
//
// Scope: primary image HDUs, BITPIX in {8,16,32,64,-32,-64}, BSCALE/BZERO,
// transparent gzip — exactly the subset io/fits.py reads for images.
//
// Build: g++ -O2 -shared -fPIC -o libxmmsr_fits.so fits_reader.cc -lz -lpthread

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <pthread.h>
#include <zlib.h>

namespace {

constexpr size_t kBlock = 2880;
constexpr size_t kCard = 80;

struct Buffer {
  unsigned char* data = nullptr;
  size_t size = 0;
  ~Buffer() { free(data); }
};

// Read a whole file; transparently gunzip if it has the gzip magic.
bool read_file(const char* path, Buffer* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  unsigned char* raw = static_cast<unsigned char*>(malloc(fsize));
  if (!raw || fread(raw, 1, fsize, f) != static_cast<size_t>(fsize)) {
    free(raw);
    fclose(f);
    return false;
  }
  fclose(f);

  if (fsize >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
    // gzip: inflate with growing output buffer. Allocation failures must
    // return false (clean fallback to the pure-Python reader), never
    // dereference null in the training hot loop.
    size_t cap = static_cast<size_t>(fsize) * 4 + kBlock;
    unsigned char* dst = static_cast<unsigned char*>(malloc(cap));
    if (!dst) {
      free(raw);
      return false;
    }
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) {
      free(raw);
      free(dst);
      return false;
    }
    zs.next_in = raw;
    zs.avail_in = static_cast<uInt>(fsize);
    size_t total = 0;
    int ret = Z_OK;
    while (ret != Z_STREAM_END) {
      if (total == cap) {
        cap *= 2;
        unsigned char* grown =
            static_cast<unsigned char*>(realloc(dst, cap));
        if (!grown) {
          inflateEnd(&zs);
          free(raw);
          free(dst);
          return false;
        }
        dst = grown;
      }
      zs.next_out = dst + total;
      zs.avail_out = static_cast<uInt>(cap - total);
      ret = inflate(&zs, Z_NO_FLUSH);
      if (ret != Z_OK && ret != Z_STREAM_END) {
        inflateEnd(&zs);
        free(raw);
        free(dst);
        return false;
      }
      total = zs.total_out;
    }
    inflateEnd(&zs);
    free(raw);
    out->data = dst;
    out->size = total;
  } else {
    out->data = raw;
    out->size = fsize;
  }
  return true;
}

struct HeaderInfo {
  int bitpix = 0;
  int naxis = 0;
  long naxisn[8] = {0};
  double bscale = 1.0;
  double bzero = 0.0;
  size_t data_offset = 0;  // byte offset of the data block
};

bool key_is(const char* card, const char* key) {
  size_t n = strlen(key);
  if (strncmp(card, key, n) != 0) return false;
  for (size_t i = n; i < 8; i++)
    if (card[i] != ' ') return false;
  return true;
}

double card_value(const char* card) {
  // value field after "= ", up to '/'
  char buf[72];
  memcpy(buf, card + 10, 70);
  buf[70] = 0;
  char* slash = strchr(buf, '/');
  if (slash) *slash = 0;
  return atof(buf);
}

bool parse_header(const Buffer& buf, HeaderInfo* h) {
  size_t pos = 0;
  bool done = false;
  while (!done) {
    if (pos + kBlock > buf.size) return false;
    for (size_t off = 0; off < kBlock; off += kCard) {
      const char* card = reinterpret_cast<const char*>(buf.data + pos + off);
      if (key_is(card, "END")) {
        done = true;
        break;
      } else if (key_is(card, "BITPIX")) {
        h->bitpix = static_cast<int>(card_value(card));
      } else if (key_is(card, "NAXIS")) {
        h->naxis = static_cast<int>(card_value(card));
      } else if (strncmp(card, "NAXIS", 5) == 0 && card[5] >= '1' &&
                 card[5] <= '8' && card[6] == ' ') {
        h->naxisn[card[5] - '1'] = static_cast<long>(card_value(card));
      } else if (key_is(card, "BSCALE")) {
        h->bscale = card_value(card);
      } else if (key_is(card, "BZERO")) {
        h->bzero = card_value(card);
      }
    }
    pos += kBlock;
  }
  h->data_offset = pos;
  return true;
}

inline uint16_t bswap16(uint16_t v) { return __builtin_bswap16(v); }
inline uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }
inline uint64_t bswap64(uint64_t v) { return __builtin_bswap64(v); }

// Decode the primary HDU into float32 (row-major, NAXIS2 x NAXIS1).
int decode(const char* path, float* out, long capacity, long* h_out,
           long* w_out) {
  Buffer buf;
  if (!read_file(path, &buf)) return -1;
  HeaderInfo hdr;
  if (!parse_header(buf, &hdr)) return -2;
  // parse_header only fills naxisn[0..7]; a corrupt NAXIS > 8 would walk
  // off the array below.
  if (hdr.naxis < 2 || hdr.naxis > 8) return -3;
  long w = hdr.naxisn[0], h = hdr.naxisn[1];
  long n = w * h;
  for (int i = 2; i < hdr.naxis; i++) n *= hdr.naxisn[i] ? hdr.naxisn[i] : 1;
  if (h_out) *h_out = h;
  if (w_out) *w_out = w;
  if (!out) return 0;  // dims-only query
  if (n > capacity) return -4;

  const unsigned char* d = buf.data + hdr.data_offset;
  size_t avail = buf.size - hdr.data_offset;
  size_t need = static_cast<size_t>(n) * (abs(hdr.bitpix) / 8);
  if (avail < need) return -5;

  const double s = hdr.bscale, z = hdr.bzero;
  const bool scaled = (s != 1.0) || (z != 0.0);
  switch (hdr.bitpix) {
    case 8: {
      for (long i = 0; i < n; i++) out[i] = static_cast<float>(d[i]);
      break;
    }
    case 16: {
      const uint16_t* p = reinterpret_cast<const uint16_t*>(d);
      for (long i = 0; i < n; i++)
        out[i] = static_cast<float>(static_cast<int16_t>(bswap16(p[i])));
      break;
    }
    case 32: {
      const uint32_t* p = reinterpret_cast<const uint32_t*>(d);
      for (long i = 0; i < n; i++)
        out[i] = static_cast<float>(static_cast<int32_t>(bswap32(p[i])));
      break;
    }
    case 64: {
      const uint64_t* p = reinterpret_cast<const uint64_t*>(d);
      for (long i = 0; i < n; i++)
        out[i] = static_cast<float>(static_cast<int64_t>(bswap64(p[i])));
      break;
    }
    case -32: {
      const uint32_t* p = reinterpret_cast<const uint32_t*>(d);
      for (long i = 0; i < n; i++) {
        uint32_t v = bswap32(p[i]);
        float fv;
        memcpy(&fv, &v, 4);
        out[i] = fv;
      }
      break;
    }
    case -64: {
      const uint64_t* p = reinterpret_cast<const uint64_t*>(d);
      for (long i = 0; i < n; i++) {
        uint64_t v = bswap64(p[i]);
        double dv;
        memcpy(&dv, &v, 8);
        out[i] = static_cast<float>(dv);
      }
      break;
    }
    default:
      return -6;
  }
  if (scaled) {
    for (long i = 0; i < n; i++)
      out[i] = static_cast<float>(out[i] * s + z);
  }
  return 0;
}

struct BatchJob {
  const char* const* paths;
  float* out;       // (count, h, w) contiguous
  long per_image;   // h * w
  long count;
  long next;        // work index (mutex-guarded)
  int status;       // first nonzero error
  pthread_mutex_t mu;
};

void* batch_worker(void* arg) {
  BatchJob* job = static_cast<BatchJob*>(arg);
  for (;;) {
    pthread_mutex_lock(&job->mu);
    long i = job->next++;
    pthread_mutex_unlock(&job->mu);
    if (i >= job->count) return nullptr;
    long h = 0, w = 0;
    int rc = decode(job->paths[i], job->out + i * job->per_image,
                    job->per_image, &h, &w);
    if (rc == 0 && h * w != job->per_image) rc = -7;  // shape mismatch
    if (rc != 0) {
      pthread_mutex_lock(&job->mu);
      if (job->status == 0) job->status = rc;
      pthread_mutex_unlock(&job->mu);
    }
  }
}

}  // namespace

extern "C" {

// dims-only: returns 0 and writes (*h, *w) on success.
int xmmsr_fits_dims(const char* path, long* h, long* w) {
  return decode(path, nullptr, 0, h, w);
}

// Decode one file into a caller-allocated float32 buffer of `capacity`
// elements; writes dims. Returns 0 on success, negative error otherwise.
int xmmsr_fits_read(const char* path, float* out, long capacity, long* h,
                    long* w) {
  return decode(path, out, capacity, h, w);
}

// Decode `count` same-shape images in parallel into (count, per_image).
int xmmsr_fits_read_batch(const char* const* paths, long count, float* out,
                          long per_image, int n_threads) {
  BatchJob job{paths, out, per_image, count, 0, 0, PTHREAD_MUTEX_INITIALIZER};
  if (n_threads < 1) n_threads = 1;
  if (n_threads > 64) n_threads = 64;
  pthread_t tids[64];
  int started = 0;
  for (; started < n_threads; started++) {
    if (pthread_create(&tids[started], nullptr, batch_worker, &job) != 0) break;
  }
  if (started == 0) batch_worker(&job);
  for (int i = 0; i < started; i++) pthread_join(tids[i], nullptr);
  return job.status;
}

}  // extern "C"

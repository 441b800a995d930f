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

// --------------------------------------------------------------------------
// Binary-table (BINTABLE) column reader — the native fast path behind
// io/native_bintable.py. The event-list load (reference SAS chain's input,
// xmmsas_tools.py:382-544; native ops/events.py) is dominated by the host
// column decode of multi-million-row EVENTS extensions; this does the HDU
// walk + a single multithreaded pass extracting all requested columns with
// byteswap into caller-allocated native-endian buffers.

constexpr int kMaxFields = 99;

struct BtField {
  char name[71];
  char letter;   // TFORM type letter
  long repeat;
  long offset;   // byte offset within a row
  long width;    // bytes within a row
};

struct BtHandle {
  unsigned char* data = nullptr;  // whole (inflated) file, owned
  ~BtHandle() { free(data); }
  size_t size;
  size_t header_off;    // byte offset of the matched bintable header
  size_t header_len;
  size_t data_off;
  long nrows = 0;
  long rowlen = 0;
  int nfields = 0;
  BtField fields[kMaxFields];
};

long bt_card_long(const char* card, long fallback) {
  char buf[72];
  memcpy(buf, card + 10, 70);
  buf[70] = 0;
  char* slash = strchr(buf, '/');
  if (slash) *slash = 0;
  char* end = nullptr;
  long v = strtol(buf, &end, 10);
  return end == buf ? fallback : v;
}

// String value of a card ("= 'VALUE   '"): trimmed, unquoted. Returns
// false when the value is not a quoted string.
bool bt_card_str(const char* card, char* out, size_t cap) {
  const char* p = card + 10;
  const char* end = card + 80;
  while (p < end && *p == ' ') p++;
  if (p >= end || *p != '\'') return false;
  p++;
  size_t n = 0;
  while (p < end && *p != '\'' && n + 1 < cap) out[n++] = *p++;
  while (n > 0 && out[n - 1] == ' ') n--;  // FITS pads string values
  out[n] = 0;
  return true;
}

int bt_elem_size(char letter) {
  switch (letter) {
    case 'L': case 'X': case 'B': case 'A': return 1;
    case 'I': return 2;
    case 'J': case 'E': return 4;
    case 'K': case 'D': return 8;
    default: return 0;
  }
}

// Parse one HDU header starting at `pos`. Fills generic size facts and,
// for BINTABLEs, the field table. Returns false on truncation/corruption.
struct BtHeaderScan {
  long bitpix = 8, naxis = 0, naxisn[8] = {0};
  long pcount = 0, gcount = 1, tfields = 0;
  long nrows = 0, rowlen = 0;
  bool is_bintable = false;
  char extname[71] = {0};
  char ttype[kMaxFields][71];
  char tform[kMaxFields][71];
  size_t end_off = 0;  // offset just past the END block
};

bool bt_scan_header(const Buffer& buf, size_t pos, BtHeaderScan* s) {
  memset(s->ttype, 0, sizeof(s->ttype));
  memset(s->tform, 0, sizeof(s->tform));
  bool done = false;
  while (!done) {
    if (pos + kBlock > buf.size) return false;
    for (size_t off = 0; off < kBlock; off += kCard) {
      const char* card = reinterpret_cast<const char*>(buf.data + pos + off);
      if (key_is(card, "END")) {
        done = true;
        break;
      } else if (key_is(card, "BITPIX")) {
        s->bitpix = bt_card_long(card, 8);
      } else if (key_is(card, "NAXIS")) {
        s->naxis = bt_card_long(card, 0);
      } else if (strncmp(card, "NAXIS", 5) == 0 && card[5] >= '1' &&
                 card[5] <= '8' && card[6] == ' ') {
        s->naxisn[card[5] - '1'] = bt_card_long(card, 0);
      } else if (key_is(card, "PCOUNT")) {
        s->pcount = bt_card_long(card, 0);
      } else if (key_is(card, "GCOUNT")) {
        s->gcount = bt_card_long(card, 1);
      } else if (key_is(card, "TFIELDS")) {
        s->tfields = bt_card_long(card, 0);
      } else if (key_is(card, "XTENSION")) {
        char v[71];
        if (bt_card_str(card, v, sizeof(v)))
          s->is_bintable = (strcmp(v, "BINTABLE") == 0);
      } else if (key_is(card, "EXTNAME")) {
        bt_card_str(card, s->extname, sizeof(s->extname));
      } else if (strncmp(card, "TTYPE", 5) == 0) {
        long i = strtol(card + 5, nullptr, 10);
        if (i >= 1 && i <= kMaxFields)
          bt_card_str(card, s->ttype[i - 1], 71);
      } else if (strncmp(card, "TFORM", 5) == 0) {
        long i = strtol(card + 5, nullptr, 10);
        if (i >= 1 && i <= kMaxFields)
          bt_card_str(card, s->tform[i - 1], 71);
      }
    }
    pos += kBlock;
  }
  s->end_off = pos;
  s->rowlen = s->naxis >= 1 ? s->naxisn[0] : 0;
  s->nrows = s->naxis >= 2 ? s->naxisn[1] : 0;
  return true;
}

size_t bt_data_nbytes(const BtHeaderScan& s) {
  if (s.naxis == 0) return 0;
  size_t n = 1;
  for (int i = 0; i < s.naxis && i < 8; i++)
    n *= static_cast<size_t>(s.naxisn[i] > 0 ? s.naxisn[i] : 0);
  size_t bytes = (labs(s.bitpix) / 8) * s.gcount * (s.pcount + n);
  return (bytes + kBlock - 1) / kBlock * kBlock;  // padded to block size
}

struct BtColJob {
  const unsigned char* rows;   // data_off base
  long rowlen;
  long nrows;
  struct Col {
    long src_off;
    long repeat;
    char letter;
    unsigned char* dst;        // native-endian output base
  } cols[kMaxFields];
  int ncols;
  long next_block;             // work unit = kRowsPerBlock rows
  pthread_mutex_t mu;
};

constexpr long kRowsPerBlock = 65536;

void* bt_col_worker(void* arg) {
  BtColJob* job = static_cast<BtColJob*>(arg);
  for (;;) {
    pthread_mutex_lock(&job->mu);
    long blk = job->next_block++;
    pthread_mutex_unlock(&job->mu);
    long r0 = blk * kRowsPerBlock;
    if (r0 >= job->nrows) return nullptr;
    long r1 = r0 + kRowsPerBlock;
    if (r1 > job->nrows) r1 = job->nrows;
    for (int c = 0; c < job->ncols; c++) {
      const BtColJob::Col& col = job->cols[c];
      const unsigned char* src = job->rows + r0 * job->rowlen + col.src_off;
      const long stride = job->rowlen;
      const long rep = col.repeat;
      switch (col.letter) {
        case 'B': case 'L': case 'A': {
          unsigned char* dst = col.dst + r0 * rep;
          for (long r = r0; r < r1; r++, src += stride, dst += rep)
            memcpy(dst, src, rep);
          break;
        }
        case 'I': {
          int16_t* dst = reinterpret_cast<int16_t*>(col.dst) + r0 * rep;
          for (long r = r0; r < r1; r++, src += stride)
            for (long k = 0; k < rep; k++) {
              uint16_t v;
              memcpy(&v, src + 2 * k, 2);
              v = bswap16(v);
              memcpy(dst++, &v, 2);
            }
          break;
        }
        case 'J': case 'E': {
          uint32_t* dst = reinterpret_cast<uint32_t*>(col.dst) + r0 * rep;
          for (long r = r0; r < r1; r++, src += stride)
            for (long k = 0; k < rep; k++) {
              uint32_t v;
              memcpy(&v, src + 4 * k, 4);
              *dst++ = bswap32(v);
            }
          break;
        }
        case 'K': case 'D': {
          uint64_t* dst = reinterpret_cast<uint64_t*>(col.dst) + r0 * rep;
          for (long r = r0; r < r1; r++, src += stride)
            for (long k = 0; k < rep; k++) {
              uint64_t v;
              memcpy(&v, src + 8 * k, 8);
              *dst++ = bswap64(v);
            }
          break;
        }
        default:
          break;  // rejected at bind time
      }
    }
  }
}

}  // namespace

extern "C" {

// Open a FITS file (transparent gunzip) and locate the BINTABLE extension
// named `extname` (or the first BINTABLE when extname is null/empty).
// Returns an opaque handle, or null when the file/extension is absent or
// malformed (callers fall back to the pure-Python reader).
void* xmmsr_bt_open(const char* path, const char* extname) {
  Buffer buf;
  if (!read_file(path, &buf)) return nullptr;

  size_t pos = 0;
  bool primary = true;
  while (pos + kBlock <= buf.size) {
    BtHeaderScan scan;
    if (!bt_scan_header(buf, pos, &scan)) return nullptr;
    size_t data_off = scan.end_off;
    size_t data_len = bt_data_nbytes(scan);
    if (!primary && scan.is_bintable &&
        (extname == nullptr || extname[0] == 0 ||
         strcmp(scan.extname, extname) == 0)) {
      if (scan.tfields < 1 || scan.tfields > kMaxFields) return nullptr;
      if (data_off + static_cast<size_t>(scan.nrows) * scan.rowlen > buf.size)
        return nullptr;
      BtHandle* h = new BtHandle();
      h->data = buf.data;
      h->size = buf.size;
      buf.data = nullptr;  // transfer ownership
      h->header_off = pos;
      h->header_len = data_off - pos;
      h->data_off = data_off;
      h->nrows = scan.nrows;
      h->rowlen = scan.rowlen;
      h->nfields = static_cast<int>(scan.tfields);
      long off = 0;
      for (int i = 0; i < h->nfields; i++) {
        BtField& f = h->fields[i];
        memcpy(f.name, scan.ttype[i], sizeof(f.name));
        const char* tf = scan.tform[i];
        char* end = nullptr;
        long repeat = strtol(tf, &end, 10);
        if (end == tf) repeat = 1;
        char letter = end ? *end : 0;
        int esz = bt_elem_size(letter);
        if (esz == 0) {  // unsupported TFORM: row layout unknown
          delete h;
          return nullptr;
        }
        f.letter = letter;
        f.repeat = repeat;
        f.offset = off;
        f.width = (letter == 'X') ? (repeat + 7) / 8 : esz * repeat;
        off += f.width;
      }
      if (off != h->rowlen) {  // layout mismatch: refuse rather than misread
        delete h;
        return nullptr;
      }
      return h;
    }
    pos = data_off + data_len;
    primary = false;
  }
  return nullptr;
}

long xmmsr_bt_nrows(void* handle) {
  return static_cast<BtHandle*>(handle)->nrows;
}

// Copy the raw header blocks (for Python-side card parsing). Returns the
// byte length needed; copies min(len, cap) when out is non-null.
long xmmsr_bt_header(void* handle, char* out, long cap) {
  BtHandle* h = static_cast<BtHandle*>(handle);
  long n = static_cast<long>(h->header_len);
  if (out && cap > 0) {
    long c = n < cap ? n : cap;
    memcpy(out, h->data + h->header_off, c);
  }
  return n;
}

// Column lookup: writes the TFORM type letter (as int) and repeat count.
// Returns 0 on success, -1 when the column does not exist, -2 when its
// type is present but not extractable (bit arrays).
int xmmsr_bt_col_info(void* handle, const char* name, int* letter,
                      long* repeat) {
  BtHandle* h = static_cast<BtHandle*>(handle);
  for (int i = 0; i < h->nfields; i++) {
    if (strcmp(h->fields[i].name, name) == 0) {
      if (letter) *letter = h->fields[i].letter;
      if (repeat) *repeat = h->fields[i].repeat;
      return h->fields[i].letter == 'X' ? -2 : 0;
    }
  }
  return -1;
}

// Extract `ncols` columns in one multithreaded pass over the rows. `outs[i]`
// must hold nrows*repeat elements of the column's native-endian dtype
// (I->int16, J->int32, K->int64, E->float32, D->float64, B/L/A->uint8).
// Returns 0 on success, negative on a bad column name/type.
int xmmsr_bt_read_cols(void* handle, const char* const* names, int ncols,
                       void** outs, int n_threads) {
  BtHandle* h = static_cast<BtHandle*>(handle);
  if (ncols < 1 || ncols > kMaxFields) return -3;
  BtColJob job;
  job.rows = h->data + h->data_off;
  job.rowlen = h->rowlen;
  job.nrows = h->nrows;
  job.ncols = ncols;
  job.next_block = 0;
  pthread_mutex_init(&job.mu, nullptr);
  for (int c = 0; c < ncols; c++) {
    int found = -1;
    for (int i = 0; i < h->nfields; i++)
      if (strcmp(h->fields[i].name, names[c]) == 0) { found = i; break; }
    if (found < 0) return -1;
    const BtField& f = h->fields[found];
    if (f.letter == 'X') return -2;
    job.cols[c] = {f.offset, f.repeat, f.letter,
                   static_cast<unsigned char*>(outs[c])};
  }
  if (n_threads < 1) n_threads = 1;
  if (n_threads > 64) n_threads = 64;
  long blocks = (h->nrows + kRowsPerBlock - 1) / kRowsPerBlock;
  if (blocks < n_threads) n_threads = blocks > 0 ? static_cast<int>(blocks) : 1;
  pthread_t tids[64];
  int started = 0;
  for (; started < n_threads; started++)
    if (pthread_create(&tids[started], nullptr, bt_col_worker, &job) != 0)
      break;
  if (started == 0) bt_col_worker(&job);
  for (int i = 0; i < started; i++) pthread_join(tids[i], nullptr);
  return 0;
}

void xmmsr_bt_close(void* handle) {
  delete static_cast<BtHandle*>(handle);  // ~BtHandle frees the buffer
}

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

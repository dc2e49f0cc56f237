// Native IO core for afford_motion_tpu.
//
// Role: the host-side data path. The reference leans on torch's native
// DataLoader workers + CUDA pinned-memory staging for per-item .npy/.npz
// reads (reference: datasets/base.py + torch.utils.data); on TPU hosts the
// equivalent is a C++ reader that (a) parses .npy headers without Python,
// (b) preads file payloads straight into caller-owned buffers — including
// rows of one contiguous pre-allocated batch, which IS the collate — and
// (c) fans a batch of files across a thread pool with the GIL released
// (ctypes drops the GIL for the duration of the call).
//
// C ABI only; bound from Python via ctypes (no pybind11 in this image).
// Error codes: 0 ok, -1 open failed, -2 short/failed read, -3 bad magic,
// -4 header parse failure, -5 caller buffer too small.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct NpyHeader {
  char descr[15];
  int64_t shape[8];
  int ndim;
  int fortran;
  int64_t data_offset;
  int64_t data_bytes;  // file size minus data_offset
};

int read_exact(int fd, void* buf, size_t n, int64_t off) {
  char* p = static_cast<char*>(buf);
  size_t done = 0;
  while (done < n) {
    ssize_t r = pread(fd, p + done, n - done, off + done);
    if (r <= 0) return -2;
    done += static_cast<size_t>(r);
  }
  return 0;
}

// Parse the python-dict-literal header:
//   {'descr': '<f4', 'fortran_order': False, 'shape': (196, 263), }
int parse_header(const std::string& h, NpyHeader* out) {
  size_t d = h.find("'descr'");
  if (d == std::string::npos) return -4;
  size_t q1 = h.find('\'', h.find(':', d));
  if (q1 == std::string::npos) return -4;
  size_t q2 = h.find('\'', q1 + 1);
  if (q2 == std::string::npos || q2 - q1 - 1 >= sizeof(out->descr)) return -4;
  std::memset(out->descr, 0, sizeof(out->descr));
  std::memcpy(out->descr, h.data() + q1 + 1, q2 - q1 - 1);

  size_t f = h.find("'fortran_order'");
  if (f == std::string::npos) return -4;
  out->fortran = h.find("True", f) < h.find(',', f) ? 1 : 0;

  size_t s = h.find("'shape'");
  if (s == std::string::npos) return -4;
  size_t p1 = h.find('(', s);
  size_t p2 = h.find(')', p1);
  if (p1 == std::string::npos || p2 == std::string::npos) return -4;
  out->ndim = 0;
  size_t i = p1 + 1;
  while (i < p2) {
    while (i < p2 && (h[i] == ' ' || h[i] == ',')) ++i;
    if (i >= p2) break;
    if (h[i] < '0' || h[i] > '9') return -4;
    int64_t v = 0;
    while (i < p2 && h[i] >= '0' && h[i] <= '9') v = v * 10 + (h[i++] - '0');
    if (out->ndim >= 8) return -4;
    out->shape[out->ndim++] = v;
  }
  return 0;
}

int stat_npy_at(const char* path, int64_t base, NpyHeader* out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  unsigned char pre[12];
  if (read_exact(fd, pre, 10, base) != 0) { close(fd); return -2; }
  static const unsigned char magic[6] = {0x93, 'N', 'U', 'M', 'P', 'Y'};
  if (std::memcmp(pre, magic, 6) != 0) { close(fd); return -3; }
  int major = pre[6];
  int64_t hlen, hstart;
  if (major == 1) {
    hlen = pre[8] | (pre[9] << 8);
    hstart = 10;
  } else {  // v2/v3: 4-byte little-endian header length
    if (read_exact(fd, pre + 10, 2, base + 10) != 0) { close(fd); return -2; }
    hlen = static_cast<int64_t>(pre[8]) | (static_cast<int64_t>(pre[9]) << 8) |
           (static_cast<int64_t>(pre[10]) << 16) |
           (static_cast<int64_t>(pre[11]) << 24);
    hstart = 12;
  }
  if (hlen <= 0 || hlen > (1 << 20)) { close(fd); return -4; }
  std::string header(static_cast<size_t>(hlen), '\0');
  if (read_exact(fd, header.data(), static_cast<size_t>(hlen), base + hstart) != 0) {
    close(fd);
    return -2;
  }
  int rc = parse_header(header, out);
  if (rc == 0) {
    out->data_offset = base + hstart + hlen;
    struct stat st;
    if (fstat(fd, &st) != 0) rc = -2;
    else out->data_bytes = static_cast<int64_t>(st.st_size) - out->data_offset;
  }
  close(fd);
  return rc;
}

int stat_npy(const char* path, NpyHeader* out) {
  return stat_npy_at(path, 0, out);
}

inline uint16_t rd16(const unsigned char* p) {
  return static_cast<uint16_t>(p[0] | (p[1] << 8));
}
inline uint32_t rd32(const unsigned char* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}

int pread_whole(const char* path, int64_t offset, int64_t nbytes, void* out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  int rc = read_exact(fd, out, static_cast<size_t>(nbytes), offset);
  close(fd);
  return rc;
}

}  // namespace

extern "C" {

int am_npy_header_at(const char* path, int64_t base, char* descr,
                     int64_t* shape, int* ndim, int* fortran,
                     int64_t* data_offset, int64_t* data_bytes) {
  NpyHeader h;
  int rc = stat_npy_at(path, base, &h);
  if (rc != 0) return rc;
  std::memcpy(descr, h.descr, sizeof(h.descr));
  for (int i = 0; i < h.ndim; ++i) shape[i] = h.shape[i];
  *ndim = h.ndim;
  *fortran = h.fortran;
  *data_offset = h.data_offset;
  *data_bytes = h.data_bytes;
  return 0;
}

// Index an (uncompressed, np.savez-style) .npz: fill member names
// (NUL-padded 80-byte slots) and the file offset where each embedded .npy
// begins. Returns the member count, or a negative error. Members with a
// compression method other than STORE yield offset -1 (caller falls back).
int am_npz_index(const char* path, char* names, int64_t* npy_offsets,
                 int max_n) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -2; }
  int64_t fsize = st.st_size;
  if (fsize < 22) { close(fd); return -3; }

  // find the end-of-central-directory record (PK\x05\x06) in the tail
  int64_t tail_len = fsize < 66000 ? fsize : 66000;
  std::string tail(static_cast<size_t>(tail_len), '\0');
  if (read_exact(fd, tail.data(), static_cast<size_t>(tail_len),
                 fsize - tail_len) != 0) { close(fd); return -2; }
  int64_t eocd = -1;
  for (int64_t i = tail_len - 22; i >= 0; --i) {
    if (static_cast<unsigned char>(tail[i]) == 0x50 && tail[i + 1] == 0x4b &&
        tail[i + 2] == 0x05 && tail[i + 3] == 0x06) { eocd = i; break; }
  }
  if (eocd < 0) { close(fd); return -3; }
  const unsigned char* e =
      reinterpret_cast<const unsigned char*>(tail.data()) + eocd;
  int n_entries = rd16(e + 10);
  int64_t cd_size = rd32(e + 12);
  int64_t cd_off = rd32(e + 16);
  if (n_entries > max_n || cd_size <= 0) { close(fd); return -4; }

  std::string cd(static_cast<size_t>(cd_size), '\0');
  if (read_exact(fd, cd.data(), static_cast<size_t>(cd_size), cd_off) != 0) {
    close(fd);
    return -2;
  }
  const unsigned char* p = reinterpret_cast<const unsigned char*>(cd.data());
  const unsigned char* end = p + cd_size;
  int count = 0;
  while (count < n_entries && p + 46 <= end) {
    if (!(p[0] == 0x50 && p[1] == 0x4b && p[2] == 0x01 && p[3] == 0x02)) break;
    uint16_t method = rd16(p + 10);
    uint16_t nlen = rd16(p + 28);
    uint16_t xlen = rd16(p + 30);
    uint16_t clen = rd16(p + 32);
    uint32_t lho = rd32(p + 42);
    if (p + 46 + nlen > end || nlen >= 80) { close(fd); return -4; }
    std::memset(names + count * 80, 0, 80);
    std::memcpy(names + count * 80, p + 46, nlen);
    if (method != 0) {
      npy_offsets[count] = -1;
    } else {
      unsigned char lh[30];
      if (read_exact(fd, lh, 30, lho) != 0) { close(fd); return -2; }
      if (!(lh[0] == 0x50 && lh[1] == 0x4b && lh[2] == 0x03 && lh[3] == 0x04)) {
        close(fd);
        return -4;
      }
      npy_offsets[count] =
          static_cast<int64_t>(lho) + 30 + rd16(lh + 26) + rd16(lh + 28);
    }
    p += 46 + nlen + xlen + clen;
    ++count;
  }
  close(fd);
  return count;
}

int am_npy_header(const char* path, char* descr, int64_t* shape, int* ndim,
                  int* fortran, int64_t* data_offset, int64_t* data_bytes) {
  NpyHeader h;
  int rc = stat_npy(path, &h);
  if (rc != 0) return rc;
  std::memcpy(descr, h.descr, sizeof(h.descr));
  for (int i = 0; i < h.ndim; ++i) shape[i] = h.shape[i];
  *ndim = h.ndim;
  *fortran = h.fortran;
  *data_offset = h.data_offset;
  *data_bytes = h.data_bytes;
  return 0;
}

int am_pread_file(const char* path, int64_t offset, int64_t nbytes, void* out) {
  return pread_whole(path, offset, nbytes, out);
}

// Parallel fan-out: file i is pread(offsets[i], nbytes[i]) into outs[i].
// outs[i] may point into one contiguous batch buffer (stacked collate).
int am_batch_pread(int n, const char** paths, const int64_t* offsets,
                   const int64_t* nbytes, void** outs, int nthreads) {
  if (n <= 0) return 0;
  if (nthreads < 1) nthreads = 1;
  if (nthreads > n) nthreads = n;
  std::atomic<int> next(0);
  std::atomic<int> err(0);
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || err.load() != 0) return;
      int rc = pread_whole(paths[i], offsets[i], nbytes[i], outs[i]);
      if (rc != 0) err.store(rc);
    }
  };
  if (nthreads == 1) {
    work();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(static_cast<size_t>(nthreads));
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(work);
    for (auto& t : pool) t.join();
  }
  return err.load();
}

// Header-stat a batch of files in parallel (one syscall-bound pass); the
// Python side sizes its destination arrays from these without re-opening.
int am_batch_header(int n, const char** paths, char* descrs /*n*16*/,
                    int64_t* shapes /*n*8*/, int* ndims, int* fortrans,
                    int64_t* data_offsets, int64_t* data_bytes, int nthreads) {
  if (n <= 0) return 0;
  if (nthreads < 1) nthreads = 1;
  if (nthreads > n) nthreads = n;
  std::atomic<int> next(0);
  std::atomic<int> err(0);
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || err.load() != 0) return;
      NpyHeader h;
      int rc = stat_npy(paths[i], &h);
      if (rc != 0) { err.store(rc); return; }
      std::memcpy(descrs + i * 16, h.descr, sizeof(h.descr));
      for (int d = 0; d < h.ndim; ++d) shapes[i * 8 + d] = h.shape[d];
      ndims[i] = h.ndim;
      fortrans[i] = h.fortran;
      data_offsets[i] = h.data_offset;
      data_bytes[i] = h.data_bytes;
    }
  };
  if (nthreads == 1) {
    work();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(static_cast<size_t>(nthreads));
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(work);
    for (auto& t : pool) t.join();
  }
  return err.load();
}

}  // extern "C"

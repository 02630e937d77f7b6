// Native EXR scanline-block decoder/encoder hot loop.
//
// The framework's EXR codec (utils/exr.py) parses headers in Python and
// hands the byte-crunching to this translation unit: zlib inflate, the
// OpenEXR ZIP predictor (byte delta + half-split interleave), HALF/FLOAT
// conversion, and channel de/interleave. This is the data-loader
// equivalent of the reference stack's native image IO (Mitsuba Bitmap /
// freeimage, both C++): a real-capture dataset is hundreds of HDR
// images, and the pure-numpy path decodes ~20 MB/s while this one does
// the same work at memory bandwidth.
//
// C ABI only (ctypes binding in utils/exr.py) — no pybind11 in the image.
//
// Build: g++ -O3 -march=native -shared -fPIC exr_native.cpp -o exr_native.so -lz

#include <cstdint>
#include <cstring>
#include <vector>
#include <zlib.h>

namespace {

// half -> float conversion table, built on first use
float* half_table() {
  static float* table = [] {
    float* t = new float[65536];
    for (uint32_t h = 0; h < 65536; ++h) {
      uint32_t sign = (h >> 15) & 1u;
      uint32_t exp = (h >> 10) & 0x1fu;
      uint32_t mant = h & 0x3ffu;
      uint32_t f;
      if (exp == 0) {
        if (mant == 0) {
          f = sign << 31;
        } else {  // subnormal: normalize
          int e = -1;
          uint32_t m = mant;
          do {
            ++e;
            m <<= 1;
          } while ((m & 0x400u) == 0);
          f = (sign << 31) | ((127 - 15 - e) << 23) | ((m & 0x3ffu) << 13);
        }
      } else if (exp == 31) {
        f = (sign << 31) | 0x7f800000u | (mant << 13);  // inf/nan
      } else {
        f = (sign << 31) | ((exp - 15 + 127) << 23) | (mant << 13);
      }
      std::memcpy(&t[h], &f, 4);
    }
    return t;
  }();
  return table;
}

// undo the OpenEXR ZIP predictor in place: cumulative byte delta, then
// de-interleave the two halves
void unpredict(uint8_t* data, int64_t n, uint8_t* scratch) {
  uint8_t prev = data[0];
  for (int64_t i = 1; i < n; ++i) {
    prev = static_cast<uint8_t>(data[i] + prev - 128);
    data[i] = prev;
  }
  const int64_t half = (n + 1) / 2;
  uint8_t* s = scratch;
  const uint8_t* a = data;
  const uint8_t* b = data + half;
  int64_t ia = 0, ib = 0;
  for (int64_t i = 0; i < n; ++i) {
    s[i] = (i & 1) ? b[ib++] : a[ia++];
  }
  std::memcpy(data, s, n);
}

void apply_predictor(uint8_t* data, int64_t n, uint8_t* scratch) {
  // interleave -> halves, then byte delta (encoder side)
  const int64_t half = (n + 1) / 2;
  for (int64_t i = 0; i < n; ++i) {
    if (i & 1)
      scratch[half + i / 2] = data[i];
    else
      scratch[i / 2] = data[i];
  }
  uint8_t prev = scratch[0];
  data[0] = scratch[0];
  for (int64_t i = 1; i < n; ++i) {
    data[i] = static_cast<uint8_t>(scratch[i] - prev + 128);
    prev = scratch[i];
  }
}

}  // namespace

extern "C" {

// Decode all scanline blocks into per-channel float planes.
//   buf/buf_len: whole file; pos0: first block (offset table skipped)
//   chan_types[n_chan]: 0=UINT 1=HALF 2=FLOAT (file channel order)
//   comp: 0=NONE 2=ZIPS 3=ZIP
//   out: float[n_chan][h][w]
// Returns 0 on success, negative error code otherwise.
int exr_decode_blocks(const uint8_t* buf, int64_t buf_len, int64_t pos0,
                      int n_blocks, int lines_per_block, int h, int w,
                      int n_chan, const int* chan_types, int ymin, int comp,
                      float* out) {
  int64_t bytes_per_line = 0;
  for (int c = 0; c < n_chan; ++c)
    bytes_per_line += (chan_types[c] == 1 ? 2 : 4) * static_cast<int64_t>(w);

  const int64_t max_raw = bytes_per_line * lines_per_block;
  std::vector<uint8_t> raw(max_raw), scratch(max_raw);
  const float* htab = half_table();

  int64_t pos = pos0;
  for (int blk = 0; blk < n_blocks; ++blk) {
    if (pos + 8 > buf_len) return -1;
    int32_t y, size;
    std::memcpy(&y, buf + pos, 4);
    std::memcpy(&size, buf + pos + 4, 4);
    pos += 8;
    if (size < 0 || pos + size > buf_len) return -2;

    const int y0 = y - ymin;
    // A corrupt block y coordinate would otherwise index out of the
    // caller's planar buffer (dst = out + c*h*w + (y0+li)*w).
    if (y0 < 0 || y0 >= h) return -6;
    const int n_lines = (h - y0) < lines_per_block ? (h - y0) : lines_per_block;
    if (n_lines <= 0) return -6;
    const int64_t expect = bytes_per_line * n_lines;

    const uint8_t* src;
    if ((comp == 2 || comp == 3) && size < expect) {
      uLongf dst_len = static_cast<uLongf>(expect);
      if (uncompress(raw.data(), &dst_len, buf + pos, size) != Z_OK)
        return -3;
      if (static_cast<int64_t>(dst_len) != expect) return -4;
      unpredict(raw.data(), expect, scratch.data());
      src = raw.data();
    } else {
      if (size != expect) return -5;
      src = buf + pos;
    }
    pos += size;

    // channel-interleaved lines -> planar float
    int64_t lp = 0;
    for (int li = 0; li < n_lines; ++li) {
      float* row_base = out + static_cast<int64_t>(y0 + li) * w;
      for (int c = 0; c < n_chan; ++c) {
        float* dst = row_base + static_cast<int64_t>(c) * h * w;
        if (chan_types[c] == 1) {  // HALF
          const uint16_t* p = reinterpret_cast<const uint16_t*>(src + lp);
          for (int x = 0; x < w; ++x) dst[x] = htab[p[x]];
          lp += 2 * static_cast<int64_t>(w);
        } else if (chan_types[c] == 2) {  // FLOAT
          std::memcpy(dst, src + lp, 4 * static_cast<int64_t>(w));
          lp += 4 * static_cast<int64_t>(w);
        } else {  // UINT
          const uint32_t* p = reinterpret_cast<const uint32_t*>(src + lp);
          for (int x = 0; x < w; ++x) dst[x] = static_cast<float>(p[x]);
          lp += 4 * static_cast<int64_t>(w);
        }
      }
    }
  }
  return 0;
}

// Predictor+deflate one raw block (encoder hot loop). Returns compressed
// size written to dst (<= dst_cap), or -1 on error / incompressible
// (caller then stores the block raw).
int64_t exr_compress_block(uint8_t* raw, int64_t n, uint8_t* dst,
                           int64_t dst_cap) {
  std::vector<uint8_t> scratch(n);
  apply_predictor(raw, n, scratch.data());
  uLongf out_len = static_cast<uLongf>(dst_cap);
  if (compress2(dst, &out_len, raw, n, 4) != Z_OK) return -1;
  if (static_cast<int64_t>(out_len) >= n) return -1;
  return static_cast<int64_t>(out_len);
}

}  // extern "C"

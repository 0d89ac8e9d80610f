// Native batch RLE codec for salt_tpu.
//
// Column-major 1-indexed run-length encoding, byte-compatible with the
// reference's Python implementation (reference: common_blocks/utils.py:99-132)
// but ~100x faster: a single pass down each column with no Python object
// traffic. Exposed via ctypes (see salt_tpu/ops/rle.py).

#include <cstdint>
#include <cstring>

extern "C" {

// Encode one h x w row-major uint8 mask (nonzero = foreground) into
// (start, length) pairs in column-major 1-indexed pixel order.
// `out` must hold at least h*w+2 int64 values. Returns the number of
// int64 values written.
long long rle_encode(const uint8_t* mask, long long h, long long w,
                     long long* out) {
  long long n = 0;
  long long run_start = -1;  // 1-indexed position where current run began
  long long pos = 0;         // 0-indexed column-major position
  for (long long col = 0; col < w; ++col) {
    for (long long row = 0; row < h; ++row, ++pos) {
      const bool fg = mask[row * w + col] != 0;
      if (fg && run_start < 0) {
        run_start = pos + 1;
      } else if (!fg && run_start >= 0) {
        out[n++] = run_start;
        out[n++] = pos + 1 - run_start;
        run_start = -1;
      }
    }
  }
  if (run_start >= 0) {
    out[n++] = run_start;
    out[n++] = h * w + 1 - run_start;
  }
  return n;
}

// Decode (start, length) pairs into an h x w row-major uint8 mask.
void rle_decode(const long long* rle, long long n_pairs, long long h,
                long long w, uint8_t* out) {
  std::memset(out, 0, static_cast<size_t>(h * w));
  for (long long i = 0; i < n_pairs; ++i) {
    const long long start = rle[2 * i] - 1;      // to 0-indexed column-major
    const long long len = rle[2 * i + 1];
    for (long long p = start; p < start + len; ++p) {
      const long long col = p / h;
      const long long row = p % h;
      out[row * w + col] = 1;
    }
  }
}

}  // extern "C"

// Minimal 16-bit grayscale PNG decoder (TUM depth images) using zlib.
//
// Native replacement for per-frame PIL decoding on the data path: the
// host-side loader thread (data/stream.py) calls this through ctypes so
// Python never touches pixel bytes. Supports exactly the TUM depth profile:
// 8/16-bit grayscale (color type 0), no interlace; filters 0-4.

#include <zlib.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

uint32_t ReadBE32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) |
         uint32_t(p[3]);
}

int PaethPredictor(int a, int b, int c) {
  const int p = a + b - c;
  const int pa = p > a ? p - a : a - p;
  const int pb = p > b ? p - b : b - p;
  const int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool Unfilter(std::vector<uint8_t>& raw, int height, int stride, int bpp) {
  // raw: height * (1 + stride) filtered bytes, unfiltered in place to the
  // front (height * stride bytes).
  const uint8_t* src = raw.data();
  std::vector<uint8_t> out(static_cast<size_t>(height) * stride);
  for (int y = 0; y < height; ++y) {
    const uint8_t filter = src[static_cast<size_t>(y) * (stride + 1)];
    const uint8_t* in = src + static_cast<size_t>(y) * (stride + 1) + 1;
    uint8_t* cur = out.data() + static_cast<size_t>(y) * stride;
    const uint8_t* up = y > 0 ? cur - stride : nullptr;
    switch (filter) {
      case 0:
        std::memcpy(cur, in, stride);
        break;
      case 1:  // Sub
        for (int x = 0; x < stride; ++x)
          cur[x] = in[x] + (x >= bpp ? cur[x - bpp] : 0);
        break;
      case 2:  // Up
        for (int x = 0; x < stride; ++x) cur[x] = in[x] + (up ? up[x] : 0);
        break;
      case 3:  // Average
        for (int x = 0; x < stride; ++x) {
          const int a = x >= bpp ? cur[x - bpp] : 0;
          const int b = up ? up[x] : 0;
          cur[x] = in[x] + static_cast<uint8_t>((a + b) >> 1);
        }
        break;
      case 4:  // Paeth
        for (int x = 0; x < stride; ++x) {
          const int a = x >= bpp ? cur[x - bpp] : 0;
          const int b = up ? up[x] : 0;
          const int c = (up && x >= bpp) ? up[x - bpp] : 0;
          cur[x] = in[x] + static_cast<uint8_t>(PaethPredictor(a, b, c));
        }
        break;
      default:
        return false;
    }
  }
  raw.swap(out);
  return true;
}

}  // namespace

extern "C" {

// Reads the IHDR of a PNG. dims = {width, height, bit_depth, color_type}.
int png16_read_header(const char* path, int32_t* dims) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  uint8_t sig[8];
  if (std::fread(sig, 1, 8, f) != 8 || sig[0] != 0x89 || sig[1] != 'P') {
    std::fclose(f);
    return -2;
  }
  uint8_t hdr[25];
  if (std::fread(hdr, 1, 25, f) != 25 || std::memcmp(hdr + 4, "IHDR", 4) != 0) {
    std::fclose(f);
    return -3;
  }
  dims[0] = static_cast<int32_t>(ReadBE32(hdr + 8));
  dims[1] = static_cast<int32_t>(ReadBE32(hdr + 12));
  dims[2] = hdr[16];
  dims[3] = hdr[17];
  std::fclose(f);
  return 0;
}

// Decodes a grayscale PNG into a caller-allocated uint16 buffer
// (width*height). 8-bit inputs are widened. Returns 0 on success.
// expect_w/expect_h > 0 demand the file match those dims (-9 otherwise):
// the caller sized the buffer, and a larger file would overflow it.
static int DecodeImpl(const char* path, uint16_t* out, int expect_w,
                      int expect_h) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(size);
  if (std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return -2;
  }
  std::fclose(f);
  if (size < 45 || buf[0] != 0x89) return -3;

  int width = 0, height = 0, bit_depth = 0, color_type = -1;
  std::vector<uint8_t> idat;
  size_t pos = 8;
  while (pos + 12 <= static_cast<size_t>(size)) {
    const uint32_t len = ReadBE32(&buf[pos]);
    const uint8_t* type = &buf[pos + 4];
    const uint8_t* data = &buf[pos + 8];
    if (std::memcmp(type, "IHDR", 4) == 0) {
      width = static_cast<int>(ReadBE32(data));
      height = static_cast<int>(ReadBE32(data + 4));
      bit_depth = data[8];
      color_type = data[9];
      if (color_type != 0 || (bit_depth != 8 && bit_depth != 16)) return -4;
      if (data[12] != 0) return -5;  // interlaced unsupported
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), data, data + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (width <= 0 || height <= 0 || idat.empty()) return -6;
  if (expect_w > 0 && (width != expect_w || height != expect_h)) return -9;

  const int bpp = bit_depth / 8;
  const int stride = width * bpp;
  std::vector<uint8_t> raw(static_cast<size_t>(height) * (stride + 1));
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size()) {
    return -7;
  }
  if (!Unfilter(raw, height, stride, bpp)) return -8;

  const size_t n = static_cast<size_t>(width) * height;
  if (bit_depth == 16) {
    for (size_t i = 0; i < n; ++i) {
      out[i] = static_cast<uint16_t>((raw[2 * i] << 8) | raw[2 * i + 1]);
    }
  } else {
    for (size_t i = 0; i < n; ++i) out[i] = raw[i];
  }
  return 0;
}

int png16_decode(const char* path, uint16_t* out) {
  return DecodeImpl(path, out, 0, 0);
}

// Thread-pooled batch decode: `count` newline-joined paths into one
// caller-allocated (count, height, width) uint16 buffer, with optional
// u16 -> f32 meters conversion (scale > 0 writes to out_f32 instead).
// The TUM replay data loader: decoding dominates host-side ingest, so it
// fans out across hardware threads here and Python never touches pixels.
// Returns 0 on success, else -(1 + index of the first failing file).
int png16_decode_batch(const char* joined_paths, int32_t count,
                       int32_t height, int32_t width, uint16_t* out_u16,
                       float* out_f32, float scale) {
  std::vector<std::string> paths;
  paths.reserve(count);
  {
    const char* p = joined_paths;
    for (int i = 0; i < count; ++i) {
      const char* nl = std::strchr(p, '\n');
      if (!nl) {
        paths.emplace_back(p);
        break;
      }
      paths.emplace_back(p, nl - p);
      p = nl + 1;
    }
  }
  // Sentinel outside the -(1 + index) range so it can never collide with a
  // per-file failure code.
  if (static_cast<int32_t>(paths.size()) != count) return INT32_MIN;

  const size_t frame = static_cast<size_t>(height) * width;
  std::vector<int> errs(count, 0);
  const unsigned n_threads =
      std::max(1u, std::min(std::thread::hardware_concurrency(),
                            static_cast<unsigned>(count)));
  std::vector<std::thread> pool;
  std::atomic<int32_t> next(0);
  for (unsigned t = 0; t < n_threads; ++t) {
    pool.emplace_back([&]() {
      std::vector<uint16_t> tmp;
      for (int32_t i = next.fetch_add(1); i < count; i = next.fetch_add(1)) {
        uint16_t* dst = out_u16 ? out_u16 + frame * i : nullptr;
        if (!dst) {
          tmp.resize(frame);
          dst = tmp.data();
        }
        // Size-checked: a file whose IHDR exceeds the caller-assumed
        // (height, width) would write past its fixed-stride slot (heap
        // overflow); mixed-resolution batches fail with -9 instead.
        const int rc = DecodeImpl(paths[i].c_str(), dst, width, height);
        if (rc != 0) {
          errs[i] = rc;
          continue;
        }
        if (out_f32 && scale > 0.0f) {
          float* fd = out_f32 + frame * i;
          for (size_t k = 0; k < frame; ++k) fd[k] = dst[k] / scale;
        }
      }
    });
  }
  for (auto& th : pool) th.join();
  for (int i = 0; i < count; ++i) {
    if (errs[i] != 0) return -(1 + i);
  }
  return 0;
}

}  // extern "C"

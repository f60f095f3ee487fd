// RSC clip codec: native decoder/encoder for the framework's recorded-clip
// format (see realsensetracker_tpu/data/recorded.py for the layout spec).
//
// This is the TPU framework's native data-loader, standing in for the
// reference's librealsense capture + protobuf serde (rs_driver.cpp,
// rs_viewer.cpp:105-112): bulk u16->f32 depth conversion happens here in
// C++ with threads, off the Python hot path, feeding the host->device
// streamer.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr char kMagic[8] = {'R', 'S', 'C', 'L', 'I', 'P', '0', '1'};
constexpr int kDtypeU16Mm = 0;
constexpr int kDtypeF32M = 1;

struct Header {
  int32_t num_frames;
  int32_t height;
  int32_t width;
  int32_t dtype;
  float intr[4];  // fx, fy, cx, cy
};

bool ReadHeader(std::FILE* f, Header* h) {
  char magic[8];
  if (std::fread(magic, 1, 8, f) != 8) return false;
  if (std::memcmp(magic, kMagic, 8) != 0) return false;
  if (std::fread(&h->num_frames, 4, 4, f) != 4) return false;
  if (std::fread(h->intr, 4, 4, f) != 4) return false;
  return true;
}

void ConvertU16Block(const uint16_t* src, float* dst, int64_t n) {
  // Divide (not multiply-by-reciprocal): bit-exact with the Python
  // fallback reader's astype(float32)/1000.0.
  for (int64_t i = 0; i < n; ++i) dst[i] = src[i] / 1000.0f;
}

}  // namespace

extern "C" {

// Reads header fields. Returns 0 on success, negative error code otherwise.
int rsc_read_header(const char* path, int32_t* dims /*4: F,H,W,dtype*/,
                    float* intr /*4*/) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  Header h;
  if (!ReadHeader(f, &h)) {
    std::fclose(f);
    return -2;
  }
  dims[0] = h.num_frames;
  dims[1] = h.height;
  dims[2] = h.width;
  dims[3] = h.dtype;
  std::memcpy(intr, h.intr, 4 * sizeof(float));
  std::fclose(f);
  return 0;
}

// Reads all frames into caller-allocated buffers:
//   stamps: num_frames doubles; depths: num_frames*H*W floats (meters).
// Multi-threaded u16->f32 conversion. Returns 0 on success.
int rsc_read_frames(const char* path, double* stamps, float* depths,
                    int num_threads) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  Header h;
  if (!ReadHeader(f, &h)) {
    std::fclose(f);
    return -2;
  }
  const int64_t count = static_cast<int64_t>(h.num_frames);
  const int64_t pixels = static_cast<int64_t>(h.height) * h.width;
  if (std::fread(stamps, 8, count, f) != static_cast<size_t>(count)) {
    std::fclose(f);
    return -3;
  }
  const int64_t total = count * pixels;
  if (h.dtype == kDtypeF32M) {
    const size_t got = std::fread(depths, 4, total, f);
    std::fclose(f);
    return got == static_cast<size_t>(total) ? 0 : -4;
  }
  if (h.dtype != kDtypeU16Mm) {
    std::fclose(f);
    return -5;
  }
  std::vector<uint16_t> raw(total);
  const size_t got = std::fread(raw.data(), 2, total, f);
  std::fclose(f);
  if (got != static_cast<size_t>(total)) return -4;

  int nt = num_threads > 0 ? num_threads
                           : static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (nt == 1 || total < (1 << 20)) {
    ConvertU16Block(raw.data(), depths, total);
    return 0;
  }
  std::vector<std::thread> workers;
  const int64_t chunk = (total + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    const int64_t begin = t * chunk;
    const int64_t end = begin + chunk < total ? begin + chunk : total;
    if (begin >= end) break;
    workers.emplace_back(ConvertU16Block, raw.data() + begin, depths + begin,
                         end - begin);
  }
  for (auto& w : workers) w.join();
  return 0;
}

// Writes a clip from float32 meter depths as u16 millimeters.
int rsc_write_clip(const char* path, const double* stamps, const float* depths,
                   int32_t num_frames, int32_t height, int32_t width,
                   const float* intr /*4*/) {
  std::FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::fwrite(kMagic, 1, 8, f);
  int32_t dims[4] = {num_frames, height, width, kDtypeU16Mm};
  std::fwrite(dims, 4, 4, f);
  std::fwrite(intr, 4, 4, f);
  std::fwrite(stamps, 8, num_frames, f);
  const int64_t total = static_cast<int64_t>(num_frames) * height * width;
  std::vector<uint16_t> mm(total);
  for (int64_t i = 0; i < total; ++i) {
    float v = depths[i] * 1000.0f + 0.5f;
    if (v < 0.0f) v = 0.0f;
    if (v > 65535.0f) v = 65535.0f;
    mm[i] = static_cast<uint16_t>(v);
  }
  std::fwrite(mm.data(), 2, total, f);
  std::fclose(f);
  return 0;
}

}  // extern "C"

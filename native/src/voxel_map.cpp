// Host-side voxel-hash world model: native CloudAccumulator.
//
// C++ equivalent of the reference's CloudAccumulator
// (rs_replay_app.cpp:76-129) for host-resident maps that outgrow the
// device-resident fixed-capacity accumulator
// (realsensetracker_tpu/tracking/accumulator.py). Same semantics:
// truncation voxel indexing (GetVoxelIndex, :109-111) and
// first-insert-wins (AddCloud, :95-107). Opaque handle API over ctypes.

#include <array>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Key {
  int32_t x, y, z;
  bool operator==(const Key& o) const { return x == o.x && y == o.y && z == o.z; }
};

struct KeyHash {
  size_t operator()(const Key& k) const {
    // FNV-style mix of the three coordinates.
    size_t h = 1469598103934665603ull;
    for (int32_t v : {k.x, k.y, k.z}) {
      h ^= static_cast<uint32_t>(v);
      h *= 1099511628211ull;
    }
    return h;
  }
};

struct VoxelMap {
  float voxel_size;
  float inv_voxel_size;
  std::unordered_map<Key, std::array<float, 3>, KeyHash> map;
};

}  // namespace

extern "C" {

void* voxel_map_create(float voxel_size) {
  auto* m = new VoxelMap;
  m->voxel_size = voxel_size;
  m->inv_voxel_size = 1.0f / voxel_size;
  return m;
}

void voxel_map_destroy(void* handle) { delete static_cast<VoxelMap*>(handle); }

// Insert n points (row-major n x 3) after applying the 4x4 row-major
// transform; existing voxel entries win (first-insert semantics).
void voxel_map_add(void* handle, const float* transform, const float* points,
                   int64_t n) {
  auto* m = static_cast<VoxelMap*>(handle);
  const float* T = transform;
  for (int64_t i = 0; i < n; ++i) {
    const float* p = points + 3 * i;
    float w[3];
    for (int r = 0; r < 3; ++r) {
      w[r] = T[4 * r + 0] * p[0] + T[4 * r + 1] * p[1] + T[4 * r + 2] * p[2] +
             T[4 * r + 3];
    }
    // C-style truncation, matching GetVoxelIndex (rs_replay_app.cpp:109-111).
    const Key key{static_cast<int32_t>(w[0] * m->inv_voxel_size),
                  static_cast<int32_t>(w[1] * m->inv_voxel_size),
                  static_cast<int32_t>(w[2] * m->inv_voxel_size)};
    m->map.emplace(key, std::array<float, 3>{{w[0], w[1], w[2]}});
  }
}

int64_t voxel_map_size(void* handle) {
  return static_cast<int64_t>(static_cast<VoxelMap*>(handle)->map.size());
}

// Copy up to capacity points into out (capacity x 3). Returns count copied.
int64_t voxel_map_extract(void* handle, float* out, int64_t capacity) {
  auto* m = static_cast<VoxelMap*>(handle);
  int64_t i = 0;
  for (const auto& kv : m->map) {
    if (i >= capacity) break;
    std::memcpy(out + 3 * i, kv.second.data(), 3 * sizeof(float));
    ++i;
  }
  return i;
}

}  // extern "C"

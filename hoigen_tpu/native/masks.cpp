// Anti-aliased box mask rasterization — C++ CPU reference implementation.
//
// Mirrors the semantics of the reference's only native component
// (/root/reference/pocket/csrc/masks.cpp GenerateMasks): the coverage of a
// pixel by a float box, with fractional weights on boundary rows/columns.
// The production path is the JAX implementation in hoigen_tpu/ops/masks.py;
// this library exists for cross-checking (loaded via ctypes, no torch).
//
// Build: make -C hoigen_tpu/native
#include <algorithm>
#include <cmath>

extern "C" {

// boxes: n x 4 floats (x1, y1, x2, y2); out: n x h x w floats (zeroed by caller
// or overwritten here fully).
void generate_masks(const float* boxes, int n, int h, int w, float* out) {
  for (int i = 0; i < n; ++i) {
    const float x1 = boxes[i * 4 + 0];
    const float y1 = boxes[i * 4 + 1];
    const float x2 = boxes[i * 4 + 2];
    const float y2 = boxes[i * 4 + 3];
    float* m = out + static_cast<long>(i) * h * w;
    for (int r = 0; r < h; ++r) {
      const float wy = std::min(std::max(
          std::min(static_cast<float>(r) + 1.0f, y2) -
              std::max(static_cast<float>(r), y1), 0.0f), 1.0f);
      for (int c = 0; c < w; ++c) {
        const float wx = std::min(std::max(
            std::min(static_cast<float>(c) + 1.0f, x2) -
                std::max(static_cast<float>(c), x1), 0.0f), 1.0f);
        m[r * w + c] = wy * wx;
      }
    }
  }
}

}  // extern "C"

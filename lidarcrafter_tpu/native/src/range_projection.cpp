// Native host-side range projection — the data loader's hot per-sample
// transform.  Port of ops/projection.py::points_to_range_image semantics
// (itself mirroring lidargen/dataset/transforms_3d/common.py:26-91): per
// pixel the closest real point wins, ties broken by point order; ALL points
// scatter (also out-of-depth-range ones) with validity recorded in the last
// channel.
//
// Why native: the jitted jnp projection recompiles for every distinct point
// count N (nuScenes sweeps vary per sample) and, when the default backend is
// a remote TPU tunnel, round-trips every __getitem__ through it.  This C++
// kernel runs on the host for any N with no compile, and releases the GIL so
// the threaded PrefetchLoader (native/loader.py) overlaps IO + projection
// across workers — the TPU-native counterpart of the reference's
// multi-worker torch DataLoader (tools/train/train_lidm.py:125).
//
// Float32 math mirrors the jnp formula order so winners agree bit-for-bit
// except for sub-ulp transcendental differences at floor() cell boundaries
// (measure-zero for real clouds; bounded in tests).

#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

extern "C" {

// pts: (n, c) row-major float32, c >= 3 ([x, y, z, feat...]).
// out: (H, W, c+2) float32, caller-allocated, ZEROED by caller.
// Channels: [x, y, z, feat..., depth, valid].
void project_range_image(const float* pts, int64_t n, int64_t c, int64_t H,
                         int64_t W, float min_depth, float max_depth,
                         double fov_up_deg, double fov_down_deg, float* out) {
  const double rad = M_PI / 180.0;
  // python: math.radians in f64; scalars cast to f32 at first use with
  // f32 arrays (jnp weak typing) — reproduce that cast structure
  const float span = (float)(fov_up_deg * rad - fov_down_deg * rad);
  const float a_down = (float)fabs(fov_down_deg * rad);
  const float pi_f = (float)M_PI;

  std::vector<int64_t> best(H * W, -1);
  std::vector<float> bestd(H * W, std::numeric_limits<float>::infinity());
  std::vector<float> depths((size_t)n);

  for (int64_t i = 0; i < n; ++i) {
    const float x = pts[i * c + 0];
    const float y = pts[i * c + 1];
    const float z = pts[i * c + 2];
    const float depth = sqrtf(x * x + y * y + z * z);
    depths[(size_t)i] = depth;

    float elev = asinf(z / (depth + 1e-6f)) + a_down;
    float gh = floorf((1.0f - elev / span) * (float)H);
    int64_t ih = gh < 0.0f ? 0 : (gh > (float)(H - 1) ? H - 1 : (int64_t)gh);

    float az = -atan2f(y, x);
    float gw = (az / pi_f + 1.0f) / 2.0f;
    gw = gw - floorf(gw);  // mod 1 (matches jnp % 1 for finite inputs)
    gw = floorf(gw * (float)W);
    int64_t iw = gw < 0.0f ? 0 : (gw > (float)(W - 1) ? W - 1 : (int64_t)gw);

    const int64_t p = ih * W + iw;
    if (depth < bestd[(size_t)p]) {  // strict <: ties keep the earlier point
      bestd[(size_t)p] = depth;
      best[(size_t)p] = i;
    }
  }

  const int64_t C = c + 2;
  for (int64_t p = 0; p < H * W; ++p) {
    const int64_t i = best[(size_t)p];
    if (i < 0) continue;
    float* o = out + p * C;
    for (int64_t k = 0; k < c; ++k) o[k] = pts[i * c + k];
    const float d = depths[(size_t)i];
    o[c] = d;
    o[c + 1] = (d >= min_depth && d <= max_depth) ? 1.0f : 0.0f;
  }
}

}  // extern "C"

// Native data-path kernels for TSUE-TPU host-side preprocessing.
//
// The reference's startup hot loop is a pure-Python per-track scan
// (ref scripts/train.py:114-259): abnormality filtering plus a sliding
// window pass computing per-window min/max, the range_x gate, and [0,1]
// normalization.  These are the numeric inner loops, implemented here as a
// small C++ library with a C ABI consumed via ctypes (no pybind11 in the
// image).  Text/regex/tokenization stay in Python.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>

extern "C" {

// Abnormality filter (parity with scripts/train.py:89-108):
// returns 1 if any step distance > max_step, any |speed delta| >
// max_speed_diff, or x-monotonicity violates the direction
// (dir: 0 = none, 1 = R2L (x non-increasing), 2 = L2R (x non-decreasing)).
int tsue_is_abnormal(const float* traj /* (n,2) row-major */, int64_t n,
                     float max_step, float max_speed_diff, int dir) {
  if (n < 2) return 0;
  float prev_dist = -1.0f;
  for (int64_t i = 1; i < n; ++i) {
    const float dx = traj[2 * i] - traj[2 * (i - 1)];
    const float dy = traj[2 * i + 1] - traj[2 * (i - 1) + 1];
    const float dist = std::sqrt(dx * dx + dy * dy);
    if (dist > max_step) return 1;
    if (prev_dist >= 0.0f && std::fabs(dist - prev_dist) > max_speed_diff)
      return 1;
    prev_dist = dist;
    if (dir == 1 && traj[2 * i] > traj[2 * (i - 1)]) return 1;
    if (dir == 2 && traj[2 * i] < traj[2 * (i - 1)]) return 1;
  }
  return 0;
}

// Sliding-window build (parity with scripts/train.py:158-184):
// for each window start (stride steps over the downsampled track), compute
// min/max over the FULL (in+out) window, skip windows with
// range_x < min_range_x, normalize both halves to [0,1] and write
//   in_out  : (max_windows, 2, seq_len)   channel-major (x row, y row)
//   out_out : (max_windows, 2, out_len)
//   stat_out: (max_windows, 4)            [min_x, max_x, min_y, max_y]
//   starts_out: (max_windows,)             window start indices
// Returns the number of windows written (<= max_windows).
int64_t tsue_build_windows(const float* traj, int64_t n, int64_t seq_len,
                           int64_t out_len, int64_t stride,
                           float min_range_x, float* in_out, float* out_out,
                           float* stat_out, int64_t* starts_out,
                           int64_t max_windows) {
  const int64_t win = seq_len + out_len;
  if (n < win || max_windows <= 0) return 0;
  int64_t count = 0;
  for (int64_t start = 0; start + win <= n; start += stride) {
    float min_x = traj[2 * start], max_x = min_x;
    float min_y = traj[2 * start + 1], max_y = min_y;
    for (int64_t i = 1; i < win; ++i) {
      const float x = traj[2 * (start + i)];
      const float y = traj[2 * (start + i) + 1];
      if (x < min_x) min_x = x;
      if (x > max_x) max_x = x;
      if (y < min_y) min_y = y;
      if (y > max_y) max_y = y;
    }
    float range_x = max_x - min_x;
    float range_y = max_y - min_y;
    if (range_x < min_range_x) continue;
    if (std::fabs(range_x) < 1e-6f) range_x = 1.0f;
    if (std::fabs(range_y) < 1e-6f) range_y = 1.0f;

    float* in_x = in_out + count * 2 * seq_len;
    float* in_y = in_x + seq_len;
    for (int64_t i = 0; i < seq_len; ++i) {
      in_x[i] = (traj[2 * (start + i)] - min_x) / range_x;
      in_y[i] = (traj[2 * (start + i) + 1] - min_y) / range_y;
    }
    float* ot_x = out_out + count * 2 * out_len;
    float* ot_y = ot_x + out_len;
    for (int64_t i = 0; i < out_len; ++i) {
      ot_x[i] = (traj[2 * (start + seq_len + i)] - min_x) / range_x;
      ot_y[i] = (traj[2 * (start + seq_len + i) + 1] - min_y) / range_y;
    }
    float* st = stat_out + count * 4;
    st[0] = min_x; st[1] = max_x; st[2] = min_y; st[3] = max_y;
    starts_out[count] = start;
    ++count;
    if (count >= max_windows) break;
  }
  return count;
}

}  // extern "C"

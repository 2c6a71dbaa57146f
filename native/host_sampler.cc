// Native host-side data path: triplet patch sampling + patch extraction.
//
// The training hot loop's host work is drawing valid anchor pixels and
// slicing (B, ps, ps) patch triplets every step (behavioral spec:
// reference src/datagenerator.py:137-216 — anchors resampled while the GT
// disparity is inf or occluded (int(gt) > col); positive column =
// col - int(gt) + U(-pos, pos), negative = +- U(neg_lo, neg_hi), both
// truncated toward zero and rejected outside [0, W)). The vectorized
// NumPy sampler (mccnn_tpu/data/sampler.py) is the portable path; this
// C++ implementation removes the remaining per-step host overhead for
// production input pipelines and is loaded via ctypes with automatic
// fallback (mccnn_tpu/native/__init__.py).
//
// Build: `make -C native` (produces libmccnn_host.so).

#include <cmath>
#include <cstdint>
#include <random>
#include <vector>

namespace {

// Truncate toward zero, like Python2 int() / C casts.
inline int64_t trunc_to_int(double v) { return static_cast<int64_t>(v); }

}  // namespace

namespace {

// Draw `count` DISTINCT values from [0, n) — the head of a Fisher-Yates
// partial shuffle. This reproduces the reference's anchor-proposal scheme
// (initial rows/cols are np.random.permutation heads, so within one batch
// the proposals are duplicate-free; reference src/datagenerator.py:162-163)
// so the native and NumPy backends sample from the same distribution.
void partial_permutation(std::mt19937_64& rng, int64_t n, int64_t count,
                         std::vector<int64_t>& out) {
  std::vector<int64_t> pool(n);
  for (int64_t i = 0; i < n; ++i) pool[i] = i;
  out.resize(count);
  for (int64_t i = 0; i < count; ++i) {
    std::uniform_int_distribution<int64_t> pick(i, n - 1);
    std::swap(pool[i], pool[pick(rng)]);
    out[i] = pool[i];
  }
}

}  // namespace

extern "C" {

// Fills rows/cols/pos_cols/neg_cols (each batch-sized) with a sampled
// batch satisfying the reference's rejection rules. Initial anchor
// proposals are distinct row/column permutation heads (like the reference
// and the NumPy backend); invalid anchors are resampled uniformly.
// Returns 0 on success, 1 if an infinite rejection loop was detected
// (no valid anchors), 2 if batch exceeds height or width (permutation
// proposals need that many distinct values).
int mccnn_sample_triplets(
    const float* gt, int64_t height, int64_t width,
    int64_t batch, uint64_t seed,
    double pos_dev, double neg_low, double neg_high,
    int64_t* rows, int64_t* cols, int64_t* pos_cols, int64_t* neg_cols) {
  if (batch > height || batch > width) return 2;
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int64_t> rand_row(0, height - 1);
  std::uniform_int_distribution<int64_t> rand_col(0, width - 1);
  std::uniform_real_distribution<double> upos(-pos_dev, pos_dev);
  std::uniform_real_distribution<double> uneg(neg_low, neg_high);
  std::uniform_int_distribution<int> coin(0, 1);

  std::vector<int64_t> row_prop, col_prop;
  partial_permutation(rng, height, batch, row_prop);
  partial_permutation(rng, width, batch, col_prop);

  for (int64_t b = 0; b < batch; ++b) {
    int64_t r = row_prop[b];
    int64_t c = col_prop[b];
    // reject inf-disparity and occluded anchors
    int64_t guard = 0;
    while (true) {
      const float g = gt[r * width + c];
      const bool invalid =
          !std::isfinite(g) || static_cast<int64_t>(g) > c;
      if (!invalid) break;
      if (++guard > height * width * 16) return 1;
      r = rand_row(rng);
      c = rand_col(rng);
    }
    rows[b] = r;
    cols[b] = c;

    const int64_t base = c - static_cast<int64_t>(gt[r * width + c]);
    int64_t pc = -1;
    while (pc < 0 || pc >= width) pc = trunc_to_int(base + upos(rng));
    pos_cols[b] = pc;

    int64_t nc = -1;
    while (nc < 0 || nc >= width) {
      double dev = uneg(rng);
      if (coin(rng) == 0) dev = -dev;
      nc = trunc_to_int(base + dev);
    }
    neg_cols[b] = nc;
  }
  return 0;
}

// Extracts (batch, ps, ps) patches centered at (rows[b], cols[b]) from a
// zero-padded view of image (H, W): out-of-image samples are 0, matching
// the reference's zero-padded augmentation (src/datagenerator.py:173-182).
void mccnn_extract_patches(
    const float* image, int64_t height, int64_t width,
    const int64_t* rows, const int64_t* cols, int64_t batch,
    int64_t patch, float* out) {
  const int64_t radius = (patch - 1) / 2;
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t r0 = rows[b] - radius;
    const int64_t c0 = cols[b] - radius;
    float* dst = out + b * patch * patch;
    for (int64_t i = 0; i < patch; ++i) {
      const int64_t r = r0 + i;
      for (int64_t j = 0; j < patch; ++j) {
        const int64_t c = c0 + j;
        const bool in =
            (r >= 0) && (r < height) && (c >= 0) && (c < width);
        dst[i * patch + j] = in ? image[r * width + c] : 0.0f;
      }
    }
  }
}

}  // extern "C"

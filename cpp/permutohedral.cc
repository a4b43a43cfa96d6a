#include "permutohedral.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <unordered_map>

namespace permutohedral {
namespace {

// Hash for a lattice key of d int16 coordinates packed into a vector.
struct KeyHash {
  size_t operator()(const std::vector<int16_t>& k) const {
    size_t h = 14695981039346656037ull;
    for (int16_t v : k) {
      h ^= static_cast<uint16_t>(v);
      h *= 1099511628211ull;
    }
    return h;
  }
};

}  // namespace

Lattice::Lattice(const float* positions, int n, int d) : n_(n), d_(d) {
  const int dp1 = d + 1;
  vertex_.resize(static_cast<size_t>(n) * dp1);
  barycentric_.resize(static_cast<size_t>(n) * dp1);

  // Scale factors for the elevation E: makes the lattice's Voronoi cells
  // unit-variance Gaussians after the [1 2 1] blur.
  std::vector<float> scale(d);
  // invStdDev = (d+1)*sqrt(2/3): makes the d+1 [1 2 1] blur passes
  // equivalent to a unit-variance Gaussian in the input space.
  const float inv_std = (d + 1) * std::sqrt(2.0f / 3.0f);
  for (int i = 0; i < d; ++i) {
    scale[i] = inv_std / std::sqrt((float)(i + 1) * (i + 2));
  }

  std::unordered_map<std::vector<int16_t>, int32_t, KeyHash> table;
  std::vector<std::vector<int16_t>> keys;

  std::vector<float> elevated(dp1);
  std::vector<int16_t> greedy(dp1), key(d);
  std::vector<int> rank(dp1);
  std::vector<float> bary(dp1 + 1);

  for (int p = 0; p < n; ++p) {
    const float* pos = positions + static_cast<size_t>(p) * d;

    // Elevate to the hyperplane sum(x)=0 in R^{d+1} (E * pos).
    // Standard O(d) recurrence.
    float sm = 0.0f;
    for (int i = d; i > 0; --i) {
      float cf = pos[i - 1] * scale[i - 1];
      elevated[i] = sm - i * cf;
      sm += cf;
    }
    elevated[0] = sm;

    // Greedy nearest remainder-0 lattice point.
    const float down = 1.0f / dp1;
    int sum = 0;
    for (int i = 0; i <= d; ++i) {
      float v = elevated[i] * down;
      int up_r = (int)std::ceil(v) * dp1;
      int down_r = (int)std::floor(v) * dp1;
      greedy[i] = (int16_t)((up_r - elevated[i] < elevated[i] - down_r)
                                ? up_r : down_r);
      sum += greedy[i];
    }
    sum /= dp1;

    // Rank differential coordinates to walk back onto the sum-0 plane.
    for (int i = 0; i <= d; ++i) rank[i] = 0;
    for (int i = 0; i < d; ++i) {
      for (int j = i + 1; j <= d; ++j) {
        double di = elevated[i] - greedy[i];
        double dj = elevated[j] - greedy[j];
        if (di < dj) ++rank[i];
        else ++rank[j];
      }
    }
    if (sum > 0) {
      for (int i = 0; i <= d; ++i) {
        if (rank[i] >= dp1 - sum) {
          greedy[i] -= (int16_t)dp1;
          rank[i] += sum - dp1;
        } else {
          rank[i] += sum;
        }
      }
    } else if (sum < 0) {
      for (int i = 0; i <= d; ++i) {
        if (rank[i] < -sum) {
          greedy[i] += (int16_t)dp1;
          rank[i] += sum + dp1;
        } else {
          rank[i] += sum;
        }
      }
    }

    // Barycentric coordinates inside the simplex.
    for (int i = 0; i <= d + 1; ++i) bary[i] = 0.0f;
    for (int i = 0; i <= d; ++i) {
      float delta = (elevated[i] - greedy[i]) * down;
      bary[d - rank[i]] += delta;
      bary[d + 1 - rank[i]] -= delta;
    }
    bary[0] += 1.0f + bary[d + 1];

    // Register the d+1 enclosing simplex vertices in the hash table.
    for (int remainder = 0; remainder <= d; ++remainder) {
      for (int i = 0; i < d; ++i) {
        int16_t coord = greedy[i];
        if (rank[i] > d - remainder) coord -= (int16_t)dp1;
        key[i] = (int16_t)(coord + remainder);
      }
      auto it = table.find(key);
      int32_t idx;
      if (it == table.end()) {
        idx = (int32_t)keys.size();
        table.emplace(key, idx);
        keys.push_back(key);
      } else {
        idx = it->second;
      }
      vertex_[(size_t)p * dp1 + remainder] = idx;
      barycentric_[(size_t)p * dp1 + remainder] = bary[remainder];
    }
  }

  // Precompute blur neighbors along each lattice axis.
  const int m = (int)keys.size();
  offsets_.resize(m);
  blur_pos_.assign((size_t)m * dp1, -1);
  blur_neg_.assign((size_t)m * dp1, -1);
  std::vector<int16_t> nkey(d);
  for (int j = 0; j <= d; ++j) {
    for (int i = 0; i < m; ++i) {
      const std::vector<int16_t>& k = keys[i];
      // Neighbor in +axis j: all coords +1 except coord j, which is -d.
      for (int c = 0; c < d; ++c) nkey[c] = (int16_t)(k[c] + 1);
      if (j < d) nkey[j] = (int16_t)(k[j] - d);
      auto it = table.find(nkey);
      blur_pos_[(size_t)i * dp1 + j] = (it == table.end()) ? -1 : it->second;

      for (int c = 0; c < d; ++c) nkey[c] = (int16_t)(k[c] - 1);
      if (j < d) nkey[j] = (int16_t)(k[j] + d);
      it = table.find(nkey);
      blur_neg_[(size_t)i * dp1 + j] = (it == table.end()) ? -1 : it->second;
    }
  }
}

void Lattice::compute(const float* in, float* out, int value_dim,
                      bool reverse) const {
  const int dp1 = d_ + 1;
  const int m = (int)offsets_.size();
  std::vector<float> values((size_t)m * value_dim, 0.0f);
  std::vector<float> new_values((size_t)m * value_dim, 0.0f);

  // Splat.
  for (int p = 0; p < n_; ++p) {
    for (int r = 0; r <= d_; ++r) {
      int32_t vi = vertex_[(size_t)p * dp1 + r];
      float w = barycentric_[(size_t)p * dp1 + r];
      float* dst = values.data() + (size_t)vi * value_dim;
      const float* src = in + (size_t)p * value_dim;
      for (int c = 0; c < value_dim; ++c) dst[c] += w * src[c];
    }
  }

  // Blur along each axis ([1 2 1] kernel on lattice neighbors).
  for (int pass = 0; pass <= d_; ++pass) {
    int j = reverse ? d_ - pass : pass;
    for (int i = 0; i < m; ++i) {
      const float* self = values.data() + (size_t)i * value_dim;
      int32_t np = blur_pos_[(size_t)i * dp1 + j];
      int32_t nn = blur_neg_[(size_t)i * dp1 + j];
      const float* vp = (np >= 0) ? values.data() + (size_t)np * value_dim
                                  : nullptr;
      const float* vn = (nn >= 0) ? values.data() + (size_t)nn * value_dim
                                  : nullptr;
      float* dst = new_values.data() + (size_t)i * value_dim;
      for (int c = 0; c < value_dim; ++c) {
        float acc = 2.0f * self[c];
        if (vp) acc += vp[c];
        if (vn) acc += vn[c];
        dst[c] = 0.5f * acc;
      }
    }
    std::swap(values, new_values);
  }

  // Slice. The alternating blur scales every vertex by 2^d / (d+1)... the
  // standard correction divides by 1 + 2^-d (see Adams et al. §6).
  const float alpha = 1.0f / (1.0f + std::pow(2.0f, -d_));
  std::memset(out, 0, (size_t)n_ * value_dim * sizeof(float));
  for (int p = 0; p < n_; ++p) {
    float* dst = out + (size_t)p * value_dim;
    for (int r = 0; r <= d_; ++r) {
      int32_t vi = vertex_[(size_t)p * dp1 + r];
      float w = barycentric_[(size_t)p * dp1 + r] * alpha;
      const float* src = values.data() + (size_t)vi * value_dim;
      for (int c = 0; c < value_dim; ++c) dst[c] += w * src[c];
    }
  }
}

}  // namespace permutohedral

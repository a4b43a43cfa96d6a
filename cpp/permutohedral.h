// Permutohedral lattice for fast high-dimensional Gaussian filtering.
//
// Clean-room implementation of the algorithm of Adams, Baek & Davis,
// "Fast High-Dimensional Filtering Using the Permutohedral Lattice"
// (Eurographics 2010). Replaces the reference's SWIG-wrapped lattice
// (reference wrapper/bilateralfilter/) as the native building block for
// bilateral filtering and dense-CRF message passing.
//
// Pipeline: splat (barycentric scatter onto the lattice's enclosing
// simplex vertices) -> blur (separable [1 2 1] passes along each of the
// d+1 lattice directions) -> slice (barycentric gather back).

#pragma once

#include <cstdint>
#include <vector>

namespace permutohedral {

class Lattice {
 public:
  // positions: n points, each d floats (already divided by their sigmas).
  Lattice(const float* positions, int n, int d);

  // Filter `value_dim` channels: in/out are n x value_dim row-major.
  // The standard normalization (divide by filtered all-ones) is up to the
  // caller; compute() performs plain splat-blur-slice.
  void compute(const float* in, float* out, int value_dim,
               bool reverse = false) const;

  int num_lattice_points() const { return static_cast<int>(offsets_.size()); }

 private:
  int n_ = 0;
  int d_ = 0;
  // Per input point: d+1 vertex indices into the lattice and weights.
  std::vector<int32_t> vertex_;   // n * (d+1)
  std::vector<float> barycentric_;  // n * (d+1)
  // Blur neighbors: for each lattice point and axis, index of the
  // +1/-1 neighbor along that axis (or -1).
  std::vector<int32_t> blur_pos_;  // m * (d+1)
  std::vector<int32_t> blur_neg_;  // m * (d+1)
  std::vector<int64_t> offsets_;   // unused storage marker; size == m
};

}  // namespace permutohedral

// C ABI: bilateral filtering + dense-CRF mean-field on the permutohedral
// lattice, OpenMP-parallel over batch items.
//
// Native counterpart of the reference's two C++ dependencies:
//  * wrapper/bilateralfilter (first-party SWIG module driving the RRM
//    DenseEnergyLoss slot) -> bilateral_filter / bilateral_filter_batch;
//  * pydensecrf (external pip C++) -> densecrf_inference, mean-field with
//    Gaussian + bilateral pairwise potentials and Potts compatibility.
//
// Loaded from Python via ctypes (acr_wsss_tpu/ops/bilateral.py).

#include <cmath>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

#include "permutohedral.h"

using permutohedral::Lattice;

namespace {

void build_bilateral_positions(const float* image, int H, int W,
                               float sigma_xy, float sigma_rgb,
                               std::vector<float>* out) {
  out->resize((size_t)H * W * 5);
  float* p = out->data();
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      const float* px = image + ((size_t)y * W + x) * 3;
      *p++ = x / sigma_xy;
      *p++ = y / sigma_xy;
      *p++ = px[0] / sigma_rgb;
      *p++ = px[1] / sigma_rgb;
      *p++ = px[2] / sigma_rgb;
    }
  }
}

void build_gaussian_positions(int H, int W, float sigma_xy,
                              std::vector<float>* out) {
  out->resize((size_t)H * W * 2);
  float* p = out->data();
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      *p++ = x / sigma_xy;
      *p++ = y / sigma_xy;
    }
  }
}

// Filter `channels` maps (CHW layout) through a lattice, with the standard
// homogeneous normalization (divide by the filtered all-ones channel).
void filter_normalized(const Lattice& lattice, const float* in, float* out,
                       int n_pix, int channels) {
  std::vector<float> vin((size_t)n_pix * (channels + 1));
  std::vector<float> vout((size_t)n_pix * (channels + 1));
  for (int p = 0; p < n_pix; ++p) {
    for (int c = 0; c < channels; ++c) {
      vin[(size_t)p * (channels + 1) + c] = in[(size_t)c * n_pix + p];
    }
    vin[(size_t)p * (channels + 1) + channels] = 1.0f;
  }
  lattice.compute(vin.data(), vout.data(), channels + 1);
  for (int p = 0; p < n_pix; ++p) {
    float norm = vout[(size_t)p * (channels + 1) + channels];
    float inv = (norm > 1e-20f) ? 1.0f / norm : 0.0f;
    for (int c = 0; c < channels; ++c) {
      out[(size_t)c * n_pix + p] = vout[(size_t)p * (channels + 1) + c] * inv;
    }
  }
}

// Unnormalized filtering (used by CRF message passing, which normalizes by
// construction via the softmax).
void filter_raw(const Lattice& lattice, const float* in, float* out,
                int n_pix, int channels) {
  std::vector<float> vin((size_t)n_pix * channels);
  std::vector<float> vout((size_t)n_pix * channels);
  for (int p = 0; p < n_pix; ++p) {
    for (int c = 0; c < channels; ++c) {
      vin[(size_t)p * channels + c] = in[(size_t)c * n_pix + p];
    }
  }
  lattice.compute(vin.data(), vout.data(), channels);
  for (int p = 0; p < n_pix; ++p) {
    for (int c = 0; c < channels; ++c) {
      out[(size_t)c * n_pix + p] = vout[(size_t)p * channels + c];
    }
  }
}

}  // namespace

extern "C" {

// Bilateral-filter `channels` probability maps against an RGB guide.
// image: H*W*3 (RGB float), input/output: channels*H*W (CHW).
void bilateral_filter(const float* image, const float* input, float* output,
                      int H, int W, int channels, float sigma_xy,
                      float sigma_rgb) {
  std::vector<float> positions;
  build_bilateral_positions(image, H, W, sigma_xy, sigma_rgb, &positions);
  Lattice lattice(positions.data(), H * W, 5);
  filter_normalized(lattice, input, output, H * W, channels);
}

// Batch version, OpenMP over images (reference
// wrapper/bilateralfilter/bilateralfilter.cpp:42-55 contract).
void bilateral_filter_batch(const float* images, const float* inputs,
                            float* outputs, int N, int C, int H, int W,
                            float sigma_xy, float sigma_rgb) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int n = 0; n < N; ++n) {
    bilateral_filter(images + (size_t)n * H * W * 3,
                     inputs + (size_t)n * C * H * W,
                     outputs + (size_t)n * C * H * W, H, W, C, sigma_xy,
                     sigma_rgb);
  }
}

// Dense-CRF mean-field with Gaussian (sxy_g, compat_g) and bilateral
// (sxy_b, srgb, compat_b) Potts pairwise terms — the pydensecrf
// configuration used at reference tool/imutils.py:345-362.
// unary_probs: L*H*W softmax scores (the CRF unary is -log p).
// image: H*W*3 RGB float. out: L*H*W marginals after `iters` updates.
void densecrf_inference(const float* image, const float* unary_probs,
                        float* out, int H, int W, int L, int iters,
                        float sxy_g, float compat_g, float sxy_b, float srgb,
                        float compat_b) {
  const int n_pix = H * W;

  std::vector<float> pos_g, pos_b;
  build_gaussian_positions(H, W, sxy_g, &pos_g);
  build_bilateral_positions(image, H, W, sxy_b, srgb, &pos_b);
  Lattice lat_g(pos_g.data(), n_pix, 2);
  Lattice lat_b(pos_b.data(), n_pix, 5);

  // Per-lattice normalization factors: 1/sqrt(filter(1) at each pixel),
  // applied symmetrically (pydensecrf NORMALIZE_SYMMETRIC default).
  auto sym_norm = [&](const Lattice& lat) {
    std::vector<float> ones(n_pix, 1.0f), filtered(n_pix);
    lat.compute(ones.data(), filtered.data(), 1);
    std::vector<float> norm(n_pix);
    for (int p = 0; p < n_pix; ++p) {
      norm[p] = 1.0f / std::sqrt(std::max(filtered[p], 1e-20f));
    }
    return norm;
  };
  std::vector<float> norm_g = sym_norm(lat_g);
  std::vector<float> norm_b = sym_norm(lat_b);

  std::vector<float> unary((size_t)L * n_pix);
  for (size_t i = 0; i < unary.size(); ++i) {
    unary[i] = -std::log(std::max(unary_probs[i], 1e-20f));
  }

  std::vector<float> Q((size_t)L * n_pix);
  std::vector<float> tmp((size_t)L * n_pix), msg((size_t)L * n_pix),
      filt((size_t)L * n_pix);

  // Init: softmax(-unary) == the input probabilities (renormalized).
  for (int p = 0; p < n_pix; ++p) {
    float mx = -1e30f;
    for (int l = 0; l < L; ++l) mx = std::max(mx, -unary[(size_t)l * n_pix + p]);
    float sum = 0.0f;
    for (int l = 0; l < L; ++l) {
      float e = std::exp(-unary[(size_t)l * n_pix + p] - mx);
      Q[(size_t)l * n_pix + p] = e;
      sum += e;
    }
    for (int l = 0; l < L; ++l) Q[(size_t)l * n_pix + p] /= sum;
  }

  for (int it = 0; it < iters; ++it) {
    std::fill(msg.begin(), msg.end(), 0.0f);

    // Gaussian kernel message.
    for (int l = 0; l < L; ++l) {
      for (int p = 0; p < n_pix; ++p) {
        tmp[(size_t)l * n_pix + p] = Q[(size_t)l * n_pix + p] * norm_g[p];
      }
    }
    filter_raw(lat_g, tmp.data(), filt.data(), n_pix, L);
    for (int l = 0; l < L; ++l) {
      for (int p = 0; p < n_pix; ++p) {
        // pydensecrf (Kraehenbuehl) keeps the self-interaction term
        msg[(size_t)l * n_pix + p] +=
            compat_g * filt[(size_t)l * n_pix + p] * norm_g[p];
      }
    }

    // Bilateral kernel message.
    for (int l = 0; l < L; ++l) {
      for (int p = 0; p < n_pix; ++p) {
        tmp[(size_t)l * n_pix + p] = Q[(size_t)l * n_pix + p] * norm_b[p];
      }
    }
    filter_raw(lat_b, tmp.data(), filt.data(), n_pix, L);
    for (int l = 0; l < L; ++l) {
      for (int p = 0; p < n_pix; ++p) {
        msg[(size_t)l * n_pix + p] +=
            compat_b * filt[(size_t)l * n_pix + p] * norm_b[p];
      }
    }

    // Update: Q = softmax(-unary + msg)  (Potts: compat * sum_{l'!=l} ...
    // expressed as message ON l with positive compat then negated).
    for (int p = 0; p < n_pix; ++p) {
      float mx = -1e30f;
      for (int l = 0; l < L; ++l) {
        float e = -unary[(size_t)l * n_pix + p] + msg[(size_t)l * n_pix + p];
        tmp[(size_t)l * n_pix + p] = e;
        mx = std::max(mx, e);
      }
      float sum = 0.0f;
      for (int l = 0; l < L; ++l) {
        float e = std::exp(tmp[(size_t)l * n_pix + p] - mx);
        Q[(size_t)l * n_pix + p] = e;
        sum += e;
      }
      for (int l = 0; l < L; ++l) Q[(size_t)l * n_pix + p] /= sum;
    }
  }

  std::memcpy(out, Q.data(), sizeof(float) * Q.size());
}

int bilateral_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"

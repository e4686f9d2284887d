// Native host-side data generation for the synthetic homography pipeline.
//
// The reference's data path leans on OpenCV/albumentations C++ through
// Python wrappers (reference: homodataset/HomoDataset.py:56-60); here the
// host-side work — procedural texture synthesis and inverse-map bilinear
// homography warping — is first-party C++, multithreaded across the batch,
// exposed to Python via ctypes (geoformer_tpu/data/native.py).
//
// Build: make -C cpp   (produces libsynthgen.so)

#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

// xorshift64* — fast deterministic per-image RNG
struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ull) {}
  uint64_t next() {
    s ^= s >> 12;
    s ^= s << 25;
    s ^= s >> 27;
    return s * 0x2545F4914F6CDD1Dull;
  }
  float uniform() { return (next() >> 40) * (1.0f / (1 << 24)); }
  float uniform(float lo, float hi) { return lo + (hi - lo) * uniform(); }
};

void texture_one(float* img, int h, int w, uint64_t seed, int n_blobs) {
  Rng rng(seed);
  // base gradient
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x)
      img[y * w + x] = 0.15f * x / w + 0.1f * y / h;

  // oriented sinusoidal bands
  for (int b = 0; b < 6; ++b) {
    float th = rng.uniform(0.f, 3.14159265f);
    float f = rng.uniform(0.01f, 0.08f);
    float ph = rng.uniform(0.f, 6.2831853f);
    float cth = std::cos(th), sth = std::sin(th);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x)
        img[y * w + x] +=
            0.15f * std::sin(6.2831853f * f * (cth * x + sth * y) + ph);
  }

  // gaussian blobs (windowed to 3 sigma for speed)
  for (int b = 0; b < n_blobs; ++b) {
    float cx = rng.uniform(0.f, (float)w);
    float cy = rng.uniform(0.f, (float)h);
    float s = rng.uniform(4.f, 40.f);
    float a = rng.uniform(-0.6f, 1.0f);
    float inv2s2 = 1.0f / (2 * s * s);
    int x0 = std::max(0, (int)(cx - 3 * s)), x1 = std::min(w, (int)(cx + 3 * s));
    int y0 = std::max(0, (int)(cy - 3 * s)), y1 = std::min(h, (int)(cy + 3 * s));
    for (int y = y0; y < y1; ++y) {
      float dy = y - cy;
      for (int x = x0; x < x1; ++x) {
        float dx = x - cx;
        img[y * w + x] += a * std::exp(-(dx * dx + dy * dy) * inv2s2);
      }
    }
  }

  // normalize to [0, 1]
  float mn = img[0], mx = img[0];
  for (int i = 1; i < h * w; ++i) {
    mn = std::min(mn, img[i]);
    mx = std::max(mx, img[i]);
  }
  float inv = 1.0f / std::max(mx - mn, 1e-6f);
  for (int i = 0; i < h * w; ++i) img[i] = (img[i] - mn) * inv;
}

void warp_one(const float* src, float* dst, const double* Hinv, int h, int w) {
  const double h00 = Hinv[0], h01 = Hinv[1], h02 = Hinv[2];
  const double h10 = Hinv[3], h11 = Hinv[4], h12 = Hinv[5];
  const double h20 = Hinv[6], h21 = Hinv[7], h22 = Hinv[8];
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      double d = h20 * x + h21 * y + h22;
      if (d == 0) d = 1e-9;
      double sx = (h00 * x + h01 * y + h02) / d;
      double sy = (h10 * x + h11 * y + h12) / d;
      int x0 = (int)std::floor(sx), y0 = (int)std::floor(sy);
      float fx = (float)(sx - x0), fy = (float)(sy - y0);
      float acc = 0.f;
      auto tap = [&](int xi, int yi, float wgt) {
        if (xi >= 0 && xi < w && yi >= 0 && yi < h)
          acc += wgt * src[yi * w + xi];
      };
      tap(x0, y0, (1 - fx) * (1 - fy));
      tap(x0 + 1, y0, fx * (1 - fy));
      tap(x0, y0 + 1, (1 - fx) * fy);
      tap(x0 + 1, y0 + 1, fx * fy);
      dst[y * w + x] = acc;
    }
  }
}

template <class F>
void parallel_for(int n, F fn) {
  int n_threads = std::min<int>(n, std::thread::hardware_concurrency());
  if (n_threads <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::vector<std::thread> ts;
  for (int t = 0; t < n_threads; ++t) {
    ts.emplace_back([=] {
      for (int i = t; i < n; i += n_threads) fn(i);
    });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

void synthgen_textures(float* out, int batch, int h, int w, uint64_t seed,
                       int n_blobs) {
  parallel_for(batch, [=](int i) {
    texture_one(out + (size_t)i * h * w, h, w, seed + 0x9E3779B9u * (i + 1),
                n_blobs);
  });
}

void synthgen_warp(const float* src, float* dst, const double* Hinv,
                   int batch, int h, int w) {
  parallel_for(batch, [=](int i) {
    warp_one(src + (size_t)i * h * w, dst + (size_t)i * h * w, Hinv + 9 * i,
             h, w);
  });
}

}  // extern "C"

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

// multi-octave value noise accumulated into img (amp given per call)
void add_value_noise(float* img, int h, int w, Rng& rng, int cell, float amp) {
  int gh = h / cell + 2, gw = w / cell + 2;
  std::vector<float> lat((size_t)gh * gw);
  for (auto& v : lat) v = rng.uniform(-1.f, 1.f);
  for (int y = 0; y < h; ++y) {
    float fy = (float)y / cell;
    int y0 = (int)fy;
    float ty = fy - y0;
    for (int x = 0; x < w; ++x) {
      float fx = (float)x / cell;
      int x0 = (int)fx;
      float tx = fx - x0;
      float v00 = lat[y0 * gw + x0], v01 = lat[y0 * gw + x0 + 1];
      float v10 = lat[(y0 + 1) * gw + x0], v11 = lat[(y0 + 1) * gw + x0 + 1];
      img[y * w + x] += amp * ((1 - ty) * ((1 - tx) * v00 + tx * v01) +
                               ty * ((1 - tx) * v10 + tx * v11));
    }
  }
}

void normalize01(float* img, int h, int w) {
  float mn = img[0], mx = img[0];
  for (int i = 1; i < h * w; ++i) {
    mn = std::min(mn, img[i]);
    mx = std::max(mx, img[i]);
  }
  float inv = 1.0f / std::max(mx - mn, 1e-6f);
  for (int i = 0; i < h * w; ++i) img[i] = (img[i] - mn) * inv;
}

// Robust 2%-98% percentile stretch to [0,1] (via a 256-bin histogram):
// matches real-photo contrast (std ~0.27) instead of min-max's timid ~0.14.
void normalize_robust(float* img, int h, int w) {
  normalize01(img, h, w);
  int n = h * w;
  int hist[256] = {0};
  for (int i = 0; i < n; ++i)
    hist[std::min(255, (int)(img[i] * 255.f))]++;
  int lo_count = (int)(0.02f * n), hi_count = (int)(0.98f * n);
  int acc = 0, lo = 0, hi = 255;
  for (int b = 0; b < 256; ++b) {
    acc += hist[b];
    if (acc <= lo_count) lo = b;
    if (acc < hi_count) hi = b;
  }
  float flo = lo / 255.f, fhi = (hi + 1) / 255.f;
  float inv = 1.0f / std::max(fhi - flo, 1e-3f);
  for (int i = 0; i < n; ++i)
    img[i] = std::min(1.f, std::max(0.f, (img[i] - flo) * inv));
}

// Dead-leaves model: occluding anti-aliased disks with power-law radii
// (p(r) ~ r^-3) — the classic synthetic model of natural-image statistics
// (1/f-like spectrum, occlusion edges at every scale). Gives the matcher
// real-photo-like edge/region structure that the blob/band/value-noise
// texture lacks (measured domain gap: RESULTS.md "Real-photo probe").
void texture_dead_leaves(float* img, int h, int w, Rng& rng) {
  float base = rng.uniform(0.2f, 0.8f);
  for (int i = 0; i < h * w; ++i) img[i] = base;
  const float rmin = 2.5f, rmax = 0.35f * std::min(h, w);
  const float q2 = (rmin / rmax) * (rmin / rmax);
  const int n = 4000;
  for (int k = 0; k < n; ++k) {
    float u = rng.uniform();
    float r = rmin / std::sqrt(1.f - u * (1.f - q2));
    float cx = rng.uniform(-r, w + r), cy = rng.uniform(-r, h + r);
    float col = rng.uniform(0.05f, 0.95f);
    // subtle linear shading across the disk (real surfaces are not flat)
    float gx = rng.uniform(-0.25f, 0.25f) / std::max(r, 1.f);
    float gy = rng.uniform(-0.25f, 0.25f) / std::max(r, 1.f);
    int x0 = std::max(0, (int)(cx - r - 1)), x1 = std::min(w, (int)(cx + r) + 2);
    int y0 = std::max(0, (int)(cy - r - 1)), y1 = std::min(h, (int)(cy + r) + 2);
    for (int y = y0; y < y1; ++y) {
      float dy = y - cy;
      for (int x = x0; x < x1; ++x) {
        float dx = x - cx;
        float d = std::sqrt(dx * dx + dy * dy);
        float alpha = std::min(1.f, std::max(0.f, r - d + 0.5f));  // AA edge
        if (alpha <= 0.f) continue;
        float shade = col + gx * dx + gy * dy;
        shade = std::min(1.f, std::max(0.f, shade));
        float& p = img[y * w + x];
        p = alpha * shade + (1 - alpha) * p;
      }
    }
  }
  // fine detail so flat leaves are not featureless for the fine matcher
  add_value_noise(img, h, w, rng, 4, 0.04f);
  normalize_robust(img, h, w);
}

void paint_rects(float* img, int h, int w, Rng& rng, int count,
                 float amp_lo, float amp_hi) {
  for (int r = 0; r < count; ++r) {
    float cx = rng.uniform(0.f, (float)w), cy = rng.uniform(0.f, (float)h);
    float hw2 = rng.uniform(4.f, 0.25f * w), hh2 = rng.uniform(4.f, 0.25f * h);
    float th = rng.uniform(0.f, 3.14159265f);
    float a = rng.uniform(amp_lo, amp_hi);
    float cth = std::cos(th), sth = std::sin(th);
    float rad = std::sqrt(hw2 * hw2 + hh2 * hh2);
    int x0 = std::max(0, (int)(cx - rad)), x1 = std::min(w, (int)(cx + rad) + 1);
    int y0 = std::max(0, (int)(cy - rad)), y1 = std::min(h, (int)(cy + rad) + 1);
    for (int y = y0; y < y1; ++y) {
      float dy = y - cy;
      for (int x = x0; x < x1; ++x) {
        float dx = x - cx;
        float u = cth * dx + sth * dy, v = -sth * dx + cth * dy;
        if (std::fabs(u) <= hw2 && std::fabs(v) <= hh2) img[y * w + x] += a;
      }
    }
  }
}

// Fractal (fBm) value noise: amplitude halves per octave, giving the
// ~1/f^2 power spectrum of natural images, plus a few hard-edged
// rectangles for corner structure.
void texture_fbm(float* img, int h, int w, Rng& rng) {
  for (int i = 0; i < h * w; ++i) img[i] = 0.f;
  float amp = 0.5f;
  for (int cell = 128; cell >= 4; cell /= 2) {
    if (cell < std::min(h, w)) add_value_noise(img, h, w, rng, cell, amp);
    amp *= 0.62f;
  }
  paint_rects(img, h, w, rng, 6, -0.35f, 0.35f);
  normalize_robust(img, h, w);
}

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

  // multi-octave value noise: real-image-like high-frequency detail.
  for (int cell = 32; cell >= 8; cell /= 2) {
    float amp = 0.10f * cell / 32.f + 0.05f;
    int gh = h / cell + 2, gw = w / cell + 2;
    std::vector<float> lat((size_t)gh * gw);
    for (auto& v : lat) v = rng.uniform(-1.f, 1.f);
    for (int y = 0; y < h; ++y) {
      float fy = (float)y / cell;
      int y0 = (int)fy;
      float ty = fy - y0;
      for (int x = 0; x < w; ++x) {
        float fx = (float)x / cell;
        int x0 = (int)fx;
        float tx = fx - x0;
        float v00 = lat[y0 * gw + x0], v01 = lat[y0 * gw + x0 + 1];
        float v10 = lat[(y0 + 1) * gw + x0], v11 = lat[(y0 + 1) * gw + x0 + 1];
        img[y * w + x] += amp * ((1 - ty) * ((1 - tx) * v00 + tx * v01) +
                                 ty * ((1 - tx) * v10 + tx * v11));
      }
    }
  }

  // hard-edged rotated rectangles: corners + straight edges, the structure
  // sub-pixel localization learns from (absent in blob/band textures).
  for (int r = 0; r < 10; ++r) {
    float cx = rng.uniform(0.f, (float)w), cy = rng.uniform(0.f, (float)h);
    float hw2 = rng.uniform(4.f, 0.25f * w), hh2 = rng.uniform(4.f, 0.25f * h);
    float th = rng.uniform(0.f, 3.14159265f);
    float a = rng.uniform(-0.5f, 0.5f);
    float cth = std::cos(th), sth = std::sin(th);
    float rad = std::sqrt(hw2 * hw2 + hh2 * hh2);
    int x0 = std::max(0, (int)(cx - rad)), x1 = std::min(w, (int)(cx + rad) + 1);
    int y0 = std::max(0, (int)(cy - rad)), y1 = std::min(h, (int)(cy + rad) + 1);
    for (int y = y0; y < y1; ++y) {
      float dy = y - cy;
      for (int x = x0; x < x1; ++x) {
        float dx = x - cx;
        float u = cth * dx + sth * dy, v = -sth * dx + cth * dy;
        if (std::fabs(u) <= hw2 && std::fabs(v) <= hh2) img[y * w + x] += a;
      }
    }
  }

  // line segments (width 1-3 px): edge/corner features at pixel scale.
  for (int l = 0; l < 12; ++l) {
    float ax = rng.uniform(0.f, (float)w), ay = rng.uniform(0.f, (float)h);
    float th = rng.uniform(0.f, 6.2831853f);
    float len = rng.uniform(20.f, 0.8f * std::max(h, w));
    float bx = ax + len * std::cos(th), by = ay + len * std::sin(th);
    float half = 0.5f * rng.uniform(1.f, 3.f);
    float a = rng.uniform(-0.6f, 0.6f);
    float vx = bx - ax, vy = by - ay;
    float vlen2 = std::max(vx * vx + vy * vy, 1e-6f);
    int x0 = std::max(0, (int)(std::min(ax, bx) - half - 1));
    int x1 = std::min(w, (int)(std::max(ax, bx) + half + 2));
    int y0 = std::max(0, (int)(std::min(ay, by) - half - 1));
    int y1 = std::min(h, (int)(std::max(ay, by) + half + 2));
    for (int y = y0; y < y1; ++y) {
      for (int x = x0; x < x1; ++x) {
        float t = ((x - ax) * vx + (y - ay) * vy) / vlen2;
        t = std::min(1.f, std::max(0.f, t));
        float px = ax + t * vx - x, py = ay + t * vy - y;
        if (px * px + py * py <= half * half) img[y * w + x] += a;
      }
    }
  }

  // occasionally a checkerboard patch (corner lattice, calibration-like)
  if (rng.uniform() < 0.35f) {
    float cell = rng.uniform(6.f, 20.f);
    int cx0 = (int)rng.uniform(0.f, 0.6f * w);
    int cy0 = (int)rng.uniform(0.f, 0.6f * h);
    int cw = (int)rng.uniform(0.25f * w, 0.5f * w);
    int ch = (int)rng.uniform(0.25f * h, 0.5f * h);
    float a = rng.uniform(0.25f, 0.5f);
    for (int y = cy0; y < std::min(h, cy0 + ch); ++y)
      for (int x = cx0; x < std::min(w, cx0 + cw); ++x) {
        int par = ((int)((x - cx0) / cell) + (int)((y - cy0) / cell)) & 1;
        img[y * w + x] += par ? a : -a;
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

// Mixed-style bank for TRAINING: one third each of the structured texture,
// dead-leaves, and fBm families (style = index % 3). The single-style
// synthgen_textures above stays bit-identical so the selfcheck eval
// protocol remains comparable across rounds.
void synthgen_textures_mixed(float* out, int batch, int h, int w,
                             uint64_t seed, int n_blobs) {
  parallel_for(batch, [=](int i) {
    float* img = out + (size_t)i * h * w;
    uint64_t s = seed + 0x9E3779B9u * (i + 1);
    if (i % 3 == 0) {
      texture_one(img, h, w, s, n_blobs);
    } else if (i % 3 == 1) {
      Rng rng(s);
      texture_dead_leaves(img, h, w, rng);
    } else {
      Rng rng(s);
      texture_fbm(img, h, w, rng);
    }
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

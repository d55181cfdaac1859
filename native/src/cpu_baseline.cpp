// CPU baseline tracer — clean-room reimplementation of the reference's
// workload shape (ilia-glushchenko/SimplePathTracer) used to establish the
// "reference numbers to beat" on this host, since the reference publishes no
// benchmarks (SURVEY.md S6) and its GLFW/GL build cannot run headless here.
//
// Matches the reference's execution model, not its code:
//   * recursive per-pixel tracer, linear O(S) sphere scan per bounce
//     (include/Collision.hpp:87-109, include/SingleThreadPathTracer.hpp)
//   * image-tile decomposition over <= 4 std::threads
//     (include/Renderer.hpp:257-302, g_maxThreads=4 include/Globals.hpp:11)
//   * Lambertian / metal / dielectric materials with Schlick + TIR
//     (include/SingleThreadPathTracer.hpp:21-92), intended Shirley semantics
//   * xorshift-style RNG per thread (include/Random.hpp:48-84)
//
// Prints one JSON line: {"paths_per_sec": N, ...}.
//
// Build: make -C native cpu_baseline && native/cpu_baseline [W H SPP DEPTH]

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <thread>
#include <vector>

namespace {

struct Vec3 {
  float x = 0, y = 0, z = 0;
};
inline Vec3 operator+(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline Vec3 operator-(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline Vec3 operator*(Vec3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
inline Vec3 operator*(Vec3 a, Vec3 b) { return {a.x * b.x, a.y * b.y, a.z * b.z}; }
inline float dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline Vec3 cross(Vec3 a, Vec3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline Vec3 normalize(Vec3 v) {
  float n = std::sqrt(dot(v, v));
  return v * (1.0f / n);
}

struct Rng {  // xorshift64* — same family as include/Random.hpp:48-84
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed * 2685821657736338717ULL + 1) {}
  float uniform() {
    s ^= s >> 12;
    s ^= s << 25;
    s ^= s >> 27;
    uint64_t r = s * 2685821657736338717ULL;
    return float(r >> 40) * (1.0f / float(1 << 24));
  }
  Vec3 in_unit_sphere() {
    for (;;) {
      Vec3 p{2 * uniform() - 1, 2 * uniform() - 1, 2 * uniform() - 1};
      if (dot(p, p) < 1.0f) return p;
    }
  }
};

enum Mat { LAMBERTIAN = 0, METAL = 1, DIELECTRIC = 2 };

// SoA scene, like the reference's global arrays (include/Globals.hpp:31-37).
struct Scene {
  std::vector<Vec3> center;
  std::vector<float> radius;
  std::vector<Vec3> albedo;
  std::vector<int> mat;
  std::vector<float> fuzz;
  void add(Vec3 c, float r, Vec3 a, int m, float f) {
    center.push_back(c);
    radius.push_back(r);
    albedo.push_back(a);
    mat.push_back(m);
    fuzz.push_back(f);
  }
  size_t size() const { return radius.size(); }
};

// Cover-scene analog: ground + 3 feature spheres + 22x22 jittered grid,
// same sphere count scale as BASELINE config 3 (~450 live spheres).
Scene make_cover_scene() {
  Scene s;
  Rng rng(42);
  s.add({0, -1000, 0}, 1000, {0.5f, 0.5f, 0.5f}, LAMBERTIAN, 0);
  s.add({0, 1, 0}, 1, {1, 1, 1}, DIELECTRIC, 0);
  s.add({-4, 1, 0}, 1, {0.4f, 0.2f, 0.1f}, LAMBERTIAN, 0);
  s.add({4, 1, 0}, 1, {0.7f, 0.6f, 0.5f}, METAL, 0);
  for (int a = -11; a < 11; ++a)
    for (int b = -11; b < 11; ++b) {
      Vec3 c{a + 0.9f * rng.uniform(), 0.2f, b + 0.9f * rng.uniform()};
      Vec3 d = c - Vec3{4, 0.2f, 0};
      if (std::sqrt(dot(d, d)) <= 0.9f) continue;
      float m = rng.uniform();
      if (m < 0.8f)
        s.add(c, 0.2f, {rng.uniform() * rng.uniform(), rng.uniform() * rng.uniform(), rng.uniform() * rng.uniform()}, LAMBERTIAN, 0);
      else if (m < 0.95f)
        s.add(c, 0.2f, {0.5f + 0.5f * rng.uniform(), 0.5f + 0.5f * rng.uniform(), 0.5f + 0.5f * rng.uniform()}, METAL, 0.5f * rng.uniform());
      else
        s.add(c, 0.2f, {1, 1, 1}, DIELECTRIC, 0);
    }
  return s;
}

constexpr float kTMin = 1e-3f;  // include/Collision.hpp:10 threshold
constexpr float kTMax = 3e7f;

// Linear closest-hit scan (include/Collision.hpp:87-109 semantics, t-based).
int closest_hit(const Scene& s, Vec3 o, Vec3 d, float* t_out) {
  int idx = -1;
  float best = kTMax;
  const size_t n = s.size();
  for (size_t i = 0; i < n; ++i) {
    Vec3 oc = s.center[i] - o;
    float tc = dot(oc, d);
    float disc = s.radius[i] * s.radius[i] - (dot(oc, oc) - tc * tc);
    if (disc <= 0) continue;
    float sq = std::sqrt(disc);
    float t = tc - sq;
    if (t <= kTMin) t = tc + sq;
    if (t > kTMin && t < best) {
      best = t;
      idx = int(i);
    }
  }
  *t_out = best;
  return idx;
}

Vec3 reflect(Vec3 d, Vec3 n) { return d - n * (2 * dot(d, n)); }

Vec3 trace(const Scene& s, Vec3 o, Vec3 d, int depth, Rng& rng) {
  Vec3 tp{1, 1, 1};
  Vec3 rad{0, 0, 0};
  for (int b = 0; b < depth; ++b) {
    float t;
    int i = closest_hit(s, o, d, &t);
    if (i < 0) {  // sky gradient miss shader
      float u = 0.5f * (d.y + 1.0f);
      Vec3 sky = Vec3{1, 1, 1} * (1 - u) + Vec3{0.5f, 0.7f, 1.0f} * u;
      rad = rad + tp * sky;
      break;
    }
    Vec3 p = o + d * t;
    Vec3 n = normalize((p - s.center[i]) * (1.0f / s.radius[i]));
    bool front = dot(d, n) < 0;
    Vec3 nf = front ? n : n * -1.0f;
    int m = s.mat[i];
    if (m == LAMBERTIAN) {
      d = normalize(nf + normalize(rng.in_unit_sphere()));
      tp = tp * s.albedo[i];
    } else if (m == METAL) {
      Vec3 r = reflect(d, nf);
      d = normalize(r + rng.in_unit_sphere() * s.fuzz[i]);
      if (dot(d, nf) <= 0) break;  // absorbed
      tp = tp * s.albedo[i];
    } else {  // dielectric, Schlick + TIR
      float eta = front ? (1.0f / 1.5f) : 1.5f;
      float cos_t = std::fmin(-dot(d, nf), 1.0f);
      float sin2 = 1 - cos_t * cos_t;
      bool tir = eta * eta * sin2 > 1.0f;
      float r0 = (1 - eta) / (1 + eta);
      r0 *= r0;
      float refl_p = r0 + (1 - r0) * std::pow(1 - cos_t, 5.0f);
      if (tir || rng.uniform() < refl_p) {
        d = reflect(d, nf);
      } else {
        Vec3 perp = (d + nf * cos_t) * eta;
        float par = std::sqrt(std::fmax(1 - dot(perp, perp), 0.0f));
        d = perp - nf * par;
      }
      d = normalize(d);
    }
    o = p;
  }
  return rad;
}

struct Camera {
  Vec3 origin, lower_left, horizontal, vertical;
};

Camera make_camera(int w, int h) {
  Vec3 origin{13, 2, 3}, lookat{0, 0, 0}, vup{0, 1, 0};
  float vfov = 20.0f * 3.14159265f / 180.0f;
  float half_h = std::tan(vfov / 2), half_w = half_h * float(w) / float(h);
  Vec3 wv = normalize(origin - lookat);
  Vec3 u = normalize(cross(vup, wv));
  Vec3 v = cross(wv, u);
  float fd = 10.0f;
  Camera c;
  c.origin = origin;
  c.lower_left = origin - u * (half_w * fd) - v * (half_h * fd) - wv * fd;
  c.horizontal = u * (2 * half_w * fd);
  c.vertical = v * (2 * half_h * fd);
  return c;
}

}  // namespace

int main(int argc, char** argv) {
  int W = argc > 1 ? atoi(argv[1]) : 300;
  int H = argc > 2 ? atoi(argv[2]) : 200;
  int SPP = argc > 3 ? atoi(argv[3]) : 16;
  int DEPTH = argc > 4 ? atoi(argv[4]) : 10;

  Scene scene = make_cover_scene();
  Camera cam = make_camera(W, H);
  std::vector<float> img(size_t(W) * H * 3, 0.0f);

  // Tile fan-out, <= 4 threads like the reference (Renderer.hpp:261-274).
  int n_threads = std::min(4u, std::thread::hardware_concurrency());
  std::atomic<int> next_row{0};
  auto t0 = std::chrono::high_resolution_clock::now();
  std::vector<std::thread> pool;
  for (int tid = 0; tid < n_threads; ++tid) {
    pool.emplace_back([&, tid] {
      Rng rng(0x9E3779B97F4A7C15ULL * (tid + 1));
      for (;;) {
        int y = next_row.fetch_add(1);
        if (y >= H) break;
        for (int x = 0; x < W; ++x) {
          Vec3 acc{0, 0, 0};
          for (int sp = 0; sp < SPP; ++sp) {
            float s = (x + rng.uniform()) / W;
            float t = 1.0f - (y + rng.uniform()) / H;
            Vec3 dir = normalize(cam.lower_left + cam.horizontal * s +
                                 cam.vertical * t - cam.origin);
            acc = acc + trace(scene, cam.origin, dir, DEPTH, rng);
          }
          size_t o = (size_t(y) * W + x) * 3;
          img[o] = acc.x / SPP;
          img[o + 1] = acc.y / SPP;
          img[o + 2] = acc.z / SPP;
        }
      }
    });
  }
  for (auto& th : pool) th.join();
  auto t1 = std::chrono::high_resolution_clock::now();
  double dt = std::chrono::duration<double>(t1 - t0).count();

  double checksum = 0;
  for (float v : img) checksum += v;
  double paths = double(W) * H * SPP;
  printf(
      "{\"paths_per_sec\": %.1f, \"elapsed_s\": %.3f, \"paths\": %.0f, "
      "\"threads\": %d, \"spheres\": %zu, \"checksum\": %.3f}\n",
      paths / dt, dt, paths, n_threads, scene.size(), checksum);
  return 0;
}

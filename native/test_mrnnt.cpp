// Golden-value test suite for the native engine (libmrnnt).
//
// Counterpart of the reference's tests/test_cpu.cpp: asserts the worked
// README lattice (loss -log(0.363), the 4x3x3 gradient table), the
// two-sample packed batch, the alignment-restriction constants
// (-log(0.2958), -log(0.072), -log(0.192), -log(0.0672)), cost-only mode,
// inf/nan robustness on random inputs, and workspace/status queries.
// Plain asserts, no test framework (matching the reference's style); exits
// nonzero on the first failure.
//
// Build & run: see native/CMakeLists.txt (target `test_mrnnt`).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

extern "C" {
int mrnnt_loss_packed(const float* acts, const int32_t* labels, int32_t batch,
                      const int32_t* T, const int32_t* S, int32_t V,
                      int32_t s_stride, int32_t blank, int32_t num_threads,
                      const int32_t* alignment, int32_t t_stride,
                      int32_t max_shift, float* costs, float* grads,
                      void* workspace);
int mrnnt_workspace_bytes(int32_t batch, const int32_t* T, const int32_t* S,
                          int64_t* out_bytes);
const char* mrnnt_status_string(int status);
}

namespace {

int failures = 0;

void expect_close(float got, float want, float tol, const char* what) {
  if (std::fabs(got - want) > tol) {
    std::fprintf(stderr, "FAIL %s: got %f want %f (tol %f)\n", what, got,
                 want, tol);
    ++failures;
  }
}

void expect_true(bool ok, const char* what) {
  if (!ok) {
    std::fprintf(stderr, "FAIL %s\n", what);
    ++failures;
  }
}

// README lattice: T=4, S=2, V=3, blank=0; cells are per-(t,s) posteriors, so
// the packed activations are their logs (softmax of log p = p).
// Packed order: t-major, s-minor (t*(S+1)+s).
const float kReadmeProbs[4][3][3] = {
    {{0.6f, 0.3f, 0.1f}, {0.7f, 0.1f, 0.2f}, {0.5f, 0.1f, 0.4f}},
    {{0.5f, 0.4f, 0.1f}, {0.5f, 0.1f, 0.4f}, {0.8f, 0.1f, 0.1f}},
    {{0.4f, 0.3f, 0.3f}, {0.5f, 0.1f, 0.4f}, {0.7f, 0.2f, 0.1f}},
    {{0.8f, 0.1f, 0.1f}, {0.3f, 0.1f, 0.6f}, {0.8f, 0.1f, 0.1f}},
};

const float kReadmeGrads[4][3][3] = {
    {{0.04f, -0.14f, 0.1f}, {0.f, 0.f, 0.f}, {0.f, 0.f, 0.f}},
    {{0.13f, -0.19f, 0.06f}, {-0.04f, 0.04f, -0.01f}, {0.f, 0.f, 0.f}},
    {{0.06f, -0.1f, 0.04f}, {0.01f, 0.07f, -0.08f}, {-0.06f, 0.04f, 0.02f}},
    {{0.f, 0.f, 0.f}, {0.14f, 0.05f, -0.19f}, {-0.11f, 0.05f, 0.05f}},
};

std::vector<float> readme_acts() {
  std::vector<float> acts(4 * 3 * 3);
  for (int t = 0; t < 4; ++t)
    for (int s = 0; s < 3; ++s)
      for (int v = 0; v < 3; ++v)
        acts[(t * 3 + s) * 3 + v] = std::log(kReadmeProbs[t][s][v]);
  return acts;
}

void test_readme_forward_and_grads() {
  auto acts = readme_acts();
  const int32_t labels[2] = {1, 2};
  const int32_t T = 4, S = 2;
  float cost = 0.f;
  std::vector<float> grads(acts.size(), 0.f);
  int rc = mrnnt_loss_packed(acts.data(), labels, 1, &T, &S, 3, 2, 0, 0,
                             nullptr, 0, 0, &cost, grads.data(), nullptr);
  expect_true(rc == 0, "readme status ok");
  expect_close(cost, -std::log(0.363f), 1e-4f, "readme loss");
  for (int t = 0; t < 4; ++t)
    for (int s = 0; s < 3; ++s)
      for (int v = 0; v < 3; ++v)
        expect_close(grads[(t * 3 + s) * 3 + v], kReadmeGrads[t][s][v], 1e-2f,
                     "readme grad");

  // Cost-only fast path must agree.
  float cost2 = 0.f;
  rc = mrnnt_loss_packed(acts.data(), labels, 1, &T, &S, 3, 2, 0, 0, nullptr,
                         0, 0, &cost2, nullptr, nullptr);
  expect_true(rc == 0, "cost-only status ok");
  expect_close(cost2, cost, 1e-6f, "cost-only == cost_and_grad");
}

void test_multibatch() {
  // Sample 0: T=2, S=1 (loss -log(0.39)); sample 1: the README lattice.
  const float small[2][2][3] = {
      {{0.6f, 0.3f, 0.1f}, {0.7f, 0.1f, 0.2f}},
      {{0.5f, 0.4f, 0.1f}, {0.5f, 0.1f, 0.4f}},
  };
  std::vector<float> acts;
  for (int t = 0; t < 2; ++t)
    for (int s = 0; s < 2; ++s)
      for (int v = 0; v < 3; ++v) acts.push_back(std::log(small[t][s][v]));
  auto readme = readme_acts();
  acts.insert(acts.end(), readme.begin(), readme.end());

  const int32_t labels[2][2] = {{1, 0}, {1, 2}};
  const int32_t T[2] = {2, 4}, S[2] = {1, 2};
  float costs[2];
  std::vector<float> grads(acts.size(), 0.f);
  int rc = mrnnt_loss_packed(acts.data(), &labels[0][0], 2, T, S, 3, 2, 0, 0,
                             nullptr, 0, 0, costs, grads.data(), nullptr);
  expect_true(rc == 0, "multibatch status ok");
  expect_close(costs[0], -std::log(0.39f), 1e-4f, "multibatch loss 0");
  expect_close(costs[1], -std::log(0.363f), 1e-4f, "multibatch loss 1");
  // Second sample's grads start at offset 2*2*3 and must match the README
  // table (packed offsets exercised).
  for (int t = 0; t < 4; ++t)
    for (int s = 0; s < 3; ++s)
      for (int v = 0; v < 3; ++v)
        expect_close(grads[12 + (t * 3 + s) * 3 + v], kReadmeGrads[t][s][v],
                     1e-2f, "multibatch grad");
}

void test_alignment_restriction() {
  auto acts = readme_acts();
  const int32_t labels[2] = {1, 2};
  const int32_t T = 4, S = 2;
  const int32_t align_a[4] = {0, 1, 0, 2};
  const int32_t align_b[4] = {1, 2, 0, 0};
  struct Case {
    const int32_t* align;
    int shift;
    float prob;
  } cases[] = {
      {align_a, 2, 0.363f},   // wide band == unrestricted
      {align_a, 1, 0.2958f},  // reference tests/test_cpu.cpp:405-433
      {align_a, 0, 0.072f},   // exactly the aligned path
      {align_b, 1, 0.192f},   // reference tests/test_cpu.cpp:532-545
      {align_b, 0, 0.0672f},
  };
  for (const auto& c : cases) {
    float cost = 0.f;
    std::vector<float> grads(acts.size(), 0.f);
    int rc = mrnnt_loss_packed(acts.data(), labels, 1, &T, &S, 3, 2, 0, 0,
                               c.align, 4, c.shift, &cost, grads.data(),
                               nullptr);
    expect_true(rc == 0, "align status ok");
    expect_close(cost, -std::log(c.prob), 1e-3f, "align-restricted loss");
  }
}

void test_infnan_random() {
  // Reference infnan_test: random acts T=50, S=10, V=15; all outputs finite.
  const int32_t T = 50, S = 10, V = 15;
  std::mt19937 gen(0);
  std::uniform_real_distribution<float> dist(0.f, 1.f);
  std::vector<float> acts(static_cast<size_t>(T) * (S + 1) * V);
  for (auto& a : acts) a = dist(gen);
  std::vector<int32_t> labels(S);
  std::mt19937 lgen(1);
  std::uniform_int_distribution<int32_t> ldist(1, V - 1);
  for (auto& l : labels) l = ldist(lgen);
  float cost = 0.f;
  std::vector<float> grads(acts.size(), 0.f);
  int rc = mrnnt_loss_packed(acts.data(), labels.data(), 1, &T, &S, V, S, 0,
                             0, nullptr, 0, 0, &cost, grads.data(), nullptr);
  expect_true(rc == 0, "infnan status ok");
  expect_true(std::isfinite(cost), "cost finite");
  for (float g : grads)
    if (!std::isfinite(g)) {
      expect_true(false, "grad finite");
      break;
    }
}

void test_status_and_workspace() {
  const int32_t T = 4, S = 2;
  int64_t bytes = 0;
  expect_true(mrnnt_workspace_bytes(1, &T, &S, &bytes) == 0,
              "workspace query ok");
  expect_true(bytes == 3LL * 4 * 3 * 4, "workspace size formula");

  const int32_t bad_s = 9;  // S > T
  expect_true(mrnnt_workspace_bytes(1, &T, &bad_s, &bytes) == 2,
              "bad lengths rejected");
  expect_true(std::strcmp(mrnnt_status_string(0), "ok") == 0, "status str 0");
  expect_true(mrnnt_loss_packed(nullptr, nullptr, 0, nullptr, nullptr, 0, 0,
                                0, 0, nullptr, 0, 0, nullptr, nullptr,
                                nullptr) == 1,
              "null args rejected");

  // Caller-provided workspace produces identical results.
  auto acts = readme_acts();
  const int32_t labels[2] = {1, 2};
  expect_true(mrnnt_workspace_bytes(1, &T, &S, &bytes) == 0, "ws query 2");
  std::vector<uint8_t> ws(bytes);
  float cost = 0.f;
  std::vector<float> grads(acts.size(), 0.f);
  int rc = mrnnt_loss_packed(acts.data(), labels, 1, &T, &S, 3, 2, 0, 0,
                             nullptr, 0, 0, &cost, grads.data(), ws.data());
  expect_true(rc == 0, "external workspace ok");
  expect_close(cost, -std::log(0.363f), 1e-4f, "external workspace loss");
}

}  // namespace

int main() {
  test_readme_forward_and_grads();
  test_multibatch();
  test_alignment_restriction();
  test_infnan_random();
  test_status_and_workspace();
  if (failures == 0) {
    std::printf("test_mrnnt: all checks passed\n");
    return 0;
  }
  std::fprintf(stderr, "test_mrnnt: %d failures\n", failures);
  return 1;
}

// Timing harness for the native engine (counterpart of the reference's
// tests/test_time.cpp): CLI `bench_mrnnt B T S V [threads]`, runs 10
// iterations of cost_and_grad on random activations and prints mean and
// variance wall-time in ms. Asserts nothing.

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

extern "C" {
int mrnnt_loss_packed(const float* acts, const int32_t* labels, int32_t batch,
                      const int32_t* T, const int32_t* S, int32_t V,
                      int32_t s_stride, int32_t blank, int32_t num_threads,
                      const int32_t* alignment, int32_t t_stride,
                      int32_t max_shift, float* costs, float* grads,
                      void* workspace);
}

int main(int argc, char** argv) {
  if (argc < 5) {
    std::fprintf(stderr, "usage: %s B T S V [threads]\n", argv[0]);
    return 2;
  }
  const int B = std::atoi(argv[1]);
  const int T = std::atoi(argv[2]);
  const int S = std::atoi(argv[3]);
  const int V = std::atoi(argv[4]);
  const int threads = argc > 5 ? std::atoi(argv[5]) : 0;
  const int iters = 10;

  std::vector<int32_t> Ts(B, T), Ss(B, S);
  const int64_t rows = static_cast<int64_t>(B) * T * (S + 1);
  std::vector<float> acts(rows * V);
  std::mt19937 gen(0);
  std::uniform_real_distribution<float> dist(0.f, 1.f);
  for (auto& a : acts) a = dist(gen);
  std::vector<int32_t> labels(static_cast<int64_t>(B) * S);
  std::uniform_int_distribution<int32_t> ldist(1, V - 1);
  for (auto& l : labels) l = ldist(gen);

  std::vector<float> costs(B), grads(acts.size());
  std::vector<double> ms(iters);
  for (int i = 0; i < iters; ++i) {
    const auto start = std::chrono::steady_clock::now();
    const int rc = mrnnt_loss_packed(acts.data(), labels.data(), B, Ts.data(),
                                     Ss.data(), V, S, 0, threads, nullptr, 0,
                                     0, costs.data(), grads.data(), nullptr);
    const auto end = std::chrono::steady_clock::now();
    if (rc != 0) {
      std::fprintf(stderr, "engine error %d\n", rc);
      return 1;
    }
    ms[i] = std::chrono::duration<double, std::milli>(end - start).count();
  }
  double mean = 0.0;
  for (double m : ms) mean += m;
  mean /= iters;
  double var = 0.0;
  for (double m : ms) var += (m - mean) * (m - mean);
  var /= iters;
  std::printf("B=%d T=%d S=%d V=%d threads=%d: %.3f ms mean, %.3f variance "
              "over %d iters\n", B, T, S, V, threads, mean, var, iters);
  return 0;
}

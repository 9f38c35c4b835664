// Reference-throughput baseline: times the *reference implementation*'s
// data-generation hot loop (RlRunner::step with a zero-output net,
// mirroring gen_benchmark.cc but without the TorchScript dependency) on
// one CPU core.  Prints JSON: subgame solves/s and CFR iters/s.
//
// The production reference runs ~60 such threads (README.md:44-53) with
// a real MLP behind ModelLocker (strictly slower than the zero net), so
// single-core-rate * 60 is a generous upper bound on the reference's
// full-machine throughput.

#include <chrono>
#include <cstdio>
#include <cstring>

#include "liars_dice.h"
#include "real_net.h"
#include "recursive_solving.h"

using namespace liars_dice;

int main(int argc, char** argv) {
  int num_dice = 1, num_faces = 4, num_iters = 1024, episodes = 20;
  bool use_cfr = true;
  const char* net_path = nullptr;  // TorchScript net (CPU) instead of zero
  for (int i = 1; i < argc; ++i) {
    auto is = [&](const char* f) { return !strcmp(argv[i], f); };
    if (is("--num_dice")) num_dice = atoi(argv[++i]);
    else if (is("--num_faces")) num_faces = atoi(argv[++i]);
    else if (is("--num_iters")) num_iters = atoi(argv[++i]);
    else if (is("--episodes")) episodes = atoi(argv[++i]);
    else if (is("--fp")) use_cfr = false;
    else if (is("--net")) net_path = argv[++i];
  }
  RecursiveSolvingParams params;
  params.num_dice = num_dice;
  params.num_faces = num_faces;
  params.random_action_prob = 0.25;
  params.sample_leaf = true;
  params.subgame_params.num_iters = num_iters;
  params.subgame_params.max_depth = 2;
  params.subgame_params.linear_update = true;
  params.subgame_params.use_cfr = use_cfr;

  Game game(num_dice, num_faces);
  // Default: zero net (upper-bounds the reference's solver loop with
  // free leaf values). --net: the production configuration — a real
  // TorchScript MLP evaluated at every CFR iteration, matching what
  // gen_benchmark measures (gen_benchmark.cc:114-143) and what
  // bench.py's fused kernel computes on the TPU side.
  auto net = net_path
                 ? create_torchscript_net(std::string(net_path), "cpu")
                 : create_zero_net(game.num_hands(), /*verbose=*/false);
  if (net_path) {
    // TorchScriptNet::add_training_example throws ("query only"); in the
    // production stack the CVNetBufferConnector absorbs examples into the
    // replay buffer (data_loop.h:50-55). A sink wrapper plays that role
    // so RlRunner::step can complete episodes.
    struct SinkNet : public IValueNet {
      std::shared_ptr<IValueNet> inner;
      explicit SinkNet(std::shared_ptr<IValueNet> inner) : inner(inner) {}
      torch::Tensor compute_values(const torch::Tensor query) override {
        return inner->compute_values(query);
      }
      void add_training_example(const torch::Tensor, const torch::Tensor)
          override {}
    };
    net = std::make_shared<SinkNet>(net);
  }
  int solves = 0;
  auto counting_net = net;  // zero net; solves counted via runner episodes

  RlRunner runner(params, counting_net, /*seed=*/1234);
  // Warmup.
  runner.step();
  auto t0 = std::chrono::steady_clock::now();
  for (int e = 0; e < episodes; ++e) {
    runner.step();
  }
  auto dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
                .count();
  // Each episode visits L public states; each state = one subgame solve of
  // num_iters iterations and 2 training examples.  We can't see L directly
  // from outside, so estimate via a separate counting net... instead use
  // the known structure: count via a wrapper is cleaner; here we time
  // per-episode and report episodes/s plus a measured solves count from
  // a second pass with an instrumented net.
  printf("{\"episodes\":%d,\"seconds\":%.6f,\"episodes_per_s\":%.3f,", episodes,
         dt, episodes / dt);
  // Instrumented pass: count add_training_example calls (2 per solve).
  struct CountingNet : public IValueNet {
    std::shared_ptr<IValueNet> inner;
    int* counter;
    CountingNet(std::shared_ptr<IValueNet> inner, int* counter)
        : inner(inner), counter(counter) {}
    torch::Tensor compute_values(const torch::Tensor query) override {
      return inner->compute_values(query);
    }
    void add_training_example(const torch::Tensor query,
                              const torch::Tensor values) override {
      ++*counter;
    }
  };
  auto counting = std::make_shared<CountingNet>(net, &solves);
  RlRunner runner2(params, counting, /*seed=*/1234);
  auto t1 = std::chrono::steady_clock::now();
  for (int e = 0; e < episodes; ++e) {
    runner2.step();
  }
  double dt2 =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t1)
          .count();
  double subgames = solves / 2.0;  // 2 examples per subgame solve
  printf(
      "\"subgames\":%.0f,\"subgames_per_s\":%.3f,\"cfr_iters_per_s\":%.1f,"
      "\"examples_per_s\":%.3f}\n",
      subgames, subgames / dt2, subgames * num_iters / dt2, solves / dt2);
  return 0;
}

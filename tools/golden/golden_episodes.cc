// Golden episode recorder: runs the *reference* RlRunner (linked in
// place) with a zero-output net and a fixed seed, recording every
// training example (query + values) in push order.  The queries encode
// each visited subgame root (public state + normalized beliefs), so the
// stream pins the full episode trajectory for fixed-seed replication
// tests against the TPU engine driven by the same std::mt19937 stream
// (csrc/refrng.cc).

#include <cstdio>
#include <cstring>
#include <vector>

#include <torch/torch.h>

#include "liars_dice.h"
#include "net_interface.h"
#include "real_net.h"
#include "recursive_solving.h"

using namespace liars_dice;

namespace {

struct RecordingNet : public IValueNet {
  std::shared_ptr<IValueNet> inner;
  std::vector<std::vector<float>> queries, values;
  explicit RecordingNet(std::shared_ptr<IValueNet> inner) : inner(inner) {}

  torch::Tensor compute_values(const torch::Tensor query) override {
    return inner->compute_values(query);
  }
  void add_training_example(const torch::Tensor query,
                            const torch::Tensor vals) override {
    auto q = query.reshape({-1});
    auto v = vals.reshape({-1});
    queries.emplace_back(q.data_ptr<float>(), q.data_ptr<float>() + q.numel());
    values.emplace_back(v.data_ptr<float>(), v.data_ptr<float>() + v.numel());
  }
};

void print_rows(const std::vector<std::vector<float>>& rows) {
  printf("[");
  for (size_t i = 0; i < rows.size(); ++i) {
    printf("%s[", i ? "," : "");
    for (size_t j = 0; j < rows[i].size(); ++j)
      printf("%s%.9g", j ? "," : "", rows[i][j]);
    printf("]");
  }
  printf("]");
}

}  // namespace

int main(int argc, char** argv) {
  int num_dice = 1, num_faces = 4, num_iters = 64, episodes = 3, seed = 1234;
  bool use_cfr = false, sample_leaf = true;
  double random_action_prob = 0.25;
  for (int i = 1; i < argc; ++i) {
    auto is = [&](const char* f) { return !strcmp(argv[i], f); };
    if (is("--num_dice")) num_dice = atoi(argv[++i]);
    else if (is("--num_faces")) num_faces = atoi(argv[++i]);
    else if (is("--num_iters")) num_iters = atoi(argv[++i]);
    else if (is("--episodes")) episodes = atoi(argv[++i]);
    else if (is("--seed")) seed = atoi(argv[++i]);
    else if (is("--cfr")) use_cfr = true;
    else if (is("--single_step")) sample_leaf = false;
    else if (is("--rap")) random_action_prob = atof(argv[++i]);
  }
  RecursiveSolvingParams params;
  params.num_dice = num_dice;
  params.num_faces = num_faces;
  params.random_action_prob = random_action_prob;
  params.sample_leaf = sample_leaf;
  params.subgame_params.num_iters = num_iters;
  params.subgame_params.max_depth = 2;
  params.subgame_params.linear_update = true;
  params.subgame_params.use_cfr = use_cfr;

  Game game(num_dice, num_faces);
  auto recorder = std::make_shared<RecordingNet>(
      create_zero_net(game.num_hands(), /*verbose=*/false));
  RlRunner runner(params, recorder, seed);
  for (int e = 0; e < episodes; ++e) runner.step();

  printf("{\"seed\":%d,\"episodes\":%d,\"num_iters\":%d,\"use_cfr\":%d,",
         seed, episodes, num_iters, use_cfr);
  printf("\"sample_leaf\":%d,\"queries\":", sample_leaf);
  print_rows(recorder->queries);
  printf(",\"values\":");
  print_rows(recorder->values);
  printf("}\n");
  return 0;
}

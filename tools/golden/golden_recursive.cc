// Golden-fixture generator for recursive-to-leaf solving: runs the
// *reference* compute_strategy_recursive_to_leaf /
// compute_sampled_strategy_recursive_to_leaf with an oracle value net and
// prints the resulting full-tree strategy + exploitability as JSON.

#include <cstdio>
#include <cstring>

#include "liars_dice.h"
#include "real_net.h"
#include "recursive_solving.h"
#include "subgame_solving.h"

using namespace liars_dice;

static void print_strategy_flat(const TreeStrategy& s) {
  printf("[");
  bool first = true;
  for (const auto& node : s)
    for (const auto& hand : node)
      for (double x : hand) {
        printf("%s%.17g", first ? "" : ",", x);
        first = false;
      }
  printf("]");
}

int main(int argc, char** argv) {
  int num_dice = 1, num_faces = 2, num_iters = 64, mdp_depth = 2, seed = -1;
  bool use_cfr = false;
  for (int i = 1; i < argc; ++i) {
    auto is = [&](const char* f) { return !strcmp(argv[i], f); };
    if (is("--num_dice")) num_dice = atoi(argv[++i]);
    else if (is("--num_faces")) num_faces = atoi(argv[++i]);
    else if (is("--num_iters")) num_iters = atoi(argv[++i]);
    else if (is("--mdp_depth")) mdp_depth = atoi(argv[++i]);
    else if (is("--seed")) seed = atoi(argv[++i]);  // >=0: sampled variant
    else if (is("--cfr")) use_cfr = true;
  }
  Game game(num_dice, num_faces);
  SubgameSolvingParams params;
  params.num_iters = num_iters;
  params.max_depth = mdp_depth;
  params.linear_update = true;
  params.use_cfr = use_cfr;

  SubgameSolvingParams oracle_params = params;
  oracle_params.max_depth = 100000;
  auto net = create_oracle_value_predictor(game, oracle_params);

  TreeStrategy strategy =
      seed >= 0
          ? compute_sampled_strategy_recursive_to_leaf(game, params, net, seed,
                                                       /*root_only=*/false)
          : compute_strategy_recursive_to_leaf(game, params, net);
  auto e = compute_exploitability2(game, strategy);
  printf("{\"e0\":%.17g,\"e1\":%.17g,\"strategy\":", e[0], e[1]);
  print_strategy_flat(strategy);
  printf("}\n");
  return 0;
}

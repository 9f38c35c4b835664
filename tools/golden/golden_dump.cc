// Golden-fixture generator: runs the *reference* implementation
// (/root/reference, linked in place, not copied) and dumps CFR/FP
// trajectories as JSON for exact-parity tests of the TPU rewrite.
//
// Output (stdout, one JSON object):
//   {
//     "game": [num_dice, num_faces],
//     "solver": {...params...},
//     "exploitability": [e_1, e_2, e_4, ...],   // at power-of-2 iters
//     "root_values": {"p0": [...], "p1": [...]},  // running means at end
//     "avg_strategy": [[...]],  // flattened [node][hand][action] at end
//     "sampling_strategy": [[...]]
//   }

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "liars_dice.h"
#include "recursive_solving.h"
#include "subgame_solving.h"

using namespace liars_dice;

static void print_vec(const std::vector<double>& v) {
  printf("[");
  for (size_t i = 0; i < v.size(); ++i)
    printf("%s%.17g", i ? "," : "", v[i]);
  printf("]");
}

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
  int num_dice = 1, num_faces = 4, num_iters = 64, max_depth = 1000000;
  bool use_cfr = true, linear = true, optimistic = false, dcfr = false;
  double dcfr_alpha = 0, dcfr_beta = 0, dcfr_gamma = 0;
  int root_bid = -1, root_player = 0;
  // beliefs: uniform unless --beliefs "csv;csv"
  std::string beliefs_arg;
  for (int i = 1; i < argc; ++i) {
    auto is = [&](const char* f) { return !strcmp(argv[i], f); };
    if (is("--num_dice")) num_dice = atoi(argv[++i]);
    else if (is("--num_faces")) num_faces = atoi(argv[++i]);
    else if (is("--num_iters")) num_iters = atoi(argv[++i]);
    else if (is("--max_depth")) max_depth = atoi(argv[++i]);
    else if (is("--fp")) use_cfr = false;
    else if (is("--no_linear")) linear = false;
    else if (is("--optimistic")) optimistic = true;
    else if (is("--dcfr")) {
      dcfr = true;
      dcfr_alpha = atof(argv[++i]);
      dcfr_beta = atof(argv[++i]);
      dcfr_gamma = atof(argv[++i]);
    }
    else if (is("--root_bid")) root_bid = atoi(argv[++i]);
    else if (is("--root_player")) root_player = atoi(argv[++i]);
    else if (is("--beliefs")) beliefs_arg = argv[++i];
    else { fprintf(stderr, "unknown flag %s\n", argv[i]); return 1; }
  }
  Game game(num_dice, num_faces);
  SubgameSolvingParams params;
  params.num_iters = num_iters;
  params.max_depth = max_depth;
  params.use_cfr = use_cfr;
  params.linear_update = linear;
  params.optimistic = optimistic;
  params.dcfr = dcfr;
  params.dcfr_alpha = dcfr_alpha;
  params.dcfr_beta = dcfr_beta;
  params.dcfr_gamma = dcfr_gamma;

  PartialPublicState root{root_bid, root_player};
  auto beliefs = get_initial_beliefs(game);
  if (!beliefs_arg.empty()) {
    int h = 0, player = 0;
    const char* p = beliefs_arg.c_str();
    while (*p && player < 2) {
      beliefs[player][h++] = atof(p);
      while (*p && *p != ',' && *p != ';') ++p;
      if (*p == ',') ++p;
      if (*p == ';') { ++p; player++; h = 0; }
    }
  }

  auto solver = build_solver(game, root, beliefs, params, nullptr);
  std::vector<TreeStrategy> iterates;  // even-iteration sampling strategies
  printf("{\"game\":[%d,%d],\"num_iters\":%d,\"use_cfr\":%d,\"linear\":%d,",
         num_dice, num_faces, num_iters, use_cfr, linear);
  printf("\"optimistic\":%d,\"dcfr\":%d,", optimistic, dcfr);
  printf("\"dcfr_alpha\":%g,\"dcfr_beta\":%g,\"dcfr_gamma\":%g,",
         dcfr_alpha, dcfr_beta, dcfr_gamma);
  printf("\"exploitability\":[");
  bool first = true;
  bool full_tree = root_bid == -1 && beliefs_arg.empty();
  for (int it = 0; it < num_iters; ++it) {
    solver->step(it % 2);
    // recursive_eval.cc:283-287: collect AFTER the step at even `it`.
    if (use_cfr && it % 2 == 0)
      iterates.push_back(solver->get_sampling_strategy());
    if (full_tree && ((it + 1) & it) == 0) {  // power of two
      double e = compute_exploitability(game, solver->get_strategy());
      printf("%s%.17g", first ? "" : ",", e);
      first = false;
    }
  }
  printf("],");
  printf("\"root_values_p0\":");
  print_vec(solver->get_hand_values(0));
  printf(",\"root_values_p1\":");
  print_vec(solver->get_hand_values(1));
  printf(",\"avg_strategy\":");
  print_strategy_flat(solver->get_strategy());
  printf(",\"sampling_strategy\":");
  print_strategy_flat(solver->get_sampling_strategy());
  printf(",\"num_nodes\":%d", (int)solver->get_tree().size());
  if (!iterates.empty() && root_bid == -1 && beliefs_arg.empty()) {
    // Immediate regrets of the iterate sequence
    // (compute_immediate_regrets, subgame_solving.cc:984-1050).
    auto regs = compute_immediate_regrets(game, iterates);
    printf(",\"immediate_regrets\":[");
    bool f = true;
    for (const auto& node : regs)
      for (double x : node) {
        printf("%s%.17g", f ? "" : ",", x);
        f = false;
      }
    printf("]");
  }
  printf("}\n");
  return 0;
}

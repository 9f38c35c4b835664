#!/bin/bash
# Build the golden-fixture generators and the reference-throughput bench
# against the reference sources (linked in place from /root/reference)
# and pip-provided libtorch.
#
# Two optimization tiers:
#  - Fixture generators (golden_dump/golden_episodes/golden_recursive):
#    -O1 with default fp-contract — their float output is pinned
#    bit-exact by tests/test_golden_parity.py; -march=native would fuse
#    FMAs and perturb the recorded fixtures.
#  - ref_bench: -O3 -march=native, the reference's OWN build flags
#    (/root/reference/csrc/liars_dice/CMakeLists.txt:8), so the
#    throughput baseline in REF_BASELINE.json measures the reference at
#    full optimization, not a handicapped -O1 build.
set -euo pipefail
cd "$(dirname "$0")"
TORCH=$(python -c "import torch, os; print(os.path.dirname(torch.__file__))")
REF=/root/reference/csrc/liars_dice
# -include fstream: subgame_solving.cc uses std::ofstream without
# including <fstream> (gets it transitively in the reference's own build).
COMMON="-std=c++17 -include fstream -I $REF -I $TORCH/include -I $TORCH/include/torch/csrc/api/include -D_GLIBCXX_USE_CXX11_ABI=1"
LIBS="-L $TORCH/lib -ltorch_cpu -lc10 -ltorch -Wl,-rpath,$TORCH/lib"
REF_SRCS="$REF/liars_dice.cc $REF/subgame_solving.cc $REF/recursive_solving.cc $REF/real_net.cc"

build_objs() {  # $1 = obj dir, $2 = flags, rest = sources
  local dir="$1" flags="$2"; shift 2
  mkdir -p "$dir"
  local pids=()
  for src in "$@"; do
    local out="$dir/$(basename "$src" .cc).o"
    if [ ! -f "$out" ] || [ "$src" -nt "$out" ]; then
      g++ $flags $COMMON -c "$src" -o "$out" &
      pids+=($!)
    fi
  done
  # NB: guard the empty-pids case explicitly — `[ -n "$p" ] && wait`
  # as the loop's last command returns 1 when nothing was rebuilt,
  # which `set -e` turns into a silent early exit.
  for p in "${pids[@]:-}"; do
    if [ -n "$p" ]; then wait "$p"; fi
  done
}

# Tier 1: fixture generators at -O1 (bit-exact fixtures).
build_objs obj "-O1" $REF_SRCS golden_dump.cc golden_episodes.cc golden_recursive.cc
REF_OBJS="obj/liars_dice.o obj/subgame_solving.o obj/recursive_solving.o obj/real_net.o"
for tool in golden_dump golden_episodes golden_recursive; do
  g++ $REF_OBJS "obj/$tool.o" -o "$tool" $LIBS
done

# Tier 2: ref_bench at the reference's own flags.
build_objs obj-o3 "-O3 -march=native" $REF_SRCS ref_bench.cc
g++ obj-o3/liars_dice.o obj-o3/subgame_solving.o obj-o3/recursive_solving.o \
    obj-o3/real_net.o obj-o3/ref_bench.o -o ref_bench $LIBS

echo "built: golden_dump golden_episodes golden_recursive ref_bench (in $(pwd))"

#!/bin/bash
# Build the golden-fixture generator against the reference sources
# (linked in place from /root/reference) and pip-provided libtorch.
set -euo pipefail
cd "$(dirname "$0")"
TORCH=$(python -c "import torch, os; print(os.path.dirname(torch.__file__))")
REF=/root/reference/csrc/liars_dice
# -include fstream: subgame_solving.cc uses std::ofstream without
# including <fstream> (gets it transitively in the reference's own build).
FLAGS="-O1 -std=c++17 -include fstream -I $REF -I $TORCH/include -I $TORCH/include/torch/csrc/api/include -D_GLIBCXX_USE_CXX11_ABI=1"
mkdir -p obj
pids=()
for src in "$REF/liars_dice.cc" "$REF/subgame_solving.cc" \
           "$REF/recursive_solving.cc" "$REF/real_net.cc" golden_dump.cc; do
  out="obj/$(basename "$src" .cc).o"
  if [ ! -f "$out" ] || [ "$src" -nt "$out" ]; then
    g++ $FLAGS -c "$src" -o "$out" &
    pids+=($!)
  fi
done
for p in "${pids[@]:-}"; do [ -n "$p" ] && wait "$p"; done
# Link the exact objects (obj/ also holds other tools' mains).
g++ obj/liars_dice.o obj/subgame_solving.o obj/recursive_solving.o \
    obj/real_net.o obj/golden_dump.o -o golden_dump \
    -L "$TORCH/lib" -ltorch_cpu -lc10 -ltorch -Wl,-rpath,"$TORCH/lib"
echo "built: $(pwd)/golden_dump"

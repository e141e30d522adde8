#!/bin/bash
# Build the native CSI loader shared library.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    csi_loader.cpp -o libcsi_loader.so
echo "built $(pwd)/libcsi_loader.so"

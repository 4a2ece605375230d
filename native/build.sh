#!/bin/sh
# Build the native host-generation library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    megaverse_native.cpp -o libmegaverse_native.so
echo "built $(pwd)/libmegaverse_native.so"

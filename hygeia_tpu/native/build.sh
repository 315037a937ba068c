#!/bin/sh
# Build the native fast loader (no deps beyond zlib + pthreads).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC fastload.cpp -o libfastload.so -lz -lpthread
echo "built $(pwd)/libfastload.so"

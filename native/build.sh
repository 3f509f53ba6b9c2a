#!/bin/sh
# Build the native governance core. Output lands next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -pthread -std=c++17 \
    govern_core.cpp -o libmmrs_govern.so
echo "built $(pwd)/libmmrs_govern.so"

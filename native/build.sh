#!/bin/sh
# Build the native host module.  Run from anywhere; output lands next to
# the source as libicon_host.so.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -ffp-contract=off -fPIC -shared -fopenmp -o libicon_host.so icon_host.cpp
echo "built $(pwd)/libicon_host.so"

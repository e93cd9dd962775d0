#!/bin/sh
# Build the native data loader: produces native/libspidertar.so
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -std=c++17 -pthread tarreader.cpp -o libspidertar.so
echo "built $(pwd)/libspidertar.so"

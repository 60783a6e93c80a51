#!/bin/sh
# Build the native host engine shared library.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O2 -std=c++17 -fPIC -shared -Wall -Wextra \
    -o lib/libzt_host.so src/zt_host.cc
echo "built lib/libzt_host.so"

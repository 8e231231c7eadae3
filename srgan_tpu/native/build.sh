#!/bin/sh
# Build the native loader shared library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 loader.cpp \
    -ljpeg -lpng -o libsrgan_loader.so
echo "built $(pwd)/libsrgan_loader.so"

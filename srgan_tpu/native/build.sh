#!/bin/sh
# Build the native loader shared library next to this script.
# Link to a temp name then rename atomically: a live process may have the
# old .so dlopened (possibly mid-decode on its thread pool) — overwriting
# the mapped file in place risks SIGBUS; rename gives the new library a
# fresh inode while the old mapping stays valid for existing handles.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 loader.cpp \
    -ljpeg -lpng -o libsrgan_loader.so.tmp
mv -f libsrgan_loader.so.tmp libsrgan_loader.so
echo "built $(pwd)/libsrgan_loader.so"

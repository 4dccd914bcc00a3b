#!/bin/sh
# Build libfire_native.so into native/build/ (picked up automatically by
# fire_tpu/runtime/native.py).
set -e
cd "$(dirname "$0")"
cmake -S . -B build -G Ninja >/dev/null
cmake --build build >/dev/null
echo "built: $(pwd)/build/libfire_native.so"

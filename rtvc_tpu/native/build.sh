#!/usr/bin/env bash
# Build the native WaveRNN engine: shared library (ctypes surface) +
# standalone CLI (capability parity with ref vocoder/libwavernn/build.sh).
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p build

CXX=${CXX:-g++}
CXXFLAGS="-O3 -march=native -ffast-math -std=c++17 -fPIC -Wall"

$CXX $CXXFLAGS -shared src/wavernn_engine.cpp -o build/librtvc_wavernn.so
$CXX $CXXFLAGS src/wavernn_engine.cpp src/vocoder_cli.cpp -o build/rtvc_vocoder

echo "Built build/librtvc_wavernn.so and build/rtvc_vocoder"

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

# Audio codec shim (decode flac/mp3/m4a/ogg/sph..., encode flac/mp3/ogg/wav)
# over the system FFmpeg libraries; skipped gracefully if headers are absent.
CC=${CC:-gcc}
if echo '#include <libavformat/avformat.h>' | $CC -E - >/dev/null 2>&1; then
    $CC -O2 -fPIC -Wall -shared src/audio_codec.c \
        -lavformat -lavcodec -lavutil -lswresample \
        -o build/librtvc_audio.so
    echo "Built build/librtvc_audio.so"
else
    echo "FFmpeg headers not found — skipping librtvc_audio.so"
fi

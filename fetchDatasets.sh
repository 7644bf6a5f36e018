#!/usr/bin/env bash
# Bulk download of the training corpora (capability parity with the
# reference's fetchDatasets.sh). Run on a machine with network access; pass
# the datasets root as $1. Each corpus then goes through its adapter in
# scripts/ before preprocessing.
set -euo pipefail
ROOT=${1:-datasets}
mkdir -p "$ROOT"
cd "$ROOT"

fetch() {  # fetch <url> [out]
  local url=$1 out=${2:-$(basename "$1")}
  [ -f "$out" ] || curl -L -o "$out" "$url"
}

# --- LibriSpeech (encoder) ---------------------------------------------------
fetch https://www.openslr.org/resources/12/train-other-500.tar.gz
# --- LibriTTS (synthesizer) --------------------------------------------------
fetch https://www.openslr.org/resources/60/train-clean-100.tar.gz libritts-train-clean-100.tar.gz
fetch https://www.openslr.org/resources/60/train-clean-360.tar.gz libritts-train-clean-360.tar.gz
# --- VCTK ---------------------------------------------------------------------
fetch https://datashare.ed.ac.uk/download/DS_10283_3443.zip VCTK-Corpus.zip
# --- VoxCeleb 1/2 (encoder; registration required — see voxceleb site) -------
echo "VoxCeleb requires registration: https://www.robots.ox.ac.uk/~vgg/data/voxceleb/"
# --- TED-LIUM v3 (slr51) -------------------------------------------------------
fetch https://www.openslr.org/resources/51/TEDLIUM_release-3.tgz
# --- CommonVoice (requires accepting the license on the website) --------------
echo "CommonVoice: download cv-corpus from https://commonvoice.mozilla.org/datasets"
# --- Misc OpenSLR speech corpora (slr41-80 etc.) -------------------------------
for id in 41 42 43 44 61 63 64 65 66 69 70 71 72 73 74 75 76 77 78 79 80; do
  echo "OpenSLR slr$id: https://www.openslr.org/$id/"
done

echo "Done. Extract the archives, then run the scripts/ adapters."

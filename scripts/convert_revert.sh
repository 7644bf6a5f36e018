#!/bin/bash
# Revert a partially-completed audio conversion: delete the converted .flac
# twin of every compressed source file so the conversion can be redone from
# scratch (ref helper: scripts/convert_revert.sh — run from the directory
# that contains the dataset tree, e.g. VoxCeleb2 raw/dev/aac).
set -u

total=0
deleted=0
skipped=0

while IFS= read -r -d '' f; do
    total=$((total + 1))
    twin="${f%.*}.flac"
    if [ -f "$twin" ]; then
        rm -f -- "$twin"
        deleted=$((deleted + 1))
    else
        skipped=$((skipped + 1))
    fi
done < <(find . \( -iname "*.m4a" -o -iname "*.mp3" -o -iname "*.wav" \) -print0)

echo "Total files: $total. Skipped $skipped not-converted files; deleted $deleted already-converted files."

#!/usr/bin/env bash
# Fetch the public REMODE test dataset ("traj_over_table", the ray-traced
# 200-frame sequence of test/dataset_main.cpp:39 and ICRA14 Table I) and
# lay it out exactly as the reference expects under RMD_TEST_DATA_PATH:
#
#   $DEST/first_200_frames_traj_over_table_input_sequence.txt
#   $DEST/images/scene_XXX.png
#   $DEST/depthmaps/scene_XXX.depth         (ASCII, centimetres)
#
# Source: the dataset is distributed via the rpg_open_remode wiki
# (https://github.com/uzh-rpg/rpg_open_remode/wiki, "Test the node"):
#   http://rpg.ifi.uzh.ch/datasets/remode_test_data.zip
#
# Integrity: on first successful fetch this script records per-file sha256
# sums into $DEST/MANIFEST.sha256; later fetches/evals verify against it
# (we cannot pin the archive hash a priori from an offline build
# environment — the manifest makes the byte-compat claim falsifiable on
# any machine that can fetch once).
#
# Usage:  scripts/fetch_traj_over_table.sh [DEST]   (default: ./remode_test_data)

set -euo pipefail

URL="${REMODE_TEST_DATA_URL:-http://rpg.ifi.uzh.ch/datasets/remode_test_data.zip}"
DEST="${1:-remode_test_data}"
SEQ="first_200_frames_traj_over_table_input_sequence.txt"

if [ -f "$DEST/$SEQ" ]; then
    echo "dataset already present at $DEST"
else
    mkdir -p "$DEST"
    tmp="$(mktemp -d)"
    trap 'rm -rf "$tmp"' EXIT
    echo "fetching $URL ..."
    if command -v curl >/dev/null; then
        curl -fL --retry 3 -o "$tmp/remode_test_data.zip" "$URL"
    elif command -v wget >/dev/null; then
        wget -O "$tmp/remode_test_data.zip" "$URL"
    else
        echo "ERROR: need curl or wget" >&2; exit 1
    fi
    echo "archive sha256: $(sha256sum "$tmp/remode_test_data.zip" | cut -d' ' -f1)"
    unzip -q "$tmp/remode_test_data.zip" -d "$tmp/unpacked"
    # the archive may nest a top-level directory; locate the sequence file
    seq_path="$(find "$tmp/unpacked" -name "$SEQ" | head -n1)"
    if [ -z "$seq_path" ]; then
        echo "ERROR: $SEQ not found in archive" >&2; exit 1
    fi
    root="$(dirname "$seq_path")"
    cp -r "$root"/. "$DEST"/
fi

# structural sanity (the reference format: test/dataset.cpp:94-186)
n_img=$(ls "$DEST/images" 2>/dev/null | wc -l)
n_dep=$(ls "$DEST/depthmaps" 2>/dev/null | wc -l)
n_seq=$(wc -l < "$DEST/$SEQ")
echo "sequence lines: $n_seq, images: $n_img, depthmaps: $n_dep"
[ "$n_img" -ge 200 ] || { echo "ERROR: expected >=200 images" >&2; exit 1; }

if [ -f "$DEST/MANIFEST.sha256" ]; then
    echo "verifying against recorded manifest ..."
    (cd "$DEST" && sha256sum --quiet -c MANIFEST.sha256)
    echo "manifest OK"
else
    echo "recording manifest ..."
    (cd "$DEST" && find images depthmaps "$SEQ" -type f | sort \
        | xargs sha256sum > MANIFEST.sha256)
fi

echo "done. run:  RMD_TEST_DATA_PATH=$DEST python eval.py --data-path $DEST"

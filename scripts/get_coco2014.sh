#!/usr/bin/env bash
# Fetch COCO 2014 and lay it out for data_cfg/coco2014.data.
# TPU-native counterpart of the reference's data/get_coco2014.sh — fresh
# implementation (official cocodataset.org archives + local label
# conversion; no gdrive label pack). See get_coco2017.sh for details.
#
# Usage: bash scripts/get_coco2014.sh [dest_root]   (default: ./data)
set -euo pipefail

ROOT=${1:-data}
D=$ROOT/coco2014
mkdir -p "$D"
cd "$D"

fetch() {
  local url=$1 zip=${1##*/}
  [ -f "$zip" ] || curl -fLO --retry 3 -C - "$url"
}

fetch http://images.cocodataset.org/zips/train2014.zip
fetch http://images.cocodataset.org/zips/val2014.zip
fetch http://images.cocodataset.org/annotations/annotations_trainval2014.zip

mkdir -p images
[ -d images/train2014 ] || unzip -q train2014.zip -d images
[ -d images/val2014 ]   || unzip -q val2014.zip -d images
[ -d annotations ]      || unzip -q annotations_trainval2014.zip

cd - >/dev/null
python scripts/coco_to_darknet.py \
  --ann "$D/annotations/instances_train2014.json" \
  --images "$D/images/train2014" --out "$D" --list "$D/train2014.txt"
python scripts/coco_to_darknet.py \
  --ann "$D/annotations/instances_val2014.json" \
  --images "$D/images/val2014" --out "$D" --list "$D/val2014.txt"

echo "COCO 2014 ready under $D (lists: train2014.txt / val2014.txt)"

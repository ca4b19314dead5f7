#!/usr/bin/env bash
# Fetch COCO 2017 and lay it out for data_cfg/coco2017.data.
# TPU-native counterpart of the reference's data/get_coco2017.sh
# (/root/reference/data/get_coco2017.sh) — fresh implementation: pulls the
# official archives from images.cocodataset.org and derives darknet-style
# label txts from instances_*.json with scripts/coco_to_darknet.py, instead
# of downloading a pre-built gdrive label pack.
#
# Usage: bash scripts/get_coco2017.sh [dest_root]   (default: ./data)
set -euo pipefail

ROOT=${1:-data}
D=$ROOT/coco2017
mkdir -p "$D"
cd "$D"

fetch() { # fetch <url> — resumable, skipped when the unzipped dir exists
  local url=$1 zip=${1##*/}
  [ -f "$zip" ] || curl -fLO --retry 3 -C - "$url"
}

fetch http://images.cocodataset.org/zips/train2017.zip
fetch http://images.cocodataset.org/zips/val2017.zip
fetch http://images.cocodataset.org/annotations/annotations_trainval2017.zip

mkdir -p images
[ -d images/train2017 ] || unzip -q train2017.zip -d images
[ -d images/val2017 ]   || unzip -q val2017.zip -d images
[ -d annotations ]      || unzip -q annotations_trainval2017.zip

cd - >/dev/null
# instances json -> labels/<split>/*.txt (class cx cy w h, normalized) +
# train2017.txt / val2017.txt image lists, matching data_cfg/coco2017.data.
python scripts/coco_to_darknet.py \
  --ann "$D/annotations/instances_train2017.json" \
  --images "$D/images/train2017" --out "$D" --list "$D/train2017.txt"
python scripts/coco_to_darknet.py \
  --ann "$D/annotations/instances_val2017.json" \
  --images "$D/images/val2017" --out "$D" --list "$D/val2017.txt"

echo "COCO 2017 ready under $D (lists: train2017.txt / val2017.txt)"

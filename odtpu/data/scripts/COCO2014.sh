#!/bin/bash
# Fetch + extract COCO2014 images + annotations into data/coco.
set -euo pipefail
dest="${1:-data/coco}"
mkdir -p "$dest/images" && cd "$dest"
for f in train2014.zip val2014.zip; do
  [ -f "$f" ] || curl -LO "http://images.cocodataset.org/zips/$f"
  unzip -qn "$f" -d images
done
f=annotations_trainval2014.zip
[ -f "$f" ] || curl -LO "http://images.cocodataset.org/annotations/$f"
unzip -qn "$f"
echo "COCO2014 ready under $dest"
